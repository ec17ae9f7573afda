package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch}

/** Empirical scale spot-check for the round-5b operators, in the
  * R4ScaleBench contract: replicate the sf0.1 inputs `REP`× and ask whether
  * wall-clock follows the claimed cost shape.
  *
  *  - semanticDedup claims the pairwise stage is cell-bounded: with k scaled
  *    proportionally to the corpus (the operator's documented usage — cells
  *    of roughly constant size), total time should grow near-linearly vs R,
  *    NOT quadratically as the all-pairs baseline would.
  *  - mmrRerank claims per-query bounded greedy state: replicating the
  *    QUERY side R× (pool and k fixed) should grow near-linearly — every
  *    round is one bounded join + one map-side argmax over all queries at
  *    once, never a per-query driver loop.
  *
  * Usage: `sbt "runMain graft.tools.R5bScaleBench [rep]"` (default 10).
  */
object R5bScaleBench {
  private def time[A](what: String)(f: => A): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"  $what: $s%.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def replicateEmb(r: Int): DataFrame = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
      // jitter each replica along one dimension so replicas are near-dups
      // of the original (the realistic hard case), not byte-identical
      base
        .crossJoin(spark.range(r).toDF("rep"))
        .select(
          (col("vec_id") * r + col("rep")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + col("rep").cast("float") * lit(1e-4f))
              .otherwise(x)).as("embedding"),
          col("label"))
    }

    println(s"== semanticDedup: 1x vs ${rep}x corpus, k scaled with the corpus ==")
    val t1 = time("semanticDedup 1x (k=8)")(
      Dedup.semanticDedup(replicateEmb(1), k = 8).count())
    val tR = time(s"semanticDedup ${rep}x (k=${8 * rep})")(
      Dedup.semanticDedup(replicateEmb(rep), k = 8 * rep).count())
    println(f"  growth ${tR / t1}%.1fx for ${rep}x data (cell-bounded => ~linear)")

    println(s"== mmrRerank: 8 vs ${8 * rep} queries over the same corpus ==")
    val corpus = replicateEmb(1)
    val m1 = time("mmr 8 queries")(
      SimilaritySearch.mmrRerank(corpus.filter(col("vec_id") < 8), corpus).count())
    val mR = time(s"mmr ${8 * rep} queries")(
      SimilaritySearch.mmrRerank(corpus.filter(col("vec_id") < 8 * rep), corpus).count())
    println(f"  growth ${mR / m1}%.1fx for ${rep}x queries (round-parallel => sublinear)")

    spark.stop()
  }
}

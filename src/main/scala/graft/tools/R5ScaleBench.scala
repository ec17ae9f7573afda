package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SimilaritySearch, TextIndex}
import graft.sources.Tables

/** Empirical scale spot-check for the round-5 operators, in the
  * R4ScaleBench contract: replicate the sf0.1 inputs `REP`× and ask
  * whether wall-clock follows the claimed cost shape.
  *
  *  - BPE training claims its per-round cost is VOCAB-bounded after the
  *    one up-front corpus collapse: replicating documents R× multiplies
  *    word frequencies but not the vocabulary, so train time should grow
  *    far sublinearly vs R (the initial tokenize+collapse scan is the
  *    only corpus-sized term).
  *  - The persisted IVF index claims search reads only the probed cells:
  *    at R× corpus, index SEARCH time should track the probed fraction,
  *    not the corpus — compared against the in-memory ivfTopK, which
  *    must re-assign the full corpus every run.
  *
  * Usage: `sbt "runMain graft.tools.R5ScaleBench [rep]"` (default 10).
  */
object R5ScaleBench {
  private def time[A](what: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
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

    def replicateDocs(r: Int): DataFrame = {
      val base = Tables.documents(spark, dir)
      base
        .crossJoin(spark.range(r).toDF("rep"))
        .select((col("doc_id") * r + col("rep")).as("doc_id"), col("text"), col("source"))
    }
    def replicateEmb(r: Int): DataFrame = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
      base
        .crossJoin(spark.range(r).toDF("rep"))
        .select((col("vec_id") * r + col("rep")).as("vec_id"), col("embedding"), col("label"))
    }

    println(s"== BPE train, 6 rounds: 1x vs ${rep}x corpus (vocab constant) ==")
    time("bpeTrain 1x")(TextIndex.bpeTrain(replicateDocs(1), 6).collect())
    time(s"bpeTrain ${rep}x")(TextIndex.bpeTrain(replicateDocs(rep), 6).collect())

    println(s"== IVF: persisted-index search vs in-memory, ${rep}x corpus ==")
    val big = replicateEmb(rep).cache()
    println(s"  corpus: ${big.count()} vectors")
    val q = big.filter(col("vec_id") < 8)
    val idx = java.nio.file.Files.createTempDirectory("graft-r5-ivf").toString
    time("index build (one-time)")(SimilaritySearch.ivfIndexBuild(big, idx, 8, 2))
    time("in-memory ivfTopK (retrains + full assign)")(
      SimilaritySearch.ivfTopK(q, big, 10, 8, 2).collect())
    time("persisted search (pruned scan)")(
      SimilaritySearch.ivfIndexSearch(spark, idx, q, 10, 2).collect())
    time("persisted search again (model reread, still pruned)")(
      SimilaritySearch.ivfIndexSearch(spark, idx, q, 10, 2).collect())
    spark.stop()
  }
}

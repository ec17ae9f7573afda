package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch}

/** Empirical scale spot-checks for the round-6 work, in the R4ScaleBench
  * contract (replicate inputs, ask whether wall-clock follows the claimed
  * cost shape):
  *
  *  - semanticDedup maxCell kill switch on a PATHOLOGICAL skew fixture —
  *    one semantic mega-cluster holding half the corpus. Uncapped, the
  *    within-cell stage is O(|cell|²) and blows up quadratically with the
  *    replica factor; capped, the mega-cell skips pairing (members kept)
  *    and time should stay near-linear. This is the configuration the
  *    registered q_dedup_semantic now exercises.
  *  - duplicateClusters (large-star/small-star) on an adversarial CHAIN
  *    graph: rounds must grow ~logarithmically with chain length, not
  *    linearly as min-label propagation did (26 rounds on the diameter-25
  *    sf0.1 name graph; a 10k chain would simply never converge under a
  *    fixed cap).
  *  - IVF×PQ persisted search at a replicated corpus: probed-cells ADC
  *    search vs in-memory pqTopK full-corpus scan — the composed index
  *    should hold its advantage as the corpus grows.
  *
  * Usage: `sbt "runMain graft.tools.R6ScaleBench [rep]"` (default 10).
  */
object R6ScaleBench {
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
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    // -- 1. semanticDedup skew kill switch -------------------------------
    // Half the corpus is one tight cluster (same direction, tiny jitter on
    // one dim): k-means puts it in ONE cell no matter how k is sized.
    def skewed(r: Int): DataFrame = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = 1000L * r
      val mega = spark.range(n).select(
        (col("id") + 1000000L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => when(i === 1, lit(1.0f) + col("id").cast("float") * lit(1e-6f))
            .otherwise(lit(0.01f))).as("embedding"),
        lit(0).as("label"))
      base.unionByName(mega)
    }
    println(s"== semanticDedup on a mega-cluster corpus: uncapped vs maxCell, 1x vs ${rep}x ==")
    Dedup.semanticDedup(skewed(1), k = 8).count() // warmup: JIT/codegen off the 1x number
    val u1 = time("uncapped 1x")(Dedup.semanticDedup(skewed(1), k = 8).count())
    val c1 = time("maxCell=500 1x")(Dedup.semanticDedup(skewed(1), k = 8, maxCell = 500).count())
    val uR = time(s"uncapped ${rep}x mega-cell")(
      Dedup.semanticDedup(skewed(rep), k = 8).count())
    val cR = time(s"maxCell=500 ${rep}x mega-cell")(
      Dedup.semanticDedup(skewed(rep), k = 8, maxCell = 500).count())
    println(f"  uncapped growth ${uR / u1}%.1fx vs capped ${cR / c1}%.1fx (mega-cell ${rep}x)")

    // -- 2. star-rewriting CC on an adversarial chain --------------------
    for (len <- Seq(1000, 10000, 10000 * math.max(1, rep / 10))) {
      val chain = spark.range(len - 1L)
        .select(col("id").as("a_id"), (col("id") + 1L).as("b_id"))
      val t0 = System.nanoTime()
      val (labels, rounds) = Dedup.duplicateClustersWithRounds(chain, maxIter = 50)
      val nOk = labels.filter(col("cluster_id") === 0L).count()
      println(f"  chain len=$len%-6d rounds=$rounds  all-min=${nOk == len.toLong}  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // -- 3. IVF×PQ search vs in-memory pqTopK at a replicated corpus -----
    def replicated(r: Int): DataFrame = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
      base.crossJoin(spark.range(r).toDF("rep"))
        .select(
          (col("vec_id") * r + col("rep")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + col("rep").cast("float") * lit(1e-4f))
              .otherwise(x)).as("embedding"),
          col("label"))
    }
    val corpus = replicated(rep).localCheckpoint()
    val queries = corpus.filter(col("vec_id") < 8)
    val idx = java.nio.file.Files.createTempDirectory("graft-r6-ivfpq").toString
    time(s"ivfPqIndexBuild ${rep}x corpus")(
      SimilaritySearch.ivfPqIndexBuild(corpus, idx))
    time("ivfPqIndexSearch nprobe=2")(
      SimilaritySearch.ivfPqIndexSearch(spark, idx, queries, 10, nprobe = 2).count())
    time("pqTopK full-corpus (train+encode+scan)")(
      SimilaritySearch.pqTopK(queries, corpus, 10).count())

    // -- 4. filtered ANN: pre- vs post-filter strategy at the same corpus --
    // The documented crossover (selectivity ≈ 1/inflate): a selective
    // predicate should favor the pre-filter exact scan (corpus shrinks at
    // the source); a loose one should favor probing the unfiltered IVF at
    // an inflated budget (corpus never re-scanned quadratically).
    // Measured at rep=10 (20k vectors): pre-filter 0.28/0.33 s wins at BOTH
    // selectivities — per-job fixed overhead dominates a corpus this small,
    // and the brute pairwise stage is only 8×20k dot products. The probe's
    // signal is the ORDERING of the post paths: persisted-index postFilter
    // (0.60-1.04 s) beats inline-train (1.01-1.61 s) at every predicate,
    // confirming the serving rule that the index must be prebuilt; the
    // pre/post crossover itself is a per-pair-cost × selectivity × corpus
    // argument that only binds when sel·N pairwise work exceeds the
    // nprobe/nlist probe fraction — i.e. at corpus scales where the brute
    // scan is no longer sub-second.
    // The in-memory post path pays IVF training per call; the serving shape
    // composes postFilter onto the PERSISTED index (built once, outside the
    // timed region) — that is the number to compare against re-scanning.
    val fIdx = java.nio.file.Files.createTempDirectory("graft-r6-fivf").toString
    SimilaritySearch.ivfIndexBuild(corpus, fIdx, nlist = 8, iters = 2)
    for ((nm, pred) <- Seq(
        ("selective ~10%", col("label") === 3),
        ("loose ~90%", col("label") =!= 3))) {
      time(s"pre-filter exact ($nm)")(
        SimilaritySearch.filteredTopK(queries, corpus, pred, 10).count())
      time(s"post-filter IVF inline-train ($nm)")(
        SimilaritySearch.filteredTopKPost(queries, corpus, pred, 10).count())
      time(s"post-filter persisted index ($nm)")(
        SimilaritySearch.postFilter(
          SimilaritySearch.ivfIndexSearch(spark, fIdx, queries, 40, nprobe = 2),
          corpus, pred, 10).count())
    }
    spark.stop()
  }
}

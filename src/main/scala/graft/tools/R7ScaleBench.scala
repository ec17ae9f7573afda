package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch}

/** Empirical scale spot-checks for the round-7 work (the R4ScaleBench
  * contract: replicate inputs, ask whether wall-clock follows the claimed
  * cost shape):
  *
  *  - SEARCH UNDER HEAVY TOMBSTONES: 30% of a replicated corpus logically
  *    deleted, uncompacted. The claim behind the LSM delete design is that
  *    a tombstoned search stays O(probed cells ∪ tombstones) — the
  *    anti-join applies AFTER cell pruning and the corpus is never
  *    rescanned — so search time should sit near the clean number, not
  *    scale with the delete volume, and compaction should return it to
  *    (or below) clean. The plan is also checked: PartitionFilters must
  *    survive the tombstone anti-join on both IVF×PQ scans.
  *  - the same probe on the round-7 minhash-index delete path
  *    (candidates against a 30%-tombstoned persisted LSH index).
  *  - tombstone-volume sweep on the IVF family: delete 1% / 10% / 30%,
  *    measure the uncompacted search each time — the curve should be flat
  *    (anti-join build side is id-only longs), which is what makes the
  *    "compact at ~1% of base" trigger a cost knob rather than a
  *    correctness cliff.
  *
  * Usage: `sbt "runMain graft.tools.R7ScaleBench [rep]"` (default 10).
  */
object R7ScaleBench {
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
    val nCorpus = corpus.count()
    val queries = corpus.filter(col("vec_id") < 8).localCheckpoint()

    // -- 1. IVF×PQ search under heavy tombstones --------------------------
    println(s"== IVF×PQ search under tombstones (corpus $nCorpus) ==")
    val idx = java.nio.file.Files.createTempDirectory("graft-r7-ivfpq").toString
    time(s"ivfPqIndexBuild ${rep}x corpus")(
      SimilaritySearch.ivfPqIndexBuild(corpus, idx))
    def search(): Long =
      SimilaritySearch.ivfPqIndexSearch(spark, idx, queries, 10, nprobe = 2).count()
    search() // warmup: JIT/codegen off the timed numbers
    val clean = time("search clean")(search())
    for (pct <- Seq(1, 10, 30)) {
      // reset the sweep point: discard the prior point's PENDING deletes
      // (nothing was compacted, so the base is still the clean build)
      graft.operators.Tombstones.clear(spark, idx)
      SimilaritySearch.indexDelete(
        corpus.select("vec_id").filter(col("vec_id") % 100 < pct), idx)
      time(f"search with $pct%2d%% tombstoned (uncompacted)")(search())
    }
    // plan: the tombstone anti-join must not cost the cell pruning
    val planned = SimilaritySearch
      .ivfPqIndexSearch(spark, idx, queries, 10, nprobe = 2)
      .queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*cell".r.findAllIn(planned).size
    println(s"  PartitionFilters survive tombstones on both scans: ${pruned >= 2}")
    val t30 = time("search 30% tombstoned (again)")(search())
    time("ivfPqIndexCompact (applies 30% physically)")(
      SimilaritySearch.ivfPqIndexCompact(spark, idx))
    val after = time("search compacted (70% live)")(search())
    println(f"  tombstoned/clean ${t30 / clean}%.2fx; compacted/clean ${after / clean}%.2fx")

    // -- 2. minhash index candidates under tombstones ---------------------
    println("== minhash index candidates under tombstones ==")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mIdx = java.nio.file.Files.createTempDirectory("graft-r7-mh").toString
    time("minhashIndexBuild sf0.1 docs")(Dedup.minhashIndexBuild(docs, mIdx))
    val probe = docs.filter(col("doc_id") < 50).localCheckpoint()
    def cands(): Long = Dedup.minhashIndexCandidates(probe, mIdx).count()
    cands() // warmup
    val mClean = time("candidates clean")(cands())
    Dedup.minhashIndexDelete(docs.select("doc_id").filter(col("doc_id") % 100 < 30), mIdx)
    val mTomb = time("candidates 30% tombstoned")(cands())
    time("minhashIndexCompact")(Dedup.minhashIndexCompact(spark, mIdx))
    val mAfter = time("candidates compacted")(cands())
    println(f"  tombstoned/clean ${mTomb / mClean}%.2fx; compacted/clean ${mAfter / mClean}%.2fx")

    spark.stop()
  }
}

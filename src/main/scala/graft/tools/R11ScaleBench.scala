package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-11 empirical probes, one per new scale claim:
  *
  *  1. CLUSTER APPEND, ONE DECADE UP — the R10ScaleBench fixed-batch
  *     probe extended to a 5,000,000-doc assignments table (2.5M
  *     components), on BOTH layouts: the plain parquet base and the
  *     [[Dedup.clusterIndexBuildBucketed]] doc_id-bucketed base. The
  *     claim under test: the per-arrival cost's id-scan term stays
  *     sublinear in the corpus, and the bucketed layout keeps the
  *     per-doc resolution exchange-free on the base side (the plan shape
  *     is pinned in ClusterIndexSpec; this measures the wall clock).
  *
  *  2. INDEX-BACKED SURVIVORS — [[Dedup.dropDuplicateClustersFromIndex]]
  *     (one anti-join against the persisted assignments) vs the
  *     from-scratch [[Dedup.dropDuplicateClusters]] (connected components
  *     over the full pair set, then the drop) on the 5M-doc corpus: the
  *     arrival pipeline's last hop must cost a read, not a recompute.
  *
  * Usage: `sbt "runMain graft.tools.R11ScaleBench"`.
  */
object R11ScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](what: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $what: $s%.2f s")
      (a, s)
    }

    println("== cluster append: fixed 50-pair batch, 500k -> 5M docs, both layouts ==")
    for (n <- Seq(500000L, 5000000L); bucketed <- Seq(false, true)) {
      val layout = if (bucketed) "bucketed(64)" else "plain"
      val basePairs = spark.range(n / 2)
        .select((col("id") * 2).as("a_id"), (col("id") * 2 + 1).as("b_id"))
        .localCheckpoint()
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-r11-ci$n-$layout").toString
      if (bucketed) Dedup.clusterIndexBuildBucketed(basePairs, idx, buckets = 64)
      else Dedup.clusterIndexBuild(basePairs, idx)
      val batch = spark.range(50)
        .select((col("id") + n).as("a_id"), (col("id") * 2).as("b_id"))
        .localCheckpoint()
      println(f"-- corpus $n%,d docs (${n / 2}%,d components), $layout --")
      time(s"clusterIndexAppend [$layout]") {
        Dedup.clusterIndexAppend(batch, idx)
      }
      val nNew = Dedup.clusterIndexAssignments(spark, idx)
        .filter(col("doc_id") >= n).count()
      require(nNew == 50, s"expected 50 new assignments, got $nNew")
      // the new last hop: survivors off the index vs the recompute
      if (n == 5000000L) {
        val docs = spark.range(n + 50).select(col("id").as("doc_id"))
          .withColumn("lang", lit("en"))
          .localCheckpoint()
        val (kept, _) = time(s"dropDuplicateClustersFromIndex [$layout]") {
          Dedup.dropDuplicateClustersFromIndex(docs, idx).count()
        }
        require(kept == n / 2, s"expected ${n / 2} survivors, got $kept")
        if (!bucketed) {
          val (keptScratch, _) = time("from-scratch dropDuplicateClusters (CC + drop)") {
            Dedup.dropDuplicateClusters(docs, basePairs.unionByName(batch)).count()
          }
          require(keptScratch == kept, s"survivor counts differ: $keptScratch vs $kept")
        }
      }
    }
    spark.stop()
  }
}

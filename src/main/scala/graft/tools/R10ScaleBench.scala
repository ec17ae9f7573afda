package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-10 empirical probe for the incremental duplicate-cluster index:
  * the claim is that [[Dedup.clusterIndexAppend]]'s cost is bound by the
  * TOUCHED components (+ the column-pruned id scans of the assignments
  * table), not by a from-scratch connected-components recompute over the
  * full pair set. Measured: a FIXED arrival batch (50 pairs touching 50
  * size-2 components) appended to cluster indexes of growing corpora,
  * against the from-scratch [[Dedup.duplicateClusters]] on the unioned
  * pair set at the same sizes.
  *
  * Usage: `sbt "runMain graft.tools.R10ScaleBench"`.
  */
object R10ScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](what: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $what: $s%.2f s")
      s
    }

    println("== incremental cluster append: fixed batch vs growing corpus ==")
    for (n <- Seq(20000L, 100000L, 500000L)) {
      // n docs in n/2 size-2 components: pairs (2i, 2i+1)
      val basePairs = spark.range(n / 2)
        .select((col("id") * 2).as("a_id"), (col("id") * 2 + 1).as("b_id"))
        .localCheckpoint()
      val idx = java.nio.file.Files.createTempDirectory(s"graft-r10-ci$n").toString
      Dedup.clusterIndexBuild(basePairs, idx)
      // the fixed arrival: 50 new docs, each pairing into one old component
      val batch = spark.range(50)
        .select((col("id") + n).as("a_id"), (col("id") * 2).as("b_id"))
        .localCheckpoint()
      println(f"-- corpus $n%,d docs (${n / 2}%,d components), batch = 50 pairs --")
      time(f"clusterIndexAppend (touched=50 components)") {
        Dedup.clusterIndexAppend(batch, idx)
      }
      val resolved = Dedup.clusterIndexAssignments(spark, idx)
      val nNew = resolved.filter(col("doc_id") >= n).count()
      require(nNew == 50, s"expected 50 new assignments, got $nNew")
      time(f"from-scratch duplicateClusters ($n%,d-doc pair set)") {
        Dedup.duplicateClusters(basePairs.unionByName(batch)).count()
      }
    }
    spark.stop()
  }
}

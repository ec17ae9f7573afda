package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexMaintenance, IndexManifest, Tombstones}

/** Round-10 empirical probes, one per new scale claim:
  *
  *  1. INCREMENTAL CLUSTER APPEND — [[Dedup.clusterIndexAppend]]'s cost
  *     is bound by the TOUCHED components (+ the column-pruned id scans
  *     of the assignments table), not by a from-scratch
  *     connected-components recompute over the full pair set. Measured:
  *     a FIXED arrival batch (50 pairs touching 50 size-2 components)
  *     appended to cluster indexes of growing corpora, against the
  *     from-scratch [[Dedup.duplicateClusters]] on the unioned pair set.
  *
  *  2. VISIBILITY-AUDIT COST — `IndexManifest.audit(visibility = true)`
  *     scans the stream segment (one id column) and the scoped tombstone
  *     slice, never the base: its cost must track the STREAM size, not
  *     the corpus. Measured: deep fsck over minhash indexes with a fixed
  *     streamed segment on growing bases.
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

    println("== visibility audit: fixed stream segment vs growing base ==")
    val sfDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (rep <- Seq(4, 20)) {
      val docs = sfDocs
        .crossJoin(spark.range(rep).toDF("r"))
        .select((col("doc_id") * rep + col("r")).as("doc_id"), col("text"))
        .localCheckpoint()
      val n = docs.count()
      val idx = java.nio.file.Files.createTempDirectory(s"graft-r10-vis$rep").toString
      Dedup.minhashIndexBuild(docs, idx)
      // fixed-size planted stream segment + a scoped tombstone covering it
      val st = IndexManifest.resolve(spark, idx, IndexManifest.Layouts.minhash)
      spark.range(2000)
        .select(lit(0).as("bucket"), (col("id") + 10000000L).as("c_id"),
          array(lit(1L), lit(2L)).as("c_sig"))
        .write.mode("overwrite").parquet(st.streamDir(idx))
      Tombstones.delete(
        spark.range(100).select((col("id") + 10000000L).as("doc_id")),
        idx, st.tombstones, asOfGen = IndexManifest.segGen(st.stream))
      val reg = IndexMaintenance.MinhashIndex(idx)
      println(f"-- base $n%,d banded docs, stream segment 2,000 rows --")
      time("fsck shallow (structural only)") {
        IndexMaintenance.fsck(spark, Seq(reg))
      }
      val deep = time("fsck visibility = true") {
        IndexMaintenance.fsck(spark, Seq(reg), visibility = true)
      }
      val hidden = IndexMaintenance.fsck(spark, Seq(reg), visibility = true)
        .head._2.hiddenStreamIds
      require(hidden.size == 20, s"expected the 20-id evidence cap, got ${hidden.size}")
      val _ = deep
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextSearchIndex, Tombstones}

/** Round-9 empirical probes, one per new claim:
  *
  *  1. SNAPSHOT-READ PARITY — an AsOf read is the live read's plan over
  *     a pinned generation's files, so it must cost the same class, not
  *     a history-replay penalty. Measured: minhash candidate probe live
  *     vs AsOf on the retained prior generation, 10×/20× corpora.
  *
  *  2. APPEND-GUARD OVERHEAD — the loud [[Tombstones.requireAppendable]]
  *     check is one broadcast join of the batch ids against the scoped
  *     slice of the (compaction-bounded) tombstone segment. Measured:
  *     the guard alone at 0 / 10k / 100k scoped tombstone rows, and a
  *     full guarded append for context. The claim it backs: "one cheap
  *     job per batch mutation".
  *
  * Usage: `sbt "runMain graft.tools.R9ScaleBench"`.
  */
object R9ScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def time[A](what: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $what: $s%.2f s")
      s
    }

    def replicatedDocs(r: Int): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")
        .crossJoin(spark.range(r).toDF("rep"))
        .select((col("doc_id") * r + col("rep")).as("doc_id"), col("text"))
        .localCheckpoint()

    println("== 1. snapshot-read parity: live vs AsOf candidate probe ==")
    for (rep <- Seq(10, 20)) {
      val docs = replicatedDocs(rep)
      val n = docs.count()
      val idx = java.nio.file.Files.createTempDirectory(s"graft-r9-asof$rep").toString
      Dedup.minhashIndexBuild(docs, idx)
      val g0 = graft.operators.IndexManifest.read(spark, idx).get.generation
      // one mutation so g0 is the RETAINED generation, not the live one
      Dedup.minhashIndexUpsert(
        docs.filter(col("doc_id") < 50)
          .withColumn("text", concat(col("text"), lit(" changed changed"))), idx)
      val probe = docs.filter(col("doc_id") % 97 === 3).localCheckpoint()
      // warm both lanes once, then time
      Dedup.minhashIndexCandidates(probe, idx).count()
      Dedup.minhashIndexCandidatesAsOf(probe, idx, g0).count()
      val live = time(s"live candidates, $n-doc corpus")(
        Dedup.minhashIndexCandidates(probe, idx).count())
      val asof = time(s"AsOf candidates, $n-doc corpus")(
        Dedup.minhashIndexCandidatesAsOf(probe, idx, g0).count())
      println(f"  -> AsOf/live ratio: ${asof / live}%.2f")
    }

    println("== 2. append-guard overhead vs scoped-tombstone volume ==")
    val docs = replicatedDocs(10)
    val idx = java.nio.file.Files.createTempDirectory("graft-r9-guard").toString
    Dedup.minhashIndexBuild(docs, idx)
    val st = graft.operators.IndexManifest.resolve(
      spark, idx, graft.operators.IndexManifest.Layouts.minhash)
    val baseGen = graft.operators.IndexManifest.segGen(st.tables("index"))
    val batchIds = spark.range(2000000, 2000100).toDF("doc_id")
    for (ts <- Seq(0, 10000, 100000)) {
      if (ts > 0) {
        // scoped rows the guard must scan — ids far from the batch's
        spark.range(1000000, 1000000 + ts)
          .select(col("id").as("ts_id"), lit(baseGen).cast("long").as("ts_gen"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$idx/${st.tombstones}")
      }
      time(s"guard alone, $ts scoped tombstones, 100-id batch")(
        Tombstones.requireAppendable(
          batchIds, idx, "doc_id", st.tombstones, baseGen))
    }
    val fresh = docs.filter(col("doc_id") % 1000 === 7)
      .withColumn("doc_id", col("doc_id") + 3000000)
    time("full guarded minhash append (for context)")(
      Dedup.minhashIndexAppend(fresh, idx))
    time("full guarded text append (1x corpus build first)") {
      val txt = java.nio.file.Files.createTempDirectory("graft-r9-guard-txt").toString
      TextSearchIndex.build(replicatedDocs(1), txt)
      TextSearchIndex.append(
        replicatedDocs(1).filter(col("doc_id") % 100 === 7)
          .withColumn("doc_id", col("doc_id") + 3000000), txt)
    }
    spark.stop()
  }
}

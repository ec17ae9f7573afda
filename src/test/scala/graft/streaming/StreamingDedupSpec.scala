package graft.streaming

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("append")
      .parquet(dir)

  private def drain(src: String, out: String, ckpt: String): Unit =
    DailyIngest.runIncremental(
      StreamingDedup.classify(StreamingDedup.readDocuments(spark, src)),
      out,
      ckpt)

  private def statuses(out: String): Map[Long, String] =
    spark.read
      .parquet(out)
      .as[(Long, String)]
      .collect()
      .toMap

  test("first occurrence kept, later duplicates flagged — within and across checkpointed runs") {
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val (src, out, ckpt) = (s"$base/docs", s"$base/out", s"$base/ckpt")
    // Batch 1: 11 is original, 12 duplicates it in the SAME batch (ties
    // collapse to the lowest doc_id), 13 distinct, whitespace/case noise
    // must not defeat the match.
    writeDocs(src, Seq(11L -> "alpha beta gamma", 12L -> "  Alpha  beta GAMMA ", 13L -> "delta"))
    drain(src, out, ckpt)
    assert(statuses(out) === Map(11L -> "kept", 12L -> "exact_dup", 13L -> "kept"))

    // Batch 2, separate run resumed from the checkpoint: 21 duplicates a
    // batch-1 doc — only carried state can know that; 22 is new.
    writeDocs(src, Seq(21L -> "alpha beta gamma", 22L -> "epsilon"))
    drain(src, out, ckpt)
    assert(statuses(out) === Map(
      11L -> "kept", 12L -> "exact_dup", 13L -> "kept",
      21L -> "exact_dup", 22L -> "kept"))

    // Re-running with no new input must not reclassify or duplicate output
    // (file-source offsets + sink commit log = exactly once).
    drain(src, out, ckpt)
    assert(spark.read.parquet(out).count() === 5)
  }
}

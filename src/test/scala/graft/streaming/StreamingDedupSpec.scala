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

  test("classifyNear: stream-vs-corpus near-dup via the static LSH index, no corpus text rescans") {
    val base = java.nio.file.Files.createTempDirectory("graft-sneard").toString
    val (src, out, ckpt) = (s"$base/docs", s"$base/out", s"$base/ckpt")
    // ~40 words so a one-word edit keeps Jaccard high (~0.85), and 8 narrow
    // bands (2 rows each) so a collision is near-certain at that similarity
    val corpusText =
      "the quick brown fox jumps over the lazy dog and runs far away into the green hills " +
        "while the silver moon rises slowly above the quiet valley where the old stone bridge " +
        "crosses the winding river near the sleeping village tonight"
    val corpus = Seq((1000L, corpusText))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.minhashIndex(corpus, numPerm = 16, bands = 8)

    writeDocs(
      src,
      Seq(
        // verbatim copy of the corpus doc: every MinHash component agrees
        31L -> corpusText,
        // one-word edit: near-dup, most components agree
        32L -> corpusText.replace("tonight", "tomorrow"),
        // unrelated: must not match any band (or fail the estimate)
        33L -> "completely different subject matter with zero shared shingles whatsoever here",
        // too short to shingle: no bands, kept with sentinel estimate
        34L -> "tiny doc"))
    DailyIngest.runIncremental(
      StreamingDedup
        .classifyNear(StreamingDedup.readDocuments(spark, src), index, 0.5, bands = 8),
      out,
      ckpt)
    val got = spark.read
      .parquet(out)
      .as[(Long, String, Double)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(31L)._1 === "near_dup")
    assert(got(31L)._2 === 1.0)
    assert(got(32L)._1 === "near_dup")
    assert(got(32L)._2 >= 0.5 && got(32L)._2 < 1.0)
    assert(got(33L)._1 === "kept")
    assert(got(34L) === (("kept", -1.0)))
  }

  test("classifySemantic: streamed vectors judged against frozen cells, across checkpointed runs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssem").toString
    val (src, out, ckpt) = (s"$tmp/vecs", s"$tmp/out", s"$tmp/ckpt")
    // Base: two orthogonal groups; model freezes cells x and y, survivors
    // {0, 2} (the semanticDedupAppend fixture).
    val baseVecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.002f, 0.0f))
    ).toDF("vec_id", "embedding")
    val model = graft.operators.Dedup.semanticModel(baseVecs, k = 2, rounds = 2)
    val kept = graft.operators.Dedup.semanticDedup(baseVecs, k = 2, rounds = 2, threshold = 0.99)
      .join(baseVecs, Seq("vec_id"))
      .select("vec_id", "embedding", "cluster")

    def writeVecs(rows: Seq[(Long, Array[Float])]): Unit =
      rows.map { case (id, v) => (id, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("append").parquet(src)
    def drainSem(): Unit =
      DailyIngest.runIncremental(
        StreamingDedup.classifySemantic(
          StreamingDedup.readVectors(spark, src), kept, model, threshold = 0.99),
        out, ckpt)

    writeVecs(Seq(
      10L -> Array(1.0f, 0.002f, 0.0f, 0.0f), // near-dup of survivor 0
      11L -> Array(0.0f, 0.0f, 1.0f, 0.0f))) // novel direction
    drainSem()
    // Second run resumed from the checkpoint: only the new file is read.
    writeVecs(Seq(
      12L -> Array(0.0f, 1.0f, 0.004f, 0.0f), // near-dup of survivor 2
      13L -> Array(0.0f, 0.0f, 0.0f, 1.0f))) // novel direction
    drainSem()

    val got = spark.read.parquet(out)
      .as[(Long, Long, String, Double)]
      .collect().map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got.keySet === Set(10L, 11L, 12L, 13L))
    assert(got(10L)._1 === "near_dup" && got(10L)._2 > 0.99)
    assert(got(11L)._1 === "kept")
    assert(got(12L)._1 === "near_dup" && got(12L)._2 > 0.99)
    assert(got(13L)._1 === "kept")
    // exactly-once: re-running with no new input adds nothing
    drainSem()
    assert(spark.read.parquet(out).count() === 4)
  }

  test("classifyNear over the PERSISTED live index: a corpus takedown flips the " +
    "next classification to kept") {
    val base = java.nio.file.Files.createTempDirectory("graft-sneard-idx").toString
    val (idx, src, out, ckpt) = (s"$base/idx", s"$base/docs", s"$base/out", s"$base/ckpt")
    val corpusText =
      "the quick brown fox jumps over the lazy dog and runs far away into the green hills " +
        "while the silver moon rises slowly above the quiet valley where the old stone bridge " +
        "crosses the winding river near the sleeping village tonight"
    graft.operators.Dedup.minhashIndexBuild(
      Seq((1000L, corpusText)).toDF("doc_id", "text"), idx, numPerm = 16, bands = 8)
    def classify(): Unit =
      DailyIngest.runIncremental(
        StreamingDedup.classifyNear(
          StreamingDedup.readDocuments(spark, src),
          graft.operators.Dedup.minhashIndexRows(spark, idx),
          0.5,
          bands = 8),
        out,
        ckpt)
    writeDocs(src, Seq(41L -> corpusText))
    classify()
    val first = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 41L)
      .head().getAs[String]("status")
    assert(first === "near_dup")
    // takedown of the corpus doc: the live index loses it, so the SAME
    // content arriving later is now kept — nothing live suppresses it
    graft.operators.Dedup.minhashIndexDelete(Seq(1000L).toDF("doc_id"), idx)
    writeDocs(src, Seq(42L -> corpusText))
    classify()
    val second = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 42L)
      .head().getAs[String]("status")
    assert(second === "kept")
  }

  test("arrival loop: the streaming twin of arrivalDedupStep — cross-batch " +
    "dedup through the two persisted indexes, epoch-committed survivor " +
    "slices, checkpointed resume answers nothing twice, and the trailing " +
    "sweep keeps maintenance turnkey") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-arrival-loop").toString
    val (mh, cl, src, out, ckpt) =
      (s"$root/mh", s"$root/cl", s"$root/in", s"$root/out", s"$root/ckpt")
    // base corpus: two docs, indexes seeded from the index's own candidates
    val base = Seq(
      (1L, "aa bb cc dd"), (2L, "zz yy xx ww")
    ).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.operators.Dedup.minhashIndexBuild(base, mh)
    graft.operators.Dedup.clusterIndexBuild(
      graft.operators.Dedup.minhashIndexCandidates(base, mh)
        .filter(col("est") >= 0.5)
        .select(col("doc_id").as("a_id"), col("c_id").as("b_id")),
      cl)
    def loop() = StreamingDedup.arrivalLoopAvailableNow(
      spark, mh, cl, src, out, ckpt, maxFilesPerTrigger = Some(1))
    // wave 1 (one file): 3 dups base doc 1 -> dropped; 4 fresh -> kept
    writeDocs(src, Seq(3L -> "aa bb cc dd", 4L -> "mm nn oo pp"))
    // wave 2 (second file): 5 dups WAVE 1's kept doc 4 (cross-batch — the
    // case the static-corpus classifier can't catch); 6 fresh
    writeDocs(src, Seq(5L -> "mm nn oo pp", 6L -> "qq rr ss tt"))
    loop()
    val survivors = StreamingDedup.arrivalSurvivors(spark, out)
    val kept = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(4L, 6L),
      "dup-of-base and dup-of-earlier-batch drop; fresh docs survive")
    assert(survivors.select("epoch").distinct().count() === 2,
      "maxFilesPerTrigger=1 must slice the drain into two epochs")
    // the assignments index carries the full closure incl. both waves
    assert(graft.operators.Dedup.clusterIndexAssignments(spark, cl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    // checkpointed resume: nothing new arrived -> no new epochs, no
    // index growth, identical survivors
    val before = survivors.collect().toSet
    loop()
    assert(StreamingDedup.arrivalSurvivors(spark, out).collect().toSet === before)
    // a fresh arrival file after resume lands in a NEW epoch only
    writeDocs(src, Seq(7L -> "aa bb cc dd"))
    loop()
    assert(StreamingDedup.arrivalSurvivors(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(4L, 6L),
      "a late dup of the base rep is dropped, not re-emitted")
  }
}

package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilaritySearch

class StreamingSearchSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("q_id", "n_id", "rank", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("streamed serving equals the batch search; checkpoint resume answers " +
    "only new arrivals; replayed epochs never duplicate") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve").toString
    val (idx, arrivals, out, ckpt) = (s"$base/idx", s"$base/in", s"$base/out", s"$base/ckpt")
    SimilaritySearch.ivfPqIndexBuild(emb, idx)

    // first wave of queries arrives and is served
    val w1 = emb.filter(col("vec_id") < 4)
    w1.coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2)
    val served1 = pairs(StreamingSearch.answers(spark, out))
    assert(served1 === pairs(SimilaritySearch.ivfPqIndexSearch(spark, idx, w1, 5, nprobe = 2)))
    assert(served1.nonEmpty)

    // same checkpoint, no new arrivals -> nothing re-answered
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2)
    assert(pairs(StreamingSearch.answers(spark, out)) === served1)

    // second wave: only the NEW queries are answered, cumulatively correct
    val w2 = emb.filter(col("vec_id") >= 4 && col("vec_id") < 8)
    w2.coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2)
    val both = w1.unionByName(w2)
    assert(
      pairs(StreamingSearch.answers(spark, out)) ===
        pairs(SimilaritySearch.ivfPqIndexSearch(spark, idx, both, 5, nprobe = 2)))

    // an at-least-once replay of a committed epoch is skipped: the epoch
    // directory is the commit marker
    val served2 = pairs(StreamingSearch.answers(spark, out))
    val epochs = StreamingSearch.answers(spark, out)
      .select("epoch").distinct().as[Int].collect().sorted
    assert(epochs.nonEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$out/.inflight-epoch=99"))
    assert(pairs(StreamingSearch.answers(spark, out)) === served2)
  }

  test("serving interleaves with the index delete lifecycle: a tombstoned id " +
    "vanishes from the NEXT micro-batch's answers") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve-del").toString
    val (idx, arrivals, out, ckpt) = (s"$base/idx", s"$base/in", s"$base/out", s"$base/ckpt")
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    val q = emb.filter(col("vec_id") === 0L)
    q.coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 8)
    val victim = StreamingSearch.answers(spark, out)
      .orderBy("rank").collect().head.getAs[Long]("n_id")
    SimilaritySearch.indexDelete(Seq(victim).toDF("vec_id"), idx)
    // the same query arrives again (new file): the new epoch's answers are
    // computed against the post-delete index state
    q.coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 8)
    val latest = StreamingSearch.answers(spark, out)
      .groupBy("epoch").count().orderBy(col("epoch").desc).collect().head.getAs[Int]("epoch")
    val after = StreamingSearch.answers(spark, out)
      .filter(col("epoch") === latest).collect().map(_.getAs[Long]("n_id"))
    assert(!after.contains(victim))
    assert(after.nonEmpty)
  }

  test("compactAnswers: fold + resume yields the same answers rows; epoch dirs " +
    "are bounded; a replay of a folded epoch is skipped by the mark") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve-fold").toString
    val (idx, arrivals, out, ckpt) = (s"$base/idx", s"$base/in", s"$base/out", s"$base/ckpt")
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    // three drains → three epochs
    (0 until 3).foreach { i =>
      emb.filter(col("vec_id") >= i * 3 && col("vec_id") < (i + 1) * 3)
        .coalesce(1).write.mode("append").parquet(arrivals)
      StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2)
    }
    def full(): Set[(Long, Long, Long, Double, Int)] =
      StreamingSearch.answers(spark, out)
        .select("q_id", "n_id", "rank", "sim", "epoch").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
        .toSet
    def epochDirs(): Seq[String] = {
      val d = new java.io.File(s"$out/epochs")
      if (!d.exists()) Seq.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("epoch=")).toSeq.sorted
    }
    val before = full()
    assert(epochDirs().size === 3)
    // partial fold: keep the newest epoch hot
    StreamingSearch.compactAnswers(spark, out, keepLast = 1)
    assert(full() === before, "a fold must not change answers (epoch column included)")
    assert(epochDirs().size === 1, s"folded dirs must be swept, got ${epochDirs()}")
    // a LATE REPLAY of a folded epoch must be skipped by the mark even
    // though its directory no longer exists
    val mark = EpochLog.state(spark, out).mark
    assert(mark >= 0)
    // full fold: zero hot epochs left, answers still identical
    StreamingSearch.compactAnswers(spark, out)
    assert(full() === before)
    assert(epochDirs().isEmpty)
    // resume: a fourth wave lands in a NEW epoch above the mark
    emb.filter(col("vec_id") >= 9 && col("vec_id") < 12)
      .coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2)
    val resumed = full()
    assert(resumed.size > before.size, "post-fold serving must keep appending")
    assert(before.subsetOf(resumed))
    // and a second fold folds base + the new epoch together
    StreamingSearch.compactAnswers(spark, out)
    assert(full() === resumed)
    // the self-applying trigger: under the cap it holds off, over it it folds
    emb.filter(col("vec_id") >= 12 && col("vec_id") < 15)
      .coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2)
    val withHot = full()
    assert(!StreamingSearch.maybeCompactAnswers(spark, out, maxEpochs = 8))
    assert(epochDirs().size === 1, "held-off fold must leave the hot epoch")
    assert(StreamingSearch.maybeCompactAnswers(spark, out, maxEpochs = 0, keepLast = 0))
    assert(epochDirs().isEmpty)
    assert(full() === withHot)
  }

  test("text lane serving: streamed term-set queries equal the batch " +
    "searchTerms; resume answers only new arrivals; text fold preserves rows") {
    import graft.operators.TextSearchIndex
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve-text").toString
    val (idx, arrivals, out, ckpt) = (s"$base/idx", s"$base/in", s"$base/out", s"$base/ckpt")
    TextSearchIndex.build(docs, idx)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double, Long)] =
      df.select("q_id", "rk", "doc_id", "score", "n_hit").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
    val w1 = Seq((1L, Seq("filter", "stream", "vector"))).toDF("q_id", "toks")
    w1.coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveTextAvailableNow(spark, idx, arrivals, out, ckpt, k = 5)
    val served1 = rows(StreamingSearch.textAnswers(spark, out))
    assert(served1 === rows(TextSearchIndex.searchTerms(spark, idx, w1, 5)))
    assert(served1.nonEmpty)
    // same checkpoint, no new arrivals → nothing re-answered
    StreamingSearch.serveTextAvailableNow(spark, idx, arrivals, out, ckpt, k = 5)
    assert(rows(StreamingSearch.textAnswers(spark, out)) === served1)
    // a second wave answers only the new query, cumulatively correct
    val w2 = Seq((2L, Seq("vector", "table"))).toDF("q_id", "toks")
    w2.coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveTextAvailableNow(spark, idx, arrivals, out, ckpt, k = 5)
    val both = rows(StreamingSearch.textAnswers(spark, out))
    assert(both === rows(TextSearchIndex.searchTerms(spark, idx, w1.unionByName(w2), 5)))
    // the text-schema fold preserves answers and bounds dirs
    StreamingSearch.compactAnswers(
      spark, out, keepLast = 0,
      cols = Seq("q_id", "rk", "doc_id", "score", "n_hit", "epoch"))
    assert(rows(StreamingSearch.textAnswers(spark, out)) === both)
    assert(!new java.io.File(s"$out/epochs").exists() ||
      new java.io.File(s"$out/epochs").listFiles()
        .count(_.getName.startsWith("epoch=")) === 0)
    // an index delete takes effect on the NEXT micro-batch
    val victim = both.head._3
    TextSearchIndex.delete(Seq(victim).toDF("doc_id"), idx)
    Seq((3L, Seq("filter", "stream", "vector"))).toDF("q_id", "toks")
      .coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveTextAvailableNow(spark, idx, arrivals, out, ckpt, k = 5)
    val after = rows(StreamingSearch.textAnswers(spark, out))
    assert(!after.exists(r => r._1 == 3L && r._3 == victim),
      "the tombstoned doc must not appear in post-delete answers")
  }

  test("hybrid streaming tier: the two lanes' served answers fuse (RRF) to " +
    "exactly the batch-operator fusion — serving is composition-transparent") {
    import graft.operators.TextSearchIndex
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve-hybrid").toString
    val vIdx = s"$base/vidx"; val tIdx = s"$base/tidx"
    SimilaritySearch.ivfPqIndexBuild(emb, vIdx)
    TextSearchIndex.build(docs, tIdx)
    // one arrival stream, two drains: vector queries + their term sets
    val vq = emb.filter(col("vec_id") < 4)
    val tq = Seq(
      (0L, Seq("filter", "stream", "vector")), (1L, Seq("filter", "stream", "vector")),
      (2L, Seq("filter", "stream", "vector")), (3L, Seq("filter", "stream", "vector"))
    ).toDF("q_id", "toks")
    vq.coalesce(1).write.mode("append").parquet(s"$base/vin")
    tq.coalesce(1).write.mode("append").parquet(s"$base/tin")
    StreamingSearch.serveAvailableNow(
      spark, vIdx, s"$base/vin", s"$base/vout", s"$base/vckpt", k = 10, nprobe = 2)
    StreamingSearch.serveTextAvailableNow(
      spark, tIdx, s"$base/tin", s"$base/tout", s"$base/tckpt", k = 10)
    def fuse(vec: org.apache.spark.sql.DataFrame, txt: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.rrfFuse(
        vec.select(col("q_id"), col("n_id").as("id"), col("rank")),
        txt.select(col("q_id"), col("doc_id").as("id"), col("rk").as("rank")),
        5)
        .select("q_id", "id", "rank", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val served = fuse(
      StreamingSearch.answers(spark, s"$base/vout"),
      StreamingSearch.textAnswers(spark, s"$base/tout"))
    val batch = fuse(
      SimilaritySearch.ivfPqIndexSearch(spark, vIdx, vq, 10, nprobe = 2),
      TextSearchIndex.searchTerms(spark, tIdx, tq, 10))
    assert(served === batch)
    assert(served.nonEmpty)
  }

  test("retention runs inside the serving loop: a drain with a zero epoch " +
    "cap folds its own output; answers unchanged") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve-auto").toString
    val (idx, arrivals, out, ckpt) = (s"$base/idx", s"$base/in", s"$base/out", s"$base/ckpt")
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    emb.filter(col("vec_id") < 4).coalesce(1).write.mode("append").parquet(arrivals)
    StreamingSearch.serveAvailableNow(
      spark, idx, arrivals, out, ckpt, k = 5, nprobe = 2, maxEpochs = 0, keepLast = 0)
    val epochDir = new java.io.File(s"$out/epochs")
    assert(!epochDir.exists() ||
      epochDir.listFiles().count(_.getName.startsWith("epoch=")) === 0,
      "the drain must have folded its own epoch")
    assert(
      pairs(StreamingSearch.answers(spark, out)) ===
        pairs(SimilaritySearch
          .ivfPqIndexSearch(spark, idx, emb.filter(col("vec_id") < 4), 5, nprobe = 2)))
  }

  test("zero-arrival serve leaves an empty answers view, not an error") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-serve-empty").toString
    val (idx, arrivals, out, ckpt) = (s"$base/idx", s"$base/in", s"$base/out", s"$base/ckpt")
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    // an arrivals dir exists but holds no files the stream hasn't seen
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(arrivals))
    StreamingSearch.serveAvailableNow(spark, idx, arrivals, out, ckpt, k = 5)
    assert(StreamingSearch.answers(spark, out).count() === 0L)
  }
}

package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{SimilaritySearch, TextSearchIndex}

/** Contract of the fingerprint-versioned serving cache: a hit can only
  * serve what the live index would answer — every mutation class
  * (append, delete, upsert, compact) moves the fingerprint and so
  * invalidates implicitly, with no writer-side hook to forget. */
class ServingCacheSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana banana date"),
    (2L, "apple elderberry"),
    (3L, "grape apple banana")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("hits serve the identical answer with no recompute; every mutation " +
    "class invalidates implicitly; distinct queries cache separately") {
    ServingCache.clear()
    val idx = java.nio.file.Files.createTempDirectory("graft-servingcache").toString
    TextSearchIndex.build(docs, idx)
    val terms = Seq("apple", "banana")
    def cachedSearch() = rows(ServingCache.cachedTextSearch(spark, idx, terms, 10))
    def direct() = rows(TextSearchIndex.search(spark, idx, terms, 10))

    val (h0, m0) = ServingCache.stats
    val first = cachedSearch()
    assert(first === direct())
    val second = cachedSearch()
    val (h1, m1) = ServingCache.stats
    assert(second === first)
    assert(h1 === h0 + 1 && m1 === m0 + 1, "one miss then one hit")
    // a different query is its own entry, not a collision
    assert(rows(ServingCache.cachedTextSearch(spark, idx, Seq("date"), 10)) ===
      rows(TextSearchIndex.search(spark, idx, Seq("date"), 10)))

    // delete invalidates (no generation bump — the fingerprint moves)
    TextSearchIndex.delete(Seq(0L).toDF("doc_id"), idx)
    val postDelete = cachedSearch()
    assert(!postDelete.exists(_._2 == 0L), "stale hit would still serve doc 0")
    assert(postDelete === direct())
    // append invalidates
    TextSearchIndex.append(Seq((9L, "apple apple apple")).toDF("doc_id", "text"), idx)
    assert(cachedSearch().exists(_._2 == 9L))
    // upsert invalidates
    TextSearchIndex.upsert(Seq((9L, "date date")).toDF("doc_id", "text"), idx)
    assert(!cachedSearch().exists(_._2 == 9L))
    // compact preserves answers — and the refreshed entry then HITS
    val preCompact = cachedSearch()
    TextSearchIndex.compact(spark, idx)
    assert(cachedSearch() === preCompact)
    val (h2, _) = ServingCache.stats
    assert(cachedSearch() === preCompact)
    val (h3, _) = ServingCache.stats
    assert(h3 === h2 + 1, "a quiet index serves from cache")
  }

  test("pluggable store: an injected second-tier store sees the exact " +
    "hit/miss/invalidate protocol the default runs, and answers are " +
    "identical through it") {
    ServingCache.clear()
    val idx = java.nio.file.Files.createTempDirectory("graft-servingcache-store").toString
    TextSearchIndex.build(docs, idx)
    val terms = Seq("apple", "banana")
    // a recording store wrapping the default in-memory impl: same
    // semantics, every protocol call journaled
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]
    val fake = new ServingCache.CacheStore {
      private val inner = new ServingCache.InMemoryStore
      def get(dir: String, queryKey: String) = {
        val r = inner.get(dir, queryKey); ops += s"get:${r.isDefined}"; r
      }
      def put(dir: String, queryKey: String, e: ServingCache.Entry) = {
        ops += "put"; inner.put(dir, queryKey, e)
      }
      def evictStale(dir: String, live: String) = { ops += "evict"; inner.evictStale(dir, live) }
      def capOrClear() = { ops += "cap"; inner.capOrClear() }
    }
    val prev = ServingCache.installStore(fake)
    try {
      def cachedSearch() = rows(ServingCache.cachedTextSearch(spark, idx, terms, 10))
      val first = cachedSearch()
      assert(first === rows(TextSearchIndex.search(spark, idx, terms, 10)),
        "answers through the injected store equal the direct search")
      assert(ops.toSeq === Seq("get:false", "evict", "cap", "put"),
        "a cold miss runs get→evictStale→capOrClear→put")
      ops.clear()
      assert(cachedSearch() === first)
      assert(ops.toSeq === Seq("get:true"), "a hot hit touches only get")
      ops.clear()
      // a mutation moves the fingerprint: the store's stale entry MISSES
      // (the fingerprint check on get is what makes any store safe)
      TextSearchIndex.delete(Seq(0L).toDF("doc_id"), idx)
      val postDelete = cachedSearch()
      assert(!postDelete.exists(_._2 == 0L))
      assert(ops.toSeq === Seq("get:true", "evict", "cap", "put"),
        "a stale entry is found but rejected, then refreshed")
    } finally ServingCache.installStore(prev)
    // with the default restored, the protocol is unchanged (no behavior
    // change from the trait extraction)
    val (h0, m0) = ServingCache.stats
    rows(ServingCache.cachedTextSearch(spark, idx, Seq("date"), 10))
    rows(ServingCache.cachedTextSearch(spark, idx, Seq("date"), 10))
    val (h1, m1) = ServingCache.stats
    assert(h1 === h0 + 1 && m1 === m0 + 1)
  }

  test("file store: two separate SparkSessions share one on-disk answer " +
    "space — the second session HITS on the first's persisted answer, a " +
    "mutation turns it back into a miss, and a torn entry file is a miss, " +
    "never an error") {
    ServingCache.clear()
    val idx = java.nio.file.Files.createTempDirectory("graft-sc-file-idx").toString
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-sc-file-store").toString
    TextSearchIndex.build(docs, idx)
    val terms = Seq("apple", "banana")
    val sessionA = spark.newSession()
    val sessionB = spark.newSession()
    // session A computes through its own FileStore instance...
    val prev = ServingCache.installStore(new ServingCache.FileStore(storeRoot))
    try {
      val first = rows(ServingCache.cachedTextSearch(sessionA, idx, terms, 10))
      assert(first === rows(TextSearchIndex.search(sessionA, idx, terms, 10)))
      // ...and session B, through a FRESH instance over the same root (no
      // shared in-memory state — only the directory), HITS on A's answer
      ServingCache.installStore(new ServingCache.FileStore(storeRoot))
      val (h0, m0) = ServingCache.stats
      val viaB = rows(ServingCache.cachedTextSearch(sessionB, idx, terms, 10))
      val (h1, m1) = ServingCache.stats
      assert(viaB === first)
      assert(h1 === h0 + 1 && m1 === m0,
        "session B must serve A's persisted answer with no recompute")
      // a mutation moves the fingerprint: B's stale persisted entry MISSES
      // and the refreshed answer reflects the mutation
      TextSearchIndex.delete(Seq(0L).toDF("doc_id"), idx)
      val postDelete = rows(ServingCache.cachedTextSearch(sessionB, idx, terms, 10))
      assert(ServingCache.stats._2 === m1 + 1)
      assert(!postDelete.exists(_._2 == 0L) &&
        postDelete === rows(TextSearchIndex.search(sessionB, idx, terms, 10)))
      // torn entry: truncate the persisted file mid-byte — the store reads
      // it as a miss (deleted by the next evictStale), answers stay right
      val entries = java.nio.file.Files.walk(java.nio.file.Paths.get(storeRoot))
        .iterator().asScala.filter(_.toString.endsWith(".entry")).toSeq
      assert(entries.nonEmpty)
      entries.foreach(p => java.nio.file.Files.write(p, Array[Byte](1, 2, 3)))
      val (_, m3) = ServingCache.stats
      assert(rows(ServingCache.cachedTextSearch(sessionB, idx, terms, 10)) === postDelete)
      assert(ServingCache.stats._2 === m3 + 1, "a torn file is a miss, not a hit or error")
      // ...and the recompute re-persisted it: the follow-up is a hit again
      val (h4, _) = ServingCache.stats
      assert(rows(ServingCache.cachedTextSearch(sessionB, idx, terms, 10)) === postDelete)
      assert(ServingCache.stats._1 === h4 + 1)
    } finally ServingCache.installStore(prev)
  }

  test("vector lane: cached IVF-PQ search equals direct; an index upsert " +
    "invalidates") {
    ServingCache.clear()
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-servingcache-vec").toString
    SimilaritySearch.ivfPqIndexBuild(emb, idx, nlist = 4, iters = 2)
    val q = emb.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def cached() = pairs(
      ServingCache.cachedVectorSearch(spark, idx, q, 5, queryKey = "q<4", nprobe = 4))
    val direct = pairs(SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 4))
    assert(cached() === direct)
    val (h0, _) = ServingCache.stats
    assert(cached() === direct)
    assert(ServingCache.stats._1 === h0 + 1)
    // replace one vector: the cached answer must not survive
    val vid = emb.filter(col("vec_id") >= 4).select("vec_id").limit(1)
      .collect().head.getLong(0)
    SimilaritySearch.ivfPqIndexUpsert(
      emb.filter(col("vec_id") === vid)
        .withColumn("embedding", transform(col("embedding"), x => -x)),
      idx)
    assert(cached() ===
      pairs(SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 4)))
  }

  test("cross-JVM: a second java PROCESS (forked, no SparkSession) hits this " +
    "process's persisted entry through a FileStore over the same root, and " +
    "this process hits the entry the child wrote back") {
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-sc-xjvm").toString
    val store = new ServingCache.FileStore(storeRoot)
    val fp = "fp-xjvm-1"
    store.put("idx-dir", "q1",
      ServingCache.Entry(fp, "v BIGINT", Seq(org.apache.spark.sql.Row(7L))))
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq(
      javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.streaming.FileStoreProbe", storeRoot, "idx-dir", "q1", fp))
      .!(scala.sys.process.ProcessLogger(l => { out.append(l).append('\n'); () }, _ => ()))
    assert(code === 0, s"probe JVM failed:\n$out")
    assert(out.toString.contains("HIT:7"),
      s"the child process must hit the parent's persisted entry:\n$out")
    val fromChild = store.get("idx-dir", "q1-from-child")
    assert(
      fromChild.exists(e => e.fingerprint == fp && e.rows.map(_.getLong(0)) == Seq(42L)),
      "the parent must hit the entry the child process persisted")
  }
}

/** Forked-JVM probe for [[ServingCacheSpec]]'s cross-process FileStore
  * check — a bare main with NO SparkSession: reads the parent process's
  * persisted entry (prints `HIT:<values>` / `STALE` / `MISS`) and
  * persists one of its own for the parent to read back. */
object FileStoreProbe {
  def main(args: Array[String]): Unit = {
    val Array(root, dir, key, fp) = args
    val store = new ServingCache.FileStore(root)
    store.get(dir, key) match {
      case Some(e) if e.fingerprint == fp =>
        println("HIT:" + e.rows.map(_.get(0)).mkString(","))
      case Some(_) => println("STALE")
      case None => println("MISS")
    }
    store.put(dir, key + "-from-child",
      ServingCache.Entry(fp, "v BIGINT", Seq(org.apache.spark.sql.Row(42L))))
  }
}

package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.{IndexManifest, TextSearchIndex}

/** Answer cache for a serving tier, versioned by the index's
  * [[IndexManifest.fingerprint]] — correct by construction: the
  * fingerprint covers every mutation class (append, delete, upsert,
  * compact, rebuild), so a hit can only serve the answer the live index
  * would compute, and any mutation invalidates implicitly by changing
  * the key. No TTLs, no explicit invalidation hooks for writers to
  * forget.
  *
  * Shape: answers are top-k — head-sized — so entries are collected
  * driver-side rows, and a hit rebuilds a local DataFrame with NO Spark
  * job. A miss pays the fingerprint walk (one recursive listing — the
  * same metadata cost the uncached query's scan planning performs
  * anyway) plus the real search; a hit pays only the walk. At cluster
  * scale the same (dir, fingerprint, query) key addresses any external
  * KV cache; this in-JVM map is the single-tier form.
  *
  * Staleness economics, explicit: a hot serving index mutates rarely
  * relative to its query rate (mutations are batched at maintenance
  * cadence), so hit rates track the mutation interval. An index mutated
  * every query gains nothing and loses nothing — each miss costs one
  * listing it would have paid planning the scan.
  *
  * Eviction: stale entries for an index are dropped on its next miss
  * (any fingerprint change orphans every older entry for that dir); a
  * global entry cap bounds the map when many distinct queries stream
  * through, clearing wholesale on overflow — a cache, not a store. */
object ServingCache {

  private val MaxEntries = 4096

  /** A cached answer: the index fingerprint it was computed under, the
    * result schema (DDL form — a plain string any store can persist), and
    * the head-sized collected rows. */
  final case class Entry(fingerprint: String, schemaDDL: String, rows: Seq[Row])

  /** The second-tier hook: where (dir, queryKey) → [[Entry]] lives. The
    * serving logic — fingerprint versioning, implicit invalidation, the
    * hit/miss protocol — is store-agnostic; a cluster deployment plugs an
    * external KV (memcached/Redis-shaped) behind this trait and every
    * serving JVM shares one answer space. `evictStale`/`capOrClear` are
    * advisory housekeeping a remote store may implement as no-ops (its
    * own TTL/LRU policy bounds it); correctness never depends on them —
    * a stale entry can only MISS, because the fingerprint is checked on
    * every get. */
  trait CacheStore {
    def get(dir: String, queryKey: String): Option[Entry]
    def put(dir: String, queryKey: String, e: Entry): Unit
    /** Drop entries for `dir` whose fingerprint differs from `live`. */
    def evictStale(dir: String, live: String): Unit
    /** Bound the store (the in-JVM tier clears wholesale at the cap). */
    def capOrClear(): Unit
    /** Advisory full reset (spec hygiene, cache-flush ops). Default no-op
      * for remote stores whose own policy bounds them — correctness never
      * depends on it (a leftover entry can only MISS). */
    def clear(): Unit = ()
  }

  /** The single-tier default: one TrieMap in this JVM. */
  final class InMemoryStore extends CacheStore {
    private val cache = TrieMap.empty[(String, String), Entry]
    def get(dir: String, queryKey: String): Option[Entry] = cache.get((dir, queryKey))
    def put(dir: String, queryKey: String, e: Entry): Unit = cache.put((dir, queryKey), e)
    def evictStale(dir: String, live: String): Unit =
      cache.filterInPlace { case ((d, _), e) => d != dir || e.fingerprint == live }
    def capOrClear(): Unit = if (cache.size >= MaxEntries) cache.clear()
    override def clear(): Unit = cache.clear()
  }

  /** The file-backed second tier — the cross-JVM form of the store: any
    * number of serving JVMs (or successive restarts of one) pointed at
    * the same `root` share one answer space; a second session HITS on an
    * answer a first session computed without recomputing it. Entries are
    * Java-serialized [[Entry]] files under
    * `root/<hash(dir)>/<hash(queryKey)>.entry`, staged and atomically
    * renamed so a concurrent reader never sees a torn file; any
    * unreadable or torn entry reads as a MISS. The cross-process claim
    * is pinned by `ServingCacheSpec`'s forked-JVM probe: a second java
    * PROCESS hits this one's persisted entry and vice versa — not just a
    * second session in one JVM. Correctness never depends
    * on this store's contents or housekeeping: [[cached]] checks the
    * index fingerprint on every get, so a stale or even wrong file can
    * only cost a recompute, never serve a wrong answer. */
  final class FileStore(root: String) extends CacheStore {
    import java.nio.file.{Files, Paths, Path => JPath, StandardCopyOption}
    private val rootPath = Paths.get(root)
    Files.createDirectories(rootPath)

    private def hash(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString

    private def entryPath(dir: String, queryKey: String): JPath =
      rootPath.resolve(hash(dir)).resolve(hash(queryKey) + ".entry")

    private def readEntry(p: JPath): Option[Entry] =
      try {
        val in = new java.io.ObjectInputStream(
          new java.io.BufferedInputStream(Files.newInputStream(p)))
        try Some(in.readObject().asInstanceOf[Entry])
        finally in.close()
      } catch { case _: Exception => None }

    private def entryFiles(d: JPath): Seq[JPath] =
      if (!Files.isDirectory(d)) Seq.empty
      else {
        val s = Files.list(d)
        try s.iterator().asScala.filter(_.toString.endsWith(".entry")).toSeq
        finally s.close()
      }

    private def countEntries(): Long = {
      val dirs = {
        val s = Files.list(rootPath)
        try s.iterator().asScala.toSeq finally s.close()
      }
      dirs.iterator.map(entryFiles(_).size.toLong).sum
    }

    // Approximate entry count so the per-miss [[capOrClear]] is O(1)
    // instead of a full filesystem walk: seeded by one walk at
    // construction (the root may pre-exist, populated by earlier JVMs),
    // bumped on put / evict / clear, and RE-SEEDED from a real walk
    // every [[ReseedEvery]] puts — the counter only sees THIS JVM's
    // traffic, so in the multi-JVM deployment the store advertises, each
    // writer must periodically observe the shared directory or no
    // writer's counter would ever reach the cap and the bound would
    // silently stop holding. Between reseeds drift is tolerated: when
    // the counter crosses the cap, ONE real walk re-counts and either
    // clears or re-seeds — never a wrong answer (the cap is
    // housekeeping; correctness lives in the fingerprint check).
    private val ReseedEvery = 256L
    private val putTicks = new java.util.concurrent.atomic.AtomicLong
    private val approxEntries =
      new java.util.concurrent.atomic.AtomicLong(countEntries())

    def get(dir: String, queryKey: String): Option[Entry] = {
      val p = entryPath(dir, queryKey)
      if (!Files.exists(p)) None else readEntry(p)
    }

    def put(dir: String, queryKey: String, e: Entry): Unit = {
      val p = entryPath(dir, queryKey)
      Files.createDirectories(p.getParent)
      val fresh = !Files.exists(p)
      val tmp = Files.createTempFile(p.getParent, ".stage-", ".tmp")
      val out = new java.io.ObjectOutputStream(
        new java.io.BufferedOutputStream(Files.newOutputStream(tmp)))
      try out.writeObject(e)
      finally out.close()
      Files.move(tmp, p,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      if (fresh) approxEntries.incrementAndGet()
      if (putTicks.incrementAndGet() % ReseedEvery == 0L)
        approxEntries.set(countEntries())
    }

    def evictStale(dir: String, live: String): Unit =
      entryFiles(rootPath.resolve(hash(dir))).foreach { p =>
        // unreadable counts as stale: it can never hit, only take space
        if (!readEntry(p).exists(_.fingerprint == live) && Files.deleteIfExists(p))
          approxEntries.decrementAndGet()
      }

    def capOrClear(): Unit =
      if (approxEntries.get >= MaxEntries) {
        val real = countEntries()
        if (real >= MaxEntries) clear() else approxEntries.set(real)
      }

    override def clear(): Unit = {
      val s = Files.list(rootPath)
      val dirs = try s.iterator().asScala.toSeq finally s.close()
      dirs.foreach(d => entryFiles(d).foreach(Files.deleteIfExists(_)))
      approxEntries.set(0L)
    }
  }

  private val defaultStore = new InMemoryStore
  @volatile private var store: CacheStore = defaultStore

  /** Install a second-tier store (and return the previous one, so specs
    * and deployments can restore it). The protocol the store sees is
    * exactly the one the default sees — ServingCacheSpec pins it. */
  def installStore(s: CacheStore): CacheStore = {
    val prev = store
    store = s
    prev
  }

  private val hitCount = new java.util.concurrent.atomic.AtomicLong
  private val missCount = new java.util.concurrent.atomic.AtomicLong

  /** (hits, misses) since JVM start — for specs and capacity planning. */
  def stats: (Long, Long) = (hitCount.get, missCount.get)

  /** Reset the ACTIVE store (and the default one, if a second tier is
    * installed over it — spec-order hygiene: no session's entries survive
    * a clear just because a store swap raced it). */
  private[graft] def clear(): Unit = {
    store.clear()
    if (!(store eq defaultStore)) defaultStore.clear()
  }

  /** Serve `queryKey` against the index at `dir` through the cache:
    * recompute via `compute` only when the index's live state has moved
    * since the cached answer. The returned DataFrame is driver-local on
    * a hit (no job). */
  private[graft] def cached(
      spark: SparkSession,
      dir: String,
      layout: IndexManifest.Layout,
      queryKey: String)(compute: => DataFrame): DataFrame = {
    val fp = IndexManifest.fingerprint(spark, dir, layout)
    store.get(dir, queryKey) match {
      case Some(e) if e.fingerprint == fp =>
        hitCount.incrementAndGet()
        spark.createDataFrame(
          e.rows.asJava,
          org.apache.spark.sql.types.StructType.fromDDL(e.schemaDDL))
      case _ =>
        missCount.incrementAndGet()
        // any fingerprint change orphans every older entry for this dir
        store.evictStale(dir, fp)
        store.capOrClear()
        val df = compute
        val rows = df.collect().toSeq
        val ddl = df.schema.toDDL
        store.put(dir, queryKey, Entry(fp, ddl, rows))
        spark.createDataFrame(
          rows.asJava, org.apache.spark.sql.types.StructType.fromDDL(ddl))
    }
  }

  /** [[TextSearchIndex.search]] through the cache — the serving form of
    * the BM25 lane: repeated hot queries cost one metadata walk until
    * the index actually changes. */
  def cachedTextSearch(
      spark: SparkSession,
      dir: String,
      terms: Seq[String],
      k: Int): DataFrame =
    cached(spark, dir, IndexManifest.Layouts.text, s"bm25:$k:${terms.mkString("\u0000")}") {
      TextSearchIndex.search(spark, dir, terms, k)
    }

  /** [[graft.operators.SimilaritySearch.ivfPqIndexSearch]] through the
    * cache — the vector lane's serving form. The query batch is part of
    * the key via the caller-supplied `queryKey` (vector literals are too
    * wide to stringify here usefully; serving tiers key on query id). */
  def cachedVectorSearch(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      queryKey: String,
      nprobe: Int = 2): DataFrame =
    cached(spark, dir, IndexManifest.Layouts.ivfpq, s"ivfpq:$k:$nprobe:$queryKey") {
      graft.operators.SimilaritySearch.ivfPqIndexSearch(spark, dir, queries, k, nprobe)
    }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for large-scale document corpora (SURVEY.md §7.2
  * M5). Each takes the `documents` table shape `(doc_id, text, …)` and
  * returns a deterministic DataFrame.
  *
  * Scale design: every variant is a pure shuffle-on-key plan — no driver-side
  * state, no collect. Candidate generation (LSH band / blocking key) bounds
  * the pairwise phase so the quadratic step only runs inside buckets; at
  * 100 TB skewed buckets are the risk, handled by AQE skew-join splitting
  * (and, where a bucket is pathological, a `salt` column can be added to the
  * band key without changing semantics).
  */
object Dedup {

  /** Exact dedup by content fingerprint (hash-groupBy): one row per distinct
    * normalized text, keeper = min doc_id, n = group size. Map-side partial
    * aggregation makes this a single efficient shuffle at any scale. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))

  /** Exact dedup keeping the LONGEST member of each duplicate group (ties →
    * lowest doc_id) — the curation-standard alternative to first-wins when
    * near-identical pages differ by truncation and the fullest copy should
    * survive. Same one-pass hash-aggregate shape as [[exact]]: the argmax is
    * `min_by` over a struct ordering key (lexicographic: -chars, then id),
    * so duplicates collapse map-side and nothing sorts — no window, no
    * second pass. Returns (fp, keep_id, n_members, max_chars). */
  def exactKeepLongest(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("n_chars"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(
        min_by(col("doc_id"), struct((-col("n_chars")).as("neg"), col("doc_id")))
          .as("keep_id"),
        count(lit(1)).cast("long").as("n_members"),
        max(col("n_chars")).cast("long").as("max_chars"))

  /** Shingle verification applied to an id-only candidate pair set.
    *
    * Structure matters for performance: candidates are generated as bare
    * (a_id, b_id) pairs first, and only then joined back to the shingle
    * arrays — so the heavy set arithmetic runs once per *surviving candidate*
    * in a codegen'd projection, instead of being pushed into the candidate
    * join's condition and re-evaluated (interpreted — array set ops are
    * CodegenFallback) for every probed pair. Profiled ~30× faster at sf0.1.
    */
  /** Shared verification stage for shingle-overlap measures:
    * `(a_id, b_id) → (a_id, b_id, n_inter, na, nb)`.
    *
    * Shingles are computed ONLY for documents that appear in a candidate
    * pair: semi-join prune first, then shingle the survivors. At 100 TB the
    * candidate set is a sliver of the corpus, so this replaces two
    * full-corpus tokenize+shingle passes (one per join side) with two
    * passes over the survivor set; the candidate subtree is evaluated once
    * more to produce the id list, which is cheap post-cap (id pairs only).
    */
  private def candidateShingleStats(
      candidates: DataFrame, // (a_id, b_id)
      documents: DataFrame // raw (doc_id, text, …)
  ): DataFrame = {
    val ids = candidates
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct()
    val sh = shingleTable(documents.join(ids, Seq("doc_id"), "left_semi"))
    val sa = sh.select(col("doc_id").as("a_id"), col("sh").as("sa"))
    val sb = sh.select(col("doc_id").as("b_id"), col("sh").as("sb"))
    candidates
      .join(sa, Seq("a_id"))
      .join(sb, Seq("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        sortedIntersectCount(col("sa"), col("sb")).cast("long").as("n_inter"),
        size(col("sa")).cast("long").as("na"),
        size(col("sb")).cast("long").as("nb"))
  }

  private def verifyJaccard(
      candidates: DataFrame, // (a_id, b_id)
      documents: DataFrame, // raw (doc_id, text, …)
      threshold: Double): DataFrame = {
    candidateShingleStats(candidates, documents)
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .withColumn(
        "jac",
        when(col("n_union") > 0, col("n_inter").cast("double") / col("n_union")))
      // Known plan shape (PlanAudit --run): Catalyst pushes this filter into
      // the pair join as an extra condition, inlining the intersect kernel
      // ~3x per pair (join conditions get no subexpression elimination).
      // Accepted: the candidate stage is cap-bounded and the kernel is a
      // linear merge; the alternatives are worse — the algebraic rewrite
      // (inter*(1+t) >= t*(na+nb)) flips borderline IEEE comparisons vs the
      // division-form oracle, and a nondeterministic barrier column would
      // also block the useful a_id < b_id pushdown.
      .filter(col("jac") >= threshold)
  }

  /** Hashed shingle sets: distinct word-3-gram 64-bit hashes per document —
    * set-identical to string shingles up to 64-bit collisions (~1e-14 per
    * pair at these set sizes), at a fraction of the compute and shuffle
    * width. */
  private def shingleTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), shingleHashes(tokens(col("text")), 3).as("sh"))

  /** Skew guard for candidate self-joins: drops buckets with more than
    * `maxBucket` members before the pairwise join. A hot bucket (template/
    * boilerplate text hashing to one band value) makes the self-join
    * quadratic in that bucket — n=10^6 members is 5·10^11 pairs, a dead
    * executor at 100 TB. Members of oversized buckets are near-certain
    * duplicates of each other at far lower similarity resolution than LSH
    * needs; production pipelines route them to exact dedup ([[exact]])
    * instead. The cap is a semantic no-op when no bucket exceeds it.
    *
    * Implemented as a count window over the bucket key, not an
    * aggregate + anti-join: the window evaluates `keyed` (whose subtree
    * carries the signature computation) ONCE, where the join form evaluates
    * it twice — and the signature pass over the corpus, not the cap, is the
    * dominant term at scale. The window DOES buffer each bucket's rows in
    * one task (WindowExec materializes the partition via
    * ExternalAppendOnlyUnsafeRowArray, spilling past
    * spark.sql.windowExec.buffer.spill.threshold), but every call site keys
    * narrow rows (doc_id + bucket/signature, fixed-width), so a pathological
    * 10^7-row clone bucket buffers ~10^2 MB in its one task — bounded spill,
    * not a quadratic blowup, and the bucket is then dropped. Measured
    * (graft.tools.CapBench, sf0.1 docs + 100k clones of one doc → a 400k-row
    * hot bucket): window 0.90 s vs agg+broadcast-anti 1.26 s; clean corpus
    * 0.57 s vs 0.72 s — the double signature evaluation costs more than the
    * buffering even under heavy skew, and the gap widens with corpus size
    * since the anti-join form re-tokenizes the whole corpus. */
  private[graft] def capBuckets(keyed: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    keyed
      .withColumn("_bn", count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("_bn") <= maxBucket)
      .drop("_bn")
  }

  /** Candidate pairs by 40-char-normalized-prefix blocking + word-3-gram
    * Jaccard verification. Returns (a_id, b_id, n_inter, n_union, jac) for
    * pairs with jac ≥ threshold. Blocking bounds the self-join; the Jaccard
    * check is exact set arithmetic on distinct shingles. */
  def ngramJaccardPairs(
      documents: DataFrame,
      threshold: Double = 0.3,
      maxBucket: Int = 2000): DataFrame = {
    val keyed = capBuckets(
      documents.select(col("doc_id"), md5(substring(normalize(col("text")), 1, 40)).as("bk")),
      Seq("bk"),
      maxBucket)
    val candidates = keyed
      .select(col("doc_id").as("a_id"), col("bk"))
      .join(keyed.select(col("doc_id").as("b_id"), col("bk")), Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    verifyJaccard(candidates, documents, threshold)
      .select("a_id", "b_id", "n_inter", "n_union", "jac")
  }

  /** Asymmetric shingle CONTAINMENT near-dup:
    * `cont = |A∩B| / min(|A|, |B|)` over the same prefix-blocked candidate
    * space as [[ngramJaccardPairs]]. Catches subset duplication that
    * Jaccard structurally cannot: a document quoted whole inside a much
    * larger one has `jac ≈ |A|/|B| → 0` but containment 1.0 — the
    * boilerplate-wrapper and quote-expansion cases a crawl corpus is full
    * of. Same blocking bound, same cap, same semi-join-pruned verify; the
    * only change is the final measure, one IEEE division of exact longs.
    * Returns (a_id, b_id, n_inter, na, nb, cont) for cont ≥ threshold.
    *
    * Blocking caveat (same contract as the Jaccard variant): the 40-char
    * normalized-prefix block finds prefix-sharing pairs — the
    * quote-at-the-start and append-suffix cases. A contained quote that
    * starts mid-document needs the [[minhashLshPairs]] banding or the
    * [[duplicatedSpanStats]] span index as the candidate source instead;
    * the verify stage here accepts any (a_id, b_id) candidate frame.
    */
  def ngramContainmentPairs(
      documents: DataFrame,
      threshold: Double = 0.6,
      maxBucket: Int = 2000): DataFrame = {
    val keyed = capBuckets(
      documents.select(col("doc_id"), md5(substring(normalize(col("text")), 1, 40)).as("bk")),
      Seq("bk"),
      maxBucket)
    val candidates = keyed
      .select(col("doc_id").as("a_id"), col("bk"))
      .join(keyed.select(col("doc_id").as("b_id"), col("bk")), Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    candidateShingleStats(candidates, documents)
      .withColumn(
        "cont",
        when(
          least(col("na"), col("nb")) > 0,
          col("n_inter").cast("double") / least(col("na"), col("nb"))))
      .filter(col("cont") >= threshold)
      .select("a_id", "b_id", "n_inter", "na", "nb", "cont")
  }

  /** LSH band buckets with the signature carried along:
    * `(doc_id, sig, bucket)`, one row per (doc, band). Signature first
    * (native single-pass kernel), then explode *literal* band indices and
    * slice the materialized signature attribute — exploding an array of
    * per-band keys would inline the signature expression into the Generate
    * and re-evaluate it per band (profiled ~85× slower). Shingle-less docs
    * (< 3 tokens) emit no rows. */
  private[graft] def bandedBuckets(documents: DataFrame, numPerm: Int, bands: Int): DataFrame = {
    val rowsPerBand = numPerm / bands
    shingleTable(documents)
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numPerm))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .select(
        col("doc_id"),
        col("sig"),
        hash((col("band") +: (0 until rowsPerBand).map { r =>
          element_at(col("sig"), col("band") * rowsPerBand + r + 1)
        }): _*).as("bucket"))
  }

  /** The persisted LSH index of a corpus for incremental/streaming
    * batch-vs-corpus near-dedup: `(bucket, c_id, c_sig)`, one row per
    * (corpus doc, band). An arriving document computes its own bands with
    * the same parameters and equi-joins on `bucket`; the carried signature
    * lets the consumer estimate Jaccard by component agreement without ever
    * rescanning corpus text. O(corpus × bands) rows, append-only as the
    * corpus grows — the natural parquet-table shape.
    *
    * Oversized buckets are dropped at build time (same `maxBucket` policy
    * and rationale as the batch candidate joins): a boilerplate bucket with
    * 10^6 corpus members would fan every matching arrival out ×10^6 rows
    * per band, every micro-batch — those clone groups belong to exact
    * dedup ([[exact]] / [[graft.streaming.StreamingDedup.classify]]), not
    * a similarity join. The cap is a semantic no-op when no bucket
    * exceeds it. */
  def minhashIndex(
      corpus: DataFrame,
      numPerm: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 2000): DataFrame =
    capBuckets(bandedBuckets(corpus, numPerm, bands), Seq("bucket"), maxBucket)
      .select(col("bucket"), col("doc_id").as("c_id"), col("sig").as("c_sig"))

  /** Persist the corpus LSH index on disk with the full
    * build/append/delete/compact lifecycle (the [[graft.operators
    * .SimilaritySearch.ivfIndexBuild]] discipline applied to the minhash
    * family). Logical tables under `dir`, resolved through the
    * generation-numbered [[IndexManifest]] (physical dirs are
    * generation-suffixed; the manifest commit is the atomic cut-over):
    *
    *  - `meta`: one row (num_perm, bands, max_bucket) — appends and
    *    queries MUST band under the build parameters or buckets never
    *    collide, so the index carries them;
    *  - `index`: the (bucket, c_id, c_sig) rows of [[minhashIndex]];
    *  - tombstone segment: pending logical deletes ([[Tombstones]]).
    *
    * A rebuild commits a fresh generation — stale tombstones and old
    * segments vanish in the same manifest bump. */
  def minhashIndexBuild(
      corpus: DataFrame,
      dir: String,
      numPerm: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 2000): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val layout = IndexManifest.Layouts.minhash
    val next = layout.advance(IndexManifest.resolve(spark, dir, layout))
    Seq((numPerm, bands, maxBucket))
      .toDF("num_perm", "bands", "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(next.tableDir(dir, "meta"))
    minhashIndex(corpus, numPerm, bands, maxBucket)
      .write.mode("overwrite").parquet(next.tableDir(dir, "index"))
    IndexManifest.commit(spark, dir, next, layout)
  }

  private def minhashState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): IndexManifest.State =
    IndexManifest.resolve(spark, dir, IndexManifest.Layouts.minhash)

  private def minhashIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Int, Int, Int) =
    minhashIndexMetaAt(spark, dir, minhashState(spark, dir))

  private def minhashIndexMetaAt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): (Int, Int, Int) = {
    val r = spark.read.parquet(st.tableDir(dir, "meta"))
      .select("num_perm", "bands", "max_bucket").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  /** The LIVE index rows — base ∪ streamed segment, minus pending
    * deletes: the static side every consumer ([[minhashIndexCandidates]],
    * [[graft.streaming.StreamingDedup.classifyNear]]) reads. A
    * fully-tombstoned index compacts to a zero-row base with no
    * schema-carrying files, and a zero-batch stream run leaves only an
    * empty sink log; either reads as "no rows here", not an error. */
  def minhashIndexRows(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    minhashIndexRowsAt(spark, dir, minhashState(spark, dir))

  /** The rows a given manifest state names — [[minhashIndexRows]] at the
    * live state; the AsOf lane passes a pinned snapshot state instead
    * (same plan, that generation's segments and pending tombstones). */
  private def minhashIndexRowsAt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): DataFrame = {
    import org.apache.spark.sql.types._
    def readIf(p: String): Option[DataFrame] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(path)) None
      else
        try Some(spark.read.parquet(p))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    // rows tagged with their segment's creation generation — the scope
    // key for generation-scoped tombstones (an upsert's replacement
    // segment outranks the scoped delete that killed the old copies)
    val base = (readIf(st.tableDir(dir, "index"))
      .map(_.withColumn("seg_gen", lit(IndexManifest.segGen(st.tables("index"))))) ++
      readIf(st.streamDir(dir))
        .map(_.withColumn("seg_gen", lit(IndexManifest.segGen(st.stream)))))
      .reduceLeftOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("bucket", IntegerType),
          StructField("c_id", LongType),
          StructField("c_sig", ArrayType(LongType)),
          StructField("seg_gen", LongType, nullable = false)))))
    // the anti-join moves its key first — re-project to the stable order
    // (the projection also consumes the scope tag)
    Tombstones.dropScoped(base, dir, "c_id", "seg_gen", st.tombstones)
      .select("bucket", "c_id", "c_sig")
  }

  /** Append a corpus batch under the index's STORED parameters (partition
    * append — existing files untouched, the corpus never rescanned). The
    * `maxBucket` cap applies within the batch only: a bucket can exceed
    * the cap across appends, exactly like any LSM index whose per-segment
    * invariants are restored at compaction — the candidate-join consumers
    * keep their own caps as the backstop. */
  def minhashIndexAppend(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    val st = minhashState(spark, dir)
    val (numPerm, bands, maxBucket) = minhashIndexMetaAt(spark, dir, st)
    // growth path only: an id an earlier upsert killed would land below
    // the kill's scope and silently not serve — refuse loudly instead
    Tombstones.requireAppendable(
      batch.select("doc_id"), dir, "doc_id", st.tombstones,
      IndexManifest.segGen(st.tables("index")))
    minhashIndex(batch, numPerm, bands, maxBucket)
      .write.mode("append").parquet(st.tableDir(dir, "index"))
  }

  /** Continuous-ingest version of [[minhashIndexAppend]] — the
    * [[graft.operators.SimilaritySearch.ivfIndexAppendStream]] contract on
    * the LSH family: drain a parquet directory of arriving documents into
    * the index as a Structured Streaming job (Trigger.AvailableNow +
    * checkpoint → re-invoking with the same checkpoint ingests ONLY files
    * that arrived since the last run). Banding under the STORED parameters
    * is a pure per-document projection (shingle → signature → band keys),
    * so the whole build runs inside the stream — no state store, no
    * corpus rescan.
    *
    * Streamed rows land in a separate `index-stream/` segment (a
    * streaming parquet sink owns its directory through the
    * `_spark_metadata` commit log — sharing the batch `index/` dir would
    * hide the batch files from readers); [[minhashIndexRows]] unions base
    * + stream and [[minhashIndexCompact]] folds the segment back. The
    * `maxBucket` cap is an AGGREGATION and cannot run inside an
    * append-mode stream, so streamed rows are uncapped until compaction —
    * the same per-segment-invariant LSM reasoning as the batch append's
    * per-batch cap; candidate-join consumers keep their own caps as the
    * backstop. */
  def minhashIndexAppendStream(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      arrivalsDir: String,
      checkpoint: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val (numPerm, bands, _) = minhashIndexMeta(spark, indexDir)
    val raw = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .parquet(arrivalsDir)
    val q = bandedBuckets(raw, numPerm, bands)
      .select(col("bucket"), col("doc_id").as("c_id"), col("sig").as("c_sig"))
      .writeStream
      .format("parquet")
      .option("path", minhashState(spark, indexDir).streamDir(indexDir))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Logical delete of corpus documents: O(ids) tombstone append, applied
    * by every read through [[minhashIndexRows]] and physically at
    * [[minhashIndexCompact]] (the [[Tombstones]] contract — takedowns and
    * licensing retractions never force an index rebuild). */
  def minhashIndexDelete(ids: DataFrame, dir: String): Unit = {
    // UNSCOPED (ts_gen = MaxValue): the takedown keeps hiding the id in
    // every future segment (later appends included) until compaction, or
    // until a minhashIndexUpsert of that very id drops the tombstone —
    // the one sanctioned re-add path. A live-generation scope would let
    // an unrelated later upsert open a resurrection window for plain
    // appends of the deleted id.
    val st = minhashState(ids.sparkSession, dir)
    Tombstones.delete(ids, dir, st.tombstones)
  }

  /** Atomic replace on the persisted LSH index — the re-crawl mutation
    * (a document's text changed; its OLD shingle signature must stop
    * colliding and the NEW one start) in ONE manifest commit, via
    * generation-scoped tombstones (the [[graft.operators.TextSearchIndex
    * .upsert]] discipline on this family): base carried, batch ids
    * tombstoned at the CURRENT generation, streamed segment rewritten at
    * the next generation (pending deletes applied physically, carried
    * tombstones kept at their scope minus the batch ids') plus the batch
    * banded under the STORED
    * parameters. O(stream + batch); also the sanctioned re-add of a
    * deleted id. A non-shingleable replacement (< 3 tokens) indexes no
    * rows — the upsert then degrades to the delete, correctly. */
  def minhashIndexUpsert(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    val layout = IndexManifest.Layouts.minhash
    val prev = minhashState(spark, dir)
    val (numPerm, bands, maxBucket) = minhashIndexMeta(spark, dir)
    val next = layout.advance(prev, carry = Set("meta", "index"))
    val ids = batch.select(col("doc_id").cast("long").as("c_id")).distinct()
    val fresh = minhashIndex(batch, numPerm, bands, maxBucket)
    val streamPath = new org.apache.hadoop.fs.Path(prev.streamDir(dir))
    val carried =
      (if (!streamPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(streamPath))
        None
      else
        try Some(spark.read.parquet(prev.streamDir(dir)))
        catch { case _: org.apache.spark.sql.AnalysisException => None })
        .map { s =>
          Tombstones.dropScoped(
            s.withColumn("seg_gen", lit(IndexManifest.segGen(prev.stream))),
            dir, "c_id", "seg_gen", prev.tombstones)
            .drop("seg_gen")
            .join(ids, Seq("c_id"), "left_anti")
            .select("bucket", "c_id", "c_sig")
        }
    carried.fold(fresh)(_ unionByName fresh)
      .write.mode("overwrite").parquet(next.streamDir(dir))
    // carried pending tombstones keep their scope (an unscoped delete
    // keeps killing future appends); only the batch ids' prior rows drop
    val killed = ids.select(col("c_id").as("ts_id"), lit(prev.generation).as("ts_gen"))
    Tombstones.read(spark, dir, prev.tombstones)
      .map(_.join(ids.select(col("c_id").as("ts_id")), Seq("ts_id"), "left_anti"))
      .fold(killed)(_ unionByName killed)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/${next.tombstones}")
    IndexManifest.commit(spark, dir, next, layout)
  }

  /** Major compaction: fold the streamed segment back into the base,
    * apply pending deletes physically, and RESTORE the build-time
    * `maxBucket` invariant (per-batch/uncapped-stream appends can push a
    * bucket over the cap; a compacted index equals a fresh
    * [[minhashIndexBuild]] of the live corpus, which would drop that
    * bucket) — one rewrite covers all three, the
    * [[graft.operators.SimilaritySearch.ivfIndexCompact]] lifecycle
    * close. Runs when either a streamed segment or tombstones exist; the
    * source CHECKPOINT is untouched, so a later
    * [[minhashIndexAppendStream]] still skips already-ingested files.
    *
    * Crash consistency ([[IndexManifest]]): the folded base is written to
    * the NEXT generation's dir first, then one manifest commit swaps
    * base + stream + tombstone segments atomically — a crash before the
    * commit leaves the old generation fully live (never a silently-empty
    * index), a crash after it leaves the new one (never double-counted
    * folded rows). */
  def minhashIndexCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val layout = IndexManifest.Layouts.minhash
    val prev = IndexManifest.resolve(spark, dir, layout)
    val hasStream = fs.exists(new org.apache.hadoop.fs.Path(prev.streamDir(dir)))
    if (!hasStream && Tombstones.read(spark, dir, prev.tombstones).isEmpty) return
    val (_, _, maxBucket) = minhashIndexMeta(spark, dir)
    val next = layout.advance(prev, carry = Set("meta"))
    capBuckets(minhashIndexRows(spark, dir), Seq("bucket"), maxBucket)
      .write.mode("overwrite").parquet(next.tableDir(dir, "index"))
    IndexManifest.commit(spark, dir, next, layout)
  }

  /** Apply the [[CompactionTrigger]] heuristic to the minhash index:
    * compact when pending tombstones exceed `ratio` of the base rows or
    * the streamed segment exceeds `streamRatio` of them. Returns whether
    * a compaction ran. */
  def minhashIndexMaybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      ratio: Double = 0.01,
      streamRatio: Double = 0.25): Boolean = {
    val st = minhashState(spark, dir)
    val due = CompactionTrigger.due(
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "index")),
      CompactionTrigger.rowsIn(spark, st.streamDir(dir)),
      Tombstones.read(spark, dir, st.tombstones).fold(0L)(_.count()),
      ratio,
      streamRatio)
    if (due) minhashIndexCompact(spark, dir)
    due
  }

  /** Batch near-dup candidates of `batch` against the persisted index:
    * the batch bands under the STORED parameters, equi-joins live index
    * rows on `bucket`, and estimates Jaccard as the fraction of agreeing
    * MinHash components (the [[graft.streaming.StreamingDedup
    * .classifyNear]] estimate, batch-shaped). Corpus text is never
    * rescanned; the estimate is identical from any colliding band, so the
    * pair dedup is value-stable.
    *
    * The `maxBucket` cap is enforced over the LIVE rows here (not only at
    * build/compaction): per-batch and streamed appends can push a bucket
    * over the cap between compactions, and an uncapped hot bucket would
    * fan every colliding probe out by its full size. The live rows are
    * first pruned to the batch's own buckets (a semi-join — whole buckets
    * survive, so the per-bucket count stays exact), which bounds the cap's
    * window aggregation to exactly the rows the join was about to touch. */
  def minhashIndexCandidates(batch: DataFrame, dir: String): DataFrame =
    minhashIndexCandidatesState(
      batch, dir, minhashState(batch.sparkSession, dir))

  /** [[minhashIndexCandidates]] pinned to a RETAINED manifest generation
    * ([[IndexManifest.readAt]]) — the dedup family's time-travel read,
    * the [[graft.operators.TextSearchIndex.searchAsOf]] contract: replay
    * exactly the candidate set a past generation's index would have
    * produced — its banding parameters, its segments, its pending
    * tombstones — after upserts, appends or a compaction moved the live
    * index on. This is the reproducibility audit a corpus build needs
    * ("which near-dups did the dedup pass at generation G see?"). Fails
    * loudly outside the retention window: a snapshot query must never
    * silently answer from a different state.
    *
    * Carve-out (shared by every family's AsOf lane): exact replay holds
    * across MANIFEST-ADVANCING mutations (append, upsert, compact,
    * rebuild). Plain deletes append into the live tombstone segment
    * in place — the same segment retained snapshots name — so a
    * takedown issued AFTER generation G retroactively hides the id in
    * G's replay too. That is deliberate: takedown compliance must reach
    * audit reads, or a snapshot becomes a loophole for serving retracted
    * data (`IndexSnapshotSpec`-pinned behavior). */
  def minhashIndexCandidatesAsOf(
      batch: DataFrame,
      dir: String,
      generation: Long): DataFrame = {
    val spark = batch.sparkSession
    val st = IndexManifest.readAt(spark, dir, generation).getOrElse(
      sys.error(
        s"minhash index at $dir retains no generation-$generation manifest " +
          s"(snapshots: ${IndexManifest.snapshots(spark, dir).mkString(",")})"))
    minhashIndexCandidatesState(batch, dir, st)
  }

  private def minhashIndexCandidatesState(
      batch: DataFrame,
      dir: String,
      st: IndexManifest.State): DataFrame = {
    val spark = batch.sparkSession
    val (numPerm, bands, maxBucket) = minhashIndexMetaAt(spark, dir, st)
    val banded = bandedBuckets(batch, numPerm, bands)
    val probedLive = minhashIndexRowsAt(spark, dir, st)
      .join(banded.select("bucket").distinct(), Seq("bucket"), "left_semi")
    banded
      .join(capBuckets(probedLive, Seq("bucket"), maxBucket), Seq("bucket"))
      .filter(col("doc_id") =!= col("c_id"))
      .select(
        col("doc_id"),
        col("c_id"),
        (size(filter(zip_with(col("sig"), col("c_sig"), (a, b) => a === b), x => x))
          / lit(numPerm.toDouble)).as("est"))
      .dropDuplicates("doc_id", "c_id")
  }

  /** MinHash + LSH near-dup pairs: shingle → 16-perm MinHash signature →
    * 4 bands × 4 rows → band-bucket self-join for candidates → exact Jaccard
    * verification ≥ threshold. The full pairwise phase never materializes;
    * only same-band-bucket pairs are compared. */
  def minhashLshPairs(
      documents: DataFrame,
      threshold: Double = 0.5,
      numPerm: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 2000): DataFrame = {
    val capped =
      capBuckets(bandedBuckets(documents, numPerm, bands).drop("sig"), Seq("bucket"), maxBucket)
    val cand = capped
      .select(col("bucket"), col("doc_id").as("a_id"))
      .join(capped.select(col("bucket"), col("doc_id").as("b_id")), Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id") // same pair can collide in >1 band
    verifyJaccard(cand, documents, threshold)
      .select("a_id", "b_id", "jac")
  }

  /** SimHash near-dup pairs: 64-bit signature per doc, candidates generated
    * by matching any of four 16-bit signature chunks (docs within Hamming
    * distance ≤ maxHamming of each other must share at least one chunk when
    * maxHamming < 4), then exact Hamming verification.
    *
    * Ordering contract at scale: run [[exact]] dedup BEFORE this operator on
    * duplicate-heavy corpora. Chunk buckets are denser than LSH bands or
    * prefix blocks (16-bit space vs content-keyed), so exact-duplicate
    * inflation grows candidates quadratically per clone group — measured at
    * 20× replicated sf0.1 docs: 221 s here vs 14-18 s for the minhash/ngram
    * variants on the same corpus. Collapsing exact dups first (the
    * [[graft.operators.Curation]] order) removes the clone groups that
    * cause it; `maxBucket` remains the backstop for organic template text. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3, maxBucket: Int = 2000): DataFrame = {
    // Literal chunk indices exploded *after* the signature is materialized —
    // exploding an array of per-chunk structs would inline (and interpret)
    // the whole simhash fold once per chunk (see minhashLshPairs note).
    val chunked = capBuckets(
      documents
        .select(col("doc_id"), simhash(tokens(col("text"))).as("sig"))
        .withColumn("chunk", explode(sequence(lit(0), lit(3))))
        .select(
          col("doc_id"),
          col("sig"),
          struct(
            col("chunk"),
            call_function("shiftright", col("sig"), col("chunk") * 16)
              .bitwiseAND(lit(0xffffL))
              .as("bits")).as("ck")),
      Seq("ck"),
      maxBucket)
    val a = chunked.select(col("ck"), col("doc_id").as("a_id"), col("sig").as("siga"))
    val b = chunked.select(col("ck"), col("doc_id").as("b_id"), col("sig").as("sigb"))
    a.join(b, Seq("ck"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming(col("siga"), col("sigb")).as("dist"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("dist") <= maxHamming)
  }

  /** Benchmark decontamination: corpus documents sharing ≥ `threshold`
    * word-3-gram Jaccard with ANY document of an evaluation/benchmark set —
    * the cross-corpus variant of [[ngramJaccardPairs]] (a_id = corpus doc,
    * b_id = benchmark doc). Candidates come from equality on the same
    * 40-char-normalized-prefix blocking key, evaluated once per side; the
    * benchmark side is typically tiny and broadcasts, so the corpus is never
    * shuffled for candidate generation. Verification reuses the id-only
    * semi-join-pruned shingle pass, so shingles are computed only for
    * documents that block-collide. Returns one row per contaminated
    * (corpus, benchmark) pair; drop contaminated docs with
    * `corpus.join(broadcast(pairs.select("a_id").distinct()), "left_anti")`. */
  def contaminationPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double = 0.3,
      maxBucket: Int = 2000): DataFrame = {
    // Ids are namespaced internally as (side, id) structs: benchmark sets
    // commonly number their own ids from 0, so a corpus/benchmark doc_id
    // collision is realistic — and without the tag, the shingle-source union
    // would nondeterministically pick one side's text for the colliding id
    // and verify candidates against the wrong document. Struct join keys
    // cost nothing extra (fixed-width, codegen'd equality), and the tag is
    // unwrapped before returning.
    def tag(d: DataFrame, side: Int) =
      d.select(struct(lit(side).as("side"), col("doc_id").as("id")).as("doc_id"), col("text"))
    val c = tag(corpus, 0)
    val b = tag(benchmark, 1)
    def keyed(d: DataFrame) =
      d.select(col("doc_id"), md5(substring(normalize(col("text")), 1, 40)).as("bk"))
    val candidates = capBuckets(keyed(c), Seq("bk"), maxBucket)
      .select(col("doc_id").as("a_id"), col("bk"))
      .join(broadcast(keyed(b).select(col("doc_id").as("b_id"), col("bk"))), Seq("bk"))
      .select("a_id", "b_id")
    // Shingle source spans both sides; the side tag keeps colliding raw ids
    // distinct, so each candidate resolves to exactly its own document.
    verifyJaccard(candidates, c.unionByName(b), threshold)
      .select(col("a_id.id").as("a_id"), col("b_id.id").as("b_id"), col("jac"))
  }

  /** Incremental (batch-vs-corpus) dedup — the daily-ingest shape: classify
    * each NEW batch document against an EXISTING corpus as `exact_dup`
    * (verbatim content already in the corpus), `near_dup` (≥ `threshold`
    * word-3-gram Jaccard with some corpus doc), or `kept`. Returns one row
    * per batch doc: `(doc_id, status)`.
    *
    * Scale shape — the corpus is the 100 TB side and is never shuffled:
    *  1. Exact stage: a Bloom filter over the corpus's 64-bit content hashes
    *     (one tree-aggregated pass; only the O(bits) sketch reaches the
    *     driver) prunes the batch to might-be-duplicate rows BEFORE any join;
    *     the md5 fingerprint semi-join that confirms them runs on that sliver
    *     only, so Bloom false positives cost a probe, never a wrong drop.
    *  2. Near stage: [[contaminationPairs]] with the (already exact-deduped)
    *     batch as the broadcast side — corpus-side candidates come from the
    *     blocked prefix key with the same bucket cap, and shingles are
    *     computed only for block-colliding docs.
    * In production the corpus fingerprint/blocking index would be a
    * precomputed bucketed table maintained by the ingest job itself; here it
    * is derived inline from `corpus`, which costs one extra scan but changes
    * no join shape. The batch must fit the broadcast budget (a day's ingest
    * against a corpus of years); for batch sizes beyond it, run this in
    * batch-partition slices.
    *
    * Exact runs BEFORE near deliberately: verbatim copies would otherwise
    * all reappear as jac-1.0 near pairs, and the near stage is the expensive
    * one ([[simhashPairs]] documents the same ordering contract). */
  def incrementalDedup(
      batch: DataFrame,
      corpus: DataFrame,
      threshold: Double = 0.3,
      expectedCorpusDocs: Long = 1000000L,
      maxBucket: Int = 2000): DataFrame = {
    val corpusFp = corpus.select(
      fingerprint(col("text")).as("fp"),
      xxhash64(normalize(col("text"))).as("fph"))
    val batchFp = batch.select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      xxhash64(normalize(col("text"))).as("fph"))
    val exactDup = batchFp
      .filter(Joins.bloomMightContain(corpusFp, "fph", col("fph"), expectedCorpusDocs, 0.03))
      .join(corpusFp.select("fp"), Seq("fp"), "left_semi")
      .select("doc_id")
    val rest = batch.join(broadcast(exactDup), Seq("doc_id"), "left_anti")
    val nearDup = contaminationPairs(
      corpus,
      rest.select("doc_id", "text"),
      threshold,
      maxBucket)
      .select(col("b_id").as("doc_id"))
      .distinct()
    batch
      .select("doc_id")
      .join(broadcast(exactDup.withColumn("_e", lit(true))), Seq("doc_id"), "left_outer")
      .join(broadcast(nearDup.withColumn("_n", lit(true))), Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        when(col("_e"), "exact_dup")
          .when(col("_n"), "near_dup")
          .otherwise("kept")
          .as("status"))
  }

  /** Survivor corpus after near-dup removal: drops the higher `doc_id` of
    * every verified pair (greedy one-pass policy — the standard corpus-
    * curation choice: chains collapse toward the lowest id without an
    * iterative transitive-closure job, at the cost of occasionally dropping
    * a doc whose only similar partner was itself dropped). Broadcast
    * left-anti join: the drop list is pair ids only, tiny next to the
    * corpus at any scale — hinted explicitly, because the pairs side is a
    * computed join/filter subtree whose static size estimate can exceed the
    * auto-broadcast threshold and silently demote to a shuffle anti join. */
  def dropNearDuplicates(documents: DataFrame, pairs: DataFrame): DataFrame =
    documents.join(
      broadcast(pairs.select(col("b_id").as("doc_id")).distinct()),
      Seq("doc_id"),
      "left_anti")

  /** Duplicate clusters: connected components over a verified near-dup pair
    * set, `(doc_id, cluster_id)` with `cluster_id` = min doc_id of the
    * component. This is the transitive-closure step [[dropNearDuplicates]]
    * deliberately skips: A~B and B~C put A,B,C in one cluster even when A~C
    * was never emitted as a pair.
    *
    * Algorithm: alternating large-star / small-star edge rewriting
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Each round REWRITES the edge set toward stars centered at
    * component minima — large-star points every above-center neighbor at
    * the neighborhood min, small-star flattens the below-center side — and
    * converges when the edge set stops changing, at which point every
    * component is a single star whose center is its min id. Unlike
    * min-label propagation (the previous implementation), whose round
    * count is Θ(graph diameter) because a label physically travels one
    * edge per round regardless of pointer-compression (measured: 26 rounds
    * on the sf0.1 customer-name graph, whose digit-substitution lev-1
    * chains have diameter ~25; pointer halving did not shorten DISCOVERY,
    * only already-known chains), star rewriting contracts components
    * geometrically: the same graph converges in 8 rounds, and the bound is
    * O(log²n) worst / O(log n) expected — the difference between feasible
    * and not for a 100 TB corpus whose near-dup graph happens to chain.
    *
    * Scale mechanics: the verified-pair subtree is materialized once up
    * front (`localCheckpoint`, eager) — it would otherwise re-run the
    * whole pair generation pipeline (shingling + candidate join, the
    * dominant cost) every round — and each round's edge frame is
    * checkpointed to truncate lineage, superseded checkpoints freed. On a
    * real cluster use reliable `checkpoint` instead; same call shape.
    * Per-round work is two grouped-min aggregates and two joins over the
    * current edge list (edge count never grows: large-star emits one edge
    * per input edge, small-star is count-preserving). Convergence is an
    * exact symmetric-difference emptiness check (two anti-join probes with
    * LIMIT 1 — no full count), not a hashable certificate: edge sums are
    * not monotone under rewriting. */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    duplicateClustersWithRounds(pairs, maxIter)._1

  /** [[duplicateClusters]] plus the number of rounds it took to converge
    * (bench/diagnostic surface). */
  private[graft] def duplicateClustersWithRounds(
      pairs: DataFrame,
      maxIter: Int = 25): (DataFrame, Int) = {
    import org.apache.spark.sql.graft.Bridge
    // Canonical unordered edge set (a < b), deduped; the pair subtree is
    // evaluated exactly once here.
    var e = pairs
      .select(
        least(col("a_id"), col("b_id")).as("a"),
        greatest(col("a_id"), col("b_id")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .transform(Bridge.localCheckpointFreshStats)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Large-star: center every node u on m = min(neighborhood(u) + u);
      // each ABOVE-u neighbor v re-points to m. One output edge per input
      // edge (the v > u side), always canonical (m <= u < v).
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val lsMin = sym.groupBy("u").agg(min("v").as("mv"))
      // No distinct here: duplicate (m, v) edges (two centers sharing a
      // min) do not change ssMin's grouped min, and `next` dedups — one
      // fewer shuffle per round.
      val ls = sym
        .join(lsMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(least(col("u"), col("mv")).as("a"), col("v").as("b"))
      // Small-star: orient edges max -> min (already canonical: center u =
      // b side, below-neighbors = a side); every below-neighbor and the
      // center itself re-point to m = min(below-neighborhood).
      val ssMin = ls.groupBy(col("b").as("u")).agg(min(col("a")).as("m"))
      val next = ls
        .join(ssMin, ls("b") === ssMin("u"))
        .filter(col("a") =!= col("m"))
        .select(col("m").as("a"), ls("a").as("b"))
        .union(ssMin.select(col("m").as("a"), col("u").as("b")))
        .distinct()
        .transform(Bridge.localCheckpointFreshStats)
      // Exact convergence: the edge set is a fixed point iff the symmetric
      // difference is empty — one LIMIT-1 probe job over both directions,
      // no full count materialized.
      converged = next.exceptAll(e).union(e.exceptAll(next)).isEmpty
      Bridge.freeLocalCheckpoint(e)
      e = next
      i += 1
    }
    // At the star fixed point every edge is (center=min, leaf); labels are
    // leaf -> center plus center -> itself.
    val labels = e
      .select(col("b").as("doc_id"), col("a").as("cluster_id"))
      .union(e.select(col("a").as("doc_id"), col("a").as("cluster_id")))
      .distinct()
    (labels, i)
  }

  /** Survivor corpus via [[duplicateClusters]]: keep exactly one document
    * (the min doc_id) per duplicate component, plus every unpaired document.
    * Unlike the greedy [[dropNearDuplicates]], a doc can never be dropped
    * because of a partner that was itself dropped — the cluster
    * representative always survives. Drop list = non-representative cluster
    * members, id-only and tiny next to the corpus, hence the explicit
    * broadcast. */
  def dropDuplicateClusters(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val drop = duplicateClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    documents.join(broadcast(drop), Seq("doc_id"), "left_anti")
  }

  // ===== Persisted duplicate-cluster assignments (incremental CC) =====

  /** Build the persisted `(doc_id, cluster_id)` duplicate-cluster index —
    * the INCREMENTAL half of [[duplicateClusters]], so a continuously-fed
    * corpus maintains its transitive near-dup closure without recomputing
    * connected components over the full pair set per arrival batch (the
    * cost profile of a from-scratch `duplicateClusters`, the heaviest
    * non-gate operator in the suite as `q_entity_merge`). The ONE full CC
    * run happens here at build; [[clusterIndexAppend]] then contracts only
    * batch-touched components. Pair-source-agnostic: feed it ngram/minhash/
    * simhash/embedding pairs alike; the persisted minhash index's
    * [[minhashIndexCandidates]] is the natural arrival-batch pair source.
    *
    * Layout (the [[IndexManifest]] discipline, `Layouts.clusters`): an
    * `assignments` base table `(doc_id, cluster_id, seq)` at seq 0 plus an
    * `assignments-delta` segment appended by batches; reads resolve
    * last-writer-wins on `seq` per doc ([[clusterIndexAssignments]]).
    * cluster_id = min doc_id of the component, so a doc's assignment is
    * NON-INCREASING over time (components only merge — this lifecycle has
    * no pair retraction), which is what makes last-writer-wins the whole
    * read-side story. Only PAIRED docs carry rows (matching
    * [[duplicateClusters]]' output shape); singletons are implicit. */
  def clusterIndexBuild(pairs: DataFrame, dir: String): Unit = {
    val spark = pairs.sparkSession
    val layout = IndexManifest.Layouts.clusters
    val prev = IndexManifest.resolve(spark, dir, layout)
    // bucketing is an INDEX property, not a per-call choice: a rebuild of
    // a bucketed index keeps its layout (the compact symmetry). Writing a
    // plain base while `bucket_n` rides the props would brick every read
    // (a CLUSTERED BY table registered over unbucketed files); switching
    // layouts is clusterIndexBuildBucketed's job.
    prev.props.get("bucket_n") match {
      case Some(n) => clusterIndexBuildBucketed(pairs, dir, n.toInt)
      case None =>
        val next = layout.advance(prev)
        duplicateClusters(pairs)
          .withColumn("seq", lit(0L))
          .write.mode("overwrite").parquet(next.tableDir(dir, "assignments"))
        IndexManifest.commit(spark, dir, next, layout)
    }
  }

  /** [[clusterIndexBuild]] with the base written BUCKETED (and sorted) by
    * `doc_id` — the 100 TB layout the append path's scaladoc calls for:
    * every per-doc probe of the base (the membership resolution inside
    * [[clusterIndexAppend]], the survivor anti-join's assignments side)
    * plans with NO exchange on the corpus-sized side; only the
    * batch-bounded probe set moves. `bucket_n` rides the manifest props
    * through every later generation, so [[clusterIndexCompact]] rewrites
    * the folded base bucketed too and the layout survives the lifecycle —
    * an index built unbucketed never changes behavior. Choose `buckets`
    * so each bucket file lands in the 100 MB–1 GB range at target scale.
    * Prior generations remain AsOf-readable by path (bucket metadata only
    * ACCELERATES reads; the files are plain parquet). */
  def clusterIndexBuildBucketed(pairs: DataFrame, dir: String, buckets: Int): Unit = {
    val spark = pairs.sparkSession
    val layout = IndexManifest.Layouts.clusters
    val next = layout.advance(IndexManifest.resolve(spark, dir, layout))
    writeClusterBucketedBase(
      spark, duplicateClusters(pairs).withColumn("seq", lit(0L)), dir, next, buckets)
    IndexManifest.commit(
      spark, dir, next.withProp("bucket_n", buckets.toString), layout)
  }

  private def clustersState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): IndexManifest.State =
    IndexManifest.resolve(spark, dir, IndexManifest.Layouts.clusters)

  /** The raw assignment segments as SEPARATE frames (base first, then the
    * delta), so consumers can probe each below any union — the shape that
    * lets a bucketed base serve its side of a doc_id join exchange-free
    * (a join above `base ∪ delta` would lose the bucket partitioning:
    * union output has no distribution). */
  private[operators] def clustersRawParts(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): Seq[DataFrame] = {
    def readIf(p: String): Option[DataFrame] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(path)) None
      else
        try Some(spark.read.parquet(p).select("doc_id", "cluster_id", "seq"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    val base = clusterBucketedBase(spark, dir, st)
      .orElse(readIf(st.tableDir(dir, "assignments")))
    (base ++ readIf(st.streamDir(dir))).toSeq
  }

  private def clustersRaw(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): DataFrame = {
    import org.apache.spark.sql.types._
    clustersRawParts(spark, dir, st)
      .reduceLeftOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("cluster_id", LongType),
          StructField("seq", LongType)))))
  }

  /** The catalog table name a bucketed assignments base registers under —
    * generation-qualified (each compact writes a FRESH bucketed base) and
    * dir-hashed (many indexes, one catalog). */
  private[operators] def clusterBucketTableName(dir: String, gen: Long): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    f"graft_clusters_${h}%s_g$gen%03d"
  }

  /** The bucketed read lane (active iff the manifest carries `bucket_n` —
    * see [[clusterIndexBuildBucketed]]): the base served THROUGH the
    * session catalog, whose bucket spec is what lets the planner skip the
    * corpus-side exchange on every doc_id join/aggregate. Bucket metadata
    * does not live in parquet files, so a fresh session (new JVM, new
    * catalog) re-registers the external table over the existing files
    * first — the files carry bucket ids in their names, the manifest
    * carries the count, and the two must agree because both were written
    * by the same committed generation. */
  private def clusterBucketedBase(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): Option[DataFrame] =
    st.props.get("bucket_n").map { n =>
      val tbl = clusterBucketTableName(dir, st.generation)
      if (!spark.catalog.tableExists(tbl))
        spark.sql(
          s"CREATE TABLE $tbl (doc_id BIGINT, cluster_id BIGINT, seq BIGINT) " +
            s"USING parquet CLUSTERED BY (doc_id) SORTED BY (doc_id) " +
            s"INTO ${n.toInt} BUCKETS LOCATION '${st.tableDir(dir, "assignments")}'")
      spark.table(tbl).select("doc_id", "cluster_id", "seq")
    }

  /** Write `df` as the bucketed assignments base of generation `next` —
    * external table at the generation dir, bucketed AND sorted by doc_id
    * so a doc_id sort-merge join needs neither exchange nor sort on this
    * side. DROP first clears crash debris from a failed prior attempt at
    * the same generation (the manifest commit is still the atomic cut). */
  private def writeClusterBucketedBase(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      dir: String,
      next: IndexManifest.State,
      buckets: Int): Unit = {
    val tbl = clusterBucketTableName(dir, next.generation)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    df.select("doc_id", "cluster_id", "seq")
      .write.format("parquet")
      .option("path", next.tableDir(dir, "assignments"))
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .mode("overwrite")
      .saveAsTable(tbl)
  }

  /** The live resolved assignments `(doc_id, cluster_id)` — base ∪ delta,
    * last-writer-wins on `seq` per doc. The one corpus-sized aggregation
    * of the read side; [[clusterIndexCompact]] folds the delta back so
    * steady-state reads group over a near-clean base. */
  def clusterIndexAssignments(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    clusterAssignmentsAt(spark, dir, clustersState(spark, dir))

  /** [[clusterIndexAssignments]] pinned to a RETAINED manifest generation
    * ([[IndexManifest.readAt]]) — the family's time-travel read, the
    * [[minhashIndexCandidatesAsOf]] contract: the assignments a past
    * generation resolved ("which cluster did the dedup pass put this doc
    * in at generation G?"), after later compactions moved the live index
    * on. Build and compact rewrite the base under fresh names and delta
    * stripes land in the LIVE generation's segment, so a frozen prior
    * generation replays exactly (this family writes no tombstones — the
    * takedown carve-out has nothing to reach it). Fails loudly outside
    * the retention window. */
  def clusterIndexAssignmentsAsOf(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      generation: Long): DataFrame = {
    val st = IndexManifest.readAt(spark, dir, generation).getOrElse(
      sys.error(
        s"cluster index at $dir retains no generation-$generation manifest " +
          s"(snapshots: ${IndexManifest.snapshots(spark, dir).mkString(",")})"))
    clusterAssignmentsAt(spark, dir, st)
  }

  private def clusterAssignmentsAt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): DataFrame =
    clustersRaw(spark, dir, st)
      .groupBy("doc_id").agg(max_by(col("cluster_id"), col("seq")).as("cluster_id"))

  /** Survivor corpus served FROM the persisted cluster index — the
    * arrival pipeline's last hop, index-backed: the resolved assignments
    * table IS the drop list (`cluster_id != doc_id` marks every
    * non-representative member; representatives and unpaired singletons
    * carry no dropping row), so the read is one anti-join — NO
    * connected-components recompute, which is the entire point of
    * maintaining the index incrementally. Equals
    * `dropDuplicateClusters(documents, allPairs)` whenever the index was
    * built/appended from exactly `allPairs` (the oracled
    * `q_dedup_cluster_survivors_idx` pins the equality against DuckDB's
    * recursive-CTE closure; `q_dedup_pipeline_gate` pins it on the wired
    * minhash arrival path).
    *
    * No forced broadcast, unlike [[dropDuplicateClusters]]: there the
    * drop list is derived from an in-flight pair set the caller already
    * sized; here it is a persisted corpus-lifetime table whose
    * non-representative fraction on a duplicate-heavy crawl can be a
    * large share of the corpus. The id-only projection keeps the shuffle
    * thin and AQE promotes the join to broadcast when the list is in
    * fact small. */
  def dropDuplicateClustersFromIndex(documents: DataFrame, dir: String): DataFrame =
    documents.join(
      clusterIndexAssignments(documents.sparkSession, dir)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id"),
      Seq("doc_id"),
      "left_anti")

  /** [[dropDuplicateClustersFromIndex]] pinned to a RETAINED generation —
    * reproduce the survivor corpus a past dedup pass served
    * ([[clusterIndexAssignmentsAsOf]] semantics; fails loudly outside the
    * retention window). */
  def dropDuplicateClustersFromIndexAsOf(
      documents: DataFrame,
      dir: String,
      generation: Long): DataFrame =
    documents.join(
      clusterIndexAssignmentsAsOf(documents.sparkSession, dir, generation)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id"),
      Seq("doc_id"),
      "left_anti")

  /** Incremental arrival-batch maintenance: `batchPairs` is the verified
    * near-dup pairs INCIDENT to an arrival batch (batch↔corpus and
    * batch↔batch — old↔old pairs cannot appear: a pair's similarity does
    * not depend on other documents, so the old corpus's pair set is
    * already clustered). Star contraction then runs ONLY on the
    * batch-touched component subgraph:
    *
    *   1. partners  := ids on either side of `batchPairs`;
    *   2. touched   := resolved cluster reps of the already-assigned
    *      partners (new ids resolve to nothing — they are their own
    *      implicit singletons, [[duplicateClusters]] handles them as
    *      plain nodes);
    *   3. members   := docs resolving into a touched component — their
    *      current star edges `(rep, member)` reproduce the old structure,
    *      so the contraction sees whole components, never fragments;
    *   4. [[duplicateClusters]] over (star edges ∪ batchPairs) — sized by
    *      the touched components + batch, NOT the corpus;
    *   5. the relabeled rows append to the delta at `max(seq) + 1` —
    *      last-writer-wins makes merges (a member's rep decreasing to the
    *      merged component's min) visible without touching the base.
    *
    * Membership resolution reads the raw table twice (a candidate filter
    * on `cluster_id ∈ touched` — a superset, stale rows included — then an
    * exact per-doc resolution over just those docs), both column-pruned id
    * scans; the contraction's O(log n) rounds run over the touched
    * subgraph only. At 100 TB: build with [[clusterIndexBuildBucketed]] —
    * the base bucketed by `doc_id` serves the per-doc resolution
    * co-located (no corpus-side exchange; plan-guarded in
    * ClusterIndexSpec) — and compact at the same cadence as the paired
    * minhash index. Stale rows can never corrupt
    * membership: a doc's assignment is non-increasing, so a stale row
    * matching a touched rep either belongs to the component (kept by the
    * exact resolution) or resolves below it (dropped).
    *
    * SINGLE-WRITER contract, enforced: appends to one cluster index must
    * be serialized — two concurrent appends would claim the same `seq`
    * and write conflicting stripes whose last-writer-wins resolution is
    * nondeterministic per doc. Unlike the minhash/text appends
    * (commutative per-id rows) there is no commutative merge here, so
    * the violation must FAIL, not corrupt: before writing, the append
    * atomically claims its seq by exclusively creating
    * `_claim-seq-N` inside the delta dir (underscore-prefixed = invisible
    * to every parquet read); the second claimant gets a loud error. A
    * writer that crashed after claiming burns that seq — the claim file
    * makes the next append fail the same way, and the documented recovery
    * ([[clusterIndexCompact]]) folds the delta into a fresh generation
    * whose delta dir (and claim ledger) starts empty. */
  def clusterIndexAppend(batchPairs: DataFrame, dir: String): Unit = {
    val spark = batchPairs.sparkSession
    require(
      IndexManifest.read(spark, dir).nonEmpty,
      s"cluster index at $dir has no manifest — clusterIndexBuild first")
    val st = clustersState(spark, dir)
    val rawParts = clustersRawParts(spark, dir, st)
    val raw = clustersRaw(spark, dir, st)
    val pairs = batchPairs.select(
      least(col("a_id"), col("b_id")).as("a_id"),
      greatest(col("a_id"), col("b_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
      .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    // an empty pair batch is a NO-OP append: nothing to contract, and
    // writing the empty stripe would burn a seq claim — a second empty
    // append would then trip the single-writer guard on a seq that no
    // data ever used (one LIMIT-1 probe on the checkpointed pairs)
    if (pairs.isEmpty) {
      org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(pairs)
      return
    }
    val partners = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    // resolved reps of the assigned partners — batch-bounded, broadcast
    val touched = raw.join(broadcast(partners), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(max_by(col("cluster_id"), col("seq")).as("cluster_id"))
      .select("cluster_id").distinct()
      .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    // candidate member docs (stale rows give a superset), then the exact
    // per-doc resolution over just those docs. Both probes run PER
    // SEGMENT, below the base∪delta union: on the bucketed layout
    // ([[clusterIndexBuildBucketed]]) the base then serves its side of
    // the doc_id semi-join exchange-free even when the candidate set
    // outgrows a broadcast (a mega-component arrival) — the union output
    // would have no distribution for the planner to reuse.
    // checkpointed like pairs/touched: the members resolution embeds this
    // frame once PER SEGMENT, and un-materialized it would re-run its
    // union-of-semi-joins (both segment scans + a distinct exchange) per
    // embedding — batch-bounded rows, so materialization is cheap
    val candidates = rawParts
      .map(_.join(broadcast(touched), Seq("cluster_id"), "left_semi").select("doc_id"))
      .reduceLeftOption(_ unionByName _)
      .getOrElse(raw.select("doc_id"))
      .distinct()
      .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    val members = rawParts
      .map(_.join(candidates, Seq("doc_id"), "left_semi"))
      .reduceLeftOption(_ unionByName _)
      .getOrElse(raw)
      .groupBy("doc_id").agg(max_by(col("cluster_id"), col("seq")).as("cluster_id"))
      .join(broadcast(touched), Seq("cluster_id"), "left_semi")
    val starEdges = members
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("cluster_id").as("a_id"), col("doc_id").as("b_id"))
    val relabeled = duplicateClusters(starEdges.unionByName(pairs))
    // the base is always seq 0, so the high-water mark lives in the
    // (compaction-bounded) delta alone — never a base scan
    val deltaPath = new org.apache.hadoop.fs.Path(st.streamDir(dir))
    val nextSeq = 1L + (
      if (!deltaPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(deltaPath)) 0L
      else
        try spark.read.parquet(st.streamDir(dir))
          .agg(coalesce(max("seq"), lit(0L))).head().getLong(0)
        catch { case _: org.apache.spark.sql.AnalysisException => 0L })
    claimSeq(spark, dir, st.streamDir(dir), nextSeq)
    relabeled.withColumn("seq", lit(nextSeq))
      .write.mode("append").parquet(st.streamDir(dir))
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(pairs)
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(touched)
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(candidates)
  }

  /** Exclusive-create the delta stripe's seq claim (see
    * [[clusterIndexAppend]]'s single-writer contract). `createNewFile` is
    * the filesystem's atomic create-if-absent, so exactly one of two
    * racing appends wins the seq; the loser fails loudly here instead of
    * silently writing a conflicting stripe. */
  private def claimSeq(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      streamDir: String,
      seq: Long): Unit = {
    val deltaPath = new org.apache.hadoop.fs.Path(streamDir)
    val fs = deltaPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(deltaPath)
    val claim = new org.apache.hadoop.fs.Path(deltaPath, f"_claim-seq-$seq%06d")
    // ONLY already-exists means a lost claim (createNewFile's pre-check
    // returns false; a racing create surfaces FileAlreadyExists). Any
    // other IOException is a real filesystem fault — rethrow it rather
    // than misdirecting the operator to the race-recovery procedure (and
    // risking a healthy writer's retry tripping over its own half-made
    // claim).
    val won =
      try fs.createNewFile(claim)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    require(
      won,
      s"cluster index at $dir: delta seq $seq is already claimed ($claim). " +
        "clusterIndexAppend is single-writer per index — either a concurrent " +
        "append is racing this one (serialize them) or a prior append crashed " +
        "after claiming; clusterIndexCompact folds the delta into a fresh " +
        "generation and resets the claim ledger.")
  }

  /** [[clusterIndexAppend]] fed from the persisted minhash index — the
    * dedup pipeline's natural arrival-batch pair source, wired: band the
    * batch under the index's stored parameters, take
    * [[minhashIndexCandidates]] against the LIVE rows (bucket-pruned,
    * capped — never all-pairs), keep pairs whose signature agreement
    * `est` reaches `threshold` (the [[graft.streaming.StreamingDedup
    * .classify]] default), and contract the touched components. Call
    * AFTER [[minhashIndexAppend]]/[[minhashIndexAppendStream]] lands the
    * batch in the minhash index: the candidates then cover batch↔corpus
    * AND batch↔batch through the index itself, so the two indexes stay
    * in lockstep batch by batch. */
  def clusterIndexAppendFromMinhash(
      batch: DataFrame,
      minhashDir: String,
      clusterDir: String,
      threshold: Double = 0.5): Unit =
    clusterIndexAppend(
      minhashIndexCandidates(batch, minhashDir)
        .filter(col("est") >= threshold)
        .select(col("doc_id").as("a_id"), col("c_id").as("b_id")),
      clusterDir)

  /** The continuous-curation arrival step, one call: land the batch in
    * the minhash LSH index ([[minhashIndexAppend]]), contract its touched
    * duplicate components into the persisted cluster index
    * ([[clusterIndexAppendFromMinhash]]), and return the BATCH's survivor
    * slice off the index ([[dropDuplicateClustersFromIndex]] restricted
    * to the batch) — the rows a curation loop keeps from this arrival.
    * First-doc-wins across time: a batch doc duplicating an already-kept
    * corpus doc resolves under the older (smaller-id) representative and
    * is dropped here; the corpus doc's survivor status never regresses.
    * At no point does the loop recompute connected components or rescan
    * the corpus — per-arrival cost is bounded by the touched components
    * (R11ScaleBench: flat across a 500k→5M-doc decade). Single-writer
    * per index pair, enforced by [[clusterIndexAppend]]'s seq claim. */
  def arrivalDedupStep(
      batch: DataFrame,
      minhashDir: String,
      clusterDir: String,
      threshold: Double = 0.5): DataFrame = {
    minhashIndexAppend(batch, minhashDir)
    clusterIndexAppendFromMinhash(batch, minhashDir, clusterDir, threshold)
    dropDuplicateClustersFromIndex(batch, clusterDir)
  }

  /** Fold the delta back into a seq-0 base (resolved last-writer-wins) —
    * one manifest commit, the family compaction contract. */
  def clusterIndexCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val layout = IndexManifest.Layouts.clusters
    val prev = clustersState(spark, dir)
    val streamPath = new org.apache.hadoop.fs.Path(prev.streamDir(dir))
    if (!streamPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(streamPath))
      return
    val next = layout.advance(prev)
    val folded = clusterIndexAssignments(spark, dir).withColumn("seq", lit(0L))
    // the bucketed layout survives the fold: props ride advance(), so a
    // bucketed index rewrites its base bucketed at every compaction
    prev.props.get("bucket_n") match {
      case Some(n) => writeClusterBucketedBase(spark, folded, dir, next, n.toInt)
      case None =>
        folded.write.mode("overwrite").parquet(next.tableDir(dir, "assignments"))
    }
    IndexManifest.commit(spark, dir, next, layout)
  }

  /** Compaction trigger on the delta/base row ratio — the
    * [[CompactionTrigger]] discipline (reads stay correct at any delta
    * volume; this bounds the read-side group-by's dirty fraction). */
  def clusterIndexMaybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      ratio: Double = 0.25): Boolean = {
    val st = clustersState(spark, dir)
    val due = CompactionTrigger.due(
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "assignments")),
      CompactionTrigger.rowsIn(spark, st.streamDir(dir)),
      0L,
      ratio = 1.0, // no tombstones in this family; only the stream ratio gates
      streamRatio = ratio)
    if (due) clusterIndexCompact(spark, dir)
    due
  }

  /** Embedding-cosine near-dup pairs, exact all-pairs variant: every (a, b)
    * with cosine ≥ threshold. Quadratic — the correctness baseline and fine
    * when the corpus (or a blocking partition of it) fits a cartesian
    * stage; at 100 TB use [[embeddingCosinePairsLsh]]. Norms precomputed per
    * vector, never per pair. */
  def embeddingCosinePairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorFunctions._
    // Cast to array<double> BEFORE the pairwise join: DotProduct's implicit
    // float→double cast would otherwise run per *pair* (quadratic), not per
    // vector — profiled 4× slower on the 2M-pair stage at sf0.1.
    val keyed = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = keyed.select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
    val b = keyed.select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): a fixed-round k-means over the embeddings partitions
    * the corpus into k cells, and the quadratic cosine test runs only INSIDE
    * each cell — the all-pairs cost drops from O(N²) to O(Σ|cell|²). Keeps
    * the smallest vec_id of every near-dup pair; returns survivors as
    * `(vec_id, cluster)`.
    *
    * Determinism/oracle-parity design (the same discipline as PageRank's
    * unrolled-CTE oracle):
    *  - components quantized `⌊v_i·scale⌋` into BIGINT, so centroid sums are
    *    ORDER-FREE integer arithmetic — double summation order across
    *    partitions could never be replayed by another engine;
    *  - each centroid converts to double exactly once (`sum/n`, one IEEE
    *    division), and distances `x·x − 2·x·c + c·c` use the left-to-right
    *    native [[graft.functions.VectorFunctions.dot]] fold both engines
    *    share;
    *  - argmin ties break toward the smaller cluster id; clusters that
    *    empty out drop from the candidate set (never resurrected);
    *  - init = the k smallest vec_ids, matching a `row_number() OVER
    *    (ORDER BY vec_id) LIMIT k` CTE.
    *
    * Scale shape: per round one map-side-combined `(cluster, dim)` integer
    * aggregate; only k·d BIGINT sums ever reach the driver (model-sized, the
    * PCA-gram contract). The corpus is scanned rounds+2 times with fixed
    * `rounds` — no data-dependent iteration.
    *
    * k-sizing rule: the within-cell stage is O(Σ|cell|²), so cells must stay
    * bounded as the corpus grows — a FIXED k means cells grow O(N/k) and the
    * pair join goes quadratic. Pick k ≈ N / targetCellSize (targetCellSize
    * ~10⁴–10⁵ rows: big enough for meaningful near-dup density, small enough
    * that a cell's pair block is one task's work), i.e. k scales LINEARLY
    * with the corpus. `maxCell` is the independent kill switch for the skew
    * a data-dependent clustering can always produce (one semantic mega-
    * cluster): cells past it skip the quadratic stage and keep all members —
    * conservative, because a pathological mega-cell means k was sized wrong
    * and silently dropping docs on a broken clustering would be data loss.
    * Production calls should ALWAYS set it (≈10·targetCellSize); the
    * registered q_dedup_semantic exercises the capped configuration and its
    * oracle replays the cap via a cell-count join. The pairwise stage
    * shuffles ids+vectors once on the cluster key. */
  def semanticDedup(
      embeddings: DataFrame,
      k: Int = 8,
      rounds: Int = 2,
      threshold: Double = 0.4,
      quantScale: Int = 4096,
      maxCell: Int = 0): DataFrame =
    semanticDedupWithModel(
      embeddings, semanticModel(embeddings, k, rounds, quantScale),
      threshold, quantScale, maxCell)

  /** [[semanticDedup]] under a caller-supplied frozen model — reuse a
    * trained model across the survivor pass and later [[semanticDedupAppend]]
    * calls instead of re-running the Lloyd rounds. */
  def semanticDedupWithModel(
      embeddings: DataFrame,
      centroids: Seq[(Long, Array[Double])],
      threshold: Double = 0.4,
      quantScale: Int = 4096,
      maxCell: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions._
    val ed = semanticQuantized(embeddings, quantScale)

    // Empty corpus: no centroids to seed — an untyped array() would not even
    // analyze. Same (vec_id, cluster) schema, zero rows.
    if (centroids.isEmpty)
      return ed.select(col("vec_id"), lit(0L).as("cluster")).limit(0)

    val assigned = ed.withColumn("cluster", semanticAssignCol(centroids))
    // Skew kill-switch (the capBuckets contract): cells past `maxCell`
    // skip the quadratic stage entirely — their members are all KEPT
    // (conservative; a pathological mega-cell means k was sized wrong for
    // the corpus, and dropping docs on a broken clustering would be data
    // loss). 0 = uncapped, no window in the plan.
    val paired =
      if (maxCell > 0) capBuckets(assigned, Seq("cluster"), maxCell) else assigned
    val keyed = paired.withColumn("nrm", norm(col("v")))
    val a = keyed.select(col("vec_id").as("a_id"), col("cluster").as("a_cl"),
      col("v").as("va"), col("nrm").as("na"))
    val b = keyed.select(col("vec_id").as("b_id"), col("cluster").as("b_cl"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dupIds = a
      .join(b, col("a_cl") === col("b_cl") && col("a_id") < col("b_id"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(col("b_id").as("vec_id"))
      .distinct()
    assigned.select("vec_id", "cluster").join(dupIds, Seq("vec_id"), "left_anti")
  }

  /** `(vec_id, v: double[], qv: ⌊v·scale⌋ bigint[], x: qv as double[])` —
    * the shared projection every semantic-dedup stage reads. */
  private def semanticQuantized(embeddings: DataFrame, quantScale: Int): DataFrame =
    embeddings.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      transform(col("embedding").cast("array<double>"),
        e => floor(e * quantScale).cast("long")).as("qv"))
      .withColumn("x", col("qv").cast("array<double>"))

  /** The frozen k-means model [[semanticDedup]] trains: `rounds` Lloyd
    * iterations from the k-smallest-id seeds, centroid sums in exact
    * BIGINT. Driver-side and model-sized (k·d doubles) — persist it
    * alongside the survivors to run [[semanticDedupAppend]] on arrivals
    * without ever rescanning the trained corpus. */
  def semanticModel(
      embeddings: DataFrame,
      k: Int = 8,
      rounds: Int = 2,
      quantScale: Int = 4096): Seq[(Long, Array[Double])] = {
    val ed = semanticQuantized(embeddings, quantScale)
    // k-smallest-id init (TakeOrdered, never a full sort); driver re-sorts
    // defensively so centroid j is ALWAYS the j-th smallest vec_id.
    var centroids: Seq[(Long, Array[Double])] = ed
      .select("vec_id", "x").orderBy("vec_id").limit(k).collect()
      .sortBy(_.getLong(0))
      .zipWithIndex
      .map { case (r, j) => (j.toLong, r.getSeq[Double](1).toArray) }
      .toSeq
    if (centroids.isEmpty) return centroids

    for (_ <- 1 to rounds) {
      val sums = ed
        .withColumn("cl", semanticAssignCol(centroids))
        .select(col("cl"), posexplode(col("qv")).as(Seq("i", "qx")))
        .groupBy("cl", "i")
        .agg(sum("qx").as("sx"), count(lit(1)).as("n"))
        .collect() // k·d rows of (cl, i, Σq, n) — model-sized by contract
      val dim = centroids.head._2.length
      centroids = sums
        .groupBy(_.getLong(0))
        .toSeq
        .map { case (cl, rows) =>
          val c = new Array[Double](dim)
          rows.foreach(r => c(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3))
          (cl, c)
        }
        .sortBy(_._1)
    }
    centroids
  }

  /** Argmin-cell assignment under a frozen model, as one codegen'd
    * expression over the quantized-double column `x`: distances
    * `x·x − 2·x·c + c·c` in left-to-right folds, ties toward the smaller
    * cell id (struct-min). */
  private def semanticAssignCol(cents: Seq[(Long, Array[Double])]): org.apache.spark.sql.Column = {
    import graft.functions.VectorFunctions._
    // Sequential self-dot — the SAME left-to-right accumulation DotProduct
    // codegens and DuckDB's list_inner_product replays.
    def selfDot(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
    val xx = dot(col("x"), col("x"))
    val candidates = cents.map { case (j, c) =>
      struct(
        (xx - lit(2.0) * dot(col("x"), lit(c)) + lit(selfDot(c))).as("d"),
        lit(j).as("cl"))
    }
    array_min(array(candidates: _*)).getField("cl")
  }

  /** Cell assignment under a frozen model: `(vec_id, v: double[], cluster)`
    * — a PURE PROJECTION (no shuffle, no state), so it runs identically in
    * a batch plan or inside a streaming micro-batch. */
  def semanticAssign(
      vectors: DataFrame,
      model: Seq[(Long, Array[Double])],
      quantScale: Int = 4096): DataFrame =
    semanticQuantized(vectors, quantScale)
      .withColumn("cluster", semanticAssignCol(model))
      .select("vec_id", "v", "cluster")

  /** Arrival-time semantic dedup under a FROZEN model — the scale path for
    * a growing corpus: the trained base is never rescanned or re-clustered.
    * `keptBase` is the prior survivor set WITH vectors and cells
    * (`(vec_id, embedding, cluster)` — [[semanticDedup]] output joined back
    * to its vectors); `batch` is the new arrivals. A batch vector is
    * dropped iff it is within `threshold` cosine of a same-cell BASE
    * survivor, or of a smaller-id same-cell batch member — the identical
    * greedy rule [[semanticDedup]] applies, extended over the id order
    * (base before batch). Returns batch survivors `(vec_id, cluster)`.
    *
    * Scale shape: assignment is a pure projection under the driver-side
    * model; the two pair stages join only on the cell key (batch×survivors
    * and batch×batch) — cost O(|batch|·|cell|), independent of corpus
    * history size. The same Bloom-prune idea as [[incrementalDedup]]
    * applies if survivor cells grow hot. */
  def semanticDedupAppend(
      keptBase: DataFrame,
      batch: DataFrame,
      model: Seq[(Long, Array[Double])],
      threshold: Double = 0.4,
      quantScale: Int = 4096): DataFrame = {
    import graft.functions.VectorFunctions._
    if (model.isEmpty)
      return semanticQuantized(batch, quantScale)
        .select(col("vec_id"), lit(0L).as("cluster")).limit(0)
    val b = semanticAssign(batch, model, quantScale)
      .withColumn("nrm", norm(col("v")))
      .select("vec_id", "cluster", "v", "nrm")
    val s = keptBase
      .select(col("cluster").as("s_cl"),
        col("embedding").cast("array<double>").as("sv"))
      .withColumn("sn", norm(col("sv")))
    val dupVsBase = b
      .join(s, col("cluster") === col("s_cl"))
      .filter(dot(col("v"), col("sv")) / (col("nrm") * col("sn")) >= threshold)
      .select("vec_id")
    val b2 = b.select(col("vec_id").as("b_id"), col("cluster").as("b_cl"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dupVsBatch = b
      .join(b2, col("b_cl") === col("cluster") && col("b_id") > col("vec_id"))
      .filter(dot(col("v"), col("vb")) / (col("nrm") * col("nb")) >= threshold)
      .select(col("b_id").as("vec_id"))
    b.select("vec_id", "cluster")
      .join(dupVsBase.unionByName(dupVsBatch).distinct(), Seq("vec_id"), "left_anti")
  }

  /** Persist the semantic-dedup state (the [[graft.operators
    * .SimilaritySearch.ivfIndexBuild]] lifecycle applied to dedup): train
    * the frozen model on the corpus, write it as a KB-sized parquet
    * (`dir/model`), and write the survivor set CELL-PARTITIONED
    * (`dir/survivors`) — arrivals then dedup against genuine partition
    * reads of their own cell, and the trained corpus is never rescanned. */
  def semanticIndexBuild(
      embeddings: DataFrame,
      dir: String,
      k: Int = 8,
      rounds: Int = 2,
      threshold: Double = 0.4,
      quantScale: Int = 4096): Unit =
    semanticIndexBuildWithModel(
      embeddings, dir, semanticModel(embeddings, k, rounds, quantScale), threshold, quantScale)

  /** [[semanticIndexBuild]] under a model the caller already trained —
    * callers that pre-check the model for emptiness (the gate pattern)
    * would otherwise pay Lloyd training twice. */
  def semanticIndexBuildWithModel(
      embeddings: DataFrame,
      dir: String,
      model: Seq[(Long, Array[Double])],
      threshold: Double = 0.4,
      quantScale: Int = 4096): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val layout = IndexManifest.Layouts.semantic
    // a rebuild commits a fresh generation — prior deletes vanish with it
    val next = layout.advance(IndexManifest.resolve(spark, dir, layout))
    model.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(next.tableDir(dir, "model"))
    // trained-on count captured during the write (observe) — no read-back
    // count job over the just-written segment (guide §1.2)
    val obs = org.apache.spark.sql.Observation()
    semanticDedupWithModel(embeddings, model, threshold, quantScale)
      .join(embeddings.select("vec_id", "embedding"), Seq("vec_id"))
      .select("vec_id", "embedding", "cluster")
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy("cluster").parquet(next.tableDir(dir, "survivors"))
    val trained = obs.get("n").asInstanceOf[Long]
    IndexManifest.commit(
      spark, dir, next.withProp(RebuildTrigger.TrainedOnProp, trained.toString), layout)
  }

  /** [[RebuildTrigger]] applied to the semantic-dedup index: retrain the
    * frozen centroid model over `embeddings` (the caller's CURRENT
    * corpus) when the live survivor set has grown/shrunk past `ratio` of
    * the build-time set — the point where cell balance under the stale
    * model degrades the within-cell dedup's pruning. Dedup decisions stay
    * exact under the frozen model at any drift (the incremental
    * contract); this is the model-quality knob, self-applying. */
  def semanticIndexMaybeRebuild(
      embeddings: DataFrame,
      dir: String,
      k: Int = 8,
      rounds: Int = 2,
      threshold: Double = 0.4,
      quantScale: Int = 4096,
      ratio: Double = 0.5): Boolean = {
    val spark = embeddings.sparkSession
    val st = semanticState(spark, dir)
    val live =
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "survivors")) +
        CompactionTrigger.rowsIn(spark, st.streamDir(dir)) -
        Tombstones.read(spark, dir, st.tombstones).fold(0L)(_.count())
    val due = RebuildTrigger.due(RebuildTrigger.trainedOn(st), live, ratio)
    if (due) semanticIndexBuild(embeddings, dir, k, rounds, threshold, quantScale)
    due
  }

  private def semanticState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): IndexManifest.State =
    IndexManifest.resolve(spark, dir, IndexManifest.Layouts.semantic)

  /** The index's frozen model (model-sized collect). */
  def semanticIndexModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, Array[Double])] =
    spark.read.parquet(semanticState(spark, dir).tableDir(dir, "model"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq

  /** The LIVE persisted survivor set `(vec_id, embedding, cluster)` —
    * base minus pending [[semanticIndexDelete]] tombstones. Every consumer
    * reads this view, so a retracted survivor stops suppressing arrivals
    * the moment its tombstone lands (the retraction semantics a takedown
    * wants). A fully-tombstoned index compacts to a zero-row base with no
    * schema-carrying files; that reads back as an EMPTY survivor set. */
  def semanticIndexSurvivors(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    semanticIndexSurvivorsAt(spark, dir, semanticState(spark, dir))

  /** [[semanticIndexSurvivors]] pinned to a RETAINED manifest generation
    * ([[IndexManifest.readAt]]) — the semantic family's time-travel read
    * ([[minhashIndexCandidatesAsOf]]'s contract): reproduce exactly the
    * survivor set a past generation served — its segments, its pending
    * tombstones — after appends, deletes or a compaction moved the live
    * index on. The survivor set is history-dependent (the documented
    * reason this family has no upsert), which makes the snapshot read
    * the ONLY way to audit what a past corpus build deduped against.
    * Fails loudly outside the retention window. Later plain deletes reach
    * retained snapshots (the takedown carve-out documented on
    * [[minhashIndexCandidatesAsOf]]). */
  def semanticIndexSurvivorsAsOf(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      generation: Long): DataFrame = {
    val st = IndexManifest.readAt(spark, dir, generation).getOrElse(
      sys.error(
        s"semantic index at $dir retains no generation-$generation manifest " +
          s"(snapshots: ${IndexManifest.snapshots(spark, dir).mkString(",")})"))
    semanticIndexSurvivorsAt(spark, dir, st)
  }

  private def semanticIndexSurvivorsAt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): DataFrame = {
    import org.apache.spark.sql.types._
    def readIf(p: String): Option[DataFrame] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(path)) None
      else
        try Some(spark.read.parquet(p).select("vec_id", "embedding", "cluster"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    val base = (readIf(st.tableDir(dir, "survivors")) ++ readIf(st.streamDir(dir)))
      .reduceLeftOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)),
          StructField("cluster", LongType)))))
    // the anti-join moves its key first — re-project to the stable order
    Tombstones.drop(base, dir, "vec_id", st.tombstones)
      .select("vec_id", "embedding", "cluster")
  }

  /** Continuous-ingest version of [[semanticIndexAppend]] — arriving
    * vectors are deduped against the cumulative LIVE survivor set under
    * the index's frozen on-disk model, one micro-batch at a time. The
    * per-batch work (cell assignment, vs-base and vs-batch cosine joins)
    * is a stateful computation over the index, not a pure projection, so
    * it runs through foreachBatch calling the EXACT batch operator —
    * single-sourced with [[semanticDedupAppend]] — and commits each
    * batch's survivors as `survivors-stream/epoch=N` under the
    * inflight-staging/rename discipline (at-least-once delivery, replayed
    * epochs skipped: the [[graft.streaming.StreamingRollup]] contract).
    * Batch N+1 reads batch N's committed survivors as part of the base,
    * so the stream is cumulative exactly like chained batch appends.
    * [[semanticIndexCompact]] folds the segment back into the
    * cell-partitioned base. */
  def semanticIndexAppendStream(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      arrivalsDir: String,
      checkpoint: String,
      threshold: Double = 0.4,
      quantScale: Int = 4096): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val model = semanticIndexModel(spark, indexDir)
    require(model.nonEmpty, s"semantic index at $indexDir has an empty model")
    val raw = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .parquet(arrivalsDir)
    val q = raw.writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        // resolved per batch: a compaction between micro-batches moves the
        // live stream segment, and the epoch must land in the current one
        val streamDir = semanticState(spark, indexDir).streamDir(indexDir)
        val dst = s"$streamDir/epoch=$epoch"
        if (!DirCommit.exists(spark, dst)) {
          DirCommit.mkdirs(spark, streamDir)
          val tmp = s"$streamDir/.inflight-epoch=$epoch"
          semanticDedupAppend(
            semanticIndexSurvivors(spark, indexDir), batch, model, threshold, quantScale)
            .join(batch.select("vec_id", "embedding"), Seq("vec_id"))
            .select("vec_id", "embedding", "cluster")
            .write.mode("overwrite").parquet(tmp)
          DirCommit.commitDir(spark, tmp, dst)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Logical delete of indexed survivors: O(ids) tombstone append, applied
    * by every read through [[semanticIndexSurvivors]] and physically at
    * [[semanticIndexCompact]] — the [[Tombstones]] lifecycle on the
    * semantic-dedup family (takedowns never force a rebuild). Note the
    * model stays frozen: deleting training vectors does not retrain
    * centroids, exactly like deleting rows from any ANN index.
    *
    * Deliberately NO `semanticIndexUpsert` (the one family without the
    * atomic-replace mutation the others gained): the survivor set is
    * HISTORY-DEPENDENT — whether a document is a survivor depends on
    * which earlier survivor suppressed it, so "replace this doc's
    * embedding" is not a row swap but a re-classification against the
    * live survivors, and transitively the docs IT suppressed may need
    * re-admission, which this index does not record. The sanctioned
    * composition is [[semanticIndexDelete]] + routing the new version
    * through [[semanticIndexAppendStream]] (the classification path);
    * the non-atomic window is exactly the re-classification itself. */
  def semanticIndexDelete(ids: DataFrame, dir: String): Unit =
    Tombstones.delete(ids, dir, semanticState(ids.sparkSession, dir).tombstones)

  /** Major compaction: fold the streamed survivor segment back into the
    * cell-partitioned base and apply pending deletes physically (one
    * rewrite covers both). Runs when either a streamed segment or
    * tombstones exist; the source checkpoint is untouched, so a later
    * [[semanticIndexAppendStream]] still skips already-ingested files. */
  def semanticIndexCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val layout = IndexManifest.Layouts.semantic
    val prev = IndexManifest.resolve(spark, dir, layout)
    val hasStream = fs.exists(new org.apache.hadoop.fs.Path(prev.streamDir(dir)))
    if (!hasStream && Tombstones.read(spark, dir, prev.tombstones).isEmpty) return
    // next generation's base written first; ONE manifest commit then swaps
    // base + stream + tombstones atomically (the [[IndexManifest]] close of
    // the old delete-then-rename crash windows)
    val next = layout.advance(prev, carry = Set("model"))
    semanticIndexSurvivors(spark, dir)
      .select("vec_id", "embedding", "cluster")
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(next.tableDir(dir, "survivors"))
    IndexManifest.commit(spark, dir, next, layout)
  }

  /** [[CompactionTrigger]] applied to the semantic-dedup index (the
    * [[minhashIndexMaybeCompact]] contract). */
  def semanticIndexMaybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      ratio: Double = 0.01,
      streamRatio: Double = 0.25): Boolean = {
    val st = semanticState(spark, dir)
    val due = CompactionTrigger.due(
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "survivors")),
      CompactionTrigger.rowsIn(spark, st.streamDir(dir)),
      Tombstones.read(spark, dir, st.tombstones).fold(0L)(_.count()),
      ratio,
      streamRatio)
    if (due) semanticIndexCompact(spark, dir)
    due
  }

  /** Dedup a batch of arrivals against the persisted index under its
    * FROZEN model and append the batch's survivors (partition-append —
    * existing cells' files untouched). Cumulative: a later batch sees this
    * batch's survivors as part of the base. */
  def semanticIndexAppend(
      batch: DataFrame,
      dir: String,
      threshold: Double = 0.4,
      quantScale: Int = 4096): Unit = {
    val spark = batch.sparkSession
    val model = semanticIndexModel(spark, dir)
    require(model.nonEmpty, s"semantic index at $dir has an empty model")
    semanticDedupAppend(semanticIndexSurvivors(spark, dir), batch, model, threshold, quantScale)
      .join(batch.select("vec_id", "embedding"), Seq("vec_id"))
      .select("vec_id", "embedding", "cluster")
      .write.mode("append").partitionBy("cluster")
      .parquet(semanticState(spark, dir).tableDir(dir, "survivors"))
  }

  /** Semantic benchmark decontamination: every (benchmark, corpus) vector
    * pair with cosine ≥ threshold — the embedding-space analog of the
    * trigram [[contaminationPairs]], catching paraphrased eval leakage that
    * lexical overlap misses. Returns (b_id, c_id, sim); drop contaminated
    * docs with `corpus.join(broadcast(pairs.select("c_id").distinct()),
    * "left_anti")`.
    *
    * Scale shape: benchmark sets are small by nature (10³–10⁵ rows), so the
    * benchmark side — with norms precomputed per vector — broadcasts, and
    * the corpus streams through a BroadcastNestedLoopJoin: zero corpus
    * shuffle at any corpus size, cost N_corpus · N_bench native dots. For a
    * benchmark too big to broadcast, bucket both sides with the same SRP
    * bands as [[embeddingCosinePairsLsh]] instead. */
  def embeddingContaminationPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorFunctions._
    // array<double> + norm per vector BEFORE the pairwise stage (same
    // rationale as embeddingCosinePairs: per-pair casts are quadratic).
    def keyed(d: DataFrame, id: String, v: String, n: String) =
      d.select(col("vec_id").as(id), col("embedding").cast("array<double>").as(v))
        .withColumn(n, norm(col(v)))
    val b = keyed(benchmark, "b_id", "vb", "nb")
    val c = keyed(corpus, "c_id", "vc", "nc")
    c.join(broadcast(b))
      .withColumn("sim", dot(col("vb"), col("vc")) / (col("nb") * col("nc")))
      .filter(col("sim") >= threshold)
      .select("b_id", "c_id", "sim")
  }

  /** Embedding-cosine near-dup pairs over `(vec_id, embedding)`: banded
    * SRP-LSH candidates + exact cosine verification ≥ threshold — the
    * linear-ish scale path for [[embeddingCosinePairs]].
    *
    * `bands` independent sign-random-projection signatures of
    * `planesPerBand` bits each; a pair is a candidate iff ALL bits of ANY
    * band agree (the classic OR-of-ANDs construction, same shape as
    * [[minhashLshPairs]]). Recall at cosine s is
    * 1 − (1 − p^r)^B with p = 1 − acos(s)/π — tune up by adding bands,
    * down by adding planes per band. Precision is exact: every candidate is
    * re-verified with the true cosine, so the output is always a subset of
    * the exact variant's pairs.
    *
    * SIZING `planesPerBand` IS THE SCALE KNOB: each band has only 2^r
    * buckets, so expected bucket size is N/2^r and the per-band join does
    * ~N²/2^r·B pair probes — r must grow with log₂(N) (aim r ≈
    * log₂(N/targetBucketSize), then pick B from the recall formula; at
    * near-dup thresholds p is high, so p^r decays slowly). Measured
    * (graft.tools.EmbLshBench, clustered vectors, cos ≥ 0.9, local[32]):
    * under-sized r=4 at 8k vectors leaves 16 buckets/band of ~500 vectors
    * and runs 10× slower than the exact cartesian; properly-sized r it's
    * 24.8 s at 32k (r=11) and 74.5 s at 100k (r=13), recall 1.0. Under-
    * sized r also trips the bucket cap on EVERY bucket at large N, silently
    * dropping all candidates: if the operator returns suspiciously few
    * pairs at scale, check r before blaming the data. The r=4 default fits
    * the sf0.01/sf0.001 verify corpora (500/66 vectors).
    *
    * Honest crossover vs [[embeddingCosinePairs]]: the exact cartesian is a
    * zero-shuffle stream of native dots and wins up to surprisingly large N
    * on one box (4.3 s at 32k, 34.5 s at 100k) — the LSH path pays ~6
    * shuffles plus candidate-pair vector traffic. Exact grows ∝N² while
    * LSH grows ~linearly, so they cross near N ≈ 2–3·10⁵ locally
    * (extrapolated at 1M: ~1 h exact vs ~12 min LSH), and at corpus scale
    * the cartesian is simply impossible — use exact below ~10⁵ vectors (or
    * per blocking partition), LSH above.
    *
    * Scale shape: one narrow pass computes all band signatures (B·r native
    * dot products per vector), explode to (vec_id, band, bucket) — B rows
    * per vector, id+key only, NOT the vector — then per-(band,bucket)
    * self-join under [[capBuckets]], pair-dedup across bands, and one
    * verification join back to the vectors. Nothing pairwise ever sees the
    * raw vectors except verified candidates. */
  def embeddingCosinePairsLsh(
      embeddings: DataFrame,
      threshold: Double = 0.4,
      bands: Int = 8,
      planesPerBand: Int = 4,
      dim: Int = 64,
      maxBucket: Int = 5000): DataFrame = {
    import graft.functions.VectorFunctions._
    val vecs = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bandCols = (0 until bands).map { bIdx =>
      val planes = randomPlanes(planesPerBand, dim, seed = 42L + bIdx)
      struct(lit(bIdx).as("band"), srpBucket(col("v"), planes).as("bucket"))
    }
    val tagged = vecs
      .select(col("vec_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // Cap via agg + broadcast anti join, NOT the capBuckets window: the
    // window form wins only when the keyed subtree is expensive to evaluate
    // twice (text signatures); here the signature pass is trivial (B·r
    // native dots) while WindowExec's per-group buffering over B·2^r tiny
    // groups dominates — profiled 10-14 s per evaluation at 32k vectors
    // (EmbLshBench stage timings) vs ~0.3 s for the agg+anti form. The
    // oversized list is empty when r is sized right, so the broadcast is
    // bytes.
    val oversized = tagged
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > maxBucket)
      .select("band", "bucket")
    // Materialize the capped (vec_id, band, bucket) table ONCE before the
    // self-join: both join sides otherwise re-evaluate the whole candidate
    // -generation subtree (signatures + cap) — measured as the difference
    // between a 30.8 s and a ~8 s run at 32k vectors. The table is id+key
    // only (B rows per vector, ~20 bytes each), so the checkpoint is tiny
    // relative to the corpus at any scale. `eager = false`: construction
    // must stay lazy — an eager checkpoint would run the whole signature
    // pipeline every time the QUERY OBJECT is built (plan inspection, bench
    // warmup, verify registration), the exact leak the recall gates fixed.
    val capped = tagged
      .join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
      .localCheckpoint(eager = false)
    val candidates = capped
      .select(col("vec_id").as("a_id"), col("band"), col("bucket"))
      .join(capped.select(col("vec_id").as("b_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct() // a pair colliding in several bands verifies once
    val withNorm = vecs.withColumn("nrm", norm(col("v")))
    candidates
      .join(withNorm.select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na")),
        Seq("a_id"))
      .join(withNorm.select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("b_id"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** Cross-document duplicated-span detection — the Spark shape of exact
    * substring dedup (the suffix-array pass of "Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022, approximated at the
    * token-window granularity a distributed engine can shuffle): for each
    * document, how many of its distinct `n`-token windows also appear
    * verbatim in at least one OTHER document.
    *
    * Returns `(doc_id, n_win, n_dup, dup_frac)` for every document —
    * `n_win` = distinct windows, `n_dup` = windows shared cross-doc,
    * `dup_frac` = n_dup / n_win (0.0 for short docs with no windows, so the
    * column is total and engines cannot disagree on NULL ordering).
    *
    * Scale shape: windows travel as 64-bit [[graft.functions.TextFunctions
    * .shingleHashes]] hashes, never strings — (doc_id, h) rows are 16 bytes.
    * One map-side-combined shuffle counts documents per window hash (the
    * kernel's per-doc distinctness means `count(*)` IS the doc count); the
    * cross-doc set joins back against the exploded windows (AQE picks
    * broadcast when the duplicated set is small, shuffle join otherwise);
    * per-doc totals are a row-local `size()` — no second aggregate over the
    * corpus. The window kernel is evaluated in two plan branches (count
    * projection + explode); at 100 TB that is the right trade — re-running a
    * per-row kernel is cheaper than materializing or shuffling the exploded
    * window table twice.
    *
    * Collision caveat: grouping is by 64-bit hash, so two distinct spans
    * colliding would count as duplicates — at 10^9 distinct windows the
    * expected collision count is ~0.03 (birthday bound), which is noise at
    * corpus scale and absent at test scale. */
  /** Boilerplate-chunk removal stats (C4-style): a `chunkTokens`-token chunk
    * that appears in >= `minDocs` DISTINCT documents is boilerplate
    * (headers, nav, legal footers) and counts as dropped EVERYWHERE — unlike
    * the paragraph dedup's keep-first-owner rule, no copy survives. Returns
    * `(doc_id, n_chunks, n_boiler, keep_ratio)`.
    *
    * Scale shape: chunks carry only `(doc_id, md5)` into the frequency join
    * — never the text — and both aggregates combine map-side on the 16-byte
    * hash. Same chunking contract as the paragraph dedup so the two stay
    * comparable.
    */
  def boilerplateChunkStats(
      documents: DataFrame,
      chunkTokens: Int = 12,
      minDocs: Int = 3): DataFrame = {
    val chunks = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn(
        "start",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(chunkTokens))))
      .select(
        col("doc_id"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkTokens))))
          .as("ch"))
    val freq = chunks.groupBy("ch").agg(countDistinct("doc_id").as("ndocs"))
    chunks
      .join(freq, Seq("ch"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L)).cast("long").as("n_boiler"))
      .withColumn(
        "keep_ratio",
        round(lit(1.0) - col("n_boiler").cast("double") / col("n_chunks"), 4))
  }

  def duplicatedSpanStats(documents: DataFrame, n: Int = 8): DataFrame = {
    val base = documents.select(
      col("doc_id"),
      shingleHashes(tokens(col("text")), n).as("hs"))
    val wins = base.select(col("doc_id"), explode(col("hs")).as("h"))
    val crossDoc = wins
      .groupBy("h")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("h")
    val dupPerDoc = wins
      .join(crossDoc, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup"))
    base
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_win"))
      .join(dupPerDoc, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("n_win"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(col("n_win") > 0,
          coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_win"))
          .otherwise(lit(0.0))
          .as("dup_frac"))
  }

  /** Cross-source duplication matrix: for every unordered source pair
    * (s1 ≤ s2), how many verified near-dup pairs straddle them — the
    * curation diagnostic that tells you WHICH crawls duplicate each other
    * (and how much of a source is self-duplication) before deciding what
    * to drop at corpus scale.
    *
    * Scale shape: reuses the blocked+capped [[ngramJaccardPairs]] candidate
    * machinery (never all-pairs); the verified id-pair set then joins the
    * corpus' (doc_id, source) projection twice — id-keyed joins of an
    * O(pairs) table against a two-column projection, with the pair sources
    * normalized (least/greatest) so each unordered source pair is one cell.
    * Output is O(|sources|²) cells, model-sized at any corpus scale.
    */
  def crossSourceDupMatrix(documents: DataFrame, threshold: Double = 0.3): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    ngramJaccardPairs(documents, threshold)
      .select("a_id", "b_id")
      .join(src.toDF("a_id", "sa"), Seq("a_id"))
      .join(src.toDF("b_id", "sb"), Seq("b_id"))
      .select(
        least(col("sa"), col("sb")).as("s1"),
        greatest(col("sa"), col("sb")).as("s2"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
  }
}

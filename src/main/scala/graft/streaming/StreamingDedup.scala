package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming exact dedup across micro-batches (SURVEY §2.11 extension): the
  * continuous-ingest version of [[graft.operators.Dedup.incrementalDedup]]'s
  * exact stage. Each arriving document is classified `kept` (first time this
  * content has ever been seen) or `exact_dup`, with the seen-set carried as
  * keyed streaming state so a duplicate is caught no matter how many days
  * separate it from the original — `dropDuplicatesWithinWatermark` cannot
  * express that (its state, by design, expires with the watermark).
  *
  * Scale shape: state is keyed by the 64-bit content hash, so the store
  * holds one ~16-byte entry per DISTINCT document ever ingested — the
  * smallest possible representation of "what have I seen" short of lossy
  * sketches, partitioned across executors by hash (RocksDB-backed in
  * production, `spark.sql.streaming.stateStore.providerClass`). Unlike the
  * batch path there is no corpus rescan per batch: each micro-batch costs
  * O(batch) state lookups. For corpora where even the hash set outgrows the
  * store, the documented fallback is the batch [[graft.operators.Dedup
  * .incrementalDedup]] whose Bloom stage bounds driver+executor memory
  * explicitly.
  *
  * Within a micro-batch, ties collapse to the lowest doc_id (events in one
  * batch have no arrival order) — same first-wins policy as the batch
  * operators, and deterministic under replay, so the checkpoint's
  * exactly-once contract extends to the classification itself.
  */
object StreamingDedup {

  /** One classified document. */
  case class DedupVerdict(doc_id: Long, status: String)

  /** Streaming source over a documents parquet directory (file source:
    * new files discovered per micro-batch). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .parquet(dir)

  /** One near-dup classification: `best_est` is the highest MinHash
    * component-agreement estimate against any corpus candidate (−1.0 when
    * the doc hit no index bucket). */
  case class NearVerdict(doc_id: Long, status: String, best_est: Double)

  /** Streaming NEAR-dedup against a static corpus index — the continuous
    * version of [[graft.operators.Dedup.incrementalDedup]]'s near stage.
    * Each arriving document computes its LSH band buckets (same parameters
    * as the index), stream-static equi-joins [[graft.operators.Dedup
    * .minhashIndex]] on `bucket`, and estimates Jaccard against each
    * candidate as the fraction of agreeing MinHash components — corpus
    * TEXT is never rescanned; the index rows carry everything needed.
    * Verdict per doc: `near_dup` iff any candidate's estimate ≥
    * `threshold`, else `kept`.
    *
    * Scale shape: the join is stream-static (index side is a plain
    * equi-join build per micro-batch — bucketed/broadcast by Spark
    * depending on index size), and the per-doc collapse runs through
    * flatMapGroupsWithState with state NEVER updated, so the state store
    * stays empty — it is used only as the per-key collapse primitive that
    * streaming append mode permits (a streaming self-join or aggregation
    * would demand watermarks this classification doesn't need).
    * Boundary: duplicates of OTHER STREAMED docs are not caught here —
    * that is [[classify]]'s exact stage or a periodic index refresh;
    * stream-vs-stream NEAR-dedup needs a watermarked similarity join that
    * no bounded state can express exactly.
    *
    * The `maxBucket` cap is enforced on the index side HERE, not only at
    * index build time: a live index fed by per-batch/streamed appends can
    * hold buckets past the cap until its next compaction, and an uncapped
    * hot bucket would fan every colliding arrival out by its full size.
    * The cap is one window count over the static side (re-evaluated per
    * micro-batch with the rest of the static plan — cache the index
    * DataFrame across batches if that matters). */
  def classifyNear(
      documents: DataFrame,
      index: DataFrame,
      threshold: Double = 0.5,
      numPerm: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 2000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val banded = graft.operators.Dedup.bandedBuckets(documents, numPerm, bands)
    val est = banded
      .join(graft.operators.Dedup.capBuckets(index, Seq("bucket"), maxBucket), Seq("bucket"))
      .select(
        col("doc_id"),
        (size(filter(zip_with(col("sig"), col("c_sig"), (a, b) => a === b), x => x))
          / lit(numPerm.toDouble)).as("est"))
    val base = documents.select(col("doc_id"), lit(-1.0).as("est"))
    est
      .unionByName(base)
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, NearVerdict](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout())( (id, rows, _) => {
        val best = rows.map(_._2).max
        Iterator.single(
          NearVerdict(id, if (best >= threshold) "near_dup" else "kept", best))
      })
      .toDF()
  }

  /** One semantic classification: best cosine against any same-cell base
    * survivor (−1.0 when the vector's cell holds no survivors). */
  case class SemanticVerdict(vec_id: Long, cluster: Long, status: String, best_sim: Double)

  /** Streaming source over an embeddings parquet directory. */
  def readVectors(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .parquet(dir)

  /** Streaming SEMANTIC dedup against a static survivor set under a frozen
    * k-means model — the continuous version of [[graft.operators.Dedup
    * .semanticDedupAppend]]'s vs-base stage. Each arriving vector is
    * assigned its cell by [[graft.operators.Dedup.semanticAssign]] (a pure
    * projection — the model rides the plan as literals, so it runs inside
    * the stream with no extra source), stream-static joins the survivors on
    * the CELL key, and is flagged `near_dup` iff its best same-cell cosine
    * reaches `threshold`.
    *
    * Scale shape: the join probes only the vector's own cell (O(|cell|)
    * candidates per arrival, corpus-history independent); the per-vector
    * collapse runs through flatMapGroupsWithState with state never updated
    * (the [[classifyNear]] contract), so the state store stays empty.
    * Boundary, same as [[classifyNear]]: near-dups of OTHER STREAMED
    * vectors are not caught here — fold survivors back periodically with
    * the batch [[graft.operators.Dedup.semanticDedupAppend]]. */
  def classifySemantic(
      vectors: DataFrame,
      keptBase: DataFrame,
      model: Seq[(Long, Array[Double])],
      threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorFunctions._
    val spark = vectors.sparkSession
    import spark.implicits._
    val a = graft.operators.Dedup.semanticAssign(vectors, model)
      .withColumn("nrm", norm(col("v")))
    val s = keptBase
      .select(col("cluster"), col("embedding").cast("array<double>").as("sv"))
      .withColumn("sn", norm(col("sv")))
    val est = a
      .join(s, Seq("cluster"))
      .select(col("vec_id"), col("cluster"),
        (dot(col("v"), col("sv")) / (col("nrm") * col("sn"))).as("sim"))
    val base = a.select(col("vec_id"), col("cluster"), lit(-1.0).as("sim"))
    est
      .unionByName(base)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, SemanticVerdict](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout())( (id, rows, _) => {
        val rs = rows.toArray
        val best = rs.map(_._3).max
        Iterator.single(SemanticVerdict(
          id, rs.head._2, if (best >= threshold) "near_dup" else "kept", best))
      })
      .toDF()
  }

  /** The continuous-curation ARRIVAL LOOP as a streaming job — the
    * streaming twin of [[graft.operators.Dedup.arrivalDedupStep]]. Drains
    * an arrivals parquet dir (Trigger.AvailableNow + checkpoint) and per
    * micro-batch: lands the batch in the persisted minhash LSH index,
    * contracts its touched duplicate components into the persisted
    * cluster index, and commits the batch's SURVIVOR slice epoch-keyed
    * under `outDir/epochs/epoch=N` ([[StreamingSearch]]'s commit
    * discipline — stage to a dot-prefixed dir, the rename is the commit
    * point, replayed epochs are skipped). Cross-batch dedup is the
    * point: a later micro-batch's dup of an earlier batch's doc collides
    * in the index the earlier batch just fed — the static-corpus
    * boundary [[classifyNear]] documents does not exist here.
    *
    * At-least-once mechanics, spelled out: the index appends run INSIDE
    * the epoch guard, so a replayed already-committed epoch skips them.
    * A crash between append and commit replays the appends — minhash
    * re-appends are row-duplicates the candidate read dedups (semantics
    * unchanged, space reclaimed at compaction); a cluster re-append
    * writes an identical relabeling at the next seq (last-writer-wins
    * idempotent). The one narrow window — a crash between the cluster
    * append's seq CLAIM and its stripe write — fails the replay loudly
    * with the documented [[graft.operators.Dedup.clusterIndexCompact]]
    * recovery; it cannot corrupt.
    *
    * Emission stability: epoch dirs are append-only, so the emitted
    * survivor corpus is exact when arrival ids are monotone (ids
    * assigned at ingest — the natural crawl pattern): a mixed cluster's
    * min-id representative then always sits in the earliest epoch. A
    * SMALLER-id late arrival becomes its cluster's new representative
    * and both copies appear across epochs; readers needing the strict
    * closed-corpus view re-filter the emitted union through
    * [[graft.operators.Dedup.dropDuplicateClustersFromIndex]] — the
    * assignments index is the single source of truth either way.
    *
    * Each drain ends with the self-applying maintenance sweep over the
    * two indexes (compaction triggers + the deep visibility audit), so
    * the turnkey loop needs no separate scheduler entry. */
  def arrivalLoopAvailableNow(
      spark: SparkSession,
      minhashDir: String,
      clusterDir: String,
      arrivalsDir: String,
      outDir: String,
      checkpoint: String,
      threshold: Double = 0.5,
      maxFilesPerTrigger: Option[Int] = None,
      sweep: Boolean = true): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.DirCommit
    val src = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    maxFilesPerTrigger.foreach(n => src.option("maxFilesPerTrigger", n))
    val q = src.parquet(arrivalsDir).writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val dst = s"$outDir/epochs/epoch=$epoch"
        if (epoch > EpochLog.state(spark, outDir).mark && !DirCommit.exists(spark, dst)) {
          DirCommit.mkdirs(spark, s"$outDir/epochs")
          val tmp = s"$outDir/epochs/.inflight-epoch=$epoch"
          graft.operators.Dedup
            .arrivalDedupStep(batch, minhashDir, clusterDir, threshold)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
          DirCommit.commitDir(spark, tmp, dst)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (sweep) {
      val _ = graft.operators.IndexMaintenance.sweep(spark, Seq(
        graft.operators.IndexMaintenance.MinhashIndex(minhashDir),
        graft.operators.IndexMaintenance.ClusterIndex(clusterDir)))
    }
  }

  /** The survivor corpus the loop has committed so far — one row per
    * kept arrival, `epoch` = the micro-batch that admitted it. Epoch
    * dirs are the loop's DATA OUTPUT (a curated-corpus delta per batch,
    * the unit a downstream training pipeline consumes and moves on), so
    * there is no fold here; a not-yet-started out dir reads as zero
    * rows. */
  def arrivalSurvivors(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType),
        StructField("epoch", IntegerType))))
    val p = s"$outDir/epochs"
    if (!graft.operators.DirCommit.exists(spark, p)) empty
    else
      try spark.read.parquet(p)
        .select("doc_id", "text", "lang", "source", "n_chars", "epoch")
      catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  /** Classify each streamed document against all content ever seen:
    * first occurrence of a normalized content hash → `kept`, every later
    * one → `exact_dup`. */
  def classify(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        xxhash64(trim(lower(regexp_replace(col("text"), "\\s+", " ")))).as("fph"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, DedupVerdict](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout())( (_, rows, state) => {
        val ids = rows.map(_._1).toArray.sorted
        val seenBefore = state.exists
        if (!seenBefore) state.update(true)
        ids.iterator.zipWithIndex.map { case (id, i) =>
          DedupVerdict(id, if (seenBefore || i > 0) "exact_dup" else "kept")
        }
      })
      .toDF()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DirCommit, SimilaritySearch}

/** Continuous query serving against the persisted IVF×PQ index — the
  * search-side completion of the streaming index story (ingest:
  * [[graft.operators.SimilaritySearch.ivfPqIndexAppendStream]]; dedup
  * classification: [[StreamingDedup.classifyNear]]/`classifySemantic`).
  * A parquet directory of arriving query vectors is drained with
  * Trigger.AvailableNow + checkpoint, each micro-batch is answered by the
  * EXACT batch operator ([[SimilaritySearch.ivfPqIndexSearch]] under the
  * index's frozen models), and the per-batch answers land epoch-keyed
  * under `outDir/epochs/epoch=N/`.
  *
  * Why foreachBatch rather than a pure stream-static plan: per-query
  * top-k needs the probed-cell collect (a model-sized driver list that
  * buys partition pruning on both index scans) and two ranked-window
  * cuts — neither is expressible in append-mode streaming without
  * chained stateful operators. foreachBatch is the standard micro-batch
  * escape hatch, and it keeps the search SINGLE-SOURCED: the streamed
  * answer is row-identical to the batch answer by construction, not by a
  * parallel reimplementation (StreamingSearchSpec pins it anyway).
  *
  * Exactly-once: foreachBatch delivers at-least-once, so results commit
  * under the [[StreamingRollup]] epoch discipline — the batch id names
  * the directory, a replay targets an existing directory (or one already
  * folded below the [[EpochLog]] mark) and is skipped, and a
  * partially-written first attempt can't be mistaken for complete
  * because the batch stages to a dot-prefixed temp dir and the rename is
  * the commit point. All directory I/O goes through the Hadoop
  * FileSystem API ([[graft.operators.DirCommit]]), so the out dir can
  * live on HDFS-style shared storage with the index.
  *
  * Retention: a serving tier answering forever accrues one epoch dir per
  * micro-batch; [[compactAnswers]] folds epochs up to a watermark into
  * one base segment (epoch preserved as a data column — `answers()` rows
  * are unchanged by a fold) and bounds the directory count, the same LSM
  * close the index families got. Crash consistency rides the
  * [[EpochLog]] generation file, and the monotone mark keeps late
  * replays of folded epochs out.
  *
  * Scale shape: per micro-batch cost is the batch operator's — probed
  * cells only on both the 8-byte code scan and the survivor re-rank, the
  * query batch broadcast — so a serving tier is this drain on a short
  * trigger with the index dir on shared storage. Index mutations
  * (append/delete/compact) interleave safely between micro-batches: each
  * batch reads the index state at its own start. */
object StreamingSearch {

  private def epochsDir(outDir: String): String = s"$outDir/epochs"

  /** Streaming source over a query-vector parquet directory (the
    * embeddings arrival schema). */
  def readQueries(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .parquet(dir)

  /** Drain arriving queries, answer each micro-batch against the index,
    * and stop — checkpointed, so a re-run answers only queries that
    * arrived since the last run; a replayed (or already-folded) epoch is
    * skipped. */
  def serveAvailableNow(
      spark: SparkSession,
      indexDir: String,
      queriesDir: String,
      outDir: String,
      checkpoint: String,
      k: Int = 10,
      nprobe: Int = 2,
      rerank: Int = 200,
      maxEpochs: Int = 64,
      keepLast: Int = 8): Unit = {
    val q = readQueries(spark, queriesDir).writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val dst = s"${epochsDir(outDir)}/epoch=$epoch"
        if (epoch > EpochLog.state(spark, outDir).mark && !DirCommit.exists(spark, dst)) {
          DirCommit.mkdirs(spark, epochsDir(outDir))
          val tmp = s"${epochsDir(outDir)}/.inflight-epoch=$epoch"
          SimilaritySearch
            .ivfPqIndexSearch(spark, indexDir, batch, k, nprobe, rerank)
            .write.mode(SaveMode.Overwrite).parquet(tmp)
          DirCommit.commitDir(spark, tmp, dst)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // retention is part of the serving loop, not a separate chore: each
    // drain ends with the self-applying fold check (one directory listing
    // when under the cap)
    maybeCompactAnswers(spark, outDir, maxEpochs, keepLast)
  }

  /** Streaming source over a term-set query parquet directory. */
  def readTermQueries(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("q_id BIGINT, toks ARRAY<STRING>")
      .parquet(dir)

  /** [[serveAvailableNow]] for the TEXT lane: drain arriving `(q_id,
    * toks)` term-set queries and answer each micro-batch with the exact
    * batch operator ([[graft.operators.TextSearchIndex.searchTerms]] —
    * one pass over the batch's posting slices, frozen stats, live df)
    * under the identical epoch-commit/retention/crash discipline. With
    * both lanes served this way, a hybrid tier is two drains over the
    * same arrival stream fused downstream ([[graft.operators
    * .SimilaritySearch.rrfFuse]] on the two answer tables). */
  def serveTextAvailableNow(
      spark: SparkSession,
      indexDir: String,
      queriesDir: String,
      outDir: String,
      checkpoint: String,
      k: Int = 10,
      maxEpochs: Int = 64,
      keepLast: Int = 8): Unit = {
    val q = readTermQueries(spark, queriesDir).writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val dst = s"${epochsDir(outDir)}/epoch=$epoch"
        if (epoch > EpochLog.state(spark, outDir).mark && !DirCommit.exists(spark, dst)) {
          DirCommit.mkdirs(spark, epochsDir(outDir))
          val tmp = s"${epochsDir(outDir)}/.inflight-epoch=$epoch"
          graft.operators.TextSearchIndex
            .searchTerms(spark, indexDir, batch, k)
            .write.mode(SaveMode.Overwrite).parquet(tmp)
          DirCommit.commitDir(spark, tmp, dst)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    maybeCompactAnswers(
      spark, outDir, maxEpochs, keepLast, TextAnswerSchema.fieldNames.toSeq)
  }

  /** The vector serving tier's answer schema. */
  private val VectorAnswerSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("q_id", LongType),
      StructField("n_id", LongType),
      StructField("rank", LongType),
      StructField("sim", DoubleType),
      StructField("epoch", IntegerType)))
  }

  /** The text serving tier's answer schema ([[graft.operators
    * .TextSearchIndex.searchTerms]] columns + epoch). */
  private val TextAnswerSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("q_id", LongType),
      StructField("rk", LongType),
      StructField("doc_id", LongType),
      StructField("score", DoubleType),
      StructField("n_hit", LongType),
      StructField("epoch", IntegerType)))
  }

  /** All committed answers: `(q_id, n_id, rank, sim, epoch)` — the folded
    * base (if any) plus every live epoch above the fold mark. Zero-batch
    * runs leave only the checkpoint — an absent or empty out dir reads as
    * no answers yet, the [[graft.operators.Dedup.minhashIndexRows]]
    * empty-index contract. */
  def answers(spark: SparkSession, outDir: String): DataFrame =
    answersWith(spark, outDir, VectorAnswerSchema)

  /** [[answers]] for a text serving dir: `(q_id, rk, doc_id, score,
    * n_hit, epoch)`. */
  def textAnswers(spark: SparkSession, outDir: String): DataFrame =
    answersWith(spark, outDir, TextAnswerSchema)

  private def answersWith(
      spark: SparkSession,
      outDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val st = EpochLog.state(spark, outDir)
    def readIf(p: String): Option[DataFrame] =
      if (!DirCommit.exists(spark, p)) None
      else
        try Some(spark.read.parquet(p))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    val cols = schema.fieldNames.toSeq
    val base = readIf(st.baseDir(outDir).getOrElse(s"$outDir/__none__"))
    val live = readIf(epochsDir(outDir))
      .map(_.filter(col("epoch") > st.mark))
    (base.map(_.select(cols.map(col): _*)) ++ live.map(_.select(cols.map(col): _*)))
      .reduceLeftOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }

  /** Fold every epoch at or below `max(epoch) − keepLast` into one base
    * segment (epoch kept as a data column — `answers()` is unchanged by a
    * fold) and delete the folded dirs: LSM retention for the serving
    * output. `keepLast` leaves the newest epochs unfolded so the hot tail
    * stays cheap to append next to. Crash-consistent via [[EpochLog]]:
    * the state-file commit atomically swaps base + mark; a crash before
    * it leaves the old state fully live, after it the folded dirs are
    * ignored (and swept) by mark. */
  /** Self-applying retention (the
    * [[graft.operators.CompactionTrigger]] discipline on the serving
    * output): fold once the live epoch-dir count exceeds `maxEpochs`,
    * keeping the newest `keepLast` hot. One directory listing decides.
    * Returns whether a fold ran. */
  def maybeCompactAnswers(
      spark: SparkSession,
      outDir: String,
      maxEpochs: Int = 64,
      keepLast: Int = 8,
      cols: Seq[String] = VectorAnswerSchema.fieldNames.toSeq): Boolean = {
    val st = EpochLog.state(spark, outDir)
    val live = EpochLog.epochs(spark, epochsDir(outDir)).count(_ > st.mark)
    val due = live > maxEpochs
    if (due) compactAnswers(spark, outDir, keepLast, cols)
    due
  }

  def compactAnswers(
      spark: SparkSession,
      outDir: String,
      keepLast: Int = 0,
      cols: Seq[String] = VectorAnswerSchema.fieldNames.toSeq): Unit = {
    val st = EpochLog.state(spark, outDir)
    val es = EpochLog.epochs(spark, epochsDir(outDir)).filter(_ > st.mark)
    if (es.isEmpty) return
    val fold = es.dropRight(keepLast)
    if (fold.isEmpty) return
    val folded = spark.read
      .option("basePath", epochsDir(outDir)) // keep the epoch partition column
      .parquet(fold.map(e => s"${epochsDir(outDir)}/epoch=$e"): _*)
      .withColumn("epoch", col("epoch").cast("int"))
      .select(cols.map(col): _*)
    val withBase = st.baseDir(outDir) match {
      case Some(b) if DirCommit.exists(spark, b) =>
        spark.read.parquet(b).select(cols.map(col): _*).unionByName(folded)
      case _ => folded
    }
    val nextGen = st.gen + 1
    val nextBase = f"base-$nextGen%09d"
    withBase.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$nextBase")
    EpochLog.commit(
      spark,
      outDir,
      EpochLog.State(nextGen, math.max(st.mark, fold.max), Some(nextBase)),
      fold.map(e => s"${epochsDir(outDir)}/epoch=$e"),
      st.base)
  }
}

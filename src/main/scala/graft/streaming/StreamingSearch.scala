package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.SimilaritySearch

/** Continuous query serving against the persisted IVF×PQ index — the
  * search-side completion of the streaming index story (ingest:
  * [[graft.operators.SimilaritySearch.ivfPqIndexAppendStream]]; dedup
  * classification: [[StreamingDedup.classifyNear]]/`classifySemantic`).
  * A parquet directory of arriving query vectors is drained with
  * Trigger.AvailableNow + checkpoint, each micro-batch is answered by the
  * EXACT batch operator ([[SimilaritySearch.ivfPqIndexSearch]] under the
  * index's frozen models), and the per-batch answers land epoch-keyed
  * under `outDir/epoch=N/`.
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
  * the directory, a replay targets an existing directory and is skipped,
  * and a partially-written first attempt can't be mistaken for complete
  * because the batch stages to a dot-prefixed temp dir and the rename is
  * the commit point.
  *
  * Scale shape: per micro-batch cost is the batch operator's — probed
  * cells only on both the 8-byte code scan and the survivor re-rank, the
  * query batch broadcast — so a serving tier is this drain on a short
  * trigger with the index dir on shared storage. Index mutations
  * (append/delete/compact) interleave safely between micro-batches: each
  * batch reads the index state at its own start. */
object StreamingSearch {

  /** Streaming source over a query-vector parquet directory (the
    * embeddings arrival schema). */
  def readQueries(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .parquet(dir)

  /** Drain arriving queries, answer each micro-batch against the index,
    * and stop — checkpointed, so a re-run answers only queries that
    * arrived since the last run; a replayed epoch is skipped. */
  def serveAvailableNow(
      spark: SparkSession,
      indexDir: String,
      queriesDir: String,
      outDir: String,
      checkpoint: String,
      k: Int = 10,
      nprobe: Int = 2,
      rerank: Int = 200): Unit = {
    val q = readQueries(spark, queriesDir).writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val dst = Paths.get(s"$outDir/epoch=$epoch")
        if (!Files.exists(dst)) {
          Files.createDirectories(Paths.get(outDir))
          val tmp = s"$outDir/.inflight-epoch=$epoch"
          SimilaritySearch
            .ivfPqIndexSearch(spark, indexDir, batch, k, nprobe, rerank)
            .write.mode(SaveMode.Overwrite).parquet(tmp)
          Files.move(Paths.get(tmp), dst)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** All committed answers: `(q_id, n_id, rank, sim, epoch)`. Zero-batch
    * runs leave only the checkpoint — an absent or empty out dir reads as
    * no answers yet, the [[graft.operators.Dedup.minhashIndexRows]]
    * empty-index contract. */
  def answers(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    try spark.read.parquet(outDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("q_id", LongType),
            StructField("n_id", LongType),
            StructField("rank", LongType),
            StructField("sim", DoubleType),
            StructField("epoch", IntegerType))))
    }
  }
}

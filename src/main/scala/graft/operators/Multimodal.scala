package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.2 M5): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, and batch feature
  * extraction with the decode step STUBBED (the container has no codec
  * libraries). Everything Spark-side — schema, partitioning, batch shape,
  * iterator discipline — is real and tested; only `decodeStub` fakes the
  * bytes→pixels step, deterministically, and is the single splice point for a
  * real decoder.
  *
  * At 100 TB the partitioning contract matters more than the decode: payloads
  * stay in executor-local batches (`mapPartitions` over grouped iterators —
  * never collected, never shuffled), and feature extraction is a narrow map,
  * so scaling is linear in input splits.
  */
object Multimodal {

  /** One media row: payload + metadata, the schema a real ingest would carry. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features for one record (widths/heights are stub-derived). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  /** Ingest: treat each document's text bytes as an opaque media payload with
    * typed metadata columns — the binary-column pattern a real image/audio
    * table would use (payload: binary, mime: string, n_bytes: long). */
  def ingest(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      expr("octet_length(text)").cast("long").as("n_bytes"))

  /** STUB decoder — deterministic fake standing in for an image/audio codec.
    * A real implementation would decode `payload` here; batch boundaries,
    * output schema, and determinism are the contract this stub keeps. */
  private def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val n = r.n_bytes
      val feats = Array.tabulate(8) { i =>
        if (n > i) (r.payload(i.toInt % r.payload.length) & 0xff) / 255.0f else 0.0f
      }
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = n,
        width = (64 + n % 512).toInt,
        height = (64 + (n / 7) % 512).toInt,
        features = feats)
    }

  /** Batched feature extraction: partition-local, iterator-grouped into
    * `batchSize` chunks (the Scala analog of `mapInPandas` batch shape), one
    * stub-decode call per chunk. No shuffle, no driver collection. */
  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select("doc_id", "payload", "mime", "n_bytes")
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeStub(g.toSeq)))
  }

  /** One resized thumbnail record (payload stub-derived, dims real plumbing). */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, thumbnail: Array[Byte])

  /** STUB resize — a real codec would decode + rescale; the stub keeps the
    * contract (deterministic output bytes, target box honored with aspect
    * preserved) so the Spark-side plumbing is testable. */
  def resize(
      spark: SparkSession,
      media: DataFrame,
      maxW: Int,
      maxH: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    media
      .select("doc_id", "payload", "mime", "n_bytes")
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val srcW = (64 + r.n_bytes % 512).toInt
        val srcH = (64 + (r.n_bytes / 7) % 512).toInt
        val scale = math.min(1.0, math.min(maxW.toDouble / srcW, maxH.toDouble / srcH))
        val (w, h) = (math.max(1, (srcW * scale).toInt), math.max(1, (srcH * scale).toInt))
        ResizedMedia(r.doc_id, w, h, r.payload.take(math.min(r.payload.length, w)))
      }))
  }

  /** One sampled frame of a (stub) video payload. */
  case class Frame(doc_id: Long, frame_idx: Int, offset_bytes: Long, frame: Array[Byte])

  /** STUB frame sampling: treats the payload as `frameSize`-byte frames and
    * emits every `stride`-th one — the iterator/explode shape (one input row
    * → N frame rows, partition-local) of real video sampling. */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      frameSize: Int = 16,
      stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media
      .select("doc_id", "payload", "mime", "n_bytes")
      .as[MediaRecord]
      .flatMap { r =>
        val nFrames = r.payload.length / frameSize
        (0 until nFrames by stride).map { i =>
          Frame(r.doc_id, i, i.toLong * frameSize, r.payload.slice(i * frameSize, (i + 1) * frameSize))
        }
      }
  }
}

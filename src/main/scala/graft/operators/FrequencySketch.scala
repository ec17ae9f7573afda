package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min frequency sketches: point-frequency estimates over a token
  * stream without storing the stream.
  *
  * The missing member of the mergeable-sketch family next to HLL++
  * (`q_approx_stats`, `q_sketch_rollup_gate`) and GK quantiles: where HLL
  * answers "how many distinct", count-min answers "how often does THIS term
  * occur" in O(width×depth) memory regardless of stream length — the
  * building block for heavy-hitter monitoring over a 100 TB token stream.
  *
  * Scale shape: `count_min_sketch` is a mergeable TypedImperativeAggregate —
  * each input partition folds its rows into a local sketch (width×depth
  * counters, ~100 KB), and the one exchange carries those partial sketches,
  * not rows. Merging is counter-wise addition, which is EXACT: a sketch
  * built per shard and summed is identical (same estimates, same total) to
  * one built over the whole stream with the same (eps, confidence, seed).
  * That makes it an incremental-rollup primitive: keep per-day sketches,
  * answer any date range by summing — zero token rows rescanned, the same
  * contract `IncrementalRollup.distinctUsersOverRange` gives for HLL.
  *
  * Estimate guarantees (probed end-to-end by `q_cms_gate`): never
  * undercounts (deterministic — every counter a term hashes to received all
  * its increments), overcounts by at most eps·N with probability ≥
  * confidence (N = stream length), and shard-merge equals whole-stream.
  *
  * The model-to-driver pattern mirrors ANN-IVF's centroid model: only the
  * KB-sized sketch reaches the driver, and probing k candidate terms is k
  * array lookups there. No UDF, no row-level shuffle, no collect of data.
  */
object FrequencySketch {

  /** One sketch over string column `colName`. Null rows are skipped by the
    * aggregate (SQL null-skipping semantics); an all-null or empty input
    * yields an empty sketch rather than a failure.
    */
  def build(
      df: DataFrame,
      colName: String,
      eps: Double,
      confidence: Double,
      seed: Int): CountMinSketch = {
    val bytes = df
      .agg(expr(s"count_min_sketch($colName, ${eps}d, ${confidence}d, $seed)").as("cms"))
      .head()
      .getAs[Array[Byte]]("cms")
    if (bytes == null) CountMinSketch.create(eps, confidence, seed)
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Per-group sketches merged on the driver — the incremental-rollup path.
    * Each group's sketch is built independently (partial aggregation per
    * partition, one exchange of sketch bytes keyed by group), then summed
    * counter-wise. Exactness of the merge is what `q_cms_gate` pins.
    */
  def buildMerged(
      df: DataFrame,
      colName: String,
      groupCol: String,
      eps: Double,
      confidence: Double,
      seed: Int): CountMinSketch = {
    val parts = df
      .groupBy(groupCol)
      .agg(expr(s"count_min_sketch($colName, ${eps}d, ${confidence}d, $seed)").as("cms"))
      .collect()
      .map(r => CountMinSketch.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("cms"))))
    if (parts.isEmpty) CountMinSketch.create(eps, confidence, seed)
    else parts.reduce((a, b) => a.mergeInPlace(b))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollup maintenance — the incremental-analytics pattern
  * for 100 TB event history.
  *
  * A distinct-count over an arbitrary date range normally rescans every
  * event in the range. Instead, each ingest batch writes ONE row per day
  * carrying a mergeable HLL sketch of that day's users
  * (`hll_sketch_agg`, the Apache DataSketches HLL built into Spark); any
  * later range query unions O(days) sketch rows (`hll_union_agg`) — the
  * event history is never rescanned, and adding a new day never touches
  * the existing rows. HLL union is lossless with respect to the sketch
  * STATE (the register-wise max of two sketches IS the sketch of the
  * union); the resulting estimate agrees with a one-shot sketch of the
  * whole range up to estimator choice — DataSketches reads a
  * directly-updated sketch with the HIP estimator but a unioned one with
  * the composite estimator, so the two can differ slightly past
  * exact-coupon mode. Pinned (as a 1% agreement bound) in
  * `IncrementalRollupSpec` and the registered gate query; append-vs-
  * rebuild equality is exact, since both sides go through the union path.
  */
object IncrementalRollup {

  /** One row per day: exact event count + mergeable HLL sketch of the
    * day's distinct users. One map-side-combined shuffle keyed by day; the
    * output is the table an ingest job appends to (a new day = one new
    * row, existing rows untouched). */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(
        count(lit(1)).as("n_events"),
        expr("hll_sketch_agg(user_id)").as("sketch"))

  /** Distinct-user estimate over [from, to] (inclusive ISO dates) by
    * merging the per-day sketches: O(days in range) rows move, zero event
    * rows. */
  def distinctUsersOverRange(sketches: DataFrame, from: String, to: String): DataFrame =
    sketches
      .filter(col("day").between(from, to))
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est_users"),
        sum("n_events").as("n_events"),
        count(lit(1)).as("n_days"))

  /** The third member of the mergeable-rollup family — QUANTILES, next to
    * distinct counts ([[dailyUserSketches]], HLL) and frequencies
    * ([[dailyTermSketches]], count-min). One row per `(day, bin)` where
    * `bin = floor(value / binWidth)`: an integer histogram whose merge is
    * exact counter addition, so append-vs-rebuild equality is exact and a
    * range quantile probe never rescans events. Unlike the HLL/CMS blobs
    * the sketch state here is engine-replayable (floor on IEEE doubles is
    * exact in any engine), so the probe below is FULLY oracled, not just
    * contract-gated.
    *
    * `binWidth` must be exactly representable in binary (1.0, 0.5, 0.25,
    * 2.0, …) so `floor(value / binWidth)` is computed without rounding and
    * `value ∈ [bin·w, (bin+1)·w)` holds mathematically — the within-bin
    * containment the gate asserts is then guaranteed, never ULP-lucky.
    *
    * Rows per day ≤ (value range / binWidth) — bounded by the DOMAIN, not
    * the data volume: at 100 TB the histogram table is still O(days × bins).
    */
  def dailyValueHistograms(events: DataFrame, binWidth: Double = 1.0): DataFrame = {
    require(
      binWidth > 0 && !binWidth.isInfinite &&
        (java.lang.Double.doubleToLongBits(binWidth) & 0x000fffffffffffffL) == 0L,
      s"binWidth must be a power of two for exact binning, got $binWidth")
    events
      .select(
        to_date(col("ts")).as("day"),
        floor(col("value") / lit(binWidth)).cast("long").as("bin"))
      .groupBy("day", "bin")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Order-statistic quantile probes over [from, to] from the per-day
    * histograms: for each probe `p` (DECIMAL(5,4) — `k = ceil(p·n)` is
    * computed in exact decimal arithmetic, never a double rounding away
    * from the intended rank), returns the bin bracketing the k-th smallest
    * value, i.e. the exact quantile located to within one `binWidth`.
    *
    * Shape: the merge is one map-side-combined sum keyed by bin over
    * O(days × bins) rows; the cumulative window runs over O(bins) rows
    * (hundreds — bounded by the value domain), never over events. Output:
    * `(p, n_range, k, bin, lo, hi)`, one row per probe.
    */
  def quantileOverRange(
      hists: DataFrame,
      from: String,
      to: String,
      ps: Seq[String],
      binWidth: Double = 1.0): DataFrame = {
    val spark = hists.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val merged = hists
      .filter(col("day").between(from, to))
      .groupBy("bin")
      .agg(sum("cnt").as("cnt"))
    val cum = merged
      .withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
      .withColumn("n_range", sum("cnt").over(Window.partitionBy()))
    val probes = ps.toDF("p_raw").select(col("p_raw").cast("decimal(5,4)").as("p"))
    probes
      .crossJoin(cum)
      .withColumn("k", ceil(col("p") * col("n_range")).cast("long"))
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(
        // k was derived from the DECIMAL p (exact ceil(p·n) in both
        // engines); the OUTPUT column is double — decimal columns are
        // hash-canonicalization-fragile across engines (round-4 lesson).
        col("p").cast("double").as("p"),
        col("n_range"),
        col("k"),
        col("bin"),
        (col("bin") * lit(binWidth)).as("lo"),
        ((col("bin") + 1) * lit(binWidth)).as("hi"))
  }

  /** The same rollup for term FREQUENCIES: one row per day carrying a
    * count-min sketch of that day's token stream (plus the exact stream
    * length). Same maintenance contract as [[dailyUserSketches]] — a new
    * day appends one row, existing rows are never touched, and any range
    * query is answered from O(days) sketch rows.
    *
    * `tokens` must have a `day` date column and a string `tok` column
    * (e.g. exploded tokenizer output joined to an ingest date).
    */
  def dailyTermSketches(
      tokens: DataFrame,
      eps: Double,
      confidence: Double,
      seed: Int): DataFrame =
    tokens
      .groupBy("day")
      .agg(
        count(lit(1)).as("n_tokens"),
        expr(s"count_min_sketch(tok, ${eps}d, ${confidence}d, $seed)").as("sketch"))

  /** Frequency estimates for `terms` over [from, to]: the range's per-day
    * sketches (KB each) are collected and summed counter-wise on the driver
    * — unlike HLL there is no SQL-level union aggregate for count-min, but
    * the merge is EXACT (counter addition), so the range sketch equals one
    * built over the whole range's stream; `FrequencySketchSpec` and
    * `q_cms_gate` pin that. Returns one row per probed term. Zero token
    * rows are rescanned; only O(days) sketch blobs move.
    */
  def termFreqOverRange(
      sketches: DataFrame,
      from: String,
      to: String,
      terms: Seq[String],
      eps: Double,
      confidence: Double,
      seed: Int): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val inRange = sketches
      .filter(col("day").between(from, to))
      .select("sketch")
      .collect()
      .map(r =>
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("sketch"))))
    val merged =
      if (inRange.isEmpty) org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed)
      else inRange.reduce((a, b) => a.mergeInPlace(b))
    terms
      .map(t => (t, merged.estimateCount(t), merged.totalCount()))
      .toDF("tok", "est", "n_tokens_range")
  }
}

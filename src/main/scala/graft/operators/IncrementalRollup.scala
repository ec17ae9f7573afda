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
}

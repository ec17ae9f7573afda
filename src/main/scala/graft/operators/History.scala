package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — the natural extension of the
  * reference's repeated full dimension reloads (YhCldETL.java:60-97 re-puts
  * every row on every run, silently overwriting history) and of the
  * `q_snapshot_diff` reconciliation: instead of classifying what changed,
  * emit the SCD type-2 validity intervals a warehouse keeps.
  */
object History {

  /** SCD2 merge of two keyed snapshots taken at `d1` < `d2`. Inputs are
    * `(k, v)` tables (one row per key); output is the history table
    * `(k, v, valid_from, valid_to, is_current)`:
    *
    *   - unchanged key:   one row  `[d1, null)` current
    *   - changed key:     old row  `[d1, d2)` closed + new row `[d2, null)`
    *   - key only in v2:  new row  `[d2, null)` current (added)
    *   - key only in v1:  old row  `[d1, d2)` closed (removed)
    *
    * Scale shape: ONE full-outer shuffle join on the key (the same single
    * exchange as `q_snapshot_diff`), then a row-local `explode` of at most
    * two interval structs — no second pass, no window. Generalizing to N
    * snapshots is a fold of this operator, or a single `lag()` window over
    * the unioned snapshots when they all fit one load. */
  def scd2(v1: DataFrame, v2: DataFrame, d1: String, d2: String): DataFrame = {
    val from1 = to_date(lit(d1))
    val from2 = to_date(lit(d2))
    val never = lit(null).cast("date")
    def interval(v: Column, from: Column, to: Column, cur: Column) =
      struct(v.as("v"), from.as("valid_from"), to.as("valid_to"), cur.as("is_current"))
    val rows = when(
      col("v1").isNotNull && col("v2").isNotNull && col("v1") === col("v2"),
      array(interval(col("v1"), from1, never, lit(true))))
      .when(
        col("v1").isNotNull && col("v2").isNotNull,
        array(
          interval(col("v1"), from1, from2, lit(false)),
          interval(col("v2"), from2, never, lit(true))))
      .when(col("v1").isNull, array(interval(col("v2"), from2, never, lit(true))))
      .otherwise(array(interval(col("v1"), from1, from2, lit(false))))
    v1.withColumnRenamed("v", "v1")
      .join(v2.withColumnRenamed("v", "v2"), Seq("k"), "full_outer")
      .select(col("k"), explode(rows).as("r"))
      .select(col("k"), col("r.v"), col("r.valid_from"), col("r.valid_to"), col("r.is_current"))
  }
}

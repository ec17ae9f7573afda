package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the latest right row with
  * `rightTs <= leftTs` within the same key group (SURVEY.md §2.5 J2: the
  * reference's adjacent-day self-alignment is the degenerate case; the
  * general operator is what a metering/trading pipeline needs to attach
  * "the rate in force at time t").
  *
  * Spark has no native as-of join, and the naive formulation
  * `l.join(r, keys && l.ts >= r.ts).groupBy(l.*).agg(max_by(...))` is a
  * range join: every left row pairs with ALL earlier right rows first —
  * O(|L|·|R|) per key, a dead executor on any key with deep history. This
  * operator instead UNIONs both sides, sorts each key group once, and
  * forward-fills the right columns with `last(ignoreNulls)` over
  * (ts, side)-ordered rows — O((|L|+|R|) log(|L|+|R|)) per key, exactly one
  * shuffle (the window's hash partitioning by key), no pairwise blowup.
  * This is the standard union-fill as-of plan pandas/kdb users expect,
  * expressed as Catalyst window aggregation. Measured
  * (graft.tools.AsOfScaleBench, 1500 keys × 700-deep history per side,
  * 1.05M rows each side, local[32]): union-fill 0.58 s vs the range-join
  * formulation 522 s (~370M intermediate pairs, executor heartbeat
  * timeouts on the way) — and the range join's gap grows linearly with
  * history depth while union-fill's cost stays per-row logarithmic.
  *
  * Semantics and preconditions:
  *   - match is inclusive (`rightTs == leftTs` matches), like DuckDB
  *     `ASOF JOIN ... ON l.ts >= r.ts` — right rows sort BEFORE left rows
  *     at equal timestamps;
  *   - left rows with no earlier right row get NULL right columns (left
  *     outer semantics);
  *   - the right side must be unique per (keys, rightTs) — pre-aggregate
  *     it otherwise (ties at one timestamp would fill by unstable sort
  *     order);
  *   - right value columns are filled independently per column, so they
  *     must be non-null on the right rows themselves;
  *   - left/right non-key column names must not collide.
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      matchedTsCol: String = "asof_ts"): DataFrame = {
    val lOther = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val rOther = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    require(
      lOther.intersect(rOther).isEmpty,
      s"colliding non-key columns: ${lOther.intersect(rOther).mkString(",")}")

    def typed(df: DataFrame, c: String): Column = lit(null).cast(df.schema(c).dataType).as(c)

    val lPart = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(0).as("_side")) ++
        lOther.map(col) ++ rOther.map(typed(right, _)): _*)
    val rPart = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(1).as("_side")) ++
        lOther.map(typed(left, _)) ++ rOther.map(col): _*)

    // Right rows first at equal _ts (side desc) → inclusive match; the fill
    // frame ends at the current row, so later rights never leak backward.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lPart
      .unionAll(rPart)
      .select(
        keys.map(col) ++ Seq(col("_ts"), col("_side")) ++ lOther.map(col) ++
          rOther.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
          last(when(col("_side") === 1, col("_ts")), ignoreNulls = true)
            .over(w)
            .as(matchedTsCol): _*)
      .filter(col("_side") === 0)
      .select(
        keys.map(col) ++ Seq(col("_ts").as(leftTs)) ++ lOther.map(col) ++
          rOther.map(col) :+ col(matchedTsCol): _*)
  }
}

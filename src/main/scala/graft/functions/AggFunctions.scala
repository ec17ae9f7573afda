package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, GroupTopK, MisraGries}

/** Column builders for the custom aggregate kernels. */
object AggFunctions {

  /** Misra–Gries heavy hitters over a STRING item column: at most `k`
    * counters per partial buffer, merged by counter addition + (k+1)-th
    * largest subtraction. Every item with true count > n/(k+1) is
    * guaranteed present; see [[org.apache.spark.sql.graft.MisraGries]]. */
  def heavyHitters(item: Column, k: Int): Column =
    Bridge.column(
      MisraGries(Bridge.expression(item), k).toAggregateExpression())

  /** Exact per-group top-k `(score, id)` pairs, best-first (`score` DESC,
    * `id` ASC) — a map-side-combining bounded-heap aggregate; see
    * [[org.apache.spark.sql.graft.GroupTopK]] for why this replaces the
    * window-rank idiom at scale. `score` must be DOUBLE, `id` BIGINT. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      GroupTopK(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join (SURVEY.md §2.11 extension): the one major
  * Structured-Streaming shape the ingest/dedup/rollup family doesn't
  * exercise. The reference has no streaming at all; its nearest analog is
  * the batch adjacent-day alignment (RdlETL2.java:88-98) — this is the
  * continuous version of "align two keyed event feeds by time".
  *
  * Attribution semantics: a `purchase` is attributed to every `click` by
  * the same user that happened within `horizon` BEFORE it
  * (`c_ts ≤ p_ts ≤ c_ts + horizon`). Both sides carry event-time
  * watermarks and the join predicate carries the time bound, so each
  * side's buffered state expires as the other side's watermark passes —
  * state is O(events within watermark + horizon), never O(history). That
  * is the only stream–stream join shape that survives 100 TB/day feeds;
  * an unconstrained stream join would buffer both streams forever.
  *
  * `StreamJoinSpec` proves the streaming result row-identical to the batch
  * join over the same fixture (the batch twin is the oracled
  * `q_attribution`), and that a purchase arriving later than the watermark
  * bound is dropped rather than mis-attributed.
  */
object StreamJoin {

  /** Split an events stream (or batch frame — the plan is identical, which
    * is what makes the batch-equality spec meaningful) into the click and
    * purchase sides with join-ready column names. */
  private def sides(events: DataFrame): (DataFrame, DataFrame) = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("p_ts"),
        col("value"))
    (clicks, purchases)
  }

  /** Watermarked inner interval join, one row per (click, attributed
    * purchase): `(user_id, click_id, purchase_id, lag_us, value)`.
    * `delay` bounds out-of-order arrival on BOTH sides; `horizon` is the
    * attribution window and the state-expiry bound. */
  def attribution(
      events: DataFrame,
      horizon: String = "2 hours",
      delay: String = "1 hour"): DataFrame = {
    val (clicks, purchases) = sides(events)
    clicks
      .withWatermark("c_ts", delay)
      .join(
        purchases.withWatermark("p_ts", delay),
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr(s"INTERVAL $horizon"))
      .select(
        col("user_id"),
        col("click_id"),
        col("purchase_id"),
        (expr("unix_micros(p_ts)") - expr("unix_micros(c_ts)")).as("lag_us"),
        col("value"))
  }
}

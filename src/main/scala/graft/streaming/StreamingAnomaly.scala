package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming prequential anomaly detector — the online twin of
  * [[graft.operators.Analytics.userRateAnomalyOnline]]: each (user, day)
  * event count is scored against the user's running moments over the days
  * already seen, then folded into them. State per user is three longs
  * `(nd, Σc, Σc²)` — constant-size no matter how long the stream runs,
  * hash-partitioned by user across executors (RocksDB-backed in
  * production). A flagged day is flagged FOREVER (the decision uses only
  * prior data), so emissions are append-safe and replay-deterministic —
  * the property the retrospective batch variant cannot have.
  *
  * Ordering contract: within a micro-batch a user's days sort in the state
  * function (bounded per batch); across batches days must not regress per
  * user (the daily-ingest shape: a batch drains one day, or an AvailableNow
  * catch-up drains many in order). Same z formula, same exact-integer
  * moments, same filters as the batch twin — `StreamingAnomalySpec` pins
  * row-for-row equality, including across a two-batch split.
  */
object StreamingAnomaly {

  case class DayCount(user_id: Long, d: java.sql.Date, c: Long)
  case class Anomaly(user_id: Long, d: java.sql.Date, c: Long, z: Double)
  case class Moments(nd: Long, s: Long, ss: Long)

  /** Per-(user, day) counts from a raw event stream — the stream side of
    * the batch operator's first aggregate. Complete-mode-free: callers
    * drain via `foreachBatch`/AvailableNow where the batch IS a day slice,
    * or pre-aggregate upstream. */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).cast("long").as("c"))

  /** Score a (possibly streaming) Dataset of day counts. */
  def detect(
      counts: Dataset[DayCount],
      minDays: Int = 3,
      zThresh: Double = 2.0): Dataset[Anomaly] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Moments, Anomaly](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[DayCount], state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          // within-batch day order; cross-batch order is the caller contract
          rows.toSeq.sortBy(_.d.getTime).foreach { r =>
            if (m.nd >= minDays) {
              // same expression tree as the batch twin, token for token
              val varr = (m.nd * m.ss - m.s * m.s).toDouble / (m.nd * (m.nd - 1))
              if (varr > 0) {
                val z = (r.c.toDouble - m.s.toDouble / m.nd) / math.sqrt(varr)
                if (math.abs(z) > zThresh)
                  out += Anomaly(user_id = user, d = r.d, c = r.c, z = {
                    // mirror Spark's round(col, 6) HALF_UP on the double
                    BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  })
              }
            }
            m = Moments(m.nd + 1, m.s + r.c, m.ss + r.c * r.c)
          }
          state.update(m)
          out.iterator
      }
  }

  /** Batch convenience: run the same typed pipeline over a static events
    * frame (flatMapGroupsWithState executes identically on batch Datasets,
    * state scoped to the single batch) — the equality surface the spec
    * compares against the window-based oracle twin. */
  def detectBatch(events: DataFrame, minDays: Int = 3, zThresh: Double = 2.0): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    detect(dailyCounts(events).as[DayCount], minDays, zThresh).toDF()
  }
}

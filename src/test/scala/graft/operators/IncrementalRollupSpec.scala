package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class IncrementalRollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("new-day maintenance is merge-only: old sketches + the new day's sketch = full rebuild") {
    val ev = Tables.events(spark, dir)
    val history = ev.filter(to_date(col("ts")) <= "2024-01-29")
    val newDay = ev.filter(to_date(col("ts")) === "2024-01-30")
    assert(newDay.limit(1).count() === 1, "fixture has no 2024-01-30 events")

    // what an ingest job does: append the new day's ONE sketch row
    val appended = IncrementalRollup
      .dailyUserSketches(history)
      .unionByName(IncrementalRollup.dailyUserSketches(newDay))
    // vs rebuilding the rollup over all events
    val rebuilt = IncrementalRollup.dailyUserSketches(ev)

    def answer(sk: org.apache.spark.sql.DataFrame) = IncrementalRollup
      .distinctUsersOverRange(sk, "2024-01-01", "2024-01-30")
      .select("est_users", "n_events", "n_days")
      .head()
    assert(answer(appended) === answer(rebuilt))
  }

  test("range estimate within 5% of exact; sketch union agrees with one-shot within 1%") {
    val ev = Tables.events(spark, dir)
    val est = IncrementalRollup
      .distinctUsersOverRange(
        IncrementalRollup.dailyUserSketches(ev), "2024-01-05", "2024-01-20")
      .head()
    val ranged = ev.filter(to_date(col("ts")).between("2024-01-05", "2024-01-20"))
    val exact = ranged.agg(countDistinct("user_id")).head().getLong(0)
    val oneShot = ranged
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head()
      .getLong(0)
    assert(est.getAs[Long]("n_days") === 16L)
    assert(math.abs(est.getAs[Long]("est_users") - exact) <= exact * 0.05)
    // HIP (direct) vs composite (post-union) estimator: agreement, not
    // bit-equality — see the IncrementalRollup scaladoc
    assert(math.abs(est.getAs[Long]("est_users") - oneShot) <= math.max(1L, oneShot / 100))
  }
}

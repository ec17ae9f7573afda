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

  test("quantile rollup: append = rebuild exactly; probe brackets the true order statistic") {
    val ev = Tables.events(spark, dir)
    val history = ev.filter(to_date(col("ts")) <= "2024-01-29")
    val newDay = ev.filter(to_date(col("ts")) === "2024-01-30")
    val appended = IncrementalRollup
      .dailyValueHistograms(history)
      .unionByName(IncrementalRollup.dailyValueHistograms(newDay))
    val rebuilt = IncrementalRollup.dailyValueHistograms(ev)
    val (from, to) = ("2024-01-01", "2024-01-30")
    val ps = Seq("0.25", "0.5", "0.75", "0.9", "0.99")
    // histogram merge is exact counter addition → probe answers are
    // BIT-identical between append and rebuild (stronger than HLL's
    // estimator-agreement bound)
    def probe(h: org.apache.spark.sql.DataFrame) = IncrementalRollup
      .quantileOverRange(h, from, to, ps).orderBy("p").collect().toSeq
    assert(probe(appended) === probe(rebuilt))

    // every reported bracket contains the exact k-th smallest value
    val vals = ev
      .filter(to_date(col("ts")).between(from, to))
      .select("value").as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect().sorted
    probe(rebuilt).foreach { r =>
      val k = r.getAs[Long]("k").toInt
      val exact = vals(k - 1)
      assert(
        exact >= r.getAs[Double]("lo") && exact < r.getAs[Double]("hi"),
        s"p=${r.get(0)}: $exact outside [${r.get(4)}, ${r.get(5)})")
    }
  }

  test("quantile rollup: non-power-of-two bin width is rejected") {
    val ev = Tables.events(spark, dir)
    intercept[IllegalArgumentException] {
      IncrementalRollup.dailyValueHistograms(ev, binWidth = 0.1)
    }
    // powers of two pass the exactness gate
    IncrementalRollup.dailyValueHistograms(ev, binWidth = 0.25)
    IncrementalRollup.dailyValueHistograms(ev, binWidth = 2.0)
  }

  test("term-frequency rollup: range probe equals a whole-range sketch exactly") {
    import graft.functions.{TextFunctions => T}
    val (eps, conf, seed) = (0.001, 0.99, 11)
    // documents have no date; assign a deterministic synthetic ingest day
    val toks = Tables.documents(spark, dir)
      .select(
        date_add(lit("2024-01-01").cast("date"), (col("doc_id") % 10).cast("int")).as("day"),
        explode(T.tokens(col("text"))).as("tok"))
    val daily = IncrementalRollup.dailyTermSketches(toks, eps, conf, seed)
    assert(daily.count() === 10L)

    val (from, to) = ("2024-01-03", "2024-01-07")
    val probes = Seq("the", "of", "zzz-absent")
    val viaRollup = IncrementalRollup
      .termFreqOverRange(daily, from, to, probes, eps, conf, seed)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    // one sketch over the whole range's stream — counter-add merge is exact,
    // so every probe and the total must agree with the rollup answer
    val ranged = toks.filter(col("day").between(from, to))
    val whole = FrequencySketch.build(ranged, "tok", eps, conf, seed)
    probes.foreach { t =>
      assert(viaRollup(t) === ((whole.estimateCount(t), whole.totalCount())), s"drift for $t")
    }
    // and the estimates bound the exact counts from above
    val exact = ranged.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaRollup("the")._1 >= exact.getOrElse("the", 0L))
    assert(viaRollup("zzz-absent")._1 <= (eps * whole.totalCount()).toLong)
  }
}

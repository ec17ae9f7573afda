package graft.operators

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four dataflow programs (dimension load, fact load,
  * time-series derivation, pivot export) re-expressed as declarative Spark
  * plans over the driver test tables (mapping in FIXTURES.md §2: `customer`
  * plays the meter dimension `DIM_YHCLD`, `events` plays the daily-readings
  * fact `CJ_RDJDNL_MAC`).
  *
  * Scale notes (100 TB design stance):
  *  - the reference's driver-side HashMap join build (RdlETL.java:53-79) is
  *    replaced by `broadcast()` — Catalyst falls back to shuffle joins via AQE
  *    when the build side outgrows memory instead of OOMing the driver;
  *  - the reference's manual 15-way prefix sharding (RdlETL.java:41) is
  *    replaced by ordinary task parallelism; `gdj` stays a real column so it
  *    can become a partition column (partition pruning == rowkey-range scans);
  *  - the wide-row assembly (`map_from_entries`) keeps the per-meter day map
  *    bounded by the date range (93 days in the reference, 30 here), so rows
  *    stay small no matter how many meters there are — the shuffle key is
  *    `row_key`, which is high-cardinality and evenly distributed.
  */
object MeterPipeline {

  /** Reading period covered by the test `events` table (all scale factors
    * span exactly 2024-01-01..2024-01-30; the reference used a fixed
    * 2019-05-01..2019-08-01 window the same way, RdlETL.java:38-39). */
  val RangeStart = "2024-01-01"
  val RangeEnd = "2024-01-30"

  /** "yyyyMMdd" strings for every day in the range — the reference's dynamic
    * per-date column qualifiers (RdlETL.java:121) and the pivot export's
    * header (RdlETL3.java:155-164). */
  val DayStrings: Seq[String] = {
    val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
    Iterator
      .iterate(LocalDate.parse(RangeStart))(_.plusDays(1))
      .takeWhile(!_.isAfter(LocalDate.parse(RangeEnd)))
      .map(_.format(fmt))
      .toSeq
  }

  /** Dimension load (reference YhCldETL.java:56-91): project + alias the
    * customer dimension into `info(gdj, cldbs, yhbh, zhbl, row_key)`.
    *
    *  - NOT-NULL conjunction filter = YhCldETL.java:60-63 (F3);
    *  - the segment filter plays the region-code equality (F4) and creates
    *    genuine join misses downstream (J1's inner-drop, RdlETL.java:110-114);
    *  - `zhbl` is NULL for every 10th meter so the downstream default-to-1
    *    (RdlETL2.java:76) is exercised;
    *  - `row_key = gdj + "_" + cldbs` = YhCldETL.java:84 (P3), with `gdj`
    *    kept as its own column so it can partition-prune (F1).
    */
  def dimension(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey").isNotNull && col("c_name").isNotNull)
      .filter(col("c_mktsegment") =!= "AUTOMOBILE")
      .select(
        format_string("04%02d", pmod(col("c_nationkey"), lit(15)) + 1).as("gdj"),
        col("c_custkey").cast("string").as("cldbs"),
        col("c_name").as("yhbh"),
        when(pmod(col("c_custkey"), lit(10)) === 0, lit(null).cast("double"))
          .otherwise((pmod(col("c_custkey"), lit(3)) + 1).cast("double"))
          .as("zhbl"))
      .withColumn("row_key", concat_ws("_", col("gdj"), col("cldbs")))

  /** Fact load (reference RdlETL.java:81-160): per-(meter, day) readings,
    * deduplicated first-wins (A1, RdlETL.java:106-126 — `row_number` makes the
    * reference's arrival-order Set deterministic), enriched through a
    * broadcast inner equi-join (J1, RdlETL.java:53-79 + 110-114; join miss
    * drops the row = F7). `has_data` plays the `DATA="1"` flag cell
    * (RdlETL.java:122), left NULL when the reading is non-positive so the
    * filterIfMissing scan semantics (F2, RdlETL2.java:45-51) are observable.
    */
  def factLoad(events: DataFrame, dim: DataFrame): DataFrame =
    enrich(firstWinsReadings(events), dim)

  private def firstWinsReadings(events: DataFrame): DataFrame =
    // First-wins = argmin by event_id (the deterministic form of the
    // reference's arrival-order Set-skip, RdlETL.java:106-126), expressed as
    // `min_by` so it plans as a hash aggregate with map-side partial
    // combine: duplicate readings collapse BEFORE the shuffle and nothing
    // sorts. The previous row_number-window form shuffled the same rows but
    // paid a per-partition sort on both sides of the exchange
    // (WindowGroupLimit still sorts to prune) — pure overhead at 100 TB
    // where (meter, day) groups are tiny and numerous.
    events
      .withColumn("rd_date", to_date(col("ts")))
      .groupBy(col("user_id"), col("rd_date"))
      .agg(min_by(col("value"), col("event_id")).as("bmz"))
      .select(
        col("user_id").cast("string").as("cldbs"),
        col("rd_date"),
        col("bmz"))

  private def enrich(firstWins: DataFrame, dim: DataFrame): DataFrame = {
    // Build-side dedup by join key = the reference's map-collapse semantics
    // (A2, RdlETL.java:67-71); broadcast = the driver-side "cache".
    val dimSide = dim.select("cldbs", "row_key").dropDuplicates("cldbs")
    firstWins
      .join(broadcast(dimSide), Seq("cldbs"), "inner")
      .select(
        col("row_key"),
        col("cldbs"),
        col("rd_date"),
        col("bmz"),
        when(col("bmz") > 0, lit("1")).as("has_data"))
  }

  /** [[factLoad]] instrumented with observable metrics — the Spark shape of
    * the reference's per-batch progress counters and bad-row logging
    * (A3/2.13: running rowCount log RdlETL.java:133-135, per-row try/catch
    * RdlETL.java:109-143). `observe` accumulates the counters inside the
    * one ingest pass (no second job, no driver collect; at 100 TB a
    * recount would be a full extra scan) and the handles resolve after any
    * action on the returned plan:
    *  - `fact_input`: `n` deduped readings, `n_nonpositive` readings a
    *    downstream guard will null out (the reference's logged bad rows);
    *  - `fact_loaded`: `n` rows surviving enrichment — input minus loaded =
    *    join misses (F7's dropped rows, RdlETL.java:112-114).
    */
  def factLoadObserved(
      events: DataFrame,
      dim: DataFrame): (DataFrame, org.apache.spark.sql.Observation, org.apache.spark.sql.Observation) = {
    val inputObs = new org.apache.spark.sql.Observation("fact_input")
    val loadedObs = new org.apache.spark.sql.Observation("fact_loaded")
    val fw = firstWinsReadings(events).observe(
      inputObs,
      count(lit(1)).as("n"),
      count(when(col("bmz").isNull || col("bmz") <= 0, 1)).as("n_nonpositive"))
    val out = enrich(fw, dim).observe(loadedObs, count(lit(1)).as("n"))
    (out, inputObs, loadedObs)
  }

  private def dailyEnergyGrid(facts: DataFrame, dim: DataFrame): DataFrame = {
    // Wide-row assembly (A4, RdlETL.java:120-126): one map row per meter,
    // bounded by the 30-day range — the Spark shape of the reference's
    // dynamic date-qualifier family. One shuffle (groupBy row_key); the
    // per-day probe below is then shuffle-free, unlike a dense-spine join
    // (which would shuffle twice: once on (key, day), once on key for lead).
    val wide = facts
      .groupBy("row_key")
      .agg(map_from_entries(collect_list(struct(col("rd_date"), col("bmz")))).as("m"))
    val days = sequence(to_date(lit(RangeStart)), to_date(lit(RangeEnd)))
    wide
      .join(broadcast(dim.select("row_key", "zhbl").dropDuplicates("row_key")), Seq("row_key"))
      .withColumn("rd_date", explode(days))
      // Missing day reads as 0 (RdlETL2.java:87-93) — the guard then nulls it.
      .withColumn("cur", coalesce(element_at(col("m"), col("rd_date")), lit(0.0)))
      .withColumn("tom", coalesce(element_at(col("m"), date_add(col("rd_date"), 1)), lit(0.0)))
  }

  /** Time-series derivation (W1, reference RdlETL2.java:80-104): per meter,
    * per day d, `rdl(d) = (bmz(d+1) - bmz(d)) * zhbl` iff both readings are
    * positive and the register did not roll back (guards RdlETL2.java:96-98),
    * else NULL. Missing multiplier defaults to 1 (RdlETL2.java:76). Emits the
    * full dense daily grid, matching the reference's write-back of "" cells
    * for failed guards (RdlETL2.java:102-103).
    */
  def dailyEnergy(facts: DataFrame, dim: DataFrame): DataFrame =
    dailyEnergyGrid(facts, dim)
      .withColumn(
        "rdl",
        when(
          col("cur") > 0 && col("tom") > 0 && col("tom") >= col("cur"),
          (col("tom") - col("cur")) * coalesce(col("zhbl"), lit(1.0))))
      .select("row_key", "rd_date", "rdl")

  /** Scale-path variant of [[dailyEnergy]]: keeps only non-NULL `rdl` rows and
    * never materializes the dense grid — a `lead` over the sparse readings
    * with a day-adjacency check is equivalent because the guards already
    * require both adjacent days to exist with positive readings. At 100 TB
    * this avoids inflating every meter to |range| rows. One shuffle
    * (window by row_key).
    */
  def dailyEnergySparse(facts: DataFrame, dim: DataFrame): DataFrame = {
    val byMeter = Window.partitionBy(col("row_key")).orderBy(col("rd_date"))
    facts
      .join(broadcast(dim.select("row_key", "zhbl").dropDuplicates("row_key")), Seq("row_key"))
      .withColumn("nxt_date", lead(col("rd_date"), 1).over(byMeter))
      .withColumn("nxt_bmz", lead(col("bmz"), 1).over(byMeter))
      .filter(datediff(col("nxt_date"), col("rd_date")) === 1)
      .withColumn(
        "rdl",
        when(
          col("bmz") > 0 && col("nxt_bmz") > 0 && col("nxt_bmz") >= col("bmz"),
          (col("nxt_bmz") - col("bmz")) * coalesce(col("zhbl"), lit(1.0))))
      .filter(col("rdl").isNotNull)
      .select("row_key", "rd_date", "rdl")
  }

  /** Long→wide pivot export (R1, reference RdlETL3.java:104-109): one row per
    * customer number, one column per day (`d20240101`…), value = daily
    * energy. Explicit pivot value list ⇒ single pass, no value-discovery job.
    */
  def pivotExport(rdl: DataFrame, dim: DataFrame): DataFrame = {
    val keyed = rdl
      .join(broadcast(dim.select("row_key", "yhbh").dropDuplicates("row_key")), Seq("row_key"))
      .withColumn("dcol", concat(lit("d"), date_format(col("rd_date"), "yyyyMMdd")))
    keyed
      .groupBy("yhbh")
      .pivot("dcol", DayStrings.map("d" + _))
      .agg(max(col("rdl")))
  }

  /** Scale-path variant of [[pivotExport]]: computes the per-day guarded
    * delta as 30 projected columns straight off the wide-row map — the
    * dense-grid explode (meters × |range| rows) and the pivot's second
    * re-aggregation collapse into one projection + one groupBy. Shuffles
    * O(meters) wide rows once instead of O(meters × days) skinny rows
    * twice; per-day map probes are O(1) lookups on the bounded day map.
    * Value-identical to pivotExport (same oracle).
    */
  def pivotExportFused(facts: DataFrame, dim: DataFrame): DataFrame = {
    val wide = facts
      .groupBy("row_key")
      .agg(map_from_entries(collect_list(struct(col("rd_date"), col("bmz")))).as("m"))
    val joined = wide.join(
      broadcast(dim.select("row_key", "zhbl", "yhbh").dropDuplicates("row_key")),
      Seq("row_key"))
    val dayCols = DayStrings.map { ds =>
      val iso = s"${ds.substring(0, 4)}-${ds.substring(4, 6)}-${ds.substring(6, 8)}"
      val day = to_date(lit(iso))
      val cur = coalesce(element_at(col("m"), day), lit(0.0))
      val tom = coalesce(element_at(col("m"), date_add(day, 1)), lit(0.0))
      when(cur > 0 && tom > 0 && tom >= cur, (tom - cur) * coalesce(col("zhbl"), lit(1.0)))
        .as(s"d$ds")
    }
    joined
      .select((col("yhbh") +: dayCols): _*)
      .groupBy("yhbh")
      .agg(max(col(s"d${DayStrings.head}")), DayStrings.tail.map(ds => max(col(s"d$ds"))): _*)
      .toDF(("yhbh" +: DayStrings.map("d" + _)): _*)
  }

  /** CSV sink parity (K3/K4, reference RdlETL3.java:83-164): header row,
    * size-capped file splits (500k rows in the reference), one directory per
    * org prefix (`partitionBy`, replacing the reference's per-gdj output
    * dirs), overwrite of prior output, NULL → empty field at the file edge
    * only (Spark's CSV writer default; internal representation stays
    * typed/NULL per SURVEY §7.4).
    */
  def exportCsv(
      wide: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 500000L): Unit = {
    val w = wide.write
      .mode("overwrite")
      .option("header", "true")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).csv(path)
  }
}

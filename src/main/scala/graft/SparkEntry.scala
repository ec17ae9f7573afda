package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MeterPipeline
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a named
  * query over the test tables, with an ANSI-SQL DuckDB oracle in [[oracleSql]]
  * where the semantics are SQL-expressible. Column names and numeric
  * representations are kept bit-comparable between the Spark plan and the
  * oracle: exact arithmetic in DECIMAL, final outputs CAST to DOUBLE (the
  * decimal→double conversion is deterministic in both engines), doubles only
  * combined with order-insensitive aggregates (max/min) or IEEE-deterministic
  * scalar arithmetic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_daily_energy")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------------
  // Shared building blocks (Spark side)
  // ---------------------------------------------------------------------------

  private def dim(s: SparkSession, dir: String): DataFrame =
    MeterPipeline.dimension(Tables.customer(s, dir))

  private def facts(s: SparkSession, dir: String): DataFrame =
    MeterPipeline.factLoad(Tables.events(s, dir), dim(s, dir))

  // ---------------------------------------------------------------------------
  // Shared building blocks (oracle side) — must mirror the Spark lambdas above.
  // ---------------------------------------------------------------------------

  private val DimSql =
    """SELECT printf('04%02d', (c_nationkey % 15) + 1) AS gdj,
      |       CAST(c_custkey AS VARCHAR) AS cldbs,
      |       c_name AS yhbh,
      |       CASE WHEN c_custkey % 10 = 0 THEN NULL
      |            ELSE CAST(c_custkey % 3 + 1 AS DOUBLE) END AS zhbl,
      |       printf('04%02d', (c_nationkey % 15) + 1) || '_' || CAST(c_custkey AS VARCHAR) AS row_key
      |FROM customer
      |WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL AND c_mktsegment <> 'AUTOMOBILE'""".stripMargin

  private val FactsSql =
    s"""WITH dim AS ($DimSql),
       |firstwins AS (
       |  SELECT CAST(user_id AS VARCHAR) AS cldbs, rd_date, value AS bmz
       |  FROM (SELECT user_id, event_id, value, CAST(ts AS DATE) AS rd_date,
       |               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY event_id) AS rn
       |        FROM events)
       |  WHERE rn = 1)
       |SELECT d.row_key, f.cldbs, f.rd_date, f.bmz,
       |       CASE WHEN f.bmz > 0 THEN '1' END AS has_data
       |FROM firstwins f JOIN dim d USING (cldbs)""".stripMargin

  private val RdlSql =
    s"""WITH factsq AS ($FactsSql),
       |dimq AS ($DimSql),
       |mz AS (SELECT m.row_key, d.zhbl
       |       FROM (SELECT DISTINCT row_key FROM factsq) m
       |       JOIN (SELECT DISTINCT row_key, zhbl FROM dimq) d USING (row_key)),
       |days AS (SELECT CAST(unnest(generate_series(DATE '${MeterPipeline.RangeStart}',
       |                                            DATE '${MeterPipeline.RangeEnd}',
       |                                            INTERVAL 1 DAY)) AS DATE) AS rd_date),
       |dense AS (SELECT mz.row_key, mz.zhbl, days.rd_date FROM mz CROSS JOIN days)
       |SELECT dense.row_key, dense.rd_date,
       |       CASE WHEN coalesce(c.bmz, 0) > 0 AND coalesce(t.bmz, 0) > 0
       |                 AND coalesce(t.bmz, 0) >= coalesce(c.bmz, 0)
       |            THEN (coalesce(t.bmz, 0) - coalesce(c.bmz, 0)) * coalesce(dense.zhbl, 1.0)
       |       END AS rdl
       |FROM dense
       |LEFT JOIN factsq c ON c.row_key = dense.row_key AND c.rd_date = dense.rd_date
       |LEFT JOIN factsq t ON t.row_key = dense.row_key AND t.rd_date = dense.rd_date + 1""".stripMargin

  private val PivotCols: String = MeterPipeline.DayStrings
    .map { d =>
      val iso = s"${d.substring(0, 4)}-${d.substring(4, 6)}-${d.substring(6, 8)}"
      s"max(r.rdl) FILTER (WHERE r.rd_date = DATE '$iso') AS d$d"
    }
    .mkString(",\n       ")

  // ---------------------------------------------------------------------------
  // Queries (SURVEY.md §2 inventory; citations on each implementation)
  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — dimension load (S2, P2-P4, P16, F3, F4)
    "q_dim_load" -> ((s, dir) => dim(s, dir).orderBy("row_key")),

    // M1 — fact load: first-wins dedup + broadcast inner join (S1, J1, A1, A2, F7)
    "q_fact_load" -> ((s, dir) => facts(s, dir).orderBy("row_key", "rd_date")),

    // M2 — W1 lead-delta-×-multiplier with guard matrix, dense grid (flagship)
    "q_daily_energy" -> ((s, dir) =>
      MeterPipeline.dailyEnergy(facts(s, dir), dim(s, dir)).orderBy("row_key", "rd_date")),

    // M2 — W1 scale path: sparse lead + day-adjacency, non-null rows only
    "q_daily_energy_sparse" -> ((s, dir) =>
      MeterPipeline.dailyEnergySparse(facts(s, dir), dim(s, dir)).orderBy("row_key", "rd_date")),

    // M3 — R1 long→wide pivot export
    "q_pivot_export" -> ((s, dir) =>
      MeterPipeline
        .pivotExport(MeterPipeline.dailyEnergy(facts(s, dir), dim(s, dir)), dim(s, dir))
        .orderBy("yhbh")),

    // S6 — point get (single key lookup, reference HBaseClient.java:149-158)
    "q_point_get" -> ((s, dir) =>
      dim(s, dir).filter(col("cldbs") === "42").select("row_key", "yhbh", "zhbl")),

    // S3/F1 — rowkey prefix range scan (reference RdlETL.java:60-73)
    "q_range_scan" -> ((s, dir) =>
      dim(s, dir)
        .filter(col("row_key") >= "0403" && col("row_key") < "0404")
        .select("row_key", "cldbs", "yhbh")
        .orderBy("row_key")),

    // S4/F2 — filtered scan with filterIfMissing semantics (RdlETL2.java:42-63)
    "q_filtered_scan" -> ((s, dir) =>
      facts(s, dir)
        .filter(col("has_data") === "1")
        .select("row_key", "rd_date", "bmz")
        .orderBy("row_key", "rd_date")),

    // S7 — scan limit (RdlETL.java:61), deterministic via order
    "q_limit" -> ((s, dir) =>
      dim(s, dir).select("row_key", "cldbs").orderBy("row_key").limit(100)),

    // A3 — counts (rowCount cadence logs, YhCldETL.java:99-102)
    "q_count" -> ((s, dir) =>
      dim(s, dir).groupBy("gdj").agg(count(lit(1)).as("n")).orderBy("gdj")),

    // §2.9 — UNION ALL of partition-pruned subqueries (the 15-prefix loop)
    "q_union" -> ((s, dir) => {
      val d = dim(s, dir)
      d.filter(col("gdj") === "0401")
        .unionAll(d.filter(col("gdj") === "0402"))
        .select("row_key", "cldbs", "gdj")
        .orderBy("row_key")
    }),

    // Volume aggregation (TPC-H Q1 shape) — exercises hash agg + exact sums
    "q1_agg" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val dec = (c: String) => col(c).cast("decimal(12,2)")
      l.filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount")))
            .cast("double")
            .as("sum_disc_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Shuffle join + top-k (TPC-H Q3 shape)
    "q3_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(to_date(col("o_orderdate")) < lit("1998-01-01"))
      val l = Tables.lineitem(s, dir).filter(to_date(col("l_shipdate")) > lit("1996-06-30"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
            .cast("double")
            .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Broadcast dimension join (J1 at TPC-H volume)
    "q_broadcast_join" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_size") < 20)
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
        .orderBy("p_brand")
    }),

    // Window ranking — top-5 events per type (sort/limit per group)
    "q_topk_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("event_type", "rank", "event_id", "value")
        .orderBy("event_type", "rank")
    }),

    // R2 — wide→long unpivot, re-aggregated (reference RdlETL2.java:83-93)
    "q_unpivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"),
          col("l_quantity").cast("decimal(12,2)").as("quantity"),
          col("l_extendedprice").cast("decimal(12,2)").as("extendedprice"),
          col("l_discount").cast("decimal(12,2)").as("discount"))
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "measure",
          "v")
        .groupBy("measure")
        .agg(sum(col("v")).cast("double").as("total"), count(lit(1)).as("n"))
        .orderBy("measure")
    }),

    // W2 — tumbling daily window aggregation over the event stream table
    "q_events_daily" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
        .orderBy("d", "event_type"))
  )

  /** DuckDB oracles, one per SQL-expressible query above. */
  def oracleSql: Map[String, String] = Map(
    "q_dim_load" ->
      s"""SELECT * FROM ($DimSql) ORDER BY row_key""",
    "q_fact_load" ->
      s"""SELECT * FROM ($FactsSql) ORDER BY row_key, rd_date""",
    "q_daily_energy" ->
      s"""SELECT * FROM ($RdlSql) ORDER BY row_key, rd_date""",
    "q_daily_energy_sparse" ->
      s"""SELECT * FROM ($RdlSql) WHERE rdl IS NOT NULL ORDER BY row_key, rd_date""",
    "q_pivot_export" ->
      s"""WITH r AS ($RdlSql),
         |dimk AS (SELECT DISTINCT row_key, yhbh FROM ($DimSql))
         |SELECT d.yhbh,
         |       $PivotCols
         |FROM r JOIN dimk d USING (row_key)
         |GROUP BY d.yhbh ORDER BY d.yhbh""".stripMargin,
    "q_point_get" ->
      s"""SELECT row_key, yhbh, zhbl FROM ($DimSql) WHERE cldbs = '42'""",
    "q_range_scan" ->
      s"""SELECT row_key, cldbs, yhbh FROM ($DimSql)
         |WHERE row_key >= '0403' AND row_key < '0404' ORDER BY row_key""".stripMargin,
    "q_filtered_scan" ->
      s"""SELECT row_key, rd_date, bmz FROM ($FactsSql)
         |WHERE has_data = '1' ORDER BY row_key, rd_date""".stripMargin,
    "q_limit" ->
      s"""SELECT row_key, cldbs FROM ($DimSql) ORDER BY row_key LIMIT 100""",
    "q_count" ->
      s"""SELECT gdj, count(*) AS n FROM ($DimSql) GROUP BY gdj ORDER BY gdj""",
    "q_union" ->
      s"""WITH d AS ($DimSql)
         |SELECT row_key, cldbs, gdj FROM
         |  (SELECT * FROM d WHERE gdj = '0401' UNION ALL SELECT * FROM d WHERE gdj = '0402')
         |ORDER BY row_key""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |         AS sum_disc_price,
        |       count(*) AS n
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |         AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1996-06-30'
        |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_broadcast_join" ->
      """SELECT p_brand, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size < 20
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_topk_window" ->
      """SELECT event_type, rank, event_id, value FROM
        |  (SELECT event_type, event_id, value,
        |          row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
        |   FROM events)
        |WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    "q_unpivot" ->
      """WITH l AS (SELECT l_orderkey,
        |                  CAST(l_quantity AS DECIMAL(12,2)) AS quantity,
        |                  CAST(l_extendedprice AS DECIMAL(12,2)) AS extendedprice,
        |                  CAST(l_discount AS DECIMAL(12,2)) AS discount
        |           FROM lineitem),
        |u AS (SELECT 'quantity' AS measure, quantity AS v FROM l
        |      UNION ALL SELECT 'extendedprice', extendedprice FROM l
        |      UNION ALL SELECT 'discount', discount FROM l)
        |SELECT measure, CAST(sum(v) AS DOUBLE) AS total, count(*) AS n
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin,
    "q_events_daily" ->
      """SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY d, event_type""".stripMargin
  )
}

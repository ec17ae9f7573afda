package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution analytics over corpus-scale tables.
  *
  * The common thread: global-order statistics (quantile buckets, ranks)
  * computed WITHOUT a single-partition window over the data. A global
  * `ntile`/`row_number` window is the classic 100 TB scale-killer — every row
  * funnels through one task. Here the global order is reconstructed from (a)
  * a value histogram (tiny: one row per distinct value) that carries the
  * cumulative offset of each value, and (b) a per-value window that ranks
  * only within ties. Both stay bounded at any corpus size as long as the
  * value domain is bounded (lengths, scores, bucketed floats).
  */
object Analytics {

  /** Order/partition-insensitive table checksum — the migration-validation
    * primitive for this engine's own use case: after re-platforming a
    * 100 TB table, prove source and target hold the SAME ROWS without
    * moving either (each side computes one tiny row; compare).
    *
    * Per row: canonical string = `concat_ws(\\u0001, cols as string)`, then
    * a 60-bit integer from the md5 prefix — md5, substring, hex→int, and
    * string casts of ints/strings are engine-portable (the DuckDB oracle
    * recomputes the checksum byte for byte, which IS the cross-engine
    * contract). Two combiners, both commutative+associative so the
    * aggregate is map-side combined and partitioning/order never matter:
    * XOR (but self-cancelling on even duplicate multiplicity) and a SUM
    * mod 2^61 carried in DECIMAL (exact, duplicate-sensitive — together
    * they also certify multiplicities modulo astronomically unlikely
    * collisions).
    *
    * Caller contract: `cols` must be NULL-free (coalesce first) —
    * `concat_ws` SKIPS nulls in both engines, which would make
    * ("a", null, "b") and ("a", "b", null) collide.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    val canon = concat_ws("\u0001", cols.map(c => col(c).cast("string")): _*)
    val h = conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    df.select(h.as("h"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("checksum_xor"),
        (sum(col("h").cast("decimal(20,0)")) % lit(2305843009213693952L))
          .cast("long")
          .as("checksum_sum"))
  }

  /** Exact k-bucket quantile assignment (a distributed `ntile`).
    *
    * Each row gets `bucket = (global_rank - 1) * k div n` where
    * `global_rank` is the row's rank under `ORDER BY valueCol, idCol`
    * (idCol must be unique — it makes the order total and the result
    * deterministic). Buckets are contiguous rank ranges of near-equal size,
    * same contract as `ntile` up to the remainder-distribution rule, which
    * is pinned by the formula instead of engine-specific tie spreading.
    *
    * Scale shape: one map-side-combined aggregate builds the value
    * histogram; the running offset is a window over THAT (O(distinct
    * values) rows — the only single-partition step, bounded by the value
    * domain, not the corpus); offsets and the 1-row total broadcast back;
    * within-value ranks come from a window partitioned BY VALUE, so the
    * corpus shuffles once, keyed by value. A single pathologically hot
    * value sorts inside one partition — same escape hatch as the
    * per-source cap: pre-filter on an approximate quantile of idCol.
    *
    * Output: input columns plus `bucket` (0..k-1).
    */
  def distributedNtile(df: DataFrame, valueCol: String, idCol: String, k: Int): DataFrame = {
    val byVal = df.groupBy(valueCol).agg(count(lit(1)).as("_cnt"))
    val wCum = Window.orderBy(valueCol).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byVal
      .withColumn("_offset", coalesce(sum(col("_cnt")).over(wCum), lit(0L)))
      .select(col(valueCol), col("_offset"))
    val total = byVal.agg(sum("_cnt").as("_total"))
    val wIn = Window.partitionBy(valueCol).orderBy(idCol)
    df.join(broadcast(offsets), Seq(valueCol))
      .crossJoin(broadcast(total))
      .withColumn("_rank", col("_offset") + row_number().over(wIn).cast("long"))
      .withColumn("bucket", expr(s"CAST((_rank - 1) * $k DIV _total AS BIGINT)"))
      .drop("_offset", "_total", "_rank")
  }

  /** Percentile winsorization: clamp each value into its group's
    * [pLo, pHi] exact-percentile band — the standard numeric-feature
    * cleaning step before statistics a spike would drag (a gentler
    * alternative to dropping rows that [[madOutliers]] flags). Returns
    * per-key `(key, n, lo_cents, hi_cents, n_clip_lo, n_clip_hi,
    * sum_after)` — the clipped sum decomposed so it stays exact and
    * order-insensitive: in-band cents sum as BIGINT, then the two clip
    * populations contribute `count × boundary` as scalar double products
    * in a fixed expression tree. (Summing clamped DOUBLES would be
    * accumulation-order-dependent, and rounding the interpolated
    * boundaries to any decimal grid diverges between engines — measured:
    * Spark and DuckDB round a .05 boundary double to different tenths.)
    *
    * Same determinism contract as [[madOutliers]]: integer `cents` in,
    * every interpolation and clamp decision replayed exactly by DuckDB's
    * quantile_cont. Same scale shape too: one exact-percentile aggregate
    * (bounded-domain caveat), broadcast of the O(keys) band table, one
    * map-side-combined final aggregate. */
  def winsorize(
      df: DataFrame,
      keyCol: String,
      centsCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    val bands = df
      .groupBy(col(keyCol).as("key"))
      .agg(
        expr(s"percentile($centsCol, $pLo)").as("lo_cents"),
        expr(s"percentile($centsCol, $pHi)").as("hi_cents"))
    df.select(col(keyCol).as("key"), col(centsCol).as("cents"))
      .join(broadcast(bands), Seq("key"))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n"),
        first("lo_cents").as("lo_cents"),
        first("hi_cents").as("hi_cents"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(
          when(
            col("cents") >= col("lo_cents") && col("cents") <= col("hi_cents"),
            col("cents")).otherwise(0L)).as("sum_inside"))
      .select(
        col("key"),
        col("n"),
        col("lo_cents"),
        col("hi_cents"),
        col("n_clip_lo"),
        col("n_clip_hi"),
        (col("sum_inside").cast("double")
          + col("n_clip_lo").cast("double") * col("lo_cents")
          + col("n_clip_hi").cast("double") * col("hi_cents")).as("sum_after"))
  }

  /** Robust outlier gate: median / MAD instead of mean / stddev (the
    * z-score gate's moments are themselves dragged by the outliers they
    * hunt; the median absolute deviation is breakdown-point-0.5 robust —
    * the standard choice for corrupted-feed detection). A row is an
    * outlier when `|x − median| > k·MAD`; the default k = 4.4478 is the
    * classic 3σ-equivalent (3 × 1.4826, the normal-consistency constant).
    *
    * Cross-engine determinism: `cents` must be exact integers (cast
    * decimals upstream). Medians interpolate as `(a+b)/2` of integers —
    * exact in double — and the threshold compare is one double product,
    * so DuckDB's `quantile_cont` replays every boundary decision.
    *
    * Scale shape: two aggregate passes (median, then MAD over broadcast
    * medians) and one filtered count — the per-key exact `percentile`
    * buffers each group's values, the documented bounded-domain caveat
    * shared with `q_percentiles`; swap in `percentile_approx` for
    * unbounded domains. Returns per-key
    * `(key, n, med_cents, mad_cents, n_outliers)`.
    */
  def madOutliers(df: DataFrame, keyCol: String, centsCol: String, k: Double = 4.4478): DataFrame = {
    val med = df
      .groupBy(col(keyCol).as("key"))
      .agg(expr(s"percentile($centsCol, 0.5)").as("med_cents"))
    val dev = df
      .select(col(keyCol).as("key"), col(centsCol).as("cents"))
      .join(broadcast(med), Seq("key"))
      .withColumn("adev", abs(col("cents") - col("med_cents")))
    val mad = dev
      .groupBy("key")
      .agg(expr("percentile(adev, 0.5)").as("mad_cents"))
    dev
      .join(broadcast(mad), Seq("key"))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n"),
        first("med_cents").as("med_cents"),
        first("mad_cents").as("mad_cents"),
        sum(when(col("adev") > lit(k) * col("mad_cents"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Integer-exact exponential-decay rollup (EWMA with α = 1/2): per key,
    * fold the ordered per-day totals through `ew' = (ew + x_day) div 2` —
    * the decayed-counter primitive a data pipeline uses for trend signals
    * (source quality drifting down, a crawl going stale) where yesterday
    * matters twice as much as the day before.
    *
    * The recursion is sequential by nature; the trick is WHERE it runs:
    * daily totals reduce to exact BIGINT cents in one map-side-combined
    * shuffle (O(keys × days) rows), then the fold runs per key over the
    * bounded day array with the `aggregate` higher-order function — a
    * row-local loop over ≤ days elements, never a cross-row window, so the
    * shape is identical at 100 TB. Truncating integer division makes the
    * result bit-exact across engines: the DuckDB oracle replays the fold
    * as a recursive CTE and must agree to the last cent.
    *
    * Returns `(key, n_days, last_day, ewma_cents)`.
    */
  def ewmaDaily(events: DataFrame, keyCol: String = "event_type"): DataFrame =
    events
      .groupBy(col(keyCol).as("key"), to_date(col("ts")).as("d"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)").as("cents"))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n_days"),
        max("d").as("last_day"),
        expr(
          """aggregate(
            |  array_sort(collect_list(struct(d, cents))),
            |  CAST(0 AS BIGINT),
            |  (acc, x) -> (acc + x.cents) div 2)""".stripMargin).as("ewma_cents"))

  /** Integer-exact PageRank: `iters` fixed power-iteration rounds over a
    * directed edge list `(src, dst)`, damping 0.85, every node seeded with
    * `1_000_000` micro-units of rank. The web-corpus quality signal (a
    * page's link centrality gates its documents into the training mix) and
    * the second member of this engine's iterative-graph family next to
    * [[graft.operators.Dedup.duplicateClusters]]'s label propagation.
    *
    * All arithmetic is BIGINT with truncating division (`div` here, `//` in
    * DuckDB — identical on the non-negative values ranks live in), so the
    * result is bit-exact across engines and the DuckDB oracle replays the
    * same five rounds as unrolled CTEs: per round,
    * `rank' = 150000 + (Σ_in (rank div out_deg) * 85) div 100`.
    * Overflow headroom: Σ_in ≤ N·10⁶, ×85 stays under 2⁶³ for N up to
    * ~10¹¹ nodes — any real corpus.
    *
    * Caller contract: every node must have out-degree ≥ 1 (symmetrize the
    * graph or pre-drop danglings) — a dangling node's rank mass would
    * otherwise silently vanish, which is a modeling choice this operator
    * refuses to make for the caller.
    *
    * Scale shape: the edge list and the degree table are checkpointed ONCE
    * (lineage truncated, reused every round); each round is two shuffles —
    * ranks join edges on `src`, contributions aggregate (map-side combined)
    * on `dst` — and one local checkpoint, with the previous round's blocks
    * freed immediately ([[org.apache.spark.sql.graft.Bridge]] discipline,
    * same as duplicate clustering). Nothing ever reaches the driver; rounds
    * are O(E) with no growth in plan depth or storage.
    *
    * Output: `(node, pr_micro)` — final rank in micro-units, one row per
    * node that has at least one out-edge.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, ckptEvery: Int = 2): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint()
    var ranks = deg.select(col("node"), lit(prScale).as("pr"), col("deg"))
    var prevCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val round = pageRankRound(e, deg, ranks)
      // checkpoint every `ckptEvery` rounds (and always the last): plan
      // depth stays bounded while skipping half the materialization jobs —
      // each checkpoint is a full job + storage write, and two rounds of
      // join+agg lineage is still a small plan
      if (i % ckptEvery == 0 || i == iters) {
        val next = round.localCheckpoint()
        if (prevCkpt != null) org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(prevCkpt)
        prevCkpt = next
        ranks = next
      } else {
        ranks = round
      }
    }
    // the final round's checkpoint IS the result (self-contained); the
    // edge and degree blocks served their last join and can go now —
    // holding them across repeated constructions (bench warm + timed
    // passes, verify) accumulates executor storage for nothing
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(e)
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(deg)
    ranks.select(col("node"), col("pr").as("pr_micro"))
  }

  private val prScale = 1000000L

  /** One power-iteration round, `(node, pr, deg) → (node, pr, deg)` — the
    * rank state CARRIES its out-degree, so each round joins edges⋈ranks
    * and degrees⋈sums but never ranks⋈degrees (one fewer shuffle join per
    * round than the textbook three-table spelling). Exposed for the plan
    * guard: the returned (un-checkpointed) frame is the per-round shape
    * that must stay map-side-combined at any scale. */
  private[graft] def pageRankRound(e: DataFrame, deg: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = e
      .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst").as("node"), expr("pr div deg").as("c"))
    val inSum = contrib.groupBy("node").agg(sum(col("c")).cast("long").as("m"))
    deg
      .join(inSum, Seq("node"), "left")
      .select(
        col("node"),
        (lit(prScale * 15L / 100L) +
          expr("(coalesce(m, CAST(0 AS BIGINT)) * 85) div 100")).as("pr"),
        col("deg"))
  }

  /** Rolling 7-day (trailing, inclusive) distinct active users per day,
    * alongside the per-day count — the retention/engagement headline metric.
    *
    * The scale-correct shape for windowed COUNT DISTINCT: a range self-join
    * (`a.day BETWEEN b.day-6 AND b.day`) re-associates every user-day with
    * every window it falls in through a JOIN — O(days) probe amplification
    * through a shuffle. Instead each distinct (user, day) contribution
    * EXPLODES to the ≤ `window` window-end days it reaches (a narrow,
    * row-local multiply), and one distinct + count per (user, window-day)
    * finishes it. Cost is exactly `window ×` the user-day table — linear,
    * map-side combined, no join. Days with no prior history report the
    * partial trailing window (standard dashboard semantics); window-end
    * days beyond the data's last day are clipped by the join back to the
    * observed-day spine.
    */
  def rollingDistinctUsers(events: DataFrame, window: Int = 7): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val daily = userDays.groupBy("d").agg(count(lit(1)).cast("long").as("dau1"))
    val windowed = userDays
      .select(
        col("user_id"),
        explode(sequence(lit(0), lit(window - 1))).as("o"),
        col("d"))
      .select(col("user_id"), date_add(col("d"), col("o")).as("d"))
      .distinct()
      .groupBy("d")
      .agg(count(lit(1)).cast("long").as("dau7"))
    daily.join(windowed, Seq("d")).select("d", "dau1", "dau7")
  }

  /** First-order Markov transition matrix over per-user event streams:
    * count of (prev → next) steps and the conditional probability
    * P(next | prev). The behavioral-model primitive behind next-event
    * prediction and anomaly scoring on clickstreams.
    *
    * Scale shape: ONE window shuffle partitioned by user (per-user groups
    * are session-sized, never corpus-sized, so no single-task funnel),
    * then a map-side-combined count into O(|types|²) cells. The
    * conditional total is restored from the cells themselves by a second
    * tiny window over the |types|²-row matrix — never a second pass over
    * the events. `p = n / total` is one IEEE division of two exact longs,
    * bit-identical in any IEEE-754 engine.
    *
    * Tie order within a timestamp is pinned by (ts, event_id) so the lag
    * sequence — and therefore every count — is deterministic under any
    * partitioning.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    val cells = steps
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).cast("long").as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    cells
      .withColumn("total", sum(col("n")).over(byPrev))
      .select(
        col("prev_type"),
        col("next_type"),
        col("n"),
        (col("n").cast("double") / col("total")).as("p"))
  }

  /** Top-`k` event trigrams (3-step paths) across all user streams — the
    * path-mining sibling of [[eventTransitions]]: which three-step journeys
    * dominate the product. Same single window shuffle (two lags share one
    * WindowExec frame), map-side-combined count into O(|types|³) cells,
    * then a TakeOrderedAndProject cut — per-partition top-k on the
    * executors, only k rows reach the driver-side merge. Deterministic
    * total order (n desc, then the path) so the cut is rerun-stable. */
  def eventTrigrams(events: DataFrame, k: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("e3"))
      .withColumn("e2", lag(col("e3"), 1).over(byUser))
      .withColumn("e1", lag(col("e3"), 2).over(byUser))
      .filter(col("e1").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }
}

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
    *
    * `checkpointEdges = false` is the BUCKETED-ADJACENCY mode: pass edges
    * read from a table bucketed (and sorted) by `src` with the bucket
    * count matching `spark.sql.shuffle.partitions`, and skip the EDGE
    * checkpoint — a local checkpoint erases the scan's
    * outputPartitioning, which is exactly what bucketing buys. Each
    * round's edges⋈ranks join then reads bucket-aligned partitions with
    * NO edge-side exchange (plan-guarded in PlanShapeSpec). The DEGREE
    * table is local-checkpointed in EVERY mode: it is O(nodes) and feeds
    * every round, and re-deriving it per round in bucketed mode paid an
    * O(edges) aggregate per round (for [[personalizedPageRank]], plus the
    * seeds scan and its distinct exchange) — the r8 q_ppr regression.
    * The checkpointed deg's side of the per-round deg⋈inSum join gains
    * an O(nodes) exchange, strictly cheaper than what it replaces; the
    * bucketing win lives on the EDGE side and survives. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 5,
      ckptEvery: Int = 2,
      checkpointEdges: Boolean = true): DataFrame = {
    // the last loop iteration always checkpoints ranks, making the returned
    // plan self-contained; with zero rounds the result would reference the
    // deg checkpoint freed below
    require(iters >= 1, s"pageRank needs at least one round, got iters=$iters")
    val eRaw = edges.select(col("src"), col("dst"))
    val e =
      if (checkpointEdges) eRaw.transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
      else eRaw
    val deg = e
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    var ranks = deg.select(col("node"), lit(prScale).as("pr"), col("deg"))
    var prevCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val round = pageRankRound(e, deg, ranks)
      // checkpoint every `ckptEvery` rounds (and always the last): plan
      // depth stays bounded while skipping half the materialization jobs —
      // each checkpoint is a full job + storage write, and two rounds of
      // join+agg lineage is still a small plan
      if (i % ckptEvery == 0 || i == iters) {
        val next = round.transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
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
    if (checkpointEdges) org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(e)
    org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(deg)
    ranks.select(col("node"), col("pr").as("pr_micro"))
  }

  private val prScale = 1000000L

  /** Personalized PageRank: [[pageRank]]'s integer-exact contract with the
    * teleport term concentrated on a SEED set — random-walk-with-restart
    * proximity to the seeds, the graph-native "more like these" ranking
    * (crawl-frontier prioritization, seed-anchored corpus selection).
    *
    * Contract (unnormalized PPR, engine-replayable): seeds start at
    * `prScale` micro-units and every round receive a flat 150000 teleport;
    * non-seeds start at 0 and receive none:
    * `pr'(v) = (seed(v) ? 150000 : 0) + (Σ_in (pr div out_deg) · 85) div 100`.
    * All BIGINT with truncating division, so the DuckDB oracle replays the
    * rounds as unrolled CTEs bit-for-bit. Same caller contract (out-degree
    * ≥ 1) and same two-shuffles-per-round + checkpoint-every-`ckptEvery`
    * scale shape as [[pageRank]].
    *
    * Output: `(node, pr_micro)` for nodes with pr > 0 — proximity mass
    * only; far-from-seed nodes stay exactly zero and are dropped. */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int = 5,
      ckptEvery: Int = 2,
      checkpointEdges: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    // same self-containment argument as pageRank: the result must not
    // reference the deg checkpoint freed on the way out
    require(iters >= 1, s"personalizedPageRank needs at least one round, got iters=$iters")
    val eRaw = edges.select(col("src"), col("dst"))
    val e = if (checkpointEdges) eRaw.transform(Bridge.localCheckpointFreshStats) else eRaw
    // deg embeds the seeds scan + distinct besides the degree aggregate;
    // checkpointed in EVERY mode (see pageRank's scale-shape note) so no
    // round re-derives any of it — in bucketed mode this was re-running
    // an edge aggregate AND the seeds subplan per round (r8 regression)
    val deg = e
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .join(
        seeds.select(col("node")).distinct().withColumn("t", lit(prScale * 15L / 100L)),
        Seq("node"),
        "left")
      .select(col("node"), col("deg"), coalesce(col("t"), lit(0L)).as("t"))
      .transform(Bridge.localCheckpointFreshStats)
    var ranks = deg.select(
      col("node"),
      when(col("t") > 0, lit(prScale)).otherwise(lit(0L)).as("pr"),
      col("deg"),
      col("t"))
    var prevCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
      val inSum = contrib.groupBy("node").agg(sum(col("c")).cast("long").as("m"))
      val round = deg
        .join(inSum, Seq("node"), "left")
        .select(
          col("node"),
          (col("t") + expr("(coalesce(m, CAST(0 AS BIGINT)) * 85) div 100")).as("pr"),
          col("deg"),
          col("t"))
      if (i % ckptEvery == 0 || i == iters) {
        val next = round.transform(Bridge.localCheckpointFreshStats)
        if (prevCkpt != null) Bridge.freeLocalCheckpoint(prevCkpt)
        prevCkpt = next
        ranks = next
      } else {
        ranks = round
      }
    }
    if (checkpointEdges) Bridge.freeLocalCheckpoint(e)
    Bridge.freeLocalCheckpoint(deg)
    ranks.filter(col("pr") > 0).select(col("node"), col("pr").as("pr_micro"))
  }

  /** K-core decomposition by synchronous peeling: repeatedly delete every
    * node of degree < k (all at once — a "round"), until the remainder (the
    * k-core) has minimum degree ≥ k. The graph-curation primitive behind
    * community-core extraction and spam-subgraph isolation. Returns EVERY
    * node of the input edge set: `(node, peel_round, core)` with
    * `peel_round = 0` for core members, else the 1-based round the node
    * fell in.
    *
    * Scale shape (same discipline as [[pageRank]] / duplicateClusters):
    * each round is one degree aggregate over live nodes (map-side
    * combined; a node that lost all its edges still peels, via the
    * node-spine left join) and two anti-joins trimming the edge list —
    * never all-pairs, never a global sort. Convergence is a driver-side
    * scalar (the peeled-count certificate); rounds are O(peel depth),
    * bounded by `maxRounds`. The edge frame re-checkpoints each round so
    * lineage stays flat, and superseded checkpoint blocks are freed
    * eagerly; only the blocks backing the returned plan (per-round peel
    * lists + the final core edges) persist until the caller is done.
    *
    * Synchronous-peel certificate (what the gate query checks): every core
    * node keeps ≥ k in-core neighbors; every peeled node has < k
    * neighbors in {u : round(u) ≥ round(v)} ∪ core. Those two invariants
    * pin the output to THE k-core (peeling is confluent), so an oracle
    * need not replay the iteration.
    */
  def kCore(
      edges: DataFrame,
      k: Int,
      maxRounds: Int = 50): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sym0 = edges
      .select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    var cur = sym0.transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    var live = cur.select(col("a").as("node")).distinct().transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    val peels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 1
    var done = false
    while (!done && round <= maxRounds) {
      val deg = cur.groupBy(col("a").as("node")).agg(count(lit(1)).cast("long").as("dg"))
      val low = live
        .join(deg, Seq("node"), "left")
        .filter(coalesce(col("dg"), lit(0L)) < k)
        .select("node")
        .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
      if (low.count() == 0L) {
        Bridge.freeLocalCheckpoint(low)
        done = true
      } else {
        peels += low.select(col("node"), lit(round.toLong).as("peel_round"))
        val nextCur = cur
          .join(low.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(low.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
        val nextLive = live
          .join(low, Seq("node"), "left_anti")
          .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
        Bridge.freeLocalCheckpoint(cur)
        Bridge.freeLocalCheckpoint(live)
        cur = nextCur
        live = nextLive
        round += 1
      }
    }
    // the core edge list served its last degree count; only the node frames
    // (peel lists + surviving live set) back the returned plan
    Bridge.freeLocalCheckpoint(cur)
    val core = live.select(col("node"), lit(0L).as("peel_round"))
    (peels :+ core)
      .reduce(_.union(_))
      .select(col("node"), col("peel_round"), (col("peel_round") === 0L).as("core"))
  }

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

  /** Weighted percentiles, exact: the smallest value whose cumulative
    * WEIGHT reaches the quantile — "median document length weighted by
    * token count" is a different (and for a token-budgeted corpus, the
    * right) number than the row-weighted median. Returns one row
    * `(tot_weight, p50, p90, p99)`.
    *
    * Numeric contract: the quantile test is the integer
    * cross-multiplication `den·cumw ≥ num·totw` — no fractional quantile
    * position is ever materialized. Value-axis cumulative window is
    * domain-bounded (the KS exemption). */
  def weightedPercentiles(df: DataFrame, valueCol: String, weightCol: String): DataFrame = {
    val grid = df
      .select(col(valueCol).cast("long").as("v"), col(weightCol).cast("long").as("w"))
      .groupBy("v")
      .agg(sum("w").cast("long").as("wv"))
    val byV = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grid.agg(sum("wv").cast("long").as("totw"))
    grid
      .withColumn("cumw", sum("wv").over(byV))
      .crossJoin(broadcast(tot))
      .agg(
        max("totw").cast("long").as("tot_weight"),
        min(when(col("cumw") * 2 >= col("totw"), col("v"))).cast("long").as("p50"),
        min(when(col("cumw") * 10 >= col("totw") * 9, col("v"))).cast("long").as("p90"),
        min(when(col("cumw") * 100 >= col("totw") * 99, col("v"))).cast("long").as("p99"))
  }

  /** Effect-size panel between two groups' value distributions: Cohen's d
    * (standardized mean difference, pooled SD) and the Mann–Whitney AUC
    * (P(a > b) + ½P(a = b) — the rank-based, outlier-robust companion;
    * 0.5 = stochastically equal). The KS statistic says WHETHER the
    * distributions differ; this panel says HOW MUCH and IN WHICH
    * DIRECTION. One row `(n_a, n_b, mean_a, mean_b, cohens_d, auc)`.
    *
    * Numeric contract: moments are exact integer-cent sums (Σx, Σx² in
    * BIGINT); d is one fixed IEEE tree from them. The doubled U statistic
    * `2U = Σ_v ca_v·(2·cum_cb(<v) + cb_v)` is EXACT BIGINT (midrank ties
    * fold in as halves ×2), so AUC = 2U/(2·n_a·n_b) rounds from an exact
    * rational. Value-axis window is domain-bounded (the KS exemption). */
  def effectSize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      a: String,
      b: String): DataFrame = {
    val cents = expr(s"CAST(CAST($valueCol AS DECIMAL(12,2)) * 100 AS BIGINT)")
    val counts = df
      .filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("g"), cents.as("v"))
      .groupBy("v")
      .agg(
        sum(when(col("g") === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === b, 1L).otherwise(0L)).as("cb"))
    val byV = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mom = counts.agg(
      sum("ca").cast("long").as("na"),
      sum("cb").cast("long").as("nb"),
      sum(col("ca") * col("v")).cast("long").as("sa"),
      sum(col("cb") * col("v")).cast("long").as("sb"),
      sum(col("ca") * col("v") * col("v")).cast("long").as("qa"),
      sum(col("cb") * col("v") * col("v")).cast("long").as("qb"))
    val u2 = counts
      .withColumn("cumb", sum("cb").over(byV))
      .select(sum(col("ca") * (lit(2L) * (col("cumb") - col("cb")) + col("cb")))
        .cast("long").as("u2"))
    mom
      .crossJoin(broadcast(u2))
      .withColumn("ma", col("sa").cast("double") / col("na"))
      .withColumn("mb", col("sb").cast("double") / col("nb"))
      .withColumn("sd",
        sqrt(((col("qa").cast("double") -
          col("sa").cast("double") * col("sa").cast("double") / col("na")) +
          (col("qb").cast("double") -
            col("sb").cast("double") * col("sb").cast("double") / col("nb"))) /
          (col("na") + col("nb") - 2)))
      .select(
        col("na").as("n_a"),
        col("nb").as("n_b"),
        round(col("ma") / 100, 6).as("mean_a"),
        round(col("mb") / 100, 6).as("mean_b"),
        round((col("ma") - col("mb")) / col("sd"), 6).as("cohens_d"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("na") * col("nb")), 6).as("auc"))
  }

  /** χ² independence audit between two categorical columns, with
    * Cramér's V as the normalized effect size — "is event mix actually a
    * function of weekday / is label a function of source", the
    * contingency-table complement to [[ksDistance]]'s two-sample test.
    * One summary row `(n_cells, dof, chi2, cramers_v)`.
    *
    * Numeric contract: each cell's deviation `o·N − r·c` is an EXACT
    * BIGINT; its χ² term is one fixed IEEE tree from exact integers,
    * rounded 6dp and summed as DECIMAL (order-free — the entropy-oracle
    * pattern); V is one sqrt at the edge. Scale shape: one corpus-scan
    * count into the (a × b) grid; everything after is grid-sized. */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).cast("long").as("c"))
    val r = o.groupBy("a").agg(sum("c").cast("long").as("rc"))
    val cl = o.groupBy("b").agg(sum("c").cast("long").as("cc"))
    val t = o.agg(
      sum("c").cast("long").as("n"),
      countDistinct(col("a")).cast("long").as("na"),
      countDistinct(col("b")).cast("long").as("nb"))
    o.join(broadcast(r), Seq("a"))
      .join(broadcast(cl), Seq("b"))
      .crossJoin(broadcast(t))
      .withColumn("num", (col("c") * col("n") - col("rc") * col("cc")).cast("long"))
      .withColumn("term",
        round((col("num").cast("double") * col("num").cast("double")) /
          (col("n").cast("double") * col("rc") * col("cc")), 6).cast("decimal(20,6)"))
      .agg(
        max("na").as("mna"), max("nb").as("mnb"), max("n").as("mn"),
        sum("term").cast("decimal(20,6)").cast("double").as("chi2p"),
        // Σ_present r·c — the sparse grid holds only OBSERVED cells, but an
        // EMPTY cell still contributes (r·c)²/(N·r·c) = r·c/N; in closed
        // form Σ_absent r·c = N² − Σ_present r·c, all exact BIGINT.
        sum((col("rc") * col("cc")).cast("long")).cast("long").as("spc"))
      .withColumn("chi2",
        col("chi2p") +
          (col("mn") * col("mn") - col("spc")).cast("double") / col("mn").cast("double"))
      .select(
        (col("mna") * col("mnb")).cast("long").as("n_cells"),
        ((col("mna") - 1) * (col("mnb") - 1)).cast("long").as("dof"),
        col("chi2"),
        round(sqrt(col("chi2") /
          (col("mn").cast("double") * least(col("mna") - 1, col("mnb") - 1))), 6)
          .as("cramers_v"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of groups `a` and `b` — the binning-free drift test
    * (the [[distributionDrift]] histogram fixes a bucket grid; KS is the
    * sup-norm over EVERY observed threshold, so a shift smaller than a
    * bucket still registers). One summary row
    * `(n_a, n_b, ks_num, ks)` where `ks = ks_num / (n_a·n_b)`.
    *
    * Numeric contract: values quantize to integer cents; the empirical-CDF
    * gap at threshold v is the EXACT integer `|F_a(v)·n_a·n_b − F_b(v)·
    * n_a·n_b| = |cum_a(v)·n_b − cum_b(v)·n_a|`, so the max is found in
    * BIGINT and only the final ratio is one double division.
    *
    * Scale shape: one map-side-combined count per distinct VALUE, then a
    * cumulative window over the value axis — single-partition but
    * domain-bounded (distinct 2dp readings of a bounded metric, the same
    * O(bins) exemption as the histogram/quantile windows), never
    * corpus-row-bounded. */
  def ksDistance(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      a: String,
      b: String): DataFrame = {
    val cents = expr(s"CAST(CAST($valueCol AS DECIMAL(12,2)) * 100 AS BIGINT)")
    val counts = df
      .filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("g"), cents.as("v"))
      .groupBy("v")
      .agg(
        sum(when(col("g") === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === b, 1L).otherwise(0L)).as("cb"))
    val byV = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum("ca").cast("long").as("na"), sum("cb").cast("long").as("nb"))
    counts
      .withColumn("fa", sum("ca").over(byV))
      .withColumn("fb", sum("cb").over(byV))
      .crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(col("fa") * col("nb") - col("fb") * col("na")).as("dev"))
      .groupBy("na", "nb")
      .agg(max("dev").cast("long").as("ks_num"))
      .select(
        col("na").as("n_a"),
        col("nb").as("n_b"),
        col("ks_num"),
        (col("ks_num").cast("double") / (col("na") * col("nb")).cast("double")).as("ks"))
  }

  /** Per-group distribution drift vs the pooled corpus — the data-quality
    * monitor for a multi-source training pipeline: which source's length
    * (or score) distribution has wandered from the corpus at large. Emits
    * per group the total-variation distance and the χ² divergence of its
    * bucketed histogram against the pooled histogram, both Laplace-(+1)-
    * smoothed over a FIXED literal bucket grid (`value div bucketWidth`,
    * clamped to `nBuckets`), so the statistic needs no quantile pass.
    *
    * Scale shape: ONE map-side-combined count into groups × nBuckets cells;
    * everything after the first aggregate is model-sized (the dense spine,
    * the pooled marginals, the divergence sums), never corpus-sized. The
    * pooled reference is rolled up FROM the cells — no second corpus pass.
    *
    * Numeric contract: counts are exact longs; the smoothed proportions are
    * one IEEE division each; per-bucket divergence terms are rounded to a
    * fixed scale and summed as DECIMAL (exact, order-insensitive), the same
    * cross-engine discipline as the centroid/PMI queries. TVD and χ² are
    * rational in the counts — no transcendental enters, so the result is
    * bit-identical in any IEEE-754 engine.
    */
  def distributionDrift(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bucketWidth: Long,
      nBuckets: Int): DataFrame = {
    val nb = lit(nBuckets.toLong)
    val cells = df
      .select(
        col(groupCol).as("g"),
        least(floor(col(valueCol) / lit(bucketWidth.toDouble)).cast("long"), lit(nBuckets - 1L))
          .as("b"))
      .groupBy("g", "b")
      .agg(count(lit(1)).cast("long").as("c"))
    // Dense (group, bucket) spine: empty buckets still carry smoothed mass.
    val spine = cells
      .select("g")
      .distinct()
      .select(col("g"), explode(sequence(lit(0L), lit(nBuckets - 1L))).as("b"))
    val dense = spine
      .join(cells, Seq("g", "b"), "left")
      .select(col("g"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
    val perGroup = dense.groupBy("g").agg(sum(col("c")).as("n"))
    val pooled = dense.groupBy("b").agg(sum(col("c")).as("rc"))
    val total = pooled.agg(sum(col("rc")).as("nn"))
    dense
      .join(broadcast(perGroup), Seq("g"))
      .join(broadcast(pooled), Seq("b"))
      .crossJoin(broadcast(total))
      .withColumn("ps", (col("c") + 1).cast("double") / (col("n") + nb))
      .withColumn("pr", (col("rc") + 1).cast("double") / (col("nn") + nb))
      .groupBy("g")
      .agg(
        max(col("n")).as("n"),
        sum(round(abs(col("ps") - col("pr")) / 2, 12).cast("decimal(20,12)")).as("tvd_d"),
        sum(round((col("ps") - col("pr")) * (col("ps") - col("pr")) / col("pr"), 12)
          .cast("decimal(20,12)")).as("chi2_d"))
      .select(
        col("g"),
        col("n"),
        col("tvd_d").cast("double").as("tvd"),
        col("chi2_d").cast("double").as("chi2"))
  }

  /** Drift over time, composed on the [[IncrementalRollup]] histogram
    * table: per-day TVD + χ² of that day's value histogram against the
    * pooled all-days histogram — "which ingest days look distributionally
    * wrong", answered FROM the O(days × bins) rollup rows with ZERO event
    * rescans (the rollup appends one day's rows per day; this monitor then
    * costs the same whether the history is a week or a decade of 100 TB).
    *
    * Same smoothing/numeric contract as [[distributionDrift]], except the
    * bucket spine is the rollup's own observed-bin domain (model-sized)
    * rather than a fixed literal grid, so the smoothing width `nb` rides
    * along as a 1-row broadcast instead of a constant. Input: `(day, bin,
    * cnt)` cells. Output: `(day, n, tvd, chi2)`.
    */
  def driftTimeline(hists: DataFrame): DataFrame = {
    val cells = hists.select(
      col("day").as("g"),
      col("bin").as("b"),
      col("cnt").cast("long").as("c"))
    val bins = cells.select("b").distinct()
    val nbDf = bins.agg(count(lit(1)).cast("long").as("nb"))
    val spine = cells.select("g").distinct().crossJoin(bins)
    val dense = spine
      .join(cells, Seq("g", "b"), "left")
      .select(col("g"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
    val perGroup = dense.groupBy("g").agg(sum(col("c")).as("n"))
    val pooled = dense.groupBy("b").agg(sum(col("c")).as("rc"))
    val total = pooled.agg(sum(col("rc")).as("nn"))
    dense
      .join(broadcast(perGroup), Seq("g"))
      .join(broadcast(pooled), Seq("b"))
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(nbDf))
      .withColumn("ps", (col("c") + 1).cast("double") / (col("n") + col("nb")))
      .withColumn("pr", (col("rc") + 1).cast("double") / (col("nn") + col("nb")))
      .groupBy("g")
      .agg(
        max(col("n")).as("n"),
        sum(round(abs(col("ps") - col("pr")) / 2, 12).cast("decimal(20,12)")).as("tvd_d"),
        sum(round((col("ps") - col("pr")) * (col("ps") - col("pr")) / col("pr"), 12)
          .cast("decimal(20,12)")).as("chi2_d"))
      .select(
        col("g").as("day"),
        col("n"),
        col("tvd_d").cast("double").as("tvd"),
        col("chi2_d").cast("double").as("chi2"))
  }

  /** Per-(user, day) event-rate anomalies: days where a user's event count
    * sits more than `zThresh` sample standard deviations from that user's
    * own across-days mean — the abuse/bot-burst detector over a clickstream.
    *
    * Scale shape: one map-side-combined (user, day) count, then ONE window
    * shuffle partitioned by user carrying three frame-less aggregates
    * (count, Σc, Σc²) in a single WindowExec — per-user groups are
    * days-sized, never corpus-sized. No self-join, no global pass.
    *
    * Numeric contract: moments are exact longs; the sample variance is one
    * IEEE division of exact longs (`(n·Σc² − (Σc)²) / (n·(n−1))`), `sqrt`
    * is correctly rounded by IEEE-754, and the z-score applies division
    * and subtraction in a pinned order — mirrored token for token in the
    * oracle, so every step is bit-identical cross-engine. Users with fewer
    * than `minDays` observed days or zero variance are excluded (a
    * constant-rate user has no well-defined z).
    */
  def userRateAnomaly(
      events: DataFrame,
      minDays: Int = 3,
      zThresh: Double = 2.0): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).cast("long").as("c"))
      // c*c materializes BEFORE the window: windowing over a raw column keeps
      // all three aggregates in ONE Window node (an expression operand would
      // split planning into two stacked WindowExecs — same single shuffle,
      // but a second buffering pass over every user group).
      .withColumn("cc", col("c") * col("c"))
      .withColumn("nd", count(lit(1)).over(byUser))
      .withColumn("s", sum(col("c")).over(byUser))
      .withColumn("ss", sum(col("cc")).over(byUser))
      .filter(col("nd") >= minDays)
      .withColumn(
        "varr",
        (col("nd") * col("ss") - col("s") * col("s")).cast("double") /
          (col("nd") * (col("nd") - 1)))
      .filter(col("varr") > 0)
      .withColumn(
        "z",
        (col("c").cast("double") - col("s").cast("double") / col("nd")) / sqrt(col("varr")))
      .filter(abs(col("z")) > zThresh)
      .select(col("user_id"), col("d"), col("c"), round(col("z"), 6).as("z"))
  }

  /** Synchronous label propagation (LPA) for community detection, FIXED
    * `rounds` — every node starts as its own label; each round every node
    * adopts the most frequent label among its neighbors, ties to the
    * SMALLEST label. The fixed round count and total tie order make the
    * result deterministic and ENGINE-REPLAYABLE (asynchronous LPA is
    * neither), so the oracle unrolls the rounds as CTEs — the same
    * contract as the integer-exact PageRank. Complements the suite:
    * connected components answer "linked at all", k-core "dense enough",
    * LPA "which cluster".
    *
    * Scale shape per round: one edges⋈labels shuffle join, one map-side-
    * combined (node, label) count, one struct-max argmax per node (no
    * window, no sort). Labels checkpoint per round with measured-size
    * stats ([[org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats]])
    * and superseded blocks free eagerly.
    */
  /** Neighbor-set Jaccard similarity over a bipartite membership table
    * `(node, item)` (distinct): node pairs sharing an item, scored
    * |A∩B| / |A∪B|, top-k by (jac desc, a, b). Hub control: items held by
    * more than `maxItemFreq` nodes are dropped BEFORE pairing — the classic
    * stop-node cut (a hub item contributes O(freq²) pairs and ~zero
    * similarity signal), so the candidate space is Σ f² over capped f,
    * linear-ish in items, never all-pairs of nodes. Degrees are computed on
    * the same capped universe so the Jaccard is internally consistent.
    */
  def neighborJaccard(membership: DataFrame, maxItemFreq: Int, k: Int): DataFrame = {
    val keep = membership
      .groupBy("item")
      .agg(count(lit(1)).as("f"))
      .filter(col("f") <= maxItemFreq)
      .select("item")
    // capped feeds the degree aggregate AND both sides of the pair
    // self-join; checkpointed so the membership subtree (at the q_node
    // similarity call site a lineitem⋈orders join + distinct) runs once,
    // not once per consumer (the triangleStats multi-consumer fix)
    val capped = membership.join(keep, Seq("item")).select("node", "item")
      .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
    val deg = capped.groupBy("node").agg(count(lit(1)).as("deg"))
    val pairs = capped.select(col("item"), col("node").as("a"))
      .join(capped.select(col("item"), col("node").as("b")), Seq("item"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).cast("long").as("inter"))
    pairs
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        col("a"),
        col("b"),
        col("inter"),
        round(
          col("inter").cast("double") / (col("da") + col("db") - col("inter")),
          6).as("jac"))
      .orderBy(col("jac").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Fixed-round synchronous multi-source BFS over an undirected edge set
    * `(a, b)`: `seeds(node)` start at distance 0 and each round relaxes
    * `dist(v) = min(dist(v), min over neighbors dist(u) + 1)` — after R
    * rounds every node within R hops of a seed carries its exact hop
    * distance (nodes beyond R hops are absent, the frontier contract).
    * Fixed rounds + min relaxation are fully deterministic, so the oracle
    * replays the rounds as unrolled CTEs (the integer-PageRank/LPA
    * contract applied to reachability).
    *
    * Scale shape per round: one edges⋈distances shuffle join + one
    * map-side-combined min aggregate; distances checkpoint per round with
    * measured-size stats and superseded blocks free eagerly. State is
    * O(reached nodes), never O(edges × rounds).
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sym = edges
      .select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .transform(Bridge.localCheckpointFreshStats)
    val dist = bfsCore(sym, seeds, rounds)
    Bridge.freeLocalCheckpoint(sym)
    dist
  }

  /** [[bfsDistances]] over a PRE-SYMMETRIZED persisted adjacency `(src,
    * dst)` — pass a table bucketed (and sorted) by `src` with the bucket
    * count matching `spark.sql.shuffle.partitions` and each round's
    * edges⋈distances join reads bucket-aligned partitions with no
    * edge-side exchange (no local checkpoint here: it would erase the
    * scan's outputPartitioning, the [[pageRank]] `checkpointEdges = false`
    * reasoning). */
  def bfsDistancesOnAdjacency(sym: DataFrame, seeds: DataFrame, rounds: Int = 3): DataFrame =
    bfsCore(sym.select(col("src"), col("dst")), seeds, rounds)

  private def bfsCore(sym: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    var dist = seeds
      .select(col("node"), lit(0L).as("dist"))
      .transform(Bridge.localCheckpointFreshStats)
    for (_ <- 1 to rounds) {
      val relaxed = Bridge.localCheckpointFreshStats(bfsRound(sym, dist))
      Bridge.freeLocalCheckpoint(dist)
      dist = relaxed
    }
    dist
  }

  /** One BFS relaxation round (exposed for plan-shape assertions, the
    * [[pageRankRound]] pattern — the checkpointed loop's final plan is an
    * RDD scan, so the per-round shape must be guarded on the round itself). */
  private[graft] def bfsRound(sym: DataFrame, dist: DataFrame): DataFrame =
    sym
      .join(dist.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
      .union(dist)
      .groupBy("node")
      .agg(min(col("dist")).as("dist"))

  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sym = edges
      .select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .transform(Bridge.localCheckpointFreshStats)
    val labels = lpaCore(sym, rounds)
    Bridge.freeLocalCheckpoint(sym)
    labels
  }

  /** [[labelPropagation]] over a PRE-SYMMETRIZED persisted adjacency
    * `(src, dst)` — the bucketed-table mode ([[bfsDistancesOnAdjacency]]
    * contract): each round's sym⋈labels join and the initial node scan
    * read bucket-aligned partitions with no edge-side exchange. */
  def labelPropagationOnAdjacency(sym: DataFrame, rounds: Int = 3): DataFrame =
    lpaCore(sym.select(col("src"), col("dst")), rounds)

  private def lpaCore(sym: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    var labels = sym
      .select(col("src").as("node"))
      .distinct()
      .select(col("node"), col("node").as("lab"))
      .transform(Bridge.localCheckpointFreshStats)
    for (_ <- 1 to rounds) {
      val next = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(count(lit(1)).cast("long").as("n"))
        .groupBy("node")
        .agg(max(struct(col("n").as("n"), (-col("lab")).as("nl"))).as("best"))
        .select(col("node"), (-col("best.nl")).as("lab"))
        .transform(Bridge.localCheckpointFreshStats)
      Bridge.freeLocalCheckpoint(labels)
      labels = next
    }
    labels.select(col("node"), col("lab").as("community"))
  }

  /** Prequential (online) variant of [[userRateAnomaly]]: day `d` is
    * scored against the user's moments over STRICTLY EARLIER days only —
    * the semantics a live detector can actually have (the retrospective
    * variant's moments include the day being judged, so its flags change
    * when later data arrives; this one's never do). Same exact-integer
    * moment discipline, same pinned expression tree; the frame is
    * `ROWS UNBOUNDED PRECEDING .. 1 PRECEDING` instead of the whole
    * partition. One user-partitioned window shuffle; the streaming twin
    * (`StreamingAnomaly`) carries (nd, Σc, Σc²) as keyed state and is
    * spec-proven to emit exactly these rows.
    */
  def userRateAnomalyOnline(
      events: DataFrame,
      minDays: Int = 3,
      zThresh: Double = 2.0): DataFrame = {
    val prior = Window
      .partitionBy(col("user_id"))
      .orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("cc", col("c") * col("c"))
      .withColumn("nd", count(lit(1)).over(prior))
      .withColumn("s", sum(col("c")).over(prior))
      .withColumn("ss", sum(col("cc")).over(prior))
      .filter(col("nd") >= minDays)
      .withColumn(
        "varr",
        (col("nd") * col("ss") - col("s") * col("s")).cast("double") /
          (col("nd") * (col("nd") - 1)))
      .filter(col("varr") > 0)
      .withColumn(
        "z",
        (col("c").cast("double") - col("s").cast("double") / col("nd")) / sqrt(col("varr")))
      .filter(abs(col("z")) > zThresh)
      .select(col("user_id"), col("d"), col("c"), round(col("z"), 6).as("z"))
  }

  /** Co-occurrence edges for [[triangleStats]]: distinct unordered part
    * pairs appearing in the same order. Built WITHOUT a self-join — parts
    * collect per order (a bounded-cardinality set: an order has a handful
    * of lines), pairs are generated row-locally from the sorted set, then
    * one distinct. A lineitem⋈lineitem self-join on l_orderkey would
    * shuffle the fact table twice and amplify quadratically on any hot
    * order; this shape is one groupBy plus a row-local O(items²) expansion
    * over a per-order bound, linear at any corpus size.
    */
  def coOrderEdges(lineitem: DataFrame): DataFrame = {
    val parts = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    // native pair expansion ([[org.apache.spark.sql.graft.SortedLongPairs]])
    // — the nested-transform spelling evaluated an interpreted lambda per
    // basket element (ArrayTransform is CodegenFallback); same pair set
    parts
      .select(explode(org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.graft.SortedLongPairs(
          org.apache.spark.sql.graft.Bridge.expression(col("ps"))))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
  }

  /** Triangle count + global clustering coefficient over an undirected
    * edge set `(a, b), a < b` — the graph-shape diagnostic (community
    * density) on a co-occurrence graph.
    *
    * Scale shape: DEGREE-ORIENTED EDGE-ITERATOR counting. Each undirected
    * edge is oriented from its (degree, id)-smaller endpoint to the
    * larger — a strict total order, so the oriented graph is acyclic and
    * every triangle a<b<c (in that order) is counted exactly once, at its
    * (a, b) edge, as `|N⁺(a) ∩ N⁺(b)|`. Out-neighborhoods collect ONCE
    * into sorted adjacency arrays (Σ = |E| longs) and each oriented edge
    * joins the two arrays it needs; the intersection runs in the
    * codegen'd [[graft.functions.TextFunctions.sortedIntersectCount]]
    * merge kernel inside the partial aggregate, so the Σ outdeg² wedge
    * work happens as CPU inside whole-stage codegen and NEVER enters an
    * exchange. The previous formulation materialized every wedge through
    * a shuffle (Σ outdeg² ROWS — measured 2 GB and 7.8 s at sf0.1 where
    * this shape shuffles ~40 MB and runs ~3×  faster); the naive triple
    * join the oracle runs is another order worse. Degree orientation
    * bounds every out-neighborhood by O(√|E|) even on power-law graphs.
    * Output is one row: edges, wedges (undirected, Σ d(d−1)/2 — exact
    * integer), triangles, and gcc = 3·T/W (one IEEE division of exact
    * longs).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.sortedIntersectCount
    import org.apache.spark.sql.graft.Bridge
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    // deg / oriented / adj each feed 2-3 consumers below; without the
    // checkpoints Catalyst re-plans (and the executor re-RUNS) the whole
    // upstream pipeline per consumer — the r11 event-log profile measured
    // the degree aggregate executing 6× and the adjacency collect 2× per
    // q_lcc/q_triangles run (optimization guide §1.2: don't compute things
    // twice; §5: materialize reused intermediates). Blocks stay alive
    // behind the returned lazy plan — the kCore discipline.
    val deg = sym.groupBy("a").agg(count(lit(1)).cast("long").as("dg"))
      .transform(Bridge.localCheckpointFreshStats)
    val oriented = sym
      .join(deg.withColumnRenamed("a", "u").withColumnRenamed("dg", "du"), col("a") === col("u"))
      .join(deg.withColumnRenamed("a", "v").withColumnRenamed("dg", "dv"), col("b") === col("v"))
      .filter(col("du") < col("dv") || (col("du") === col("dv") && col("a") < col("b")))
      .select(col("a").as("src"), col("b").as("dst"))
      .transform(Bridge.localCheckpointFreshStats)
    val adj = oriented.groupBy("src").agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .transform(Bridge.localCheckpointFreshStats)
    val tri = oriented
      .join(adj.toDF("src", "na"), Seq("src"))
      .join(adj.toDF("dst", "nb"), Seq("dst"))
      .agg(
        coalesce(sum(sortedIntersectCount(col("na"), col("nb")).cast("long")), lit(0L))
          .as("n_triangles"))
    val wedgeCount = deg.agg((sum(col("dg") * (col("dg") - 1)) / 2).cast("long").as("n_wedges"))
    val edgeCount = edges.agg(count(lit(1)).cast("long").as("n_edges"))
    edgeCount
      .crossJoin(wedgeCount)
      .crossJoin(tri)
      .select(
        col("n_edges"),
        col("n_wedges"),
        col("n_triangles"),
        (lit(3.0) * col("n_triangles") / col("n_wedges")).as("gcc"))
  }

  /** Top-`k` association rules a→b over the order/part basket table —
    * market-basket mining at the pair level: support (co-occurrence
    * count), confidence `n_ab / n_a`, and lift
    * `n_ab·N / (n_a·n_b)` for every part pair co-ordered at least
    * `minSupport` times. The pair level is the honest distributed kernel
    * of FP-growth: higher-order itemsets prune FROM these cells,
    * driver-side, on a model-sized table.
    *
    * Scale shape: baskets collapse to distinct (order, item) once; pair
    * counts are generated ROW-LOCALLY from each order's sorted item set
    * (bounded per order) and combine map-side into O(co-pairs) cells —
    * the basket table never self-joins. Item supports and the basket
    * count roll up from the same distinct table; the rule assembly joins
    * cells→supports on the item key (model-sized). The support floor cuts
    * the hapax tail before any join.
    *
    * Numeric contract: confidence is one IEEE division of exact longs;
    * lift multiplies in DECIMAL(38,0) first (corpus-scale counts overflow
    * BIGINT products) then performs ONE double division — the same
    * discipline as the PMI query. Deterministic total order
    * (lift desc, ante, cons) under the top-k cut.
    */
  def associationRules(lineitem: DataFrame, minSupport: Long, k: Int): DataFrame = {
    val oi = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
      .distinct()
    val nOrders = oi.agg(countDistinct(col("o")).cast("long").as("n_orders"))
    val sup = oi.groupBy("i").agg(count(lit(1)).cast("long").as("n_i"))
    // native pair expansion (SortedLongPairs) — see coOrderEdges
    val ab = oi
      .groupBy("o")
      .agg(sort_array(collect_set(col("i"))).as("ps"))
      .select(explode(org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.graft.SortedLongPairs(
          org.apache.spark.sql.graft.Bridge.expression(col("ps"))))).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).cast("long").as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // both rule directions from the a<b cells — row-local flip, no second count
    val directed = ab
      .select(col("a").as("ante"), col("b").as("cons"), col("n_ab"))
      .union(ab.select(col("b").as("ante"), col("a").as("cons"), col("n_ab")))
    directed
      .join(sup.toDF("ante", "n_a"), Seq("ante"))
      .join(sup.toDF("cons", "n_b"), Seq("cons"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("ante"),
        col("cons"),
        col("n_ab"),
        col("n_a"),
        col("n_b"),
        (col("n_ab").cast("double") / col("n_a")).as("conf"),
        ((col("n_ab").cast("decimal(38,0)") * col("n_orders")).cast("double") /
          (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons"))
      .limit(k)
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

  /** Top-`k` nodes by LOCAL clustering coefficient over an undirected edge
    * set `(a, b), a < b` — the per-node sibling of [[triangleStats]]:
    * `lcc(v) = 2·t(v) / (d(v)·(d(v)−1))`, how close each node's
    * neighborhood is to a clique (ego-community density; hub-vs-clique
    * separation on a co-occurrence graph).
    *
    * Scale shape: the SAME degree-oriented edge-iterator as
    * [[triangleStats]] — every triangle a<b<c (degree order) is discovered
    * exactly once at its (a, b) edge — but per-node attribution needs the
    * triangle's third corner, so the sorted-adjacency intersection W is
    * materialized per edge (`array_intersect` of two already-sorted,
    * duplicate-free lists) and credit is emitted row-locally from ONE
    * generator projection: a and b each take |W| as a single count cell
    * (no row per triangle for two of the three corners) and only the
    * third corners w ∈ W expand to rows. The exchange carries T + 2|E|
    * map-side-combined cells — O(triangles + edges), the output's own
    * size class, never Σ outdeg² wedges. Degree orientation still bounds
    * every out-neighborhood by O(√|E|). The final degree join is on the
    * O(V) degree table; the top-k cut compiles to TakeOrderedAndProject
    * under the deterministic (lcc desc, t desc, node) order.
    * Isolated-triangle corners score 1.0; degree-1 nodes are excluded
    * (lcc undefined — the d·(d−1) denominator is zero). */
  def localClusteringCoefficient(edges: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    // checkpoints: same multi-consumer re-execution fix as [[triangleStats]]
    // (deg feeds oriented twice + the final lcc join; oriented feeds adj +
    // the corner join; adj feeds both sides of the corner join)
    val deg = sym.groupBy("a").agg(count(lit(1)).cast("long").as("dg"))
      .transform(Bridge.localCheckpointFreshStats)
    val oriented = sym
      .join(deg.withColumnRenamed("a", "u").withColumnRenamed("dg", "du"), col("a") === col("u"))
      .join(deg.withColumnRenamed("a", "v").withColumnRenamed("dg", "dv"), col("b") === col("v"))
      .filter(col("du") < col("dv") || (col("du") === col("dv") && col("a") < col("b")))
      .select(col("a").as("src"), col("b").as("dst"))
      .transform(Bridge.localCheckpointFreshStats)
    val adj = oriented.groupBy("src").agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .transform(Bridge.localCheckpointFreshStats)
    // Corner credit without a 3·T explode: the (a, b) edge's intersection W
    // credits a and b with |W| each (two cells via the first two generator
    // slots — no row per triangle) and only the third corners w ∈ W expand
    // to rows. Spelled as posexplode over a plain long array (src, dst,
    // then W) with the |W| literal carried alongside: slots 0-1 take |W|,
    // the rest take 1. The previous named_struct/transform spelling put an
    // interpreted higher-order function (ArrayTransform is CodegenFallback)
    // with a per-element struct allocation on every edge — profiled at
    // ~190 µs/edge, the whole query's hot stage; this form stays inside
    // whole-stage codegen end to end. The exchange still carries T + 2|E|
    // map-side-combined cells, never Σ outdeg² wedges.
    val corners = oriented
      .join(adj.toDF("src", "na"), Seq("src"))
      .join(adj.toDF("dst", "nb"), Seq("dst"))
      // the kernel intersection materializes ONCE per edge in its own
      // projection (referenced twice below — CollapseProject keeps
      // non-cheap multi-referenced aliases out of the consumer)
      .select(
        col("src"),
        col("dst"),
        graft.functions.TextFunctions.sortedIntersect(col("na"), col("nb")).as("c"))
      .select(
        col("src"),
        col("dst"),
        size(col("c")).cast("long").as("w"),
        col("c"))
      .select(col("w"), posexplode(concat(array(col("src"), col("dst")), col("c"))))
      .select(
        col("col").as("node"),
        when(col("pos") < 2, col("w")).otherwise(lit(1L)).as("t_add"))
    val triPerNode = corners.groupBy("node").agg(sum(col("t_add")).cast("long").as("t"))
    deg
      .filter(col("dg") >= 2)
      .select(col("a").as("node"), col("dg").as("degree"))
      .join(triPerNode, Seq("node"), "left_outer")
      .select(
        col("node"),
        col("degree"),
        coalesce(col("t"), lit(0L)).as("t"),
        // exact longs, one IEEE division
        (lit(2.0) * coalesce(col("t"), lit(0L)) / (col("degree") * (col("degree") - 1)))
          .as("lcc"))
      .orderBy(col("lcc").desc, col("t").desc, col("node"))
      .limit(k)
  }

  /** Lag-`L` autocorrelation of the per-`keyCol` DAILY count series, one
    * row per (key, lag) — the seasonality detector that turns "does
    * Monday look like last Monday" into a number (lag 7 ≈ weekly rhythm,
    * lag 1 ≈ day-to-day persistence).
    *
    * Numeric contract: Pearson r is assembled from EXACT integer sums
    * (`n·Σxy − Σx·Σy` over DECIMAL(38,0) — corpus-scale daily counts
    * square past BIGINT) with ONE final double division, not from the
    * engine's `corr` (whose single-pass moment updates are
    * summation-order-sensitive and differ between engines). Pairs are
    * (day d, day d+L) where BOTH days exist — a `lag(L)` over the
    * day-ordered series joined by position, which on a gap-free daily
    * spine equals the calendar pairing.
    *
    * Scale shape: one map-side-combined (key, day) count — the only
    * corpus-keyed exchange — then a per-key window over O(days) rows
    * (bounded by the time range, never by data volume) and a per-key
    * aggregate to one row per lag. Degenerate guard: a key with < 2
    * pairs or zero variance on either margin yields r = NULL (not a
    * division blow-up). */
  def dailyAutocorrelation(events: DataFrame, lags: Seq[Int]): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("long").as("n"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val perLag = lags.map { l =>
      daily
        .withColumn("x", lag(col("n"), l).over(byType))
        .filter(col("x").isNotNull)
        .select(
          col("event_type"),
          lit(l).as("lag_k"),
          col("x").cast("decimal(38,0)").as("x"),
          col("n").cast("decimal(38,0)").as("y"))
        .groupBy("event_type", "lag_k")
        .agg(
          count(lit(1)).cast("long").as("n_pairs"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
    }
    perLag
      .reduce(_.unionByName(_))
      .select(
        col("event_type"),
        col("lag_k").cast("int").as("lag_k"),
        col("n_pairs"),
        // cov/var numerators are exact DECIMAL; one double division at the end
        when(
          col("n_pairs") >= 2 &&
            (col("n_pairs") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n_pairs") * col("syy") - col("sy") * col("sy")) > 0,
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(
              (col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("r"))
      .orderBy(col("event_type"), col("lag_k"))
  }

  /** Per-user merged-interval activity coverage: each event opens a
    * `holdUs`-microsecond activity interval; overlapping/abutting intervals
    * union into islands and the user's covered time is the summed island
    * length — the "actual time on site" quantity a naive
    * `n_events × hold` overstates wherever activity clusters. Returns
    * `(user_id, n_events, n_islands, covered_s)`.
    *
    * Scale shape: the classic interval-union via ONE user-partitioned
    * window pass (running max of prior interval ends ⇒ island-start flags
    * ⇒ running island id) — never an interval self-join. Both follow-up
    * aggregates reuse the same user_id hash partitioning (exchange-reuse,
    * cf. q_gaps_islands). All arithmetic is exact integer microseconds
    * (`unix_micros` + `div`); tie rows (same user, same timestamp) carry
    * identical intervals, so island assignment is order-invariant, and
    * event_id makes the window order total anyway. */
  def intervalCoverage(events: DataFrame, holdUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("st"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("st"))
      .withColumn("en", col("st") + lit(holdUs))
      .withColumn("pm", max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "ni",
        when(col("pm").isNull || col("st") > col("pm"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "isl")
      .agg(
        min(col("st")).as("s0"),
        max(col("en")).as("e1"),
        count(lit(1)).as("nev"))
      .groupBy("user_id")
      .agg(
        sum(col("nev")).cast("long").as("n_events"),
        count(lit(1)).cast("long").as("n_islands"),
        expr("CAST(sum(e1 - s0) div 1000000 AS BIGINT)").as("covered_s"))
      .orderBy("user_id")
  }

  /** First-seen novelty curve over (`dayCol`, `keyCol`) observations: per
    * day, how many distinct keys were active, how many appeared for the
    * FIRST time ever, the cumulative catalog size, and the novelty rate —
    * the "is this stream still showing me new things" diagnostic (catalog
    * growth, crawl-frontier freshness, dedup upstream health).
    *
    * Scale shape: observations collapse to distinct (day, key) once (one
    * map-side-combined exchange, the only corpus-keyed one); first-seen
    * is a min-per-key aggregate on the SAME key partitioning; everything
    * after is O(days) rows, including the cumulative window (single
    * partition over the time-bounded day table — the documented bounded
    * exception, cf. the daily-series operators). */
  def firstSeenCurve(df: DataFrame, dayCol: String, keyCol: String): DataFrame = {
    val dk = df.select(col(dayCol).as("d"), col(keyCol).as("k")).distinct()
    val perDay = dk.groupBy("d").agg(count(lit(1)).cast("long").as("n_active"))
    val newPerDay = dk
      .groupBy("k")
      .agg(min(col("d")).as("fd"))
      .groupBy(col("fd").as("d"))
      .agg(count(lit(1)).cast("long").as("n_new"))
    val wCum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    perDay
      .join(newPerDay, Seq("d"), "left_outer")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("catalog_size", sum(col("n_new")).over(wCum).cast("long"))
      .select(
        col("d"),
        col("n_active"),
        col("n_new"),
        col("catalog_size"),
        (col("n_new").cast("double") / col("n_active")).as("novelty_rate"))
      .orderBy("d")
  }

  /** Lead/lag cross-correlation between two event types' daily count
    * series: Pearson r of `(count_A on day d, count_B on day d+L)` for each
    * requested lag — positive r at positive L reads "A leads B by L days"
    * (the does-signup-predict-purchase diagnostic). A day with events of
    * only one type counts ZERO for the other (the spine is the union of
    * active days), so missing days don't silently shrink the pairing.
    *
    * Numeric contract: same exact-sum Pearson assembly as
    * [[dailyAutocorrelation]] — DECIMAL(38,0) sums, one double division,
    * NULL on zero variance — never the engine's order-sensitive `corr`.
    *
    * Scale shape: ONE map-side-combined day aggregate builds both series
    * as conditional counts (the only corpus-keyed exchange); the lead
    * windows and the per-lag reductions run over the O(days) spine —
    * single-partition but time-bounded, the documented exception. */
  def dailyCrossCorrelation(
      events: DataFrame,
      typeA: String,
      typeB: String,
      lags: Seq[Int]): DataFrame = {
    val daily = events
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        sum(when(col("event_type") === typeA, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("na"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("nb"))
    val byDay = Window.orderBy(col("d"))
    val perLag = lags.map { l =>
      daily
        .withColumn("y", lead(col("nb"), l).over(byDay))
        .filter(col("y").isNotNull)
        .select(lit(l).as("lag_k"), col("na").as("x"), col("y"))
        .groupBy("lag_k")
        .agg(
          count(lit(1)).cast("long").as("n_pairs"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
    }
    perLag
      .reduce(_.unionByName(_))
      .select(
        col("lag_k").cast("int").as("lag_k"),
        col("n_pairs"),
        when(
          col("n_pairs") >= 2 &&
            (col("n_pairs") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n_pairs") * col("syy") - col("sy") * col("sy")) > 0,
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(
              (col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("r"))
      .orderBy("lag_k")
  }

  /** Neyman (variance-proportional) sample allocation: how a fixed survey /
    * eval-labeling budget should split across strata — `n_h ∝ N_h·S_h`, so
    * big AND volatile strata get the labels, near-constant strata almost
    * none. The principled refinement of proportional stratified sampling
    * ([[graft.operators.Curation.stratifiedSample]] covers the equal/
    * proportional case).
    *
    * Numeric contract: per-stratum population variance from exact DECIMAL
    * moments (`n·Σx² − (Σx)²`, integer `cents`); S_h enters through one
    * correctly-rounded IEEE sqrt; the weight is rounded to 6 dp and summed
    * as DECIMAL so the normalizing total is order-insensitive; allocation
    * is `floor(budget·w/Σw)` on identically-derived doubles. Zero-variance
    * strata weigh 0 (get no budget) — allocate a floor upstream if every
    * stratum must be probed.
    *
    * Scale shape: one map-side-combined moment aggregate to O(strata)
    * rows; the total is a 1-row broadcast. */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      centsCol: String,
      budget: Long): DataFrame = {
    val m = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(
        count(lit(1)).cast("long").as("n_h"),
        sum(col(centsCol).cast("decimal(38,0)")).as("sx"),
        sum(col(centsCol).cast("decimal(38,0)") * col(centsCol)).as("sxx"))
      .select(
        col("stratum"),
        col("n_h"),
        // population stddev: sqrt((n·Σx² − (Σx)²)) / n — exact args, two
        // IEEE steps (sqrt, divide)
        (sqrt((col("n_h") * col("sxx") - col("sx") * col("sx")).cast("double")) /
          col("n_h")).as("sd"))
      .withColumn(
        "w",
        round(col("n_h") * col("sd"), 6).cast("decimal(38,6)"))
    val tot = m.agg(sum(col("w")).as("wtot"))
    m.join(broadcast(tot))
      .select(
        col("stratum"),
        col("n_h"),
        round(col("sd"), 6).as("sd"),
        when(
          col("wtot") > 0,
          floor(lit(budget) * col("w").cast("double") / col("wtot").cast("double"))
            .cast("long"))
          .otherwise(lit(0L))
          .as("alloc"))
      .orderBy("stratum")
  }

  /** CUSUM changepoint probe per `event_type`: the day where the running
    * sum of deviations from the series mean peaks in absolute value — the
    * classic "when did the level shift" detector for daily volumes
    * (deploys, outages, mix changes).
    *
    * Numeric contract: the mean is never materialized as a float.
    * Deviations are scaled by the day count D — `s_t = Σ_{i≤t} (D·n_i − N)`
    * (N = series total) — so the cumulative sum is EXACT integer
    * (DECIMAL(38,0); D·n_i at corpus scale can pass BIGINT), the argmax
    * is over exact values with a deterministic earliest-day tie-break,
    * and the one reported double is `|s_peak| / (D·sqrt(D))`-free: we
    * report `cusum_rel = |s_peak| / N` — peak deviation mass relative to
    * the series total, one IEEE division of exact values.
    *
    * Scale shape: one map-side-combined (type, day) count; per-type
    * windows over O(days) rows (time-bounded); struct-max argmax (the
    * same 1:1 policy as last-touch attribution) so ties break on the
    * EARLIEST day without a second window. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("long").as("n"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("d"))
    daily
      .withColumn("dd", count(lit(1)).over(byType).cast("decimal(38,0)"))
      .withColumn("nn", sum(col("n")).over(byType).cast("decimal(38,0)"))
      .withColumn("s", sum(col("dd") * col("n") - col("nn")).over(cum))
      // argmax by (|s| desc, d asc) via one struct max: negate the date so
      // the lexicographic max prefers the earliest day among equal |s|
      .groupBy("event_type")
      .agg(
        max(struct(abs(col("s")).as("a"), (unix_date(col("d")) * -1).as("negd"),
          col("d").as("d"), col("nn").as("nn"))).as("m"))
      .select(
        col("event_type"),
        col("m.d").as("cp_day"),
        col("m.a").cast("double").as("cusum_abs"),
        (col("m.a").cast("double") / col("m.nn").cast("double")).as("cusum_rel"))
      .orderBy("event_type")
  }

  /** Poisson-bootstrap confidence interval for the per-group mean — the
    * scale-correct bootstrap (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012): classic resampling-with-replacement
    * needs the whole dataset addressable per replicate, which is impossible
    * at 100 TB; the Poisson approximation instead gives every (row,
    * replicate) an independent Poisson(1) weight, turning R resamples into
    * ONE streaming pass with a ×R row-local expansion and a map-side-combined
    * integer aggregate. Nothing is stored, nothing re-shuffled per replicate;
    * the only state is (groups × R) partial sums.
    *
    * Determinism/oracle contract: the Poisson draw is the inverse-CDF of a
    * Knuth multiplicative hash of (id, replicate) — u = (h mod 2^32)/2^32 is
    * an exactly-representable double, compared against literal Poisson(1)
    * CDF thresholds, so DuckDB replays weights bit-for-bit. Values go
    * through the repo's exact-arithmetic discipline (DECIMAL(12,2) → integer
    * cents, BIGINT sums — order-insensitive), with ONE double division per
    * replicate mean; the final percentiles are rounded to 6 so a 1-ULP
    * interpolation difference between engines cannot flip the hash.
    */
  def poissonBootstrapCi(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      replicates: Int = 200): DataFrame = {
    // Poisson(1) CDF thresholds; weights >= 7 are astronomically rare
    // (P ~ 1e-5) and capped — identical literals appear in the oracle.
    val cdf = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167588507119)
    val base = df.select(
      col(groupCol).as("g"),
      col(idCol).as("id"),
      expr(s"CAST(CAST($valueCol AS DECIMAL(12,2)) * 100 AS BIGINT)").as("vc"))
    // The affine map (id·a + j·b) mod 2^32 alone makes consecutive
    // replicates' u values deterministic shifts of one another (u(j+1) =
    // u(j) + const), collapsing the 200 weight vectors onto one line and
    // distorting CI coverage. A nonlinear xor-shift-multiply finalizer
    // (lowbias32-style, two rounds) breaks the affinity. The multiplier
    // 0x45d9f3b keeps every intermediate < 2^32·0x45d9f3b ≈ 3.1·10¹⁷ —
    // inside int64 on BOTH engines (DuckDB BIGINT multiplication errors
    // on overflow rather than wrapping, so Murmur3's 32-bit constants
    // would not replay there). Identical literals appear in the oracle.
    val M = 73244475L // 0x45d9f3b
    val rep = base
      .select(col("g"), col("id"), col("vc"),
        explode(sequence(lit(0), lit(replicates - 1))).as("j"))
      .withColumn(
        "h0",
        pmod(col("id") * 2654435761L + (col("j") + 1) * 2246822519L,
          lit(4294967296L)))
      .withColumn("h1", pmod(col("h0").bitwiseXOR(shiftright(col("h0"), 16)) * M, lit(4294967296L)))
      .withColumn("h2", pmod(col("h1").bitwiseXOR(shiftright(col("h1"), 16)) * M, lit(4294967296L)))
      .withColumn(
        "u",
        col("h2").bitwiseXOR(shiftright(col("h2"), 16)).cast("double") / 4294967296.0d)
      .withColumn(
        "w",
        cdf.zipWithIndex.foldRight(lit(cdf.length): org.apache.spark.sql.Column) {
          case ((t, i), acc) => when(col("u") < t, i).otherwise(acc)
        }.cast("long"))
    val repMeans = rep
      .groupBy("g", "j")
      .agg(sum(col("w")).as("n"), sum(col("w") * col("vc")).as("sv"))
      .filter(col("n") > 0)
      .select(col("g"),
        (col("sv").cast("double") / col("n").cast("double") / 100.0d).as("m"))
    val ci = repMeans
      .groupBy("g")
      .agg(expr("percentile(m, array(0.025, 0.975))").as("ps"))
      .select(col("g"), round(element_at(col("ps"), 1), 6).as("ci_lo"),
        round(element_at(col("ps"), 2), 6).as("ci_hi"))
    base
      .groupBy("g")
      .agg(count(lit(1)).cast("long").as("n_rows"), sum("vc").as("svc"))
      .select(col("g"),
        col("n_rows"),
        round(col("svc").cast("double") / col("n_rows").cast("double") / 100.0d,
          6).as("mean_value"))
      .join(broadcast(ci), "g")
      .withColumnRenamed("g", groupCol)
      .orderBy(groupCol)
  }
}

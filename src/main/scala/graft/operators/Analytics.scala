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
}

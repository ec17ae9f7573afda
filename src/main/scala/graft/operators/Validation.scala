package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-training data validation — the contract gate a pipeline runs before
  * a corpus or fact table is allowed near a training job or a report. The
  * reference's analog is manual: operators eyeball row counts in the ingest
  * logs (RdlETL.java:133-140 progress prints); here the checks are
  * declarative, exact, and one scan each.
  *
  * Three primitives, composable into a validation suite:
  *  - [[columnProfile]]: per-column statistics in ONE pass over the table;
  *  - [[expect]]: arbitrary row-level predicates, all folded into ONE
  *    aggregate (a failed contract reports its violation count, not a
  *    boolean — triage needs magnitude);
  *  - [[expectForeignKey]]: referential integrity as a broadcast-or-shuffle
  *    anti-join count, the only check that inherently needs a second table.
  *
  * All outputs are tiny (O(columns + checks) rows), exact, and
  * engine-replayable — the DuckDB oracles recompute every number.
  */
object Validation {

  /** Per-column profile: `(column, n, n_null, n_distinct, min_s, max_s,
    * sum_len)` — one row per requested column, computed in a single pass.
    * Values are compared in their string form (`min_s`/`max_s`, ASCII
    * collation) so one profile row shape covers every column type;
    * `sum_len` is the exact total string length (emit the ratio downstream
    * if an average is wanted — a single stored division would be fine too,
    * but the sum is the mergeable form).
    *
    * Scale shape: the multi-`count(distinct)` plans as one Expand
    * (rows × profiled columns) feeding a two-phase aggregate — still one
    * scan of the table, with map-side partials; profile breadth is a
    * handful of columns, so the expansion factor is bounded. For
    * hundreds-of-columns profiling swap exact distinct for HLL — this
    * operator deliberately keeps the exact contract. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"),
        min(s).as(s"${c}__min"),
        max(s).as(s"${c}__max"),
        coalesce(sum(length(s).cast("long")), lit(0L)).as(s"${c}__len"))
    }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = cols.map(c =>
      struct(
        lit(c).as("column"),
        col("n").as("n"),
        col(s"${c}__nnull").as("n_null"),
        col(s"${c}__ndist").as("n_distinct"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"),
        col(s"${c}__len").as("sum_len")))
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Row-level contracts: each named predicate is counted over the SAME
    * single aggregate pass — `(check, n_rows, violations, ok)` per check,
    * where `violations` counts rows for which the predicate is NOT
    * satisfied (nulls violate: a contract an engine cannot prove held is
    * broken, the only safe reading). */
  def expect(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"v$i")
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("check"),
        col("n_rows").as("n_rows"),
        col(s"v$i").as("violations"))
    }
    one
      .select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .withColumn("ok", col("violations") === 0L)
  }

  /** Referential integrity: count child rows whose `key` has no match in
    * `parent.pkey` (NULL keys are orphans — same strictness as [[expect]]).
    * One anti-join (broadcast when the parent key set is small, shuffled
    * otherwise — planner's choice, both correct); output is one row. */
  def expectForeignKey(
      child: DataFrame,
      key: String,
      parent: DataFrame,
      pkey: String): DataFrame = {
    val orphans = child
      .select(col(key).as("__k"))
      .join(parent.select(col(pkey).as("__k")).distinct(), Seq("__k"), "left_anti")
    orphans.agg(count(lit(1)).as("n_orphans")).withColumn("ok", col("n_orphans") === 0L)
  }

  /** Schema drift between two table generations: one row per column whose
    * presence or type changed — `(column, change, from_type, to_type)` with
    * change ∈ added / removed / type_changed, columns sorted. The companion
    * gate to `Ingest.parquetEvolving`: evolution-by-addition is silently
    * mergeable, but THIS is the report a migration review reads before
    * turning mergeSchema loose on a 100 TB table.
    *
    * Schemas are driver-side metadata by nature (parquet footers, catalog
    * entries) — no data is scanned; the result is a literal frame. Empty
    * output = schemas identical. */
  def schemaDiff(from: DataFrame, to: DataFrame): DataFrame = {
    val f = from.schema.fields.map(x => x.name -> x.dataType.sql).toMap
    val t = to.schema.fields.map(x => x.name -> x.dataType.sql).toMap
    val rows: Seq[(String, String, String, String)] =
      (f.keySet ++ t.keySet).toSeq.sorted.flatMap { c =>
        (f.get(c), t.get(c)) match {
          case (Some(a), Some(b)) if a == b => None
          case (Some(a), Some(b)) => Some((c, "type_changed", a, b))
          case (Some(a), None) => Some((c, "removed", a, null))
          case (None, Some(b)) => Some((c, "added", null, b))
        }
      }
    val session = from.sparkSession
    import session.implicits._
    rows.toDF("column", "change", "from_type", "to_type")
  }
}

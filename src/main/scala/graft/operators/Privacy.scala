package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy primitives a training-data pipeline needs BEFORE data leaves the
  * boundary: prove a release is k-anonymous over its quasi-identifiers, and
  * replace stable identifiers with keyed surrogates. Complements the PII
  * scan/redaction in [[graft.functions.TextFunctions]] (content-level) with
  * the record-level side.
  */
object Privacy {

  /** k-anonymity audit over the `quasi` identifier columns: one summary row
    * `(n_rows, n_classes, min_class_size, n_violating_classes,
    * rows_at_risk, k_ok)` where a violating equivalence class has fewer
    * than `k` rows and `rows_at_risk` counts the rows inside them — the
    * release gate "no quasi-identifier combination isolates fewer than k
    * people".
    *
    * Scale shape: ONE map-side-combined groupBy on the quasi columns
    * (classes collapse before the exchange; the shuffle carries O(classes)
    * cells, not rows), then one O(classes) aggregate to a single row.
    * NULLs form their own class (groupBy semantics in both engines), which
    * is the conservative reading — a null-quasi row set smaller than k is
    * still isolating. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).cast("long").as("sz"))
      .agg(
        sum(col("sz")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_classes"),
        min(col("sz")).cast("long").as("min_class_size"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).cast("long").as("n_violating_classes"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).cast("long").as("rows_at_risk"))
      .select(
        col("n_rows"),
        col("n_classes"),
        col("min_class_size"),
        col("n_violating_classes"),
        col("rows_at_risk"),
        (col("min_class_size") >= k).as("k_ok"))

  /** l-diversity audit — k-anonymity's sensitive-value complement: a
    * k-anonymous class is still re-identifying if everyone in it shares
    * the same SENSITIVE value (homogeneity attack), so each
    * quasi-identifier class must also contain at least `l` DISTINCT
    * sensitive values. One aggregate over the class grid (count +
    * count-distinct per class — map-side combined, bounded by the class
    * grid not the table), one scalar roll-up. Output mirrors
    * [[kAnonymity]]: `(n_classes, min_distinct_sensitive,
    * n_violating_classes, rows_at_risk, l_ok)`. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String, l: Long): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("sz"),
        countDistinct(col(sensitive)).cast("long").as("nd"))
      .agg(
        count(lit(1)).cast("long").as("n_classes"),
        min(col("nd")).cast("long").as("min_distinct_sensitive"),
        sum(when(col("nd") < l, 1L).otherwise(0L)).cast("long").as("n_violating_classes"),
        sum(when(col("nd") < l, col("sz")).otherwise(0L)).cast("long").as("rows_at_risk"))
      .select(
        col("n_classes"),
        col("min_distinct_sensitive"),
        col("n_violating_classes"),
        col("rows_at_risk"),
        (col("min_distinct_sensitive") >= l).as("l_ok"))

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * distribution-skew complement to [[lDiversity]]: a class with l distinct
    * sensitive values still leaks if its value DISTRIBUTION diverges from
    * the corpus-wide one. Distance is total variation
    * `TVD = ½·Σ_v |p_class(v) − p_global(v)|`, kept EXACT until the edge:
    * with class size `sz`, corpus size `n`, class-value counts `cnt_cv` and
    * global counts `cnt_v`,
    * `TVD·2·sz·n = Σ_{v∈class} |cnt_cv·n − cnt_v·sz| + sz·(n − Σ_{v∈class} cnt_v)`
    * is pure BIGINT arithmetic (the second term folds every value ABSENT
    * from the class), and the threshold test `TVD > tNum/tDen` is the exact
    * integer cross-multiplication `tvd_num·tDen > 2·sz·n·tNum` — no engine
    * ever compares rounded frequencies.
    *
    * Scale shape: everything aggregates off the sparse (class × value) grid
    * — three map-side-combined aggregates and two broadcast joins (global
    * value counts; class sizes); the corpus is scanned once. */
  def tCloseness(
      df: DataFrame,
      quasi: Seq[String],
      sensitive: String,
      tNum: Long = 1L,
      tDen: Long = 4L): DataFrame = {
    val cv = df
      .groupBy((quasi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).cast("long").as("cnt_cv"))
    val gl = cv.groupBy(col(sensitive)).agg(sum("cnt_cv").cast("long").as("cnt_v"))
    val tot = gl.agg(sum("cnt_v").cast("long").as("n"))
    val cls = cv.groupBy(quasi.map(col): _*).agg(sum("cnt_cv").cast("long").as("sz"))
    val violates = col("tvd_num") * tDen > lit(2L) * col("sz") * col("n") * tNum
    cv.join(broadcast(gl), Seq(sensitive))
      .join(broadcast(cls), quasi)
      .crossJoin(broadcast(tot))
      .groupBy((quasi.map(col) :+ col("sz") :+ col("n")): _*)
      .agg(
        sum(abs(col("cnt_cv") * col("n") - col("cnt_v") * col("sz"))).cast("long")
          .as("dev_present"),
        sum("cnt_v").cast("long").as("present_glob"))
      .withColumn("tvd_num", col("dev_present") + col("sz") * (col("n") - col("present_glob")))
      .agg(
        count(lit(1)).cast("long").as("n_classes"),
        max(col("tvd_num").cast("double") / (lit(2L) * col("sz") * col("n")).cast("double"))
          .as("max_tvd"),
        sum(when(violates, 1L).otherwise(0L)).cast("long").as("n_violating_classes"),
        sum(when(violates, col("sz")).otherwise(0L)).cast("long").as("rows_at_risk"))
      .withColumn("t_ok", col("n_violating_classes") === 0L)
  }

  /** Keyed surrogate for an identifier column: `md5(pepper || ':' || id)`
    * as a Column — deterministic (joins on the surrogate still line up
    * across tables and runs), non-reversible without the pepper, and
    * engine-portable (md5 over the identical byte string in Spark and
    * DuckDB). This is pseudonymization (GDPR art. 4(5)) not anonymization:
    * the mapping exists, held by whoever holds the pepper. */
  def surrogate(id: Column, pepper: String): Column =
    md5(concat(lit(pepper), lit(":"), id.cast("string")))

  /** Pseudonymization mapping for the distinct `idCol` population of `df`:
    * `(idCol, pseudonym)` one row per distinct id. Injectivity holds up to
    * md5 collisions (2^-64 birthday scale at any realistic population);
    * the distinct is the only exchange, map-side combined on the id. The
    * downstream pattern is `df.withColumn(id, surrogate(col(id), pepper))`
    * row-locally — this table only exists for auditing/joining legacy
    * keys, and is itself sensitive (it IS the re-identification table). */
  def pseudonymMap(df: DataFrame, idCol: String, pepper: String): DataFrame =
    df.select(col(idCol))
      .distinct()
      .select(col(idCol), surrogate(col(idCol), pepper).as("pseudonym"))
}

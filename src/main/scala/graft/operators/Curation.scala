package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Composed corpus-curation flow — the top-level shape of a training-data
  * pipeline: exact dedup → quality gate → language gate, emitting one row per
  * *kept* document with the features that justified keeping it. Each stage is
  * the already-verified operator; composition stays a single declarative plan
  * (one window shuffle for dedup, narrow filters after), so Catalyst fuses
  * the gates into the scan.
  */
object Curation {

  /** Keep the lowest-doc_id representative of each normalized fingerprint,
    * then require token-count and stopword-ratio quality and a (heuristic)
    * English prediction. Returns (doc_id, fp, n_tokens, stop_ratio). */
  def curate(
      documents: DataFrame,
      minTokens: Int = 5,
      maxTokens: Int = 2000,
      minStopRatio: Double = 0.02): DataFrame = {
    val byFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    // `toks` in its own projection, referenced twice below: CollapseProject
    // keeps non-cheap multi-referenced producers separate, so the tokenizer
    // kernel runs once per row.
    documents
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        size(col("toks")).cast("long").as("n_tokens"),
        stopwordHits(col("toks")).cast("long").as("n_stop"))
      .withColumn("rn", row_number().over(byFp))
      .filter(col("rn") === 1) // exact-dedup keeper (first-wins by id)
      .withColumn(
        "stop_ratio",
        when(col("n_tokens") > 0, col("n_stop").cast("double") / col("n_tokens")))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .filter(col("stop_ratio") >= minStopRatio) // null ratio fails the gate
      .select("doc_id", "fp", "n_tokens", "stop_ratio")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match self-join (entity resolution): find record pairs
  * whose names are within a small edit distance, without ever materializing
  * the all-pairs space. The classic training-data / MDM use case: the same
  * real-world entity ingested twice with a typo'd key.
  *
  * Scale shape: candidates are generated per *block* (a cheap equality key —
  * here a categorical column the caller trusts, e.g. nation), then pruned by
  * the length band |len(a) − len(b)| ≤ maxDist — a necessary condition for
  * `levenshtein ≤ maxDist`, evaluated before the O(len²) distance kernel —
  * and only then scored. The join is a plain shuffled equi-join on the block
  * key, so each block's quadratic work is local to its partitions and the
  * distance kernel (Spark's codegen'd `levenshtein`) runs only on band
  * survivors. At 100 TB the block key must keep blocks bounded (add a
  * length-bucket or name-prefix component if a block can exceed ~10⁵ rows);
  * the operator is then shuffle-bound, never all-pairs-bound.
  */
object EntityResolution {

  /** Pairs within `maxDist` edits, blocked on `blockCol`.
    * Returns (a_id, b_id, a_name, b_name, dist), a_id < b_id.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String,
      maxDist: Int): DataFrame = {
    val a = df.select(
      col(blockCol).as("blk"),
      col(idCol).as("a_id"),
      col(nameCol).as("a_name"))
    val b = df.select(
      col(blockCol).as("blk"),
      col(idCol).as("b_id"),
      col(nameCol).as("b_name"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      // length band first: necessary for lev ≤ d, and O(1) vs the O(len²) kernel
      .filter(abs(length(col("a_name")) - length(col("b_name"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(
        col("a_id"),
        col("b_id"),
        col("a_name"),
        col("b_name"),
        col("dist").cast("long").as("dist"))
  }
}

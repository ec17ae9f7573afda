package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §7.2 M5). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline. The
  *    (small) query set is broadcast against the full candidate corpus, so
  *    the corpus is scanned once, partition-parallel, with no shuffle of the
  *    candidate side; only the per-query top-k heads shuffle (window by
  *    query). Norms are precomputed per side, never per pair.
  *
  *  - [[lshTopK]]: the 100 TB path — signed-random-projection buckets bound
  *    each query's candidate set to its bucket; exact cosine re-ranks inside
  *    the bucket. Recall trades off against `numPlanes`; multiprobe (flip one
  *    bit) widens recall without a second corpus scan.
  */
object SimilaritySearch {

  // array<double> materialized per vector BEFORE any pairwise join — keeps
  // DotProduct's implicit float→double cast out of the quadratic stage.
  private def withNorm(df: DataFrame, idAs: String, vecAs: String, nrmAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), col("embedding").cast("array<double>").as(vecAs))
      .withColumn(nrmAs, norm(col(vecAs)))

  /** Exact cosine top-k neighbors for each query vector (self excluded). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "q_id", "qv", "qn")
    val c = withNorm(candidates, "n_id", "nv", "nn")
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** SRP-LSH bucketed ANN: candidates restricted to the query's bucket
    * (plus optional single-bit multiprobe), exact cosine re-rank, top-k. */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64,
      multiprobe: Boolean = true): DataFrame = {
    val planes = randomPlanes(numPlanes, dim)
    val c = withNorm(candidates, "n_id", "nv", "nn")
      .withColumn("bucket", srpBucket(col("nv"), planes))
    val qBase = withNorm(queries, "q_id", "qv", "qn")
      .withColumn("b0", srpBucket(col("qv"), planes))
    // Multiprobe: query probes its own bucket and every Hamming-1 neighbor —
    // cheap recall without touching the candidate side again.
    val q =
      if (!multiprobe) qBase.withColumn("bucket", col("b0"))
      else
        qBase
          .withColumn(
            "bucket",
            explode(array(
              (col("b0") +: (0 until numPlanes).map(i => col("b0").bitwiseXOR(lit(1L << i)))): _*)))
          .dropDuplicates("q_id", "bucket")
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }
}

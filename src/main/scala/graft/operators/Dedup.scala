package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for large-scale document corpora (SURVEY.md §7.2
  * M5). Each takes the `documents` table shape `(doc_id, text, …)` and
  * returns a deterministic DataFrame.
  *
  * Scale design: every variant is a pure shuffle-on-key plan — no driver-side
  * state, no collect. Candidate generation (LSH band / blocking key) bounds
  * the pairwise phase so the quadratic step only runs inside buckets; at
  * 100 TB skewed buckets are the risk, handled by AQE skew-join splitting
  * (and, where a bucket is pathological, a `salt` column can be added to the
  * band key without changing semantics).
  */
object Dedup {

  /** Exact dedup by content fingerprint (hash-groupBy): one row per distinct
    * normalized text, keeper = min doc_id, n = group size. Map-side partial
    * aggregation makes this a single efficient shuffle at any scale. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))

  /** Candidate pairs by 40-char-prefix blocking + word-3-gram Jaccard
    * verification. Returns (a_id, b_id, n_inter, n_union, jac) for pairs with
    * jac ≥ threshold. Blocking bounds the self-join; the Jaccard check is
    * exact set arithmetic on distinct shingles. */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.3): DataFrame = {
    val sh = documents.select(
      col("doc_id"),
      md5(substring(normalize(col("text")), 1, 40)).as("bk"),
      shingles(tokens(col("text")), 3).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("bk"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("b_id"), col("bk"), col("sh").as("sb"))
    a.join(b, Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("n_union", size(array_union(col("sa"), col("sb"))))
      .withColumn(
        "jac",
        when(col("n_union") > 0, col("n_inter").cast("double") / col("n_union")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "n_inter", "n_union", "jac")
  }

  /** MinHash + LSH near-dup pairs: shingle → 16-perm MinHash signature →
    * 4 bands × 4 rows → band-bucket self-join for candidates → exact Jaccard
    * verification ≥ threshold. The full pairwise phase never materializes;
    * only same-band-bucket pairs are compared. */
  def minhashLshPairs(
      documents: DataFrame,
      threshold: Double = 0.5,
      numPerm: Int = 16,
      bands: Int = 4): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sigs = documents
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numPerm))
    val banded = sigs.select(
      col("doc_id"),
      col("sh"),
      explode(array((0 until bands).map(b => bandKey(col("sig"), b, rowsPerBand)): _*))
        .as("bucket"))
    val cand = banded
      .select(col("bucket"), col("doc_id").as("a_id"), col("sh").as("sa"))
      .join(
        banded.select(col("bucket"), col("doc_id").as("b_id"), col("sh").as("sb")),
        Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "sa", "sb")
      .dropDuplicates("a_id", "b_id") // same pair can collide in >1 band
    cand
      .withColumn("jac", jaccard(col("sa"), col("sb")))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** SimHash near-dup pairs: 64-bit signature per doc, candidates generated
    * by matching any of four 16-bit signature chunks (docs within Hamming
    * distance ≤ maxHamming of each other must share at least one chunk when
    * maxHamming < 4), then exact Hamming verification. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = documents
      .select(col("doc_id"), simhash(tokens(col("text"))).as("sig"))
    val chunked = sigs.select(
      col("doc_id"),
      col("sig"),
      explode(array((0 until 4).map { c =>
        struct(
          lit(c).as("chunk"),
          call_function("shiftright", col("sig"), lit(c * 16))
            .bitwiseAND(lit(0xffffL))
            .as("bits"))
      }: _*)).as("ck"))
    val a = chunked.select(col("ck"), col("doc_id").as("a_id"), col("sig").as("siga"))
    val b = chunked.select(col("ck"), col("doc_id").as("b_id"), col("sig").as("sigb"))
    a.join(b, Seq("ck"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming(col("siga"), col("sigb")).as("dist"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("dist") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs, exact all-pairs variant: every (a, b)
    * with cosine ≥ threshold. Quadratic — the correctness baseline and fine
    * when the corpus (or a blocking partition of it) fits a cartesian
    * stage; at 100 TB use [[embeddingCosinePairsLsh]]. Norms precomputed per
    * vector, never per pair. */
  def embeddingCosinePairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorFunctions._
    val keyed = embeddings
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm(col("embedding")))
    val a = keyed.select(col("vec_id").as("a_id"), col("embedding").as("va"), col("nrm").as("na"))
    val b = keyed.select(col("vec_id").as("b_id"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** Embedding-cosine near-dup pairs over `(vec_id, embedding)`: SRP-LSH
    * bucketing for candidates, exact cosine verification ≥ threshold — the
    * linear-ish scale path (recall < 1 by construction; widen with fewer
    * planes or multiprobe). */
  def embeddingCosinePairsLsh(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      numPlanes: Int = 12,
      dim: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions._
    val planes = randomPlanes(numPlanes, dim)
    val keyed = embeddings
      .select(col("vec_id"), col("embedding"), srpBucket(col("embedding"), planes).as("bucket"))
      .withColumn("nrm", norm(col("embedding")))
    val a = keyed.select(
      col("bucket"), col("vec_id").as("a_id"), col("embedding").as("va"), col("nrm").as("na"))
    val b = keyed.select(
      col("bucket"), col("vec_id").as("b_id"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }
}

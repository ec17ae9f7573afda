package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation: dedup keeps lowest id, quality and stopword gates drop the rest") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and more words here"),
      (3L, "THE quick brown fox jumps over the lazy dog and more words here"), // dup of 10 (normalized)… different case
      (4L, "too short"), // fails minTokens
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa") // no stopwords
    ).toDF("doc_id", "text")
    val kept = Curation.curate(docs).collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L)) // 3 < 10 wins the fingerprint group; 4 and 5 gated out
  }
}

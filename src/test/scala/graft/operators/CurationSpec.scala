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

  test("stratifiedSample: small strata pass whole, large strata shrink to ~target, rerun-stable") {
    val rows = (0L until 2000L).map(i => (i, "big")) ++ (10000L until 10020L).map(i => (i, "rare"))
    val df = rows.toDF("event_id", "event_type")
    val out = Curation.stratifiedSample(df, "event_type", "event_id", 100L)
    val byStratum = out.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("rare") === 20L) // n_total <= target: kept whole
    // binomial around 100 at rate 100/2000; bound loosely but meaningfully
    assert(byStratum("big") > 60L && byStratum("big") < 140L)
    // deterministic: identical membership on rerun
    val a = out.select("event_id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(df, "event_type", "event_id", 100L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // nested: shrinking target only removes rows, never adds
    val smaller = Curation.stratifiedSample(df, "event_type", "event_id", 50L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(a))
  }
}

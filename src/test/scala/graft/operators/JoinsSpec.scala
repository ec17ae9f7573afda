package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join: value-identical to plain join on a skewed fixture") {
    // 10k rows on one hot key + a tail of singletons
    val big = ((0 until 10000).map(i => (1L, s"hot-$i")) ++
      (2L to 50L).map(k => (k, s"cold-$k")))
      .toDF("k", "payload")
    val small = (1L to 50L).map(k => (k, s"dim-$k")).toDF("k", "attr")

    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(big, small, "k", saltBuckets = 8)
    assert(salted.columns.toSeq === Seq("k", "payload", "attr"))
    assert(salted.collect().map(_.toSeq).toSet === plain)
  }

  test("salted join: hot key actually spreads across salt buckets") {
    val big = (0 until 1000).map(i => (1L, i)).toDF("k", "i")
    val salts = big
      .withColumn("_salt", pmod(xxhash64(col("k"), col("i")), lit(8L)))
      .select("_salt")
      .distinct()
      .count()
    assert(salts > 1, "deterministic row hash failed to spread the hot key")
  }

  test("salted join: inner-join null/miss semantics preserved") {
    val big = Seq((1L, "a"), (99L, "miss")).toDF("k", "payload")
    val small = Seq((1L, "dim")).toDF("k", "attr")
    val out = Joins.saltedJoin(big, small, "k", saltBuckets = 4).collect()
    assert(out.length === 1 && out.head.getString(1) === "a")
  }
}

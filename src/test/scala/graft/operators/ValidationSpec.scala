package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: nulls, distincts, string min/max, lengths — one pass") {
    val df = Seq(
      (Some(1L), Some("bb")),
      (Some(2L), None),
      (Some(2L), Some("a"))).toDF("id", "s")
    val p = Validation
      .columnProfile(df, Seq("id", "s"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(p("id").getAs[Long]("n") === 3L)
    assert(p("id").getAs[Long]("n_null") === 0L)
    assert(p("id").getAs[Long]("n_distinct") === 2L)
    assert(p("id").getAs[String]("min_s") === "1" && p("id").getAs[String]("max_s") === "2")
    assert(p("s").getAs[Long]("n_null") === 1L)
    assert(p("s").getAs[Long]("n_distinct") === 2L)
    assert(p("s").getAs[Long]("sum_len") === 3L) // "bb" + "a"; null contributes 0
    // one scan: a single pair of aggregate exchanges, no join, no window
    val plan = Validation.columnProfile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
  }

  test("expect: null predicate counts as violation; counts are exact") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y"), (50L, null))
      .toDF("v", "t")
    val out = Validation
      .expect(
        df,
        Seq(
          "v_small" -> (col("v") < 10L), // null v and 50 violate -> 2
          "t_nonnull" -> col("t").isNotNull)) // one null t -> 1
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("violations"), r.getAs[Boolean]("ok")))
      .toMap
    assert(out("v_small") === ((2L, false)))
    assert(out("t_nonnull") === ((1L, false)))
  }

  test("expectForeignKey: counts missing and NULL keys as orphans") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq[java.lang.Long](1L, 1L, 3L, null).toDF("fk")
    val r = Validation.expectForeignKey(child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_orphans") === 2L) // 3 and null
    assert(r.getAs[Boolean]("ok") === false)
    val clean = Validation
      .expectForeignKey(Seq(1L, 2L).toDF("fk"), "fk", parent, "pk")
      .head()
    assert(clean.getAs[Long]("n_orphans") === 0L && clean.getAs[Boolean]("ok"))
  }

  test("schemaDiff: added, removed, and retyped columns; identical schemas are silent") {
    val from = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
    val to = Seq((1L, 1, true)).toDF("id", "score", "flag") // name gone, score retyped
    val out = Validation
      .schemaDiff(from, to)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    assert(out("flag") === (("added", null, "BOOLEAN")))
    assert(out("name") === (("removed", "STRING", null)))
    assert(out("score") === (("type_changed", "DOUBLE", "INT")))
    assert(!out.contains("id")) // unchanged column stays silent
    assert(Validation.schemaDiff(from, from).isEmpty)
  }
}

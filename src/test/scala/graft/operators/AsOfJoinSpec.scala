package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, label); right: (key, ts, rate)
  private def left = Seq(
    ("a", 5L, "a5"),
    ("a", 10L, "a10"),
    ("a", 2L, "a2"),
    ("b", 7L, "b7"),
    ("c", 1L, "c1") // key with no right rows at all
  ).toDF("k", "lts", "label")

  private def right = Seq(
    ("a", 3L, 30.0),
    ("a", 10L, 100.0), // equal-ts: must match a10 inclusively
    ("a", 11L, 110.0), // later than every left row — must never match
    ("b", 9L, 90.0) // after b7 — b7 must get NULL
  ).toDF("k", "rts", "rate")

  private def result: Map[String, (Option[Double], Option[Long])] =
    AsOfJoin
      .asOfBackward(left, right, Seq("k"), "lts", "rts")
      .collect()
      .map { r =>
        r.getAs[String]("label") ->
          ((Option(r.getAs[Any]("rate")).map(_.asInstanceOf[Double]),
            Option(r.getAs[Any]("asof_ts")).map(_.asInstanceOf[Long])))
      }
      .toMap

  test("backward as-of: latest right at-or-before each left row, per key") {
    assert(result("a5") === ((Some(30.0), Some(3L)))) // 3 <= 5 < 10
    assert(result("a10") === ((Some(100.0), Some(10L)))) // inclusive equal-ts match
    assert(result("a2") === ((None, None))) // earliest right is 3 > 2
  }

  test("backward as-of: left-outer semantics for unmatched rows and keys") {
    assert(result("b7") === ((None, None))) // only right for b is later
    assert(result("c1") === ((None, None))) // key absent from right
    assert(result.size === 5) // every left row survives exactly once
  }

  test("backward as-of: rejects colliding non-key column names") {
    val clash = right.withColumnRenamed("rate", "label")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOfBackward(left, clash, Seq("k"), "lts", "rts")
    }
  }
}

package graft.operators

import graft.SparkSpec

class HistorySpec extends SparkSpec {
  import spark.implicits._

  test("scd2: unchanged / changed / added / removed all get correct intervals") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "x"), (4L, "d")).toDF("k", "v")
    val out = History
      .scd2(v1, v2, "2024-01-01", "2024-02-01")
      .collect()
      .map(r =>
        (
          r.getLong(0),
          r.getString(1),
          r.getDate(2).toString,
          Option(r.getDate(3)).map(_.toString).orNull,
          r.getBoolean(4)))
      .toSet
    assert(
      out === Set(
        (1L, "a", "2024-01-01", null, true), // unchanged: one open interval
        (2L, "b", "2024-01-01", "2024-02-01", false), // changed: old closed...
        (2L, "x", "2024-02-01", null, true), // ...new open
        (3L, "c", "2024-01-01", "2024-02-01", false), // removed: closed only
        (4L, "d", "2024-02-01", null, true) // added: open only
      ))
  }

  test("scd2: exactly one current row per surviving key, none for removed keys") {
    val v1 = Seq((1L, "a"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "z"), (2L, "b")).toDF("k", "v")
    val hist = History.scd2(v1, v2, "2024-01-01", "2024-02-01")
    val current = hist.filter("is_current").collect().map(_.getLong(0)).sorted
    assert(current.toSeq === Seq(1L, 2L))
    assert(hist.filter("valid_to IS NOT NULL AND is_current").count() === 0L)
  }
}

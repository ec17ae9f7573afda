package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacyAndSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ---- kAnonymity --------------------------------------------------------

  test("kAnonymity: class sizes, violation counts, and the k gate") {
    // classes: (a,1)×3, (a,2)×1, (b,1)×2 → with k=2: one violating class
    // of size 1, so 1 row at risk and the gate fails.
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),
      ("a", 2),
      ("b", 1), ("b", 1)).toDF("q1", "q2")
    val r = Privacy.kAnonymity(df, Seq("q1", "q2"), 2L).collect().head
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("n_classes") === 3L)
    assert(r.getAs[Long]("min_class_size") === 1L)
    assert(r.getAs[Long]("n_violating_classes") === 1L)
    assert(r.getAs[Long]("rows_at_risk") === 1L)
    assert(r.getAs[Boolean]("k_ok") === false)
  }

  test("kAnonymity: passes when every class reaches k; nulls form a class") {
    val df = Seq(
      (Some("a"), 1), (Some("a"), 1),
      (None, 1), (None, 1), (None, 1)).toDF("q1", "q2")
    val r = Privacy.kAnonymity(df, Seq("q1", "q2"), 2L).collect().head
    assert(r.getAs[Long]("n_classes") === 2L) // null-quasi rows group together
    assert(r.getAs[Long]("min_class_size") === 2L)
    assert(r.getAs[Boolean]("k_ok") === true)
    assert(r.getAs[Long]("rows_at_risk") === 0L)
  }

  // ---- pseudonymization --------------------------------------------------

  test("pseudonymMap: deterministic keyed md5, injective over the population") {
    val df = Seq(1L, 2L, 2L, 3L).toDF("id")
    val m = Privacy.pseudonymMap(df, "id", "pep").orderBy("id").collect()
    assert(m.length === 3) // distinct ids
    // surrogate is md5("pep:" || id) — fixed forever, cross-engine
    val expected = java.security.MessageDigest
      .getInstance("MD5")
      .digest("pep:1".getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    assert(m.head.getString(1) === expected)
    assert(m.map(_.getString(1)).distinct.length === 3) // injective here
    // re-run yields the identical mapping (determinism contract)
    val again = Privacy.pseudonymMap(df, "id", "pep").orderBy("id").collect()
    assert(m.map(_.getString(1)).toSeq === again.map(_.getString(1)).toSeq)
    // a different pepper yields a disjoint surrogate space
    val other = Privacy.pseudonymMap(df, "id", "pep2").collect().map(_.getString(1)).toSet
    assert(m.map(_.getString(1)).toSet.intersect(other).isEmpty)
  }

  // ---- localClusteringCoefficient ----------------------------------------

  test("lcc: triangle corners score 1.0, the bridge scores 1/3, degree-1 excluded") {
    // K3 on {1,2,3} plus pendant edge (3,4): nodes 1,2 have deg 2 and sit in
    // 1 triangle → lcc = 2·1/(2·1) = 1.0; node 3 has deg 3, 1 triangle →
    // 2/6 = 1/3; node 4 has deg 1 → excluded (lcc undefined).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Analytics
      .localClusteringCoefficient(edges, 10)
      .collect()
      .map(r => r.getAs[Long]("node") -> ((r.getAs[Long]("degree"), r.getAs[Long]("t"), r.getAs[Double]("lcc"))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((2L, 1L, 1.0)))
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L)._1 === 3L)
    assert(math.abs(out(3L)._3 - 1.0 / 3.0) < 1e-12)
  }

  test("lcc: triangle-free graph scores zero everywhere eligible") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Analytics.localClusteringCoefficient(path, 10).collect()
    assert(out.length === 2) // nodes 2 and 3 (deg 2); endpoints excluded
    out.foreach { r =>
      assert(r.getAs[Long]("t") === 0L)
      assert(r.getAs[Double]("lcc") === 0.0)
    }
  }

  // ---- dailyAutocorrelation ----------------------------------------------

  private def evts(tpe: String, dayCounts: Seq[Int]) =
    dayCounts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => (tpe, f"2024-01-${d + 1}%02d 12:${i % 60}%02d:00"))
    }

  test("dailyAutocorrelation: perfectly alternating series has lag-1 r = -1") {
    // daily counts 1,2,1,2,1,2: every lag-1 pair is (1,2) or (2,1) → r = -1
    // exactly (the exact-integer-sums formula hits the closed form).
    val df = evts("a", Seq(1, 2, 1, 2, 1, 2))
      .toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val rows = Analytics
      .dailyAutocorrelation(df, Seq(1))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_pairs") === 5L)
    assert(rows.head.getAs[Double]("r") === -1.0)
  }

  test("dailyAutocorrelation: zero variance or too few pairs yields NULL r") {
    // constant series: variance 0 → NULL; lag beyond the series: no pairs →
    // the (type, lag) row vanishes (nothing to aggregate).
    val df = evts("c", Seq(2, 2, 2))
      .toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val out = Analytics.dailyAutocorrelation(df, Seq(1, 7)).collect()
    assert(out.length === 1) // lag-7 row absent: zero pairs
    assert(out.head.getAs[Int]("lag_k") === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("r")))
  }

  // ---- cusumChangepoint --------------------------------------------------

  test("cusumChangepoint: level shift peaks the CUSUM at the last low day") {
    // counts 1,1,3,3 → D=4, N=8; scaled deviations 4n−8: −4,−4,+4,+4;
    // running: −4,−8,−4,0 → peak |s| = 8 on day 2; rel = 8/8 = 1.0.
    val df = evts("a", Seq(1, 1, 3, 3))
      .toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val r = Analytics.cusumChangepoint(df).collect().head
    assert(r.getAs[java.sql.Date]("cp_day").toString === "2024-01-02")
    assert(r.getAs[Double]("cusum_abs") === 8.0)
    assert(r.getAs[Double]("cusum_rel") === 1.0)
  }

  test("cusumChangepoint: flat series peaks at zero with earliest-day tie-break") {
    val df = evts("b", Seq(2, 2, 2))
      .toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val r = Analytics.cusumChangepoint(df).collect().head
    assert(r.getAs[Double]("cusum_abs") === 0.0)
    assert(r.getAs[java.sql.Date]("cp_day").toString === "2024-01-01")
  }

  // ---- fleschScore -------------------------------------------------------

  test("fleschScore: hand-computed value and degenerate-text guards") {
    import graft.functions.TextFunctions.fleschScore
    // "Hello world." → words 2, sentences 1, vowel groups: e,o | o → 3
    // score = 206.835 − 1.015·(2/1) − 84.6·(3/2) = 77.905
    val out = Seq("Hello world.", "", "bcd")
      .toDF("text")
      .select(col("text"), fleschScore(col("text")).as("f"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(out("Hello world.") - 77.905) < 1e-9)
    // empty text: all counts 0 → guards give 206.835 − 1.015·1 − 0
    assert(math.abs(out("") - (206.835 - 1.015)) < 1e-9)
    // vowel-free word (y counts as a vowel): 1 word, 0 sentences, 0 syllables
    assert(math.abs(out("bcd") - (206.835 - 1.015)) < 1e-9)
  }

  // ---- invertedIndex -----------------------------------------------------

  test("invertedIndex: exact df for all terms; postings only under the cap") {
    val docs = Seq(
      (1L, "x y common"),
      (2L, "x common"),
      (3L, "common common")).toDF("doc_id", "text")
    val out = TextIndex
      .invertedIndex(docs, postingCap = 2, k = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("df"), Option(r.getString(2)))))
      .toMap
    assert(out("common") === ((3L, None))) // df over cap → posting withheld
    assert(out("x") === ((2L, Some("1,2")))) // sorted, comma-joined
    assert(out("y") === ((1L, Some("1"))))
  }
}

package graft.operators

import graft.SparkSpec

class SequenceAndMatchSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, ts, event_id, event_type) — user 1: A B A B; user 2: A A C
  private def events = Seq(
    (1L, 10L, 100L, "A"),
    (1L, 20L, 101L, "B"),
    (1L, 30L, 102L, "A"),
    (1L, 40L, 103L, "B"),
    (2L, 10L, 200L, "A"),
    (2L, 20L, 201L, "A"),
    (2L, 30L, 202L, "C")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("eventTransitions: counts per (prev, next), conditional p sums to 1 per prev") {
    val out = Analytics
      .eventTransitions(events)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      ("A", "A") -> ((1L, 0.25)),
      ("A", "B") -> ((2L, 0.5)),
      ("A", "C") -> ((1L, 0.25)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("eventTransitions: ts ties broken by event_id, so counts are rerun-stable") {
    // two events at ts=10 for one user: order pinned by event_id -> X then Y
    val tied = Seq(
      (1L, 10L, 1L, "X"),
      (1L, 10L, 2L, "Y"),
      (1L, 20L, 3L, "Z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics
      .eventTransitions(tied)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(out === Set(("X", "Y"), ("Y", "Z")))
  }

  test("eventTrigrams: deterministic (n desc, path) cut at k") {
    // trigrams: (A,B,A), (B,A,B) from user 1; (A,A,C) from user 2 — all n=1
    val top2 = Analytics
      .eventTrigrams(events, 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(top2.toSeq === Seq(("A", "A", "C", 1L), ("A", "B", "A", 1L)))
    assert(Analytics.eventTrigrams(events, 10).count() === 3)
  }

  test("fuzzyPairs: within-block pairs under the edit cap; no cross-block pairs") {
    val recs = Seq(
      (1L, "alpha", "X"),
      (2L, "alphb", "X"), // 1 substitution from alpha
      (3L, "alphaz", "X"), // 1 insertion from alpha, 2 edits from alphb
      (4L, "beta", "X"),
      (5L, "alpha", "Y") // identical name, different block -> never paired
    ).toDF("id", "name", "blk")
    val out = EntityResolution
      .fuzzyPairs(recs, "id", "name", "blk", 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSet
    assert(out === Set((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("fuzzyPairs: maxDist 2 admits the alphb~alphaz pair") {
    val recs = Seq(
      (1L, "alpha", "X"),
      (2L, "alphb", "X"),
      (3L, "alphaz", "X")
    ).toDF("id", "name", "blk")
    val out = EntityResolution
      .fuzzyPairs(recs, "id", "name", "blk", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSet
    assert(out === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("fuzzyPairs: deletion-neighborhood path equals the quadratic on adversarial inputs") {
    // Transposition ("ab"/"ba"), repeated chars ("aa"/"a"), empty string,
    // equal strings, and a distance-2 pair — the deletion join must admit
    // candidates for all and let the kernel keep exactly lev <= 1.
    val recs = Seq(
      (1L, "ab", "X"),
      (2L, "ba", "X"), // shares deletion variants with ab, lev = 2 -> killed
      (3L, "aa", "X"),
      (4L, "a", "X"),
      (5L, "", "X"),
      (6L, "ab", "X"), // exact duplicate of 1
      (7L, "xyz", "X")
    ).toDF("id", "name", "blk")
    val fast = EntityResolution
      .fuzzyPairs(recs, "id", "name", "blk", 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSet
    // ground truth via the quadratic path's semantics
    val names = Map(1L -> "ab", 2L -> "ba", 3L -> "aa", 4L -> "a", 5L -> "", 6L -> "ab", 7L -> "xyz")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for {
      x <- names.keys; y <- names.keys if x < y
      dd = lev(names(x), names(y)) if dd <= 1
    } yield (x, y, dd.toLong)).toSet
    assert(fast === truth)
  }

  test("mergeEntities: transitive chain is one entity; longest-name golden record; ties to min id") {
    val recs = Seq(
      (1L, "alpha", "X"),
      (2L, "alphb", "X"), // 1 edit from alpha
      (3L, "alphbz", "X"), // 1 edit from alphb, 2 from alpha -> chain merges all three
      (4L, "omega", "X"), // singleton
      (5L, "beta1", "Y"),
      (6L, "beta2", "Y") // same length as beta1 -> tie, min id 5 wins
    ).toDF("id", "name", "blk")
    val out = EntityResolution
      .mergeEntities(recs, "id", "name", "blk")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out === Map(
      1L -> ((3L, 3L, "alphbz")),
      4L -> ((1L, 4L, "omega")),
      5L -> ((2L, 5L, "beta1"))))
  }

  test("reservoirPerGroup: exactly k per big group in fibhash order; small group kept whole") {
    val df = ((1L to 5L).map(i => (i, "g1")) ++ Seq((10L, "g2"), (11L, "g2")))
      .toDF("id", "grp")
    val kept = Curation
      .reservoirPerGroup(df, "grp", "id", 3)
      .collect()
      .map(r => (r.getString(1), r.getLong(0)))
    // g1 fibhash order: 5 (387276917) < 2 (1013904226) < 4 (2027808452)
    //                   < 1 (2654435761) < 3 (3668339987)
    assert(kept.filter(_._1 == "g1").map(_._2).toSet === Set(5L, 2L, 4L))
    assert(kept.filter(_._1 == "g2").map(_._2).toSet === Set(10L, 11L))
  }

  test("reservoirPerGroup: pick is independent of other strata") {
    val base = (1L to 5L).map(i => (i, "g1")).toDF("id", "grp")
    val withNoise = ((1L to 5L).map(i => (i, "g1")) ++ (100L to 120L).map(i => (i, "gz")))
      .toDF("id", "grp")
    def pick(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Curation
        .reservoirPerGroup(df, "grp", "id", 3)
        .filter($"grp" === "g1")
        .collect()
        .map(_.getLong(0))
        .toSet
    assert(pick(base) === pick(withNoise))
  }

  test("sourceOverlap: intersection and Jaccard over distinct per-source vocabularies") {
    val docs = Seq(
      (0L, "apple banana apple cherry", "src0"),
      (1L, "banana banana date", "src0"),
      (2L, "apple elderberry", "src1"),
      (3L, "", "src1")
    ).toDF("doc_id", "text", "source")
    val out = TextIndex.sourceOverlap(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "src0" && r.getString(1) === "src1")
    // src0 vocab {apple,banana,cherry,date}=4, src1 {apple,elderberry}=2, inter {apple}=1
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((4L, 2L, 1L)))
    assert(r.getDouble(5) === 1.0 / 5.0)
  }

  test("sourceOverlap: disjoint vocabularies yield jaccard 0") {
    val docs = Seq(
      (0L, "aa bb", "s0"),
      (1L, "cc dd", "s1")
    ).toDF("doc_id", "text", "source")
    val out = TextIndex.sourceOverlap(docs).collect()
    // inner join on tok: disjoint vocabularies produce NO pair row at all
    assert(out.isEmpty)
  }

  test("ngramContainmentPairs: whole-document quote scores 1.0 where Jaccard is diluted") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda mu nu xi"), // base quoted whole + new suffix
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, 0.9).collect()
    assert(out.length === 1)
    val r = out.head
    // doc1: 10 tokens -> 8 shingles, all present in doc2 (14 tokens -> 12)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((8L, 8L, 12L)))
    assert(r.getDouble(5) === 1.0)
    // the Jaccard variant at the same cut misses this pair: 8/12 ≈ 0.67
    assert(Dedup.ngramJaccardPairs(docs, 0.9).count() === 0)
  }

  test("pmiTerms: over-represented token per source ranks first; pmi exact") {
    val docs = Seq(
      (0L, "aa aa aa bb", "s0"),
      (1L, "bb cc cc cc", "s1")
    ).toDF("doc_id", "text", "source")
    val out = TextIndex
      .pmiTerms(docs, 1, minCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getDouble(4)))
      .toSet
    // pmi(s0, aa) = (3·8)/(4·3) = 2.0; pmi(s1, cc) = (3·8)/(4·3) = 2.0
    assert(out === Set(("s0", "aa", 2.0), ("s1", "cc", 2.0)))
  }

  test("rollingDistinctUsers: trailing window unions users; spine clips unobserved days") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "x", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "x", 0.0, "{}"), // same user+day -> one user-day
      (3L, ts("2024-01-01 12:00:00"), 2L, "x", 0.0, "{}"),
      (4L, ts("2024-01-03 09:00:00"), 1L, "x", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Analytics
      .rollingDistinctUsers(events, 2)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    // 2024-01-02 gets window users {1,2} but is not an observed day -> clipped
    assert(out === Set(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 1L)))
  }
}

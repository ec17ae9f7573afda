package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphAndDriftSpec extends SparkSpec {
  import spark.implicits._

  // ---- distributionDrift -------------------------------------------------

  test("distributionDrift: hand-computed TVD and chi2 on a two-bucket fixture") {
    // width 10, 2 buckets; group a all in bucket 0, group b all in bucket 1.
    // Smoothed: ps(a) = (0.8, 0.2), pooled pr = (0.5, 0.5)
    // tvd = (0.3 + 0.3) / 2 = 0.3; chi2 = 0.09/0.5 * 2 = 0.36 — symmetric.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 11L), ("b", 12L), ("b", 13L))
      .toDF("g0", "v")
    val out = Analytics
      .distributionDrift(df, "g0", "v", 10L, 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    for (g <- Seq("a", "b")) {
      val (n, tvd, chi2) = out(g)
      assert(n === 3L)
      assert(math.abs(tvd - 0.3) < 1e-9, s"$g tvd=$tvd")
      assert(math.abs(chi2 - 0.36) < 1e-9, s"$g chi2=$chi2")
    }
  }

  test("distributionDrift: identical group distributions drift zero") {
    val df = Seq(("a", 5L), ("a", 15L), ("b", 5L), ("b", 15L)).toDF("g0", "v")
    val out = Analytics.distributionDrift(df, "g0", "v", 10L, 2).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getDouble(2) === 0.0)
      assert(r.getDouble(3) === 0.0)
    }
  }

  test("distributionDrift: values beyond the grid clamp into the last bucket") {
    // 9999 lands in the same (last) bucket as 25, so group a's histogram is
    // identical to group b's and both drift identically vs the pool.
    val df = Seq(("a", 5L), ("a", 9999L), ("b", 5L), ("b", 25L)).toDF("g0", "v")
    val out = Analytics
      .distributionDrift(df, "g0", "v", 10L, 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out("a") === out("b"))
  }

  test("ksDistance: hand-computed sup-norm on overlapping samples; identical samples read 0") {
    // A = {1,2,3}, B = {3,4,5}: the CDF gap peaks at 2/3 (thresholds 2 and
    // 3) → ks_num = max|fa·nb − fb·na| = 6 over na·nb = 9.
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0)).toDF("g", "value")
    val r = Analytics.ksDistance(df, "g", "value", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("ks_num") === 6L)
    assert(math.abs(r.getAs[Double]("ks") - 2.0 / 3.0) < 1e-15)

    val same = Seq(("a", 1.0), ("a", 2.5), ("b", 1.0), ("b", 2.5)).toDF("g", "value")
    val r2 = Analytics.ksDistance(same, "g", "value", "a", "b").collect().head
    assert(r2.getAs[Long]("ks_num") === 0L)
    assert(r2.getAs[Double]("ks") === 0.0)
  }

  test("weightedPercentiles: heavy weight drags the median where row-count cannot") {
    // values 1..4, weight 97 on value 4 and 1 elsewhere: row median is
    // 2-ish, but 97% of the WEIGHT sits at 4 → every weighted percentile
    // reads 4 except none below.
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 97L)).toDF("v", "w")
    val r = Analytics.weightedPercentiles(df, "v", "w").collect().head
    assert(r.getAs[Long]("tot_weight") === 100L)
    assert(r.getAs[Long]("p50") === 4L)
    assert(r.getAs[Long]("p90") === 4L)
    assert(r.getAs[Long]("p99") === 4L)
    // uniform weights reduce to the plain percentile
    val u = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("v", "w")
    val ru = Analytics.weightedPercentiles(u, "v", "w").collect().head
    assert(ru.getAs[Long]("p50") === 2L)
    assert(ru.getAs[Long]("p99") === 4L)
  }

  test("effectSize: separated samples give AUC 1 and positive d; ties land AUC at 0.5") {
    // a = {3, 4}, b = {1, 2}: every a beats every b → AUC 1, d > 0.
    val sep = Seq(("a", 3.0), ("a", 4.0), ("b", 1.0), ("b", 2.0)).toDF("g", "value")
    val r = Analytics.effectSize(sep, "g", "value", "a", "b").collect().head
    assert(r.getAs[Double]("auc") === 1.0)
    assert(r.getAs[Double]("cohens_d") > 0.0)
    assert(math.abs(r.getAs[Double]("mean_a") - 3.5) < 1e-9)
    // identical samples: every comparison a tie → AUC exactly 0.5, d = 0
    val same = Seq(("a", 2.0), ("a", 5.0), ("b", 2.0), ("b", 5.0)).toDF("g", "value")
    val r2 = Analytics.effectSize(same, "g", "value", "a", "b").collect().head
    assert(r2.getAs[Double]("auc") === 0.5)
    assert(r2.getAs[Double]("cohens_d") === 0.0)
  }

  test("chiSquareIndependence: a perfectly dependent table maxes V at 1; independent reads 0") {
    // dependent: a determines b exactly → chi2 = N·min(r−1, c−1), V = 1
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val rd = Analytics.chiSquareIndependence(dep, "a", "b").collect().head
    assert(rd.getAs[Long]("n_cells") === 4L)
    assert(rd.getAs[Long]("dof") === 1L)
    assert(math.abs(rd.getAs[Double]("chi2") - 4.0) < 1e-6)
    assert(math.abs(rd.getAs[Double]("cramers_v") - 1.0) < 1e-6)
    // independent: uniform product table → chi2 exactly 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val ri = Analytics.chiSquareIndependence(ind, "a", "b").collect().head
    assert(ri.getAs[Double]("chi2") === 0.0)
    assert(ri.getAs[Double]("cramers_v") === 0.0)
  }

  test("driftTimeline: hand-computed per-day drift from histogram cells") {
    // day1 all mass in bin 0, day2 all in bin 1; smoothed ps=(0.75,0.25)
    // vs pooled pr=(0.5,0.5): tvd=0.25, chi2=0.125/0.5*2=0.25 — symmetric.
    val hists = Seq(("d1", 0L, 2L), ("d2", 1L, 2L)).toDF("day", "bin", "cnt")
    val out = Analytics
      .driftTimeline(hists)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    for (d <- Seq("d1", "d2")) {
      val (n, tvd, chi2) = out(d)
      assert(n === 2L)
      assert(math.abs(tvd - 0.25) < 1e-9, s"$d tvd=$tvd")
      assert(math.abs(chi2 - 0.25) < 1e-9, s"$d chi2=$chi2")
    }
  }

  // ---- userRateAnomaly ---------------------------------------------------

  private def dayEvents(user: Long, day: String, n: Int, idBase: Long) =
    (0 until n).map(i => (idBase + i, s"$day 12:00:00", user, "e", 1.0))

  test("userRateAnomaly: a burst day beyond 2 sigma is flagged; quiet days are not") {
    // user 1: five 1-event days then a 10-event day.
    // n=6, s=15, ss=105, var=(6*105-225)/30=13.5, mean=2.5,
    // z(10) = 7.5/sqrt(13.5) = 2.0412... > 2 -> flagged; z(1) = -0.408.
    val rows =
      (1 to 5).flatMap(d => dayEvents(1L, f"2024-01-0$d", 1, d * 100L)) ++
        dayEvents(1L, "2024-01-06", 10, 600L)
    val df = rows
      .toDF("event_id", "ts0", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts0")))
    val out = Analytics.userRateAnomaly(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L)
    assert(r.getDate(1).toString === "2024-01-06")
    assert(r.getLong(2) === 10L)
    assert(math.abs(r.getDouble(3) - 7.5 / math.sqrt(13.5)) < 1e-6)
  }

  test("userRateAnomaly: constant-rate and short-history users are excluded") {
    val rows =
      // user 2: constant 5/day over 4 days -> zero variance, excluded
      (1 to 4).flatMap(d => dayEvents(2L, f"2024-01-0$d", 5, 2000L + d * 10L)) ++
        // user 3: two wildly different days, but nd < 3 -> excluded
        (dayEvents(3L, "2024-01-01", 1, 3000L) ++ dayEvents(3L, "2024-01-02", 50, 3100L))
    val df = rows
      .toDF("event_id", "ts0", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts0")))
    assert(Analytics.userRateAnomaly(df).count() === 0)
  }

  // ---- coOrderEdges / triangleStats --------------------------------------

  test("coOrderEdges: distinct sorted pairs per order, join-free") {
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 20L), (2L, 30L), (3L, 40L), (1L, 10L))
      .toDF("l_orderkey", "l_partkey")
    val edges = Analytics
      .coOrderEdges(li)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(edges === Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("triangleStats: one triangle, gcc 1.0") {
    val edges = Seq((10L, 20L), (10L, 30L), (20L, 30L)).toDF("a", "b")
    val r = Analytics.triangleStats(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 1L)))
    assert(r.getDouble(3) === 1.0)
  }

  test("triangleStats: open path has no triangles") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Analytics.triangleStats(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 0L)))
    assert(r.getDouble(3) === 0.0)
  }

  test("triangleStats: degree-oriented count equals brute force on a planted graph") {
    // Deterministic pseudo-random graph on 20 nodes.
    val es = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L
      if (a * 31 + b * 17) % 5 == 0
    } yield (a, b)).toSeq
    val esSet = es.toSet
    val brute = (for {
      (a, b) <- es; c <- (b + 1) to 20L
      if esSet.contains((a, c)) && esSet.contains((b, c))
    } yield 1).size.toLong
    val r = Analytics.triangleStats(es.toDF("a", "b")).collect().head
    assert(r.getLong(2) === brute)
    assert(r.getLong(0) === es.size.toLong)
  }

  test("kCore: triangle survives 2-core, pendant chain peels in order") {
    // triangle 1-2-3 plus chain 3-4-5: node 5 peels round 1, node 4 round 2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Analytics
      .kCore(edges, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) === ((0L, true)))
    assert(out(2L) === ((0L, true)))
    assert(out(3L) === ((0L, true)))
    assert(out(4L) === ((2L, false)))
    assert(out(5L) === ((1L, false)))
  }

  test("kCore: star graph has an empty 2-core; every node is assigned a round") {
    val edges = (2L to 6L).map(i => (1L, i)).toDF("a", "b")
    val out = Analytics.kCore(edges, 2).collect()
    assert(out.length === 6)
    assert(out.forall(r => !r.getBoolean(2)))
  }

  test("kCore: matches brute-force peeling on a planted graph") {
    val es = (for {
      a <- 1L to 15L; b <- (a + 1) to 15L
      if (a * 13 + b * 7) % 3 == 0
    } yield (a, b)).toSeq
    // brute force: iteratively delete < k nodes
    def brute(k: Int): Set[Long] = {
      var nodes = es.flatMap(e => Seq(e._1, e._2)).toSet
      var changed = true
      while (changed) {
        val deg = nodes.map(n =>
          n -> es.count { case (a, b) =>
            (a == n && nodes(b)) || (b == n && nodes(a))
          }).toMap
        val drop = nodes.filter(deg(_) < k)
        changed = drop.nonEmpty
        nodes = nodes -- drop
      }
      nodes
    }
    for (k <- Seq(2, 4, 6)) {
      val core = Analytics
        .kCore(es.toDF("a", "b"), k)
        .filter($"core")
        .collect()
        .map(_.getLong(0))
        .toSet
      assert(core === brute(k), s"k=$k")
    }
  }

  test("labelPropagation: two cliques joined by a bridge resolve to two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    val cl = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val out = Analytics
      .labelPropagation(cl.toDF("a", "b"), 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // min-label ties pull each clique to its smallest member's label
    assert(out(1L) === out(2L))
    assert(out(10L) === out(11L) && out(11L) === out(12L))
    assert(out.values.toSet.size <= 2)
  }

  test("personalizedPageRank: matches a scalar replay of the integer recurrence; " +
    "disconnected component stays exactly zero") {
    // a–b–c chain (symmetrized) + disconnected d–e pair; seed {a}.
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("d", "e"), ("e", "d")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val out = Analytics.personalizedPageRank(edges, seeds, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // scalar replay of the exact contract
    val adjIn = Map("a" -> Seq("b"), "b" -> Seq("a", "c"), "c" -> Seq("b"),
      "d" -> Seq("e"), "e" -> Seq("d"))
    val deg = Map("a" -> 1L, "b" -> 2L, "c" -> 1L, "d" -> 1L, "e" -> 1L)
    val t = Map("a" -> 150000L).withDefaultValue(0L)
    var pr = Map("a" -> 1000000L).withDefaultValue(0L)
    for (_ <- 1 to 5)
      pr = deg.keys.map { v =>
        v -> (t(v) + adjIn(v).map(u => pr(u) / deg(u)).sum * 85L / 100L)
      }.toMap
    assert(out === pr.filter(_._2 > 0L))
    assert(!out.contains("d") && !out.contains("e")) // zero mass dropped
  }

  test("bfsDistances: chain distances from one seed; past-frontier nodes absent") {
    // chain 1-2-3-4-5, seed {1}, 3 rounds: node 5 is 4 hops away -> absent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Analytics
      .bfsDistances(edges, Seq(1L).toDF("node"), 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsDistances: matches brute-force BFS on a planted graph; multi-seed min wins") {
    val es = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L
      if (a * 17 + b * 5) % 7 == 0
    } yield (a, b)).toSeq
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var model = Map(3L -> 0L, 11L -> 0L)
    for (_ <- 1 to 3) {
      val relax = model.toSeq.flatMap { case (n, d) =>
        adj.getOrElse(n, Set.empty[Long]).map(_ -> (d + 1))
      }
      model = (model.toSeq ++ relax).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    }
    val out = Analytics
      .bfsDistances(es.toDF("a", "b"), Seq(3L, 11L).toDF("node"), 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out === model)
  }

  test("labelPropagation: deterministic across reruns and partitionings") {
    val es = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L
      if (a * 31 + b * 17) % 4 == 0
    } yield (a, b)).toSeq
    val r1 = Analytics.labelPropagation(es.toDF("a", "b"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = Analytics.labelPropagation(es.toDF("a", "b").repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 === r2)
  }

  test("associationRules: hand-computed support, confidence, lift; deterministic cut") {
    // baskets: o1{A,B,C} o2{A,B} o3{A,C} o4{B}; N=4, sup A=3 B=3 C=2
    // pairs >= 2: (A,B)=2, (A,C)=2
    // lift(A,C) = 2*4/(3*2) = 4/3 > lift(A,B) = 8/9
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 20L),
      (1L, 10L) // duplicate line within an order collapses
    ).toDF("l_orderkey", "l_partkey")
    val out = Analytics
      .associationRules(li, 2L, 10)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
    assert(out.map(_._1).toSeq === Seq((10L, 30L), (30L, 10L), (10L, 20L), (20L, 10L)))
    val m = out.toMap
    assert(m((10L, 30L)) === ((2L, 3L, 2L, 2.0 / 3, 4.0 / 3)))
    assert(m((30L, 10L)) === ((2L, 2L, 3L, 1.0, 4.0 / 3)))
    assert(m((10L, 20L)) === ((2L, 3L, 3L, 2.0 / 3, 8.0 / 9)))
  }

  // ---- skipgramPairs / bpeMergeCandidates --------------------------------

  test("skipgramPairs: +-2 ordered pairs with multiplicity") {
    val docs = Seq("a b c", "a a a").toDF("text")
    val out = TextIndex
      .skipgramPairs(docs, 2, 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // "a b c": (a,b) (a,c) (b,c); "a a a": (a,a) at d=1 twice + d=2 once
    assert(out === Map(("a", "a") -> 3L, ("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("skipgramPairs: deterministic top-k cut") {
    val docs = Seq("x y x y x y").toDF("text")
    // pairs: (x,y)x3 d1 + (y,x)x2 d1 + (x,x)x2 d2 + (y,y)x2 d2... compute via op
    val top1 = TextIndex.skipgramPairs(docs, 2, 1).collect()
    assert(top1.length === 1)
    assert((top1.head.getString(0), top1.head.getString(1)) === (("x", "y")))
  }

  test("bpeMergeCandidates: frequency-weighted bigrams over the distinct vocab") {
    val docs = Seq("ab ab cd", "aaa x").toDF("text")
    // words: ab(2), cd(1), aaa(1); x dropped (len 1)
    // pairs: ab -> 2; cd -> 1; aa -> 2 (two positions x wf 1)
    val out = TextIndex
      .bpeMergeCandidates(docs, 10)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(out === Map("ab" -> 2L, "cd" -> 1L, "aa" -> 2L))
  }
}

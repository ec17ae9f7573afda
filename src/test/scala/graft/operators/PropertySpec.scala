package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests from SURVEY §5.3: engine invariants over randomized inputs.
  * Uses ScalaCheck generators with fixed seeds (deterministic runs; no
  * scalatestplus bridge needed). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[A](g: Gen[A], n: Int = 15)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val meterGen = Gen.oneOf("0401_1", "0402_2", "0403_3")
  private val dayGen = Gen.choose(1, 28)
  private val readingGen = Gen.choose(0, 1000).map(_.toDouble)

  private val factsGen: Gen[List[(String, Int, Double)]] =
    Gen.listOfN(40, Gen.zip(meterGen, dayGen, readingGen)).map(_.distinctBy(t => (t._1, t._2)))

  private val dim = Seq(("0401_1", 2.0, "A"), ("0402_2", 1.0, "B"), ("0403_3", 3.0, "C"))

  private def factsDf(rows: List[(String, Int, Double)]) =
    rows
      .map { case (k, d, v) => (k, Date.valueOf(f"2024-01-$d%02d"), v) }
      .toDF("row_key", "rd_date", "bmz")

  private def dimDf = dim.toDF("row_key", "zhbl", "yhbh")

  test("W1: non-null rdl is always >= 0 and only where both adjacent readings exist") {
    forAllSamples(factsGen) { rows =>
      val out = MeterPipeline
        .dailyEnergy(factsDf(rows), dimDf)
        .filter(col("rdl").isNotNull)
        .collect()
      assert(out.forall(_.getAs[Double]("rdl") >= 0.0))
      val factDays = rows.map { case (k, d, _) => (k, f"2024-01-$d%02d") }.toSet
      assert(out.forall { r =>
        val k = r.getString(0)
        val d = r.getDate(1).toLocalDate
        factDays.contains((k, d.toString)) && factDays.contains((k, d.plusDays(1).toString))
      })
    }
  }

  test("W1: dense and sparse variants agree on non-null rows for random inputs") {
    forAllSamples(factsGen) { rows =>
      val dense = MeterPipeline
        .dailyEnergy(factsDf(rows), dimDf)
        .filter(col("rdl").isNotNull)
        .orderBy("row_key", "rd_date")
        .collect()
        .toSeq
      val sparse = MeterPipeline
        .dailyEnergySparse(factsDf(rows), dimDf)
        .orderBy("row_key", "rd_date")
        .collect()
        .toSeq
      assert(dense === sparse)
    }
  }

  test("A1/A2: fact-load keys unique; J1: output cldbs is a subset of the dimension") {
    val eventsGen = Gen.listOfN(
      30,
      Gen.zip(Gen.choose(1, 5), Gen.choose(5L, 12L), readingGen))
    forAllSamples(eventsGen) { rows =>
      val events = rows.zipWithIndex.map { case ((d, u, v), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-0$d%d 08:00:00"), u, "m", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val dimKv = Seq(("5", "0401_5"), ("6", "0401_6"), ("7", "0402_7")).toDF("cldbs", "row_key")
      val out = MeterPipeline.factLoad(events, dimKv).collect()
      val keys = out.map(r => (r.getAs[String]("row_key"), r.getAs[Date]("rd_date").toString))
      assert(keys.length === keys.distinct.length) // A1: one row per (meter, day)
      assert(out.forall(r => Set("5", "6", "7").contains(r.getAs[String]("cldbs")))) // J1 inner
    }
  }

  test("R1: pivot row count equals distinct meters of its input") {
    forAllSamples(factsGen, n = 8) { rows =>
      val wide = MeterPipeline.pivotExport(
        MeterPipeline.dailyEnergy(factsDf(rows), dimDf),
        dimDf)
      assert(wide.count() === rows.map(_._1).distinct.size)
    }
  }

  test("LSM resolve equals a sequential last-write-wins fold over the batches") {
    // model: apply batches in sequence order to a Map, None = tombstone;
    // engine: union all versions with their seq and resolve in one window
    val keyGen = Gen.oneOf("r1", "r2", "r3")
    val qualGen = Gen.oneOf("a", "b")
    val cellGen = Gen.zip(keyGen, qualGen, Gen.option(Gen.choose(0, 99).map(_.toString)))
    val batchesGen =
      Gen.listOfN(4, Gen.listOfN(6, cellGen).map(_.distinctBy(c => (c._1, c._2))))
    forAllSamples(batchesGen, n = 10) { batches =>
      val model = batches.zipWithIndex
        .foldLeft(Map.empty[(String, String), Option[String]]) { case (m, (batch, _)) =>
          batch.foldLeft(m) { case (acc, (rk, q, v)) => acc.updated((rk, q), v) }
        }
        .collect { case ((rk, q), Some(v)) => (rk, "cf", q, v) }
        .toSet
      val versions = batches.zipWithIndex.flatMap { case (batch, i) =>
        batch.map { case (rk, q, v) => (rk, "cf", q, v.orNull, (i + 1).toLong) }
      }.toDF("row_key", "family", "qualifier", "value", "seq")
      val resolved = graft.kv.LogStructuredTable
        .resolve(versions)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      assert(resolved === model)
    }
  }

  test("CMS: never undercounts and shard-merge equals whole-stream on random bags") {
    val bagGen = Gen.listOfN(120, Gen.oneOf((1 to 12).map(i => s"t$i")))
    forAllSamples(bagGen, n = 8) { toks =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "tok")
      val exact = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val single = FrequencySketch.build(df, "tok", 0.01, 0.99, 5)
      val merged = FrequencySketch.buildMerged(
        df.withColumn("shard", (col("id") % 3).cast("int")), "tok", "shard", 0.01, 0.99, 5)
      assert(single.totalCount() === toks.size.toLong)
      exact.foreach { case (t, c) =>
        assert(single.estimateCount(t) >= c, s"undercount for $t")
        assert(merged.estimateCount(t) === single.estimateCount(t), s"merge drift for $t")
      }
    }
  }

  test("tableChecksum: order/partition-insensitive, change-sensitive, duplicate-aware") {
    val rowGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 40L), Gen.alphaStr.map(_.take(6))))
    forAllSamples(rowGen, n = 8) { rows =>
      val df = rows.toDF("id", "s")
      val base = Analytics.tableChecksum(df, Seq("id", "s")).head()
      // permutation + different partitioning → identical checksums
      val shuffled = Analytics
        .tableChecksum(df.orderBy(col("s"), col("id")).repartition(7), Seq("id", "s"))
        .head()
      assert(base === shuffled)
      // flipping one row's value changes both combiners
      if (rows.nonEmpty) {
        val changed = Analytics
          .tableChecksum(
            rows.updated(0, (rows.head._1 + 1000L, rows.head._2)).toDF("id", "s"),
            Seq("id", "s"))
          .head()
        assert(changed.getAs[Long]("checksum_xor") !== base.getAs[Long]("checksum_xor"))
        assert(changed.getAs[Long]("checksum_sum") !== base.getAs[Long]("checksum_sum"))
      }
    }
    // XOR blind spot the scaladoc documents: doubling every row cancels in
    // XOR (back to the empty-table NULL-adjacent value domain) but the sum
    // combiner sees the multiplicity — together they certify the bag.
    val rows = Seq((1L, "a"), (2L, "b"))
    val once = Analytics.tableChecksum(rows.toDF("id", "s"), Seq("id", "s")).head()
    val twice = Analytics.tableChecksum((rows ++ rows).toDF("id", "s"), Seq("id", "s")).head()
    assert(twice.getAs[Long]("checksum_xor") === 0L)
    assert(twice.getAs[Long]("checksum_sum") !== once.getAs[Long]("checksum_sum"))
    assert(twice.getAs[Long]("n_rows") === 4L)
  }

  test("joinProfile: est_rows is the exact inner-join count on random key bags") {
    val bagGen = Gen.listOfN(30, Gen.option(Gen.choose(1L, 8L)))
    forAllSamples(Gen.zip(bagGen, bagGen), n = 10) { case (lKeys, rKeys) =>
      val l = lKeys.toDF("k")
      val r = rKeys.toDF("k")
      val p = Joins.joinProfile(l, r, "k").head()
      assert(p.getAs[Long]("est_rows") === l.join(r, Seq("k")).count())
      assert(p.getAs[Long]("n_left_keys") === lKeys.flatten.distinct.size.toLong)
      val maxL = lKeys.flatten.groupBy(identity).map(_._2.size).maxOption.getOrElse(0)
      assert(p.getAs[Long]("max_left_mult") === maxL.toLong)
    }
  }

  test("quantileOverRange brackets the true order statistic on random bags") {
    val bagGen = for {
      n <- Gen.choose(1, 400)
      vals <- Gen.listOfN(n, Gen.choose(0.0, 300.0))
      days <- Gen.listOfN(n, Gen.choose(1, 28))
    } yield vals.zip(days)
    forAllSamples(bagGen, n = 6) { bag =>
      val rows = bag.map { case (v, d) =>
        (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), v)
      }
      val hists = IncrementalRollup.dailyValueHistograms(rows.toDF("ts", "value"))
      val ps = Seq("0.1", "0.5", "0.95")
      val got = IncrementalRollup
        .quantileOverRange(hists, "2024-01-01", "2024-01-28", ps)
        .collect()
      assert(got.length === ps.length)
      val sorted = bag.map(_._1).sorted
      got.foreach { r =>
        val k = r.getAs[Long]("k").toInt
        val exact = sorted(k - 1)
        assert(
          exact >= r.getAs[Double]("lo") && exact < r.getAs[Double]("hi"),
          s"k=$k of n=${sorted.size}: $exact outside [${r.getAs[Double]("lo")}, ${r.getAs[Double]("hi")})")
        assert(r.getAs[Long]("n_range") === sorted.size.toLong)
      }
    }
  }

  test("attribution equals the brute-force pair model on random event streams") {
    val evGen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(
        n,
        for {
          u <- Gen.choose(1, 5)
          t <- Gen.oneOf("click", "purchase", "view")
          m <- Gen.choose(0, 10 * 60) // minutes across 10 hours
        } yield (u.toLong, t, m))
    } yield rows.zipWithIndex
    forAllSamples(evGen, n = 6) { rows =>
      val df = rows.map { case ((u, t, m), i) =>
        (i.toLong, new java.sql.Timestamp(1709280000000L + m * 60000L), u, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = graft.streaming.StreamJoin
        .attribution(df)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2)))
        .toSet
      val model = (for {
        ((cu, ct, cm), ci) <- rows if ct == "click"
        ((pu, pt, pm), pi) <- rows
        if pt == "purchase" && pu == cu && pm >= cm && pm <= cm + 120
      } yield (ci.toLong, pi.toLong)).toSet
      assert(got === model)
    }
  }

  test("winsorize equals a sequential clamp model on random bags") {
    val bagGen = for {
      n <- Gen.choose(3, 300)
      vals <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
    } yield vals
    forAllSamples(bagGen, n = 8) { vals =>
      val r = Analytics
        .winsorize(vals.map(("k", _)).toDF("event_type", "cents"), "event_type", "cents")
        .head()
      // model: same (n-1)p linear interpolation as Spark's percentile
      val sorted = vals.sorted
      def pct(p: Double): Double = {
        val pos = (sorted.size - 1) * p
        val lo = pos.toInt
        val g = pos - lo
        if (lo + 1 < sorted.size) sorted(lo) + (sorted(lo + 1) - sorted(lo)) * g
        else sorted(lo).toDouble
      }
      val (lo, hi) = (pct(0.05), pct(0.95))
      assert(math.abs(r.getAs[Double]("lo_cents") - lo) < 1e-6 * math.max(1.0, lo))
      assert(math.abs(r.getAs[Double]("hi_cents") - hi) < 1e-6 * math.max(1.0, hi))
      val clipLo = vals.count(_ < lo)
      val clipHi = vals.count(_ > hi)
      assert(r.getAs[Long]("n_clip_lo") === clipLo.toLong)
      assert(r.getAs[Long]("n_clip_hi") === clipHi.toLong)
      val model = vals.map(v => math.max(lo, math.min(hi, v.toDouble))).sum
      assert(math.abs(r.getAs[Double]("sum_after") - model) < 1e-6 * math.max(1.0, model))
      // the quantile definition bounds the clip populations
      assert(clipLo <= 0.05 * vals.size + 1 && clipHi <= 0.05 * vals.size + 1)
    }
  }

  test("madOutliers: a massive spike is flagged without dragging the gate (robustness)") {
    // 200 well-behaved cents + one 10^7 spike: the spike must be the ONLY
    // outlier — mean/stddev would be dragged by it, median/MAD are not
    val rows = (1 to 200).map(i => ("k", 1000L + (i % 50))) :+ (("k", 10000000L))
    val r = Analytics.madOutliers(rows.toDF("event_type", "cents"), "event_type", "cents").head()
    assert(r.getAs[Long]("n") === 201L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(math.abs(r.getAs[Double]("med_cents") - 1025.0) < 50.0) // unmoved by the spike
  }

  test("ewmaDaily equals a sequential integer fold on random day series") {
    val seriesGen = for {
      nDays <- Gen.choose(1, 20)
      vals <- Gen.listOfN(nDays, Gen.choose(0, 500000))
    } yield vals
    forAllSamples(seriesGen, n = 8) { vals =>
      val rows = vals.zipWithIndex.flatMap { case (total, i) =>
        // split each day's total across two events: the fold must see the
        // day SUM, not per-event values
        val ts = java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 12:00:00")
        Seq(("k", ts, total / 100.0 - 1.0), ("k", ts, 1.0))
      }
      val got = Analytics
        .ewmaDaily(rows.toDF("event_type", "ts", "value"))
        .head()
      val model = vals.foldLeft(0L)((acc, x) => (acc + x) / 2)
      assert(got.getAs[Long]("ewma_cents") === model)
      assert(got.getAs[Long]("n_days") === vals.size.toLong)
    }
  }

  test("exact-decimal corr/slope agree with Spark's streaming builtins to 1e-9") {
    // the q_corr_regr formulation trades Spark's order-dependent online
    // update for order-insensitive exact moment sums; both estimate the
    // same Pearson r / OLS slope, so they must agree to float tolerance
    val got = graft.SparkEntry.queries("q_corr_regr")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ref = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag")
      .agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        expr("regr_slope(l_extendedprice, l_quantity)").as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (c, s)) =>
      assert(math.abs(c - ref(k)._1) < 1e-9, s"corr($k)")
      assert(math.abs((s - ref(k)._2) / ref(k)._2) < 1e-9, s"slope($k)")
    }
  }

  test("pageRank equals a sequential integer power iteration on random symmetric graphs") {
    val edgeGen = for {
      n <- Gen.choose(3, 12)
      m <- Gen.choose(n, 4 * n)
      es <- Gen.listOfN(
        m,
        for {
          a <- Gen.choose(0, n - 1)
          b0 <- Gen.choose(0, n - 2) // shift past a: no self-loops, no filter retries
        } yield (a, if (b0 >= a) b0 + 1 else b0))
    } yield (es ++ es.map(_.swap)).distinct // symmetric: operator's no-dangling contract
    forAllSamples(edgeGen, n = 6) { es =>
      val got = Analytics
        .pageRank(es.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst"), iters = 3)
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      // sequential model with the identical BIGINT truncating arithmetic
      // (Scala Long `/` truncates like Spark `div` on non-negatives)
      val outMap = es.groupBy(_._1)
      val nodes = outMap.keySet
      var pr: Map[Int, Long] = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to 3) {
        val in = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
        for ((s, out) <- outMap; (_, d) <- out) in(d) += pr(s) / out.size
        pr = nodes.map(nd => nd -> (150000L + in(nd) * 85L / 100L)).toMap
      }
      assert(got === pr.map { case (k, v) => (s"n$k", v) })
    }
  }

  test("rrfFuse equals the brute-force fusion model on random rank lists") {
    // Two lanes per query: a random subset of a 30-id universe, ranked
    // 1..n by shuffle order. Invariants: per-query output ids unique,
    // ranks contiguous from 1, scores non-increasing, and every score is
    // exactly the 1/(60+r) lane sum of the brute model (ties by id).
    val laneGen = for {
      n <- Gen.choose(0, 12)
      ids <- Gen.pick(n, 0 until 30)
    } yield ids.toList.zipWithIndex.map { case (id, i) => (id.toLong, (i + 1).toLong) }
    val twoLanes = Gen.zip(laneGen, laneGen)
    forAllSamples(twoLanes, n = 8) { case (la, lb) =>
      val k = 5
      val a = la.map { case (id, r) => (0L, id, r) }.toDF("q_id", "id", "rank")
      val b = lb.map { case (id, r) => (0L, id, r) }.toDF("q_id", "id", "rank")
      val got = SimilaritySearch.rrfFuse(a, b, k)
        .orderBy("rank")
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"), r.getAs[Double]("score")))
      // brute model: union of ids, fixed two-term sum, sort by (-score, id)
      val ra = la.toMap
      val rb = lb.toMap
      val model = (ra.keySet ++ rb.keySet).toSeq
        .map { id =>
          val s = ra.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            rb.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (id, BigDecimal(s).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(k)
        .zipWithIndex
        .map { case ((id, s), i) => (id, (i + 1).toLong, s) }
      assert(got.toSeq === model)
    }
  }

  test("tombstone lifecycle invariants: live view == base minus deleted ids at any " +
    "delete set; delete idempotent; compact preserves the live view and empties the segment") {
    val corpusGen = Gen.listOfN(30, Gen.choose(0L, 19L)).map(_.distinct)
    val deleteGen = Gen.listOfN(12, Gen.choose(0L, 25L)).map(_.distinct)
    forAllSamples(Gen.zip(corpusGen, deleteGen), n = 8) { case (ids, dels) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-ts-prop").toString
      val base = ids.map(i => (i, i * 7)).toDF("vec_id", "payload")
      base.write.mode("overwrite").parquet(s"$dir/base")
      def live(): Set[Long] =
        Tombstones.drop(spark.read.parquet(s"$dir/base"), dir, "vec_id")
          .collect().map(_.getAs[Long]("vec_id")).toSet
      assert(live() === ids.toSet)
      if (dels.nonEmpty) {
        Tombstones.delete(dels.toDF("vec_id"), dir)
        // exact set semantics: ids never present delete to a no-op
        assert(live() === ids.toSet -- dels)
        // deleting the same ids again changes nothing (append-only segment,
        // distinct applied at read)
        Tombstones.delete(dels.toDF("vec_id"), dir)
        assert(live() === ids.toSet -- dels)
        // compact-style physical apply preserves the live view exactly
        val tmp = s"$dir/base2"
        Tombstones.drop(spark.read.parquet(s"$dir/base"), dir, "vec_id")
          .write.mode("overwrite").parquet(tmp)
        Tombstones.clear(spark, dir)
        val applied =
          try spark.read.parquet(tmp).collect().map(_.getAs[Long]("vec_id")).toSet
          catch { case _: org.apache.spark.sql.AnalysisException => Set.empty[Long] }
        assert(applied === ids.toSet -- dels)
        assert(Tombstones.read(spark, dir).isEmpty)
      }
    }
  }
}

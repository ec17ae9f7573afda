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

  test("bloom-pruned join: value-identical to plain join, prune sits before the join") {
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate a
    // filter over a LocalRelation at optimize time and the prune would
    // (correctly but unhelpfully for this assertion) vanish from the plan.
    val big = spark
      .range(5000L)
      .select(col("id").as("k"), concat(lit("fact-"), col("id")).as("payload"))
    val small = (0L until 5000L by 100L).map(k => (k, s"dim-$k")).toDF("k", "attr")
    val out = Joins.bloomPrunedJoin(big, small, "k", expectedItems = 100L)
    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet === plain)
    // The might-contain filter must apply to the big side BEFORE the join —
    // that's the whole point (rows prune before they shuffle).
    val plan = out.queryExecution.executedPlan.toString
    val filterAt = plan.indexOf("graft_bloom_might_contain")
    val joinAt = plan.indexOf("Join")
    assert(filterAt >= 0, "bloom filter expression missing from the plan")
    assert(joinAt >= 0 && filterAt > joinAt, "prune should be below (after, in plan text) the join")
  }

  test("AQE skew-join splits the hot partition at runtime (the documented first defense)") {
    // Joins.scala's scaladoc leans on AQE's skew-join split before reaching
    // for saltedJoin — prove the claim fires on a hot key, with thresholds
    // scaled down to test-fixture sizes.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      // ~30k rows pile onto key 1; the rest are singletons
      val big = spark
        .range(60000L)
        .select(
          when(col("id") % 2 === 0, 1L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("payload"))
      val small = spark.range(60000L).select(col("id").as("k"), lit("dim").as("attr"))
      val joined = big.join(small, Seq("k"))
      // collect() (not count()) so THIS Dataset's queryExecution is the one
      // that runs — count() builds its own aggregate query and the join's
      // adaptive plan would stay isFinalPlan=false
      assert(joined.collect().length === 60000) // hot key matches exactly one dim row
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"no skew split in final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("binned range join: value-identical to the naive range predicate") {
    // Intervals spanning 0–4 bins, negative coordinates, zero-length
    // intervals, and points sitting exactly on lo/hi boundaries — the cases
    // where floor-division vs truncation and BETWEEN inclusivity bite.
    val intervals = Seq(
      (1L, -25L, -25L), // zero-length, negative, mid-bin
      (2L, -7L, 13L), // straddles zero
      (3L, 0L, 0L),
      (4L, 5L, 39L), // 4 bins wide
      (5L, 14L, 20L), // exactly bin-aligned at lo
      (6L, 100L, 110L) // no points in range
    ).toDF("iid", "lo", "hi")
    val points = (-30L to 45L).map(p => (p * 31 % 7, p)).toDF("tag", "p")

    val naive = points
      .join(intervals, col("p").between(col("lo"), col("hi")))
      .collect()
      .map(_.toSeq)
      .toSet
    val binned =
      Joins.binnedRangeJoin(points, "p", intervals, "lo", "hi", binWidth = 10L)
    assert(binned.columns.toSeq === Seq("tag", "p", "iid", "lo", "hi"))
    assert(binned.collect().map(_.toSeq).toSet === naive)
  }

  test("binned range join: no pair is emitted twice for multi-bin intervals") {
    val intervals = Seq((1L, 0L, 99L)).toDF("iid", "lo", "hi") // covers 10 bins
    val points = (0L to 99L).toDF("p")
    val out = Joins.binnedRangeJoin(points, "p", intervals, "lo", "hi", 10L)
    assert(out.count() === 100L) // each point matches exactly once
  }

  test("binned range join: plans as a hash/sort-merge join, not BNLJ") {
    val intervals = Seq((1L, 0L, 9L)).toDF("iid", "lo", "hi")
    val points = spark.range(100L).select(col("id").as("p"))
    val plan = Joins
      .binnedRangeJoin(points, "p", intervals, "lo", "hi", 10L)
      .queryExecution
      .executedPlan
      .toString
    assert(
      !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop shape:\n$plan")
  }

  test("bloom-pruned join: definite non-members are dropped by the filter alone") {
    val small = (0L until 10L).map(k => (k, "d")).toDF("k", "attr")
    val bf = small.stat.bloomFilter("k", 10L, 0.01)
    // With fpp 1% on 10 items, keys far outside the set are (deterministically,
    // for this fixed fixture) rejected — the prune does real work.
    val misses = (1000000L until 1000100L).count(bf.mightContainLong)
    assert(misses < 10)
  }

  test("joinProfile: exact overlap, skew multiplicities, and predicted = actual join size") {
    // left: key 1 ×3 (the hot key), key 2 ×1, key 3 ×1, null ×2
    val left = Seq(
      Some(1L), Some(1L), Some(1L), Some(2L), Some(3L), None, None
    ).toDF("k")
    // right: key 1 ×2, key 2 ×1, key 9 ×1 (left-only key 3, right-only key 9)
    val right = Seq(Some(1L), Some(1L), Some(2L), Some(9L)).toDF("k")
    val p = Joins.joinProfile(left, right, "k").head()
    assert(p.getAs[Long]("n_left_keys") === 3L) // nulls excluded
    assert(p.getAs[Long]("n_right_keys") === 3L)
    assert(p.getAs[Long]("n_shared_keys") === 2L)
    assert(p.getAs[Long]("max_left_mult") === 3L)
    assert(p.getAs[Long]("max_right_mult") === 2L)
    // prediction is exact: 3×2 (key 1) + 1×1 (key 2) = 7
    val actual = left.join(right, Seq("k")).count()
    assert(p.getAs[Long]("est_rows") === 7L)
    assert(p.getAs[Long]("est_rows") === actual)
  }

  test("joinProfile: disjoint and empty sides produce zeros, not nulls") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(3L).toDF("k")
    val p = Joins.joinProfile(a, b, "k").head()
    assert(p.getAs[Long]("n_shared_keys") === 0L)
    assert(p.getAs[Long]("est_rows") === 0L)
    val e = Joins.joinProfile(a, spark.emptyDataset[Long].toDF("k"), "k").head()
    assert(e.getAs[Long]("n_right_keys") === 0L)
    assert(e.getAs[Long]("max_right_mult") === 0L)
    assert(e.getAs[Long]("est_rows") === 0L)
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: blank and empty text produce empty arrays, not ['']") {
    val df = Seq("", "   ", "a b  c", " x\t y ").toDF("text")
    val out = df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(out === Seq(0, 0, 3, 2))
  }

  test("shingles: guarded below n, distinct, ordered windows") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
      .as[Seq[String]]
      .collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
  }

  test("fingerprint: whitespace/case variants collapse, content differences do not") {
    val df = Seq(
      ("A  B\tC", "a b c"),
      ("a b c", "a b d")
    ).toDF("l", "r")
    val eq = df
      .select((TextFunctions.fingerprint(col("l")) === TextFunctions.fingerprint(col("r"))).as("e"))
      .as[Boolean]
      .collect()
    assert(eq === Seq(true, false))
  }

  test("simhash: equal tokens -> equal sig; hamming is symmetric and bounded") {
    val df = Seq(
      ("spark is a fast engine", "spark is a fast engine"),
      ("spark is a fast engine", "spark is a slow engine"),
      ("totally unrelated words here", "spark is a fast engine")
    ).toDF("l", "r")
    val dists = df
      .select(
        TextFunctions
          .hamming(
            TextFunctions.simhash(TextFunctions.tokens(col("l"))),
            TextFunctions.simhash(TextFunctions.tokens(col("r"))))
          .as("d"))
      .as[Int]
      .collect()
    assert(dists(0) === 0)
    assert(dists(1) > 0 && dists(1) < dists(2)) // near-dup closer than unrelated
    assert(dists.forall(d => d >= 0 && d <= 64))
  }

  test("maxTokenMultiplicity: mode count; empty -> 0; unique -> 1") {
    val df = Seq("a b a c a b", "x y z", "", "only").toDF("text")
    val out = df
      .select(TextFunctions.maxTokenMultiplicity(TextFunctions.tokens(col("text"))))
      .as[Int]
      .collect()
      .toSeq
    assert(out === Seq(3, 1, 0, 1))
  }

  test("duplicateNgramFraction: all-unique -> 0, full repeat -> high, short -> NULL") {
    val df = Seq(
      "a b c d e",     // 4 bigrams, all distinct -> 0.0
      "a b a b a b",   // bigrams: ab ba ab ba ab -> 2 distinct of 5 -> 0.6
      "a"              // below n -> NULL
    ).toDF("text")
    val out = df
      .select(TextFunctions.duplicateNgramFraction(TextFunctions.tokens(col("text")), 2))
      .as[Option[Double]]
      .collect()
      .toSeq
    assert(out(0) === Some(0.0))
    assert(out(1) === Some(0.6))
    assert(out(2) === None)
  }

  test("chunk windows: stride-48/size-64 slices cover every token in order") {
    // 100 tokens -> starts 0,48,96; chunks of 64,52,4 tokens; overlapping
    // regions agree with the source array.
    val toks = (0 until 100).map(i => s"t$i")
    val df = Seq(toks.mkString(" ")).toDF("text")
    val chunks = df
      .select(TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("start", explode(sequence(lit(0), size(col("toks")) - 1, lit(48))))
      .select(col("start"), slice(col("toks"), col("start") + 1, lit(64)).as("chunk"))
      .as[(Int, Seq[String])]
      .collect()
      .sortBy(_._1)
    assert(chunks.map(_._1).toSeq === Seq(0, 48, 96))
    assert(chunks.map(_._2.size).toSeq === Seq(64, 52, 4))
    chunks.foreach { case (s, c) => assert(c === toks.slice(s, s + 64)) }
    // every token index is covered by at least one chunk
    val covered = chunks.flatMap { case (s, c) => s until (s + c.size) }.toSet
    assert(covered === (0 until 100).toSet)
  }

  test("vector dot/norm/cosine: known values, double-exact") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val row = df
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.norm(col("a")).as("na"),
        VectorFunctions.cosine(col("a"), col("a")).as("self"))
      .collect()
      .head
    assert(row.getAs[Double]("d") === 24.0)
    assert(row.getAs[Double]("na") === 5.0)
    assert(math.abs(row.getAs[Double]("self") - 1.0) < 1e-12)
  }

  test("deflate length: repetition compresses away, prose does not; SQL surface agrees") {
    val repetitive = "lorem ipsum " * 200
    val prose = (1 to 200)
      .map(i => s"w${i * 2654435761L % 9973}")
      .mkString(" ") // high-entropy distinct tokens
    val df = Seq(("r", repetitive), ("p", prose)).toDF("k", "text")
    val out = df
      .select(
        col("k"),
        octet_length(col("text")).cast("double").as("b"),
        TextFunctions.deflateLen(col("text")).cast("double").as("d"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2) / r.getDouble(1)))
      .toMap
    assert(out("r") < 0.05, s"repetitive ratio ${out("r")} should collapse")
    assert(out("p") > 0.3, s"prose ratio ${out("p")} should not")
    // kernel registered on the SQL surface, same implementation
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("defl_t")
    val sqlOut = spark
      .sql("SELECT k, graft_deflate_len(text) AS d FROM defl_t")
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    val dslOut = df
      .select(col("k"), TextFunctions.deflateLen(col("text")).as("d"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    assert(sqlOut === dslOut)
  }

  test("kernel edges: deflate of empty/null text, gram terms of empty/null vectors") {
    val df = Seq(("e", Some("")), ("n", None), ("x", Some("abc")))
      .toDF("k", "text")
    val defl = df
      .select(col("k"), TextFunctions.deflateLen(col("text")).as("d"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    assert(defl("n") === -1, "null text must stay null, not crash")
    assert(defl("e") >= 0, "empty text deflates to a (tiny) valid stream")
    assert(defl("x") > 0)

    val vdf = Seq((1L, Some(Array.empty[Float])), (2L, None), (3L, Some(Array(1f, 2f))))
      .toDF("vec_id", "embedding")
    import org.apache.spark.sql.graft.{Bridge, GramTerms}
    val gt = vdf
      .select(col("vec_id"), Bridge.column(GramTerms(Bridge.expression(col("embedding")))).as("t"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(gt(1L) === Seq.empty, "empty vector -> empty term array")
    assert(gt(2L) === null, "null vector stays null")
    assert(gt(3L).length === 3) // d(d+1)/2 for d=2
  }

  test("sortedIntersect: merge equals array_intersect on sorted inputs; edges safe") {
    val df = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 9L)), // partial overlap
      (Array(1L, 2L), Array(3L, 4L)), // disjoint
      (Array.emptyLongArray, Array(1L, 2L)), // empty left
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)) // identical
    ).toDF("a", "b")
    val out = df
      .select(
        TextFunctions.sortedIntersect(col("a"), col("b")).as("m"),
        array_intersect(col("a"), col("b")).as("ref"),
        TextFunctions.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1)) // kernel ≡ builtin
      assert(r.getSeq[Long](0).length === r.getInt(2)) // count kernel agrees
    }
  }

  test("srp buckets: identical vectors always share a bucket") {
    val planes = VectorFunctions.randomPlanes(8, 4)
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f, -4.0f))
    ).toDF("vec_id", "embedding")
    val buckets =
      df.select(VectorFunctions.srpBucket(col("embedding"), planes)).as[Long].collect()
    assert(buckets(0) === buckets(1))
    assert(buckets(0) !== buckets(2)) // antipodal vector flips every sign bit
  }

  test("normalizeUnicode: NFC unifies composed/decomposed; case, controls, runs") {
    val df = Seq(
      "Caf\u00e9  du   Parc", // composed e-acute
      "Cafe\u0301 du\tParc", // decomposed e + COMBINING ACUTE ACCENT
      "\u0000ctl\u001fchars\u007f here", // Cc runs collapse like whitespace
      "  edge \n\n trim  ",
      "",
      // Oracle-contract edges (the [\x00-\x20\x7f]-only collapse class +
      // per-codepoint SIMPLE lowercase): NBSP/EM-SPACE/LINE-SEP are NOT in
      // the collapse class and must survive; U+0130 must simple-lower to a
      // bare 'i' (full case mapping would expand to i + U+0307); final
      // sigma must take the context-free \u03c3 mapping, never \u03c2.
      "A\u00a0B\u2003C\u2028D",
      "\u0130STANBUL",
      "\u039f\u03a3 \u03a3O").toDF("text")
    val out =
      df.select(TextFunctions.normalizeUnicode(col("text"))).as[String].collect().toSeq
    assert(out(0) === "caf\u00e9 du parc")
    assert(out(1) === out(0)) // the decomposed spelling normalizes identically
    assert(out(2) === "ctl chars here")
    assert(out(3) === "edge trim")
    assert(out(4) === "")
    assert(out(5) === "a\u00a0b\u2003c\u2028d") // non-ASCII whitespace preserved
    assert(out(6) === "istanbul") // U+0130 -> i, length 8
    assert(out(7) === "\u03bf\u03c3 \u03c3o") // no word-final sigma form anywhere
    // SQL surface serves the same kernel
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("nrm_t")
    val viaSql = spark
      .sql("SELECT graft_normalize_unicode(text) FROM nrm_t")
      .as[String]
      .collect()
      .toSeq
    assert(viaSql === out)
  }

  test("topK aggregate: best-first with id-asc ties, bounded, null-safe, = window form") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("a", 5L, 7.0), ("b", 6L, 2.0)).toDF("g", "id", "v")
    val top = df
      .groupBy("g")
      .agg(AggFunctions.topK(col("v"), col("id"), 3).as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(e =>
        (e.getDouble(0), e.getLong(1))))
      .toMap
    // score desc, ties id asc; trimmed to k
    assert(top("a") === Seq((9.0, 2L), (9.0, 3L), (7.0, 5L)))
    // group smaller than k keeps all members
    assert(top("b") === Seq((2.0, 6L)))
    // null scores are ignored, not ranked
    val withNull = Seq(("a", 1L, Some(3.0)), ("a", 2L, None), ("a", 3L, Some(4.0)))
      .toDF("g", "id", "v")
      .groupBy("g")
      .agg(AggFunctions.topK(col("v"), col("id"), 5).as("top"))
      .collect()
      .head
      .getSeq[org.apache.spark.sql.Row](1)
    assert(withNull.map(_.getLong(1)) === Seq(3L, 1L))
    // the aggregate and the window-rank idiom agree on a bigger input
    import org.apache.spark.sql.expressions.Window
    val big = (1L to 500L)
      .map(i => (s"g${i % 7}", i, ((i * 2654435761L) % 1000).toDouble))
      .toDF("g", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val viaWindow = big
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .select("g", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    val viaAgg = big
      .groupBy("g")
      .agg(AggFunctions.topK(col("v"), col("id"), 4).as("top"))
      .select(col("g"), explode(col("top.id")).as("id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(viaAgg === viaWindow)
    // SQL surface serves the same aggregate kernel
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    big.createOrReplaceTempView("topk_t")
    val viaSqlAgg = spark
      .sql("SELECT g, explode(graft_top_k(v, id, 4).id) AS id FROM topk_t GROUP BY g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(viaSqlAgg === viaWindow)
  }

  test("misra-gries: exact when distinct <= k; heavy-hitter guarantee under eviction") {
    // distinct items <= k: no decrement ever fires, counts are exact
    val small = Seq("a", "b", "a", "c", "a", "b").toDF("tok")
    val exactRes = small
      .agg(AggFunctions.heavyHitters(col("tok"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exactRes.toSeq === Seq("a" -> 3L, "b" -> 2L, "c" -> 1L)) // est desc, item asc
    // skewed stream, k far below the distinct count: the planted heavy
    // hitter must be reported with an estimate in [c - n/(k+1), c]
    val k = 10
    val heavy = Seq.fill(400)("HOT") ++ (1 to 600).map(i => s"u$i")
    val n = heavy.size.toLong
    val df = heavy.toDF("tok").repartition(4) // exercises partial-buffer merges
    val got = df
      .agg(AggFunctions.heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got.contains("HOT"), s"heavy hitter missing from $got")
    assert(got("HOT") <= 400L && 400L - got("HOT") <= n / (k + 1))
    assert(got.size <= k)
    // every reported estimate is a lower bound on the true count
    got.foreach { case (item, est) =>
      val truth = heavy.count(_ == item).toLong
      assert(est <= truth, s"$item overcounted: $est > $truth")
    }
  }
}

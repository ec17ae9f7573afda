package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilarityAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(1.0f, 0.05f, 0.0f))
  ).toDF("vec_id", "embedding")

  // Physical-state assertions resolve segment dirs through the live
  // manifest — the generation-suffixed layout moves on every build/compact.
  private def liveDir(idx: String, layout: IndexManifest.Layout, t: String): String =
    IndexManifest.liveTableDir(spark, idx, layout, t)
  private def liveStream(idx: String, layout: IndexManifest.Layout): String =
    IndexManifest.resolve(spark, idx, layout).streamDir(idx)
  private def liveTombs(idx: String): String =
    s"$idx/${IndexManifest.liveTombstones(spark, idx)}"
  private def dirExists(p: String): Boolean = new java.io.File(p).exists()

  test("brute-force top-k: correct neighbor order, self excluded, k respected") {
    val out = SimilaritySearch
      .bruteForceTopK(vecs.filter(col("vec_id") === 0L), vecs, 2)
      .collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("n_id")).toSeq === Seq(4L, 1L)) // 4 closer than 1
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    assert(out.forall(_.getAs[Long]("n_id") != 0L))
  }

  test("truncationRankingMetrics: identical ranking scores perfect; a demoted top-1 halves MRR") {
    // dims = full width → truncated ranking IS the exact ranking
    val q = vecs.filter(col("vec_id") === 0L)
    val perfect = SimilaritySearch.truncationRankingMetrics(q, vecs, k = 3, dims = 3)
      .collect().head
    assert(perfect.getAs[Long]("n_rel") === 3L)
    assert(perfect.getAs[Double]("ndcg") === 1.0)
    assert(perfect.getAs[Double]("mrr") === 1.0)

    // 4-dim set where the TAIL decides the true top-1 and the prefix
    // inverts it: query (1,0,0,1); 10 = (0.5,0.5,0,1) has full cos 0.866
    // (true top-1) but prefix cos 0.707; 11 = (1,0,0,0) has full cos 0.707
    // but prefix cos 1.0. Truncating to 2 dims picks 11 at k=1 — a true
    // miss, so every metric must read zero.
    val crafted = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)), // query
      (10L, Array(0.5f, 0.5f, 0.0f, 1.0f)),
      (11L, Array(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val m = SimilaritySearch
      .truncationRankingMetrics(crafted.filter(col("vec_id") === 0L), crafted, k = 1, dims = 2)
      .collect().head
    assert(m.getAs[Long]("n_rel") === 0L)
    assert(m.getAs[Double]("ndcg") === 0.0)
    assert(m.getAs[Double]("mrr") === 0.0)
  }

  test("mmrRerank: rank 1 is the plain argmax; the penalty then promotes diversity") {
    // Query = axis x. Pool: 4 and 1 are both near-duplicates of axis x
    // (plain top-2); 2 and 3 are orthogonal to the query. Rank 1 must be the
    // brute-force top-1 (4); with λ=1 the near-dup 1 is annihilated by its
    // ~1.0 similarity to 4, and 2 is slightly penalized by its 0.05 overlap
    // with 4 — so 3 (orthogonal to BOTH query and 4, score exactly 0) takes
    // rank 2, a pick plain top-k cannot make.
    val q = vecs.filter(col("vec_id") === 0L)
    val plain = SimilaritySearch.bruteForceTopK(q, vecs, 2)
      .collect().map(_.getAs[Long]("n_id")).toSeq
    assert(plain === Seq(4L, 1L))
    val mmr = SimilaritySearch.mmrRerank(q, vecs, k = 2, poolSize = 4, lambda = 1.0)
      .orderBy("rank").collect()
    assert(mmr.map(_.getAs[Long]("n_id")).toSeq === Seq(4L, 3L), mmr.mkString(","))
    assert(mmr.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    // rank-1 score is the raw cosine; rank-2 is fully orthogonal → exact 0
    assert(mmr(0).getAs[Double]("score") > 0.99)
    assert(math.abs(mmr(1).getAs[Double]("score")) < 1e-12)
  }

  test("mmrRerankFrom: feeding the brute-force pool reproduces mmrRerank exactly") {
    val q = vecs.filter(col("vec_id") === 0L)
    val pool = SimilaritySearch.bruteForceTopK(q, vecs, 4)
    val fromPool = SimilaritySearch.mmrRerankFrom(pool, vecs, k = 2, lambda = 1.0)
      .orderBy("rank").collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("n_id"),
        r.getAs[Double]("score")))
    val direct = SimilaritySearch.mmrRerank(q, vecs, k = 2, poolSize = 4, lambda = 1.0)
      .orderBy("rank").collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("n_id"),
        r.getAs[Double]("score")))
    assert(fromPool.toSeq === direct.toSeq)
  }

  test("filteredTopK: predicate restricts the pool; survivors re-close the ranks") {
    // Labels: near-dups of the query (1, 4) are label 0; the orthogonals
    // (2, 3) are label 1. Filtering to label 1 must skip the true nearest
    // neighbors entirely and rank only the orthogonal survivors.
    val labeled = vecs.withColumn("label", when(col("vec_id").isin(1L, 4L), 0).otherwise(1))
    val out = SimilaritySearch
      .filteredTopK(labeled.filter(col("vec_id") === 0L), labeled, col("label") === 1, 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("n_id")).toSeq === Seq(2L, 3L))
    assert(out.forall(r => math.abs(r.getAs[Double]("sim")) < 1e-12)) // both orthogonal
  }

  test("filteredTopKPost: with all cells probed and budget covering the corpus, " +
    "the post-filter path equals the exact pre-filter path") {
    val labeled = vecs.withColumn("label", when(col("vec_id") === 4L, 0).otherwise(1))
    val q = labeled.filter(col("vec_id") === 0L)
    val pred = col("label") === 1
    val exact = SimilaritySearch.filteredTopK(q, labeled, pred, 2)
      .select("q_id", "n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val post = SimilaritySearch
      .filteredTopKPost(q, labeled, pred, 2, inflate = 3, nlist = 2, nprobe = 2)
      .select("q_id", "n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(post.sorted.toSeq === exact.sorted.toSeq)
  }

  test("filteredTopKAuto: measured selectivity picks the exact lane below the " +
    "crossover and the index lane above it; each equals its direct invocation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tight = col("label").isin(3, 9) // ~21% < 1/inflate = 25%
    assert(
      keyed(SimilaritySearch.filteredTopKAuto(q, emb, tight, 10)) ===
        keyed(SimilaritySearch.filteredTopK(q, emb, tight, 10)))
    val loose = col("label") =!= 3 // ~91% > 25%
    assert(
      keyed(SimilaritySearch.filteredTopKAuto(q, emb, loose, 10)) ===
        keyed(SimilaritySearch.filteredTopKPost(q, emb, loose, 10)))
    // the empty corpus ties to the exact lane and yields an empty answer
    assert(SimilaritySearch.filteredTopKAuto(q, emb.limit(0), tight, 10).count() === 0L)
  }

  test("postFilter composes onto the persisted IVF index: equals the in-memory post path") {
    // Same deterministic model (ivfIndexBuild freezes what ivfTopK trains),
    // so the persisted-index hit list post-filters to the identical result —
    // the serving shape: index built once, predicate applied per query batch.
    val labeled = vecs.withColumn("label", when(col("vec_id") === 4L, 0).otherwise(1))
    val q = labeled.filter(col("vec_id") === 0L)
    val pred = col("label") === 1
    val idx = java.nio.file.Files.createTempDirectory("graft-postfilter-ivf").toString
    SimilaritySearch.ivfIndexBuild(labeled, idx, nlist = 2, iters = 2)
    val viaIndex = SimilaritySearch
      .postFilter(
        SimilaritySearch.ivfIndexSearch(spark, idx, q, 6, nprobe = 2), labeled, pred, 2)
      .select("q_id", "n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val inMem = SimilaritySearch
      .filteredTopKPost(q, labeled, pred, 2, inflate = 3, nlist = 2, nprobe = 2)
      .select("q_id", "n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaIndex.sorted.toSeq === inMem.sorted.toSeq)
  }

  test("rrfFuse: a doc hit by both lanes outranks single-lane docs; " +
    "scores are exact 1/(k0+r) sums and missing lanes are NULL provenance") {
    val laneA = Seq((0L, 100L, 1L), (0L, 101L, 2L)).toDF("q_id", "id", "rank")
    val laneB = Seq((0L, 101L, 1L), (0L, 102L, 2L)).toDF("q_id", "id", "rank")
    val out = SimilaritySearch.rrfFuse(laneA, laneB, k = 3).orderBy("rank").collect()
    // 101 appears in both lanes (1/62 + 1/61) and must beat 100 (1/61) and 102 (1/62)
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(101L, 100L, 102L))
    val s101 = out(0).getAs[Double]("score")
    assert(math.abs(s101 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    // single-lane rows carry NULL in the missed lane's rank column
    assert(out(1).isNullAt(out(1).fieldIndex("rank_b")))
    assert(out(2).isNullAt(out(2).fieldIndex("rank_a")))
    // 1/61 > 1/62: lane-A's rank-1 doc edges lane-B's rank-2 doc
    assert(out(1).getAs[Long]("id") === 100L && out(1).getAs[Long]("rank_a") === 1L)
  }

  test("blendFuse: per-lane min-max normalization, missing lane scores 0, " +
    "single-hit lane normalizes to 1.0") {
    val laneA = Seq((0L, 100L, 10.0), (0L, 101L, 5.0)).toDF("q_id", "id", "score")
    val laneB = Seq((0L, 101L, 2.0), (0L, 102L, 1.0)).toDF("q_id", "id", "score")
    val out = SimilaritySearch.blendFuse(laneA, laneB, k = 3).orderBy("rank").collect()
    // norms: A → 100:1.0, 101:0.0; B → 101:1.0, 102:0.0
    // blends: 100 = .5·1+.5·0 = .5; 101 = .5·0+.5·1 = .5; 102 = 0
    // tie at 0.5 breaks by id → 100 before 101
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq ===
      Seq((100L, 0.5), (101L, 0.5), (102L, 0.0)))
    // a single-hit lane has max == min and must normalize to 1.0, not 0/0
    val one = Seq((0L, 200L, 7.0)).toDF("q_id", "id", "score")
    val single = SimilaritySearch.blendFuse(one, one.limit(0), k = 1).collect().head
    assert(single.getAs[Long]("id") === 200L && single.getAs[Double]("score") === 0.5)
  }

  test("LSH top-k: identical-direction vector is always found at rank 1") {
    val out = SimilaritySearch
      .lshTopK(vecs.filter(col("vec_id") === 0L), vecs, 3, numPlanes = 6, dim = 3)
      .collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("n_id") === 4L) // same bucket guaranteed for near-identical
  }

  test("IVF top-k: near-identical vector recalled at rank 1; ranks contiguous") {
    val corpus = vecs.union(Seq(
      (5L, Array(0.5f, 0.5f, 0.0f)),
      (6L, Array(0.0f, 0.5f, 0.5f)),
      (7L, Array(-1.0f, 0.0f, 0.0f)),
      (8L, Array(0.0f, -1.0f, 0.0f))
    ).toDF("vec_id", "embedding"))
    val out = SimilaritySearch
      .ivfTopK(corpus.filter(col("vec_id") === 0L), corpus, 3, nlist = 3, nprobe = 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("n_id") === 4L) // closest direction wins
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to out.length.toLong))
  }

  test("ANN recall@10 on real embeddings: IVF and multiprobe LSH above their floors") {
    // 500 near-orthogonal random vectors (sf0.001) — the WORST case for
    // bucketed ANN (no cluster structure for the quantizer to exploit);
    // clustered production embeddings only do better. Measured here: IVF
    // 0.69, LSH(4-plane multiprobe) ~0.4 on this data. The floors pin those
    // against silent regression, with slack for k-means/plane sensitivity.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = resultSet(SimilaritySearch.bruteForceTopK(queries, emb, 10))
    val ivf = resultSet(SimilaritySearch.ivfTopK(queries, emb, 10, nlist = 8, nprobe = 2))
    // the q_ann_lsh_recall gate config: query-directed multiprobe, 7
    // lowest-cost flip-masks of 16 (measured 0.60 here / 0.61 at sf0.01)
    val lsh = resultSet(SimilaritySearch.lshTopK(queries, emb, 10, numPlanes = 4, probes = 7))
    val ivfRecall = ivf.intersect(exact).size.toDouble / exact.size
    val lshRecall = lsh.intersect(exact).size.toDouble / exact.size
    assert(ivfRecall >= 0.6, s"IVF recall@10 regressed: $ivfRecall")
    assert(lshRecall >= 0.5, s"LSH(4-plane query-directed multiprobe) recall@10 regressed: $lshRecall")
  }

  test("labelNoiseScan: a planted mislabel scores 1.0, clean cluster members 0.0") {
    // two tight clusters of 4; vector 3 sits in cluster A but carries
    // cluster B's label → all its neighbors disagree; its clean cluster
    // mates see exactly one dissenting neighbor among three.
    val e = Seq(
      (0L, Array(1.0f, 0.00f), 1), (1L, Array(1.0f, 0.01f), 1),
      (2L, Array(1.0f, 0.02f), 1), (3L, Array(1.0f, 0.03f), 2), // mislabeled
      (4L, Array(0.0f, 1.00f), 2), (5L, Array(0.01f, 1.0f), 2),
      (6L, Array(0.02f, 1.0f), 2), (7L, Array(0.03f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch
      .labelNoiseScan(e, e, 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(3L) === ((2, 3L, 1.0))) // every neighbor disagrees
    for (i <- Seq(0L, 1L, 2L))
      assert(out(i)._2 === 1L, s"vec $i should see exactly the one mislabel")
    for (i <- Seq(4L, 5L, 6L, 7L))
      assert(out(i) === ((2, 0L, 0.0)), s"clean cluster B member $i")
  }

  test("pqTopK: near-identical vector survives quantization to rank 1; codes are m small ints") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clone = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clone)
    val out = SimilaritySearch
      .pqTopK(corpus.filter(col("vec_id") === 0L), corpus, 3)
      .collect()
    // cos(v, v) = 1 survives any quantizer whose ADC stage keeps the clone
    // in the rerank set (identical codes → identical ADC score)
    assert(out.head.getAs[Long]("n_id") === 999999L)
    assert(out.head.getAs[Double]("sim") > 0.9999)
    // the code table: per vector m=8 int codes + the exact norm
    val codes = SimilaritySearch.pqEncode(
      corpus, SimilaritySearch.pqTrain(corpus, 8, 64, 16, 2), 64)
    assert(codes.columns.toSeq === Seq("n_id", "nn") ++ (0 until 8).map(i => s"code$i"))
    val row = codes.filter(col("n_id") === 0L).collect().head
    for (i <- 0 until 8) {
      val c = row.getAs[Int](s"code$i")
      assert(c >= 0 && c < 16)
    }
  }

  test("bruteForceTopK dims: prefix-truncated ranking diverges exactly where tails matter") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.0f, 0.6f, 0.0f)), // prefix-aligned, tail off-axis
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)) // slightly off in-prefix, no tail
    ).toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") === 0L)
    val full = SimilaritySearch.bruteForceTopK(q, e, 1).collect().head.getAs[Long]("n_id")
    val half = SimilaritySearch.bruteForceTopK(q, e, 1, dims = 2).collect().head.getAs[Long]("n_id")
    assert(full === 2L) // full cos: 0.994 beats 0.8
    assert(half === 1L) // first-2-dims cos: 1.0 beats 0.994
  }

  test("hardNegatives: nearest different-label vectors only, same-label never ranked") {
    // cluster A (label 1) + cluster B (label 2), with vector 3 sitting in
    // cluster A but labeled 2: for query 0 (label 1) the hardest negative
    // is exactly that embedded-in-A label-2 vector, then cluster B.
    val e = Seq(
      (0L, Array(1.0f, 0.00f), 1), (1L, Array(1.0f, 0.01f), 1),
      (2L, Array(1.0f, 0.02f), 1), (3L, Array(1.0f, 0.03f), 2),
      (4L, Array(0.0f, 1.00f), 2), (5L, Array(0.01f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch
      .hardNegatives(e.filter(col("vec_id") === 0L), e, 3)
      .collect()
    assert(out.map(_.getAs[Long]("n_id")).toSeq === Seq(3L, 5L, 4L))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    assert(out.forall(_.getAs[Int]("n_label") === 2)) // never a same-label row
    assert(out.forall(_.getAs[Int]("q_label") === 1))
  }

  test("persisted IVF index: search equals in-memory ivfTopK; append is findable; model frozen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    SimilaritySearch.ivfIndexBuild(emb, idx, nlist = 4, iters = 2)
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // identical model + identical probe plan → identical results
    assert(
      pairs(SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, nprobe = 2)) ===
        pairs(SimilaritySearch.ivfTopK(q, emb, 5, nlist = 4, nprobe = 2)))
    // append: a clone of query 0's vector lands in its cell and surfaces at rank 1
    val centroidsBefore = spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivf, "centroids")).collect().toSeq
    val clone = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    SimilaritySearch.ivfIndexAppend(clone, idx)
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivf, "centroids")).collect().toSeq === centroidsBefore)
    val after = SimilaritySearch
      .ivfIndexSearch(spark, idx, emb.filter(col("vec_id") === 0L), 3, nprobe = 2)
      .collect()
    assert(after.head.getAs[Long]("n_id") === 999999L) // cos=1 clone at rank 1
  }

  test("ivfIndexCalibrate + ivfIndexSearchAuto: recall curve measured onto the " +
    "manifest (metadata-only commit), pick is cheapest width meeting the " +
    "target, exactness requests guarded to the full sweep") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-auto").toString
    SimilaritySearch.ivfIndexBuild(emb, idx, nlist = 4, iters = 2)
    val g0 = IndexManifest.read(spark, idx).get.generation
    val baseDirBefore =
      IndexManifest.read(spark, idx).get.tables("vectors")
    val curve = SimilaritySearch.ivfIndexCalibrate(spark, idx, k = 5, nSample = 8)
    val st = IndexManifest.read(spark, idx).get
    // metadata-only commit: one generation bump, SAME segment dirs
    assert(st.generation === g0 + 1)
    assert(st.tables("vectors") === baseDirBefore)
    assert(curve.keys.toSeq.sorted === Seq(1, 2, 4))
    curve.foreach { case (np, r) =>
      assert(math.abs(st.props(s"recall.k5.np$np").toDouble - r) < 5e-5)
    }
    // all-cells recall is 1.0 by construction, and the curve is monotone
    assert(curve(4) === 1.0)
    assert(curve(1) <= curve(2) + 1e-9 && curve(2) <= curve(4) + 1e-9)
    // cheapest-width pick; a target ≥ 1.0 always takes the full sweep (a
    // sampled 1.0 at a lower width is an estimate, not a guarantee)
    assert(SimilaritySearch.ivfIndexChooseNprobe(spark, idx, 5, 0.0) === 1)
    assert(SimilaritySearch.ivfIndexChooseNprobe(spark, idx, 5, 1.0) === 4)
    // uncalibrated k errors loudly instead of silently full-sweeping
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfIndexChooseNprobe(spark, idx, 7, 0.9)
    }
    // the auto lane is the directly-invoked search at its chosen width
    val q = emb.filter(col("vec_id") < 6)
    val np = SimilaritySearch.ivfIndexChooseNprobe(spark, idx, 5, 0.8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs(SimilaritySearch.ivfIndexSearchAuto(spark, idx, q, 5, 0.8)) ===
      pairs(SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, np)))
    // the data plane is untouched: post-commit search still equals ivfTopK
    assert(pairs(SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, nprobe = 2)) ===
      pairs(SimilaritySearch.ivfTopK(q, emb, 5, nlist = 4, nprobe = 2)))
  }

  test("a rebuild drops the recall calibration with the model it described — " +
    "stale curves are never served — and the sweep re-measures it") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-recal").toString
    SimilaritySearch.ivfIndexBuild(evens, idx, nlist = 4, iters = 2)
    SimilaritySearch.ivfIndexCalibrate(spark, idx, k = 5, nSample = 8)
    assert(SimilaritySearch.ivfIndexChooseNprobe(spark, idx, 5, 1.0) === 4)
    // a manual rebuild retrains the model — the old curve goes with it
    SimilaritySearch.ivfIndexBuild(emb, idx, nlist = 4, iters = 2)
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfIndexChooseNprobe(spark, idx, 5, 0.9)
    }
    // the sweep's fired rebuild re-measures the ks that were calibrated
    val idx2 = java.nio.file.Files.createTempDirectory("graft-ivf-recal2").toString
    SimilaritySearch.ivfIndexBuild(evens, idx2, nlist = 4, iters = 2)
    SimilaritySearch.ivfIndexCalibrate(spark, idx2, k = 5, nSample = 8)
    SimilaritySearch.ivfIndexAppend(emb.filter(col("vec_id") % 2 === 1), idx2)
    val reports = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.IvfIndex(idx2, () => emb, nlist = 4, iters = 2,
        rebuildRatio = 0.5)))
    assert(reports.head.rebuilt && reports.head.failed.isEmpty)
    assert(SimilaritySearch.ivfIndexChooseNprobe(spark, idx2, 5, 1.0) === 4,
      "the post-rebuild curve is freshly measured, not carried")
    assert(SimilaritySearch.recallKs(
      IndexManifest.read(spark, idx2).get.props) === Seq(5))
  }

  test("ivfIndexUpsert / ivfPqIndexUpsert: one-commit replace — the old vector " +
    "leaves BOTH scan stages, the new one serves, deleted ids resurrect " +
    "without compaction, compaction preserves") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val neg = emb.filter(col("vec_id") % 10 === 3)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    // the replaced corpus, for the exact all-cells cross-check
    val replaced = emb.filter(col("vec_id") % 10 =!= 3).unionByName(neg)
    for (pq <- Seq(false, true)) {
      val idx = java.nio.file.Files.createTempDirectory(s"graft-upsert-pq$pq").toString
      def build(df: org.apache.spark.sql.DataFrame): Unit =
        if (pq) SimilaritySearch.ivfPqIndexBuild(df, idx, nlist = 4, iters = 2)
        else SimilaritySearch.ivfIndexBuild(df, idx, nlist = 4, iters = 2)
      def upsert(df: org.apache.spark.sql.DataFrame): Unit =
        if (pq) SimilaritySearch.ivfPqIndexUpsert(df, idx)
        else SimilaritySearch.ivfIndexUpsert(df, idx)
      def exact(): Set[(Long, Long, Long)] = pairs(
        if (pq) SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 4,
          rerank = 1000000)
        else SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, nprobe = 4))
      build(emb)
      def genOf(): Long = IndexManifest.read(spark, idx).map(_.generation).getOrElse(0L)
      val g1 = genOf()
      upsert(neg)
      assert(genOf() === g1 + 1, s"pq=$pq: upsert is exactly one commit")
      // all-cells search over the index == a fresh build of the replaced
      // corpus (deterministic frozen model trained on the SAME full set)
      val got = exact()
      val fresh = java.nio.file.Files.createTempDirectory(s"graft-upsert-ref$pq").toString
      if (pq) SimilaritySearch.ivfPqIndexBuild(replaced, fresh, nlist = 4, iters = 2)
      else SimilaritySearch.ivfIndexBuild(replaced, fresh, nlist = 4, iters = 2)
      val want = pairs(
        if (pq) SimilaritySearch.ivfPqIndexSearch(spark, fresh, q, 5, nprobe = 4,
          rerank = 1000000)
        else SimilaritySearch.ivfIndexSearch(spark, fresh, q, 5, nprobe = 4))
      assert(got === want, s"pq=$pq: upserted index must rank like the replaced corpus")
      // delete-then-upsert resurrects without a compaction
      val rid = emb.filter(col("vec_id") % 10 === 4).select("vec_id").limit(1)
        .collect().headOption.map(_.getLong(0))
      rid.foreach { id =>
        SimilaritySearch.indexDelete(Seq(id).toDF("vec_id"), idx)
        assert(!exact().exists(_._2 == id), s"pq=$pq: delete hides the id")
        upsert(emb.filter(col("vec_id") === id))
        assert(exact() === got, s"pq=$pq: re-added original vector restores the ranking")
      }
      // compaction folds it all physically; answers unchanged
      val pre = exact()
      if (pq) SimilaritySearch.ivfPqIndexCompact(spark, idx)
      else SimilaritySearch.ivfIndexCompact(spark, idx)
      assert(exact() === pre, s"pq=$pq: compaction preserves the live view")
    }
  }

  test("minhashIndexUpsert: replaced text serves its NEW signature only; " +
    "deleted ids resurrect; compaction preserves") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs today"),
      (2L, "sphinx of black quartz judge my vow tonight")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-mh-upsert").toString
    Dedup.minhashIndexBuild(docs, idx)
    def live(): Set[(Int, Long, Seq[Long])] =
      Dedup.minhashIndexRows(spark, idx).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSet
    def genOf(): Long = IndexManifest.read(spark, idx).map(_.generation).getOrElse(0L)
    val g1 = genOf()
    val newDoc = Seq((0L, "completely different replacement text about engines"))
      .toDF("doc_id", "text")
    Dedup.minhashIndexUpsert(newDoc, idx)
    assert(genOf() === g1 + 1)
    val after = live()
    assert(after.filter(_._2 == 0L) === Dedup.minhashIndex(newDoc).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSet,
      "doc 0 serves exactly its new banding — the old signature is fully retired")
    assert(after.map(_._2) === Set(0L, 1L, 2L))
    // delete-then-upsert resurrects; a later delete still bites
    Dedup.minhashIndexDelete(Seq(1L).toDF("doc_id"), idx)
    assert(!live().map(_._2).contains(1L))
    Dedup.minhashIndexUpsert(docs.filter(col("doc_id") === 1L), idx)
    assert(live().map(_._2).contains(1L), "deleted id re-added by upsert")
    Dedup.minhashIndexDelete(Seq(1L).toDF("doc_id"), idx)
    assert(!live().map(_._2).contains(1L), "a later delete kills the upserted copy")
    val pre = live()
    Dedup.minhashIndexCompact(spark, idx)
    assert(live() === pre)
  }

  test("takedown survives an unrelated upsert (ivf / ivfpq / minhash): " +
    "delete(X), upsert(Y), then append(X) keeps X hidden; upsert(X) re-adds") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val xId = 4L
    val yId = 7L
    val xVec = emb.filter(col("vec_id") === xId)
    for (pq <- Seq(false, true)) {
      val idx = java.nio.file.Files.createTempDirectory(s"graft-takedown-pq$pq").toString
      def upsert(df: org.apache.spark.sql.DataFrame): Unit =
        if (pq) SimilaritySearch.ivfPqIndexUpsert(df, idx)
        else SimilaritySearch.ivfIndexUpsert(df, idx)
      def append(df: org.apache.spark.sql.DataFrame): Unit =
        if (pq) SimilaritySearch.ivfPqIndexAppend(df, idx)
        else SimilaritySearch.ivfIndexAppend(df, idx)
      // all-cells, corpus-sized k from a bystander query (self-matches are
      // excluded from results, so X must be probed from elsewhere): X
      // serves iff it appears among query 0's neighbors
      val probe = emb.filter(col("vec_id") === 0L)
      def servesX(): Boolean = (
        if (pq) SimilaritySearch.ivfPqIndexSearch(spark, idx, probe, 1000, nprobe = 4,
          rerank = 1000000)
        else SimilaritySearch.ivfIndexSearch(spark, idx, probe, 1000, nprobe = 4))
        .collect().exists(_.getLong(1) == xId)
      if (pq) SimilaritySearch.ivfPqIndexBuild(emb, idx, nlist = 4, iters = 2)
      else SimilaritySearch.ivfIndexBuild(emb, idx, nlist = 4, iters = 2)
      assert(servesX(), s"pq=$pq: sanity — X serves before the takedown")
      SimilaritySearch.indexDelete(Seq(xId).toDF("vec_id"), idx)
      assert(!servesX(), s"pq=$pq: takedown hides X")
      // an unrelated upsert bumps the generation — the resurrection window
      upsert(emb.filter(col("vec_id") === yId))
      assert(!servesX(), s"pq=$pq: takedown survives the unrelated upsert")
      // a plain re-append of the deleted id lands ABOVE the old live
      // generation — it must still be hidden (the round-9 contract fix)
      append(xVec)
      assert(!servesX(),
        s"pq=$pq: append of a taken-down id after an unrelated upsert must not serve")
      // the one sanctioned re-add: upsert of the id itself
      upsert(xVec)
      assert(servesX(), s"pq=$pq: upsert of X itself re-adds it")
      // and the takedown contract keeps holding through a compaction
      SimilaritySearch.indexDelete(Seq(xId).toDF("vec_id"), idx)
      if (pq) SimilaritySearch.ivfPqIndexCompact(spark, idx)
      else SimilaritySearch.ivfIndexCompact(spark, idx)
      assert(!servesX(), s"pq=$pq: compaction applies the takedown physically")
    }
    // minhash family, same scenario over the banded rows view
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs today"),
      (2L, "sphinx of black quartz judge my vow tonight")
    ).toDF("doc_id", "text")
    val mh = java.nio.file.Files.createTempDirectory("graft-mh-takedown").toString
    Dedup.minhashIndexBuild(docs, mh)
    def mhIds(): Set[Long] =
      Dedup.minhashIndexRows(spark, mh).select("c_id").collect().map(_.getLong(0)).toSet
    Dedup.minhashIndexDelete(Seq(1L).toDF("doc_id"), mh)
    Dedup.minhashIndexUpsert(
      Seq((2L, "a thoroughly rewritten third document about engines")).toDF("doc_id", "text"),
      mh)
    assert(!mhIds().contains(1L), "minhash: takedown survives the unrelated upsert")
    Dedup.minhashIndexAppend(docs.filter(col("doc_id") === 1L), mh)
    assert(!mhIds().contains(1L),
      "minhash: append of a taken-down id after an unrelated upsert must not serve")
    Dedup.minhashIndexUpsert(docs.filter(col("doc_id") === 1L), mh)
    assert(mhIds().contains(1L), "minhash: upsert of the id itself re-adds it")
  }

  test("streaming IVF ingest: streamed appends equal the batch append; checkpoint " +
    "resume skips processed files") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    val (idxA, idxB, arrivals, ckpt) = (s"$base/a", s"$base/b", s"$base/in", s"$base/ckpt")
    val old = emb.filter(col("vec_id") < 150)
    val fresh = emb.filter(col("vec_id") >= 150)
    SimilaritySearch.ivfIndexBuild(old, idxA, nlist = 4, iters = 2)
    SimilaritySearch.ivfIndexBuild(old, idxB, nlist = 4, iters = 2)
    // batch path on A, streamed path on B — same frozen model
    SimilaritySearch.ivfIndexAppend(fresh, idxA)
    fresh.coalesce(1).write.mode("append").parquet(arrivals)
    SimilaritySearch.ivfIndexAppendStream(spark, idxB, arrivals, ckpt)
    val q = emb.filter(col("vec_id") < 10)
    def res(idx: String): Set[(Long, Long, Long)] =
      SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, nprobe = 2)
        .select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(idxB) === res(idxA))
    assert(res(idxB).nonEmpty)
    // same checkpoint, no new files -> nothing appended twice
    val nBefore = spark.read.parquet(liveDir(idxB, IndexManifest.Layouts.ivf, "vectors")).count()
    SimilaritySearch.ivfIndexAppendStream(spark, idxB, arrivals, ckpt)
    assert(spark.read.parquet(liveDir(idxB, IndexManifest.Layouts.ivf, "vectors")).count() === nBefore)
    // compaction folds the stream segment into the base: answers unchanged,
    // segment gone, and the untouched checkpoint still skips old files
    val before = res(idxB)
    SimilaritySearch.ivfIndexCompact(spark, idxB)
    assert(!dirExists(liveStream(idxB, IndexManifest.Layouts.ivf)))
    assert(res(idxB) === before)
    SimilaritySearch.ivfIndexAppendStream(spark, idxB, arrivals, ckpt) // no-op again
    assert(res(idxB) === before)
  }

  test("persisted IVF search: corpus scan is partition-pruned to the probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-prune").toString
    SimilaritySearch.ivfIndexBuild(emb, idx, nlist = 8, iters = 2)
    val q = emb.filter(col("vec_id") === 0L)
    val p = SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    // one query probing 2 of 8 cells: the vectors FileScan must carry a
    // cell partition filter — reading all 8 partitions for a 2-cell probe
    // is the bug this index exists to prevent.
    assert(
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no cell partition filter in plan:\n$p")
  }

  test("index delete: tombstone hides the id from search; compaction applies it " +
    "physically and clears the segment") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    SimilaritySearch.ivfIndexBuild(vecs, idx, nlist = 2, iters = 2)
    val q = vecs.filter(col("vec_id") === 0L)
    def res(): Seq[(Long, Long)] =
      SimilaritySearch.ivfIndexSearch(spark, idx, q, 4, nprobe = 2)
        .collect().map(r => (r.getAs[Long]("n_id"), r.getAs[Long]("rank"))).sortBy(_._2).toSeq
    val before = res()
    assert(before.map(_._1).contains(4L))
    SimilaritySearch.indexDelete(Seq(4L).toDF("vec_id"), idx)
    val after = res()
    // the deleted id is gone and the remainder is the prior ranking with
    // ranks re-closed (deletion only removes candidates)
    assert(!after.map(_._1).contains(4L))
    assert(after.map(_._1) === before.map(_._1).filterNot(_ == 4L))
    assert(after.map(_._2) === (1L to after.size.toLong))
    // logical until compaction: the physical row is still in the index
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivf, "vectors")).filter(col("n_id") === 4L).count() === 1L)
    SimilaritySearch.ivfIndexCompact(spark, idx)
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivf, "vectors")).filter(col("n_id") === 4L).count() === 0L)
    assert(!dirExists(liveTombs(idx)))
    assert(res() === after) // physically-applied result identical
    // rebuild invalidates stale tombstones: id 4 is findable again
    SimilaritySearch.indexDelete(Seq(4L).toDF("vec_id"), idx)
    SimilaritySearch.ivfIndexBuild(vecs, idx, nlist = 2, iters = 2)
    assert(res().map(_._1).contains(4L))
  }

  test("IVF×PQ delete: tombstone respected at the code stage; compaction cleans both tables") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-del").toString
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    val q = emb.filter(col("vec_id") === 0L)
    val victim = SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 8)
      .orderBy("rank").collect().head.getAs[Long]("n_id")
    SimilaritySearch.indexDelete(Seq(victim).toDF("vec_id"), idx)
    val after = SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 8)
      .collect().map(_.getAs[Long]("n_id"))
    assert(!after.contains(victim))
    SimilaritySearch.ivfPqIndexCompact(spark, idx)
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivfpq, "codes")).filter(col("n_id") === victim).count() === 0L)
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivfpq, "vectors")).filter(col("n_id") === victim).count() === 0L)
    assert(!dirExists(liveTombs(idx)))
    val afterCompact = SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 8)
      .collect().map(_.getAs[Long]("n_id"))
    assert(afterCompact.sorted.toSeq === after.sorted.toSeq)
  }

  test("IVF×PQ index: all-cells probe equals pqTopK; partial probe prunes partitions") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    val q = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // probing every cell = pqTopK's exact pair set (same deterministic
    // model + tie-breaks; the parquet round-trip is value-exact)
    val viaAll = pairs(SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 10, nprobe = 8))
    val inMem = pairs(SimilaritySearch.pqTopK(q, emb, 10))
    assert(viaAll === inMem)
    // partial probe: BOTH scans (codes for ADC, vectors for re-rank) must
    // carry a cell partition filter — reading all cells is the bug this
    // index exists to prevent.
    val p = SimilaritySearch.ivfPqIndexSearch(spark, idx, q.limit(1), 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(
      "PartitionFilters: \\[[^\\]]*cell".r.findAllIn(p).size >= 2,
      s"expected cell partition filters on codes AND vectors scans:\n$p")
    // and recall at nprobe=2 stays useful (cell-miss × quantization loss
    // compound on worst-case random vectors; measured ~0.7 here)
    val exact = SimilaritySearch.bruteForceTopK(q, emb, 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val partial = SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 10, nprobe = 2)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = partial.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF×PQ recall@10 regressed: $recall")
  }

  test("IVF×PQ streaming append: exactly-once ingest, search over union, compaction folds") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-str").toString
    val arrivals = java.nio.file.Files.createTempDirectory("graft-ivfpq-arr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivfpq-ck").toString
    SimilaritySearch.ivfPqIndexBuild(emb.filter(col("vec_id") < 400), idx)
    // a clone of vector 0 arrives via the stream
    emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
      .write.mode("append").parquet(arrivals)
    SimilaritySearch.ivfPqIndexAppendStream(spark, idx, arrivals, ckpt.toString)
    def top(): (Long, Double) = {
      val r = SimilaritySearch
        .ivfPqIndexSearch(spark, idx, emb.filter(col("vec_id") === 0L), 5, nprobe = 8)
        .collect().head
      (r.getAs[Long]("n_id"), r.getAs[Double]("sim"))
    }
    assert(top()._1 === 999999L)
    assert(top()._2 > 0.9999)
    // same checkpoint, no new files → nothing ingested twice
    val nBefore = spark.read.parquet(liveStream(idx, IndexManifest.Layouts.ivfpq)).count()
    SimilaritySearch.ivfPqIndexAppendStream(spark, idx, arrivals, ckpt.toString)
    assert(spark.read.parquet(liveStream(idx, IndexManifest.Layouts.ivfpq)).count() === nBefore)
    // compaction: segment folded into both base tables, answers unchanged
    val before = top()
    SimilaritySearch.ivfPqIndexCompact(spark, idx)
    assert(!dirExists(liveStream(idx, IndexManifest.Layouts.ivfpq)))
    assert(top() === before)
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivfpq, "codes")).filter(col("n_id") === 999999L).count() === 1)
    // checkpoint survives compaction: ingesting again is still a no-op
    SimilaritySearch.ivfPqIndexAppendStream(spark, idx, arrivals, ckpt.toString)
    assert(top() === before)
  }

  test("IVF×PQ append: arrivals searchable under the frozen model, nothing retrained") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    SimilaritySearch.ivfPqIndexBuild(emb.filter(col("vec_id") < 400), idx)
    val booksBefore = spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivfpq, "codebooks")).collect().toSet
    val centsBefore = spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivf, "centroids")).collect().toSet
    // append a clone of vector 0 with a new id — it must become rank 1 for
    // query 0 through the appended code/vector segments
    val clone = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    SimilaritySearch.ivfPqIndexAppend(emb.filter(col("vec_id") >= 400).unionByName(clone), idx)
    val out = SimilaritySearch
      .ivfPqIndexSearch(spark, idx, emb.filter(col("vec_id") === 0L), 5, nprobe = 8)
      .collect()
    assert(out.head.getAs[Long]("n_id") === 999999L)
    assert(out.head.getAs[Double]("sim") > 0.9999)
    // frozen models: append touched neither centroids nor codebooks
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivfpq, "codebooks")).collect().toSet === booksBefore)
    assert(spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivf, "centroids")).collect().toSet === centsBefore)
    // all appended ids present in both segments
    val appended = spark.read.parquet(liveDir(idx, IndexManifest.Layouts.ivfpq, "codes")).filter(col("n_id") >= 400).count()
    assert(appended === emb.filter(col("vec_id") >= 400).count() + 1)
  }

  test("labelNoiseScan: audits query vectors absent from the candidate corpus") {
    // the query id (100) does not exist among candidates — its label must
    // come from the queries frame, not be silently dropped by a join
    // against the candidate label table.
    val cands = Seq(
      (0L, Array(1.0f, 0.00f), 1), (1L, Array(1.0f, 0.01f), 1),
      (2L, Array(1.0f, 0.02f), 1)
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1.0f, 0.015f), 2)).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.labelNoiseScan(q, cands, 3).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 100L)
    assert(r.getInt(1) === 2)
    assert(r.getLong(2) === 3L) // all three candidates are neighbors
    assert(r.getDouble(4) === 1.0) // every neighbor disagrees with label 2
  }

  test("multimodal resize: aspect preserved, box honored, deterministic") {
    val docs = Seq((1L, "x" * 5000), (2L, "y" * 10)).toDF("doc_id", "text")
    val out = Multimodal
      .resize(spark, Multimodal.ingest(docs), maxW = 128, maxH = 128)
      .collect()
      .sortBy(_.doc_id)
    assert(out.forall(r => r.width <= 128 && r.height <= 128 && r.width >= 1 && r.height >= 1))
    val big = out.head // 5000 bytes -> srcW=64+5000%512=396, srcH=64+(5000/7)%512
    assert(big.width === 128 || big.height === 128) // scaled to the box edge
  }

  test("multimodal frame sampling: every stride-th frame with correct offsets") {
    val docs = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    val frames = Multimodal
      .sampleFrames(spark, Multimodal.ingest(docs), frameSize = 16, stride = 2)
      .collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4)) // 6 frames of 16B in 100B
    assert(frames.forall(f => f.offset_bytes === f.frame_idx.toLong * 16))
    assert(frames.forall(_.frame.length === 16))
  }

  test("multimodal: ingest schema + batched stub decode is deterministic and complete") {
    val docs = Seq((1L, "hello world"), (2L, "xyz"), (3L, "")).toDF("doc_id", "text")
    val media = Multimodal.ingest(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val feats1 = Multimodal.extractFeatures(spark, media, batchSize = 2).collect().sortBy(_.doc_id)
    val feats2 = Multimodal.extractFeatures(spark, media, batchSize = 1).collect().sortBy(_.doc_id)
    assert(feats1.length === 3) // every record survives batching
    assert(feats1.map(_.doc_id).toSeq === feats2.map(_.doc_id).toSeq)
    assert(feats1.zip(feats2).forall { case (a, b) => // batch size never changes results
      a.width == b.width && a.height == b.height && a.features.sameElements(b.features)
    })
    val h = feats1.find(_.doc_id == 1L).get
    assert(h.n_bytes === 11L)
    assert(h.features.length === 8)
  }

  test("diversitySample: dense cluster trimmed to cap, sparse cluster survives intact") {
    // ids 0,1 are one vector from each cluster, so the deterministic seeds
    // (first nlist by id) span both clusters and Lloyd separates them
    val a = (Seq(0L) ++ (2L to 30L)).map(i =>
      (i, Array(1.0f, 0.001f * i))) // 30 docs near [1, 0]
    val b = Seq(1L, 31L, 32L).map(i => (i, Array(0.001f * i, 1.0f))) // 3 near [0, 1]
    val e = (a ++ b).toDF("vec_id", "embedding")
    val kept = SimilaritySearch
      .diversitySample(e, cap = 5, nlist = 2, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCell = kept.groupBy(_._2)
    assert(byCell.size === 2)
    byCell.values.foreach(c => assert(c.length <= 5))
    // the sparse cluster is never trimmed
    val bIds = Set(1L, 31L, 32L)
    assert(bIds.subsetOf(kept.map(_._1).toSet))
    // the dense cluster is trimmed to exactly cap
    assert(kept.count(r => !bIds.contains(r._1)) === 5)
    // rerun-stable: the hash lottery has no RNG state
    val again = SimilaritySearch
      .diversitySample(e, cap = 5, nlist = 2, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(kept.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("fully-tombstoned index: compaction leaves an EMPTY index — searches " +
    "return zero rows on both the IVF and IVF×PQ families, not an error") {
    val q = vecs.filter(col("vec_id") === 0L)
    val ivf = java.nio.file.Files.createTempDirectory("graft-ivf-allgone").toString
    SimilaritySearch.ivfIndexBuild(vecs, ivf, nlist = 2, iters = 2)
    SimilaritySearch.indexDelete(vecs.select("vec_id"), ivf)
    SimilaritySearch.ivfIndexCompact(spark, ivf)
    assert(SimilaritySearch.ivfIndexSearch(spark, ivf, q, 3, nprobe = 2).count() === 0L)
    val pq = java.nio.file.Files.createTempDirectory("graft-ivfpq-allgone").toString
    SimilaritySearch.ivfPqIndexBuild(vecs, pq, nlist = 2, iters = 2, m = 3, dim = 3, pqNlist = 2)
    SimilaritySearch.indexDelete(vecs.select("vec_id"), pq)
    SimilaritySearch.ivfPqIndexCompact(spark, pq)
    assert(SimilaritySearch.ivfPqIndexSearch(spark, pq, q, 3, nprobe = 2).count() === 0L)
  }

  test("persisted hybrid serving: the PRUNED composed plan (rrfFuse over " +
    "postFilter over ivfPqIndexSearch + BM25 lane) keeps PartitionFilters on both index scans") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-hyb-prune").toString
    SimilaritySearch.ivfPqIndexBuild(emb, idx)
    val q = emb.filter(col("vec_id") < 8)
    val hits = SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 40, nprobe = 2)
    val pf = SimilaritySearch.postFilter(hits, emb, col("label") =!= 3, 20)
      .select(col("q_id"), col("n_id").as("id"), col("rank"))
    val txt = graft.operators.TextIndex
      .bm25TopK(docs, Seq("filter", "stream", "vector"), 20)
      .select(col("doc_id").as("id"), col("rk").as("rank"))
    val qids = q.select(col("vec_id").as("q_id"))
    val plan = SimilaritySearch.rrfFuse(pf, qids.crossJoin(broadcast(txt)), 10)
      .queryExecution.executedPlan.toString
    // composing postFilter + fusion on top must NOT lose the index lane's
    // cell pruning: both the code scan (ADC) and the vector scan (re-rank)
    // still carry a cell partition filter in the fused plan.
    val pruned = "PartitionFilters: \\[[^\\]]*cell".r.findAllIn(plan).size
    assert(pruned >= 2, s"expected >=2 cell-pruned scans in the fused plan, got $pruned:\n$plan")
  }

  test("IVF×PQ compact on a mixed half-readable index fails loudly and " +
    "keeps the tombstones (pending deletes are never silently dropped)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-mixed").toString
    SimilaritySearch.ivfPqIndexBuild(vecs, idx, nlist = 2, iters = 2, m = 3, dim = 3, pqNlist = 2)
    SimilaritySearch.indexDelete(Seq(1L).toDF("vec_id"), idx)
    // simulate a crash between the two swaps of a prior compact: one table gone
    val codes = new org.apache.hadoop.fs.Path(liveDir(idx, IndexManifest.Layouts.ivfpq, "codes"))
    codes.getFileSystem(spark.sessionState.newHadoopConf()).delete(codes, true)
    val err = intercept[RuntimeException] {
      SimilaritySearch.ivfPqIndexCompact(spark, idx)
    }
    assert(err.getMessage.contains("mixed state"))
    assert(dirExists(liveTombs(idx)), "tombstones must survive the refusal")
  }
}

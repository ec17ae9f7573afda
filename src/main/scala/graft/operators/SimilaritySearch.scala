package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Vector search over an embedding column (SURVEY.md §7.2 M5).
  *
  * Exact baseline: [[bruteForceTopK]] — the (small) query set is broadcast
  * against the full candidate corpus, so the corpus is scanned once,
  * partition-parallel, with no shuffle of the candidate side; only the
  * per-query top-k heads shuffle (window by query). Norms are precomputed
  * per side, never per pair.
  *
  * Scale paths, by what bounds the per-query work:
  *  - [[lshTopK]]: signed-random-projection buckets + query-directed
  *    multiprobe — recall trades off against `numPlanes`/`probes`.
  *  - [[ivfTopK]] / [[ivfIndexBuild]]+[[ivfIndexSearch]]: coarse k-means
  *    cells, `nprobe` re-ranked — plus the persisted, cell-partitioned
  *    (partition-pruned) index lifecycle with streaming append/compact.
  *  - [[pqTopK]] / [[ivfPqIndexBuild]]+[[ivfPqIndexSearch]]: product-
  *    quantized 8-byte codes scanned via ADC, survivors exact-re-ranked;
  *    composed with IVF cells this is the 100 TB serving architecture.
  *
  * Serving-side compositions: [[filteredTopK]]/[[filteredTopKPost]]
  * (metadata-predicate filtered search, pre- vs post-filter strategies),
  * [[rrfFuse]] (hybrid BM25×vector reciprocal-rank fusion),
  * [[mmrRerank]] (diversity), [[hardNegatives]], [[labelNoiseScan]],
  * [[truncationRankingMetrics]] (Matryoshka audit), [[diversitySample]].
  */
object SimilaritySearch {

  // array<double> materialized per vector BEFORE any pairwise join — keeps
  // DotProduct's implicit float→double cast out of the quadratic stage.
  // dims > 0 truncates to the leading prefix (Matryoshka-style) — the
  // slice happens once per vector here, never per pair.
  private def withNorm(
      df: DataFrame,
      idAs: String,
      vecAs: String,
      nrmAs: String,
      dims: Int = 0): DataFrame = {
    val v = col("embedding").cast("array<double>")
    df.select(col("vec_id").as(idAs), (if (dims > 0) slice(v, 1, dims) else v).as(vecAs))
      .withColumn(nrmAs, norm(col(vecAs)))
  }

  /** Exact cosine top-k neighbors for each query vector (self excluded).
    * `dims` > 0 ranks under the leading-`dims` prefix of every embedding
    * (Matryoshka truncation) instead of the full vector. */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      dims: Int = 0): DataFrame = {
    val q = withNorm(queries, "q_id", "qv", "qn", dims)
    val c = withNorm(candidates, "n_id", "nv", "nn", dims)
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** SRP-LSH bucketed ANN: candidates restricted to the query's bucket
    * (plus QUERY-DIRECTED multiprobe), exact cosine re-rank, top-k.
    *
    * Recall/cost is governed by `numPlanes` (each plane halves the probed
    * fraction) and by which extra buckets a query probes. Multiprobe here
    * is query-directed (Lv et al., VLDB 2007): a neighbor lands in a
    * different bucket only by disagreeing on some plane, and the
    * disagreement probability of plane `i` scales with how CLOSE the
    * query's projection `q·p_i` is to zero — so the probe sequence is the
    * `numPlanes+1` flip-masks cheapest by summed |projection| over flipped
    * bits (enumerated over all 2^numPlanes masks as one codegen'd
    * sort/slice on the broadcast-sized query side; mask 0 = own bucket is
    * always cost-0 first). `probes` sets the sequence length (default
    * numPlanes+1 = the blind-Hamming-1 candidate budget); probes chase
    * the planes actually likely to be wrong, including multi-bit flips
    * when two margins are tiny. Measured recall@10 on the
    * (near-orthogonal, worst-case) random test embeddings
    * (tools/AnnRecallProbe; sf0.001 20-query / sf0.01 8-query sets),
    * planes=4: blind Hamming-1 0.40 → query-directed 0.46/0.41 at the
    * same 5-probe budget, 0.60/0.61 at probes=7 — the q_ann_lsh_recall
    * gate config, floor 0.5. Clustered real-world embeddings sit far
    * above these floors; when recall must be tunable independently of
    * bucket width, prefer [[ivfTopK]] (0.69/0.89 measured on the same
    * sets; both families regression-pinned in
    * SimilarityAndMultimodalSpec). */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      numPlanes: Int = 4,
      dim: Int = 64,
      multiprobe: Boolean = true,
      probes: Int = 0): DataFrame = {
    val planes = randomPlanes(numPlanes, dim)
    val c = withNorm(candidates, "n_id", "nv", "nn")
      .withColumn("bucket", srpBucket(col("nv"), planes))
    // Projections computed ONCE per query; bucket bits and probe costs both
    // derive from them. Query side is broadcast-small, so the 2^numPlanes
    // mask enumeration is driver-negligible and executor-trivial.
    val qBase = withNorm(queries, "q_id", "qv", "qn")
      .withColumn("projs", array(planes.map(p => dot(col("qv"), lit(p.toArray))): _*))
      .withColumn(
        "b0",
        (0 until numPlanes)
          .map(i => when(element_at(col("projs"), i + 1) >= 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((x, y) => x.bitwiseOR(y)))
    val q =
      if (!multiprobe) qBase.withColumn("bucket", col("b0"))
      else {
        val nProbes = if (probes > 0) probes else numPlanes + 1
        val maskCosts = (0 until (1 << numPlanes)).map { mask =>
          val cost = (0 until numPlanes)
            .filter(i => (mask & (1 << i)) != 0)
            .map(i => abs(element_at(col("projs"), i + 1)))
            .foldLeft(lit(0.0))(_ + _)
          struct(cost.as("cost"), lit(mask.toLong).as("mask"))
        }
        qBase
          .withColumn(
            "mask",
            explode(slice(sort_array(array(maskCosts: _*)), 1, nProbes).getField("mask")))
          .withColumn("bucket", col("mask").bitwiseXOR(col("b0")))
      }
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
    * corpus into `nlist` cells; each query exactly re-ranks only the
    * `nprobe` nearest cells. The alternative coarse-quantization scale path
    * to [[lshTopK]] — recall degrades gracefully with `nprobe` instead of
    * with random hyperplane count.
    *
    * Training is deterministic: seeds are the first `nlist` vectors by id,
    * refined with `iters` Lloyd iterations computed as DataFrame
    * aggregations. Only the centroid *model* (nlist × dim doubles) ever
    * reaches the driver — the corpus itself is assigned and searched fully
    * distributed, so the plan scales with executors: one broadcast-assign
    * narrow pass per iteration plus one shuffle for the mean aggregation.
    */
  // array_max over (dot, cid) structs — NOT a when(...)-reduce chain, which
  // references each partial struct twice per level and doubles the
  // expression tree per centroid (profiled 10× slower at nlist=8).
  /** kNN label-disagreement scan (confident-learning-lite): for each query
    * vector, the fraction of its exact top-`k` cosine neighbors whose label
    * differs — high `noise_rate` rows are mislabel candidates, THE curation
    * signal before training a classifier head on the corpus. Returns
    * `(vec_id, label, n_nbrs, n_diff, noise_rate)` for the query set.
    *
    * Built on [[bruteForceTopK]], so it inherits that shape: query side
    * broadcast, candidate corpus scanned once with no candidate shuffle,
    * only per-query top-k heads exchange. Exact by construction — swap in
    * [[ivfTopK]]/[[lshTopK]] as the scale path when the query set is the
    * whole corpus (same composition, bucketed neighbor generation); the
    * audit is usually run over a bounded suspect/sample set, which is
    * exactly the broadcast-query contract. Labels join back on the
    * model-sized id→label table (broadcast under AQE). */
  def labelNoiseScan(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // The query's own label comes from the QUERIES frame — joining q_id
    // against the candidate label table instead would silently drop any
    // query vector absent from the candidate corpus (the operator must not
    // require queries ⊆ candidates).
    val qLabels = queries.select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val nLabels = candidates.select(col("vec_id").as("n_id"), col("label").as("n_label"))
    val nbrs = bruteForceTopK(queries, candidates, k)
    nbrs
      .join(qLabels, Seq("q_id"))
      .join(nLabels, Seq("n_id"))
      .groupBy(col("q_id").as("vec_id"), col("q_label").as("label"))
      .agg(
        count(lit(1)).cast("long").as("n_nbrs"),
        count(when(col("n_label") =!= col("q_label"), 1)).cast("long").as("n_diff"))
      .withColumn("noise_rate", col("n_diff").cast("double") / col("n_nbrs"))
      .orderBy("vec_id")
  }

  /** Hard-negative mining for contrastive/classifier training: for each
    * query vector, the `k` most-similar candidates with a DIFFERENT label
    * — the examples a margin loss learns most from. Same scan shape as
    * [[bruteForceTopK]] (queries broadcast, corpus scanned once with no
    * candidate-side shuffle, per-query top-k heads exchange under the
    * window); the label-mismatch predicate rides the same join, so
    * same-label rows never reach the ranking. Returns
    * `(q_id, q_label, rank, n_id, n_label, sim)`. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(
        col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("qv"),
        col("label").as("q_label"))
      .withColumn("qn", norm(col("qv")))
    val c = candidates
      .select(
        col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("nv"),
        col("label").as("n_label"))
      .withColumn("nn", norm(col("nv")))
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id") && col("q_label") =!= col("n_label"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "q_label", "rank", "n_id", "n_label", "sim")
  }

  private def assign(cents: Array[(Int, Array[Double])], vecCol: String): Column =
    assignVec(cents, col(vecCol))

  private def assignVec(cents: Array[(Int, Array[Double])], vec: Column): Column =
    array_max(array(cents.map { case (cid, v) =>
      struct(dot(vec, lit(v)).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Deterministic seeds + Lloyd refinement (means over the assigned
    * cells). Only the nlist × dim centroid model reaches the driver.
    *
    * Per-cell means run as ONE hash aggregate with `dim` sum expressions
    * inside an array() — map-side combine reduces the shuffle to nlist×dim
    * partial rows per iteration regardless of corpus size. The earlier
    * explode-per-dimension formulation shuffled corpus×dim rows into the
    * first groupBy (64× the corpus at dim=64) plus a second groupBy and a
    * per-cell sort; measured ~20% faster per iteration even at sf0.1's
    * trivial volume (graft.tools.IvfBench: 0.40 s vs 0.51 s), and the gap
    * is the whole explode volume at real scale. Empty input → empty model
    * (callers answer degenerate corpora as no-ops, not crashes).
    *
    * Numeric discipline (since round 6, the [[Dedup.semanticModel]]
    * contract): per-dim sums are EXACT BIGINTs over `⌊x·4096⌋`-quantized
    * components, so the model — and therefore every IVF/PQ cell boundary
    * and search result — is independent of partition/merge order (a double
    * `avg` is not), bit-stable across cluster layouts, and replayable by a
    * DuckDB oracle as unrolled CTEs (q_ann_ivf is fully oracled on the
    * back of this). Centroid = (Σq / n) / 4096 — two correctly-rounded
    * double divisions, the second exact (power of two). The ≤2⁻¹²
    * quantization nudge is far inside the gates' recall slack. */
  private val QuantScale = 4096
  private def trainCentroids(
      c: DataFrame,
      nlist: Int,
      iters: Int): Array[(Int, Array[Double])] = {
    var centroids: Array[(Int, Array[Double])] = c
      .orderBy("n_id")
      .limit(nlist)
      .select("nv")
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    if (centroids.isEmpty) return centroids
    val dims = centroids.head._2.length
    for (_ <- 0 until iters) {
      val means = c
        .withColumn("cell", assign(centroids, "nv"))
        .groupBy("cell")
        .agg(
          array((0 until dims).map(i =>
            sum(floor(element_at(col("nv"), i + 1) * QuantScale).cast("long"))): _*).as("sx"),
          count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2)
          r.getInt(0) -> r.getSeq[Long](1).map(s => s.toDouble / n / QuantScale).toArray
        }
      if (means.nonEmpty) centroids = means
    }
    centroids
  }

  /** Semantic diversity downsample: cap how many vectors any one region of
    * embedding space contributes. The corpus is assigned to k-means cells
    * (same Lloyd model as [[ivfTopK]] — O(nlist × dim) driver state, one
    * broadcast-assign narrow pass), then each cell keeps at most `cap`
    * members in deterministic hash-lottery order (xxhash64 of the id —
    * rerun-stable, no RNG state), so over-represented semantic clusters are
    * trimmed while sparse regions survive intact. The standard
    * embedding-space alternative to uniform sampling for training-corpus
    * balance.
    *
    * The per-cell window partitions by cell id — nlist partitions of
    * at-most-cell-size rows; with heavy clustering one cell can be large,
    * but the window only top-k's it (WindowGroupLimit prunes past `cap`
    * per partition before the sort completes). Returns
    * (vec_id, cell, rk ≤ cap).
    *
    * The lottery key is the suite's Knuth multiplicative hash
    * `(id·2654435761) mod 2³²` (int64-safe for id < ~3.4e9; the
    * train-split idiom) rather than xxhash64 — engine-replayable integer
    * arithmetic, which together with the order-free quantized Lloyd model
    * makes this query fully DuckDB-oracled. */
  def diversitySample(
      embeddings: DataFrame,
      cap: Int,
      nlist: Int = 8,
      iters: Int = 2): DataFrame = {
    val c = withNorm(embeddings, "n_id", "nv", "nn")
    val centroids = trainCentroids(c, nlist, iters)
    if (centroids.isEmpty) {
      val s = embeddings.sparkSession
      import s.implicits._
      return Seq.empty[(Long, Int, Long)].toDF("vec_id", "cell", "rk")
    }
    val byCell = Window
      .partitionBy(col("cell"))
      .orderBy(pmod(col("n_id") * lit(2654435761L), lit(4294967296L)), col("n_id"))
    c.withColumn("cell", assign(centroids, "nv"))
      .withColumn("rk", row_number().over(byCell).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("n_id").as("vec_id"), col("cell"), col("rk"))
  }

  /** The corpus's semantic-cell assignment under the deterministic
    * quantized-Lloyd model — `(vec_id, cell)`. The clustering half of
    * [[diversitySample]] exposed on its own, for compositions that attach
    * cell structure to OTHER tables (topic keywords join it to documents;
    * any per-cluster rollup works the same way). Engine-replayable: the
    * model unrolls as oracle CTEs (the q_ann_ivf contract). */
  def semanticCells(
      embeddings: DataFrame,
      nlist: Int = 8,
      iters: Int = 2): DataFrame = {
    val c = withNorm(embeddings, "n_id", "nv", "nn")
    val centroids = trainCentroids(c, nlist, iters)
    if (centroids.isEmpty) {
      val s = embeddings.sparkSession
      import s.implicits._
      return Seq.empty[(Long, Int)].toDF("vec_id", "cell")
    }
    c.withColumn("cell", assign(centroids, "nv"))
      .select(col("n_id").as("vec_id"), col("cell"))
  }

  /** Persisted IVF index — the build/search split of [[ivfTopK]] for a
    * corpus that outlives one job (the ANN sibling of the persisted
    * MinHash index, [[Dedup.minhashIndex]]). Layout under `dir`:
    *
    *  - `centroids/`: the nlist × dim Lloyd model, (cid, vec) — KB-sized;
    *  - `vectors/`: (n_id, nv, nn) assignments partitioned BY CELL, so a
    *    search's `cell IN (probed)` filter is partition-pruning — only
    *    nprobe/nlist of the corpus bytes are ever read, which is the
    *    disk-level win over re-assigning in memory each run.
    *
    * [[ivfIndexAppend]] assigns new vectors with the SAME frozen centroid
    * model and appends their cell partitions — arriving data never
    * triggers retraining or a corpus rescan (the incremental-dedup
    * contract). Searches replay [[ivfTopK]]'s exact probe/re-rank plan, so
    * build+search equals the in-memory operator bit-for-bit on the same
    * model. */
  def ivfIndexBuild(
      candidates: DataFrame,
      dir: String,
      nlist: Int = 8,
      iters: Int = 2): Unit = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val layout = IndexManifest.Layouts.ivf
    // a rebuild commits a fresh generation — prior deletes vanish with it
    val next = layout.advance(IndexManifest.resolve(spark, dir, layout))
    val c = withNorm(candidates, "n_id", "nv", "nn")
    val centroids = trainCentroids(c, nlist, iters)
    centroids.toSeq
      .toDF("cid", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(next.tableDir(dir, "centroids"))
    val assigned =
      if (centroids.isEmpty) c.withColumn("cell", lit(0)).limit(0) // empty corpus → empty index
      else c.withColumn("cell", assign(centroids, "nv"))
    // the trained-on count rides the write job itself (observe) instead of
    // a second read-back count over the just-written segment (guide §1.2)
    val obs = org.apache.spark.sql.Observation()
    assigned.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy("cell").parquet(next.tableDir(dir, "vectors"))
    val trained = obs.get("n").asInstanceOf[Long]
    // a (re)build replaces the frozen model, so any recall calibration
    // measured against the OLD model is dropped with it — serving a
    // stale curve silently would be the auto-nprobe lane's one lie
    IndexManifest.commit(
      spark, dir,
      dropRecallProps(next).withProp(RebuildTrigger.TrainedOnProp, trained.toString),
      layout)
  }

  /** Strip the recall-calibration props (they describe the frozen model
    * a rebuild is replacing); ks present, for re-calibration after. */
  private def dropRecallProps(st: IndexManifest.State): IndexManifest.State =
    st.copy(props = st.props.filter { case (k, _) => !k.startsWith("recall.") })

  private val RecallKey = """recall\.k(\d+)\.np\d+""".r

  /** The k values a props map carries calibration curves for. */
  private[operators] def recallKs(props: Map[String, String]): Seq[Int] =
    props.keys.collect { case RecallKey(k) => k.toInt }.toSeq.distinct.sorted

  /** Centroid-model staleness of the persisted IVF index: |live −
    * trained_on| / trained_on, live rows from the same cheap counts the
    * compaction trigger uses (base + stream − pending tombstones). */
  def ivfIndexStaleness(spark: org.apache.spark.sql.SparkSession, dir: String): Option[Double] = {
    val st = ivfState(spark, dir)
    RebuildTrigger.trainedOn(st).map { t =>
      val live =
        CompactionTrigger.rowsIn(spark, st.tableDir(dir, "vectors")) +
          CompactionTrigger.rowsIn(spark, st.streamDir(dir)) -
          Tombstones.read(spark, dir, st.tombstones).fold(0L)(_.count())
      if (t == 0L) { if (live > 0L) 1.0 else 0.0 }
      else math.abs(live - t).toDouble / t
    }
  }

  /** [[RebuildTrigger]] applied to the IVF index: retrain the frozen
    * Lloyd model over `candidates` (the caller's CURRENT corpus) when the
    * live row count has drifted past `ratio` of the training set — the
    * point where frozen-model cell balance measurably degrades probe
    * efficiency. Appends/deletes stay EXACT under the frozen model at any
    * drift; this is the model-quality knob, self-applying. A pre-props
    * (round ≤8) index never fires — rebuild it once to opt in. */
  def ivfIndexMaybeRebuild(
      candidates: DataFrame,
      dir: String,
      nlist: Int = 8,
      iters: Int = 2,
      ratio: Double = 0.5): Boolean = {
    val spark = candidates.sparkSession
    val st = ivfState(spark, dir)
    val live =
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "vectors")) +
        CompactionTrigger.rowsIn(spark, st.streamDir(dir)) -
        Tombstones.read(spark, dir, st.tombstones).fold(0L)(_.count())
    val due = RebuildTrigger.due(RebuildTrigger.trainedOn(st), live, ratio)
    if (due) ivfIndexBuild(candidates, dir, nlist, iters)
    due
  }

  private def ivfState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): IndexManifest.State =
    IndexManifest.resolve(spark, dir, IndexManifest.Layouts.ivf)

  /** Assign a new batch under the index's frozen centroid model and append
    * its rows (partition-append; existing cells' files are untouched).
    * The corpus-growth path: replacing or re-adding an existing id goes
    * through [[ivfIndexUpsert]] — ids covered by an earlier upsert's
    * scoped tombstone refuse loudly ([[Tombstones.requireAppendable]]). */
  def ivfIndexAppend(newVectors: DataFrame, dir: String): Unit = {
    val spark = newVectors.sparkSession
    val st = ivfState(spark, dir)
    val centroids = readCentroids(spark, dir, st)
    require(centroids.nonEmpty, s"ivf index at $dir has an empty centroid model")
    Tombstones.requireAppendable(
      newVectors.select("vec_id"), dir, "vec_id", st.tombstones,
      IndexManifest.segGen(st.tables("vectors")))
    withNorm(newVectors, "n_id", "nv", "nn")
      .withColumn("cell", assign(centroids, "nv"))
      .write.mode("append").partitionBy("cell")
      .parquet(st.tableDir(dir, "vectors"))
  }

  /** Atomic replace on the IVF index — the re-embedding mutation (a doc
    * re-crawled and re-encoded): for every `vec_id` in `newVectors`, the
    * old vector stops serving and the new one starts in ONE manifest
    * commit, via generation-scoped tombstones (the
    * [[graft.operators.TextSearchIndex.upsert]] discipline on the vector
    * lane). Base untouched (carried); batch ids tombstoned scoped to the
    * CURRENT generation; the streamed segment rewritten at the next
    * generation without the batch ids (pending deletes applied
    * physically to the carried rows, carried tombstones kept at their
    * scope minus the batch ids') plus
    * the batch assigned under the FROZEN model. Cost: O(stream + batch)
    * — the LSM L0 rewrite, never the base. Also the sanctioned re-add
    * of a deleted id. */
  def ivfIndexUpsert(newVectors: DataFrame, dir: String): Unit = {
    val spark = newVectors.sparkSession
    val layout = IndexManifest.Layouts.ivf
    val prev = ivfState(spark, dir)
    val centroids = readCentroids(spark, dir, prev)
    require(centroids.nonEmpty, s"ivf index at $dir has an empty centroid model")
    val next = layout.advance(prev, carry = Set("centroids", "vectors"))
    val ids = newVectors.select(col("vec_id").cast("long").as("n_id")).distinct()
    val assigned = withNorm(newVectors, "n_id", "nv", "nn")
      .withColumn("cell", assign(centroids, "nv"))
      .select("n_id", "nv", "nn", "cell")
    val streamPath = new org.apache.hadoop.fs.Path(prev.streamDir(dir))
    val carried =
      (if (!streamPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(streamPath))
        None
      else
        try Some(spark.read.parquet(prev.streamDir(dir)))
        catch { case _: org.apache.spark.sql.AnalysisException => None })
        .map { s =>
          Tombstones.dropScoped(
            s.withColumn("seg_gen", lit(IndexManifest.segGen(prev.stream))),
            dir, "n_id", "seg_gen", prev.tombstones)
            .drop("seg_gen")
            .join(ids, Seq("n_id"), "left_anti")
            .select("n_id", "nv", "nn", "cell")
        }
    carried.fold(assigned)(_ unionByName assigned)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(next.streamDir(dir))
    // carried pending tombstones keep their scope (an unscoped delete
    // keeps killing future appends); only the batch ids' prior rows are
    // dropped — their replacement commits above the scoped kill below
    val killed = ids.select(col("n_id").as("ts_id"), lit(prev.generation).as("ts_gen"))
    Tombstones.read(spark, dir, prev.tombstones)
      .map(_.join(ids.select(col("n_id").as("ts_id")), Seq("ts_id"), "left_anti"))
      .fold(killed)(_ unionByName killed)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/${next.tombstones}")
    IndexManifest.commit(spark, dir, next, layout)
  }

  private def readCentroids(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      state: IndexManifest.State): Array[(Int, Array[Double])] =
    spark.read.parquet(state.tableDir(dir, "centroids"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  /** Continuous-ingest version of [[ivfIndexAppend]]: drain a parquet
    * directory of arriving vectors into the index as a Structured
    * Streaming job (Trigger.AvailableNow + checkpoint — the
    * [[graft.streaming.DailyIngest.runIncremental]] exactly-once
    * contract: re-invoking with the same checkpoint assigns and appends
    * ONLY files that arrived since the last run). Assignment under the
    * frozen centroid model is a pure projection, so it runs inside the
    * stream — no foreachBatch, no retraining, no corpus rescan.
    *
    * Layout: streamed rows land in their own `vectors-stream` segment
    * (cell-partitioned like the base) because a streaming parquet sink
    * owns its directory through a `_spark_metadata` commit log — a reader
    * of a MIXED directory would silently see only sink-committed files
    * and lose the batch-built base. [[ivfIndexSearch]] unions base +
    * stream segments (the [[graft.kv.LogStructuredTable]] base+log
    * shape); cell pruning pushes into both branches. */
  def ivfIndexAppendStream(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      arrivalsDir: String,
      checkpoint: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val st = ivfState(spark, indexDir)
    val centroids = readCentroids(spark, indexDir, st)
    require(centroids.nonEmpty, s"ivf index at $indexDir has an empty centroid model")
    val raw = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .parquet(arrivalsDir)
    val assigned = raw
      .select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("nv"))
      .withColumn("nn", norm(col("nv")))
      .withColumn("cell", assign(centroids, "nv"))
    val q = assigned.writeStream
      .format("parquet")
      .partitionBy("cell")
      .option("path", st.streamDir(indexDir))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Logical delete from a persisted IVF or IVF×PQ index: the ids land in
    * an append-only `tombstones/` segment and every search anti-joins them
    * out — no index file is touched, so a delete is O(ids) regardless of
    * corpus size (the LSM tombstone discipline, [[graft.kv
    * .LogStructuredTable]]'s delete shape applied to the ANN lifecycle).
    * The next compaction applies tombstones physically and clears the
    * segment.
    *
    * Contract: ids are global — a tombstone hides EVERY row of that id,
    * including ones appended after the delete, until a compaction clears
    * it or an [[ivfIndexUpsert]]/[[ivfPqIndexUpsert]] of that very id
    * replaces it (the upsert drops the id's pending tombstones — the one
    * sanctioned re-add path). [[ivfIndexBuild]]/[[ivfPqIndexBuild]]
    * commit a fresh [[IndexManifest]] generation — a rebuild starts from
    * a clean slate. The anti join carries no broadcast hint: AQE
    * broadcasts the segment while it is small (the expected state —
    * compaction bounds it) and degrades to a shuffled anti join rather
    * than a driver OOM if deletes pile up.
    *
    * When to compact: deletes stay correct at ANY tombstone volume (the
    * R7ScaleBench heavy-tombstone probe measures search under 30%
    * uncompacted deletes), so the trigger is purely a read-cost knob —
    * compact once the segment exceeds ~1% of base rows (keeps the
    * anti-join build side broadcast-sized at corpus scale) or at the
    * stream-epoch fold the index was due anyway, whichever first
    * ([[Tombstones]] has the shared heuristic note). */
  def indexDelete(ids: DataFrame, dir: String): Unit = {
    val spark = ids.sparkSession
    // UNSCOPED (ts_gen = MaxValue): hides the id in every segment,
    // present and future, until compaction — or until an upsert of that
    // very id drops the tombstone. A live-generation scope here would let
    // an unrelated later upsert (which bumps the generation) put a
    // subsequent plain append of the deleted id above the tombstone's
    // scope — a silent takedown resurrection.
    Tombstones.delete(ids, dir, IndexManifest.liveTombstones(spark, dir))
  }

  private def readTombstones(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[DataFrame] =
    Tombstones.read(spark, dir, IndexManifest.liveTombstones(spark, dir))

  /** Generation-scoped tombstone application over segment-tagged rows
    * ([[Tombstones.dropScoped]]; the tag column is consumed). Untagged
    * rows fall back to the unscoped drop. */
  private def dropTombstoned(
      rows: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val seg = IndexManifest.liveTombstones(spark, dir)
    if (rows.columns.contains("seg_gen"))
      Tombstones.dropScoped(rows, dir, "n_id", "seg_gen", seg).drop("seg_gen")
    else Tombstones.drop(rows, dir, "n_id", seg)
  }

  /** Major compaction: fold the streamed segment back into the base (the
    * LSM lifecycle close — after enough stream epochs the union's
    * two-branch scan and the stream segment's small files are worth one
    * rewrite) and apply any [[indexDelete]] tombstones physically. Runs
    * when either a streamed segment or tombstones exist.
    *
    * Crash consistency ([[IndexManifest]]): the folded base is written
    * under the NEXT generation's name first, then one atomic manifest
    * commit swaps base + stream + tombstone segments together — a crash
    * before the commit leaves the old generation fully live, a crash
    * after it the new one; the old delete-then-rename window (missing
    * base silently read as an empty index) is gone. The source CHECKPOINT
    * is untouched — a later [[ivfIndexAppendStream]] with the same
    * checkpoint still skips already-ingested files. */
  def ivfIndexCompact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val layout = IndexManifest.Layouts.ivf
    val prev = IndexManifest.resolve(spark, dir, layout)
    val streamPath = new org.apache.hadoop.fs.Path(prev.streamDir(dir))
    val fs = streamPath.getFileSystem(conf)
    val hasStream = fs.exists(streamPath)
    if (!hasStream && readTombstones(spark, dir).isEmpty) return
    val next = layout.advance(prev, carry = Set("centroids"))
    indexVectorsOpt(spark, dir) match {
      case None =>
        // Nothing readable (empty-corpus build): tombstones have nothing
        // to apply to — the manifest bump below retires them and leaves
        // the (carried) zero-row base name untouched.
        IndexManifest.commit(
          spark, dir, next.copy(tables = next.tables + ("vectors" -> prev.tables("vectors"))),
          layout)
      case Some(all) =>
        dropTombstoned(all, spark, dir)
          .select("n_id", "nv", "nn", "cell")
          .write.mode("overwrite").partitionBy("cell")
          .parquet(next.tableDir(dir, "vectors"))
        IndexManifest.commit(spark, dir, next, layout)
    }
  }

  /** Apply the [[CompactionTrigger]] heuristic to the IVF index: compact
    * when pending tombstones exceed `ratio` of the base rows or the
    * streamed segment exceeds `streamRatio` of them. Returns whether a
    * compaction ran. */
  def ivfIndexMaybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      ratio: Double = 0.01,
      streamRatio: Double = 0.25): Boolean = {
    val st = ivfState(spark, dir)
    val due = CompactionTrigger.due(
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "vectors")),
      CompactionTrigger.rowsIn(spark, st.streamDir(dir)),
      readTombstones(spark, dir).fold(0L)(_.count()),
      ratio,
      streamRatio)
    if (due) ivfIndexCompact(spark, dir)
    due
  }

  /** [[CompactionTrigger]] applied to the IVF×PQ index (base size read
    * from the 8-byte code table — the side every search scans). */
  def ivfPqIndexMaybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      ratio: Double = 0.01,
      streamRatio: Double = 0.25): Boolean = {
    val st = ivfPqState(spark, dir)
    val due = CompactionTrigger.due(
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "codes")),
      CompactionTrigger.rowsIn(spark, st.streamDir(dir)),
      readTombstones(spark, dir).fold(0L)(_.count()),
      ratio,
      streamRatio)
    if (due) ivfPqIndexCompact(spark, dir)
    due
  }

  /** [[RebuildTrigger]] applied to the IVF×PQ index — same contract as
    * [[ivfIndexMaybeRebuild]], retraining BOTH frozen models (coarse
    * centroids and PQ codebooks) when live rows drift past `ratio` of the
    * training set: quantization error for arrivals far from the training
    * distribution is the cost the trigger bounds. */
  def ivfPqIndexMaybeRebuild(
      candidates: DataFrame,
      dir: String,
      nlist: Int = 8,
      iters: Int = 2,
      m: Int = 8,
      dim: Int = 64,
      pqNlist: Int = 16,
      pqIters: Int = 2,
      ratio: Double = 0.5): Boolean = {
    val spark = candidates.sparkSession
    val st = ivfPqState(spark, dir)
    val live =
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "codes")) +
        CompactionTrigger.rowsIn(spark, st.streamDir(dir)) -
        readTombstones(spark, dir).fold(0L)(_.count())
    val due = RebuildTrigger.due(RebuildTrigger.trainedOn(st), live, ratio)
    if (due) ivfPqIndexBuild(candidates, dir, nlist, iters, m, dim, pqNlist, pqIters)
    due
  }

  /** Base + streamed segments of the index, unioned (either may not exist
    * yet on a freshly-built or stream-only index); None when NEITHER is
    * readable — an empty-corpus build writes a zero-row base whose parquet
    * dir has no schema to infer. */
  private def indexVectorsOpt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[DataFrame] =
    indexVectorsAt(spark, dir, ivfState(spark, dir))

  private def indexVectorsAt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State): Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    def readIf(p: String): Option[DataFrame] = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!path.getFileSystem(conf).exists(path)) None
      else
        // A stream run that committed zero batches (checkpoint already
        // covers every arrival) leaves a segment holding only an empty
        // _spark_metadata sink log — schema inference fails on it, and
        // "no rows here yet" is the correct reading.
        try Some(spark.read.parquet(p))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    // rows tagged with their segment's creation generation — the scope
    // key for generation-scoped tombstones (an upsert's replacement
    // segment outranks the scoped delete that killed the old copies)
    (readIf(st.tableDir(dir, "vectors"))
      .map(_.withColumn("seg_gen", lit(IndexManifest.segGen(st.tables("vectors"))))) ++
      readIf(st.streamDir(dir))
        .map(_.withColumn("seg_gen", lit(IndexManifest.segGen(st.stream)))))
      .reduceLeftOption(_ unionByName _)
  }

  /** Search the persisted index: nprobe nearest cells per query, exact
    * cosine re-rank inside them — [[ivfTopK]]'s plan with the scan side
    * PARTITION-PRUNED to the union of probed cells (a model-sized `IN`
    * list: ≤ nlist values, collected from the KB centroid table, never
    * from the corpus). */
  def ivfIndexSearch(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2): DataFrame =
    ivfIndexSearchState(spark, dir, ivfState(spark, dir), queries, k, nprobe)

  /** [[ivfIndexSearch]] pinned to a RETAINED manifest generation
    * ([[IndexManifest.readAt]]) — the vector lane's time-travel read
    * ([[graft.operators.TextSearchIndex.searchAsOf]]'s contract):
    * reproduce the ranking a past generation served — its frozen model,
    * its segments, its pending tombstones — after an upsert, compaction
    * or rebuild moved the live index on. Fails loudly outside the
    * retention window: a snapshot query must never silently answer from
    * a different state. Later plain deletes reach retained snapshots
    * (the takedown carve-out documented on
    * [[graft.operators.Dedup.minhashIndexCandidatesAsOf]]). */
  def ivfIndexSearchAsOf(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      generation: Long,
      nprobe: Int = 2): DataFrame =
    ivfIndexSearchState(
      spark, dir,
      IndexManifest.readAt(spark, dir, generation).getOrElse(
        sys.error(
          s"ivf index at $dir retains no generation-$generation manifest " +
            s"(snapshots: ${IndexManifest.snapshots(spark, dir).mkString(",")})")),
      queries, k, nprobe)

  private def ivfIndexSearchState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State,
      queries: DataFrame,
      k: Int,
      nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = readCentroids(spark, dir, st)
    if (centroids.isEmpty)
      return Seq.empty[(Long, Long, Long, Double)].toDF("q_id", "n_id", "rank", "sim")
    val q = withNorm(queries, "q_id", "qv", "qn")
    val probed = q.withColumn(
      "cell",
      explode(slice(
        sort_array(
          array(centroids.map { case (cid, v) =>
            struct((-dot(col("qv"), lit(v))).as("negd"), lit(cid).as("cid"))
          }: _*)),
        1,
        nprobe).getField("cid")))
    // Distinct probed cells: bounded by nlist regardless of query count —
    // a driver-side model-sized collect that buys partition pruning on the
    // vectors scan. Tombstoned ids ([[indexDelete]]) are anti-joined out
    // AFTER the cell pruning, so the delete check touches probed cells only.
    // A full sweep (nprobe ≥ nlist) probes every cell — the collect and
    // the isin prune are no-ops there; skip the extra job outright.
    val pruneCells: DataFrame => DataFrame =
      if (nprobe >= centroids.length) identity
      else {
        val cells = probed.select("cell").distinct().as[Int].collect().toSeq
        df => df.filter(col("cell").isin(cells: _*))
      }
    // A fully-tombstoned index compacts to a zero-row base whose parquet
    // dir carries no schema — that is an EMPTY index, not a broken one.
    val all = indexVectorsAt(spark, dir, st).getOrElse(
      return Seq.empty[(Long, Long, Long, Double)].toDF("q_id", "n_id", "rank", "sim"))
    val indexed = Tombstones.dropScoped(
      pruneCells(all), dir, "n_id", "seg_gen", st.tombstones)
      .drop("seg_gen")
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    indexed
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Calibrate the recall/nprobe trade on the LIVE index — the
    * [[filteredTopKAuto]] measure-don't-guess discipline applied to the
    * ANN lane's one hand-set knob. A deterministic hash-ordered sample of
    * indexed vectors queries its own index at each probe width (1, 2,
    * 4, … nlist), measured against the all-cells exact answer, and the
    * curve rides the manifest as props (`recall.k{k}.np{n}`) via a
    * metadata-only commit ([[IndexManifest.commitProps]]) so serving
    * reads it for free. Cost: |widths| probed searches of `nSample`
    * queries over the already-pruned index — a maintenance probe, not a
    * serving cost; the curve is a property of the frozen model + corpus
    * shape, so re-run it at the rebuild cadence (exactly when the model
    * itself is refit). Returns the measured curve. */
  def ivfIndexCalibrate(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      k: Int = 10,
      nSample: Int = 16): Map[Int, Double] = {
    val st = ivfState(spark, dir)
    val centroids = readCentroids(spark, dir, st)
    require(centroids.nonEmpty, s"ivf index at $dir has an empty centroid model")
    val nlist = centroids.length
    val indexed = indexVectorsAt(spark, dir, st) match {
      case None => return Map.empty
      case Some(all) => dropTombstoned(all, spark, dir)
    }
    val sample = indexed
      .select(col("n_id").as("vec_id"), col("nv").as("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nSample)
    val widths =
      (Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist) ++ Iterator(nlist)).toSeq
    // ONE-PASS sweep (optimization guide §1.2/§2.4 — remove redundant
    // passes): the old per-width formulation called ivfIndexSearch once
    // per width, each call re-reading the model, re-evaluating the sample
    // subplan (an index-wide hash sort + limit) and re-scanning the index
    // — |widths|+1 index scans for one curve. All widths share ONE scan
    // here. The probe rank (`crank`, the cell's 1-based position in the
    // query's distance-sorted cell list) is carried per candidate — width
    // np's candidate set is exactly `crank <= np`, the same set the
    // slice(…, 1, np) probe produced. A per-(query, cell) top-k window
    // then bounds the shared set: every row of one (query, cell) carries
    // the SAME crank, so a row outside its own cell's top-k has ≥ k
    // better rows present at every width that includes it and can never
    // surface — the cut is loss-free. Per-width top-k over the shared
    // (checkpointed, ≤ sample × nlist × k rows at ANY corpus size) set
    // under the identical (sim desc, n_id) order is value-identical to
    // the per-search plans; the search path itself stays spec-covered.
    val q = withNorm(sample, "q_id", "qv", "qn")
    val probedAll = q
      .select(
        col("q_id"), col("qv"), col("qn"),
        posexplode(sort_array(array(centroids.map { case (cid, v) =>
          struct((-dot(col("qv"), lit(v))).as("negd"), lit(cid).as("cid"))
        }: _*))))
      .select(
        col("q_id"), col("qv"), col("qn"),
        (col("pos") + 1).as("crank"), col("col").getField("cid").as("cell"))
    val curve: Map[Int, Double] = {
        val byCell =
          Window.partitionBy(col("q_id"), col("cell")).orderBy(col("sim").desc, col("n_id"))
        val shared = indexed
          .join(broadcast(probedAll), Seq("cell"))
          .filter(col("q_id") =!= col("n_id"))
          .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
          .withColumn("cellrk", row_number().over(byCell))
          .filter(col("cellrk") <= k)
          .select("q_id", "n_id", "sim", "crank")
          .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
        val byQuery =
          Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
        val sweep = widths.map { np =>
          shared.filter(col("crank") <= np)
            .withColumn("rank", row_number().over(byQuery))
            .filter(col("rank") <= k)
            .select(lit(np).as("np"), col("q_id"), col("n_id"))
        }.reduce(_ unionByName _)
        val rows = sweep.collect()
        org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(shared)
        val byNp: Map[Int, Map[Long, Set[Long]]] = rows
          .groupBy(_.getInt(0)).view
          .mapValues(_.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).toSet).toMap)
          .toMap
        val truth = byNp.getOrElse(nlist, Map.empty)
        widths.map { np =>
          val got = byNp.getOrElse(np, Map.empty)
          val recalls = truth.toSeq.map { case (qid, ts) =>
            if (ts.isEmpty) 1.0
            else (got.getOrElse(qid, Set.empty[Long]) & ts).size.toDouble / ts.size
          }
          np -> (if (recalls.isEmpty) 1.0 else recalls.sum / recalls.size)
        }.toMap
    }
    val annotated = curve.foldLeft(st) { case (s2, (np, r)) =>
      s2.withProp(s"recall.k$k.np$np", f"$r%.4f")
    }
    IndexManifest.commitProps(spark, dir, annotated, IndexManifest.Layouts.ivf)
    curve
  }

  /** The smallest calibrated probe width whose measured recall meets
    * `target`. Targets ≥ 1.0 always select the full sweep (nlist): a
    * measured 1.0 below it is a sample estimate, only all-cells is a
    * GUARANTEE — the auto lane never silently under-probes an exactness
    * request. Loud error on an uncalibrated index: falling back to nlist
    * would silently serve a full-corpus scan at 100 TB. */
  def ivfIndexChooseNprobe(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      k: Int,
      target: Double): Int = {
    val prefix = s"recall.k$k.np"
    val curve = ivfState(spark, dir).props.collect {
      case (key, v) if key.startsWith(prefix) => key.stripPrefix(prefix).toInt -> v.toDouble
    }
    require(
      curve.nonEmpty,
      s"ivf index at $dir has no recall calibration for k=$k — run ivfIndexCalibrate first")
    val nlist = curve.keys.max
    if (target >= 1.0) nlist
    else curve.toSeq.sortBy(_._1).collectFirst { case (np, r) if r >= target => np }
      .getOrElse(nlist)
  }

  /** [[ivfIndexSearch]] with the probe width chosen from the calibrated
    * recall curve instead of hand-set: callers state the recall they
    * need, the index serves it at the cheapest measured width. */
  def ivfIndexSearchAuto(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      targetRecall: Double = 0.9): DataFrame =
    ivfIndexSearch(spark, dir, queries, k, ivfIndexChooseNprobe(spark, dir, k, targetRecall))

  /** IVF×PQ persisted index (Jégou et al., TPAMI 2011 — the composition an
    * actual 100 TB ANN serving path uses): coarse IVF cells give partition
    * pruning, PQ codes give an 8-byte-per-vector ranking scan, and the
    * full vectors are kept cell-partitioned for the survivors-only exact
    * re-rank. Layout under `dir`:
    *
    *  - `centroids/`: the coarse nlist × dim Lloyd model — KB-sized;
    *  - `codebooks/`: the PQ model, (mi, pos, vec) rows — KB-sized;
    *  - `codes/`:   (n_id, nn, code0..code{m-1}, cell) partitioned BY CELL
    *    — the ranking stage reads ONLY probed cells of these 8-byte codes;
    *  - `vectors/`: (n_id, nv, nn, cell) partitioned BY CELL — read only
    *    for the O(queries·rerank) survivor join.
    *
    * PQ codebooks are trained on the RAW vectors (not residuals), exactly
    * as [[pqTopK]] trains them — so a search probing ALL cells reproduces
    * [[pqTopK]] bit-for-bit on the same corpus (the q_ann_ivfpq_gate
    * agreement check); with nprobe < nlist the ADC scan touches only
    * nprobe/nlist of the code bytes, which at corpus scale is the product
    * of the two savings (cell pruning × 32× code compression). */
  def ivfPqIndexBuild(
      candidates: DataFrame,
      dir: String,
      nlist: Int = 8,
      iters: Int = 2,
      m: Int = 8,
      dim: Int = 64,
      pqNlist: Int = 16,
      pqIters: Int = 2): Unit = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val layout = IndexManifest.Layouts.ivfpq
    // a rebuild commits a fresh generation — prior deletes vanish with it
    val next = layout.advance(IndexManifest.resolve(spark, dir, layout))
    val c = withNorm(candidates, "n_id", "nv", "nn")
    val centroids = trainCentroids(c, nlist, iters)
    centroids.toSeq
      .toDF("cid", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(next.tableDir(dir, "centroids"))
    val books = pqTrain(candidates, m, dim, pqNlist, pqIters)
    books.zipWithIndex
      .flatMap { case (cb, mi) => cb.map { case (pos, v) => (mi, pos, v.toSeq) } }
      .toDF("mi", "pos", "vec")
      .coalesce(1)
      .write.mode("overwrite").parquet(next.tableDir(dir, "codebooks"))
    val assigned =
      if (centroids.isEmpty) c.withColumn("cell", lit(0)).limit(0)
      else c.withColumn("cell", assign(centroids, "nv"))
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(next.tableDir(dir, "vectors"))
    val codes =
      if (centroids.isEmpty || books.exists(_.isEmpty))
        pqEncode(candidates.limit(0), Seq(Array((0, Array(0.0)))), dim)
          .withColumn("cell", lit(0))
      else
        // cell assignments come from the just-written vectors segment — a
        // column-pruned (n_id, cell) read-back instead of re-evaluating the
        // nlist×dim assign kernel over the corpus a second time
        pqEncode(candidates, books, dim)
          .join(
            spark.read.parquet(next.tableDir(dir, "vectors")).select("n_id", "cell"),
            Seq("n_id"))
    // trained-on count captured during the write (observe) — no read-back
    // count job over the just-written segment (guide §1.2)
    val obs = org.apache.spark.sql.Observation()
    codes.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy("cell").parquet(next.tableDir(dir, "codes"))
    val trained = obs.get("n").asInstanceOf[Long]
    // recall props describe the OLD frozen models — dropped with them
    IndexManifest.commit(
      spark, dir,
      dropRecallProps(next).withProp(RebuildTrigger.TrainedOnProp, trained.toString),
      layout)
  }

  private def ivfPqState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): IndexManifest.State =
    IndexManifest.resolve(spark, dir, IndexManifest.Layouts.ivfpq)

  /** Append a batch to the IVF×PQ index under its FROZEN models: arrivals
    * are cell-assigned by the stored coarse centroids and PQ-encoded by the
    * stored codebooks, then partition-appended to both the code and vector
    * segments — existing cells' files untouched, nothing retrained, the
    * corpus never rescanned (the [[ivfIndexAppend]] contract extended to
    * the code table). Quantization error for arrivals drifted far from the
    * training distribution degrades recall gracefully (ADC scores shrink);
    * rebuild via [[ivfPqIndexBuild]] when drift warrants, exactly like any
    * production ANN index. The streaming variant would mirror
    * [[ivfIndexAppendStream]] (assignment and encoding are pure
    * projections) with `codes-stream`/`vectors-stream` segments. */
  def ivfPqIndexAppend(newVectors: DataFrame, dir: String): Unit = {
    val spark = newVectors.sparkSession
    val st = ivfPqState(spark, dir)
    val centroids = readCentroids(spark, dir, st)
    val cbs = readCodebooks(spark, dir, st)
    require(
      centroids.nonEmpty && cbs.nonEmpty,
      s"ivfpq index at $dir has an empty model")
    // growth path only: an id an earlier upsert killed would land below
    // the kill's scope and silently not serve — refuse loudly instead
    Tombstones.requireAppendable(
      newVectors.select("vec_id"), dir, "vec_id", st.tombstones,
      math.min(
        IndexManifest.segGen(st.tables("vectors")),
        IndexManifest.segGen(st.tables("codes"))))
    val dim = cbs.size * cbs.head.head._2.length // m × sub
    val assigned = withNorm(newVectors, "n_id", "nv", "nn")
      .withColumn("cell", assign(centroids, "nv"))
    assigned.write.mode("append").partitionBy("cell").parquet(st.tableDir(dir, "vectors"))
    pqEncode(newVectors, cbs, dim)
      .join(assigned.select("n_id", "cell"), Seq("n_id"))
      .write.mode("append").partitionBy("cell").parquet(st.tableDir(dir, "codes"))
  }

  /** Atomic replace on the IVF×PQ index ([[ivfIndexUpsert]]'s contract on
    * the composed family): old copies of the batch ids stop serving —
    * code AND vector rows, both scan stages prune them — and the
    * replacements (assigned + PQ-encoded under the FROZEN models) start,
    * in ONE manifest commit. The replacements land in the combined
    * `arrivals-stream` segment (the [[ivfPqIndexAppendStream]] layout, so
    * the rewrite has one target regardless of which mutations preceded
    * it); both base tables are carried untouched. */
  def ivfPqIndexUpsert(newVectors: DataFrame, dir: String): Unit = {
    val spark = newVectors.sparkSession
    val layout = IndexManifest.Layouts.ivfpq
    val prev = ivfPqState(spark, dir)
    val centroids = readCentroids(spark, dir, prev)
    val cbs = readCodebooks(spark, dir, prev)
    require(
      centroids.nonEmpty && cbs.nonEmpty,
      s"ivfpq index at $dir has an empty model")
    val m = cbs.size
    val dim = m * cbs.head.head._2.length
    val next = layout.advance(prev, carry = Set("centroids", "codebooks", "vectors", "codes"))
    val ids = newVectors.select(col("vec_id").cast("long").as("n_id")).distinct()
    val combined = Seq("n_id", "nv", "nn") ++ (0 until m).map(i => s"code$i") :+ "cell"
    val fresh = withNorm(newVectors, "n_id", "nv", "nn")
      .withColumn("cell", assign(centroids, "nv"))
      .join(
        pqEncode(newVectors, cbs, dim)
          .select(col("n_id") +: (0 until m).map(i => col(s"code$i")): _*),
        Seq("n_id"))
      .select(combined.map(col): _*)
    val streamPath = new org.apache.hadoop.fs.Path(prev.streamDir(dir))
    val carried =
      (if (!streamPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(streamPath))
        None
      else
        try Some(spark.read.parquet(prev.streamDir(dir)))
        catch { case _: org.apache.spark.sql.AnalysisException => None })
        .map { s =>
          Tombstones.dropScoped(
            s.withColumn("seg_gen", lit(IndexManifest.segGen(prev.stream))),
            dir, "n_id", "seg_gen", prev.tombstones)
            .drop("seg_gen")
            .join(ids, Seq("n_id"), "left_anti")
            .select(combined.map(col): _*)
        }
    carried.fold(fresh)(_ unionByName fresh)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(next.streamDir(dir))
    // same tombstone carry discipline as ivfIndexUpsert: preserve carried
    // scopes, drop only the batch ids' prior rows, scoped kill for the batch
    val killed = ids.select(col("n_id").as("ts_id"), lit(prev.generation).as("ts_gen"))
    Tombstones.read(spark, dir, prev.tombstones)
      .map(_.join(ids.select(col("n_id").as("ts_id")), Seq("ts_id"), "left_anti"))
      .fold(killed)(_ unionByName killed)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/${next.tombstones}")
    IndexManifest.commit(spark, dir, next, layout)
  }

  /** Continuous-ingest version of [[ivfPqIndexAppend]] — the
    * [[ivfIndexAppendStream]] contract for the composed index: drain a
    * parquet directory of arriving vectors into the index as a Structured
    * Streaming job (Trigger.AvailableNow + checkpoint → re-invoking with
    * the same checkpoint ingests ONLY files that arrived since the last
    * run). Cell assignment AND PQ encoding under the frozen models are
    * pure projections, so both run inside the stream — no foreachBatch, no
    * retraining, no corpus rescan.
    *
    * Streamed rows land in ONE combined cell-partitioned segment
    * (`arrivals-stream`: n_id, nv, nn, code0..m-1, cell) rather than
    * separate code/vector segments, because a streaming parquet sink owns
    * its directory through the `_spark_metadata` commit log (two sinks
    * cannot share one checkpointed stream). The separated-layout scan
    * economics survive anyway: parquet is columnar, so the ADC stage
    * reading only (n_id, nn, code*) columns from the combined segment
    * touches the same bytes a separate code file would.
    * [[ivfPqIndexSearch]] unions base + stream on both its scan sides;
    * [[ivfPqIndexCompact]] folds the segment back into the base tables. */
  def ivfPqIndexAppendStream(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      arrivalsDir: String,
      checkpoint: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val st = ivfPqState(spark, indexDir)
    val centroids = readCentroids(spark, indexDir, st)
    val cbs = readCodebooks(spark, indexDir, st)
    require(
      centroids.nonEmpty && cbs.nonEmpty,
      s"ivfpq index at $indexDir has an empty model")
    val m = cbs.size
    val books = cbs.map(_.sortBy(_._1).map(_._2)).toArray
    val raw = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .parquet(arrivalsDir)
    val assigned = raw
      .select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("nv"))
      .withColumn("nn", norm(col("nv")))
      .withColumn("cell", assign(centroids, "nv"))
      .withColumn("codes", pqAssignCol(books, col("nv")))
      .select(
        col("n_id") +: col("nv") +: col("nn") +:
          (0 until m).map(i => element_at(col("codes"), i + 1).as(s"code$i")) :+
          col("cell"): _*)
    val q = assigned.writeStream
      .format("parquet")
      .partitionBy("cell")
      .option("path", st.streamDir(indexDir))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold the streamed arrivals segment back into the base code and vector
    * tables (the [[ivfIndexCompact]] LSM lifecycle close, applied to both
    * sides of the composed index) and apply any [[indexDelete]] tombstones
    * physically to BOTH tables. Runs when either a streamed segment or
    * tombstones exist.
    *
    * Crash consistency ([[IndexManifest]]): both next-generation tables
    * are fully written BEFORE the single manifest commit that swaps
    * vectors + codes + stream + tombstones together — the round-7 "crash
    * between the two swaps" mixed state can no longer be produced by this
    * compaction (a crash leaves the previous generation fully live). The
    * mixed-state loud error below remains as a defense against external
    * damage (a manually deleted segment dir). The source checkpoint is
    * untouched — a later [[ivfPqIndexAppendStream]] with the same
    * checkpoint still skips already-ingested files. */
  def ivfPqIndexCompact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val layout = IndexManifest.Layouts.ivfpq
    val prev = IndexManifest.resolve(spark, dir, layout)
    val streamPath = new org.apache.hadoop.fs.Path(prev.streamDir(dir))
    val fs = streamPath.getFileSystem(conf)
    val hasStream = fs.exists(streamPath)
    if (!hasStream && readTombstones(spark, dir).isEmpty) return
    val next = layout.advance(prev, carry = Set("centroids", "codebooks"))
    (segmentUnionOpt(spark, dir, "vectors"), segmentUnionOpt(spark, dir, "codes")) match {
      case (Some(vecs), Some(codes)) =>
        val m = readCodebooks(spark, dir, prev).size
        dropTombstoned(vecs, spark, dir)
          .select("n_id", "nv", "nn", "cell")
          .write.mode("overwrite").partitionBy("cell")
          .parquet(next.tableDir(dir, "vectors"))
        dropTombstoned(codes, spark, dir)
          .select(col("n_id") +: col("nn") +:
            (0 until m).map(i => col(s"code$i")) :+ col("cell"): _*)
          .write.mode("overwrite").partitionBy("cell")
          .parquet(next.tableDir(dir, "codes"))
        IndexManifest.commit(spark, dir, next, layout)
      case (None, None) =>
        // Nothing readable (empty-corpus build): tombstones have nothing
        // to apply to — the manifest bump retires them and carries the
        // (zero-row) base names forward.
        IndexManifest.commit(
          spark, dir,
          next.copy(tables = next.tables +
            ("vectors" -> prev.tables("vectors")) + ("codes" -> prev.tables("codes"))),
          layout)
      case (v, c) =>
        // Exactly one side readable — cannot arise from this compaction's
        // single-commit protocol; something external damaged a segment.
        // Clearing tombstones here would silently drop pending deletes on
        // the readable side; fail loudly instead.
        sys.error(
          s"ivfpq index at $dir is in a mixed state (vectors readable=" +
            s"${v.isDefined}, codes readable=${c.isDefined}); rebuild via " +
            "ivfPqIndexBuild — refusing to compact or clear tombstones")
    }
  }

  /** Base table ∪ the streamed combined segment, projected to `table`'s
    * columns (either side may not exist yet; a zero-batch sink log reads
    * as no-rows — the [[indexVectors]] contract). */
  private def segmentUnionOpt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      table: String): Option[DataFrame] =
    segmentUnionAt(spark, dir, ivfPqState(spark, dir), table)

  private def segmentUnionAt(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State,
      table: String): Option[DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    def readIf(p: String): Option[DataFrame] = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!path.getFileSystem(conf).exists(path)) None
      else
        try Some(spark.read.parquet(p))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    val baseRaw = readIf(st.tableDir(dir, table))
    val streamRaw = readIf(st.streamDir(dir))
      .map(s => baseRaw.fold(s)(b => s.select(b.columns.map(col): _*)))
    // segment-generation tag: the scope key for generation-scoped
    // tombstones (consumed by dropTombstoned)
    val base = baseRaw
      .map(_.withColumn("seg_gen", lit(IndexManifest.segGen(st.tables(table)))))
    val stream = streamRaw
      .map(_.withColumn("seg_gen", lit(IndexManifest.segGen(st.stream))))
    (base ++ stream).reduceLeftOption(_ unionByName _)
  }

  private def segmentUnion(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      table: String): DataFrame =
    segmentUnionOpt(spark, dir, table)
      .getOrElse(sys.error(s"ivfpq index at $dir has no readable $table segment"))

  private def readCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      state: IndexManifest.State): Seq[Array[(Int, Array[Double])]] = {
    val rows = spark.read.parquet(state.tableDir(dir, "codebooks")).collect()
    rows
      .groupBy(_.getInt(0))
      .toSeq
      .sortBy(_._1)
      .map { case (_, rs) =>
        rs.map(r => r.getInt(1) -> r.getSeq[Double](2).toArray).sortBy(_._1)
      }
  }

  /** Search the IVF×PQ index: nprobe nearest coarse cells per query; ADC
    * ranking over ONLY those cells' code rows (partition-pruned 8-byte
    * scan); exact cosine re-rank of the per-query top-`rerank` survivors
    * against the full vectors (also cell-pruned). [[pqTopK]]'s two-stage
    * plan with the corpus side partition-pruned — probing all nlist cells
    * reproduces pqTopK exactly (same deterministic model + tie-breaks). */
  def ivfPqIndexSearch(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2,
      rerank: Int = 200): DataFrame =
    ivfPqIndexSearchState(
      spark, dir, ivfPqState(spark, dir), queries, k, nprobe, rerank)

  /** [[ivfPqIndexSearch]] pinned to a RETAINED manifest generation — the
    * time-travel read on the composed serving index
    * ([[ivfIndexSearchAsOf]]'s contract): that generation's coarse model,
    * codebooks, code/vector segments AND pending tombstones. Fails
    * loudly outside the retention window. Later plain deletes reach
    * retained snapshots (the takedown carve-out documented on
    * [[graft.operators.Dedup.minhashIndexCandidatesAsOf]]). */
  def ivfPqIndexSearchAsOf(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      generation: Long,
      nprobe: Int = 2,
      rerank: Int = 200): DataFrame =
    ivfPqIndexSearchState(
      spark, dir,
      IndexManifest.readAt(spark, dir, generation).getOrElse(
        sys.error(
          s"ivfpq index at $dir retains no generation-$generation manifest " +
            s"(snapshots: ${IndexManifest.snapshots(spark, dir).mkString(",")})")),
      queries, k, nprobe, rerank)

  private def ivfPqIndexSearchState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      st: IndexManifest.State,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    import spark.implicits._
    val centroids = readCentroids(spark, dir, st)
    val books = readCodebooks(spark, dir, st).map(_.map(_._2))
    if (centroids.isEmpty || books.isEmpty || books.exists(_.isEmpty))
      return Seq.empty[(Long, Long, Long, Double)].toDF("q_id", "n_id", "rank", "sim")
    val m = books.size
    val offsets = books.scanLeft(0)((acc, cb) => acc + cb.length)
    val probed = withNorm(queries, "q_id", "qv", "qn")
      .withColumn("lut", {
        import org.apache.spark.sql.graft.{Bridge, PqLuts}
        Bridge.column(PqLuts(Bridge.expression(col("qv")), books.map(_.map(_.toSeq).toSeq)))
      })
      .withColumn(
        "cell",
        explode(slice(
          sort_array(
            array(centroids.map { case (cid, v) =>
              struct((-dot(col("qv"), lit(v))).as("negd"), lit(cid).as("cid"))
            }: _*)),
          1,
          nprobe).getField("cid")))
    // Model-sized distinct probed-cell list (≤ nlist) — buys partition
    // pruning on BOTH the code scan and the survivor vector scan. A full
    // sweep (nprobe ≥ nlist) probes every cell — collect and isin prune
    // are no-ops there; skip the extra job outright.
    val pruneCells: DataFrame => DataFrame =
      if (nprobe >= centroids.length) identity
      else {
        val cells = probed.select("cell").distinct().as[Int].collect().toSeq
        df => df.filter(col("cell").isin(cells: _*))
      }
    // Tombstones applied at the CODE stage — a deleted id never reaches the
    // ADC ranking, and the survivor vector join is keyed by live ids only.
    // A fully-tombstoned index compacts to zero-row bases with no
    // schema-carrying files — an EMPTY index (return no hits), not an error.
    val allCodes = segmentUnionAt(spark, dir, st, "codes").getOrElse(
      return Seq.empty[(Long, Long, Long, Double)].toDF("q_id", "n_id", "rank", "sim"))
    val codes = Tombstones.dropScoped(
      pruneCells(allCodes),
      dir, "n_id", "seg_gen", st.tombstones).drop("seg_gen")
    val adc = (0 until m)
      .map(mi => element_at(col("lut"), lit(offsets(mi)) + col(s"code$mi") + 1))
      .reduce(_ + _)
    val byApprox = Window.partitionBy(col("q_id")).orderBy(col("approx_sim").desc, col("n_id"))
    val survivors = codes
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("approx_sim", adc / (col("qn") * col("nn")))
      .withColumn("arank", row_number().over(byApprox))
      .filter(col("arank") <= rerank)
      .select("q_id", "qv", "qn", "n_id")
    // Tombstones pruned here too (not just at the code stage): with
    // upserts, a LIVE id can have a dead older vector copy in the base —
    // the survivor join on n_id must see only the replacement row.
    val vectors = Tombstones.dropScoped(
      pruneCells(segmentUnionAt(spark, dir, st, "vectors")
        .getOrElse(sys.error(s"ivfpq index at $dir has no readable vectors segment"))),
      dir, "n_id", "seg_gen", st.tombstones).drop("seg_gen")
      .select("n_id", "nv", "nn")
    val byExact = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    survivors
      .join(vectors, Seq("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byExact).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** [[ivfIndexCalibrate]]'s contract on the composed index: measure the
    * recall/nprobe curve of the SERVING CONFIGURATION (this `rerank`) on
    * a deterministic sample vs the all-cells answer at the same rerank,
    * and ride it on the manifest via a metadata-only commit. One honest
    * caveat the IVF family doesn't have: with a finite rerank even the
    * all-cells sweep is an estimate of exact search (ADC misranking past
    * the rerank cut), so the recorded 1.0 at nlist means "as good as
    * this serving configuration gets", not brute-force equality — raise
    * `rerank` toward the corpus size when that distinction matters. */
  def ivfPqIndexCalibrate(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      k: Int = 10,
      nSample: Int = 16,
      rerank: Int = 200): Map[Int, Double] = {
    val st = ivfPqState(spark, dir)
    val centroids = readCentroids(spark, dir, st)
    require(centroids.nonEmpty, s"ivfpq index at $dir has an empty model")
    val nlist = centroids.length
    val allVectors = segmentUnionAt(spark, dir, st, "vectors") match {
      case None => return Map.empty
      case Some(all) =>
        Tombstones.dropScoped(all, dir, "n_id", "seg_gen", st.tombstones)
          .drop("seg_gen")
    }
    val sample = allVectors
      .select(col("n_id").as("vec_id"), col("nv").as("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nSample)
    val widths =
      (Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist) ++ Iterator(nlist)).toSeq
    // ONE-PASS sweep — ivfIndexCalibrate's restructure on the composed
    // index (see that method's correctness argument): the per-width
    // searches shared nothing, so one curve cost |widths|+1 code scans,
    // model reads and sample sorts. Here ALL widths share one ADC pass.
    // `crank` (the cell's 1-based rank in the query's sorted cell list)
    // reproduces each width's probe set as `crank <= np`; a per-(query,
    // cell) top-`rerank` window bounds the shared candidate set loss-free
    // (same-cell rows share their crank, so a row below its own cell's
    // top-rerank sits below the rerank cut at every width that probes the
    // cell); each width's ADC rerank cut, survivor re-rank and top-k then
    // run over the bounded (checkpointed, ≤ sample × nlist × rerank rows)
    // set — value-identical to the per-search plans, which stay
    // spec-covered on the serving path.
    val books = readCodebooks(spark, dir, st).map(_.map(_._2))
    val codesOpt = segmentUnionAt(spark, dir, st, "codes")
    val curve: Map[Int, Double] =
      if (books.isEmpty || books.exists(_.isEmpty) || codesOpt.isEmpty)
        widths.map(_ -> 1.0).toMap
      else {
        val m = books.size
        val offsets = books.scanLeft(0)((acc, cb) => acc + cb.length)
        // the normed sample feeds the probe AND the exact re-rank join —
        // materialized once (nSample rows) so the index-wide hash sort
        // behind it runs once, not per consumer
        val qFrame = withNorm(sample, "q_id", "qv", "qn")
          .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
        val q = qFrame
          .withColumn("lut", {
            import org.apache.spark.sql.graft.{Bridge, PqLuts}
            Bridge.column(PqLuts(Bridge.expression(col("qv")), books.map(_.map(_.toSeq).toSeq)))
          })
        val probedAll = q
          .select(
            col("q_id"), col("qn"), col("lut"),
            posexplode(sort_array(array(centroids.map { case (cid, v) =>
              struct((-dot(col("qv"), lit(v))).as("negd"), lit(cid).as("cid"))
            }: _*))))
          .select(
            col("q_id"), col("qn"), col("lut"),
            (col("pos") + 1).as("crank"), col("col").getField("cid").as("cell"))
        val codes = Tombstones.dropScoped(
          codesOpt.get, dir, "n_id", "seg_gen", st.tombstones).drop("seg_gen")
        val adc = (0 until m)
          .map(mi => element_at(col("lut"), lit(offsets(mi)) + col(s"code$mi") + 1))
          .reduce(_ + _)
        val byCellApprox =
          Window.partitionBy(col("q_id"), col("cell"))
            .orderBy(col("approx_sim").desc, col("n_id"))
        val sharedCand = codes
          .join(broadcast(probedAll), Seq("cell"))
          .filter(col("q_id") =!= col("n_id"))
          .withColumn("approx_sim", adc / (col("qn") * col("nn")))
          .withColumn("cellrk", row_number().over(byCellApprox))
          .filter(col("cellrk") <= rerank)
          .select("q_id", "n_id", "approx_sim", "crank")
          .transform(org.apache.spark.sql.graft.Bridge.localCheckpointFreshStats)
        val byApprox =
          Window.partitionBy(col("q_id")).orderBy(col("approx_sim").desc, col("n_id"))
        val survivors = widths.map { np =>
          sharedCand.filter(col("crank") <= np)
            .withColumn("arank", row_number().over(byApprox))
            .filter(col("arank") <= rerank)
            .select(lit(np).as("np"), col("q_id"), col("n_id"))
        }.reduce(_ unionByName _)
        val byExact =
          Window.partitionBy(col("np"), col("q_id")).orderBy(col("sim").desc, col("n_id"))
        val sweep = survivors
          .join(broadcast(qFrame), Seq("q_id"))
          .join(allVectors.select("n_id", "nv", "nn"), Seq("n_id"))
          .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
          .withColumn("rank", row_number().over(byExact))
          .filter(col("rank") <= k)
          .select(col("np"), col("q_id"), col("n_id"))
        val rows = sweep.collect()
        org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(sharedCand)
        org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(qFrame)
        val byNp: Map[Int, Map[Long, Set[Long]]] = rows
          .groupBy(_.getInt(0)).view
          .mapValues(_.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).toSet).toMap)
          .toMap
        val truth = byNp.getOrElse(nlist, Map.empty)
        widths.map { np =>
          val got = byNp.getOrElse(np, Map.empty)
          val recalls = truth.toSeq.map { case (qid, ts) =>
            if (ts.isEmpty) 1.0
            else (got.getOrElse(qid, Set.empty[Long]) & ts).size.toDouble / ts.size
          }
          np -> (if (recalls.isEmpty) 1.0 else recalls.sum / recalls.size)
        }.toMap
      }
    val annotated = curve.foldLeft(st) { case (s2, (np, r)) =>
      s2.withProp(s"recall.k$k.np$np", f"$r%.4f")
    }
    IndexManifest.commitProps(spark, dir, annotated, IndexManifest.Layouts.ivfpq)
    curve
  }

  /** [[ivfIndexChooseNprobe]] on the composed index: smallest calibrated
    * width meeting `target`; targets ≥ 1.0 take the full sweep; loud on
    * an uncalibrated index. */
  def ivfPqIndexChooseNprobe(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      k: Int,
      target: Double): Int = {
    val prefix = s"recall.k$k.np"
    val curve = ivfPqState(spark, dir).props.collect {
      case (key, v) if key.startsWith(prefix) => key.stripPrefix(prefix).toInt -> v.toDouble
    }
    require(
      curve.nonEmpty,
      s"ivfpq index at $dir has no recall calibration for k=$k — run ivfPqIndexCalibrate first")
    val nlist = curve.keys.max
    if (target >= 1.0) nlist
    else curve.toSeq.sortBy(_._1).collectFirst { case (np, r) if r >= target => np }
      .getOrElse(nlist)
  }

  /** [[ivfPqIndexSearch]] at the probe width the calibrated curve says
    * meets `targetRecall` — the serving lane states its recall, the
    * index serves it at the cheapest measured width. */
  def ivfPqIndexSearchAuto(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      targetRecall: Double = 0.9,
      rerank: Int = 200): DataFrame =
    ivfPqIndexSearch(
      spark, dir, queries, k,
      ivfPqIndexChooseNprobe(spark, dir, k, targetRecall), rerank)

  /** Product-quantization codebooks (Jégou et al., TPAMI 2011): the `dim`
    * dims split into `m` subspaces, each with its own `nlist`-centroid
    * Lloyd model trained on the sliced corpus. Codebook entries are
    * re-indexed 0..n-1 in cid order so a code IS a lookup-table position.
    * Returns one (index, subvector) array per subspace — the whole model
    * is m × nlist × (dim/m) doubles, KB-sized.
    *
    * Training is SINGLE-PASS across subspaces: one seed collect (the first
    * nlist vectors, sliced into all m subspaces) and then ONE corpus
    * aggregate per Lloyd iteration — each row emits its m (subspace, cell,
    * subvector) assignments, exploded and mean-aggregated grouped by
    * (subspace, cell). The exploded volume is exactly one corpus worth of
    * doubles (each of the m rows carries dim/m of the dim values) and
    * map-side combine reduces the shuffle to m·nlist partials per
    * partition. The earlier per-subspace formulation called
    * [[trainCentroids]] m times — m·(iters+1) ≈ 24 corpus scans for the
    * default m=8/iters=2, an 8× index-build cost multiplier that matters
    * at corpus scale; this form is scan-count-identical to training ONE
    * codebook. Per-subspace assignment/update math is unchanged
    * (independent subspaces), so the codebooks are bit-identical to the
    * old formulation's up to Lloyd-irrelevant cell relabeling.
    * PqTrainScanSpec pins the job count.
    *
    * Assignment runs through the native [[org.apache.spark.sql.graft.PqAssign]]
    * kernel — ONE expression node carrying the whole flattened model —
    * rather than m·nlist per-centroid `dot(slice, lit)` subtrees, whose
    * Catalyst analysis + codegen compilation dominated wall time at test
    * SFs (tools/PqProfile) and whose per-centroid expression dispatch is
    * pure overhead on a corpus-scale scan. */
  private[operators] def pqTrain(
      candidates: DataFrame,
      m: Int,
      dim: Int,
      nlist: Int,
      iters: Int): Seq[Array[(Int, Array[Double])]] = {
    val sub = dim / m
    val base = candidates.select(col("embedding").cast("array<double>").as("nv"))
    val seedRows = candidates
      .orderBy("vec_id")
      .limit(nlist)
      .select(col("embedding").cast("array<double>"))
      .collect()
    if (seedRows.isEmpty) return Seq.fill(m)(Array.empty[(Int, Array[Double])])
    // books(mi) = position-ordered centroid subvectors (codes ARE positions)
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { mi =>
      seedRows.map(r => r.getSeq[Double](0).slice(mi * sub, mi * sub + sub).toArray)
    }
    for (_ <- 0 until iters) {
      val entries = explode(array((0 until m).map { mi =>
        struct(
          lit(mi).as("mi"),
          element_at(col("codes"), mi + 1).as("cell"),
          slice(col("nv"), mi * sub + 1, sub).as("sv"))
      }: _*)).as("e")
      // exact integer-quantized sums (the trainCentroids discipline) —
      // order-free partials, bit-stable model across cluster layouts
      val means = base
        .withColumn("codes", pqAssignCol(books, col("nv")))
        .select(entries)
        .groupBy(col("e.mi").as("mi"), col("e.cell").as("cell"))
        .agg(
          array((0 until sub).map(i =>
            sum(floor(element_at(col("e.sv"), i + 1) * 4096).cast("long"))): _*).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val bySubspace = means.groupBy(_.getInt(0))
      books = Array.tabulate(m) { mi =>
        bySubspace.get(mi) match {
          // position order; cells that lost every member drop and positions
          // compact (relabeling — next iteration's assignment uses the new
          // positions consistently)
          case Some(rs) =>
            rs.sortBy(_.getInt(1)).map { r =>
              val n = r.getLong(3)
              r.getSeq[Long](2).map(s => s.toDouble / n / 4096).toArray
            }
          case None => books(mi) // can't happen on a non-empty corpus; keep model
        }
      }
    }
    books.map(_.zipWithIndex.map { case (v, idx) => (idx, v) }).toSeq
  }

  private def pqAssignCol(books: Array[Array[Array[Double]]], vec: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, PqAssign}
    Bridge.column(
      PqAssign(Bridge.expression(vec), books.map(_.map(_.toSeq).toSeq).toSeq))
  }

  /** Encode the corpus under the codebooks: per vector, `m` small-int
    * codes (nearest-by-dot sub-centroid per subspace) plus the exact norm
    * — 8 bytes of code standing in for a 256-byte float vector. THE
    * storage/bandwidth lever for corpus-scale ANN: the ranking stage
    * scans only this table. */
  private[operators] def pqEncode(
      candidates: DataFrame,
      codebooks: Seq[Array[(Int, Array[Double])]],
      dim: Int): DataFrame = {
    val m = codebooks.size
    val books = codebooks.map(_.sortBy(_._1).map(_._2)).toArray
    candidates
      .select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("nv"))
      .withColumn("nn", norm(col("nv")))
      .withColumn("codes", pqAssignCol(books, col("nv")))
      .select(
        col("n_id") +: col("nn") +:
          (0 until m).map(i => element_at(col("codes"), i + 1).as(s"code$i")): _*)
  }

  /** PQ ANN with asymmetric distance computation + exact re-rank: each
    * query precomputes one `nlist`-entry dot-product lookup table per
    * subspace (broadcast side — m·nlist small dots per QUERY, once), so
    * the corpus-side ranking is `m` array lookups + adds per pair instead
    * of a `dim`-wide dot over the float vectors; the approximate top-
    * `rerank` survivors are then exactly re-ranked against their true
    * embeddings (a survivors-only join — O(queries·rerank) rows). At
    * corpus scale the first stage reads ONLY the code table.
    * Deterministic given the deterministic Lloyd seeds; recall floor
    * pinned by the oracled gate. Default rerank=200: the survivor budget
    * must grow with the corpus for recall to hold (rerank=100 measured
    * 0.87/0.91 at the 500-vector SFs but fell below the 0.7 floor on the
    * 2000-vector sf0.1 corpus); at real scale size rerank ∝ the
    * acceptable exact-rerank cost, not the corpus. */
  def pqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      m: Int = 8,
      dim: Int = 64,
      nlist: Int = 16,
      iters: Int = 2,
      rerank: Int = 200): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val codebooks = pqTrain(candidates, m, dim, nlist, iters)
    if (codebooks.exists(_.isEmpty))
      return Seq.empty[(Long, Long, Long, Double)].toDF("q_id", "n_id", "rank", "sim")
    val books = codebooks.map(_.sortBy(_._1).map(_._2)).toArray
    val codes = pqEncode(candidates, codebooks, dim)
    // One flattened LUT per query (native kernel — m·nlist dots in one
    // node, computed once per broadcast row); ADC is then m element_at
    // adds per pair, offsets driver-side constants.
    val offsets = books.scanLeft(0)((acc, cb) => acc + cb.length)
    val q = withNorm(queries, "q_id", "qv", "qn")
      .withColumn("lut", {
        import org.apache.spark.sql.graft.{Bridge, PqLuts}
        Bridge.column(
          PqLuts(Bridge.expression(col("qv")), books.map(_.map(_.toSeq).toSeq).toSeq))
      })
    val adc = (0 until m)
      .map(mi => element_at(col("lut"), lit(offsets(mi)) + col(s"code$mi") + 1))
      .reduce(_ + _)
    val byApprox = Window.partitionBy(col("q_id")).orderBy(col("approx_sim").desc, col("n_id"))
    val survivors = codes
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("approx_sim", adc / (col("qn") * col("nn")))
      .withColumn("arank", row_number().over(byApprox))
      .filter(col("arank") <= rerank)
      .select("q_id", "qv", "qn", "n_id")
    val byExact = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    survivors
      .join(withNorm(candidates, "n_id", "nv", "nn"), Seq("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byExact).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      nlist: Int = 8,
      nprobe: Int = 2,
      iters: Int = 2): DataFrame = {
    val c = withNorm(candidates, "n_id", "nv", "nn")
    val centroids = trainCentroids(c, nlist, iters)
    if (centroids.isEmpty) {
      // No candidate vectors to index: an empty index answers every query
      // with no neighbors (a pruned partition or fresh ingest dir must be a
      // no-op, not a seed-collection crash).
      val s = queries.sparkSession
      import s.implicits._
      return Seq.empty[(Long, Long, Long, Double)].toDF("q_id", "n_id", "rank", "sim")
    }

    val indexed = c.withColumn("cell", assign(centroids, "nv"))
    val q = withNorm(queries, "q_id", "qv", "qn")
    // nprobe nearest cells per query, exploded to (q, cell) probe rows.
    val probed = q.withColumn(
      "cell",
      explode(slice(
        sort_array(
          array(centroids.map { case (cid, v) =>
            struct((-dot(col("qv"), lit(v))).as("negd"), lit(cid).as("cid"))
          }: _*)),
        1,
        nprobe).getField("cid")))
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    indexed
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Metadata-filtered exact top-k — the PRE-FILTER strategy. The predicate
    * is applied to the candidate corpus BEFORE the pairwise stage, so it
    * reaches the parquet scan as a pushed filter (plan-guarded in
    * PlanShapeSpec) and the broadcast-query re-rank touches only survivors.
    *
    * Strategy rule (the classic filtered-vector-search trade-off): pre-filter
    * wins when the predicate is SELECTIVE — the scan shrinks by the
    * selectivity factor and recall is exact by construction. When the
    * predicate keeps most of the corpus and a prebuilt unfiltered index
    * exists, prefer [[filteredTopKPost]] — searching the index with an
    * inflated budget avoids re-scanning (or re-indexing) the corpus per
    * predicate. Crossover is at roughly selectivity ≈ 1/inflate: below it
    * the filtered scan is cheaper than the inflated index probe. */
  def filteredTopK(
      queries: DataFrame,
      candidates: DataFrame,
      pred: Column,
      k: Int): DataFrame =
    bruteForceTopK(queries, candidates.filter(pred), k)

  /** Metadata-filtered top-k — the POST-FILTER strategy over an UNFILTERED
    * coarse index: probe [[ivfTopK]] with an inflated `k·inflate` budget,
    * keep only hits satisfying the predicate, re-rank, cut to `k`.
    *
    * Scale shape: the hit list is queries×k·inflate rows (broadcast-small),
    * so the predicate join scans the metadata side once with the predicate
    * pushed down and the hit list broadcast — the corpus is never re-scanned
    * and no second index is built. Approximation is two-layered (cell
    * pruning × budget truncation): a query whose neighborhood is dominated
    * by non-matching vectors can under-fill below `k` — the recall gate
    * (`q_ann_filtered_gate`) measures exactly this against the exact
    * pre-filter path. Raise `inflate` (or `nprobe`) when the predicate is
    * loose-but-skewed; switch to [[filteredTopK]] when it is selective. */
  def filteredTopKPost(
      queries: DataFrame,
      candidates: DataFrame,
      pred: Column,
      k: Int,
      inflate: Int = 4,
      nlist: Int = 8,
      nprobe: Int = 2): DataFrame =
    postFilter(ivfTopK(queries, candidates, k * inflate, nlist, nprobe), candidates, pred, k)

  /** Filtered top-k with the pre/post strategy pick AUTOMATED from measured
    * selectivity — the [[graft.operators.Joins.joinProfile]] discipline
    * (spend one cheap aggregate to choose the expensive plan) applied to
    * the filtered-vector-search crossover that [[filteredTopK]] and
    * [[filteredTopKPost]] document in prose: pre-filter is exact and wins
    * while the predicate keeps under ~1/inflate of the corpus (the
    * filtered scan is smaller than the inflated index probe); past it the
    * post-filter lane reuses the unfiltered index and never re-scans the
    * corpus per predicate.
    *
    * The profile is ONE column-pruned, map-side-combined aggregate over
    * the predicate column (`count` + conditional count — no data rows
    * moved, the cheapest measurement that answers the question); its two
    * longs collect to the driver and pick the lane. At corpus scale the
    * aggregate reads just the predicate column's pages — amortize it by
    * caching per-predicate selectivities if the same filter serves many
    * query batches. */
  def filteredTopKAuto(
      queries: DataFrame,
      candidates: DataFrame,
      pred: Column,
      k: Int,
      inflate: Int = 4,
      nlist: Int = 8,
      nprobe: Int = 2): DataFrame = {
    val prof = candidates
      .agg(
        count(lit(1)).as("n"),
        count(when(pred, lit(1))).as("n_pass"))
      .head()
    val (n, pass) = (prof.getLong(0), prof.getLong(1))
    // crossover at selectivity 1/inflate; ties (including an empty corpus)
    // go to the exact pre-filter lane
    if (pass * inflate.toLong <= n) filteredTopK(queries, candidates, pred, k)
    else filteredTopKPost(queries, candidates, pred, k, inflate, nlist, nprobe)
  }

  /** The post-filter tail as a composable step: apply a metadata predicate
    * to ANY inflated ANN hit list `(q_id, n_id, …, sim)` and re-rank/cut to
    * `k`. In production this composes onto the PERSISTED index searches —
    * `postFilter(ivfIndexSearch(…, k·inflate, …), meta, pred, k)` or the
    * IVF×PQ equivalent — which is the actual serving shape: the index is
    * built once, each predicate costs only an inflated probe plus this
    * head-sized join (hit list broadcast, metadata scanned once with the
    * predicate pushed down). */
  def postFilter(hits: DataFrame, candidates: DataFrame, pred: Column, k: Int): DataFrame = {
    val allowed = candidates.filter(pred).select(col("vec_id").as("n_id"))
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    allowed
      .join(broadcast(hits), Seq("n_id"))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two per-query
    * ranked hit lists — THE standard hybrid-retrieval combiner (BM25 lane ×
    * vector lane). Inputs are `(q_id, id, rank)`; a full-outer join on
    * `(q_id, id)` unions the lists and each lane contributes
    * `1/(k0+rank)` (0 when absent), so documents found by both lanes rise.
    *
    * Scale shape: rank lists are per-query HEADS (top-N rows each), so the
    * fusion join is head-sized regardless of corpus size — the expensive
    * work is the upstream retrievals, which carry their own scale paths
    * ([[ivfPqIndexSearch]], TextIndex.bm25TopK's pre-shuffle term filter).
    * Numeric contract: the fused score is a FIXED two-term IEEE sum (not an
    * aggregate), rounded to 12dp — replays bit-identically in any engine.
    * Ties break on `id` ascending. `rank_a`/`rank_b` are kept (NULL when a
    * lane missed the doc) as provenance for downstream blending. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    val sa = a.select(col("q_id"), col("id"), col("rank").as("rank_a"))
    val sb = b.select(col("q_id"), col("id"), col("rank").as("rank_b"))
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("id"))
    sa.join(sb, Seq("q_id", "id"), "full_outer")
      .withColumn(
        "score",
        round(
          coalesce(lit(1.0) / (lit(k0) + col("rank_a")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(k0) + col("rank_b")), lit(0.0)),
          12))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "id", "rank", "score", "rank_a", "rank_b")
  }

  /** Convex score blending — the other standard hybrid-retrieval combiner
    * (vs rank-based [[rrfFuse]]): each lane's scores are min-max normalized
    * PER QUERY over its own hit list, then fused as
    * `α·norm_a + (1−α)·norm_b` (a missing lane contributes 0). Score-aware
    * where RRF is score-blind — a lane's confidence gap survives fusion —
    * at the cost of sensitivity to each lane's score distribution (the
    * reason RRF is the safer default).
    *
    * Same head-sized shape as [[rrfFuse]]: the min/max window and the
    * full-outer join run over per-query top-N lists, never the corpus.
    * Numeric contract: normalization is one subtract + one divide on the
    * lane's exact min/max (order-insensitive), the blend a fixed
    * three-term IEEE expression rounded to 12dp at the edge — replays
    * bit-identically in any engine. A single-hit lane (max == min)
    * normalizes to 1.0, not 0/0. Ties break on `id` ascending. */
  def blendFuse(a: DataFrame, b: DataFrame, k: Int, alpha: Double = 0.5): DataFrame = {
    def nrm(df: DataFrame, as: String): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
      df.select(col("q_id"), col("id"), col("score").as("s"))
        .withColumn("mn", min(col("s")).over(w))
        .withColumn("mx", max(col("s")).over(w))
        .withColumn(
          as,
          when(col("mx") > col("mn"), (col("s") - col("mn")) / (col("mx") - col("mn")))
            .otherwise(lit(1.0)))
        .select(col("q_id"), col("id"), col(as))
    }
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("id"))
    nrm(a, "norm_a")
      .join(nrm(b, "norm_b"), Seq("q_id", "id"), "full_outer")
      .withColumn(
        "score",
        round(
          lit(alpha) * coalesce(col("norm_a"), lit(0.0)) +
            lit(1.0 - alpha) * coalesce(col("norm_b"), lit(0.0)),
          12))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "id", "rank", "score")
  }

  /** Ranking-quality metrics for a degraded retrieval path vs the exact
    * one: per query, binary relevance = membership in the full-precision
    * cosine top-`k`, scored against the leading-`dims` (Matryoshka-
    * truncated) ranking — `(q_id, n_rel, ndcg, mrr)`. This is the graded
    * complement to the overlap-count gate: nDCG@k sees WHERE in the
    * truncated list the true neighbors sit, MRR how fast the first one
    * appears.
    *
    * Numeric contract: each position weight `1/log2(i+1)` is rounded to
    * 9dp and summed as DECIMAL(12,9) — exact, order-free summation of
    * transcendental terms (the entropy-oracle pattern), so the scores
    * replay bit-identically in any engine; one double division per metric
    * at the edge. IDCG is the weight sum over the EXACT ranking's k rows —
    * computed by the same in-engine expression, never a driver constant. */
  def truncationRankingMetrics(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int = 10,
      dims: Int = 32): DataFrame = {
    val w = round(lit(1.0) / log2(col("rank") + 1), 9).cast("decimal(12,9)")
    val full = bruteForceTopK(queries, candidates, k)
      .select(col("q_id"), col("n_id"), col("rank").as("f_rank"))
    val trunc = bruteForceTopK(queries, candidates, k, dims)
      .select(col("q_id"), col("n_id"), col("rank"))
    val scored = trunc
      .join(full.select(col("q_id"), col("n_id"), lit(1L).as("rel")),
        Seq("q_id", "n_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .groupBy("q_id")
      .agg(
        sum("rel").cast("long").as("n_rel"),
        sum(when(col("rel") === 1L, w).otherwise(lit(0).cast("decimal(12,9)")))
          .cast("double").as("dcg"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"))
    val ideal = full
      .withColumn("rank", col("f_rank"))
      .groupBy("q_id")
      .agg(sum(w).cast("double").as("idcg"))
    scored
      .join(ideal, Seq("q_id"))
      .select(
        col("q_id"),
        col("n_rel"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998): from each query's cosine top-`poolSize` pool, greedily select
    * `k` results maximizing `sim(q,c) − λ·max_{s∈selected} sim(c,s)` —
    * relevance traded against redundancy, the standard diversity pass after
    * any ANN stage. Returns `(q_id, rank, n_id, score)`; rank 1 is the plain
    * argmax (no penalty), ties break toward the smaller n_id.
    *
    * Scale/parity shape: the greedy loop is `k` FIXED dataframe-wide rounds
    * (every query advances in the same round — no per-query driver loop), so
    * the oracle unrolls them as CTEs (the PageRank contract). Each round is
    * one bounded join (pool × selected, ≤ poolSize·k rows per query) and one
    * map-side-combined argmax; the pool is localCheckpointed once so rounds
    * never re-scan the corpus. All scores are IEEE-deterministic
    * left-to-right dot folds — replayable by the DuckDB oracle. */
  def mmrRerank(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int = 5,
      poolSize: Int = 20,
      lambda: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val q = withNorm(queries, "q_id", "qv", "qn")
    val c = withNorm(candidates, "n_id", "nv", "nn")
    val byQuery = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val pool = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rk", row_number().over(byQuery))
      .filter(col("rk") <= poolSize)
      .select("q_id", "n_id", "sim", "nv", "nn")
      .transform(Bridge.localCheckpointFreshStats)
    mmrGreedy(pool, k, lambda)
  }

  /** [[mmrRerank]] over a caller-supplied candidate pool `(q_id, n_id,
    * sim)` — compose the diversity pass onto ANY retrieval stage
    * ([[ivfTopK]], [[lshTopK]], [[pqTopK]], [[ivfIndexSearch]]) instead of
    * the brute-force pool. Vectors and norms are joined back from
    * `candidates` once (per pool row, not per greedy round). */
  def mmrRerankFrom(
      pool: DataFrame,
      candidates: DataFrame,
      k: Int = 5,
      lambda: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val cv = withNorm(candidates, "n_id", "nv", "nn")
    val keyed = pool.select("q_id", "n_id", "sim")
      .join(cv, Seq("n_id"))
      .select("q_id", "n_id", "sim", "nv", "nn")
      .transform(Bridge.localCheckpointFreshStats)
    mmrGreedy(keyed, k, lambda)
  }

  private def mmrGreedy(pool: DataFrame, k: Int, lambda: Double): DataFrame = {
    import org.apache.spark.sql.graft.Bridge

    // argmax with deterministic ties: max(struct(score, −n_id)) picks the
    // highest score, then the SMALLER id.
    def pickBest(cand: DataFrame, rank: Int): DataFrame =
      cand.groupBy("q_id")
        .agg(max(struct(col("score"), (-col("n_id")).as("neg_id"))).as("m"))
        .select(col("q_id"), (-col("m.neg_id")).as("n_id"), col("m.score").as("score"))
        .join(pool.select("q_id", "n_id", "nv", "nn"), Seq("q_id", "n_id"))
        .withColumn("rank", lit(rank.toLong))

    var selected = pickBest(pool.withColumn("score", col("sim")), 1)
      .transform(Bridge.localCheckpointFreshStats)
    for (t <- 2 to k) {
      val rem = pool.join(selected.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_anti")
      val selV = selected.select(col("q_id"), col("nv").as("sv"), col("nn").as("sn"))
      val pen = rem.join(selV, Seq("q_id"))
        .withColumn("ps", dot(col("nv"), col("sv")) / (col("nn") * col("sn")))
        .groupBy("q_id", "n_id")
        .agg(max("ps").as("mp"))
      val cand = rem.join(pen, Seq("q_id", "n_id"), "left")
        .withColumn("score", col("sim") - lit(lambda) * coalesce(col("mp"), lit(0.0)))
      val next = selected
        .unionByName(pickBest(cand, t))
        .transform(Bridge.localCheckpointFreshStats)
      // the superseded round's blocks (the PPR prevCkpt pattern) — without
      // this, per-round selected state accumulates across a 240-query
      // double-pass bench session
      Bridge.freeLocalCheckpoint(selected)
      selected = next
    }
    // The pool checkpoint was created (by both callers) solely for the
    // greedy rounds; the returned frame is itself a checkpoint with no
    // lineage into it, so the pool blocks can go now.
    Bridge.freeLocalCheckpoint(pool)
    selected.select("q_id", "rank", "n_id", "score")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match self-join (entity resolution): find record pairs
  * whose names are within a small edit distance, without ever materializing
  * the all-pairs space. The classic training-data / MDM use case: the same
  * real-world entity ingested twice with a typo'd key.
  *
  * Scale shape, `maxDist = 1` (the common typo case): a DELETION-
  * NEIGHBORHOOD join (FastSS/SymSpell). Each name expands to its ≤ len+1
  * single-deletion variants plus itself; `lev(a, b) ≤ 1` implies the two
  * variant sets intersect (equal → the string itself; substitution at i →
  * both sides minus position i; insert/delete → the shorter string), so an
  * equi-join on (block, variant) yields a candidate superset LINEAR in the
  * corpus (n·len variant rows), never block-quadratic. False positives
  * (e.g. "ab"/"ba" share deletion variants at distance 2) are killed by the
  * exact `levenshtein` kernel, which now runs only on candidates. A
  * block-quadratic formulation — even length-band-pruned — pays
  * |block|²/2 kernel calls and dies on any large block; measured on the
  * sf0.1 customer table (15k rows, 25 blocks) the deletion join is ~40×
  * faster, and the gap widens quadratically with block size.
  *
  * For `maxDist > 1` the deletion neighborhood grows C(len, d)-fold, so the
  * operator falls back to the blocked + length-banded quadratic: candidates
  * per *block* (a cheap equality key the caller trusts, e.g. nation),
  * pruned by the band |len(a) − len(b)| ≤ maxDist — necessary for
  * `lev ≤ maxDist`, O(1) vs the O(len²) kernel — then scored. At 100 TB
  * that path needs the block key to keep blocks bounded (add a length
  * bucket or name prefix if a block can exceed ~10⁵ rows).
  */
object EntityResolution {

  /** Pairs within `maxDist` edits, blocked on `blockCol`.
    * Returns (a_id, b_id, a_name, b_name, dist), a_id < b_id.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String,
      maxDist: Int): DataFrame =
    if (maxDist == 1) fuzzyPairsDeletion(df, idCol, nameCol, blockCol)
    else fuzzyPairsBlocked(df, idCol, nameCol, blockCol, maxDist)

  /** Deletion-neighborhood candidate join, exact for `maxDist = 1`. */
  private def fuzzyPairsDeletion(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String): DataFrame = {
    val base = df.select(
      col(blockCol).as("blk"),
      col(idCol).as("id"),
      col(nameCol).as("nm"))
    val variants = base.select(
      col("blk"),
      col("id"),
      col("nm"),
      // D(nm) = {nm} ∪ single-deletions; array_union dedups the repeated-
      // char case ("aa" deletes to "a" twice) so no duplicate candidates.
      explode(expr(
        """array_union(
          |  array(nm),
          |  CASE WHEN length(nm) >= 1
          |       THEN transform(sequence(1, length(nm)), i ->
          |              concat(substring(nm, 1, i - 1),
          |                     substring(nm, i + 1, length(nm))))
          |       ELSE array() END)""".stripMargin)).as("v"))
    val a = variants.toDF("blk", "a_id", "a_name", "v")
    val b = variants.toDF("blk", "b_id", "b_name", "v")
    a.join(b, Seq("blk", "v"))
      .filter(col("a_id") < col("b_id"))
      // A pair can share several variants — collapse BEFORE the kernel.
      .select("a_id", "b_id", "a_name", "b_name")
      .distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 1)
      .select(
        col("a_id"),
        col("b_id"),
        col("a_name"),
        col("b_name"),
        col("dist").cast("long").as("dist"))
  }

  /** Full entity-merge pipeline (record linkage → survivorship): fuzzy
    * pairs → connected components (a chain a~b~c is ONE entity even when
    * lev(a, c) > maxDist — the greedy pairwise view would split it) →
    * golden record per entity by a deterministic survivorship policy
    * (longest name, ties to the smallest id — one struct-max aggregate,
    * no window). Returns `(entity_id, n_members, rep_id, rep_name)`,
    * entity_id = the component's smallest member id; singletons are their
    * own entity.
    *
    * Scale shape: the pair stage is [[fuzzyPairs]] (linear deletion join
    * at maxDist 1); the closure is the checkpointed min-label propagation
    * of `Dedup.duplicateClusters` (O(diameter) rounds — component
    * diameters in ER are tiny); unpaired records never enter the
    * closure — they rejoin as singleton entities via a left join against
    * the O(paired) label table.
    */
  def mergeEntities(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String,
      maxDist: Int = 1): DataFrame = {
    val pairs = fuzzyPairs(df, idCol, nameCol, blockCol, maxDist).select("a_id", "b_id")
    val clusters = Dedup.duplicateClusters(pairs)
    df.select(col(idCol).as("doc_id"), col(nameCol).as("nm"))
      .join(clusters, Seq("doc_id"), "left")
      .select(
        col("doc_id").as("id"),
        col("nm"),
        coalesce(col("cluster_id"), col("doc_id")).as("entity_id"))
      .groupBy("entity_id")
      .agg(
        count(lit(1)).cast("long").as("n_members"),
        max(struct(
          length(col("nm")).as("l"),
          (-col("id")).as("nid"),
          col("id").as("id"),
          col("nm").as("nm"))).as("best"))
      .select(
        col("entity_id"),
        col("n_members"),
        col("best.id").as("rep_id"),
        col("best.nm").as("rep_name"))
  }

  /** Block-quadratic fallback for `maxDist > 1`: length band before kernel. */
  private def fuzzyPairsBlocked(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String,
      maxDist: Int): DataFrame = {
    val a = df.select(
      col(blockCol).as("blk"),
      col(idCol).as("a_id"),
      col(nameCol).as("a_name"))
    val b = df.select(
      col(blockCol).as("blk"),
      col(idCol).as("b_id"),
      col(nameCol).as("b_name"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      // length band first: necessary for lev ≤ d, and O(1) vs the O(len²) kernel
      .filter(abs(length(col("a_name")) - length(col("b_name"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(
        col("a_id"),
        col("b_id"),
        col("a_name"),
        col("b_name"),
        col("dist").cast("long").as("dist"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA (top principal direction) over the embedding corpus —
  * the dimensionality diagnostic a vector pipeline runs before choosing
  * index parameters (how concentrated is the corpus? is one direction
  * soaking up the variance after a bad normalization?).
  *
  * Split follows the IVF/centroid discipline: the corpus-sized work is ONE
  * declarative aggregate — the d×d gram matrix, upper triangle, with
  * products quantized to 12 dp DECIMAL so the sum is order-insensitive
  * across engines and partitionings (same contract as the centroid-cosine
  * and LM-score queries) — and only the O(d²) model ever reaches the
  * driver, where a fixed-iteration power method (pure deterministic double
  * arithmetic, uniform start vector) extracts the dominant eigenpair.
  * Uncentered second moment about the origin, the usual choice for
  * embedding geometry; center upstream if mean-removal is wanted.
  *
  * Scale shape: the double explode emits n·d(d+1)/2 product terms, but
  * they combine map-side onto d(d+1)/2 keys before the one exchange — at
  * any corpus size the shuffle carries O(partitions · d²) rows, and d is
  * 64–4096 for real embedding tables. Nothing else leaves the executors.
  */
object Pca {

  /** Upper-triangle uncentered gram: one row per (i ≤ j) with the exact
    * DECIMAL(38,0) sum of products quantized to 10⁻¹²-units
    * (`round(xᵢ·xⱼ·10¹²)` half-away-from-zero — one double multiply +
    * round + long per term, deterministic in every IEEE engine). `dim` is
    * the embedding width (schema knowledge the caller has); it recovers
    * (i, j) from the kernel's row-major triangle positions via a
    * broadcast-joined d-row offset table — integer arithmetic, no inverse
    * square roots.
    *
    * Hot path: ONE codegen'd kernel call emits each vector's d(d+1)/2
    * terms ([[org.apache.spark.sql.graft.GramTerms]] — replaces the
    * slice + nested-explode spelling, one Generate instead of two), then
    * LONG partials per (pos, input partition) — exact while a partition
    * holds under ~9×10⁶ vectors, far above any sane `maxPartitionBytes` —
    * and DECIMAL only over the O(partitions·d²) partials, where overflow
    * is impossible at any corpus size. Exact integers throughout: the
    * result is independent of partitioning and row order. */
  def gram(embeddings: DataFrame, dim: Int): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, GramTerms}
    val spark = embeddings.sparkSession
    import spark.implicits._
    val offsets = (0 until dim)
      .map(i => (i, i.toLong * dim - i.toLong * (i - 1) / 2))
      .toDF("i", "row_start")
    embeddings
      .select(
        posexplode(Bridge.column(GramTerms(Bridge.expression(col("embedding")))))
          .as(Seq("pos", "pl")),
        spark_partition_id().as("part"))
      .groupBy("pos", "part")
      .agg(sum("pl").as("pp"))
      .groupBy("pos")
      .agg(sum(col("pp").cast("decimal(38,0)")).as("g"))
      .join(
        broadcast(offsets),
        col("pos") >= col("row_start") &&
          col("pos") < col("row_start") + (lit(dim) - col("i")))
      .select(
        col("i"),
        (col("i") + (col("pos") - col("row_start"))).cast("int").as("j"),
        col("g"))
  }

  /** Dominant eigenpair of the collected gram via `iters` power-method
    * steps from the uniform unit vector. Deterministic: fixed iteration
    * count, fixed accumulation order (index-ascending loops), driver-local
    * doubles. Returns (unit eigenvector, Rayleigh quotient λ₁). */
  def topComponent(gramRows: Array[Row], dim: Int, iters: Int = 100): (Array[Double], Double) = {
    val a = Array.ofDim[Double](dim, dim)
    gramRows.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val g = r.getAs[java.math.BigDecimal]("g").doubleValue / 1e12 // 10⁻¹²-units → value
      a(i)(j) = g
      a(j)(i) = g
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += a(i)(j) * v(j); j += 1 }
        s
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      v = if (n > 0) w.map(_ / n) else v
    }
    val av = Array.tabulate(dim) { i =>
      var s = 0.0
      var j = 0
      while (j < dim) { s += a(i)(j) * v(j); j += 1 }
      s
    }
    val rayleigh = v.zip(av).map { case (x, y) => x * y }.sum
    (v, rayleigh)
  }
}

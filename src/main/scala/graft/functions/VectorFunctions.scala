package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, as pure Catalyst
  * higher-order functions (codegen'd; no UDF serialization on the 100 TB
  * path).
  *
  * Numeric contract: elements are cast to double *before* any arithmetic and
  * folded strictly left-to-right, which makes results bit-identical to any
  * engine that does sequential double accumulation (the DuckDB oracle's
  * `list_inner_product(CAST(v AS DOUBLE[]), …)` included).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right double dot product — a native codegen'd expression
    * ([[graft.plans.DotProduct]]); the composed `aggregate(zip_with(...))`
    * form is CodegenFallback and profiled ~20× slower on pairwise joins. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, DotProduct}
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  }

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity from a precomputed-norm-free pair of vectors. Prefer
    * precomputing norms per side before a pairwise join (see
    * SimilaritySearch) so each norm is computed once per vector, not per
    * pair. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed-random-projection LSH bucket key: bit b = sign of dot(v, plane_b).
    * Planes are deterministic pseudo-random literals (seeded), broadcast as
    * part of the plan — no data pass needed to build them. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(dot(v, lit(p.toArray)) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce((x, y) => x.bitwiseOR(y))

  /** Deterministic hyperplanes for [[srpBucket]] (seeded; no wall-clock or
    * unseeded randomness anywhere in the plan). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Symmetric int8 quantization of an embedding: `q_i = ⌊v_i·127/max|v| +
    * 0.5⌋` as `array<bigint>` (range [-127, 127]; an all-zero vector
    * quantizes to zeros). The storage/bandwidth scale lever — 4× smaller
    * vectors for ANN candidate stages that re-rank survivors at full
    * precision.
    *
    * Determinism: `floor(x + 0.5)` instead of `round()` — engines disagree
    * on round-half-to-even vs half-away-from-zero for doubles, while floor
    * is exact; the mul/div chain is left-associated IEEE arithmetic,
    * bit-identical anywhere. Native kernel
    * ([[org.apache.spark.sql.graft.QuantizeInt8]]): the HOF composition
    * (`array_max(transform(abs))` + two `transform` lambdas) evaluates
    * interpreted and measured ~3× slower end-to-end on the quantization
    * query at sf0.1 (0.94 s → 0.29 s). */
  def quantizeInt8(v: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, QuantizeInt8}
    Bridge.column(QuantizeInt8(Bridge.expression(asDouble(v))))
  }
}

package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gram is invariant to the INPUT partition layout (partition-id partials are exact)") {
    // the two-stage sum keys partials by spark_partition_id — different
    // input layouts produce different partials but the exact-integer merge
    // must erase the difference bit for bit
    val vecs = (0 until 30)
      .map(k => (k.toLong, Array.tabulate(6)(i => (k * 6 + i) * 0.01f - 0.8f)))
    def canon(np: Int) = Pca
      .gram(vecs.toDF("vec_id", "embedding").repartition(np), 6)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[java.math.BigDecimal](2).toString))
      .sortBy(t => (t._1, t._2))
      .toSeq
    assert(canon(1) === canon(7))
  }

  test("power method recovers a planted dominant direction; gram is entry-exact") {
    val dim = 8
    val u = Array(0.5f, 0.5f, 0.5f, 0.5f, 0f, 0f, 0f, 0f) // unit, planted
    // 40 vectors along ±u with deterministic small per-axis wobble
    val rows = (0 until 40).map { k =>
      val sign = if (k % 2 == 0) 1f else -1f
      val scale = 1f + (k % 5) * 0.1f
      val v = Array.tabulate(dim)(i => u(i) * sign * scale + (if (i == k % dim) 0.01f else 0f))
      (k.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val g = Pca.gram(df, dim).collect()
    assert(g.length === dim * (dim + 1) / 2)

    // entry-exactness: (0,1) entry equals the 10⁻¹²-unit quantized model sum
    val model01 = rows
      .map { case (_, v) =>
        BigDecimal(v(0).toDouble * v(1).toDouble * 1e12)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong
      }
      .sum
    val got01 = g
      .find(r => r.getAs[Int]("i") == 0 && r.getAs[Int]("j") == 1)
      .map(r => r.getAs[java.math.BigDecimal]("g").longValueExact)
      .get
    assert(got01 === model01)

    val (v1, lam) = Pca.topComponent(g, dim)
    val cos = math.abs(v1.zip(u.map(_.toDouble)).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"pc1 misses the planted direction: |cos| = $cos")
    val maxDiag = g
      .filter(r => r.getAs[Int]("i") == r.getAs[Int]("j"))
      .map(_.getAs[java.math.BigDecimal]("g").doubleValue / 1e12)
      .max
    assert(lam >= maxDiag, "dominant eigenvalue must dominate every coordinate axis")
  }
}

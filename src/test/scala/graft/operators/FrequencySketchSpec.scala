package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch contract: never undercounts, shard-merge is exact, and
  * the build plan ships sketches across the one exchange — not rows.
  */
class FrequencySketchSpec extends SparkSpec {

  private val Eps = 0.01
  private val Conf = 0.999
  private val Seed = 7

  private def tokenDf = {
    import spark.implicits._
    // Known frequencies: "a"×100, "b"×40, "c"×7, singletons d0..d99.
    val rows =
      Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ Seq.fill(7)("c") ++
        (0 until 100).map(i => s"d$i")
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "tok")
  }

  test("estimates never undercount, and heavy hitters are near-exact") {
    val df = tokenDf
    val cms = FrequencySketch.build(df, "tok", Eps, Conf, Seed)
    val exact = df.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = cms.totalCount()
    assert(n === 247L)
    exact.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"undercount for $t: est=$est exact=$c")
      assert(est <= c + (Eps * n).toLong + 1, s"overcount for $t: est=$est exact=$c")
    }
  }

  test("per-shard sketches merged on the driver equal the whole-stream sketch") {
    val df = tokenDf.withColumn("shard", (col("id") % 5).cast("int"))
    val single = FrequencySketch.build(df, "tok", Eps, Conf, Seed)
    val merged = FrequencySketch.buildMerged(df, "tok", "shard", Eps, Conf, Seed)
    assert(merged.totalCount() === single.totalCount())
    val terms = tokenDf.select("tok").distinct().collect().map(_.getString(0))
    terms.foreach { t =>
      assert(merged.estimateCount(t) === single.estimateCount(t), s"merge drift for $t")
    }
  }

  test("empty and all-null inputs yield an empty sketch, not a failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "tok")
    assert(FrequencySketch.build(empty, "tok", Eps, Conf, Seed).totalCount() === 0L)
    assert(
      FrequencySketch
        .buildMerged(empty.withColumn("shard", lit(0)), "tok", "shard", Eps, Conf, Seed)
        .totalCount() === 0L)
    val nulls = Seq((1L, null: String), (2L, null: String)).toDF("id", "tok")
    assert(FrequencySketch.build(nulls, "tok", Eps, Conf, Seed).totalCount() === 0L)
  }

  test("build plan: partial sketches below the exchange — rows never cross the wire") {
    val df = tokenDf
      .agg(expr(s"count_min_sketch(tok, ${Eps}d, ${Conf}d, $Seed)").as("cms"))
    val p = df.queryExecution.executedPlan.toString
    // Two-phase ObjectHashAggregate: a Partial instance under the exchange
    // folds each partition into a local sketch, so the exchange moves
    // O(partitions) sketch blobs, not O(rows) tokens.
    val idxExchange = p.indexOf("Exchange")
    val idxPartial = p.indexOf("ObjectHashAggregate", idxExchange.max(0))
    assert(p.contains("ObjectHashAggregate"), s"not an object-hash aggregate:\n$p")
    assert(idxExchange >= 0 && idxPartial > idxExchange, s"no partial below exchange:\n$p")
    assert(p.substring(idxPartial).contains("partial_"), s"no partial mode below exchange:\n$p")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Scale spot-check for Joins.binnedRangeJoin vs the naive unkeyed range
  * predicate (which Spark can only plan as BroadcastNestedLoopJoin):
  * synthetic points spread over a timeline, intervals of ~binWidth length.
  * The naive plan evaluates |P|·|I| comparisons regardless of selectivity;
  * the binned plan's work scales with the OUTPUT (pairs that share a bin),
  * so growing both sides 10× grows naive cost 100× but binned cost ~10×.
  *
  * Usage: `sbt "runMain graft.tools.RangeJoinBench [points] [intervals]"`.
  */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toLong).getOrElse(200000L)
    val nIntervals = args.drop(1).headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Timeline sized so each interval overlaps ~32 points — constant
    // per-interval selectivity across scales, so output grows linearly.
    val span = nPoints * 4
    val binW = (span / nIntervals).max(1L)
    def points = spark
      .range(nPoints)
      .select((pmod(xxhash64(col("id")), lit(span))).as("p"))
    def intervals = spark
      .range(nIntervals)
      .select(
        col("id").as("iid"),
        pmod(xxhash64(col("id"), lit(7)), lit(span)).as("lo"))
      .withColumn("hi", col("lo") + lit(binW * 2))

    def binned(): Long =
      Joins.binnedRangeJoin(points, "p", intervals, "lo", "hi", binW).count()

    def naive(): Long =
      points.join(intervals, col("p").between(col("lo"), col("hi"))).count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(
        f"[rangescale] $name%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$out  (P=$nPoints I=$nIntervals binW=$binW)")
    }
    binned() // warmup
    time("binned")(binned())
    time("binned")(binned())
    time("naive")(naive())
    spark.stop()
  }
}

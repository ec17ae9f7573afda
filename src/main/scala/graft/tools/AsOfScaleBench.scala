package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Scale spot-check for AsOfJoin.asOfBackward: synthetic deep-history
  * workload (KEYS keys × EVENTS_PER_KEY left rows and right rows each, all
  * deterministic), comparing the union-fill operator against the naive
  * range-join formulation (join on key + ts inequality, keep max right ts
  * per left row). The range join materializes every (left, earlier-right)
  * pair — O(history²) per key — where union-fill sorts each key group once.
  *
  * Usage: `sbt "runMain graft.tools.AsOfScaleBench [keys] [perKey]"`.
  */
object AsOfScaleBench {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(1500)
    val perKey = args.drop(1).headOption.map(_.toInt).getOrElse(700)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // left rows at odd ticks, right rows at even ticks — every left row has
    // ~perKey/2 earlier rights, the naive join's quadratic sweet spot.
    val n = keys.toLong * perKey
    val left = spark.range(n).select(
      (col("id") % keys).as("k"),
      (col("id") / keys * 2 + 1).as("lts"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % keys).as("k"),
      (col("id") / keys * 2).as("rts"),
      (col("id") % 1000).cast("double").as("rate"))

    def unionFill(): Long =
      AsOfJoin.asOfBackward(left, right, Seq("k"), "lts", "rts").count()

    def naiveRange(): Long = {
      val byLeft = Window.partitionBy("lid").orderBy(col("rts").desc)
      left.join(right, Seq("k"))
        .filter(col("lts") >= col("rts"))
        .withColumn("rn", row_number().over(byLeft))
        .filter(col("rn") === 1)
        .count()
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[asofscale] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$out  (keys=$keys perKey=$perKey)")
    }
    unionFill() // warmup
    time("union-fill")(unionFill())
    time("union-fill")(unionFill())
    time("range-join")(naiveRange())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** One-JVM A/B of the IVF Lloyd-means step: explode-per-dimension + double
  * groupBy (the original) vs a single hash aggregate with `dim` avg
  * expressions. Ambient machine noise shifts between JVMs, so both forms
  * run interleaved here. */
object IvfBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nlist = 8

    val c = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("nv"))
    def assign(cents: Array[(Int, Array[Double])]): Column =
      array_max(array(cents.map { case (cid, v) =>
        struct(dot(col("nv"), lit(v)).as("d"), lit(cid).as("cid"))
      }: _*)).getField("cid")
    val seeds = c.orderBy("n_id").limit(nlist).select("nv").collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    val dims = seeds.head._2.length
    val assigned = c.withColumn("cell", assign(seeds))

    def meansExplode(): Int = assigned
      .withColumn("i", explode(sequence(lit(0), lit(dims - 1))))
      .select(col("cell"), col("i"), element_at(col("nv"), col("i") + 1).as("x"))
      .groupBy("cell", "i").agg(avg("x").as("m"))
      .groupBy("cell")
      .agg(sort_array(collect_list(struct(col("i"), col("m")))).as("mv"))
      .collect().length

    def meansSingleAgg(): Int = assigned
      .groupBy("cell")
      .agg(array((0 until dims).map(i => avg(element_at(col("nv"), i + 1))): _*).as("mv"))
      .collect().length

    meansExplode(); meansSingleAgg() // warmup
    val pairs = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); meansExplode(); val a = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); meansSingleAgg(); val b = (System.nanoTime() - t1) / 1e9
      (a, b)
    }
    println(f"[ivfbench] explode+2xgroupBy min=${pairs.map(_._1).min}%.3f s  runs=${pairs.map(p => f"${p._1}%.3f").mkString(",")}")
    println(f"[ivfbench] single-agg        min=${pairs.map(_._2).min}%.3f s  runs=${pairs.map(p => f"${p._2}%.3f").mkString(",")}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.sources.Tables

/** A/B bench for the Dedup.capBuckets implementation under bucket skew.
  *
  * Corpus: sf0.1 documents plus one document cloned `CLONES` times — the
  * template-text pathology the cap exists for. Both forms compute the minhash
  * band keys (the expensive subtree) and then drop oversized buckets:
  *
  *   A (window):   count().over(Window.partitionBy(bucket)) — signature
  *                 evaluated once, but WindowExec buffers each bucket's rows
  *                 in one task (ExternalAppendOnlyUnsafeRowArray, spills).
  *   B (anti-join): groupBy(bucket).count → oversized list → broadcast
  *                 left-anti — no buffering, skew-immune counting, but the
  *                 signature subtree is evaluated twice.
  *
  * Usage: `sbt "runMain graft.tools.CapBench [clones]"`.
  */
object CapBench {
  def main(args: Array[String]): Unit = {
    val clones = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val template = docs.orderBy("doc_id").limit(1).select(col("text")).head.getString(0)
    val cloned = spark.range(clones)
      .select((col("id") + 10000000L).as("doc_id"), lit(template).as("text"))
    val corpus = docs.unionAll(cloned)

    val numPerm = 16; val bands = 4; val rowsPerBand = 4; val maxBucket = 2000
    def banded(d: DataFrame): DataFrame = d
      .select(col("doc_id"), T.shingleHashes(T.tokens(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", T.minhashSignature(col("sh"), numPerm))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .select(
        col("doc_id"),
        hash((col("band") +: (0 until rowsPerBand).map { r =>
          element_at(col("sig"), col("band") * rowsPerBand + r + 1)
        }): _*).as("bucket"))

    def capWindow(keyed: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      keyed
        .withColumn("_bn", count(lit(1)).over(Window.partitionBy(col("bucket"))))
        .filter(col("_bn") <= maxBucket)
        .drop("_bn")
    }
    def capAnti(keyed: DataFrame): DataFrame = {
      val bad = keyed.groupBy("bucket").agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") > maxBucket)
        .select("bucket")
      keyed.join(broadcast(bad), Seq("bucket"), "left_anti")
    }

    def time(name: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[capbench] $name%-18s min=${runs.map(_._1).min}%7.2f s  rows=${runs.head._2}  runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }

    // warmup both
    capWindow(banded(corpus)).count(); capAnti(banded(corpus)).count()
    time("window")(capWindow(banded(corpus)).count())
    time("agg+anti")(capAnti(banded(corpus)).count())
    // also on the clean corpus (no pathology) — the always-paid cost
    capWindow(banded(docs)).count(); capAnti(banded(docs)).count()
    time("window/clean")(capWindow(banded(docs)).count())
    time("agg+anti/clean")(capAnti(banded(docs)).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.kv.{LogStructuredTable, WideColumnTable}

/** Empirical cost-profile check for the two KV write paths: HBase `put` is
  * O(batch) (reference HBaseClient.java:95-111 — WAL/memstore append);
  * `WideColumnTable.put` read-merge-rewrites the touched family, O(family);
  * `LogStructuredTable.putLog` appends, O(batch). This probe grows the base
  * and times one fixed-size batch against each — the rewrite path's put
  * latency must grow with the base, the log path's must not. Also times the
  * two read paths (direct scan vs merge-on-read with k outstanding logs),
  * showing the read amplification the log path trades for its writes, and
  * its disappearance after `compact()`.
  *
  * Usage: `sbt "runMain graft.tools.LsmBench [baseCells...]"` (default
  * 10000 100000 1000000).
  */
object LsmBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(10000L, 100000L, 1000000L)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cells(n: Long, tag: String) = spark
      .range(n)
      .select(
        concat(lit(tag), col("id")).as("row_key"),
        lit("cf").as("family"),
        lit("v").as("qualifier"),
        col("id").cast("string").as("value"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val batch = cells(1000L, "b").cache()
    batch.count()

    println(f"${"base"}%10s ${"put(rewrite)"}%14s ${"putLog"}%10s " +
      f"${"scan"}%8s ${"view(5 logs)"}%14s ${"view(compacted)"}%16s")
    sizes.foreach { n =>
      val wh = java.nio.file.Files.createTempDirectory("graft-lsmbench").toString
      val w = new WideColumnTable(spark, wh, "rewrite")
      val l = new LogStructuredTable(spark, wh, "log")
      w.put(cells(n, "r"))
      l.create(); l.putLog(cells(n, "r")); l.compact()

      val (_, tPut) = timed(w.put(batch))
      val (_, tLog) = timed(l.putLog(batch))
      (0 until 4).foreach(_ => l.putLog(batch)) // 5 outstanding logs total
      val (_, tScan) = timed(w.scan("r", "s").agg(count(lit(1))).head())
      val (_, tView) = timed(l.readView().agg(count(lit(1))).head())
      l.compact()
      val (_, tViewC) = timed(l.readView().agg(count(lit(1))).head())
      println(f"$n%10d ${tPut}%14.2f ${tLog}%10.2f $tScan%8.2f $tView%14.2f $tViewC%16.2f")
    }
    spark.stop()
  }
}

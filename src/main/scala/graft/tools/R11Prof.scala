package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Optimization-round profiler (guide §1.1/§1.5): runs named queries from
  * [[SparkEntry.queries]] with the Spark event log ON and every action
  * labeled with its query name (`setJobDescription`), so the log can be
  * aggregated offline into per-query job counts / per-callsite hot-spot
  * tables (`tools/evlog_hotspots.py`). One untimed warmup pass then one
  * labeled timed pass per query — same noop-sink forcing as graft.Bench so
  * the measured shape matches the bench's.
  *
  * Usage: `SPARK_GRAFT_QUERIES=q_a,q_b SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * sbt "runMain graft.tools.R11Prof"`; event log lands under /tmp/evlog.
  */
object R11Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_QUERIES=q_a,q_b,...")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/tmp/evlog"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "file:///tmp/evlog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"warmup:$n")
      try force(n) catch { case e: Throwable => println(s"[prof] $n warmup failed: $e") }
    }
    System.gc()
    names.foreach { n =>
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      try force(n) catch { case e: Throwable => println(s"[prof] $n failed: $e") }
      println(f"[prof] $n%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    println(s"[prof] app id: ${spark.sparkContext.applicationId}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Isolation bench for regression adjudication: runs a named subset of
  * [[SparkEntry.queries]] alone — one warmup + three timed runs each,
  * min reported — so a query flagged by the full suite's drift check can
  * be separated into "the operator got slower" (isolated time moved too)
  * vs "the suite around it changed" (isolated time matches the old
  * anchor; the full-suite number was neighborhood pressure from heavier
  * queries sharing the JVM — GC debt, page-cache churn). The full bench
  * measures the fleet experience; this measures the operator.
  *
  * Usage: `SPARK_GRAFT_QUERIES=q_ppr,q_lcc SPARK_GRAFT_SF_DIR=... sbt
  * "runMain graft.tools.IsoBench"`.
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_QUERIES=q_a,q_b,...")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      ()
    }
    names.foreach { n =>
      try force(n) catch { case e: Throwable => println(s"[iso] $n warmup failed: $e") }
      System.gc()
      // a failed timed run must NOT report a bogus fast min — record it
      // as failed and exclude it from the statistics
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(n); true } catch {
          case e: Throwable => println(s"[iso] $n timed run failed: $e"); false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = runs.collect { case (t, true) => t }
      val label = runs.map { case (t, ok) => if (ok) f"$t%.3f" else "FAIL" }.mkString(",")
      if (good.isEmpty)
        println(f"[iso] $n%-32s min=   FAIL s  runs=$label")
      else
        println(f"[iso] $n%-32s min=${good.min}%7.3f s  runs=$label")
    }
    spark.stop()
  }
}

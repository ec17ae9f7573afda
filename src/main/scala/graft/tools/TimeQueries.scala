package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times named queries (all when none given) exactly the way Bench does —
  * warmup pass, then min of N timed `count()` runs — but scoped to a subset,
  * for isolating regressions without a full bench pass.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TimeQueries q_sessionize ..."`.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) { // warmup
      try SparkEntry.queries(q)(spark, dir).count()
      catch { case e: Throwable => println(s"[warmup] $q FAILED: $e") }
    }
    System.gc()
    Thread.sleep(500)
    for (q <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $q%-28s min=${times.min}%7.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

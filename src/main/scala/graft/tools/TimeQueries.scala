package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times named queries (all when none given) exactly the way Bench does —
  * warmup pass, then min of N timed runs forced through the noop sink (every
  * output column evaluated; a bare `count()` would let Catalyst prune
  * computed projections and the final sort) — but scoped to a subset, for
  * isolating regressions without a full bench pass. `--count` switches to
  * count() forcing, useful only for measuring how much of a query's cost is
  * the projection/sort that count elides.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TimeQueries [--count] q_sessionize ..."`.
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
    val (useCount, rest) = (args.contains("--count"), args.filterNot(_ == "--count").toSeq)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      if (useCount) df.count()
      else df.write.format("noop").mode("overwrite").save()
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) { // warmup
      try force(SparkEntry.queries(q)(spark, dir))
      catch { case e: Throwable => println(s"[warmup] $q FAILED: $e") }
    }
    System.gc()
    Thread.sleep(500)
    for (q <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(SparkEntry.queries(q)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $q%-28s min=${times.min}%7.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

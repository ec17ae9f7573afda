package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints `explain("formatted")` for the named queries (all
  * when none given) so shuffle counts, pushdown (`PushedFilters`), pruning
  * (`ReadSchema`) and join strategies can be reviewed per query.
  *
  * With `--run` as the first arg, each query is also executed and the FINAL
  * adaptive plan printed — this is where AQE's runtime decisions appear
  * (ReusedExchange/ReusedSubquery stage dedup, sort-merge→broadcast
  * demotions, partition coalescing), none of which the static explain shows.
  *
  * Usage: `sbt "runMain graft.tools.PlanAudit [--run] q_daily_energy ..."`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (run, rest) = (args.contains("--run"), args.filterNot(_ == "--run").toSeq)
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      df.explain("formatted")
      if (run) {
        df.count()
        println(s"----- $q final adaptive plan -----")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}

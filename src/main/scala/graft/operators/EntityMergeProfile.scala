package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Stage attribution for q_entity_merge (slowest query three rounds
  * running): pair generation vs label-propagation closure vs the golden-
  * record aggregate, plus the round count the closure needed. */
object EntityMergeProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = Tables.customer(spark, dir)
    c.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[em] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round --")
      val pairs = t("fuzzyPairs force") {
        val p = EntityResolution.fuzzyPairs(c, "c_custkey", "c_name", "c_nationkey", 1)
        println(s"[em]   n_pairs=${p.count()}")
        p
      }
      val cl = t("duplicateClusters") {
        val (cl, rounds) =
          Dedup.duplicateClustersWithRounds(pairs.select("a_id", "b_id"))
        println(s"[em]   rounds=$rounds n_labels=${cl.count()}")
        cl
      }
      t("full mergeEntities") {
        EntityResolution.mergeEntities(c, "c_custkey", "c_name", "c_nationkey")
          .write.format("noop").mode("overwrite").save()
      }
      cl.unpersist()
    }
    spark.stop()
  }
}

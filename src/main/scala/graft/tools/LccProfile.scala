package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage accounting for the per-node triangle census: where do the
  * lcc seconds go — the edge build, the census, or the attribution? */
object LccProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.sources.Tables.lineitem(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n)")
    }
    // warmup
    graft.operators.Analytics.coOrderEdges(li).count()
    time("coOrderEdges.count") {
      graft.operators.Analytics.coOrderEdges(li).count()
    }
    time("triangleStats") {
      graft.operators.Analytics
        .triangleStats(graft.operators.Analytics.coOrderEdges(li)).count()
    }
    time("lcc") {
      graft.operators.Analytics
        .localClusteringCoefficient(graft.operators.Analytics.coOrderEdges(li), 40)
        .count()
    }
    // lcc over pre-materialized edges: how much is repeated edge builds?
    val edges = graft.operators.Analytics.coOrderEdges(li).localCheckpoint()
    edges.count()
    time("lcc (edges cached)") {
      graft.operators.Analytics.localClusteringCoefficient(edges, 40).count()
    }
    time("triangles (edges cached)") {
      graft.operators.Analytics.triangleStats(edges).count()
    }
    spark.stop()
  }
}

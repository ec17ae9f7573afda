package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextSearchIndex
import graft.sources.Tables

/** Phase-level timing of q_text_index_upsert_gate's operations — which of
  * the gate's fixed steps (build / delete / upsert / searches / compact)
  * owns its ~8 s wall clock, so the optimization lands on the operator,
  * not the gate. Usage: `sbt "runMain graft.tools.TextUpsertProfile"`. */
object TextUpsertProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"  $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val docs = Tables.documents(spark, dir).filter(col("doc_id") < 1000)
      val idx = java.nio.file.Files.createTempDirectory("graft-profile-tug").toString
      val even = docs.filter(col("doc_id") % 2 === 0)
      time("build")(TextSearchIndex.build(even, idx))
      time("delete")(
        TextSearchIndex.delete(docs.select("doc_id").filter(col("doc_id") % 10 === 2), idx))
      val upserts = even
        .filter(col("doc_id") % 10 === 4 || col("doc_id") % 20 === 2)
        .withColumn("text", concat(col("text"), lit(" upsertmarker upsertmarker")))
      time("upsert")(TextSearchIndex.upsert(upserts, idx))
      time("search marker k=1e6 collect")(
        TextSearchIndex.search(spark, idx, Seq("upsertmarker"), 1000000).collect())
      time("search bm25 k=1e6 collect")(
        TextSearchIndex.search(
          spark, idx, Seq("filter", "stream", "vector"), 1000000).collect())
      time("search top10")(
        TextSearchIndex.search(spark, idx, Seq("filter", "stream", "vector"), 10).collect())
      time("compact")(TextSearchIndex.compact(spark, idx))
      time("search top10 post-compact")(
        TextSearchIndex.search(spark, idx, Seq("filter", "stream", "vector"), 10).collect())
      time("upserts.collect (id set)")(upserts.select("doc_id").collect())
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located join via bucketing (SURVEY §4 / 100 TB design): when both join
  * sides are bucketed and sorted on the join key, Catalyst plans a
  * SortMergeJoin with NO shuffle exchange — the physical property the
  * reference got from HBase's rowkey ordering, recovered in Spark with
  * `bucketBy`. At 100 TB this is the difference between re-shuffling the
  * fact table per join and reading co-located buckets. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-dim join plans without a shuffle exchange") {
    // warehouse dir is a static conf; tables land in the default
    // spark-warehouse/ (gitignored). The metastore is in-memory per JVM, so
    // also remove leftover physical dirs from prior runs.
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    for (t <- Seq("b_facts", "b_dim")) {
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        import scala.reflect.io.Directory
        new Directory(d).deleteRecursively()
      }
    }

    (1 to 1000)
      .map(i => (s"0401_$i", i.toDouble))
      .toDF("row_key", "bmz")
      .write
      .bucketBy(8, "row_key")
      .sortBy("row_key")
      .saveAsTable("b_facts")
    (1 to 1000)
      .map(i => (s"0401_$i", 2.0))
      .toDF("row_key", "zhbl")
      .write
      .bucketBy(8, "row_key")
      .sortBy("row_key")
      .saveAsTable("b_dim")

    val joined = spark
      .table("b_facts")
      .hint("merge") // force SMJ so the bucket co-location (not broadcast) is what's tested
      .join(spark.table("b_dim"), Seq("row_key"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("SortMergeJoin"))
    assert(
      !physical.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$physical")
    assert(joined.count() === 1000)
    assert(joined.filter(col("bmz") * col("zhbl") =!= col("bmz") * 2.0).count() === 0)
  }
}

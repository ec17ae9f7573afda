package graft.sources

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

/** Proves the co-location claim: two tables bucketed on the same key with
  * the same bucket count join with ZERO shuffle exchanges (broadcast
  * disabled, so the plan can't cheat with a BroadcastExchange). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join and aggregate with zero shuffles") {
    val facts = (0 until 10000).map(i => (i.toLong % 500, i.toDouble)).toDF("k", "v")
    val dims = (0L until 500L).map(k => (k, s"attr-$k")).toDF("k", "attr")
    Bucketing.writeBucketed(facts, "bkt_facts", "k", 8, SaveMode.Overwrite)
    Bucketing.writeBucketed(dims, "bkt_dims", "k", 8, SaveMode.Overwrite)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Bucketing
          .read(spark, "bkt_facts")
          .join(Bucketing.read(spark, "bkt_dims"), Seq("k"))
        val p = joined.queryExecution.executedPlan.toString
        val shuffles = "Exchange (hash|range|Single)".r.findAllIn(p).size
        assert(shuffles === 0, s"bucketed join should not shuffle, plan:\n$p")
        assert(joined.count() === 10000)

        // groupBy on the bucket key also rides the existing layout: the
        // partial agg output is already hash-distributed by k
        val agg = Bucketing.read(spark, "bkt_facts").groupBy("k").sum("v")
        val pa = agg.queryExecution.executedPlan.toString
        val aggShuffles = "Exchange (hash|range|Single)".r.findAllIn(pa).size
        assert(aggShuffles === 0, s"bucketed groupBy should not shuffle, plan:\n$pa")
        assert(agg.count() === 500)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }
}

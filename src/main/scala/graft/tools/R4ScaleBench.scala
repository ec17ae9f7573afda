package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Empirical scale spot-check for the round-4 session operators: replicate
  * sf0.1 events `REP`× (ids and users offset per replica so keys multiply,
  * days unchanged — the realistic axis: more traffic per day) and measure
  *
  *   - the stream-style attribution interval join (clicks × purchases),
  *   - the quantile-histogram rollup build + range probe,
  *   - the EWMA per-type fold,
  *   - median/MAD robust outliers,
  *   - PageRank (5 rounds) over the sf0.1 trade graph.
  *
  * The question each answers at REP×: does wall-clock scale like the
  * operator's claimed shape (linear scan/agg work, O(bins)/O(keys)
  * reductions), or is a hidden pairwise/buffered term lurking?
  *
  * Usage: `sbt "runMain graft.tools.R4ScaleBench [rep]"` (default 20).
  */
object R4ScaleBench {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val ev1 = Tables.events(spark, dir)
    val reps = spark.range(rep).select(col("id").as("r"))
    val ev = ev1
      .crossJoin(broadcast(reps))
      .select(
        (col("event_id") * rep + col("r")).as("event_id"),
        col("ts"),
        (col("user_id") * rep + col("r")).as("user_id"),
        col("event_type"),
        col("value"),
        col("props"))
      .localCheckpoint() // measure the operators, not the replication
    println(s"events: ${ev.count()} rows (rep=$rep)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   (result rows/val: $n)")
    }

    // warmup codegen on the small original
    graft.streaming.StreamJoin.attribution(ev1).count()

    time("attribution") {
      graft.streaming.StreamJoin.attribution(ev).count()
    }
    time("quantile rollup") {
      val h = graft.operators.IncrementalRollup.dailyValueHistograms(ev).localCheckpoint()
      val r = graft.operators.IncrementalRollup
        .quantileOverRange(h, "2024-01-05", "2024-01-20", Seq("0.5", "0.9", "0.99"))
        .count()
      org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(h)
      r
    }
    time("ewma") {
      graft.operators.Analytics.ewmaDaily(ev).count()
    }
    time("mad outliers") {
      graft.operators.Analytics
        .madOutliers(
          ev.select(
            col("event_type"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents")),
          "event_type",
          "cents")
        .count()
    }
    time("winsorize") {
      graft.operators.Analytics
        .winsorize(
          ev.select(
            col("event_type"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents")),
          "event_type",
          "cents")
        .count()
    }
    time("validation expect") {
      graft.operators.Validation
        .expect(
          ev,
          Seq(
            "value_nonneg" -> (col("value") >= 0.0),
            "type_nonnull" -> col("event_type").isNotNull))
        .count()
    }
    // PCA gram scales with the embedding corpus, not events: replicate 20×
    val emb1 = Tables.embeddings(spark, dir)
    val emb = emb1
      .crossJoin(broadcast(reps))
      .select((col("vec_id") * rep + col("r")).as("vec_id"), col("embedding"))
      .localCheckpoint()
    println(s"embeddings: ${emb.count()} vectors")
    time("pca gram+eig") {
      val rows = graft.operators.Pca.gram(emb, 64).collect()
      val d = rows.map(_.getAs[Int]("j")).max + 1
      graft.operators.Pca.topComponent(rows, d)._1.length.toLong
    }
    val pairs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    val edges = pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
    println(s"trade graph edges: ${edges.count()}")
    time("pagerank x5") {
      graft.operators.Analytics.pageRank(edges, iters = 5).count()
    }
    spark.stop()
  }
}

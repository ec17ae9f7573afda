package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-generated test tables (TESTDATA.md).
  *
  * These stand in for the reference's external scans: the Oracle JDBC cursor
  * (reference RdlETL.java:86-101) and the MySQL-wire streaming scan
  * (reference YhCldETL.java:56-68). In production deployment the same
  * call sites would be `spark.read.format("jdbc")` / DSv2 sources — Spark
  * pushes predicates and prunes columns into either source automatically,
  * subsuming the reference's hand-written WHERE clauses and fetch-size
  * tuning (RdlETL.java:96-98).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw nanos (legacy conf) and truncate to microseconds
    * with integer arithmetic (`div`, not `/` — a double round-trip would lose
    * precision at 2^63-scale nano values).
    *
    * The nanosAsLong conf is session-global: any *other* table with a nanos
    * column would silently read as BIGINT after this call. The explicit
    * column list below pins this reader to the documented events schema
    * (TESTDATA.md), so schema drift fails analysis loudly instead of leaking
    * a surprise type downstream. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    // Two testdata generations exist: int64-nanos (read as BIGINT under the
    // nanosAsLong conf, converted here) and native timestamp[us] (read as
    // TIMESTAMP_NTZ — cast to session-TZ TimestampType, value-preserving
    // under the UTC session timezone, so downstream plans see the same
    // TimestampType either way).
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case _ => org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    raw
      .withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

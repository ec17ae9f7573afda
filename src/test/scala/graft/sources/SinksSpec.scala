package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL export: partitioned, size-capped, round-trips through the JSON reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/corpus"
    val docs = (0 until 50)
      .map(i => (i.toLong, s"doc text $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    Sinks.exportJsonl(docs, dir, partitionCols = Seq("lang"), maxRecordsPerFile = 10L)

    // partition directories exist and files respect the record cap
    val base = new java.io.File(dir)
    val partDirs = base.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(partDirs === Set("lang=en", "lang=de"))
    val dataFiles = base.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".json"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val lines = scala.io.Source.fromFile(f).getLines().size
      assert(lines <= 10, s"${f.getName} has $lines lines > cap")
    }

    // round-trip: schema'd JSON read returns the exact rows
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING")
      .json(dir)
      .select("doc_id", "text", "lang")
    assert(back.count() === 50)
    assert(
      back.as[(Long, String, String)].collect().toSet ===
        docs.as[(Long, String, String)].collect().toSet)
    assert(back.filter(col("lang") === "en").count() === 25)

    // destructive-overwrite is opt-in: re-export to the same dir fails by
    // default instead of silently clobbering, succeeds with Overwrite
    intercept[org.apache.spark.sql.AnalysisException] {
      Sinks.exportJsonl(docs, dir, partitionCols = Seq("lang"))
    }
    Sinks.exportJsonl(
      docs, dir, partitionCols = Seq("lang"),
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    assert(spark.read.schema("doc_id BIGINT, text STRING, lang STRING").json(dir).count() === 50)
  }

  test("shard write: layout matches shardManifest, shards read back independently") {
    import graft.operators.Curation
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/shards"
    val docs = (0L until 200L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    Sinks.writeShards(docs, dir, nShards = 8)

    // one shard=K directory per non-empty shard, exactly the manifest's set
    val manifest = Curation
      .shardManifest(docs, 8)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val base = new java.io.File(dir)
    val shardDirs = base.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(shardDirs === manifest.keySet.map(k => s"shard=$k"))

    // each shard directory holds exactly the manifest's count, and one
    // shard can be read alone (the dataloader access pattern)
    val back = spark.read.parquet(dir)
    val counts = back.groupBy("shard").count().collect()
      .map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    assert(counts === manifest)
    val some = manifest.keySet.head
    assert(spark.read.parquet(s"$dir/shard=$some").count() === manifest(some))
    // rerun-stable: writing again lands every doc in the same shard
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/shards"
    Sinks.writeShards(docs, dir2, nShards = 8)
    val counts2 = spark.read.parquet(dir2).groupBy("shard").count().collect()
      .map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    assert(counts2 === counts)
  }

  test("exportOrc: round-trip preserves content; filter pushes into the ORC scan") {
    val docs = Seq(
      (0L, "alpha", "s0"),
      (1L, "beta", "s0"),
      (2L, "gamma", "s1")
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/orc"
    Sinks.exportOrc(docs, dir, partitionCols = Seq("source"))
    val back = spark.read.orc(dir)
    assert(
      back.select("doc_id", "text").as[(Long, String)].collect().toSet ===
        Set((0L, "alpha"), (1L, "beta"), (2L, "gamma")))
    // partition pruning + predicate pushdown both reach the ORC reader
    val q = back.filter($"source" === "s0" && $"doc_id" > 0L).select("text")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,0)]"), s"plan:\n$p")
    assert(p.contains("PartitionFilters"), s"plan:\n$p")
    assert(q.as[String].collect().toSeq === Seq("beta"))
  }

  test("compact: many small files become few, content identical, atomic swap") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val dir = s"$base/ingested"
    // Simulate 20 micro-batch drains: one tiny file each.
    for (b <- 0 until 20)
      Seq((b.toLong, s"doc $b")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir)
    val expected = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val nBefore = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nBefore === 20)

    val (before, after) = Sinks.compact(spark, dir, targetFileBytes = 1L * 1024 * 1024)
    assert(before === 20 && after < 20)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) === after)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet === expected)
    // tmp/old staging dirs are gone
    assert(!new java.io.File(dir + ".compact.tmp").exists())
    assert(!new java.io.File(dir + ".compact.old").exists())
  }
}

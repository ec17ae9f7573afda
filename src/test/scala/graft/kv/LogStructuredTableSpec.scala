package graft.kv

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSM cost-profile parity with HBase `put` (reference HBaseClient.java:
  * 95-111): appends never touch the base, the merged view is last-write-wins
  * with tombstones, and compaction physically collapses the log without
  * changing the view. */
class LogStructuredTableSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): LogStructuredTable = {
    val wh = Files.createTempDirectory("graft-lsm").toString
    val t = new LogStructuredTable(spark, wh, name)
    t.create()
    t
  }

  private def cells(rows: (String, String, String, String)*) =
    rows.toDF("row_key", "family", "qualifier", "value")

  /** (path, size, mtime) of every file under a directory — byte-identity
    * fingerprint for the no-rewrite assertions. */
  private def fileState(dir: String): Set[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
      .map((p: Path) =>
        (root.relativize(p).toString, Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toSet
  }

  test("putLog is O(batch): base files stay byte-identical, one log dir per put") {
    val t = fresh("meters")
    t.putLog(cells(("m1", "cf", "v", "100"), ("m2", "cf", "v", "200")))
    t.compact() // seed a non-empty base
    val baseBefore = fileState(t.baseDir)
    t.putLog(cells(("m1", "cf", "v", "101")))
    t.putLog(cells(("m3", "cf", "v", "300")))
    assert(fileState(t.baseDir) === baseBefore) // append never rewrote the base
    val logDirs = new java.io.File(t.logDir).listFiles().map(_.getName).sorted
    assert(logDirs.length === 2 && logDirs.forall(_.startsWith("seq=")))
  }

  test("status probe tracks log growth and compaction (the time-to-compact signal)") {
    val t = fresh("st")
    t.putLog(cells(("r1", "cf", "a", "1")))
    t.putLog(cells(("r1", "cf", "a", "2")))
    val (_, logBytes, nLogs, _) = t.status()
    assert(nLogs === 2 && logBytes > 0L, "two outstanding log seqs expected")
    t.compact()
    val (baseAfter, logAfter, nAfter, _) = t.status()
    assert(nAfter === 0 && logAfter === 0L, "compaction must drain the log")
    assert(baseAfter > 0L, "compacted cells land in the base")
  }

  test("readView: newest seq wins per cell; untouched cells survive") {
    val t = fresh("lww")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r1", "cf", "b", "2")))
    t.putLog(cells(("r1", "cf", "a", "10"), ("r2", "cf", "a", "5")))
    val v = t.readView().orderBy("row_key", "qualifier")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3)))
    assert(v.toSeq === Seq(("r1", "a", "10"), ("r1", "b", "2"), ("r2", "a", "5")))
  }

  test("tombstone (null value) masks a cell; a later put resurrects it") {
    val t = fresh("tomb")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r1", "cf", "b", "2")))
    t.putLog(Seq(("r1", "cf", "a", Option.empty[String]))
      .toDF("row_key", "family", "qualifier", "value"))
    assert(t.readView().collect().map(_.getString(2)).toSeq === Seq("b"))
    t.putLog(cells(("r1", "cf", "a", "9")))
    assert(t.readView().filter(col("qualifier") === "a").head().getString(3) === "9")
  }

  test("intra-batch duplicates resolve deterministically: non-null beats tombstone") {
    val t = fresh("dup")
    t.putLog(Seq(
      ("r1", "cf", "a", Option("3")),
      ("r1", "cf", "a", Option("7")),
      ("r1", "cf", "a", Option.empty[String])).toDF("row_key", "family", "qualifier", "value"))
    assert(t.readView().head().getString(3) === "7")
  }

  test("compact: view unchanged, log emptied, shadowed cells and tombstones physically gone") {
    val t = fresh("cpt")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r2", "cf", "a", "2"), ("r3", "cf", "a", "3")))
    t.putLog(cells(("r1", "cf", "a", "10"))) // shadow
    t.putLog(Seq(("r2", "cf", "a", Option.empty[String]))
      .toDF("row_key", "family", "qualifier", "value")) // tombstone
    val before = t.readView().orderBy("row_key", "qualifier").collect().toSeq
    t.compact()
    assert(t.readView().orderBy("row_key", "qualifier").collect().toSeq === before)
    val liveLogDirs =
      Option(new java.io.File(t.logDir).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    assert(liveLogDirs.isEmpty, s"folded log dirs must be swept, got $liveLogDirs")
    // physical: the compacted base holds exactly the live cells — no "1",
    // no r2 row, no null values anywhere
    val base = spark.read.parquet(t.baseDir)
    assert(base.count() === 2)
    assert(base.filter(col("value").isNull || col("row_key") === "r2").count() === 0)
    // and the table keeps accepting appends after compaction, with seq
    // numbering continuing PAST the high-water mark (never restarting at 1
    // — a reused sequence number would make as-of snapshots ambiguous)
    t.putLog(cells(("r4", "cf", "a", "4")))
    assert(t.readView().count() === 3)
    val postCompactSeqs = new java.io.File(t.logDir).listFiles().map(_.getName).sorted
    assert(postCompactSeqs.head === s"seq=${t.compactedThrough + 1}")
  }

  test("readViewAsOf: each historical snapshot is exactly the view at that seq") {
    val t = fresh("asof")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r2", "cf", "a", "2"))) // seq 1
    t.putLog(cells(("r1", "cf", "a", "10")))                        // seq 2
    t.putLog(Seq(("r2", "cf", "a", Option.empty[String]))
      .toDF("row_key", "family", "qualifier", "value"))             // seq 3: tombstone
    def snap(s: Long) = t.readViewAsOf(s).orderBy("row_key")
      .collect().map(r => (r.getString(0), r.getString(3))).toSeq
    assert(snap(1L) === Seq(("r1", "1"), ("r2", "2")))
    assert(snap(2L) === Seq(("r1", "10"), ("r2", "2")))
    assert(snap(3L) === Seq(("r1", "10")))
    // as-of the current frontier ≡ the live view
    assert(t.readViewAsOf(99L).orderBy("row_key").collect().toSeq ===
      t.readView().orderBy("row_key").collect().toSeq)
  }

  test("readViewAsOf: snapshots below the compaction mark are discarded, at/above remain") {
    val t = fresh("asof-cpt")
    t.putLog(cells(("r1", "cf", "a", "1"))) // seq 1
    t.putLog(cells(("r1", "cf", "a", "2"))) // seq 2
    t.compact()                             // mark = 2; history below folded
    t.putLog(cells(("r1", "cf", "a", "3"))) // seq 3 (monotone past the mark)
    assert(t.readViewAsOf(2L).head().getString(3) === "2")
    assert(t.readViewAsOf(3L).head().getString(3) === "3")
    val e = intercept[IllegalArgumentException](t.readViewAsOf(1L))
    assert(e.getMessage.contains("predates compaction"))
  }

  test("cellVersions: full newest-first history of one cell, tombstones visible") {
    val t = fresh("hist")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r1", "cf", "b", "x"))) // seq 1
    t.putLog(Seq(("r1", "cf", "a", Option.empty[String]))
      .toDF("row_key", "family", "qualifier", "value"))             // seq 2: delete
    t.putLog(cells(("r1", "cf", "a", "3")))                         // seq 3: resurrect
    val h = t.cellVersions("r1", "cf", "a")
      .collect().map(r => (r.getAs[Long]("seq"), Option(r.getString(3))))
    assert(h.toSeq === Seq((3L, Some("3")), (2L, None), (1L, Some("1"))))
    // maxVersions cap, newest first — HBase get-with-VERSIONS=n
    assert(t.cellVersions("r1", "cf", "a", maxVersions = 2)
      .collect().map(_.getAs[Long]("seq")).toSeq === Seq(3L, 2L))
    // other qualifiers don't leak in
    assert(t.cellVersions("r1", "cf", "b").count() === 1L)
  }

  test("putLogEpoch: a replayed epoch is skipped — exactly-once cell state") {
    val t = fresh("epoch")
    t.putLogEpoch(cells(("r1", "cf", "a", "first")), epoch = 0L)
    // at-least-once delivery replays epoch 0 (crash between sink write and
    // checkpoint commit); the same seq dir exists, so nothing is applied
    t.putLogEpoch(cells(("r1", "cf", "a", "replayed")), epoch = 0L)
    assert(t.readView().head().getString(3) === "first")
    t.putLogEpoch(cells(("r1", "cf", "a", "second")), epoch = 1L)
    assert(t.readView().head().getString(3) === "second")
  }

  test("putLogEpoch: epochs folded by compact are skipped via the high-water mark") {
    val t = fresh("hwm")
    t.putLogEpoch(cells(("r1", "cf", "a", "old")), epoch = 0L)
    t.putLogEpoch(cells(("r1", "cf", "a", "new")), epoch = 1L)
    t.compact()
    assert(t.compactedThrough === 2L)
    // the seq dirs are gone after compaction — without the marker this
    // replay would land above the base's seq 0 and shadow "new" with "old"
    t.putLogEpoch(cells(("r1", "cf", "a", "old")), epoch = 0L)
    assert(t.readView().head().getString(3) === "new")
  }

  test("streaming foreachBatch sink: checkpointed drain, restart, and from-scratch replay") {
    import org.apache.spark.sql.{DataFrame, Row, Dataset}
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft-lsm-stream").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    val t = fresh("stream")
    def feed(rows: (String, String, String, String)*): Unit =
      cells(rows: _*).coalesce(1).write.mode("append").parquet(src)
    def drain(checkpoint: String): Unit = {
      val q = spark.readStream
        .schema("row_key STRING, family STRING, qualifier STRING, value STRING")
        .parquet(src)
        .writeStream
        .foreachBatch((b: Dataset[Row], id: Long) => t.putLogEpoch(b.toDF(), id))
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    feed(("m1", "cf", "v", "1"), ("m2", "cf", "v", "2"))
    drain(ckpt)
    feed(("m1", "cf", "v", "10")) // update arrives in a later micro-batch
    drain(ckpt) // separate run resumed from the checkpoint
    val expect = Set(("m1", "10"), ("m2", "2"))
    def state() =
      t.readView().collect().map(r => (r.getString(0), r.getString(3))).toSet
    assert(state() === expect)
    // from-scratch replay (lost checkpoint): every file re-arrives as epoch
    // 0, which already exists on disk — skipped wholesale, state unchanged
    drain(s"$base/ckpt2")
    assert(state() === expect)
  }

  test("split-path view: base never shuffles — broadcast anti/semi carve, window on the sliver") {
    val t = fresh("split")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r2", "cf", "a", "2"), ("r3", "cf", "a", "3")))
    t.compact()
    t.putLog(cells(("r1", "cf", "a", "10")))
    val p = t.readView().queryExecution.executedPlan.toString
    // both carve joins are broadcast (log keys build side), so the base
    // FileScans feed the joins directly — a shuffled carve would plan
    // SortMergeJoin with exchanges over the base
    assert(p.contains("LeftAnti") && p.contains("LeftSemi"), s"plan:\n$p")
    assert(
      "BroadcastHashJoin".r.findAllIn(p).size >= 2 && !p.contains("SortMergeJoin"),
      s"log keys not broadcast:\n$p")
    // exactly three hash exchanges, none over the base: two O(log-keys)
    // distinct aggregates feeding the broadcasts, one resolution window
    // over sliver+logs — an exchange of the base itself would be a fourth
    assert(
      "Exchange hashpartitioning".r.findAllIn(p).size === 3,
      s"unexpected exchange count (base shuffling?), plan:\n$p")
  }

  test("split-path view equals full resolve on randomized batch histories") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val t = fresh(s"rand$trial")
      // model: sequential LWW fold, None = tombstone
      var model = Map.empty[(String, String), Option[String]]
      (0 until 4).foreach { _ =>
        val batch = (0 until 8).map { _ =>
          (s"r${rnd.nextInt(5)}", s"q${rnd.nextInt(3)}", Option.when(rnd.nextInt(4) > 0)(rnd.nextInt(100).toString))
        }.distinctBy(c => (c._1, c._2))
        // deterministic intra-batch contract: unique cells per batch (above)
        batch.foreach { case (rk, q, v) => model = model.updated((rk, q), v) }
        t.putLog(
          batch.map { case (rk, q, v) => (rk, "cf", q, v.orNull) }
            .toDF("row_key", "family", "qualifier", "value"))
        if (rnd.nextInt(3) == 0) t.compact() // interleave compactions
      }
      val expect = model.collect { case ((rk, q), Some(v)) => (rk, q, v) }.toSet
      val got = t.readView().collect().map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
      assert(got === expect, s"trial $trial")
    }
  }

  test("compaction crash windows: a next-gen base without the state commit is " +
    "invisible; after the commit, lingering folded logs are ignored by mark") {
    val t = fresh("crash")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r2", "cf", "a", "2")))
    t.putLog(cells(("r1", "cf", "a", "10")))
    val before = t.readView().orderBy("row_key", "qualifier").collect().toSeq
    // window 1 — crash between the base write and the state commit: the
    // half-written next generation must be invisible
    cells(("zz", "cf", "a", "999")).withColumn("bogus", lit(1))
      .write.mode("overwrite").parquet(s"${t.baseDir}/../base-g000000001")
    assert(t.readView().orderBy("row_key", "qualifier").collect().toSeq === before)
    // recovery: the real compact overwrites the orphan and commits
    t.compact()
    assert(t.readView().orderBy("row_key", "qualifier").collect().toSeq === before)
    assert(t.readView().filter(col("row_key") === "zz").count() === 0L)
    // window 2 — crash between the state commit and the log GC: a folded
    // log dir reappears below the mark and must be ignored, and a replayed
    // epoch at or below the mark must not re-append
    cells(("r1", "cf", "a", "1")).withColumn("seq", lit(1L))
      .write.mode("overwrite").parquet(s"${t.logDir}/seq=1")
    assert(t.readView().orderBy("row_key", "qualifier").collect().toSeq === before)
    t.putLogEpoch(cells(("r1", "cf", "a", "stale")), epoch = 0L) // seq 1 <= mark
    assert(t.readView().orderBy("row_key", "qualifier").collect().toSeq === before)
    // and the next compact sweeps the lingering folded dir
    t.putLog(cells(("r4", "cf", "a", "4")))
    t.compact()
    assert(
      Option(new java.io.File(t.logDir).listFiles()).map(_.toSeq).getOrElse(Seq.empty).isEmpty)
    assert(t.readView().count() === before.size + 1L)
  }

  test("view equals WideColumnTable.put semantics for the same batch sequence") {
    // same batches through the rewrite-based facade and the log-structured
    // one: identical final state (two implementations, one contract)
    val wh = Files.createTempDirectory("graft-lsm-eq").toString
    val w = new WideColumnTable(spark, wh, "a"); w.create(Seq("cf"))
    val l = new LogStructuredTable(spark, wh, "b"); l.create()
    val b1 = cells(("r1", "cf", "x", "1"), ("r2", "cf", "x", "2"))
    val b2 = cells(("r1", "cf", "x", "5"), ("r3", "cf", "y", "7"))
    w.put(b1); w.put(b2)
    l.putLog(b1); l.putLog(b2)
    val fromW = w.scan("r", "s").select("row_key", "family", "qualifier", "value")
      .orderBy("row_key", "qualifier").collect().toSeq
    val fromL = l.readView().orderBy("row_key", "qualifier").collect().toSeq
    assert(fromL === fromW)
  }
}

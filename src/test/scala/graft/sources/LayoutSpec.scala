package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits: known points land in Morton order") {
    // On a 2-bit grid (bounds chosen so norm16 maps 0..3 -> quadrant corners)
    // the Morton curve visits (x,y) quadrants in Z shape: (0,0) < (1,0) <
    // (0,1) < (1,1) at every scale. Check the driver formula against a
    // hand-computed interleave for exact 16-bit lattice points.
    def interleave(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L))
    val got = pts
      .toDF("x", "y")
      // bounds 0..65535 with 65536 cells: norm16 is the identity on the lattice
      .select(Layout.zValue2(col("x"), 0d, 65535d, col("y"), 0d, 65535d).as("z"))
      .as[Long]
      .collect()
    val want = pts.map { case (x, y) =>
      // norm16 maps v -> min(65535, floor(v / 65535 * 65536)) on these bounds
      def n(v: Long) = math.min(65535L, math.floor(v.toDouble / 65535d * 65536d).toLong)
      interleave(n(x), n(y))
    }
    assert(got.toSeq === want)
  }

  test("zorderWrite clusters BOTH dimensions; a linear sort clusters only one") {
    val n = 8192
    // deterministic pseudo-uniform 2-D points, x and y independent
    val pts = (0 until n)
      .map { i =>
        val x = (i.toLong * 2654435761L) % 10000L
        val y = (i.toLong * 40503L + 7L) % 10000L
        (x, y)
      }
      .toDF("x", "y")

    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.zorderWrite(pts, "x", "y", s"$base/z", nFiles = 16)
    pts
      .repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
      .write
      .parquet(s"$base/linear")

    // per-file extent of each dimension as a fraction of the global range —
    // the proxy for parquet footer min/max pruning power on that dimension
    def extents(dir: String): Seq[(Double, Double)] =
      new java.io.File(dir)
        .listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("x"), max("x"), min("y"), max("y"))
            .head()
          ((r.getLong(1) - r.getLong(0)) / 10000d, (r.getLong(3) - r.getLong(2)) / 10000d)
        }
    val zExt = extents(s"$base/z")
    val linExt = extents(s"$base/linear")
    assert(zExt.size === 16)

    // x-sorted layout: x clusters tightly, y spans ~everything in every file
    assert(linExt.map(_._1).max < 0.2, s"linear x extents: $linExt")
    assert(linExt.map(_._2).min > 0.9, s"linear y extents: $linExt")

    // z-order: BOTH dimensions cluster — 16 z-ranges on uniform 2-D data is
    // a ~4x4 grid, so each file spans ~1/4 of each axis (0.5 with slack for
    // partition-boundary straddle)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    assert(avg(zExt.map(_._1)) < 0.5, s"z-order x extents: $zExt")
    assert(avg(zExt.map(_._2)) < 0.5, s"z-order y extents: $zExt")

    // and the rewrite is lossless
    val back = spark.read.parquet(s"$base/z").as[(Long, Long)].collect().toSet
    assert(back === pts.as[(Long, Long)].collect().toSet)
  }

  test("hive-partitioned write: a partition-key predicate prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString + "/docs"
    (0 until 100)
      .map(i => (i.toLong, s"text $i", if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"))
      .toDF("doc_id", "text", "source")
      .write
      .partitionBy("source")
      .parquet(dir)

    val q = spark.read.parquet(dir).filter(col("source") === "books").select("doc_id")
    val p = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory pruning — zero I/O
    // for other sources), not in PushedFilters (row-group filtering)
    assert(p.contains("PartitionFilters: [isnotnull(source"), s"plan:\n$p")
    assert(p.contains("(source"), s"partition predicate missing:\n$p")
    assert(q.count() === 33)
    // the executed scan actually skipped the other partitions' files
    val scanned = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDDs().flatMap(_.partitions).collect {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString).toSeq
        }.flatten
    }.getOrElse(Seq.empty)
    assert(scanned.nonEmpty && scanned.forall(_.contains("source=books")),
      scanned.mkString(", "))
  }
}

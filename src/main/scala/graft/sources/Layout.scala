package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning.
  *
  * A table sorted on one column prunes scans on that column only: every file
  * spans the full range of every OTHER column, so a predicate on a second
  * dimension reads the whole table. Z-ordering (Morton curve) interleaves
  * the bits of several columns into one sort key, so each file covers a
  * small hyper-rectangle of the combined space — parquet min/max footer
  * stats then prune scans on ANY of the interleaved columns. This is the
  * layout step a 100 TB corpus runs once at ingest so that every later
  * point/range query (by date AND by meter, by source AND by length) skips
  * most row groups.
  *
  * The z-value is pure bitwise Column arithmetic (shifts + masks): it
  * whole-stage-codegens, nothing leaves the row, and the only non-local
  * steps of [[zorderWrite]] are one 4-scalar bounds aggregate and the one
  * range-repartition any re-layout pays anyway.
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at bit 2i — the classic
    * Morton magic-number sequence, as Column ops so it codegens inline. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Min/max-normalize a numeric column to a 16-bit integer grid. Values at
    * the max clamp to 65535 (the top cell is closed, all others half-open). */
  private def norm16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else
      least(
        lit(65535L),
        greatest(
          lit(0L),
          floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65536d)).cast("long")))

  /** 32-bit 2-D Morton value of two numeric columns normalized to the given
    * bounds: x occupies even bits, y odd bits. */
  def zValue2(
      x: Column,
      xMin: Double,
      xMax: Double,
      y: Column,
      yMin: Double,
      yMax: Double): Column =
    spread16(norm16(x, xMin, xMax))
      .bitwiseOR(shiftleft(spread16(norm16(y, yMin, yMax)), 1))

  /** Rewrite `df` as parquet at `path`, clustered on the Morton order of
    * (xCol, yCol) into `nFiles` range partitions. Bounds are taken from the
    * data with ONE aggregate (4 scalars to the driver — bounded at any
    * scale); the z column is dropped before the write so the layout is an
    * implementation detail, visible only through footer min/max stats. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String, nFiles: Int): Unit = {
    val b = df
      .agg(
        min(col(xCol)).cast("double"),
        max(col(xCol)).cast("double"),
        min(col(yCol)).cast("double"),
        max(col(yCol)).cast("double"))
      .head()
    val z = zValue2(
      col(xCol), b.getDouble(0), b.getDouble(1),
      col(yCol), b.getDouble(2), b.getDouble(3))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write
      .mode("overwrite")
      .parquet(path)
  }
}

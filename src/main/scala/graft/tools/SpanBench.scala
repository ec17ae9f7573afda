package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for [[Dedup.duplicatedSpanStats]]: replicate the sf0.1
  * documents corpus K× (ids offset per copy, so every replica is a full
  * cross-doc duplicate set — the WORST case for this operator: every
  * window of every doc is duplicated K−1 times elsewhere) and time the
  * full stats pass.
  *
  * What linear-ish growth here proves: the operator's per-hash aggregate
  * and the dup-set join both stay keyed — there is no per-pair stage to go
  * quadratic in the number of copies, unlike signature near-dup where clone
  * groups densify candidate buckets (the measured simhash 221 s blowup at
  * 20×). The duplicated-window SET grows with the corpus, not with
  * copies², because windows collapse to distinct hashes before anything
  * joins.
  *
  * Recorded (local[32], sf0.1 docs = 5k, one fresh JVM per run): 1× 6.9 s
  * (cold JVM — warmup dominates), 5× 5.7 s (25k docs), 20× 6.4 s (100k
  * docs, every window cross-doc duplicated) — 4× more data from 5× to 20×
  * costs +12% wall: the pass is scan-and-shuffle-bound on fixed-width
  * hashes and 32 cores absorb it. Usage:
  * `sbt "runMain graft.tools.SpanBench [copies]"`.
  */
object SpanBench {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val base = docs.count()
    val corpus = docs
      .withColumn("copy", explode(array((0 until copies).map(lit): _*)))
      .select((col("doc_id") + col("copy").cast("long") * 10000000L).as("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val out = Dedup.duplicatedSpanStats(corpus, 8)
    out.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    val dup = out.filter(col("n_dup") > 0).count()
    println(f"[spanbench] copies=$copies docs=${base * copies} wall=$secs%.1f s docs_with_dups=$dup")
    spark.stop()
  }
}

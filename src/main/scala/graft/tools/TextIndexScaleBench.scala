package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.{TextIndex, TextSearchIndex}

/** Scale probe for the persisted text index (round 8): the family's
  * 100 TB claim is not that a BM25 query is O(1) — common-term posting
  * slices grow with the corpus — but that a query READS ONLY ITS TERMS'
  * POSTING SLICES while the in-memory operator re-tokenizes the corpus
  * (three uncached passes, documented on [[TextIndex.bm25TopK]]). The
  * probe replicates sf0.1 documents N× and reports, per path:
  * wall-clock and FILE-SCAN ROWS (the executed plan's leaf scan
  * `numOutputRows` — task-level input-bytes underreport local vectorized
  * reads) — the evidence that the persisted search's scan volume is the
  * posting slices' (term-df-bound) and the gap vs the in-memory path
  * widens with corpus size. Also measured: phrase search from the
  * positional column, the multi-query batch form (shared df pass),
  * rare-term queries (slice-bound: tiny scans at any corpus size), and
  * search under a 10% tombstone load (anti-join after term pruning).
  *
  * This probe CAUGHT a real layout bug: hash `repartition(tok)` scatters
  * the term space so every file's [min,max] covers everything and the
  * pushed `tok IN` pruned nothing (full postings scanned); with
  * AQE-coalesced range partitioning the buckets were still too wide.
  * Explicit-count `repartitionByRange(TermBuckets, tok)` dropped the
  * common-term search scan from 100% of the postings to ~7.5% at 1×.
  *
  * Usage: `sbt "runMain graft.tools.TextIndexScaleBench [rep]"`
  * (default 10). Measured 2026-08-15 (rep=50 → 250k docs): see SURVEY
  * §14.
  */
object TextIndexScaleBench {

  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    val bytesRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { bytesRead.addAndGet(m.inputMetrics.bytesRead); () }
      }
    })
    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%.1f MB"
    def probe[A](what: String)(f: => A): Unit = {
      bytesRead.set(0)
      val t0 = System.nanoTime()
      f
      Thread.sleep(500) // listener bus drains asynchronously
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $what: $s%.2f s, read=${mb(bytesRead.get)}")
    }

    // leaf-scan output rows from the EXECUTED plan (AQE unwrapped) - the
    // reliable "how much did this query actually scan" evidence (the
    // task-level input-bytes metric underreports local vectorized reads)
    def leafScans(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leafScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => leafScans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => leafScans(r.child)
      case leaf if leaf.children.isEmpty => Seq(leaf)
      case other => other.children.flatMap(leafScans)
    }
    def probeScan(what: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val frame = df
      val qe = frame.queryExecution
      frame.collect()
      val s = (System.nanoTime() - t0) / 1e9
      val scanned = leafScans(qe.executedPlan)
        .filter(_.nodeName.toLowerCase.contains("scan"))
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .sum
      println(f"  $what: $s%.2f s, file-scan rows=$scanned%,d")
    }

    def replicated(r: Int): DataFrame = {
      val base = spark.read.parquet(s"$dir/documents.parquet")
      base.crossJoin(spark.range(r).toDF("rep"))
        .select(
          (col("doc_id") * r + col("rep")).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
    }
    val terms = Seq("filter", "stream", "vector")

    for (r <- Seq(1, rep)) {
      // materialize the replicated corpus as parquet so BOTH paths scan
      // files (the in-memory path's cost must include its real I/O)
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"graft-textscale-corpus$r").toString
      replicated(r).write.mode("overwrite").parquet(corpusDir)
      val corpus = spark.read.parquet(corpusDir)
      val n = corpus.count()
      println(s"== corpus ${r}x = $n docs ==")

      val idx = java.nio.file.Files.createTempDirectory(s"graft-textscale-idx$r").toString
      probeScan("control: full corpus text scan")(
        corpus.agg(sum(length(col("text")))))
      probe(s"index build (once, O(corpus))")(TextSearchIndex.build(corpus, idx))
      probeScan("in-memory bm25TopK (re-tokenizes corpus per query)")(
        TextIndex.bm25TopK(corpus, terms, 10))
      probeScan("persisted search (posting slices only)")(
        TextSearchIndex.search(spark, idx, terms, 10))
      probeScan("persisted phrase search (positional slices)")(
        TextSearchIndex.phraseSearch(spark, idx, "vector table"))
      probeScan("multi-query batch of 8 (one shared pass)")(
        TextSearchIndex.searchTerms(
          spark, idx,
          (0L until 8L).map(q => (q, terms)).toDF("q_id", "toks"), 10))
      // rare terms: slice size is df-bound, so the scan stays tiny no
      // matter the corpus — the contrast with the common-term probes
      // above (and the in-memory path, which pays the corpus either way)
      val rare = corpus
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").asc, col("tok")).limit(3)
        .collect().map(_.getString(0)).toSeq
      probeScan(s"persisted search, 3 RAREST terms $rare")(
        TextSearchIndex.search(spark, idx, rare, 10))
      probeScan("in-memory bm25TopK, same rare terms")(
        TextIndex.bm25TopK(corpus, rare, 10))
      // 10% tombstones: the anti-join applies AFTER term pruning
      TextSearchIndex.delete(corpus.select("doc_id").filter(col("doc_id") % 10 === 4), idx)
      probeScan("persisted search under 10% tombstones")(
        TextSearchIndex.search(spark, idx, terms, 10))
    }
    println("== done ==")
    spark.stop()
  }
}

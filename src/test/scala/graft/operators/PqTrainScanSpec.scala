package graft.operators

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins pqTrain's scan economy: ONE seed collect plus ONE corpus aggregate
  * per Lloyd iteration, for ALL m subspaces together. The pre-round-6 form
  * trained each subspace separately — m·(iters+1) ≈ 24 corpus-scan jobs at
  * the default m=8/iters=2 — an 8× index-build cost multiplier at corpus
  * scale. Counting Spark jobs (rather than parsing a plan) is the right
  * guard here because training is an imperative collect loop: the
  * regression shape is "more jobs", not "a worse plan". */
class PqTrainScanSpec extends SparkSpec {
  test("pqTrain is single-pass: seed job + one aggregate per Lloyd iteration, all m subspaces") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.count() // warm file listing so counted jobs are training-only
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val books = SimilaritySearch.pqTrain(emb, 8, 64, 16, 2)
      assert(books.size === 8)
      // Lloyd drops cells that lose all members, so ≤ nlist entries —
      // but re-indexed 0..n-1, contiguous.
      assert(books.forall(b => b.nonEmpty && b.length <= 16 && b.map(_._1).toSeq == (0 until b.length)))
      Thread.sleep(1000) // listener bus is async; let JobStart events drain
      // Budget: seed limit-collect may run 1–2 jobs, and AQE materializes
      // each shuffle stage as its own job (≤2 per iteration aggregate) —
      // so the single-pass form stays ≤ 2 + 2·iters = 6; the old
      // per-subspace loop ran ~24+. 10 keeps slack without losing the
      // regression signal.
      assert(jobs <= 10, s"pqTrain ran $jobs jobs — per-subspace corpus rescan regression")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

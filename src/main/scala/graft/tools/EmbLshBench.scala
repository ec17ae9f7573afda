package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B bench for embedding near-dup at scale: exact all-pairs cosine
  * ([[Dedup.embeddingCosinePairs]], the quadratic correctness baseline) vs
  * banded SRP-LSH ([[Dedup.embeddingCosinePairsLsh]], the 100 TB path).
  *
  * Corpus: N synthetic clustered vectors (N/4 cluster centers in dim 64,
  * four small-noise members each — the near-dup structure the operator
  * exists for), generated deterministically on the executors from the row
  * id, so the corpus never sits on the driver. Both variants run with the
  * same 0.9 threshold; the LSH pair count over the exact pair count is the
  * measured recall. LSH band width follows the sizing rule from the
  * operator's Scaladoc (r ≈ log₂(N/16)); the first run of this bench with
  * the small-corpus default r=4 measured the failure mode that rule
  * prevents — 16 buckets/band of ~N/16 vectors each, 10× slower than the
  * exact cartesian.
  *
  * Recorded (local[32]): n=32k exact 4.3 s / LSH(r=11) 24.8 s; n=100k
  * exact 34.5 s / LSH(r=13) 74.5 s, recall 1.0 both — exact ∝N², LSH
  * ~linear, crossover ≈ 2–3·10⁵ vectors on this box. These runs also
  * caught (and motivated) two operator fixes: the capBuckets-window cap
  * costing 10+ s per evaluation over B·2^r tiny groups, and the candidate
  * self-join re-evaluating the whole generation subtree once per side.
  *
  * Usage: `sbt "runMain graft.tools.EmbLshBench [n]"` (default 8000).
  */
object EmbLshBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8000)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Deterministic clustered vectors: member vec = center(cluster) + noise,
    // both seeded from ids via xxhash64 — pure executor-side generation.
    def unit(seedCol: org.apache.spark.sql.Column, i: Int) =
      (pmod(xxhash64(seedCol, lit(i)), lit(2000000L)).cast("double") / 1000000.0) - 1.0
    val vecs = spark
      .range(n.toLong)
      .select(
        col("id").as("vec_id"),
        (col("id") / 4).cast("long").as("cluster"))
      .select(
        col("vec_id"),
        array((0 until 64).map(i =>
          (unit(col("cluster"), i) + unit(col("vec_id"), i + 1000) * 0.05).cast("float")): _*)
          .as("embedding"))
      .localCheckpoint() // time the operators, not the generator

    def time(label: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   pairs=$c")
      c
    }
    // r ≈ log2(n/16): ~16 expected vectors per (band, bucket)
    val r = math.max(4, (math.log(n / 16.0) / math.log(2)).ceil.toInt)

    // warmup both code paths once at small n
    Dedup.embeddingCosinePairs(vecs.limit(500), 0.9).count()
    Dedup.embeddingCosinePairsLsh(vecs.limit(500), 0.9, planesPerBand = r).count()

    if (sys.env.contains("EMBLSH_STAGES")) {
      import graft.functions.VectorFunctions._
      val v2 = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val bandCols = (0 until 8).map { b =>
        val planes = randomPlanes(r, 64, seed = 42L + b)
        struct(lit(b).as("band"), srpBucket(col("v"), planes).as("bucket"))
      }
      val tagged = v2
        .select(col("vec_id"), explode(array(bandCols: _*)).as("bb"))
        .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      time("stage: signatures+explode", tagged)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))
      val capped = tagged.withColumn("_bn", count(lit(1)).over(w)).filter(col("_bn") <= 5000).drop("_bn")
      time("stage: + cap window", capped)
      val cand = capped.select(col("vec_id").as("a_id"), col("band"), col("bucket"))
        .join(capped.select(col("vec_id").as("b_id"), col("band"), col("bucket")), Seq("band", "bucket"))
        .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
      time("stage: + candidates", cand)
    }

    val exact = time(s"exact all-pairs (n=$n)", Dedup.embeddingCosinePairs(vecs, 0.9))
    val lsh = time(
      s"banded SRP-LSH (n=$n, r=$r)",
      Dedup.embeddingCosinePairsLsh(vecs, 0.9, planesPerBand = r))
    println(f"recall = ${lsh.toDouble / exact}%.3f")
    spark.stop()
  }
}

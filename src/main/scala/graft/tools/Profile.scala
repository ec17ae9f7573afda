package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.{Dedup, SimilaritySearch}
import graft.sources.Tables

/** Micro-profiler for the expression kernels and dedup/similarity operators.
  * Forces evaluation of computed columns with an aggregate over the result
  * (a bare `count()` would let Catalyst prune the computation away and time
  * nothing — this exact mistake motivated the tool).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Profile"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }

    val docs = Tables.documents(spark, dir)
    time("tokens (forced)")(
      docs.select(size(T.tokens(col("text"))).as("n")).agg(sum("n")).collect().head)
    time("hash shingles (forced)")(
      docs.select(size(T.shingleHashes(T.tokens(col("text")))).as("n")).agg(sum("n")).collect().head)
    time("minhash sig (forced)")(
      docs
        .select(size(T.minhashSignature(T.shingleHashes(T.tokens(col("text"))))).as("n"))
        .agg(sum("n"))
        .collect()
        .head)
    time("minhashLshPairs")(Dedup.minhashLshPairs(docs, 0.5).count())
    time("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, 0.3).count())
    time("simhashPairs")(Dedup.simhashPairs(docs, 3).count())
    time("exact")(Dedup.exact(docs).count())
    val emb = Tables.embeddings(spark, dir)
    time("embeddingCosinePairs")(Dedup.embeddingCosinePairs(emb, 0.4).count())
    time("bruteForceTopK")(
      SimilaritySearch.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, 10).count())
    time("lshTopK")(SimilaritySearch.lshTopK(emb.filter(col("vec_id") < 8), emb, 10).count())
    spark.stop()
  }
}

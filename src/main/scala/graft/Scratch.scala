package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.functions.{TextFunctions => T}
    import graft.sources.Tables

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }

    val docs = Tables.documents(spark, dir)
    // force column evaluation with an agg over the computed value
    time("tokens (forced)")(
      docs.select(size(T.tokens(col("text"))).as("n")).agg(sum("n")).collect().head)
    time("str shingles (forced)")(
      docs.select(size(T.shingles(T.tokens(col("text")))).as("n")).agg(sum("n")).collect().head)
    time("hash shingles (forced)")(
      docs.select(size(T.shingleHashes(T.tokens(col("text")))).as("n")).agg(sum("n")).collect().head)
    time("minhash sig (forced)")(
      docs.select(size(T.minhashSignature(T.shingleHashes(T.tokens(col("text"))))).as("n"))
        .agg(sum("n")).collect().head)
    time("full minhashLsh")(graft.operators.Dedup.minhashLshPairs(docs, 0.5).count())
    time("ngramJaccard")(graft.operators.Dedup.ngramJaccardPairs(docs, 0.3).count())
    time("simhashPairs")(graft.operators.Dedup.simhashPairs(docs, 3).count())
    time("exact")(graft.operators.Dedup.exact(docs).count())
    val emb = Tables.embeddings(spark, dir)
    time("embCosinePairs")(graft.operators.Dedup.embeddingCosinePairs(emb, 0.4).count())
    time("annBrute")(graft.operators.SimilaritySearch
      .bruteForceTopK(emb.filter(col("vec_id") < 8), emb, 10).count())
    time("annLsh")(graft.operators.SimilaritySearch
      .lshTopK(emb.filter(col("vec_id") < 8), emb, 10).count())
    spark.stop()
  }
}

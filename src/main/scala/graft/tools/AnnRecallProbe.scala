package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Recall@10 measurement for the approximate ANN paths against the exact
  * brute-force baseline, on both verify scale factors' query sets — the
  * numbers that pin the regression floors in SimilarityAndMultimodalSpec
  * and the q_ann_*_recall gates.
  *
  * Usage: `sbt "runMain graft.tools.AnnRecallProbe"`.
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((dir, qmax) <- Seq(("/root/testdata/sf0.001", 20), ("/root/testdata/sf0.01", 8))) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < qmax)
      def rs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = rs(SimilaritySearch.bruteForceTopK(queries, emb, 10))
      val ivf = rs(SimilaritySearch.ivfTopK(queries, emb, 10, nlist = 8, nprobe = 2))
      println(f"$dir q<$qmax: ivf=${ivf.intersect(exact).size.toDouble / exact.size}%.3f")
      for ((nl, rr) <- Seq((16, 50), (16, 100), (32, 100))) {
        val pq = rs(SimilaritySearch.pqTopK(queries, emb, 10, nlist = nl, rerank = rr))
        println(f"  pq(m=8,nlist=$nl,rerank=$rr): recall=${pq.intersect(exact).size.toDouble / exact.size}%.3f")
      }
      // fixed ~0.31 bucket-fraction budget across plane counts
      for ((planes, t) <- Seq((4, 5), (4, 7), (5, 10), (6, 20), (3, 4))) {
        val lsh = rs(SimilaritySearch.lshTopK(queries, emb, 10, numPlanes = planes, probes = t))
        println(f"  planes=$planes probes=$t (${t.toDouble / (1 << planes)}%.2f of buckets): " +
          f"recall=${lsh.intersect(exact).size.toDouble / exact.size}%.3f")
      }
      // post-filter strategy recall vs the exact PRE-filter path, loose
      // predicate (label <> 3 keeps ~88%) — the q_ann_filtered_gate config
      val pred = col("label") =!= 3
      val fExact = rs(SimilaritySearch.filteredTopK(queries, emb, pred, 10))
      for (inflate <- Seq(2, 4, 8)) {
        val fPost = rs(SimilaritySearch.filteredTopKPost(queries, emb, pred, 10, inflate))
        println(f"  filtered post(inflate=$inflate): " +
          f"recall=${fPost.intersect(fExact).size.toDouble / fExact.size}%.3f " +
          f"fill=${fPost.size}/${fExact.size}")
      }
    }
    spark.stop()
  }
}

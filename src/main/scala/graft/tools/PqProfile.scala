package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._



/** Stage breakdown for pqTopK at a given SF: training vs encode vs the
  * ADC+rerank query, to attribute the query's wall time (at test SFs the
  * corpus is small, so Catalyst planning/codegen of the literal-heavy
  * codebook expressions can dominate over actual scan work). */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round --")
      val books = t("train")(SimilaritySearch.pqTrain(e, 8, 64, 16, 2))
      t("encode")(SimilaritySearch.pqEncode(e, books, 64).write.format("noop").mode("overwrite").save())
      t("full pqTopK")(
        SimilaritySearch.pqTopK(e.filter(col("vec_id") < 8), e, 10)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

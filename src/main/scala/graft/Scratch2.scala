package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{TextFunctions => T}
    import graft.sources.Tables
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sh = docs.select(col("doc_id"), md5(substring(T.normalize(col("text")),1,40)).as("bk"),
      T.shingles(T.tokens(col("text"))).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("bk"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("b_id"), col("bk"), col("sh").as("sb"))
    val joined = a.join(b, Seq("bk")).filter(col("a_id") < col("b_id"))
    time("ngram: join only")(joined.select("a_id","b_id").count())
    time("ngram: +intersect")(joined.withColumn("ni", size(array_intersect(col("sa"),col("sb")))).select("a_id","ni").count())
    val full = joined.withColumn("ni", size(array_intersect(col("sa"),col("sb"))))
      .withColumn("nu", size(array_union(col("sa"),col("sb"))))
      .withColumn("jac", when(col("nu")>0, col("ni").cast("double")/col("nu")))
      .filter(col("jac") >= 0.3)
    time("ngram: full")(full.count())
    // persist variant
    val shP = sh.persist()
    val aP = shP.select(col("doc_id").as("a_id"), col("bk"), col("sh").as("sa"))
    val bP = shP.select(col("doc_id").as("b_id"), col("bk"), col("sh").as("sb"))
    val fullP = aP.join(bP, Seq("bk")).filter(col("a_id") < col("b_id"))
      .withColumn("ni", size(array_intersect(col("sa"),col("sb"))))
      .withColumn("nu", size(array_union(col("sa"),col("sb"))))
      .withColumn("jac", when(col("nu")>0, col("ni").cast("double")/col("nu")))
      .filter(col("jac") >= 0.3)
    time("ngram: persisted")(fullP.count())
    time("ngram: persisted 2nd")(fullP.count())
    full.explain("formatted")
    spark.stop()
  }
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

import graft.SparkSpec

/** The graft_* SQL surface must be the same implementation as the DSL
  * wrappers — these tests cross-check SQL-text results against the DSL
  * column builders on identical data. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def registered(): Unit = GraftFunctions.register(spark)

  test("graft_tokens / graft_ngram_hashes via SQL match the DSL kernels") {
    registered()
    Seq((1L, "a b c d"), (2L, "  "), (3L, "x y"))
      .toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val sql = spark
      .sql("""SELECT id, size(graft_tokens(text)) AS nt,
             |       size(graft_ngram_hashes(graft_tokens(text), 3)) AS ns
             |FROM ext_docs""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSet
    assert(sql === Set((1L, 4, 2), (2L, 0, 0), (3L, 2, 0)))
  }

  test("graft_dot via SQL equals the DSL dot on the same vectors") {
    registered()
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql("SELECT graft_dot(a, b) AS d FROM ext_vecs").head().getDouble(0)
    val viaDsl = spark
      .table("ext_vecs")
      .select(VectorFunctions.dot(col("a"), col("b")))
      .head()
      .getDouble(0)
    assert(viaSql === 32.0 && viaDsl === 32.0)
  }

  test("graft_minhash / graft_simhash via SQL match the DSL signatures") {
    registered()
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("ext_sig")
    val viaSql = spark
      .sql("""SELECT graft_minhash(graft_ngram_hashes(graft_tokens(text), 3), 16) AS mh,
             |       graft_simhash(graft_tokens(text)) AS sh
             |FROM ext_sig""".stripMargin)
      .head()
    val viaDsl = spark
      .table("ext_sig")
      .select(
        TextFunctions.minhashSignature(TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3), 16),
        TextFunctions.simhash(TextFunctions.tokens(col("text"))))
      .head()
    assert(viaSql.getSeq[Long](0) === viaDsl.getSeq[Long](0))
    assert(viaSql.getLong(1) === viaDsl.getLong(1))
  }

  test("non-literal perm count and wrong arity are analysis-time errors") {
    registered()
    Seq((1L, "a b c d")).toDF("id", "text").createOrReplaceTempView("ext_err")
    intercept[Exception] {
      spark.sql("SELECT graft_ngram_hashes(graft_tokens(text), id) FROM ext_err").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_dot(id) FROM ext_err").collect()
    }
  }

  test("GraftExtensions installs into a SparkSessionExtensions instance") {
    new graft.GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }
}

package graft

/** Interpreted ↔ codegen parity for the native kernels: every custom
  * Expression ships two evaluation paths (`nullSafeEval` and `doGenCode`),
  * and the interpreted one is not a dead branch — it runs under
  * `spark.sql.codegen.factoryMode=NO_CODEGEN`, on codegen compile
  * fallback, and during plan-time constant folding. A divergence between
  * the two is a silent wrong-results bug the partitioning sweep
  * (DeterminismSpec) cannot see, so this sweep re-runs a query per kernel
  * family with code generation fully disabled and demands bit-identical
  * rows.
  */
class KernelParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // one query per native-kernel family (see org.apache.spark.sql.graft)
  private val probes = Seq(
    "q_ann_bruteforce", // DotProduct
    "q_ann_pq", // PqAssign + PqLuts + DotProduct
    "q_dedup_minhash", // MinHashSignature + NGramHashes
    "q_dedup_simhash", // SimHashSignature
    "q_dedup_ngram", // NGramHashes + SortedIntersectCount
    "q_token_count", // WhitespaceTokens
    "q_embed_quantize", // QuantizeInt8
    "q_quality_repetition", // mode-count kernel
    "q_heavy_hitters_gate", // MisraGries agg + CMS
    "q_approx_stats_gate", // sketch kernels
    "q_bloom_join" // BloomMightContain
  )

  test("native kernels: interpreted evaluation matches codegen bit-for-bit") {
    def canon(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
    def withNoCodegen[A](f: => A): A = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try f
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    val failures = probes.flatMap { name =>
      try {
        val ref = canon(name)
        val interp = withNoCodegen(canon(name))
        if (interp == ref) None
        else
          Some(s"$name: ${ref.size} vs ${interp.size} rows; first diff: " +
            ref.zipAll(interp, "<missing>", "<missing>")
              .find { case (x, y) => x != y }
              .getOrElse(("", "")))
      } catch {
        case e: Throwable => Some(s"$name: threw ${e.toString.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

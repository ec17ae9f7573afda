package graft

/** Partitioning-determinism sweep: every ORACLED query must produce
  * bit-identical rows whether the shuffle runs over 32 partitions or 5.
  *
  * This is strictly stronger than the DuckDB oracle gate (which runs at
  * one fixed layout): it catches accumulation-order dependence — double
  * sums, first()/any_value over ties, unstable samples — the class of bug
  * that surfaces only when a cluster's partitioning differs from the dev
  * box. The engine's numeric discipline (exact decimal/integer aggregates,
  * cast-once-then-fixed-IEEE trees) exists precisely to make this pass.
  *
  * Rows-only queries are excluded by construction (their outputs are
  * engine-specific estimates whose GATES are oracled and swept instead;
  * the gates assert the properties that ARE partitioning-stable).
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracled query is invariant to the shuffle partition count") {
    val oracled = SparkEntry.oracleSql.keySet
    def canon(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect().map(_.toString).sorted.toSeq
    }
    val failures = oracled.toSeq.sorted.flatMap { name =>
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val a = canon(name)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val b = canon(name)
        if (a == b) None
        else
          Some(
            s"$name: ${a.size} vs ${b.size} rows; first diff: " +
              a.zipAll(b, "<missing>", "<missing>")
                .find { case (x, y) => x != y }
                .getOrElse(("", "")))
      } catch {
        case e: Throwable => Some(s"$name: threw ${e.toString.linesIterator.next()}")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

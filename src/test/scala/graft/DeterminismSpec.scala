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

  test("every oracled query is invariant to shuffle partitioning and AQE replanning") {
    val oracled = SparkEntry.oracleSql.keySet
    def canon(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect().map(_.toString).sorted.toSeq
    }
    // (partitions, AQE): the reference layout, a coarser layout, and the
    // static planner — three genuinely different physical plans per query
    val configs = Seq(("32", "true"), ("5", "true"), ("32", "false"))
    def withConfig[A](c: (String, String))(f: => A): A = {
      spark.conf.set("spark.sql.shuffle.partitions", c._1)
      spark.conf.set("spark.sql.adaptive.enabled", c._2)
      try f
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    val failures = oracled.toSeq.sorted.flatMap { name =>
      try {
        val ref = withConfig(configs.head)(canon(name))
        configs.tail.flatMap { c =>
          val got = withConfig(c)(canon(name))
          if (got == ref) None
          else
            Some(
              s"$name@$c: ${ref.size} vs ${got.size} rows; first diff: " +
                ref.zipAll(got, "<missing>", "<missing>")
                  .find { case (x, y) => x != y }
                  .getOrElse(("", "")))
        }
      } catch {
        case e: Throwable => Some(s"$name: threw ${e.toString.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

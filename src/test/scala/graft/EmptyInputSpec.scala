package graft

/** Degenerate-input sweep: every registered query must plan and execute
  * against schema-identical EMPTY tables without throwing. At 100 TB the
  * empty case is not hypothetical — a partition-pruned read, a filter that
  * matches nothing, or a fresh ingest directory hands every operator a
  * zero-row input, and a division, `head()`, or seeded model that assumes
  * rows exist turns a no-op into a job failure. The fixture is a
  * schema-exact copy of the sf0.001 tables sliced to zero rows
  * (src/test/resources/emptydata, written by pyarrow so the raw parquet
  * types — TIMESTAMP(NANOS) included — match the real test data exactly).
  */
class EmptyInputSpec extends SparkSpec {

  private val dir = getClass.getResource("/emptydata").getPath

  test("every registered query executes on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).count()
        None
      } catch {
        case e: Throwable => Some(name -> e.toString.linesIterator.next())
      }
    }
    assert(failures.isEmpty, failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }
}

package graft

import org.apache.spark.sql.types._

/** Output-type sweep: no registered query may emit a hash-fragile type.
  *
  * The driver's correctness gate canonicalizes both engines' results
  * before hashing, and that canonicalization DIVERGES on DECIMAL columns
  * (DuckDB surfaces them as float64, Spark's parquet decimal128 as exact
  * Decimal objects) — round 4 shipped three queries whose values were
  * bit-identical yet hash-failed for exactly this reason. Decimal is
  * still the right type INSIDE a plan (order-insensitive exact sums);
  * the rule is only about the final projected schema: cast to
  * BIGINT/DOUBLE at the edge. This spec turns that prose rule into CI.
  */
class OutputSchemaSpec extends SparkSpec {

  private val dir = getClass.getResource("/emptydata").getPath

  private def fragile(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType => s.fields.exists(f => fragile(f.dataType))
    case a: ArrayType => fragile(a.elementType)
    case m: MapType => fragile(m.keyType) || fragile(m.valueType)
    case _ => false
  }

  test("no registered query has DecimalType anywhere in its output schema") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val schema = fn(spark, dir).schema
        val bad = schema.fields.filter(f => fragile(f.dataType))
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
      } catch {
        case e: Throwable => Some(s"$name: failed to resolve schema: ${e.toString.linesIterator.next()}")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}

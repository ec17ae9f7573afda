package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Session-extension entry point (`SparkSessionExtensions`, SURVEY.md §7.3):
  * deploy with `--conf spark.sql.extensions=graft.GraftExtensions` and every
  * SparkSession on the cluster resolves the graft_* SQL functions at analysis
  * time — the native codegen'd kernels behind the DataFrame DSL, exposed to
  * raw-SQL users. Zero-arg class by Spark's extensions contract. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.install(ext)
}

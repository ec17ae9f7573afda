// Lives under org.apache.spark.sql for the same reason as Signatures:
// expression-typing internals are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All d(d+1)/2 upper-triangle gram terms of one `array<float>` embedding,
  * quantized to 10⁻¹²-units (round-half-away-from-zero, matching both
  * Spark's `round` and DuckDB's), in ROW-MAJOR triangle order:
  * `pos(i,j) = i·d − i(i−1)/2 + (j − i)`.
  *
  * Replaces the slice + nested-posexplode spelling of the PCA gram: the
  * products run in one compiled loop per vector instead of 64 interpreted
  * array slices and two Generate stages — the same kernel rationale as
  * [[NGramHashes]] (measured 3× on the sf0.1 gram aggregate; the array
  * is generated once and exploded once). */
case class GramTerms(child: Expression)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_terms"

  def compute(arr: ArrayData): ArrayData = {
    val d = arr.numElements()
    val out = new Array[Long](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      val xi = arr.getFloat(i).toDouble
      var j = i
      while (j < d) {
        val v = xi * arr.getFloat(j).toDouble * 1e12
        out(idx) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

// Lives under org.apache.spark.sql (like DotProduct): ImplicitCastInputTypes
// is private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an embedding vector:
  * `q_i = ⌊v_i·127/max|v| + 0.5⌋` over `array<double>` (float arrays arrive
  * via the implicit element-wise cast), emitting `array<long>` in
  * [-127, 127]; an all-zero vector quantizes to zeros.
  *
  * Why a custom Expression (SURVEY.md §7.3): the HOF composition
  * (`array_max(transform(abs))` + two `transform` lambdas) evaluates
  * interpreted with per-element boxing — profiled as the dominant term of
  * the quantization query. This kernel is two tight primitive passes (max,
  * then scale) per row, and codegens as a single compiled-kernel call (the
  * Signatures pattern), so the enclosing whole-stage span stays fused.
  *
  * Numeric contract: `floor(x + 0.5)` rather than `round()` (engines
  * disagree on round-half-to-even vs half-away for doubles; floor is exact),
  * and the `x·127/mx` chain is left-associated IEEE arithmetic —
  * bit-identical to the HOF form it replaces and to the DuckDB oracle's
  * `list_transform(v, x -> floor(x * 127.0 / mx + 0.5))`.
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with KernelCodegen {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_quantize_int8"

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val v = new Array[Double](m)
    var mx = 0.0
    var i = 0
    while (i < m) {
      v(i) = arr.getDouble(i)
      val a = math.abs(v(i))
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Long](m)
    if (mx > 0) {
      i = 0
      while (i < m) {
        out(i) = math.floor(v(i) * 127.0 / mx + 0.5).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

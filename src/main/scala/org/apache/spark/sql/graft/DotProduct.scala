// Lives under org.apache.spark.sql (like Bridge) because the expression-typing
// APIs it extends (AbstractDataType, ImplicitCastInputTypes inputs) are
// private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<double>` columns (float
  * arrays arrive via an implicit element-wise cast, preserving the
  * float→double-then-multiply semantics of the composed
  * `aggregate(zip_with(...))` form and of DuckDB's
  * `list_inner_product(CAST(v AS DOUBLE[]), …)`).
  *
  * Why a custom Expression (SURVEY.md §7.3): Spark's higher-order functions
  * (`zip_with`, `aggregate`) are CodegenFallback — evaluated interpreted, with
  * per-element boxing — which profiling showed dominating the pairwise
  * similarity operators (~2M pairs × 64 dims at sf0.1). This expression
  * generates a tight primitive loop inside whole-stage codegen, and is also
  * codegen-safe inside join conditions (where Catalyst pushes similarity
  * thresholds).
  *
  * Accumulation is a strict left-to-right double fold — bit-identical to the
  * HOF composition it replaces, so DuckDB oracle parity is preserved.
  *
  * Null contract: NULL if either array is NULL; null *elements* are not
  * expected (embedding vectors) and read as 0-bit garbage per ArrayData
  * semantics — callers guarantee dense arrays.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

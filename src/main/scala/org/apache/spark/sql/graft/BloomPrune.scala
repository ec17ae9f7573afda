// Lives under org.apache.spark.sql for the same reason as Signatures: the
// expression-typing internals are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` over a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] carried as a binary literal —
  * the manual spelling of Spark's runtime row-level filter
  * (`spark.sql.optimizer.runtime.bloomFilter.*` injects the same shape, but
  * only under AQE's own cost heuristics; this expression lets an operator
  * GUARANTEE the semi-join reduction). The filter deserializes once per
  * executor (lazy transient), not per row; false positives only let extra
  * rows through to the exact join that follows, so composed results are
  * value-identical to the unpruned join.
  *
  * Codegens as one compiled probe call (the Signatures `KernelCodegen`
  * pattern) so the scan→filter stage it guards stays inside whole-stage
  * codegen — this filter exists precisely to sit on the fact-side hot path
  * ahead of a shuffle, where splitting the span would cost the most. */
case class BloomMightContain(value: Expression, bloomBits: Expression)
    extends BinaryExpression
    with KernelCodegen {

  override def left: Expression = value
  override def right: Expression = bloomBits
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(bloomBits.eval(InternalRow.empty).asInstanceOf[Array[Byte]]))

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // The bloomBits literal's codegen is a per-row constant-reference read;
    // the deserialized filter itself is the lazy transient above, built once.
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = ${kernelRef(ctx)}.mightContain($v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(value = newLeft, bloomBits = newRight)
}

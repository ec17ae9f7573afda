// Lives under org.apache.spark.sql for the same reason as Signatures:
// expression-typing internals are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte length of a string — the raw ingredient of the
  * compression-ratio quality signal (the Gopher-family heuristic: template
  * and boilerplate text compresses far below natural prose, so
  * `deflate_len / byte_len` is a cheap one-pass repetitiveness score that
  * catches structures n-gram statistics miss, e.g. long-period repeats).
  *
  * Same kernel rules as [[NGramHashes]]: a real `doGenCode` (one call into
  * `compute`), so the enclosing whole-stage span never splits; a
  * thread-local reused `Deflater` (allocating one per row measured ~10×
  * slower than the deflate itself on short documents).
  *
  * Determinism: fixed level 6, no preset dictionary → byte-stable for a
  * given JVM. The exact length is a property of the bundled zlib, so
  * cross-engine oracles must treat it as an engine-specific measurement and
  * gate on CONTRACT properties (bounds, orderings) — exactly how the
  * HLL/CMS estimates are handled — never on the raw value.
  */
case class DeflateLength(child: Expression)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  def compute(s: UTF8String): Int = DeflateLength.lengthOf(s.getBytes)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {
  private val deflaters = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true))
  private val buffers = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  private[graft] def lengthOf(bytes: Array[Byte]): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

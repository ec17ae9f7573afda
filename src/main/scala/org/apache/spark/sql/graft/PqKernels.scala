// Lives under org.apache.spark.sql (like Bridge) because the expression-typing
// APIs it extends (AbstractDataType, ImplicitCastInputTypes inputs) are
// private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared layout for the product-quantization kernels: the full m-subspace
  * codebook model flattened into one primitive buffer that rides the plan as
  * a single reference object.
  *
  * Why (SURVEY.md §7.3, the [[DotProduct]] rationale taken one level up):
  * composing PQ assignment from per-centroid column expressions builds
  * m·nlist literal-array nodes — 128 `dot(slice(...), lit(...))` subtrees at
  * the default m=8/nlist=16 — and Catalyst analysis + whole-stage-codegen
  * compilation of those trees dominated `q_ann_pq` wall time at test SFs
  * (tools/PqProfile: ~2 s of pure planning per query even warm). One
  * expression node with the model as a `double[]` reference keeps the plan
  * O(1) in model size, and the generated loop is the tight primitive code
  * the 100 TB corpus scan wants (no per-centroid virtual calls).
  *
  * Layout: `flat` concatenates every centroid subvector; subspace `mi`'s
  * cells occupy positions `offsets(mi) until offsets(mi+1)`, each `sub`
  * doubles wide (sub = dim/m; subspaces may hold fewer than nlist cells
  * after Lloyd drops empty ones). A vector shorter than `dim` reads as
  * zero-padded (the `slice`-then-[[DotProduct]] contract it replaces).
  */
private[graft] trait PqModelLayout { self: UnaryExpression =>
  def books: Seq[Seq[Seq[Double]]]

  @transient protected lazy val m: Int = books.size
  @transient protected lazy val sub: Int = books.head.head.size
  @transient protected lazy val offsets: Array[Int] =
    books.scanLeft(0)((acc, cb) => acc + cb.size).toArray
  @transient protected lazy val flat: Array[Double] =
    books.flatten.flatten.toArray
}

/** PQ cell assignment: per subspace, the argmax-by-dot centroid position —
  * `array<int>` of m codes. Tie-break: the LAST maximal cell wins (`>=`),
  * matching the `array_max(struct(d, cid))` column form this kernel
  * replaces (lexicographic max → max cid on ties). */
case class PqAssign(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with ImplicitCastInputTypes
    with PqModelLayout {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_assign"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val vb = mi * sub
      val lim = math.min(sub, math.max(0, vn - vb))
      var best = Double.NegativeInfinity
      var bc = 0
      var c = 0
      val nc = offsets(mi + 1) - offsets(mi)
      while (c < nc) {
        val o = (offsets(mi) + c) * sub
        var s = 0.0
        var j = 0
        while (j < lim) { s += v.getDouble(vb + j) * flat(o + j); j += 1 }
        if (s >= best) { best = s; bc = c }
        c += 1
      }
      codes(mi) = bc
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
        val offRef = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
        val codes = ctx.freshName("codes")
        val vn = ctx.freshName("vn")
        val mi = ctx.freshName("mi")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val best = ctx.freshName("best")
        val bc = ctx.freshName("bc")
        val vb = ctx.freshName("vb")
        val lim = ctx.freshName("lim")
        val o = ctx.freshName("o")
        val nc = ctx.freshName("nc")
        s"""
           |int $vn = $a.numElements();
           |int[] $codes = new int[$m];
           |for (int $mi = 0; $mi < $m; $mi++) {
           |  int $vb = $mi * $sub;
           |  int $lim = java.lang.Math.min($sub, java.lang.Math.max(0, $vn - $vb));
           |  double $best = Double.NEGATIVE_INFINITY;
           |  int $bc = 0;
           |  int $nc = $offRef[$mi + 1] - $offRef[$mi];
           |  for (int $c = 0; $c < $nc; $c++) {
           |    int $o = ($offRef[$mi] + $c) * $sub;
           |    double $s = 0.0;
           |    for (int $j = 0; $j < $lim; $j++) {
           |      $s += $a.getDouble($vb + $j) * $flatRef[$o + $j];
           |    }
           |    if ($s >= $best) { $best = $s; $bc = $c; }
           |  }
           |  $codes[$mi] = $bc;
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side ADC lookup tables: every (subspace, cell) dot product of the
  * query's subvector against that cell's centroid, flattened in
  * [[PqModelLayout]] offset order — `array<double>` of Σ cells entries.
  * The corpus-side ADC score is then m `element_at(lut, offset+code+1)`
  * adds per pair, no vector math. Computed once per QUERY on the broadcast
  * side. */
case class PqLuts(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with ImplicitCastInputTypes
    with PqModelLayout {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_luts"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val lut = new Array[Double](offsets(m))
    var mi = 0
    while (mi < m) {
      val vb = mi * sub
      val lim = math.min(sub, math.max(0, vn - vb))
      var c = 0
      val nc = offsets(mi + 1) - offsets(mi)
      while (c < nc) {
        val o = (offsets(mi) + c) * sub
        var s = 0.0
        var j = 0
        while (j < lim) { s += v.getDouble(vb + j) * flat(o + j); j += 1 }
        lut(offsets(mi) + c) = s
        c += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
        val offRef = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
        val lut = ctx.freshName("lut")
        val vn = ctx.freshName("vn")
        val mi = ctx.freshName("mi")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val vb = ctx.freshName("vb")
        val lim = ctx.freshName("lim")
        val o = ctx.freshName("o")
        val nc = ctx.freshName("nc")
        s"""
           |int $vn = $a.numElements();
           |double[] $lut = new double[${offsets(m)}];
           |for (int $mi = 0; $mi < $m; $mi++) {
           |  int $vb = $mi * $sub;
           |  int $lim = java.lang.Math.min($sub, java.lang.Math.max(0, $vn - $vb));
           |  int $nc = $offRef[$mi + 1] - $offRef[$mi];
           |  for (int $c = 0; $c < $nc; $c++) {
           |    int $o = ($offRef[$mi] + $c) * $sub;
           |    double $s = 0.0;
           |    for (int $j = 0; $j < $lim; $j++) {
           |      $s += $a.getDouble($vb + $j) * $flatRef[$o + $j];
           |    }
           |    $lut[$offRef[$mi] + $c] = $s;
           |  }
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($lut);
         """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

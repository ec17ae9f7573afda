// Lives under org.apache.spark.sql for the same reason as DotProduct: the
// expression-typing internals are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row signature kernels for the dedup operators.
  *
  * Why custom Expressions (SURVEY.md §7.3): composing these from Spark's
  * higher-order functions (`transform`/`aggregate` lambdas) evaluates
  * interpreted with per-element boxing — profiling at sf0.1 showed the
  * signature stage dominating MinHash/SimHash dedup by >20×. These kernels
  * hash each element once in a tight compiled loop.
  *
  * Codegen contract: each kernel implements `doGenCode` as a single call
  * into its compiled `compute` method (via `ctx.addReferenceObj`), NOT as
  * CodegenFallback. A fallback expression would split the whole-stage
  * codegen span of every stage it appears in — de-optimizing the
  * surrounding projections and filters, which on the text paths are the
  * tokenize → signature → stats chains themselves. The per-row loop stays
  * plain JVM code (generating it inline would duplicate logic for no
  * measurable gain); what matters is that the enclosing stage still fuses.
  * All kernels are deterministic and depend only on murmur3 — no
  * wall-clock, no RNG.
  */
private[graft] object HashKernels {
  @inline def murmur(s: UTF8String, seed: Int): Int =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** splitmix64 finalizer — cheap, high-quality 64-bit mixing. */
  @inline def mix64(v0: Long): Long = {
    var v = v0 + 0x9e3779b97f4a7c15L
    v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
    v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
    v ^ (v >>> 31)
  }
}

/** Shared doGenCode shape: bind `this` into the generated class's reference
  * array and emit one call to the kernel's `compute`. */
private[graft] trait KernelCodegen { self: Expression =>
  protected def kernelRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("graftKernel", this, getClass.getName)
}

/** Distinct, sorted 64-bit hashes of the word n-grams of an `array<string>`
  * token column. Replaces materializing n-gram *strings*
  * (`transform` + `concat_ws` + `array_distinct` — interpreted per element,
  * the profiled bottleneck of the dedup family): one murmur3 per token, a
  * polynomial combine per window, sort + in-place dedup. Sorted output makes
  * downstream set intersection a linear merge ([[SortedIntersectCount]]).
  * Fewer than `n` tokens → empty array. */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) = HashKernels.murmur(arr.getUTF8String(i), 7).toLong
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i < out.length) {
      var x = 1125899906842597L
      var j = 0
      while (j < n) {
        x = 31L * x + th(i + j)
        j += 1
      }
      out(i) = HashKernels.mix64(x)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of common elements between two *sorted distinct* `array<bigint>`
  * columns (the [[NGramHashes]] output contract) — a linear merge scan,
  * replacing interpreted `size(array_intersect(...))`. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with KernelCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  def compute(x: ArrayData, y: ArrayData): Int = {
    var i = 0
    var j = 0
    var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = ${kernelRef(ctx)}.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Common elements of two *sorted distinct* `array<bigint>` columns — the
  * element-returning sibling of [[SortedIntersectCount]] for consumers
  * that must attribute per-element credit (the per-node triangle census):
  * the same linear merge scan, no per-call hash set, no boxing —
  * interpreted `array_intersect` builds a hash map per invocation and was
  * the profiled bottleneck at Σ outdeg² ≈ 1.5·10⁸ element comparisons on
  * the sf0.1 co-order graph. Output preserves sorted order. */
case class SortedIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect"

  def compute(x: ArrayData, y: ArrayData): ArrayData = {
    val nx = x.numElements()
    val ny = y.numElements()
    val buf = new Array[Long](math.min(nx, ny))
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { buf(c) = xv; c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, c))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = ${kernelRef(ctx)}.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All unordered pairs `(a, b), a-index < b-index` of an `array<bigint>`
  * column as `array<struct<a,b>>` — the row-local pair expansion behind
  * co-occurrence edges and market-basket cells. Replaces the nested
  * `flatten(transform(ps, (pa, i) -> transform(slice(ps, i + 2, …), …)))`
  * spelling: ArrayTransform is CodegenFallback, so that form evaluated an
  * interpreted lambda (plus a slice copy and a struct allocation) per
  * element of every basket — the same per-row interpreter tax the r11
  * q_lcc profile measured at ~190 µs/row. One tight compiled loop here;
  * pair order (all partners of element 0, then of 1, …) matches the old
  * expression, and output volume is unchanged — n·(n−1)/2 structs. */
case class SortedLongPairs(child: Expression)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_sorted_long_pairs"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var c = 0
    var i = 0
    while (i < n) {
      val ai = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(c) = org.apache.spark.sql.catalyst.InternalRow(ai, arr.getLong(j))
        c += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over an `array<bigint>` hashed-shingle set (the
  * [[NGramHashes]] output): `numPerm` virtual permutations derived from two
  * mixes per element (`h_p = h1 + p*h2`, h2 forced odd — the standard
  * double-hash scheme), so the cost is O(1) per shingle regardless of
  * `numPerm`. Returns `array<bigint>`; empty input yields a signature of
  * Long.MaxValue (callers filter empty shingle sets). */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      val h1 = HashKernels.mix64(v)
      val h2 = HashKernels.mix64(v ^ 0x5851f42d4c957f2dL) | 1L
      var p = 0
      while (p < numPerm) {
        val h = h1 + p * h2
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace tokenizer: equivalent to `split(trim(text), "\\s+")` with the
  * Java `\s` class ([ \t\n\x0B\f\r]) but a single byte-level pass — all
  * delimiters are single-byte ASCII, so UTF-8 multibyte sequences can never
  * be split. Blank/empty input → empty array (not [""]). Replaces the regex
  * engine on every text path (tokens feed shingles, stats, lang-ID). */
case class WhitespaceTokens(child: Expression)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of elements of an `array<string>` column that appear in a fixed
  * string set (total occurrences, not distinct). Replaces the interpreted
  * `size(filter(arr, t -> t IN (...)))` lambda on the text-quality path. */
case class CountInSet(child: Expression, set: Seq[String])
    extends UnaryExpression
    with KernelCodegen {

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in_set"

  def compute(arr: ArrayData): Int = {
    var i = 0
    var c = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && lookup.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Largest multiplicity of any element in an `array<string>` column (the
  * mode's count; 0 for an empty array) — the Gopher-style "most common word
  * fraction" numerator. One hash-map pass per row; the SQL-composable
  * equivalent (explode → groupBy(doc, token) → max(count)) would shuffle
  * the whole exploded corpus for a row-local statistic. */
case class MaxMultiplicity(child: Expression)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_multiplicity"

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an `array<string>` token stream: each token votes ±1
  * on every bit of its 64-bit hash (two murmur3 halves); bit i of the result
  * is set iff the summed vote is positive. Single pass, one int[64] of local
  * state per row. */
case class SimHash64(child: Expression) extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = (HashKernels.murmur(s, 2).toLong << 32) | (HashKernels.murmur(s, 3).toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Canonical corpus text normalization — the first stage of every LLM data
  * pipeline, as ONE compiled pass: Unicode NFC composition, per-codepoint
  * SIMPLE lowercase (no locale, no 1:N expansions, no final-sigma context
  * rule — the mapping DuckDB's utf8proc lower() uses), and collapse of
  * every `[\x00-\x20\x7f]` run (ASCII whitespace + controls + DEL — and
  * ONLY those; U+00A0/U+2000-200A/U+2028 survive) to a single space,
  * edge-trimmed. Fixed, engine-replayable contract: NFC BEFORE
  * lowercasing, so composed and decomposed inputs normalize identically;
  * the DuckDB oracle replays it as
  * `trim(regexp_replace(lower(nfc_normalize(s)), '[\x00-\x20\x7f]+', ' ', 'g'))`.
  *
  * ASCII fast path: the common corpus row (no NFC work, no surrogate
  * handling) runs byte-at-a-time with no String materialization beyond the
  * output; `Normalizer.isNormalized` short-circuits the NFC pass for
  * already-composed non-ASCII text.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression
    with KernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_unicode"

  @inline private def isAsciiWsOrCtl(b: Byte): Boolean =
    (b >= 0 && b < 0x21) || b == 0x7f

  def compute(input: UTF8String): UTF8String = {
    val bytes = input.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      // byte-level: lower A-Z, collapse WS/control runs, trim
      val out = new Array[Byte](bytes.length)
      var o = 0
      var pendingSpace = false
      i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        if (isAsciiWsOrCtl(b)) { if (o > 0) pendingSpace = true }
        else {
          if (pendingSpace) { out(o) = 0x20; o += 1; pendingSpace = false }
          out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          o += 1
        }
        i += 1
      }
      UTF8String.fromBytes(out, 0, o)
    } else {
      import java.text.Normalizer
      val s0 = input.toString
      val nfc =
        if (Normalizer.isNormalized(s0, Normalizer.Form.NFC)) s0
        else Normalizer.normalize(s0, Normalizer.Form.NFC)
      // Oracle-contract parity on the slow path too: the collapse class is
      // EXACTLY [\x00-\x20\x7f] (the documented DuckDB regex — NOT Java's
      // wider isWhitespace ∪ Cc, which would also eat U+00A0/U+2000-200A/
      // U+2028 etc. that the oracle preserves), and lowercase is the
      // per-codepoint SIMPLE mapping (Character.toLowerCase(int)) — full
      // String.toLowerCase would 1:N-expand U+0130 and apply the
      // context-sensitive final-sigma rule, both absent from utf8proc's
      // simple mapping in DuckDB's lower().
      val sb = new java.lang.StringBuilder(nfc.length)
      var pendingSpace = false
      var j = 0
      while (j < nfc.length) {
        val cp = nfc.codePointAt(j)
        if (cp <= 0x20 || cp == 0x7f) {
          if (sb.length > 0) pendingSpace = true
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.appendCodePoint(Character.toLowerCase(cp))
        }
        j += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelRef(ctx)}.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

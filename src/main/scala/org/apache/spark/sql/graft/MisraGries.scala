// Lives under org.apache.spark.sql like the other graft kernels: the
// aggregate-expression internals it extends are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: the ONE-PASS, BOUNDED-MEMORY answer to "which
  * items are frequent?" when the item domain is unbounded. The exact
  * formulation (`groupBy(item).count` then top-k) shuffles one row per
  * DISTINCT item — at 100 TB of tokens that is a vocabulary-sized exchange
  * just to find the few hundred frequent ones. This aggregate keeps at most
  * `k` counters per partial buffer and merges by counter addition + k-th
  * largest subtraction (Agarwal et al., "Mergeable Summaries", PODS 2012),
  * so the exchange carries ≤ k entries per map task and state never grows.
  *
  * Guarantees (order-independent, what [[graft.SparkEntry]]'s gate checks):
  * every item with true count > n/(k+1) IS in the summary; each reported
  * estimate is ≤ the true count and undercounts by ≤ n/(k+1). The exact
  * COUNTERS do depend on merge order (decrement timing), so the raw query
  * surface is registered rows-only and the oracled gate asserts the
  * order-independent contract instead.
  *
  * Output: `array<struct<item string, est bigint>>`, estimate-descending
  * (ties item-ascending).
  */
case class MisraGries(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JHashMap[UTF8String, Long]]
    with ImplicitCastInputTypes {

  require(k > 0, s"graft_heavy_hitters: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(item)
  // Analysis-time typing for the registered graft_heavy_hitters SQL
  // function — a non-STRING item would otherwise ClassCastException at
  // execution instead of failing (or casting) at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): JHashMap[UTF8String, Long] =
    new JHashMap[UTF8String, Long](k * 2)

  private def decrementAll(m: JHashMap[UTF8String, Long], by: Long): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue - by
      if (v <= 0) it.remove() else e.setValue(v)
    }
  }

  override def update(
      m: JHashMap[UTF8String, Long],
      input: InternalRow): JHashMap[UTF8String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val cur = m.get(s)
      if (cur != 0L || m.containsKey(s)) m.put(s, cur + 1L)
      // .clone(): the evaluated UTF8String may point into a reused row
      // buffer; storing it un-copied would let later rows rewrite the key.
      else if (m.size < k) m.put(s.clone(), 1L)
      else decrementAll(m, 1L)
    }
    m
  }

  override def merge(
      m: JHashMap[UTF8String, Long],
      other: JHashMap[UTF8String, Long]): JHashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = m.get(e.getKey)
      m.put(e.getKey, cur + e.getValue) // keys from `other` are already owned copies
    }
    if (m.size > k) {
      // subtract the (k+1)-th largest counter from all, drop the non-positive
      val counts = new Array[Long](m.size)
      val vit = m.values().iterator()
      var i = 0
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(m.size - k - 1) // (k+1)-th largest
      decrementAll(m, cut)
    }
    m
  }

  override def eval(m: JHashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1.compareTo(b._1) < 0
    }
    new GenericArrayData(sorted.map { case (s, c) => InternalRow(s, c): Any })
  }

  override def serialize(m: JHashMap[UTF8String, Long]): Array[Byte] = {
    var total = 4
    val sit = m.keySet().iterator()
    while (sit.hasNext) total += 4 + sit.next().numBytes + 8
    val bb = ByteBuffer.allocate(total)
    bb.putInt(m.size)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m.put(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

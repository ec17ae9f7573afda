// Lives under org.apache.spark.sql like the other graft kernels: the
// aggregate-expression internals it extends are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group exact top-k as a MAP-SIDE-COMBINING aggregate — the scale
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY s)` +
  * `rank <= k` idiom. The window formulation shuffles EVERY row of the
  * corpus to its group's partition and sorts there before discarding all
  * but k; at 100 TB that is a full-data exchange for a k-row answer, and a
  * hot group concentrates its entire sort on one task. This aggregate keeps
  * a bounded k-element heap per group per map task, so the exchange carries
  * at most `k × groups × partitions` entries (partial heaps merge
  * associatively), and no task ever holds more than k entries per group.
  *
  * Semantics (fixed, oracle-replayable): largest `score` first, ties broken
  * by smallest `id` — identical to `ORDER BY score DESC, id ASC` under
  * distinct-(score,id) inputs. NULL scores are ignored. Output:
  * `array<struct<score double, id bigint>>` sorted best-first, at most k
  * entries (fewer when the group is smaller).
  *
  * Plan shape: TypedImperativeAggregate executes via ObjectHashAggregate
  * with a `partial` mode before the group exchange — the heap IS the
  * map-side combine. The heap never reaches the driver; `eval` runs on the
  * reducer for its own groups only.
  */
case class GroupTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]]
    with ImplicitCastInputTypes {

  require(k > 0, s"graft_top_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // The registered SQL surface (graft_top_k) otherwise accepts ANY argument
  // types at analysis time and ClassCastExceptions at execution (e.g. an
  // INT score); declaring them makes wrong types an analysis error or a
  // free implicit cast.
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  // worst-first ordering for eviction: lowest score at the head; among
  // equal scores the LARGEST id is worst (tie-break is id ascending).
  private def cmp: Comparator[(Double, Long)] = new Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](k + 1, cmp)

  private def offer(q: PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (q.size < k) { q.offer(e); () }
    else if (cmp.compare(e, q.peek) > 0) { q.poll(); q.offer(e); () }
  }

  override def update(
      q: PriorityQueue[(Double, Long)],
      input: InternalRow): PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) offer(q, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    q
  }

  override def merge(
      q: PriorityQueue[(Double, Long)],
      other: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(q, it.next())
    q
  }

  override def eval(q: PriorityQueue[(Double, Long)]): Any = {
    // NON-destructive: eval must not mutate the buffer — the registered SQL
    // function can land in contexts that evaluate a buffer more than once
    // (e.g. a window frame), where draining the heap would corrupt state.
    val sorted = new Array[(Double, Long)](q.size)
    val it = q.iterator()
    var i = 0
    while (it.hasNext) { sorted(i) = it.next(); i += 1 }
    java.util.Arrays.sort(sorted, cmp.reversed()) // best-first
    new GenericArrayData(sorted.map { case (s, d) =>
      InternalRow(s, d): Any
    })
  }

  override def serialize(q: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * q.size)
    bb.putInt(q.size)
    val it = q.iterator()
    while (it.hasNext) {
      val (s, d) = it.next()
      bb.putDouble(s)
      bb.putLong(d)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      // already trimmed to <= k on the serializing side; offer() re-trims
      // defensively if k ever differed.
      offer(q, (bb.getDouble, bb.getLong))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

package org.apache.spark.sql.graftglue

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded top-k buffer: keeps the k largest (score, id) pairs in a
  * min-heap; ids break ties ascending (smaller id wins at equal
  * score), matching `ORDER BY score DESC, id ASC` window semantics.
  */
final class TopKBuffer(val k: Int) {
  require(k > 0, s"top-k k must be positive, got $k")
  // head = evict-first entry: lowest score, and on ties the LARGEST id
  // (smaller ids win ties, matching ORDER BY score DESC, id ASC)
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), Double](_._1).reverse.orElseBy(_._2)
  val heap: mutable.PriorityQueue[(Double, Long)] = mutable.PriorityQueue.empty(ord)

  def add(score: Double, id: Long): Unit = {
    // NaN scores (e.g. cosine of a zero-norm vector) are excluded:
    // NaN comparisons would make heap contents depend on arrival
    // order, i.e. on partitioning — nondeterministic results
    if (score.isNaN) return
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head // weakest kept entry
      if (score > ws || (score == ws && id < wi)) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
  }

  def mergeIn(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => add(s, i) }

  /** Descending by score, ties by ascending id. */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** Distributed exact top-k as a custom [[TypedImperativeAggregate]]:
  * `topk_agg(score, id, k)` keeps a bounded min-heap per partial, so
  * per-key top-k costs O(n log k) with map-side combining and NO
  * per-partition sort — the scalable replacement for the
  * `row_number() OVER (ORDER BY score DESC) <= k` pattern, whose
  * window sorts every key's entire row set.
  *
  * Output: array<struct<score double, id long>> ordered by
  * (score desc, id asc) — identical semantics to the window form.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, s"topk_agg: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) => InternalRow(s, i) }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

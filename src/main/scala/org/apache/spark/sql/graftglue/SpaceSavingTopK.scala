package org.apache.spark.sql.graftglue

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Mutable SpaceSaving (Metwally et al.) summary: tracks at most
  * `capacity` counters; an unseen item evicts the current minimum and
  * inherits its count (+by), so every true heavy hitter of frequency
  * > N/capacity is guaranteed present. While distinct items ≤
  * capacity, counts are exact.
  *
  * A count→items bucket index (TreeMap) makes eviction O(log capacity)
  * instead of a full counter scan — the Stream-Summary structure — so
  * per-row update cost stays flat on high-cardinality streams.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  require(capacity > 0, s"SpaceSaving capacity must be positive, got $capacity")

  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  private val byCount = new java.util.TreeMap[Long, mutable.LinkedHashSet[String]]()

  private def bucketAdd(item: String, c: Long): Unit =
    byCount.computeIfAbsent(c, _ => mutable.LinkedHashSet.empty) += item

  private def bucketRemove(item: String, c: Long): Unit = {
    val b = byCount.get(c)
    b -= item
    if (b.isEmpty) byCount.remove(c)
  }

  /** Direct insert for deserialization — no eviction semantics. */
  def insertRaw(item: String, c: Long): Unit = {
    counts.update(item, c)
    bucketAdd(item, c)
  }

  def add(item: String, by: Long = 1L): Unit =
    counts.get(item) match {
      case Some(c) =>
        bucketRemove(item, c)
        counts.update(item, c + by)
        bucketAdd(item, c + by)
      case None if counts.size < capacity =>
        insertRaw(item, by)
      case None =>
        val minEntry = byCount.firstEntry()
        val victim = minEntry.getValue.head
        bucketRemove(victim, minEntry.getKey)
        counts.remove(victim)
        insertRaw(item, minEntry.getKey + by)
    }

  def mergeIn(other: SpaceSavingBuffer): Unit =
    other.counts.foreach { case (k, v) => add(k, v) }
}

/** Approximate top-k heavy hitters as a custom
  * [[TypedImperativeAggregate]] — the mergeable-sketch aggregation
  * extension point (partial aggregates merge across partitions, so
  * the full pass over a 100 TB corpus shuffles only `capacity`
  * counters per partial).
  *
  * Output: array<struct<item string, cnt long>> of the `k` largest,
  * ordered by (cnt desc, item) for determinism.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ExpectsInputTypes {

  require(k > 0, s"spacesaving_topk: k must be positive, got $k")
  require(capacity >= k, s"spacesaving_topk: capacity ($capacity) must be >= k ($k)")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "spacesaving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val top = buf.counts.toSeq.sortBy { case (item, cnt) => (-cnt, item) }.take(k)
    new GenericArrayData(top.map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    }.toArray[Any])
  }

  // length-prefixed UTF-8 bytes, not writeUTF: items may exceed the
  // 64 KiB modified-UTF-8 limit (e.g. whole-document keys)
  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (kk, v) =>
      val b = kk.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.insertRaw(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

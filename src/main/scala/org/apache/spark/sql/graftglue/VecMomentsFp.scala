package org.apache.spark.sql.graftglue

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Running fixed-point vector moments: n, Σ⌊xᵢ·fp⌋ and (optionally)
  * the upper-triangle Σ⌊xᵢxⱼ·fp⌋.
  */
final class VecMomentsBuffer(val dim: Int, val outer: Boolean) {
  var n: Long = 0L
  val s1: Array[Long] = new Array[Long](dim)
  val s2: Array[Long] = if (outer) new Array[Long](dim * (dim + 1) / 2) else Array.emptyLongArray
}

/** One-pass fixed-point vector moments as a [[TypedImperativeAggregate]]:
  * `vec_moments_fp(vec, fp, dim, outer)` returns
  * struct(n long, s1 array<long>[, s2 array<long> upper-triangle]),
  * where each term is the PER-ELEMENT truncation `(xᵢ·fp).toLong`
  * (resp. `(xᵢ·xⱼ·fp).toLong`) summed — bit-identical to the explode
  * formulation `sum(cast(x * fp as long))` it replaces, and exact /
  * order-free like it, but WITHOUT materializing dim (or dim²/2)
  * rows per vector: the old PCA covariance plan exploded every
  * 64-float embedding into 2 080 (i, j, product) rows before the
  * partial aggregate — 2 080× the corpus row count flowing through a
  * hash aggregate — where this keeps one running array per partial
  * with map-side combining, so the exchange carries one
  * (n, s1, s2) triple per partition at ANY corpus size.
  *
  * Float elements are widened exactly as the explode plan did
  * (float → double, then the product/scale in double).
  */
case class VecMomentsFp(
    vec: Expression,
    fp: Double,
    dim: Int,
    outer: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMomentsBuffer] {

  require(dim > 0, s"vec_moments_fp: dim must be positive, got $dim")

  // lazy: children are unresolved at construction; first touched in update()
  private lazy val isFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_moments_fp expects array<float>/array<double>, got $t")
  }

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("s2", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "vec_moments_fp"

  override def createAggregationBuffer(): VecMomentsBuffer =
    new VecMomentsBuffer(dim, outer)

  override def update(buf: VecMomentsBuffer, input: InternalRow): VecMomentsBuffer = {
    val a = vec.eval(input).asInstanceOf[ArrayData]
    if (a == null) return buf
    require(a.numElements() == dim,
      s"vec_moments_fp: expected $dim elements, got ${a.numElements()}")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    buf.n += 1
    i = 0
    while (i < dim) {
      buf.s1(i) += (x(i) * fp).toLong
      i += 1
    }
    if (outer) {
      var idx = 0
      i = 0
      while (i < dim) {
        val xi = x(i)
        var j = i
        while (j < dim) {
          buf.s2(idx) += (xi * x(j) * fp).toLong
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VecMomentsBuffer, other: VecMomentsBuffer): VecMomentsBuffer = {
    buf.n += other.n
    var i = 0
    while (i < buf.s1.length) { buf.s1(i) += other.s1(i); i += 1 }
    i = 0
    while (i < buf.s2.length) { buf.s2(i) += other.s2(i); i += 1 }
    buf
  }

  override def eval(buf: VecMomentsBuffer): Any =
    InternalRow(buf.n,
      new GenericArrayData(buf.s1.map(Long.box)),
      new GenericArrayData(buf.s2.map(Long.box)))

  override def serialize(buf: VecMomentsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeBoolean(buf.outer)
    out.writeLong(buf.n)
    buf.s1.foreach(out.writeLong)
    buf.s2.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMomentsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecMomentsBuffer(in.readInt(), in.readBoolean())
    buf.n = in.readLong()
    var i = 0
    while (i < buf.s1.length) { buf.s1(i) = in.readLong(); i += 1 }
    i = 0
    while (i < buf.s2.length) { buf.s2(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsFp =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsFp =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecMomentsFp =
    copy(vec = newChildren(0))
}

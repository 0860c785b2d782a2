package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Distinct-LONG collector CAPPED at `bound` elements, emitted SORTED.
  *
  * The round-15 candidate-generation shape for the dedup pair build: one
  * `groupBy(h)` computes both the shingle's document frequency and (up to
  * `bound`) the distinct doc_ids carrying it, so candidate pairs explode
  * ROW-LOCALLY from the ≤ MaxShingleDf doc set instead of a self-join of
  * the exploded (doc, h) table on h — the Σ df² fan-out exchange the
  * round-14 verdict called the at-scale hazard. The cap is what makes the
  * aggregation safe where `collect_set` is not: a stop shingle carried by
  * millions of documents accumulates `bound` longs, not millions — and its
  * truncated set is never READ, because consumers filter to df ≤ bound-1
  * first, where the set is provably complete (set size ≤ row count ≤ df).
  *
  * Buffer is a flat ArrayBuffer[Long] with linear-scan dedup — exact and
  * cheap for the ≤ ~dozen bound this exists for (do not reuse for large
  * bounds). eval() sorts, so downstream ordered-pair generation needs no
  * second array_sort. */
final class BoundedSetBuffer(val bound: Int) {
  val xs: ArrayBuffer[Long] = ArrayBuffer.empty

  def add(v: Long): Unit = {
    if (xs.length < bound) {
      var i = 0
      while (i < xs.length) {
        if (xs(i) == v) return
        i += 1
      }
      xs += v
    }
  }
}

/** `bounded_set_long(child, bound)`: array<long> of at most `bound`
  * distinct child values, sorted ascending. Nulls are skipped (collect_set
  * discipline). Which `bound` values survive past the cap is
  * partition-order-dependent — only read the result where the group's
  * distinct count is ≤ bound (see class doc). */
case class BoundedSetAgg(child: Expression, bound: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSetBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(bound > 0 && bound <= 1024, s"bound $bound out of range")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_set_long"

  override def createAggregationBuffer(): BoundedSetBuffer =
    new BoundedSetBuffer(bound)

  override def update(buf: BoundedSetBuffer,
      input: InternalRow): BoundedSetBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedSetBuffer,
      b: BoundedSetBuffer): BoundedSetBuffer = {
    var i = 0
    val n = b.xs.length
    while (i < n && a.xs.length < a.bound) {
      a.add(b.xs(i))
      i += 1
    }
    a
  }

  override def eval(buf: BoundedSetBuffer): Any = {
    val arr = buf.xs.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: BoundedSetBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.xs.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.xs.length)
    buf.xs.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedSetBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedSetBuffer(bound)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.xs += in.readLong() // partials are already deduped and capped
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedSetAgg = copy(child = newChild)
}

object BoundedSetAgg {
  /** Column-API entry point: sorted array of ≤ bound distinct longs. */
  def apply(child: Column, bound: Int): Column =
    Shim.column(new BoundedSetAgg(Shim.expression(child), bound)
      .toAggregateExpression())
}

package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer for the fused concat+count: accumulated body parts as
  * raw UTF-8 byte arrays, raw-substring row count, contribution count, and
  * the group's delimiter (carried in the buffer because it is derived from
  * the group key — constant within a group).
  *
  * Parts are a growable array of byte arrays, NOT an eagerly concatenated
  * string — an immutable-string buffer would copy the whole accumulated
  * body on every append (quadratic in group size); the single O(total)
  * concatenation happens once in `eval`. */
final class ConcatCountBuffer {
  val parts: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
  var totalBytes: Long = 0L
  var rows: Long = 0L
  var reqs: Long = 0L
  var delim: Array[Byte] = Array.emptyByteArray
  // explicit "delimiter captured" flag: an empty delimiter is legitimate
  // (TSV/CSV groups), so emptiness cannot double as the unset sentinel —
  // that would re-evaluate the delimiter child on every row of the group
  var delimSet: Boolean = false
}

/** The reference's per-key Buffer as ONE fused typed aggregate
  * (SURVEY.md §2.6): `store.Req[key]` append+count in a single pass
  * (/root/reference/main.go:198-208, Buffer at main.go:65-68) — buffer
  * append + `rowcount += rows` fused, no intermediate collect_list array.
  *
  * A `TypedImperativeAggregate` rather than a Dataset `Aggregator`: the
  * Aggregator formulation paid kryo serialize/deserialize on EVERY row at
  * the partial→final boundary (its buffer encoder is opaque to Tungsten)
  * and measured 4× the built-in collect_list path at sf0.1. This form
  * mutates a plain JVM object inside ObjectHashAggregate and serializes a
  * length-prefixed raw byte layout only when a partial buffer actually
  * crosses the exchange — the execution shape the reference's in-place
  * `Buffer{rowcount, buffer}` append has on a single node.
  *
  * Children: (body STRING, rowsInBody LONG, delimiter STRING); the
  * delimiter comes from the format sniff (O-15). Merge joins two partial
  * buffers — the distributed version of the reference's single-mutex
  * append. Concat order is arrival order, nondeterministic across
  * partitions — same as the reference under concurrency (SURVEY.md §1.3);
  * correctness checks compare order-invariant aggregates, not the byte
  * sequence. Output: struct(body STRING, rows LONG, reqs LONG). */
case class ConcatCount(first: Expression, second: Expression,
    third: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ConcatCountBuffer]
  with TernaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, LongType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("body", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("reqs", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "concat_count"

  override def createAggregationBuffer(): ConcatCountBuffer =
    new ConcatCountBuffer

  override def update(buf: ConcatCountBuffer,
      input: InternalRow): ConcatCountBuffer = {
    val b = first.eval(input)
    if (b != null) {
      // copy() then getBytes: the incoming UTF8String usually points into
      // a reused unsafe-row page; copy() materializes exactly one owned
      // array and getBytes on an exact-backed UTF8String is copy-free
      buf.parts += b.asInstanceOf[UTF8String].copy().getBytes
      buf.totalBytes += buf.parts.last.length
      val r = second.eval(input)
      if (r != null) buf.rows += r.asInstanceOf[Long]
      buf.reqs += 1L
      if (!buf.delimSet) {
        val d = third.eval(input)
        if (d != null) {
          buf.delim = d.asInstanceOf[UTF8String].copy().getBytes
          buf.delimSet = true
        }
      }
    }
    buf
  }

  override def merge(a: ConcatCountBuffer,
      b: ConcatCountBuffer): ConcatCountBuffer = {
    a.parts ++= b.parts
    a.totalBytes += b.totalBytes
    a.rows += b.rows
    a.reqs += b.reqs
    if (!a.delimSet && b.delimSet) { a.delim = b.delim; a.delimSet = true }
    a
  }

  override def eval(buf: ConcatCountBuffer): Any = {
    val n = buf.parts.length
    val d = buf.delim
    val outLen = buf.totalBytes + (if (n > 1) d.length.toLong * (n - 1) else 0L)
    require(outLen <= Int.MaxValue,
      s"concatenated batch exceeds 2 GiB (${outLen} bytes) — split the group")
    val out = new Array[Byte](outLen.toInt)
    var pos = 0
    var i = 0
    while (i < n) {
      if (i > 0 && d.length > 0) {
        System.arraycopy(d, 0, out, pos, d.length); pos += d.length
      }
      val p = buf.parts(i)
      System.arraycopy(p, 0, out, pos, p.length); pos += p.length
      i += 1
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromBytes(out), buf.rows, buf.reqs))
  }

  // raw length-prefixed layout — no kryo, no reflection:
  // [delimSet][delimLen][delim][rows][reqs][nParts] then per part [len][bytes]
  override def serialize(buf: ConcatCountBuffer): Array[Byte] = {
    // same descriptive guard as eval(): without it a ~2 GiB partial buffer
    // turns the Int size arithmetic negative and throws an opaque
    // IllegalArgumentException from ByteArrayOutputStream
    val estimate = 32L + buf.delim.length + buf.totalBytes +
      4L * buf.parts.length
    require(estimate <= Int.MaxValue,
      s"partial concat buffer exceeds 2 GiB ($estimate bytes serialized) — " +
        "split the group")
    val bos = new ByteArrayOutputStream(estimate.toInt)
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.delimSet)
    out.writeInt(buf.delim.length)
    out.write(buf.delim)
    out.writeLong(buf.rows)
    out.writeLong(buf.reqs)
    out.writeInt(buf.parts.length)
    buf.parts.foreach { p => out.writeInt(p.length); out.write(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ConcatCountBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ConcatCountBuffer
    buf.delimSet = in.readBoolean()
    val dLen = in.readInt()
    buf.delim = new Array[Byte](dLen); in.readFully(buf.delim)
    buf.rows = in.readLong()
    buf.reqs = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val p = new Array[Byte](in.readInt()); in.readFully(p)
      buf.parts += p
      buf.totalBytes += p.length
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ConcatCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ConcatCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ConcatCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ConcatCount {
  /** Column-API entry point: `concatCount(body, rowsIn, delim)` as an
    * aggregate column yielding struct(body, rows, reqs). */
  def apply(body: Column, rowsIn: Column, delim: Column): Column =
    Shim.column(new ConcatCount(Shim.expression(body),
      Shim.expression(rowsIn), Shim.expression(delim))
      .toAggregateExpression())
}

package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-group Bloom filter over a LONG key — the data-skipping sketch the
  * commit-time stats index stores per data file (the Delta bloom-filter
  * index shape): min/max bounds cannot prune a point probe on a
  * high-cardinality column whose values INTERLEAVE across files (every
  * file's [min,max] covers every key), but a per-file Bloom filter proves
  * "this key is not in this file" for all but ~fpp of the non-containing
  * files. No false negatives ever, so pruning on it is sound regardless
  * of sizing; an overfull filter only degrades back toward "open
  * everything".
  *
  * A `TypedImperativeAggregate` over the public `spark-sketch`
  * [[BloomFilter]] (the same sketch `DataFrameStatFunctions.bloomFilter`
  * builds), not the internal `BloomFilterAggregate`: the buffer merges
  * in place, serializes only when a partial crosses the exchange, and
  * rides the SAME one-pass `groupBy(input_file_name)` aggregation that
  * computes the index row's min/max/nullCount stats — no second scan of
  * the committed files. NULL keys are skipped (a NULL never equals a
  * probe key, so excluding it from the filter is exact). */
case class BloomAgg(child: Expression, expectedItems: Long, fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    // same (expectedItems, fpp) on every buffer of one aggregation →
    // identical bit width and hash count, always compatible
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {

  /** Index-row sizing: at the engine's ~128 MiB target file size a file
    * holds on the order of 10^6 rows, and the sketch stores ~7.3 bits per
    * expected item at 3% fpp (≈ 0.9 MiB raw, mostly zeros for smaller
    * files — parquet compression collapses it). A fuller file only raises
    * the false-positive rate; it can never create a false negative, so
    * the prune stays sound at any actual cardinality. */
  val DefaultExpectedItems: Long = 1L << 20
  val DefaultFpp: Double = 0.03

  /** Column-API entry point: Bloom filter over `key` (cast to long by the
    * caller) as an aggregate column yielding the serialized sketch.
    * (Named `of`, not `apply` — the case class's synthesized apply also
    * carries default arguments, and overloads may not both.) */
  def of(key: Column, expectedItems: Long = DefaultExpectedItems,
      fpp: Double = DefaultFpp): Column =
    Shim.column(new BloomAgg(Shim.expression(key), expectedItems, fpp)
      .toAggregateExpression())

  /** `true` iff the serialized sketch MIGHT contain any of `keys` (or is
    * NULL/undecodable — absence of evidence never prunes). Evaluated
    * executor-side in the index-metadata job, O(live files) rows: the
    * sketch bytes are judged where they live and only surviving PATHS
    * return to the driver — at 100-TB file counts the filters themselves
    * (~1 MiB × 10^5 files) must never be collected. A scalar UDF is the
    * right tool here: this is the metadata plane (one row per FILE, not
    * per data row), and no built-in probes a serialized sketch. */
  def mightContainAny(bloom: Column, keys: Seq[Long]): Column = {
    val ks = keys.toArray
    val probe = udf((bits: Array[Byte]) =>
      bits == null || {
        // NonFatal, not just IOException: corrupt bytes can surface as
        // unchecked throws (e.g. a garbage length header allocating a
        // negative-sized array) and "undecodable" must KEEP the file,
        // never fail the query
        val bf =
          try BloomFilter.readFrom(new ByteArrayInputStream(bits))
          catch { case scala.util.control.NonFatal(_) => null }
        bf == null || ks.exists(bf.mightContain)
      })
    probe(bloom)
  }
}

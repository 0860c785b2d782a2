package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** VECTORIZED decode path of the graft-commitlog V2 readers — the round-11
  * answer to the measured row-decode tax (ScanBench: 3.2× wide / 2.4×
  * narrow at sf1 through `GroupRowReader`'s per-row Group materialization).
  *
  * Column-at-a-time decode on public APIs only: parquet-mr's triplet
  * readers (`ColumnReadStoreImpl`/`ColumnReader` — no Group objects, no
  * per-field boxing) fill Spark `OnHeapColumnVector`s in 4096-row batches,
  * delivered as `ColumnarBatch` so Spark plans its codegen'd
  * `ColumnarToRow` above the scan. The same per-file semantics as the row
  * reader, decided against each file's own schema generation:
  *
  *  - projection by name: only the scan's columns that EXIST in this file
  *    are requested (`setRequestedSchema` — other columns' pages are never
  *    read); missing fields surface as all-NULL vectors;
  *  - row-group skipping: the translated pushed predicate rides
  *    `ParquetReadOptions.withRecordFilter`, so non-matching row groups
  *    are dropped at open by their stats (record-level filtering is left
  *    to Spark's re-filter — pushdown stays pure speedup);
  *  - a comparison naming a column this generation lacks skips the whole
  *    file (the column reads all-NULL — nothing can match);
  *  - numeric/timestamp coercions to the declared type mirror
  *    `GroupRowReader.coerce` exactly (CommitLogV2Spec pins both paths).
  *
  * Supported for FLAT schemas (every projected field an atomic type) —
  * nested structs/arrays fall back to the row reader at the factory. */
object CommitLogColumnar {

  val BatchRows = 4096

  /** Columnar eligibility: every projected field is an atomic type the
    * vector writers cover. Nested types take the row path. */
  def supports(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
          FloatType | BooleanType | StringType | BinaryType |
          TimestampType | DateType => true
      case _ => false
    })
}

class ColumnarCommitReader(file: String, schema: StructType,
    filters: Array[Filter] = Array.empty,
    constants: Map[String, String] = Map.empty)
    extends PartitionReader[ColumnarBatch] {

  private val conf = new Configuration()

  // footer-time decisions, against THIS file's schema generation (each
  // commit-log file is immutable and self-describing)
  private val init: (ParquetFileReader, Boolean, MessageType, String) = {
    val in = HadoopInputFile.fromPath(new HadoopPath(file), conf)
    // filters on constant-supplied columns decide against the constants,
    // never against the file (which lacks them by design)
    val (activeFilters, constSkip) =
      ParquetFilters.splitConstants(filters, constants)
    val probe = ParquetFileReader.open(in)
    var handedOff = false
    try {
      val fileSchema = probe.getFooter.getFileMetaData.getSchema
      val created = probe.getFooter.getFileMetaData.getCreatedBy
      val (pred, buildSkip) =
        ParquetFilters.build(activeFilters, fileSchema)
      val skip = constSkip || buildSkip
      val wanted = schema.fieldNames.filter(fileSchema.containsField)
      val req = new MessageType(fileSchema.getName,
        wanted.map(n =>
          fileSchema.getFields.get(fileSchema.getFieldIndex(n))): _*)
      if (skip) (null, true, req, created)
      else pred match {
        case None =>
          // no predicate → no row groups to filter: the probe reader IS
          // the reader (one footer read per file, not two)
          if (req.getFieldCount > 0) probe.setRequestedSchema(req)
          handedOff = true
          (probe, false, req, created)
        case Some(p) =>
          val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
            .withRecordFilter(
              org.apache.parquet.filter2.compat.FilterCompat.get(p))
            .build()
          val r = ParquetFileReader.open(in, opts)
          if (req.getFieldCount > 0) r.setRequestedSchema(req)
          (r, false, req, created)
      }
    } finally if (!handedOff) probe.close()
  }
  private val reader = init._1
  private val skipFile = init._2
  private val requested = init._3
  private val createdBy = init._4

  // the tracker counts files whose PAGES are read — a footer probe that
  // decides to skip the whole file is not a read
  if (!skipFile) CommitLogReadTracker.record(file)

  /** Output slot → requested-schema field index (−1 = absent from this
    * file, all-NULL). */
  private val slotToReq: Array[Int] = schema.fields.map(f =>
    if (requested.containsField(f.name)) requested.getFieldIndex(f.name)
    else -1)

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(CommitLogColumnar.BatchRows, schema)
  private val batch =
    new ColumnarBatch(vectors.map(v => v: ColumnVector))

  // per-row-group streaming state
  private var pages: PageReadStore = _
  private var readers: Array[ColumnReader] = _ // by requested index
  private var fillers: Array[ColumnarCommitReader.Filler] = _ // by slot
  private var maxDef: Array[Int] = _
  private var rowsLeftInGroup = 0L

  private def advanceRowGroup(): Boolean = {
    if (reader == null) return false
    if (requested.getFieldCount == 0) {
      // count-only scans (or a file lacking every projected column):
      // row counts come from the (stats-filtered) block metadata — no
      // pages are read at all
      pages = reader.readNextRowGroup()
      if (pages == null) return false
      rowsLeftInGroup = pages.getRowCount
      return rowsLeftInGroup > 0 || advanceRowGroup()
    }
    pages = reader.readNextRowGroup()
    if (pages == null) return false
    rowsLeftInGroup = pages.getRowCount
    if (rowsLeftInGroup == 0) return advanceRowGroup()
    val store = new ColumnReadStoreImpl(pages,
      ColumnarCommitReader.NoopConverter, requested, createdBy)
    val cols = requested.getColumns
    readers = Array.tabulate(cols.size())(i =>
      store.getColumnReader(cols.get(i)))
    maxDef = Array.tabulate(cols.size())(i =>
      cols.get(i).getMaxDefinitionLevel)
    fillers = Array.tabulate(schema.length) { slot =>
      val req = slotToReq(slot)
      if (req < 0) null
      else ColumnarCommitReader.fillerFor(
        requested.getType(req).asPrimitiveType(), schema(slot).dataType)
    }
    true
  }

  override def next(): Boolean = {
    if (skipFile) return false
    while (rowsLeftInGroup == 0) if (!advanceRowGroup()) return false
    val n = math.min(rowsLeftInGroup, CommitLogColumnar.BatchRows.toLong).toInt
    var slot = 0
    while (slot < schema.length) {
      val v = vectors(slot)
      v.reset()
      val req = slotToReq(slot)
      if (req < 0) fillAbsent(slot, v, n)
      else fillers(slot).fill(readers(req), v, n, maxDef(req))
      slot += 1
    }
    rowsLeftInGroup -= n
    batch.setNumRows(n)
    true
  }

  /** A projected column this file lacks: the partition CONSTANT when one
    * is supplied (the change feed's tag/version columns), NULL otherwise
    * (older schema generation). */
  private def fillAbsent(slot: Int, v: OnHeapColumnVector, n: Int): Unit =
    constants.get(schema(slot).name) match {
      case None => v.putNulls(0, n)
      case Some(c) => schema(slot).dataType match {
        case StringType =>
          val b = c.getBytes("UTF-8")
          var i = 0
          while (i < n) { v.putByteArray(i, b, 0, b.length); i += 1 }
        case LongType => v.putLongs(0, n, c.toLong)
        case IntegerType => v.putInts(0, n, c.toInt)
        case other => throw new UnsupportedOperationException(
          s"graft-commitlog columnar reader: unsupported constant " +
            s"column type $other for ${schema(slot).name}")
      }
    }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    batch.close()
    if (reader != null) reader.close()
  }

}

object ColumnarCommitReader {

  /** One filler per (file primitive, declared type) pair, filling a WHOLE
    * batch per virtual call: the inner loops are monomorphic (a single
    * `ColumnReaderImpl` implementation loads, so the triplet accessors
    * devirtualize), unlike a per-value closure dispatch which goes
    * megamorphic across the scan's columns. This is the hot path of every
    * query through the connector. */
  private[sources] sealed abstract class Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
      maxDef: Int): Unit
  }

  private final class LongFiller(scale: Int) extends Filler {
    // scale: 0 = as-is, 1 = millis→micros (*1000), -1 = nanos→micros (/1000)
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) {
          val x = cr.getLong
          v.putLong(i,
            if (scale == 0) x else if (scale > 0) x * 1000L else x / 1000L)
        } else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class LongAsIntFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putInt(i, cr.getLong.toInt)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class LongAsDoubleFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putDouble(i, cr.getLong.toDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class IntFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putInt(i, cr.getInteger)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class IntAsLongFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putLong(i, cr.getInteger.toLong)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class IntAsShortFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putShort(i, cr.getInteger.toShort)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class IntAsByteFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putByte(i, cr.getInteger.toByte)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class IntAsDoubleFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putDouble(i, cr.getInteger.toDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class DoubleFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putDouble(i, cr.getDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class DoubleAsFloatFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putFloat(i, cr.getDouble.toFloat)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class FloatFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putFloat(i, cr.getFloat)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class FloatAsDoubleFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putDouble(i, cr.getFloat.toDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class BooleanFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putBoolean(i, cr.getBoolean)
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class BinaryFiller extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) {
          val b = cr.getBinary.getBytes
          v.putByteArray(i, b, 0, b.length)
        } else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private final class Int96Filler extends Filler {
    def fill(cr: ColumnReader, v: OnHeapColumnVector, n: Int,
        maxDef: Int): Unit = {
      var i = 0
      while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putLong(i, int96Micros(cr.getBinary.getBytes))
        else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  /** The (file primitive, declared Spark type) decode matrix — the
    * columnar mirror of `GroupRowReader.coerce`. Selected once per row
    * group per column. */
  private[sources] def fillerFor(t: PrimitiveType, target: DataType)
      : Filler = {
    import PrimitiveType.PrimitiveTypeName._
    def unsupported(): Nothing = throw new UnsupportedOperationException(
      s"graft-commitlog columnar reader: cannot deliver parquet " +
        s"${t.getPrimitiveTypeName} as $target for field ${t.getName}")
    t.getPrimitiveTypeName match {
      case INT64 => target match {
        case LongType => new LongFiller(0)
        case TimestampType => new LongFiller(timestampScale(t))
        case IntegerType => new LongAsIntFiller
        case DoubleType => new LongAsDoubleFiller
        case _ => unsupported()
      }
      case INT32 => target match {
        case IntegerType | DateType => new IntFiller
        case LongType => new IntAsLongFiller
        case ShortType => new IntAsShortFiller
        case ByteType => new IntAsByteFiller
        case DoubleType => new IntAsDoubleFiller
        case _ => unsupported()
      }
      case DOUBLE => target match {
        case DoubleType => new DoubleFiller
        case FloatType => new DoubleAsFloatFiller
        case _ => unsupported()
      }
      case FLOAT => target match {
        case FloatType => new FloatFiller
        case DoubleType => new FloatAsDoubleFiller
        case _ => unsupported()
      }
      case BOOLEAN => target match {
        case BooleanType => new BooleanFiller
        case _ => unsupported()
      }
      case BINARY | FIXED_LEN_BYTE_ARRAY => target match {
        case StringType | BinaryType => new BinaryFiller
        case _ => unsupported()
      }
      case INT96 => target match {
        case TimestampType => new Int96Filler
        case _ => unsupported()
      }
      case _ => unsupported()
    }
  }

  /** INT64 timestamp unit scale to micros, from the logical annotation:
    * 1 = millis (*1000), 0 = micros / unannotated (as-is), -1 = nanos. */
  private def timestampScale(t: PrimitiveType): Int =
    t.getLogicalTypeAnnotation match {
      case ts: TimestampLogicalTypeAnnotation => ts.getUnit match {
        case LogicalTypeAnnotation.TimeUnit.MILLIS => 1
        case LogicalTypeAnnotation.TimeUnit.MICROS => 0
        case LogicalTypeAnnotation.TimeUnit.NANOS => -1
      }
      case _ => 0
    }

  /** ColumnReadStoreImpl requires a converter tree, but the triplet
    * accessors (getLong/getBinary/…) never call it — a no-op satisfies
    * the constructor. */
  private[sources] object NoopConverter extends GroupConverter {
    private val prim = new PrimitiveConverter {}
    override def getConverter(fieldIndex: Int): Converter = prim
    override def start(): Unit = ()
    override def end(): Unit = ()
  }

  /** 12-byte INT96: nanos-of-day (LE long) + julian day (LE int). */
  private[sources] def int96Micros(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }
}

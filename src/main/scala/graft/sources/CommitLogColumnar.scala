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
    * vector writers cover, or an ARRAY of a numeric primitive (round-12
    * verdict task 8 — an `array<float>` embeddings corpus is exactly the
    * nested case this engine's ANN surface serves; the repetition-level
    * triplet decode fills Spark's array vectors directly). Deeper
    * nesting (structs, arrays of arrays/strings, maps) keeps the row
    * path. */
  def supports(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
          FloatType | BooleanType | StringType | BinaryType |
          TimestampType | DateType => true
      case ArrayType(LongType | IntegerType | DoubleType | FloatType, _) =>
        true
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

  /** Fast-path decode kind per REQUESTED field (−1 = triplet fallback),
    * decided once per file from the footer: the (file primitive,
    * declared type) pair must be an identity decode the bulk path
    * covers AND every row group's encodings for that column must be in
    * the PLAIN/RLE/dictionary family (anything exotic — the DELTA
    * family, BYTE_STREAM_SPLIT — takes the triplet path, correct just
    * slower). */
  private val fastKind: Array[Int] =
    if (reader == null) Array.empty
    else {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala
      Array.tabulate(requested.getFieldCount) { i =>
        val desc = requested.getColumns.get(i)
        val path = org.apache.parquet.hadoop.metadata.ColumnPath
          .get(desc.getPath: _*)
        val slot = slotToReq.indexOf(i)
        // group fields (array<primitive>) decode through the repetition-
        // aware triplet slot, never the flat bulk path
        val kind =
          if (!requested.getType(i).isPrimitive) -1
          else FastColumns.kindOf(
            requested.getType(i).asPrimitiveType(), schema(slot).dataType)
        val encOk = blocks.forall(_.getColumns.asScala
          .filter(_.getPath == path)
          .forall(c => FastColumns.encodingsOk(c.getEncodings)))
        if (kind >= 0 && encOk) kind else -1
      }
    }

  /** Column provably null-free across EVERY row group (footer num_nulls
    * stats): the fast reader then skips the per-value definition-level
    * decode entirely — on a no-null corpus that is half the per-value
    * work, and PLAIN fixed-width pages degenerate to pure bulk copies. */
  private val noNulls: Array[Boolean] =
    if (reader == null) Array.empty
    else {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala
      Array.tabulate(requested.getFieldCount) { i =>
        val path = org.apache.parquet.hadoop.metadata.ColumnPath
          .get(requested.getColumns.get(i).getPath: _*)
        blocks.forall(_.getColumns.asScala
          .filter(_.getPath == path)
          .forall { c =>
            val st = c.getStatistics
            st != null && st.isNumNullsSet && st.getNumNulls == 0L
          })
      }
    }

  // per-row-group streaming state
  private var pages: PageReadStore = _
  private var slotReaders: Array[SlotReader] = _ // by slot, null = absent
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
    val cols = requested.getColumns
    // ONE reader per column per row group — fast (page-level bulk) or
    // triplet (ColumnReadStoreImpl), never both: the page reader is a
    // stateful stream, so the store is built only if some column needs it
    val needTriplet = (0 until schema.length).exists { slot =>
      val req = slotToReq(slot)
      req >= 0 && (fastKind(req) < 0 ||
        schema(slot).dataType.isInstanceOf[ArrayType])
    }
    val store =
      if (!needTriplet) null
      else new ColumnReadStoreImpl(pages,
        ColumnarCommitReader.noopTree(requested)
          .asInstanceOf[GroupConverter],
        requested, createdBy)
    slotReaders = Array.tabulate(schema.length) { slot =>
      val req = slotToReq(slot)
      if (req < 0) null
      else schema(slot).dataType match {
        case ArrayType(elem, _) =>
          new ArrayTripletSlot(store.getColumnReader(cols.get(req)),
            cols.get(req), requested.getType(req), elem)
        case _ =>
          val prim = requested.getType(req).asPrimitiveType()
          if (fastKind(req) >= 0)
            new FastColumnReader(cols.get(req),
              pages.getPageReader(cols.get(req)), fastKind(req),
              if (schema(slot).dataType == TimestampType)
                ColumnarCommitReader.timestampScale(prim)
              else 0,
              noNulls(req))
          else new TripletSlot(store.getColumnReader(cols.get(req)),
            ColumnarCommitReader.fillerFor(prim, schema(slot).dataType),
            cols.get(req).getMaxDefinitionLevel)
      }
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
      // count-only row groups (requested field count 0) never build
      // slotReaders — every slot is absent/constant there
      val r = if (slotReaders == null) null else slotReaders(slot)
      if (r == null) fillAbsent(slot, v, n)
      else r.read(v, n)
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
  private[sources] def timestampScale(t: PrimitiveType): Int =
    t.getLogicalTypeAnnotation match {
      case ts: TimestampLogicalTypeAnnotation => ts.getUnit match {
        case LogicalTypeAnnotation.TimeUnit.MILLIS => 1
        case LogicalTypeAnnotation.TimeUnit.MICROS => 0
        case LogicalTypeAnnotation.TimeUnit.NANOS => -1
      }
      case _ => 0
    }

  /** ColumnReadStoreImpl requires a converter tree MATCHING the schema's
    * shape (it descends group converters along each column's path), but
    * the triplet accessors (getLong/getBinary/…) never call into it — a
    * recursive no-op satisfies both the constructor and the descent for
    * nested (array) columns. */
  private[sources] def noopTree(
      t: org.apache.parquet.schema.Type): Converter =
    if (t.isPrimitive) new PrimitiveConverter {}
    else {
      import scala.jdk.CollectionConverters._
      val kids = t.asGroupType().getFields.asScala.map(noopTree).toArray
      new GroupConverter {
        override def getConverter(fieldIndex: Int): Converter =
          kids(fieldIndex)
        override def start(): Unit = ()
        override def end(): Unit = ()
      }
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

/** One column's per-batch decoder — fast (page-level bulk) or triplet
  * (parquet-mr `ColumnReader`) — filling vector rows [0, n). */
private[sources] sealed trait SlotReader {
  def read(v: OnHeapColumnVector, n: Int): Unit
}

private[sources] final class TripletSlot(cr: ColumnReader,
    f: ColumnarCommitReader.Filler, maxDef: Int) extends SlotReader {
  def read(v: OnHeapColumnVector, n: Int): Unit = f.fill(cr, v, n, maxDef)
}

/** ARRAY<primitive> decode through the triplet readers (round-12 verdict
  * task 8): repetition levels assemble each top-level row's element run
  * directly into the Spark array vector's child — offsets + child values,
  * no Group materialization, no per-element boxing beyond the triplet
  * API's own accessors. Handles the standard 3-level LIST shape (what
  * Spark's writer emits, element optional or required) and the legacy
  * 2-level repeated primitive:
  *
  *  - def == maxDef          → present element
  *  - def == maxDef−1        → NULL element (only when the element is
  *                             optional)
  *  - def == elemBase−1      → empty array
  *  - anything lower         → NULL array
  *
  * where elemBase = maxDef − (element optional ? 1 : 0). Row boundaries
  * come from repetition levels: a triplet with rep 0 starts a new row. */
private[sources] final class ArrayTripletSlot(cr: ColumnReader,
    desc: org.apache.parquet.column.ColumnDescriptor,
    fieldType: org.apache.parquet.schema.Type,
    elem: DataType) extends SlotReader {

  private val maxDef = desc.getMaxDefinitionLevel
  private val maxRep = desc.getMaxRepetitionLevel
  require(maxRep == 1,
    s"graft-commitlog columnar reader: ${desc} is not a flat list " +
      s"(maxRep=$maxRep)")

  /** Element optionality, from the requested type tree: 3-level LIST =
    * group(field) → repeated group(list) → element; 2-level legacy =
    * repeated primitive (never optional). */
  private val elementOptional: Boolean =
    if (fieldType.isPrimitive) false
    else {
      val inner = fieldType.asGroupType().getType(0)
      if (inner.isPrimitive)
        inner.getRepetition ==
          org.apache.parquet.schema.Type.Repetition.OPTIONAL
      else inner.asGroupType().getType(0).getRepetition ==
        org.apache.parquet.schema.Type.Repetition.OPTIONAL
    }

  private val elemBase = maxDef - (if (elementOptional) 1 else 0)
  private val total = cr.getTotalValueCount
  private var consumed = 0L

  // one element decode per declared element type; file/declared identity
  // is guaranteed by the engine's no-type-change rule
  private def putElem(child: org.apache.spark.sql.execution.vectorized
      .WritableColumnVector, at: Int): Unit = elem match {
    case LongType => child.putLong(at, cr.getLong)
    case IntegerType => child.putInt(at, cr.getInteger)
    case DoubleType => child.putDouble(at, cr.getDouble)
    case FloatType => child.putFloat(at, cr.getFloat)
    case other => throw new UnsupportedOperationException(
      s"graft-commitlog columnar reader: array element type $other")
  }

  override def read(v: OnHeapColumnVector, n: Int): Unit = {
    val child = v.getChild(0)
      .asInstanceOf[org.apache.spark.sql.execution.vectorized
        .WritableColumnVector]
    var childOff = 0
    var row = 0
    while (row < n) {
      val d = cr.getCurrentDefinitionLevel
      if (d < elemBase) {
        // a single triplet describes the whole row: empty or null list
        if (d == elemBase - 1) v.putArray(row, childOff, 0)
        else v.putNull(row)
        cr.consume(); consumed += 1
      } else {
        val start = childOff
        var more = true
        while (more) {
          child.reserve(childOff + 1)
          if (cr.getCurrentDefinitionLevel == maxDef) putElem(child, childOff)
          else child.putNull(childOff)
          childOff += 1
          cr.consume(); consumed += 1
          more = consumed < total && cr.getCurrentRepetitionLevel == maxRep
        }
        v.putArray(row, start, childOff - start)
      }
      row += 1
    }
  }
}

/** Fast-path eligibility: the identity decode kinds the page-level bulk
  * reader covers, and the encoding families it understands. */
private[sources] object FastColumns {
  import PrimitiveType.PrimitiveTypeName._

  final val KLong = 0
  final val KInt = 1
  final val KDouble = 2
  final val KFloat = 3
  final val KBinary = 4

  /** Identity (file primitive → declared type) decode kinds only —
    * coercions (schema evolution's LongAsInt etc.) stay on the triplet
    * path; they are the rare generation-skew case, not the hot scan. */
  def kindOf(t: PrimitiveType, target: DataType): Int =
    t.getPrimitiveTypeName match {
      case INT64 => target match {
        case LongType | TimestampType => KLong
        case _ => -1
      }
      case INT32 => target match {
        case IntegerType | DateType => KInt
        case _ => -1
      }
      case DOUBLE => target match {
        case DoubleType => KDouble
        case _ => -1
      }
      case FLOAT => target match {
        case FloatType => KFloat
        case _ => -1
      }
      case BINARY => target match {
        case StringType | BinaryType => KBinary
        case _ => -1
      }
      case _ => -1
    }

  private val okEnc: Set[org.apache.parquet.column.Encoding] = Set(
    org.apache.parquet.column.Encoding.PLAIN,
    org.apache.parquet.column.Encoding.RLE,
    org.apache.parquet.column.Encoding.BIT_PACKED,
    org.apache.parquet.column.Encoding.RLE_DICTIONARY,
    org.apache.parquet.column.Encoding.PLAIN_DICTIONARY)

  def encodingsOk(
      encs: java.util.Set[org.apache.parquet.column.Encoding]): Boolean = {
    import scala.jdk.CollectionConverters._
    encs.asScala.forall(okEnc.contains)
  }
}

/** PAGE-LEVEL bulk decode of one column chunk — the round-12 answer to
  * the measured NARROW-projection tax (ScanBench: 2.15×/2.27× at sf1/sf10
  * through the triplet readers, whose ~4 virtual calls PER VALUE —
  * getCurrentDefinitionLevel/getX/consume — are the per-value floor of
  * that API). Public parquet-mr page APIs only:
  *
  *  - definition levels decode through the page's own level reader
  *    (`Encoding.getValuesReader` for V1 sections,
  *    `RunLengthBitPackingHybridDecoder` for V2's raw RLE) into a batch
  *    array, then PRESENT/NULL RUNS are filled in bulk;
  *  - PLAIN fixed-width runs are ONE `putLongsLittleEndian`-family copy
  *    from the page bytes straight into the Spark vector (the native
  *    vectorized reader's trick, on the public surface);
  *  - dictionary pages materialize the dictionary ONCE per chunk (any
  *    timestamp unit scale folded into the entries) and ids stream
  *    through the RLE decoder — the "dictionary-id decode" the round-11
  *    verdict asked for, strings included.
  *
  * Anything the footer says this column does not fit (exotic encodings,
  * non-identity coercions, INT96, BOOLEAN) takes the existing triplet
  * path — the fast path is a pure speedup, never a semantic fork. */
private[sources] final class FastColumnReader(
    desc: org.apache.parquet.column.ColumnDescriptor,
    pageReader: org.apache.parquet.column.page.PageReader,
    kind: Int, tsScale: Int, noNulls: Boolean = false) extends SlotReader {

  import FastColumns._
  import org.apache.parquet.column.Encoding
  import org.apache.parquet.column.page.{DataPageV1, DataPageV2}
  import org.apache.parquet.column.values.rle.RunLengthBitPackingHybridDecoder
  import org.apache.parquet.bytes.{ByteBufferInputStream, BytesUtils}

  private val maxDef = desc.getMaxDefinitionLevel

  private def scaled(x: Long): Long =
    if (tsScale == 0) x else if (tsScale > 0) x * 1000L else x / 1000L

  // dictionary materialized once per chunk, scale folded in
  private var dictLongs: Array[Long] = _
  private var dictInts: Array[Int] = _
  private var dictDoubles: Array[Double] = _
  private var dictFloats: Array[Float] = _
  private var dictBins: Array[Array[Byte]] = _
  locally {
    val dp = pageReader.readDictionaryPage()
    if (dp != null) {
      val d = dp.getEncoding.initDictionary(desc, dp)
      val n = d.getMaxId + 1
      kind match {
        case KLong =>
          dictLongs = Array.tabulate(n)(i => scaled(d.decodeToLong(i)))
        case KInt => dictInts = Array.tabulate(n)(d.decodeToInt)
        case KDouble => dictDoubles = Array.tabulate(n)(d.decodeToDouble)
        case KFloat => dictFloats = Array.tabulate(n)(d.decodeToFloat)
        case KBinary =>
          dictBins = Array.tabulate(n)(i => d.decodeToBinary(i).getBytes)
      }
    }
  }

  // per-page state
  private var defRead: () => Int = _ // null when the column is required
  private var ids: RunLengthBitPackingHybridDecoder = _ // dictionary pages
  private var bytes: Array[Byte] = _ // PLAIN pages
  private var bb: java.nio.ByteBuffer = _ // LE view of `bytes`
  private var off = 0
  private var left = 0
  private val defs = new Array[Int](CommitLogColumnar.BatchRows)

  private def advancePage(): Unit = {
    val p = pageReader.readPage()
    if (p == null) throw new IllegalStateException(
      s"graft-commitlog fast reader: page stream of ${desc} exhausted " +
        "mid-row-group")
    p match {
      case p1: DataPageV1 =>
        val vc = p1.getValueCount
        val arr = p1.getBytes.toByteArray
        val in = ByteBufferInputStream.wrap(java.nio.ByteBuffer.wrap(arr))
        // level sections consume through their own encodings' readers —
        // the stream position after both IS the values offset
        val rl = p1.getRlEncoding.getValuesReader(desc,
          org.apache.parquet.column.ValuesType.REPETITION_LEVEL)
        rl.initFromPage(vc, in)
        val dl = p1.getDlEncoding.getValuesReader(desc,
          org.apache.parquet.column.ValuesType.DEFINITION_LEVEL)
        dl.initFromPage(vc, in)
        defRead = if (maxDef == 0) null else () => dl.readInteger()
        setValues(arr, in.position().toInt, p1.getValueEncoding)
        left = vc
      case p2: DataPageV2 =>
        val vc = p2.getValueCount
        defRead =
          if (maxDef == 0) null
          else {
            val d = new RunLengthBitPackingHybridDecoder(
              BytesUtils.getWidthFromMaxInt(maxDef),
              p2.getDefinitionLevels.toInputStream)
            () => d.readInt()
          }
        setValues(p2.getData.toByteArray, 0, p2.getDataEncoding)
        left = vc
      case other => throw new IllegalStateException(
        s"graft-commitlog fast reader: unexpected page type $other")
    }
  }

  private def setValues(arr: Array[Byte], start: Int,
      enc: Encoding): Unit =
    if (enc.usesDictionary) {
      ids = new RunLengthBitPackingHybridDecoder(arr(start) & 0xff,
        new java.io.ByteArrayInputStream(arr, start + 1,
          arr.length - start - 1))
      bytes = null; bb = null
    } else if (enc == Encoding.PLAIN) {
      bytes = arr; off = start; ids = null
      bb = java.nio.ByteBuffer.wrap(arr)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    } else throw new IllegalStateException(
      s"graft-commitlog fast reader: page encoding $enc slipped past " +
        "the footer eligibility check")

  override def read(v: OnHeapColumnVector, n: Int): Unit = {
    var filled = 0
    while (filled < n) {
      if (left == 0) advancePage()
      val m = math.min(n - filled, left)
      // a required column, or one the footer proves null-free: every
      // triplet is present — no definition levels to consult (their page
      // section, when any, was already skipped by the values-offset setup)
      if (maxDef == 0 || noNulls) fillRun(v, filled, m)
      else {
        var i = 0
        while (i < m) { defs(i) = defRead(); i += 1 }
        var s = 0
        while (s < m) {
          var e = s
          if (defs(s) == maxDef) {
            while (e < m && defs(e) == maxDef) e += 1
            fillRun(v, filled + s, e - s)
          } else {
            while (e < m && defs(e) != maxDef) e += 1
            v.putNulls(filled + s, e - s)
          }
          s = e
        }
      }
      left -= m
      filled += m
    }
  }

  /** `cnt` PRESENT values into vector rows [at, at+cnt). */
  private def fillRun(v: OnHeapColumnVector, at: Int, cnt: Int): Unit =
    if (ids != null) {
      var i = 0
      kind match {
        case KLong =>
          while (i < cnt) { v.putLong(at + i, dictLongs(ids.readInt()))
            i += 1 }
        case KInt =>
          while (i < cnt) { v.putInt(at + i, dictInts(ids.readInt()))
            i += 1 }
        case KDouble =>
          while (i < cnt) { v.putDouble(at + i, dictDoubles(ids.readInt()))
            i += 1 }
        case KFloat =>
          while (i < cnt) { v.putFloat(at + i, dictFloats(ids.readInt()))
            i += 1 }
        case KBinary =>
          while (i < cnt) {
            val b = dictBins(ids.readInt())
            v.putByteArray(at + i, b, 0, b.length)
            i += 1
          }
      }
    } else kind match {
      case KLong =>
        if (tsScale == 0) v.putLongsLittleEndian(at, cnt, bytes, off)
        else {
          var i = 0
          while (i < cnt) {
            v.putLong(at + i, scaled(bb.getLong(off + 8 * i))); i += 1
          }
        }
        off += 8 * cnt
      case KInt =>
        v.putIntsLittleEndian(at, cnt, bytes, off); off += 4 * cnt
      case KDouble =>
        v.putDoublesLittleEndian(at, cnt, bytes, off); off += 8 * cnt
      case KFloat =>
        v.putFloatsLittleEndian(at, cnt, bytes, off); off += 4 * cnt
      case KBinary =>
        var i = 0
        while (i < cnt) {
          val len = bb.getInt(off)
          v.putByteArray(at + i, bytes, off + 4, len)
          off += 4 + len; i += 1
        }
    }
}

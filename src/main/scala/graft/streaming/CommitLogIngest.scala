package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.LayoutDirs

/** Streaming ingest INTO the commit-log table format (the write-path
  * companion of `sources/TimeTravel`): each micro-batch lands as ONE
  * table version — the batch's rows are written to a fresh immutable
  * file set, then add-actions for those files are committed as the log
  * partition `log/version=N`. Readers compose unchanged: "the table at
  * version V" is the log's last-action-wins path set, so a reader
  * pinned at V is isolated from every later commit, and the latest
  * snapshot is always a consistent prefix of the stream — the
  * lakehouse contract a 100-TB pipeline lands raw data under.
  *
  * Replay safety (at-least-once foreachBatch): the LOG is the source of
  * truth, not the marker. A replayed batch first checks its log
  * partition — if the version is already committed, only the fast-path
  * marker is repaired; if not, the data dir is rewritten (clobbering any
  * partial files a crash left, which nothing references yet) and the
  * log partition written. VISIBILITY is the log write's job-commit
  * rename: `LayoutDirs.hasParquetData` counts only committed files
  * (staging part files under `_temporary` are excluded at every depth),
  * so neither a crash-replay nor a concurrent offset poll can mistake an
  * in-flight version for a committed one. On a real object store the
  * per-version log commit needs put-if-absent (the Delta
  * `_delta_log/N.json` contention rule); a local filesystem test gets
  * atomicity from the single writer.
  *
  * Log CHECKPOINTING (the Delta `checkpoint.parquet` shape): a log that
  * grows one partition per commit makes every snapshot read O(commits).
  * Every [[CheckpointEvery]] versions the RESOLVED live set (path +
  * its add version) is written to `log_ckpt/c=N` — resolved from the
  * PREVIOUS checkpoint plus the tail, never by re-replaying the full
  * log, so checkpointing keeps working after retention has deleted old
  * log partitions. Snapshot reads at or above a checkpoint replay
  * checkpoint + direct-addressed tail only; log partitions at or below
  * it are deletable retention (time travel below the checkpoint is the
  * price), and `StreamingCommitSpec` proves the latest snapshot survives
  * exactly that deletion. */
object CommitLogIngest {

  /** Checkpoint after versions CheckpointEvery−1, 2·CheckpointEvery−1, … */
  val CheckpointEvery = 10L

  private def markerPath(dir: String) = Paths.get(dir, "_last_batch")
  private def ckptMarkerPath(dir: String) = Paths.get(dir, "_last_ckpt")
  private def schemaMarkerPath(dir: String) = Paths.get(dir, "_schema")

  private[graft] def lastCommitted(dir: String): Long =
    try new String(Files.readAllBytes(markerPath(dir)), "UTF-8").trim.toLong
    catch { case _: Exception => -1L }

  private[graft] def lastCheckpoint(dir: String): Long =
    try new String(Files.readAllBytes(ckptMarkerPath(dir)), "UTF-8")
      .trim.toLong
    catch { case _: Exception => -1L }

  private def writeMarker(path: java.nio.file.Path, v: Long): Unit = {
    Files.createDirectories(path.getParent)
    Files.write(path, v.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  // ---- schema as a log action ---------------------------------------------

  /** The last schema json a commit recorded (fast path for the per-commit
    * "did the schema change?" test — the LOG rows are the source of
    * truth; the marker only saves a log resolve per trigger). */
  private def lastSchemaJson(dir: String): Option[String] =
    try {
      val s = new String(
        Files.readAllBytes(schemaMarkerPath(dir)), "UTF-8")
      if (s.isEmpty) None else Some(s)
    } catch { case _: Exception => None }

  private def writeSchemaMarker(dir: String, json: String): Unit = {
    val p = schemaMarkerPath(dir)
    Files.createDirectories(p.getParent)
    Files.write(p, json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** CREATE TABLE: declare the schema of a not-yet-written table by
    * recording the schema marker, so the DSv2 provider can infer it and a
    * writer (`df.write.format("graft-commitlog")`) or reader can start
    * before the first commit — the lakehouse create-then-insert shape. The
    * first data commit whose schema matches records no redundant schema
    * action (latest-wins either way). `partitionBy` declares the table's
    * partition columns (see [[recordPartitionCols]]); with it,
    * `df.write...partitionBy(cols)` matches the table's declared
    * partitioning and lands hive-laid-out files. */
  def createTable(tableDir: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    require(latestVersion(tableDir) < 0,
      s"$tableDir already has committed versions — createTable is for " +
        "empty tables (schema changes ride data commits)")
    writeSchemaMarker(tableDir, schema.json)
    if (partitionBy.nonEmpty) {
      val missing = partitionBy.filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"createTable: partition column(s) ${missing.mkString(", ")} " +
          "not in the declared schema")
      recordPartitionCols(tableDir, partitionBy)
    }
  }

  // ---- partitioned layout ---------------------------------------------------

  private def partitionColsPath(dir: String) =
    Paths.get(dir, "_partition_cols")

  /** The table's declared partition columns (empty = unpartitioned).
    * Partition columns stay IN the data files (unlike hive/Delta's
    * stripped layout) — the hive-style `col=value` dirs are a PRUNING
    * layout, never a correctness dependency, so snapshot/changes reads
    * compose unchanged and a legacy flat file in a partitioned table is
    * merely unprunable, not unreadable. */
  def partitionColsOf(tableDir: String): Seq[String] =
    try {
      val s = new String(
        Files.readAllBytes(partitionColsPath(tableDir)), "UTF-8").trim
      if (s.isEmpty) Seq.empty else s.split(",").toSeq
    } catch { case _: Exception => Seq.empty }

  /** One partitioning per table, forever (the statsCol rule): files from
    * a different layout would silently stop dir-pruning and a reader has
    * no way to notice — refuse the switch before any commit work. */
  private[graft] def recordPartitionCols(tableDir: String,
      cols: Seq[String]): Unit = {
    val existing = partitionColsOf(tableDir)
    require(existing.isEmpty || existing == cols,
      s"$tableDir is partitioned by (${existing.mkString(", ")}) — " +
        s"writing with partitioning (${cols.mkString(", ")}) would mix " +
        "layouts; rebuild the table to repartition it")
    if (existing.isEmpty) {
      val p = partitionColsPath(tableDir)
      Files.createDirectories(p.getParent)
      Files.write(p, cols.mkString(",").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
    }
  }

  /** The schema the table currently declares (marker fast path), for
    * provider inference on a created-but-empty table. */
  private[graft] def declaredSchema(tableDir: String)
      : Option[org.apache.spark.sql.types.StructType] =
    lastSchemaJson(tableDir).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** The ("schema", json) action to include in a commit when `batchSchema`
    * differs from the last recorded one — schema evolution RIDES the data
    * commit (the Delta metadata-action shape), so "the schema as of
    * version V" is answerable for every V and a mid-stream column add
    * needs no out-of-band coordination. A crash between the commit and
    * the marker repair just re-records the same json at the next commit
    * (latest-wins, same value — harmless). */
  private def schemaActionFor(tableDir: String,
      batchSchema: org.apache.spark.sql.types.StructType)
      : Seq[(String, String)] = {
    // NEW unmapped columns must not collide with bytes already living in
    // files under that physical name — a re-added dropped column (or a
    // column named like a renamed-away logical) would silently read the
    // OLD column's bytes out of every pre-change file. Delta avoids this
    // with UUID physical names; this engine refuses loudly instead (the
    // rename path itself is exempt: its fields carry explicit mapping).
    declaredSchema(tableDir).foreach { cur =>
      val curLogical = cur.fieldNames.toSet
      val livePhysical = cur.fields.map(physicalName).toSet
      val dead = retiredCols(tableDir)
      val clashes = batchSchema.fields
        .filterNot(f => curLogical(f.name))
        .filterNot(_.metadata.contains(PhysicalKey))
        .map(_.name)
        .filter(n => livePhysical(n) || dead(n))
      require(clashes.isEmpty,
        s"$tableDir: new column(s) ${clashes.mkString(", ")} collide " +
          "with a physical column name already present in this table's " +
          "files (a dropped column, or the pre-rename name of a renamed " +
          "one) — old bytes would silently resurrect; use a different " +
          "name, or rebuild the table")
    }
    // caller-supplied frames never carry mapping metadata: merge the
    // declared mapping in, or an append after a RENAME would record a
    // mapping-less schema and erase the rename from the current
    // generation (withMapping is identity for unmapped tables)
    val json = withMapping(batchSchema, tableDir).json
    if (lastSchemaJson(tableDir).contains(json)) Seq.empty
    else Seq(("schema", json))
  }

  /** The declared schema AS OF `version`: the latest schema action at or
    * below it, resolved through the same checkpoint-aware replay as the
    * file actions (checkpoints carry the schema row, so resolution
    * survives log retention). None before any schema action (a pre-
    * evolution table) → snapshot falls back to file inference.
    *
    * MEMOIZED per (tableDir, version) — round 15, the Delta/Iceberg
    * snapshot-cache shape: a committed version's log slice is immutable
    * (claims are atomic, failed claims delete their staging, history is
    * append-only), so the resolved schema can never change, yet the
    * unmemoized form ran a driver collect job per call — and every
    * connector planning, DML discovery pass, and snapshot read calls
    * it. Process-local metadata only, rebuilt per session — never a
    * result cache. */
  private val schemaMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), Option[org.apache.spark.sql.types.StructType]]

  def schemaAt(spark: SparkSession, tableDir: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] = {
    if (schemaMemo.size > MetaMemoMax) schemaMemo.clear()
    schemaMemo.getOrElseUpdate((tableDir, version),
      actionRows(spark, tableDir, version)
        .filter(col("action") === "schema")
        .orderBy(col("version").desc).limit(1)
        .collect().headOption.map(r =>
          org.apache.spark.sql.types.DataType
            .fromJson(r.getAs[String]("path"))
            .asInstanceOf[org.apache.spark.sql.types.StructType]))
  }

  /** Cap on the per-(table, version) metadata memos — a long session
    * touches many temp tables; past the cap the memo just rebuilds
    * (coarse clear, never stale: entries are immutable-keyed). */
  private val MetaMemoMax = 4096

  /** Checkpoint versions present ON DISK (`log_ckpt/c=N` dirs with
    * committed data) — the marker is only the fast path; resolution
    * must see a checkpoint whose marker write crashed, and must be able
    * to pick an OLDER one (time travel below the latest checkpoint
    * stays correct after retention because checkpoints are never
    * deleted). */
  private def checkpointsOnDisk(tableDir: String): Seq[Long] = {
    val d = Paths.get(s"$tableDir/log_ckpt")
    if (!Files.exists(d)) return Seq.empty
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("c=") =>
          n.stripPrefix("c=").toLong }
        .filter(v => LayoutDirs.hasParquetData(s"$tableDir/log_ckpt/c=$v"))
        .toSeq.sorted
    } finally s.close()
  }

  /** Action rows (version, action, path) sufficient to resolve any
    * snapshot at `version`: the BEST surviving checkpoint ≤ version
    * (strictly below `ckptBelow` — a checkpoint must never resolve from
    * the very directory it is about to overwrite) + direct-addressed
    * tail when one exists (O(tail) log files — never lists or scans the
    * O(commits) history), full log replay otherwise. Using the best ≤
    * rather than only the latest keeps time travel BELOW the latest
    * checkpoint correct after retention pruned the early log. */
  private def actionRows(spark: SparkSession, tableDir: String,
      version: Long, ckptBelow: Long = Long.MaxValue): DataFrame = {
    val logDir = s"$tableDir/log"
    val c = checkpointsOnDisk(tableDir)
      .filter(v => v <= version && v < ckptBelow)
      .lastOption.getOrElse(-1L)
    if (c >= 0) {
      val ckpt = spark.read.parquet(s"$tableDir/log_ckpt/c=$c")
      // newer checkpoints carry an action column (they preserve the
      // latest schema action across retention); older ones are all adds
      val base =
        (if (ckpt.columns.contains("action")) ckpt
         else ckpt.withColumn("action", lit("add")))
          .select(col("v").cast("long").as("version"),
            col("action"), col("path"))
      val tailDirs = ((c + 1) to version)
        .map(v => s"$logDir/version=$v")
        .filter(LayoutDirs.hasParquetData) // skipped empty batches
      if (tailDirs.isEmpty) base
      else base.unionByName(
        spark.read.option("basePath", logDir).parquet(tailDirs: _*)
          .select(col("version").cast("long"), col("action"),
            col("path")))
    } else
      spark.read.parquet(logDir)
        .filter(col("version") <= version)
        .select(col("version").cast("long"), col("action"), col("path"))
  }

  /** Resolve the live set at `upTo` (checkpoint-aware — the Delta rule:
    * new checkpoint = previous checkpoint + tail, so retention of old
    * log partitions never costs live files) and persist it as
    * `log_ckpt/c=<upTo>`. Resolution is pinned to checkpoints STRICTLY
    * below `upTo`: a crash-replay of this very checkpoint must not read
    * `c=<upTo>` while overwriting it (Spark rejects the same-path
    * read-write, wedging the stream — or worse, empties the checkpoint
    * retention depends on). */
  private def writeLogCheckpoint(spark: SparkSession, tableDir: String,
      upTo: Long): Unit = {
    val rows = actionRows(spark, tableDir, upTo, ckptBelow = upTo)
    val liveAdds = rows
      // dv actions annotate a live file, they don't retire it — liveness
      // is add-vs-remove only (the liveState rule)
      .filter(col("action").isin("add", "remove"))
      .groupBy(col("path"))
      .agg(max_by(col("action"), col("version")).as("last"),
        max(col("version")).as("v"))
      .filter(col("last") === "add")
      .select(col("path"), col("v"), lit("add").as("action"))
    // deletion-vector actions for STILL-LIVE paths ride the checkpoint —
    // a mask is current table state, not history: resolution after log
    // retention must still know which dv/version=N dirs mask the live
    // set. Masks of since-rewritten paths (their file left the live set,
    // the rewrite materialized them) drop out here, bounding growth.
    val dvRows = rows.filter(col("action") === "dv")
      .select(col("path"), col("version").as("v"), lit("dv").as("action"))
      .join(liveAdds.select("path"), Seq("path"), "left_semi")
      .distinct()
    // the latest schema action rides the checkpoint, so schema-as-of
    // resolution survives retention exactly like the live file set does
    val schemaRow = rows.filter(col("action") === "schema")
      .orderBy(col("version").desc).limit(1)
      .select(col("path"), col("version").as("v"),
        lit("schema").as("action"))
    // each streaming query's LATEST ("txn", "queryId:epoch") row rides it
    // too — the exactly-once replay guard (lastTxnEpoch) must keep
    // answering after retention pruned the epoch's own log partition
    val txnRows = rows.filter(col("action") === "txn")
      .groupBy(expr("substring_index(path, ':', 1)").as("qid"))
      .agg(max_by(struct(col("path"), col("version")),
        expr("cast(substring_index(path, ':', -1) as long)")).as("m"))
      .select(col("m.path"), col("m.version").as("v"),
        lit("txn").as("action"))
    liveAdds.unionByName(schemaRow).unionByName(txnRows)
      .unionByName(dvRows)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tableDir/log_ckpt/c=$upTo")
    writeMarker(ckptMarkerPath(tableDir), upTo)
  }

  /** Commit one micro-batch as table version `batchId`, exactly once.
    * With `statsCol` set, per-file min/max/count stats over that column
    * are captured AT COMMIT TIME into `index/version=N` — the streaming
    * half of the E-123 story (the batch side is TimeTravel's index):
    * index rows are keyed by immutable path, written in the same
    * idempotence unit as the log version, so the index can never refer
    * to a version the log doesn't have. */
  private[graft] def commitOnce(batch: DataFrame, tableDir: String,
      batchId: Long, statsCol: Option[String] = None): Unit = {
    if (batchId <= lastCommitted(tableDir)) return
    requireIndexColMatch(tableDir, statsCol)
    val spark = batch.sparkSession
    val versionDir = s"$tableDir/log/version=$batchId"
    if (batch.isEmpty) {
      // EMPTY batch → a data-free TOMBSTONE version (action "empty"), not
      // a skipped version number: with every batchId materialized on disk,
      // a missing version dir always means retention — `changes` can fail
      // loudly on a pruned range instead of mistaking it for an idle
      // trigger (readers ignore any action other than add/remove).
      if (!LayoutDirs.hasParquetData(versionDir)) {
        import spark.implicits._
        Seq(("empty", "")).toDF("action", "path")
          .coalesce(1).write.mode("overwrite").parquet(versionDir)
      }
    } else if (!LayoutDirs.hasParquetData(versionDir)) {
      val dataDir = s"$tableDir/data/b$batchId"
      toPhysical(batch, tableDir).write.mode("overwrite").parquet(dataDir)
      statsCol.foreach(k => writeIndexRows(spark, tableDir, dataDir, k,
        batchId))
      import spark.implicits._
      // the mapping-merged json BEFORE the marker overwrite, used for both
      val mergedJson = withMapping(batch.schema, tableDir).json
      (LayoutDirs.dataFiles(dataDir).map(("add", _)) ++
        schemaActionFor(tableDir, batch.schema))
        .toDF("action", "path")
        .coalesce(1).write.mode("overwrite").parquet(versionDir)
      writeSchemaMarker(tableDir, mergedJson)
    }
    // the marker guard makes a crash-replay of a completed checkpoint a
    // no-op instead of a second resolve-and-overwrite of the same dir
    if ((batchId + 1) % CheckpointEvery == 0 &&
        lastCheckpoint(tableDir) < batchId)
      writeLogCheckpoint(spark, tableDir, batchId)
    writeMarker(markerPath(tableDir), batchId)
  }

  /** The stats-indexed column's name, recorded beside the index so a
    * READER (the DSv2 scan's file-skipping path) can recognize which
    * pushed filters the index can prune with — without it the index is
    * anonymous min/max rows. Underscore-prefixed → invisible to every
    * parquet listing. */
  private def indexColPath(dir: String) = Paths.get(dir, "index", "_col")

  /** One stats column per table, forever: index rows from earlier commits
    * carry the OLD column's min/max, and a reader pruning "n_chars"
    * bounds against "doc_id" stats would silently drop files whose rows
    * match — refuse the switch BEFORE any commit work instead of
    * poisoning the index (every statsCol-taking entry point calls this
    * first; [[recordIndexCol]] keeps it as a post-claim backstop). */
  private def requireIndexColMatch(tableDir: String,
      statsCol: Option[String]): Unit =
    for (k <- statsCol; existing <- indexedCol(tableDir))
      require(existing == k,
        s"$tableDir is stats-indexed on '$existing' — committing with " +
          s"statsCol '$k' would mix incomparable index rows; rebuild the " +
          s"table (or keep indexing '$existing') instead")

  private[graft] def recordIndexCol(tableDir: String, k: String): Unit = {
    requireIndexColMatch(tableDir, Some(k))
    val p = indexColPath(tableDir)
    Files.createDirectories(p.getParent)
    Files.write(p, k.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  private[graft] def indexedCol(tableDir: String): Option[String] =
    try {
      val s = new String(
        Files.readAllBytes(indexColPath(tableDir)), "UTF-8").trim
      if (s.isEmpty) None else Some(s)
    } catch { case _: Exception => None }

  // ---- column mapping (rename/drop through the log) ------------------------

  /** StructField metadata key carrying a column's PHYSICAL name — the
    * immutable name under which every data file stores it (the Delta
    * `delta.columnMapping.mode=name` shape, round-12 verdict task 4).
    * Logical names are what users see and rename; physical names never
    * change, so RENAME is one metadata commit and no file rewrites — at
    * 100 TB the difference between "rename" and "never rename". A field
    * without the key is unmapped: physical = logical (every pre-mapping
    * table, and every column never renamed — the zero-cost common case). */
  private[graft] val PhysicalKey = "graft.physicalName"

  private[graft] def physicalName(
      f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** logical → physical, ONLY where they differ (empty for unmapped
    * tables — every caller's fast path). */
  private[graft] def mappingOf(
      st: org.apache.spark.sql.types.StructType): Map[String, String] =
    st.fields.iterator.map(f => f.name -> physicalName(f))
      .filter(kv => kv._1 != kv._2).toMap

  /** The mapping of the table's CURRENT declared schema. */
  private[graft] def currentMapping(tableDir: String): Map[String, String] =
    declaredSchema(tableDir).map(mappingOf).getOrElse(Map.empty)

  /** `st` with every field under its PHYSICAL name (metadata kept) —
    * what the data files actually carry. */
  private[graft] def toPhysicalSchema(
      st: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      st.fields.map(f => f.copy(name = physicalName(f))))

  /** The mapping in force AT `version` (declared marker when negative) —
    * what a versioned V2 scan translates its logical schema/filters
    * through. Empty for unmapped tables and pre-mapping generations.
    * LATEST-version resolution reads the schema MARKER (one file read,
    * zero Spark jobs — the same trust [[toPhysical]] and
    * [[schemaActionFor]] already place in it; round-13 fix: the initial
    * log-replaying resolve added ~0.5 s of metadata jobs to EVERY
    * connector query's planning, visible as decode-tax inflation in
    * ScanBench); only a genuinely PINNED historical read replays the
    * log for its generation's mapping. */
  private[graft] def mappingAt(spark: SparkSession, tableDir: String,
      version: Long): Map[String, String] =
    (if (version >= 0 && version != latestVersion(tableDir))
       schemaAt(spark, tableDir, version)
     else declaredSchema(tableDir))
      .map(mappingOf).getOrElse(Map.empty)

  /** A write-side schema with mapped columns under their PHYSICAL names
    * (the V2 writer factories build parquet from it — identity for
    * unmapped tables). */
  private[graft] def physicalWriteSchema(tableDir: String,
      st: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val m = currentMapping(tableDir)
    if (m.isEmpty) st
    else org.apache.spark.sql.types.StructType(st.fields.map(f =>
      m.get(f.name).map(px => f.copy(name = px)).getOrElse(f)))
  }

  /** Rename `df`'s columns logical → physical per the table's declared
    * mapping — applied by every DATA-FILE write (appends, DML rewrites,
    * OPTIMIZE, the DSv2 writer), so files are ALWAYS physical-named
    * regardless of which logical generation wrote them. Identity (and
    * zero-cost) for unmapped tables. */
  private[graft] def toPhysical(df: DataFrame, tableDir: String): DataFrame =
    toPhysicalAs(df, currentMapping(tableDir))

  /** [[toPhysical]] under an explicit schema's mapping — for writes whose
    * governing schema is in hand (clone materialization writes under the
    * SOURCE's mapping before the destination's marker exists). */
  private def toPhysicalAs(df: DataFrame, m: Map[String, String])
      : DataFrame =
    if (m.isEmpty) df
    else df.columns.foldLeft(df)((d, c) =>
      m.get(c).map(p => d.withColumnRenamed(c, p)).getOrElse(d))

  /** Carry the declared mapping metadata onto a caller-supplied schema
    * (whose frames never carry it) so a schema action recorded by an
    * append/merge cannot ERASE the table's rename history. New columns
    * pass through unmapped (physical = logical). */
  private def withMapping(
      batch: org.apache.spark.sql.types.StructType,
      tableDir: String): org.apache.spark.sql.types.StructType = {
    val cur = declaredSchema(tableDir)
      .map(st => st.fields.map(f => f.name -> f).toMap)
      .getOrElse(Map.empty)
    org.apache.spark.sql.types.StructType(batch.fields.map { f =>
      cur.get(f.name).filter(_.metadata.contains(PhysicalKey))
        .map(prev => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(PhysicalKey, physicalName(prev)).build()))
        .getOrElse(f)
    })
  }

  /** RENAME COLUMN as ONE metadata commit (no data file touched): the
    * new logical name points at the old physical name; every earlier
    * version keeps resolving under its own generation's logical names
    * (schemaAt is versioned like everything else). Refused loudly for
    * collisions, partition columns (the hive dir layout is keyed by
    * name), and the declared stats column (pointRead's contract names
    * it). Returns the committed version. */
  def renameColumn(spark: SparkSession, tableDir: String,
      oldName: String, newName: String): Long = {
    require(newName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"renameColumn: invalid column name '$newName'")
    val st = declaredSchema(tableDir).getOrElse(
      schemaAt(spark, tableDir, latestVersion(tableDir)).getOrElse(
        throw new IllegalStateException(
          s"renameColumn: $tableDir has no declared schema — commit " +
            "once (or createTable) so there is a schema to rename in")))
    require(st.fieldNames.contains(oldName),
      s"renameColumn: no column $oldName in ${st.fieldNames.mkString(", ")}")
    require(!st.fieldNames.contains(newName),
      s"renameColumn: $newName already exists — renames cannot merge " +
        "columns")
    require(!partitionColsOf(tableDir).contains(oldName),
      s"renameColumn: $oldName is a partition column — the hive dir " +
        "layout is keyed by its name; rebuild the table to rename it")
    require(!indexedCol(tableDir).contains(oldName),
      s"renameColumn: $oldName is the declared stats column — pointRead " +
        "and the DML index contract name it; rebuild to rename it")
    val newSt = org.apache.spark.sql.types.StructType(st.fields.map { f =>
      if (f.name != oldName) f
      else f.copy(name = newName, metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(PhysicalKey, physicalName(f)).build())
    })
    commitSchemaChange(spark, tableDir, newSt, "rename-column")
  }

  /** DROP COLUMN as ONE metadata commit — the column is HIDDEN from the
    * current schema generation; its bytes stay in every file untouched
    * (pinned readers below the drop still see it; a later OPTIMIZE
    * rewrite naturally sheds it since rewrites write the current
    * schema). The physical name is retired forever: re-ADDING the same
    * logical name later maps it to a fresh physical name, so old bytes
    * can never bleed into the new column. */
  def dropColumn(spark: SparkSession, tableDir: String,
      name: String): Long = {
    val st = declaredSchema(tableDir).getOrElse(
      schemaAt(spark, tableDir, latestVersion(tableDir)).getOrElse(
        throw new IllegalStateException(
          s"dropColumn: $tableDir has no declared schema")))
    require(st.fieldNames.contains(name),
      s"dropColumn: no column $name in ${st.fieldNames.mkString(", ")}")
    require(st.fields.length > 1,
      "dropColumn: cannot drop the last column")
    require(!partitionColsOf(tableDir).contains(name),
      s"dropColumn: $name is a partition column — rebuild the table to " +
        "drop it")
    require(!indexedCol(tableDir).contains(name),
      s"dropColumn: $name is the declared stats column — rebuild to " +
        "drop it")
    val newSt = org.apache.spark.sql.types.StructType(
      st.fields.filterNot(_.name == name))
    commitSchemaChange(spark, tableDir, newSt, "drop-column",
      retire = Some(physicalName(st.fields.find(_.name == name).get)))
  }

  private def retiredColsPath(dir: String) =
    Paths.get(dir, "log", "_retired_cols")

  /** Physical column names that once lived in this table's files but are
    * no longer owned by any current field (DROP COLUMN retires them). A
    * NEW column may not claim such a name — its reads would resurrect
    * the dead column's bytes ([[schemaActionFor]] refuses).
    *
    * Durability model (round-14): the authoritative record is a
    * `_retire-<name>` marker STAGED INSIDE the drop commit's log
    * partition — it becomes durable in the same atomic rename that
    * claims the version, so no crash window can separate "column
    * dropped" from "name retired" (retire-before-claim could blacklist
    * without a drop; retire-after-claim could drop without a blacklist
    * and let a later ADD resurrect old bytes). The `_retired_cols` side
    * file is a self-healing CACHE: reads scan version dirs above the
    * file's `#scanned:<v>` high-water mark, fold any markers found into
    * the file, and advance the mark — so the scan cost is O(new
    * versions since the last read), not O(log). */
  private[graft] def retiredCols(dir: String): Set[String] = {
    val (cached, mark) =
      try {
        val lines = new String(
          Files.readAllBytes(retiredColsPath(dir)), "UTF-8")
          .split("\n").filter(_.nonEmpty).toSeq
        (lines.filterNot(_.startsWith("#")).toSet,
          lines.find(_.startsWith("#scanned:"))
            .flatMap(_.stripPrefix("#scanned:").toLongOption)
            .getOrElse(-1L))
      } catch { case _: Exception => (Set.empty[String], -1L) }
    val latest = latestVersion(dir)
    if (latest <= mark) return cached
    val found = ((mark + 1) to latest).flatMap { v =>
      val d = Paths.get(dir, "log", s"version=$v")
      if (!Files.isDirectory(d)) Seq.empty
      else {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith(RetireMarkerPrefix))
            .map(_.stripPrefix(RetireMarkerPrefix)).toList
        } finally s.close()
      }
    }.toSet
    val all = cached ++ found
    // the cache rewrite is BEST-EFFORT in its entirety (round-14 ADVICE):
    // the retired-name set is already computed, and the cache is
    // explicitly self-healing — an IO failure anywhere in the rewrite
    // (mkdir, tmp write, swap) must only cost a rescan on the next read,
    // never fail the calling schema action out of a pure lookup
    try {
      val p = retiredColsPath(dir)
      Files.createDirectories(p.getParent)
      // atomic swap: a concurrent reader must never see a torn cache (it
      // would parse junk names); losing a concurrent writer's append is
      // harmless — the marker scan re-finds everything
      val tmp = p.resolveSibling(
        s".retired-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp,
        (all.toSeq.sorted :+ s"#scanned:$latest").mkString("", "\n", "\n")
          .getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch { case _: Exception => Files.deleteIfExists(tmp) }
    } catch { case _: Exception => () }
    all
  }

  private val RetireMarkerPrefix = "_retire-"

  private def retireCol(dir: String, physical: String): Unit = {
    val p = retiredColsPath(dir)
    Files.createDirectories(p.getParent)
    Files.write(p, (physical + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)
  }

  private def commitSchemaChange(spark: SparkSession, tableDir: String,
      newSt: org.apache.spark.sql.types.StructType, op: String,
      retire: Option[String] = None): Long = {
    while (true) {
      val latest = latestVersion(tableDir)
      val stage = stageActions(spark, tableDir, Seq.empty, Seq.empty,
        schemaOf = Some(newSt), txn = None, op = Some(op))
      // the retire marker rides INSIDE the staged partition: the atomic
      // claim rename makes "column dropped" and "name retired" one
      // durable event — no crash window in either direction (a lost
      // race deletes the stage, marker included)
      retire.foreach { phys =>
        Files.write(stage.resolve(RetireMarkerPrefix + phys),
          Array.emptyByteArray,
          StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      }
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        // eager side-file mirror (the cache retiredCols self-heals from
        // markers anyway; this just keeps the common path scan-free)
        retire.foreach(retireCol(tableDir, _))
        if (cdfEnabled(tableDir)) writeCdfEmpty(tableDir, latest + 1)
        postWin(spark, tableDir, latest + 1, statsCol = None,
          statsDir = None, schemaOf = Some(newSt))
        return latest + 1
      }
      LayoutDirs.deleteQuiet(stage.toString)
    }
    -1L // unreachable
  }

  // ---- data-plane parquet reads --------------------------------------------

  /** Read DATA files (leaf parquet paths, or a staging dir with hive-style
    * `col=value` subdirs) with partition-dir INFERENCE OFF
    * (`recursiveFileLookup`): partition values live IN the files (E-142 —
    * the dirs are a pruning layout, never a correctness dependency), so
    * inference contributes nothing and only collides with the in-file
    * column (the `day` COLUMN_ALREADY_EXISTS warning on every read of a
    * partitioned table's leaf files — round-12 verdict What's-wrong #1:
    * the real source was these vanilla reads, not the withColumn sites). */
  private def dataRead(spark: SparkSession,
      schema: Option[org.apache.spark.sql.types.StructType],
      paths: Seq[String]): DataFrame = {
    val r = spark.read.option("recursiveFileLookup", "true")
    schema match {
      case Some(st) =>
        // data files ALWAYS carry physical names: request the physical
        // schema from parquet, surface the logical names (a renamed
        // column keeps reading its original bytes; identity when the
        // table has no mapping — the common case pays nothing)
        val phys = toPhysicalSchema(st)
        val df = r.schema(phys).parquet(paths: _*)
        if (phys.fieldNames.sameElements(st.fieldNames)) df
        else df.toDF(st.fieldNames.toIndexedSeq: _*)
      case None => r.parquet(paths: _*)
    }
  }

  // ---- multi-writer optimistic concurrency --------------------------------

  /** Version-claim conflicts observed by THIS process's writers (losers of
    * the put-if-absent race that had to re-read the log and retry). */
  private val conflictCount = new java.util.concurrent.atomic.AtomicLong(0)
  def conflicts: Long = conflictCount.get()

  /** Multi-writer OPTIMISTIC append: commit `batch` as the next table
    * version, safely concurrent with other writers. The protocol is the
    * Delta `_delta_log/N.json` put-if-absent rule, with an atomic
    * directory RENAME as the local-filesystem stand-in (object stores use
    * a conditional put):
    *
    *  1. data files land in a writer-unique dir (invisible — nothing
    *     references them until the log does);
    *  2. the add-action log partition is STAGED under `log/.stage-<id>`
    *     (dot-prefixed → invisible to listings and parquet reads);
    *  3. claim version v = latestVersion+1 by atomically moving the
    *     staged dir to `log/version=v` — the rename fails if the version
    *     is taken, and because it is atomic the version dir only ever
    *     appears FULLY FORMED (its data files committed), so a
    *     concurrent poll can never observe a half version;
    *  4. the loser bumps the conflict metric, re-reads the log for the
    *     fresh latest, and retries at the next free version — nothing is
    *     rewritten (data files and the staged partition are reused), so
    *     a lost race costs one rename, not one job.
    *
    * Versions stay CONTIGUOUS: a writer can only win v after observing
    * v-1 committed (its first attempt is latest+1, and every retry moves
    * to a version whose predecessor just beat it). A table is written
    * EITHER through this path (version = claim order) or through the
    * streaming [[commitOnce]] path (version = batchId) — mixing the two
    * addressing disciplines on one table is a caller error.
    *
    * Returns the committed version. */
  def commitAppend(batch: DataFrame, tableDir: String,
      statsCol: Option[String] = None): Long = {
    requireAppendCompatible(tableDir, batch.schema)
    val spark = batch.sparkSession
    val dataDir =
      s"$tableDir/data/w-${java.util.UUID.randomUUID().toString.take(12)}"
    toPhysical(batch, tableDir).write.mode("overwrite").parquet(dataDir)
    commitActions(spark, tableDir,
      adds = LayoutDirs.dataFiles(dataDir), removes = Seq.empty,
      statsCol = statsCol, statsDir = Some(dataDir),
      schemaOf = Some(batch.schema))
  }

  /** Stage an action set and claim the next version for it (the shared
    * tail of [[commitAppend]], [[optimize]] and the DSv2 batch writer —
    * a rewrite's adds and removes commit ATOMICALLY in one version).
    * `txn` records a ("txn", id) action in the same commit — the Delta
    * transaction-identifier shape the streaming sink's exactly-once
    * rides on (see [[lastTxnEpoch]]). */
  private[graft] def commitActions(spark: SparkSession, tableDir: String,
      adds: Seq[String], removes: Seq[String],
      statsCol: Option[String], statsDir: Option[String],
      schemaOf: Option[org.apache.spark.sql.types.StructType] = None,
      txn: Option[String] = None)
      : Long = {
    requireIndexColMatch(tableDir, statsCol)
    val stage = stageActions(spark, tableDir, adds, removes, schemaOf, txn)
    val v = claimVersion(tableDir, stage)
    postWin(spark, tableDir, v, statsCol, statsDir, schemaOf)
    v
  }

  /** OVERWRITE commit: atomically replace the ENTIRE live set with `adds`
    * (the DSv2 truncate / SaveMode.Overwrite semantics). Unlike an append
    * — whose action set is valid at whatever version the claim lands on —
    * a truncate's removes are a READ of table state, so the claim must
    * land at exactly the version that read observed: stage against
    * latest+1, single-attempt claim, and on conflict RE-READ the live set
    * and restage (the optimistic-concurrency write-conflict rule; an
    * append racing in between would otherwise survive the truncate). */
  private[graft] def commitOverwrite(spark: SparkSession, tableDir: String,
      adds: Seq[String],
      statsCol: Option[String], statsDir: Option[String],
      schemaOf: Option[org.apache.spark.sql.types.StructType] = None,
      txn: Option[String] = None)
      : Long = {
    requireIndexColMatch(tableDir, statsCol)
    while (true) {
      val latest = latestVersion(tableDir)
      val removes =
        if (latest < 0) Seq.empty[String]
        else liveFiles(spark, tableDir, latest)
      // an overwrite with removes is a CHANGE COMMIT, but it stores NO
      // change rows and diffs NOTHING: the ("op", "overwrite") action
      // lets CDF readers derive the change set from the log alone — the
      // removed files ARE the deletes, the added files ARE the inserts
      // (the Delta INSERT OVERWRITE semantic: the old snapshot is
      // logically deleted whether or not rows coincide). The round-11
      // exceptAll diff here cost two full-table reads plus a shuffle ON
      // THE COMMIT PATH of every 100-TB overwrite — O(table) work for a
      // feature the reader can have for free.
      val stage = stageActions(spark, tableDir, adds, removes, schemaOf, txn,
        op = if (removes.isEmpty) None else Some("overwrite"))
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        postWin(spark, tableDir, latest + 1, statsCol, statsDir, schemaOf)
        return latest + 1
      }
      LayoutDirs.deleteQuiet(stage.toString) // stale removes — restage
    }
    -1L // unreachable
  }

  /** Rewrite-commit kinds recorded as an ("op", kind) action — what lets
    * CDF readers classify a version with removes WITHOUT reading data:
    * layout-only ops (optimize/zorder — identical multisets by
    * construction) contribute no change rows, and "overwrite" contributes
    * its removed files as deletes + added files as inserts with ZERO diff
    * compute (the Delta INSERT OVERWRITE rule: the old snapshot was
    * logically deleted and the new one inserted, whether or not rows
    * coincide — round-12 ADVICE: the exceptAll diff made a 100-TB
    * overwrite do O(table) work on the commit path). */
  private[graft] val LayoutOps = Set("optimize", "zorder", "cluster")

  private def stageActions(spark: SparkSession, tableDir: String,
      adds: Seq[String], removes: Seq[String],
      schemaOf: Option[org.apache.spark.sql.types.StructType],
      txn: Option[String], op: Option[String] = None,
      extra: Seq[(String, String)] = Nil): java.nio.file.Path = {
    // CHECK constraints gate every commit of NEW rows (append, overwrite,
    // DML rewrites — including the DV update's re-appended post-images)
    // right here — the one choke point every path stages through.
    // Layout/metadata ops (optimize/zorder/clone/restore) re-add rows
    // that already passed, so they skip the read.
    if (adds.nonEmpty && (op.isEmpty || op.contains("overwrite") ||
        op.contains("update-dv")))
      enforceConstraints(spark, tableDir, adds,
        schemaOf.orElse(declaredSchema(tableDir)))
    import spark.implicits._
    val stage = Paths.get(tableDir, "log",
      s".stage-${java.util.UUID.randomUUID().toString.take(12)}")
    (removes.map(("remove", _)) ++ adds.map(("add", _)) ++
      schemaOf.toSeq.flatMap(st => schemaActionFor(tableDir, st)) ++
      txn.map(("txn", _)) ++ op.map(("op", _)) ++ extra)
      .toDF("action", "path")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    stage
  }

  /** Post-claim bookkeeping: v is exclusively ours now, so the index and
    * checkpoint writes race nobody (index rows are keyed by immutable
    * path and versioned dirs are unique per claim). */
  private def postWin(spark: SparkSession, tableDir: String, v: Long,
      statsCol: Option[String], statsDir: Option[String],
      schemaOf: Option[org.apache.spark.sql.types.StructType]): Unit = {
    // the marker must carry the SAME json the schema action recorded
    // (withMapping merges the declared column mapping; the pre-overwrite
    // marker is still the old generation here, so the merge sees it)
    schemaOf.foreach(st =>
      writeSchemaMarker(tableDir, withMapping(st, tableDir).json))
    statsCol.foreach { k =>
      statsDir.foreach(d => writeIndexRows(spark, tableDir, d, k, v))
    }
    maybeCheckpoint(spark, tableDir, v)
  }

  /** Commit-time per-file stats, MULTI-COLUMN (the Delta-style capture the
    * round-10 verdict asked for): one row per data file carrying
    *
    *  - `min_key`/`max_key`/`rows` over the declared `statsCol` — the
    *    legacy columns pointRead, src_index_sync and the clustering
    *    contract ride on, unchanged;
    *  - `mins`/`maxs` structs with a long-normalized min/max for EVERY
    *    integral leaf column (the scan prunes on whichever filtered
    *    column has stats — a filter on the SECOND column no longer opens
    *    the whole table);
    *  - `nullCounts` over every atomic column;
    *  - `strMins`/`strMaxs`/`strMaxExact` with 32-char TRUNCATED bounds
    *    for every string leaf (round 12, the Delta truncated-string-stats
    *    semantics): a truncated min is still a valid lower bound; a
    *    truncated max is NOT a valid upper bound by itself, so the
    *    `strMaxExact` flag says whether it is the whole value — the
    *    planner prefix-increments inexact maxes
    *    ([[graft.sources.CommitLogPlanning.prefixUpper]]) and prunes
    *    only when provably safe (ASCII-gated: the one regime where
    *    UTF8-binary, Java-char and code-point orderings all agree).
    *
    * Integral + truncated-string bounds only: double orderings still
    * have the 2^53 edge where a wrong bound PRUNES MATCHING ROWS — the
    * same safety rule as the filter-side `intOf`. Index rows from
    * different versions may carry different struct fields (schema
    * evolution); readers merge-read and treat a missing field as "no
    * stats". */
  private def writeIndexRows(spark: SparkSession, tableDir: String,
      dataDir: String, k: String, version: Long): Unit = {
    val df = spark.read.option("recursiveFileLookup", "true").parquet(dataDir)
    val integral = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.LongType ||
          f.dataType == org.apache.spark.sql.types.IntegerType ||
          f.dataType == org.apache.spark.sql.types.ShortType ||
          f.dataType == org.apache.spark.sql.types.ByteType => f.name
    }.toSeq
    val strings = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType =>
        f.name
    }.toSeq
    val atomic = df.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[
          org.apache.spark.sql.types.StructType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
        f.name
    }.toSeq
    val L = 32 // truncation width, chars (the Delta default)
    val aggCols = Seq(
      min(col(k)).as("min_key"), max(col(k)).as("max_key"),
      count(lit(1)).as("rows")) ++
      (if (integral.isEmpty) Seq.empty
       else Seq(
         struct(integral.map(c => min(col(c).cast("long")).as(c)): _*)
           .as("mins"),
         struct(integral.map(c => max(col(c).cast("long")).as(c)): _*)
           .as("maxs"))) ++
      (if (strings.isEmpty) Seq.empty
       else Seq(
         struct(strings.map(c =>
           substring(min(col(c)), 1, L).as(c)): _*).as("strMins"),
         struct(strings.map(c =>
           substring(max(col(c)), 1, L).as(c)): _*).as("strMaxs"),
         struct(strings.map(c =>
           (length(max(col(c))) <= L).as(c)): _*).as("strMaxExact"))) ++
      (if (atomic.isEmpty) Seq.empty
       else Seq(
         struct(atomic.map(c =>
           count(when(col(c).isNull, 1)).as(c)): _*).as("nullCounts"))) ++
      // BLOOM-FILTER data skipping over the declared statsCol (E-177, the
      // Delta bloom-index shape): min/max cannot prune a point probe on a
      // high-cardinality column whose values interleave across files;
      // the per-file sketch proves non-membership for ~97% of the
      // non-containing files. Integral statsCol only (pointRead's own
      // contract); rides this same one-pass aggregation. Readers treat a
      // missing/NULL field as "no sketch → keep", so index rows written
      // before this column existed stay valid (mergeSchema read).
      (if (!integral.contains(k)) Seq.empty
       else Seq(org.apache.spark.sql.graft.BloomAgg.of(
         col(k).cast("long")).as("bloom")))
    df.groupBy(input_file_name().as("path"))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("path", LayoutDirs.plainPath(col("path")))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tableDir/index/version=$version")
    recordIndexCol(tableDir, k)
  }

  /** The highest epoch a ("txn", "queryId:epoch") action records for
    * `queryId`, −1 when none — the streaming sink's replay guard: commits
    * ride the log atomically with their data, epochs are monotonic per
    * query, and the checkpoint preserves each query's LATEST txn row, so
    * "epoch ≤ lastTxnEpoch" answers "already committed?" exactly even
    * after retention pruned the epoch's own log partition. */
  private[graft] def lastTxnEpoch(spark: SparkSession, tableDir: String,
      queryId: String): Long = {
    val latest = latestVersion(tableDir)
    if (latest < 0) return -1L
    actionRows(spark, tableDir, latest)
      .filter(col("action") === "txn" &&
        col("path").startsWith(queryId + ":"))
      .select(max(expr("cast(substring_index(path, ':', -1) as long)")))
      .collect().headOption.flatMap(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0))).getOrElse(-1L)
  }

  /** Commit one streaming-sink epoch exactly once, with the txn replay
    * guard ATOMIC with the version claim (the Delta transaction-identifier
    * protocol): `lastTxnEpoch` is consulted immediately before every claim
    * attempt, and a claim CONFLICT re-reads it before retrying — so a
    * zombie instance of the same query (the scenario txn identifiers exist
    * for) racing this commit either loses the rename and then SEES the
    * winner's txn row, or wins and the loser sees its. A bare
    * check-then-commit would let both pass the check concurrently and
    * double-deliver the epoch's rows. Returns false when the epoch turned
    * out to be already committed (caller reclaims its orphan files). */
  private[graft] def commitEpoch(spark: SparkSession, tableDir: String,
      adds: Seq[String], statsCol: Option[String], statsDir: Option[String],
      schemaOf: Option[org.apache.spark.sql.types.StructType],
      queryId: String, epochId: Long): Boolean = {
    requireIndexColMatch(tableDir, statsCol)
    var stage: java.nio.file.Path = null
    while (true) {
      // pin the claim version FIRST, then evaluate the guard: the guard
      // then covers all table state <= latest, and a twin's commit landing
      // after it necessarily takes latest+1 — exactly the version this
      // single-attempt claim targets, so the race surfaces as a claim
      // conflict and the loop re-checks. (Guard after a sliding version
      // read would let a twin's commit slip between the two.)
      val latest = latestVersion(tableDir)
      if (lastTxnEpoch(spark, tableDir, queryId) >= epochId) {
        if (stage != null) LayoutDirs.deleteQuiet(stage.toString)
        return false
      }
      if (stage == null)
        stage = stageActions(spark, tableDir, adds, Seq.empty, schemaOf,
          txn = Some(s"$queryId:$epochId"))
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        postWin(spark, tableDir, latest + 1, statsCol, statsDir, schemaOf)
        return true
      }
      // conflict: someone landed latest+1 — loop re-checks the guard
    }
    false // unreachable
  }

  /** Refuse an APPEND whose schema would hide existing columns: the write
    * records its schema as the table's latest, so a narrower frame (or a
    * changed column type) silently projects established columns away from
    * every subsequent read — the exact hazard mergeByKey refuses loudly.
    * Adding columns is fine (schema evolution rides the append); an
    * OVERWRITE replaces the data wholesale, so it may narrow (time travel
    * below it still reads under its own generation's schema). */
  private[graft] def requireAppendCompatible(tableDir: String,
      writeSchema: org.apache.spark.sql.types.StructType): Unit =
    declaredSchema(tableDir).foreach { cur =>
      val byName = writeSchema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cur.fieldNames.filterNot(byName.contains)
      require(missing.isEmpty,
        s"graft-commitlog append to $tableDir lacks table column(s) " +
          s"${missing.sorted.mkString(", ")} — the commit would record a " +
          "narrower schema and hide them from every read (use " +
          "mode(\"overwrite\") to replace the table instead)")
      val changed = cur.fields.flatMap(f =>
        byName.get(f.name).filter(_ != f.dataType)
          .map(t => s"${f.name}: ${f.dataType.simpleString} -> " +
            s"${t.simpleString}"))
      require(changed.isEmpty,
        s"graft-commitlog append to $tableDir changes column type(s) " +
          s"${changed.mkString(", ")} — older files would reread " +
          "incompatibly; rebuild the table for a type migration")
    }

  /** Atomically claim the next free version for a staged log partition.
    * `startAt` pins the FIRST attempted version (tests force a
    * deterministic conflict with it); production callers let it default
    * to latest+1. A rename failure only counts as a conflict if the
    * target version actually exists — anything else (permissions, a dying
    * disk) rethrows instead of spinning. */
  private[graft] def claimVersion(tableDir: String,
      stage: java.nio.file.Path, startAt: Long = -1L): Long = {
    var v = if (startAt >= 0) startAt else latestVersion(tableDir) + 1
    while (true) {
      val target = Paths.get(tableDir, "log", s"version=$v")
      try {
        Files.move(stage, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        stampCommitTime(target)
        return v
      } catch {
        case e: java.nio.file.FileSystemException =>
          if (!Files.exists(target)) throw e // not a version conflict
          conflictCount.incrementAndGet()
          v = math.max(v + 1, latestVersion(tableDir) + 1)
      }
    }
    v // unreachable
  }

  /** Single-attempt claim of EXACTLY version `v` — the overwrite path's
    * primitive: unlike [[claimVersion]] it must NOT slide to the next
    * free version on conflict, because the staged removes were computed
    * against table state as of v−1 and are stale the moment someone else
    * lands v. Returns false on a version conflict (caller re-reads and
    * restages); rethrows anything that isn't a conflict. */
  private[graft] def tryClaimVersion(tableDir: String,
      stage: java.nio.file.Path, v: Long): Boolean = {
    val target = Paths.get(tableDir, "log", s"version=$v")
    try {
      Files.move(stage, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      stampCommitTime(target)
      true
    } catch {
      case e: java.nio.file.FileSystemException =>
        if (!Files.exists(target)) throw e // not a version conflict
        conflictCount.incrementAndGet()
        false
    }
  }

  /** Checkpoint trigger shared by both commit paths. JVM-level lock so
    * concurrent writers crossing different boundaries don't interleave
    * marker writes (the marker is monotonic fast-path only — resolution
    * always lists checkpoint dirs). */
  private val ckptLock = new Object
  private def maybeCheckpoint(spark: SparkSession, tableDir: String,
      v: Long): Unit =
    if ((v + 1) % CheckpointEvery == 0) ckptLock.synchronized {
      if (lastCheckpoint(tableDir) < v) writeLogCheckpoint(spark, tableDir, v)
    }

  // ---- DML through the log (copy-on-write) --------------------------------

  /** DELETE WHERE as one atomic commit — the copy-on-write shape: only the
    * files that actually CONTAIN matching rows are rewritten (minus those
    * rows) and one log version records add(rewritten) + remove(affected).
    * SQL semantics: rows where `pred` is NULL are kept. Untouched files
    * never move, pinned readers keep the pre-delete snapshot, vacuum
    * reclaims the replaced files after retention, and with `statsCol` the
    * rewritten files get index rows in the same commit.
    *
    * Multi-writer rule: the removes are a READ of table state, so the
    * claim is single-attempt at exactly latest+1; on conflict the whole
    * operation recomputes against the fresh state (a concurrent OPTIMIZE
    * or delete may have replaced the very files this one rewrote —
    * recompute-on-conflict is the conservative Delta write-conflict rule).
    *
    * Affected-file discovery is ONE filtered scan with the predicate
    * pushed to parquet (row-group stats skip non-matching files cheaply);
    * at 100 TB a selective delete therefore reads ≈ the files it touches,
    * not the table. Returns (newVersion, filesRewritten); a predicate
    * matching nothing commits nothing and returns (-1, 0); deleting every
    * row leaves an empty-but-readable table (the rewrite keeps a 0-row
    * file, so the schema survives — the Delta semantic). */
  def deleteWhere(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column,
      statsCol: Option[String] = None): (Long, Int) =
    // per-table routing (the delta.enableDeletionVectors shape): a
    // DV-enabled table takes the merge-on-read path — SQL DELETE lands
    // here through SupportsDeleteV2, so the property governs SQL too
    if (dvEnabled(tableDir)) deleteWhereDv(spark, tableDir, pred, statsCol)
    else rewriteWhere(spark, tableDir, pred, statsCol,
      df => df.filter(!coalesce(pred, lit(false))),
      // change set = exactly the rows the rewrite drops
      df => df.filter(coalesce(pred, lit(false)))
        .withColumn("_change_type", lit("delete")))

  /** DELETE WHERE, MERGE-ON-READ (deletion vectors — the Delta DV shape):
    * instead of rewriting every file containing matches, ONE pushed-
    * predicate scan records the matching ROW POSITIONS as `(path, pos)`
    * rows under `dv/version=N`, and the commit is pure metadata —
    * `("dv", <file>)` actions naming the masked files. No data file
    * moves: at 100 TB a delete of 0.1% of rows costs O(matched rows ×
    * 16 bytes) written, not O(affected files) rewritten — the economics
    * that make frequent selective deletes (GDPR purges, late-event
    * retractions) viable on wide tables.
    *
    * Matches are computed over the CURRENT LOGICAL table — existing
    * masks applied first — so composed deletes never re-record a
    * position, and SQL NULL-predicate semantics hold (NULL keeps the
    * row). Every read surface applies live masks; [[optimize]]
    * materializes them back into clean files (restoring the V2 columnar
    * fast path); pinned readers below the dv version never see the mask
    * (dv actions are versioned like everything else); vacuum reclaims a
    * mask only after no retained version reads it. Same single-attempt
    * OCC claim as the CoW path. Returns (newVersion, filesMasked);
    * a predicate matching nothing commits nothing and returns (-1, 0). */
  def deleteWhereDv(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column,
      statsCol: Option[String] = None): (Long, Int) = {
    requireIndexColMatch(tableDir, statsCol)
    while (true) {
      val latest = latestVersion(tableDir)
      val (live, dvs) = liveState(spark, tableDir, latest)
      val cur = schemaAt(spark, tableDir, latest)
      def read(ps: Seq[String]): DataFrame = dataRead(spark, cur, ps)
      // one scan: predicate pushed to parquet (row-group stats skip
      // clean files), existing masks anti-joined so already-dead rows
      // can't match again, surviving matches keep ONLY (file, pos)
      // non-hidden name (the rw-/mg-/opt- staging convention): this dir
      // is read BACK below, and Spark's listing ignores dot-prefixed
      // roots ("All paths were ignored" warnings on every delete)
      val staged = s"$tableDir/data/dvstage-" +
        java.util.UUID.randomUUID().toString.take(12)
      dvApply(spark, tableDir, withDvMeta(read(live)),
          live.flatMap(dvs.get).flatten.distinct)
        .filter(pred)
        .select(col(DvFileCol).as("path"), col(DvPosCol).as("pos"))
        .write.mode("overwrite").parquet(staged)
      val affected = spark.read.parquet(staged)
        .select("path").distinct().collect()
        .map(_.getString(0)).toSeq.sorted
      if (affected.isEmpty) {
        LayoutDirs.deleteQuiet(staged)
        return (-1L, 0)
      }
      // A mask may legally kill EVERY row: the table's read invariant is
      // "at least one live FILE" (what liveState enforces), not "at least
      // one live row" — the CoW path's delete-all likewise leaves an
      // empty-but-readable table (one 0-row rewrite file; CommitLogSqlSpec
      // pins it). A fully-masked table keeps its files live, snapshot
      // reads them under the mask and yields 0 rows with the schema
      // intact — the same end state by a cheaper route, and OPTIMIZE
      // materializes it into the CoW shape. DeletionVectorSpec pins the
      // parity (round-12 ADVICE asked for a refusal here; the premise —
      // that CoW refuses delete-all — does not hold, so the resolution is
      // parity, not a one-path-only refusal).
      // CDF-enabled tables store the materialized deleted ROWS (the
      // change consumer wants rows, not positions): read back only the
      // masked files, semi-join the fresh mask — O(masked files)
      val cdfStaged =
        if (!cdfEnabled(tableDir)) None
        else Some {
          val fresh = spark.read.parquet(staged)
            .select(col("path").as(DvFileCol), col("pos").as(DvPosCol))
          stageCdfRows(tableDir,
            withDvMeta(read(affected))
              .join(fresh, Seq(DvFileCol, DvPosCol), "left_semi")
              .drop(DvFileCol, DvPosCol)
              .withColumn("_change_type", lit("delete")))
        }
      val stage = stageActions(spark, tableDir, Seq.empty, Seq.empty,
        schemaOf = None, txn = None, op = Some("delete-dv"),
        extra = affected.map(("dv", _)))
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        publishDv(tableDir, staged, latest + 1)
        cdfStaged.foreach(publishCdf(tableDir, _, latest + 1))
        postWin(spark, tableDir, latest + 1, statsCol = None,
          statsDir = None, schemaOf = None)
        return (latest + 1, affected.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(staged)
      cdfStaged.foreach(LayoutDirs.deleteQuiet)
    }
    (-1L, 0) // unreachable
  }

  /** UPDATE ... SET ... WHERE as one atomic commit: same copy-on-write
    * plan as [[deleteWhere]], but affected files are rewritten with each
    * `set` column replaced by its expression ON MATCHING ROWS ONLY
    * (non-matching rows in the same file are carried unchanged). */
  def updateWhere(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      statsCol: Option[String] = None): (Long, Int) = {
    // partition values live in the data AND in the dir layout: an update
    // that changes a partition column would write rows whose data says
    // day=9 back into their old day=5 dir, and every later day-pruned
    // read would silently drop them — refuse before any work
    val pcols = partitionColsOf(tableDir).toSet
    val moved = set.keys.filter(pcols.contains)
    require(moved.isEmpty,
      s"updateWhere: column(s) ${moved.mkString(", ")} are partition " +
        s"columns of $tableDir — an update cannot move rows between " +
        "partition dirs (DELETE the rows and append them with the new " +
        "partition value instead)")
    // per-table routing like deleteWhere: a DV-enabled table serves
    // UPDATE merge-on-read (mask + re-append — the Delta DV-update shape)
    if (dvEnabled(tableDir))
      return updateWhereDv(spark, tableDir, pred, set, statsCol)
    def apply(df: DataFrame): DataFrame =
      set.foldLeft(df) { case (d, (name, value)) =>
        d.withColumn(name, when(coalesce(pred, lit(false)), value)
          .otherwise(col(name)))
      }
    rewriteWhere(spark, tableDir, pred, statsCol, apply,
      // the Delta CDC contract: every matched row contributes its
      // pre-image and post-image (computed by the SAME fold the rewrite
      // applies, so stored change rows are bit-identical to stored data)
      df => {
        val pre = df.filter(coalesce(pred, lit(false)))
        pre.withColumn("_change_type", lit("update_preimage"))
          .unionByName(
            apply(pre).withColumn("_change_type", lit("update_postimage")))
      })
  }

  /** UPDATE, MERGE-ON-READ (deletion-vector UPDATE — round-12 verdict
    * task 3, the Delta DV protocol's update face): ONE pushed-predicate
    * scan records the matched row POSITIONS as a mask AND re-appends the
    * matched rows with `set` applied — one atomic version carrying both
    * the `("dv", file)` actions and the add actions for the updated
    * rows. No affected file is rewritten: the same O(matched) write
    * economics as [[deleteWhereDv]] (DvBench measures both), where
    * copy-on-write pays O(affected files) for a handful of changed rows.
    * Matches are computed over the CURRENT logical table (existing masks
    * applied), the updated rows land partition-local (an update cannot
    * move partition values — refused upstream), OPTIMIZE materializes
    * the mask back into clean files, and pinned readers below the
    * version still see the pre-update rows. Type-changing `set`
    * expressions are refused exactly like the CoW path (the appended
    * rows must reread under the declared schema). Returns (newVersion,
    * filesMasked); a predicate matching nothing returns (-1, 0). */
  def updateWhereDv(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      statsCol: Option[String] = None): (Long, Int) = {
    requireIndexColMatch(tableDir, statsCol)
    while (true) {
      val latest = latestVersion(tableDir)
      val (live, dvs) = liveState(spark, tableDir, latest)
      val cur = schemaAt(spark, tableDir, latest)
      def read(ps: Seq[String]): DataFrame = dataRead(spark, cur, ps)
      val staged = s"$tableDir/data/dvstage-" +
        java.util.UUID.randomUUID().toString.take(12)
      dvApply(spark, tableDir, withDvMeta(read(live)),
          live.flatMap(dvs.get).flatten.distinct)
        .filter(pred)
        .select(col(DvFileCol).as("path"), col(DvPosCol).as("pos"))
        .write.mode("overwrite").parquet(staged)
      val affected = spark.read.parquet(staged)
        .select("path").distinct().collect()
        .map(_.getString(0)).toSeq.sorted
      if (affected.isEmpty) {
        LayoutDirs.deleteQuiet(staged)
        return (-1L, 0)
      }
      // matched rows BY POSITION (semi-join on the fresh mask — exact
      // even under a nondeterministic predicate), O(affected files) read
      val fresh = spark.read.parquet(staged)
        .select(col("path").as(DvFileCol), col("pos").as(DvPosCol))
      val matchedRows = withDvMeta(read(affected))
        .join(fresh, Seq(DvFileCol, DvPosCol), "left_semi")
        .drop(DvFileCol, DvPosCol)
      val out = set.foldLeft(matchedRows) { case (d, (name, value)) =>
        d.withColumn(name, value)
      }
      // the re-append records NO schema action, so it must keep the
      // declared column types — same refusal as the CoW rewrite
      val changed = matchedRows.schema.fields.zip(out.schema.fields)
        .collect {
          case (a, b) if a.name != b.name || a.dataType != b.dataType =>
            s"${a.name}: ${a.dataType.simpleString} -> " +
              s"${b.name}: ${b.dataType.simpleString}"
        }
      if (changed.nonEmpty) {
        LayoutDirs.deleteQuiet(staged)
        throw new IllegalArgumentException(
          s"updateWhere changes column type(s) ${changed.mkString(", ")} " +
            "— updates must preserve the schema (cast the set expression " +
            "back to the column's type, or rebuild the table for a type " +
            "migration)")
      }
      val outDir = s"$tableDir/data/dvu-" +
        java.util.UUID.randomUUID().toString.take(12)
      writePartitionLocal(out, partitionColsOf(tableDir), outDir, tableDir)
      val adds = LayoutDirs.dataFiles(outDir)
      val cdfStaged =
        if (!cdfEnabled(tableDir)) None
        else Some(stageCdfRows(tableDir,
          matchedRows.withColumn("_change_type", lit("update_preimage"))
            .unionByName(
              out.withColumn("_change_type", lit("update_postimage")))))
      val stage = stageActions(spark, tableDir, adds, Seq.empty,
        schemaOf = None, txn = None, op = Some("update-dv"),
        extra = affected.map(("dv", _)))
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        publishDv(tableDir, staged, latest + 1)
        cdfStaged.foreach(publishCdf(tableDir, _, latest + 1))
        postWin(spark, tableDir, latest + 1,
          statsCol, Some(outDir), schemaOf = None)
        return (latest + 1, affected.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(staged)
      LayoutDirs.deleteQuiet(outDir)
      cdfStaged.foreach(LayoutDirs.deleteQuiet)
    }
    (-1L, 0) // unreachable
  }

  /** MERGE (upsert) by key as one atomic commit: rows of `updates` REPLACE
    * the table rows sharing their key; keys new to the table are inserted.
    * Copy-on-write plan: one scan (updates' keys broadcast-semi-joined
    * against the live files, `input_file_name` captured scan-side) finds
    * the files containing matched keys; those files are rewritten WITHOUT
    * the matched rows and the updates land beside them as new files —
    * add(rewritten + updates) + remove(affected) in one version. Same
    * single-attempt-claim + recompute-on-conflict OCC rule as
    * [[deleteWhere]]. `updates` must have the table's columns and unique
    * keys (several update rows for one key would make the upsert
    * ambiguous — refused loudly, the Delta MERGE rule).
    *
    * 100-TB shape: cost is O(files containing matched keys) + O(updates);
    * with `statsCol` = key the rewritten files keep index rows, so point
    * reads stay pruned after the merge. Returns (newVersion,
    * filesRewritten). */
  def mergeByKey(spark: SparkSession, tableDir: String,
      updates: DataFrame, key: String,
      statsCol: Option[String] = None): (Long, Int) = {
    require(updates.columns.contains(key),
      s"mergeByKey: updates lack the key column $key")
    requireIndexColMatch(tableDir, statsCol)
    // updates may ADD columns (schema evolution rides the merge) but must
    // CONTAIN every current table column: the merge records updates.schema
    // as the table's schema, so a narrower updates frame would silently
    // project existing columns away from every future read
    declaredSchema(tableDir).foreach { st =>
      val missing = st.fieldNames.toSet -- updates.columns.toSet
      require(missing.isEmpty,
        s"mergeByKey: updates lack table column(s) " +
          s"${missing.toSeq.sorted.mkString(", ")} — the merge would " +
          "record a narrower schema and hide them from every read")
      val byName = updates.schema.fields.map(f => f.name -> f.dataType).toMap
      val retyped = st.fields.flatMap(f =>
        byName.get(f.name).filter(_ != f.dataType)
          .map(t => s"${f.name}: ${f.dataType.simpleString} -> " +
            s"${t.simpleString}"))
      require(retyped.isEmpty,
        s"mergeByKey: updates change column type(s) " +
          s"${retyped.mkString(", ")} — older files would reread " +
          "incompatibly; cast the updates to the table's types, or " +
          "rebuild the table for a type migration")
    }
    val dups = updates.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"mergeByKey: updates carry duplicate $key = ${dups.head.get(0)} — " +
        "an upsert with several rows per key is ambiguous")
    val keys = updates.select(col(key)).distinct()
    while (true) {
      val latest = latestVersion(tableDir)
      val (live, dvs) = liveState(spark, tableDir, latest)
      val cur = schemaAt(spark, tableDir, latest)
      // deletion-vector masks apply to every read here: a key whose only
      // occurrence is a masked row is an INSERT, not an update, and the
      // rewrite materializes the affected files' masks as it retires them
      def readLive(paths: Seq[String]): DataFrame =
        readWithDv(spark, tableDir, paths, dvs, cur)
      // no broadcast() hint: `keys` derives from caller-supplied updates
      // and can grow with the table — AQE broadcasts it at runtime when
      // its measured size allows (the round-6 forced-broadcast lesson)
      val affected =
        readWithDv(spark, tableDir, live, dvs, cur, fileCol = Some("_f"))
          .join(keys, Seq(key), "left_semi")
          .select("_f").distinct().collect().map(_.getString(0)).toSeq.sorted
      val outDir =
        s"$tableDir/data/mg-${java.util.UUID.randomUUID().toString.take(12)}"
      val survivors =
        if (affected.isEmpty) updates
        else readLive(affected)
          .join(keys, Seq(key), "left_anti")
          .unionByName(updates, allowMissingColumns = true)
      // PARTITION-LOCAL like rewriteWhere: on a partitioned table the
      // survivors (rewritten rows AND the upserted updates) land back in
      // their `col=value` dirs, so dir pruning survives routine merges
      // instead of eroding with every upsert. One write per affected
      // partition value — bounded by the merge's partition fan-out.
      writePartitionLocal(survivors, partitionColsOf(tableDir), outDir,
        tableDir)
      val adds = LayoutDirs.dataFiles(outDir)
      // change rows under the merge's schema (old generations null-fill —
      // the same rule changeFeed applies to a range spanning a schema
      // change), stored only for CDF-enabled tables. The merge HAS the
      // key, so updates are genuine update_preimage/update_postimage
      // pairs (the Delta CDC contract): table rows sharing an update's
      // key are pre-images, the matching update rows post-images, and
      // updates whose key is new are inserts.
      val cdfStaged =
        if (!cdfEnabled(tableDir)) None
        else Some {
          val ct = "_change_type"
          val changes =
            if (affected.isEmpty) updates.withColumn(ct, lit("insert"))
            else {
              val before = readWithDv(spark, tableDir, affected, dvs,
                Some(updates.schema))
              val pre = before.join(keys, Seq(key), "left_semi")
              val matchedKeys = pre.select(col(key)).distinct()
              pre.withColumn(ct, lit("update_preimage"))
                .unionByName(updates.join(matchedKeys, Seq(key), "left_semi")
                  .withColumn(ct, lit("update_postimage")))
                .unionByName(updates.join(matchedKeys, Seq(key), "left_anti")
                  .withColumn(ct, lit("insert")))
            }
          stageCdfRows(tableDir, changes)
        }
      val stage = stageActions(spark, tableDir, adds, affected,
        schemaOf = Some(updates.schema), txn = None)
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        cdfStaged.foreach(publishCdf(tableDir, _, latest + 1))
        postWin(spark, tableDir, latest + 1, statsCol, Some(outDir),
          schemaOf = Some(updates.schema))
        return (latest + 1, affected.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(outDir)
      cdfStaged.foreach(LayoutDirs.deleteQuiet)
    }
    (-1L, 0) // unreachable
  }

  /** Write `survivors` under `outDir`, hive-laid-out per the table's
    * partition columns (one write per present partition value — bounded
    * by the commit's partition fan-out), flat when unpartitioned. Shared
    * by the merge paths so dir pruning survives routine merges instead
    * of eroding with every upsert. */
  private def writePartitionLocal(survivors0: DataFrame,
      pcols: Seq[String], outDir: String, tableDir: String): Unit = {
    // files are ALWAYS physical-named (identity for unmapped tables)
    val survivors = toPhysical(survivors0, tableDir)
    if (pcols.isEmpty) survivors.write.mode("overwrite").parquet(outDir)
    else {
      val sv = survivors.persist()
      try {
        val combos = sv.select(pcols.map(col): _*).distinct().collect()
        combos.foreach { row =>
          val memberPred = pcols.zipWithIndex.map { case (c, i) =>
            if (row.isNullAt(i)) col(c).isNull
            else col(c) === lit(row.get(i))
          }.reduce(_ && _)
          val seg = pcols.zipWithIndex.map { case (c, i) =>
            c + "=" + graft.sources.PartitionPaths.renderValue(
              if (row.isNullAt(i)) null else row.get(i))
          }.mkString("/")
          sv.filter(memberPred).write.mode("overwrite")
            .parquet(s"$outDir/$seg")
        }
      } finally sv.unpersist()
    }
  }

  /** One MERGE clause of the FULL shape (the Delta clause model —
    * round-12 verdict task 1; [[CommitLogIngest.mergeByKey]] keeps the
    * star-upsert fast path with schema evolution). Conditions and SET /
    * VALUES expressions are name-anchored Columns over a frame carrying
    * the TARGET row's columns under their own names and the SOURCE row's
    * columns under the [[MergeClause.SrcPrefix]] prefix
    * ([[MergeClause.src]] builds the reference). */
  sealed trait MergeClause
  object MergeClause {
    /** Source-side columns appear under this prefix in clause
      * expressions; a table whose own columns collide with it is refused
      * by [[merge]] before any work. */
    val SrcPrefix = "_src_"
    /** The source row's column `name`, for clause conditions/values. */
    def src(name: String): org.apache.spark.sql.Column =
      col(SrcPrefix + name)

    /** WHEN MATCHED [AND cond] THEN UPDATE SET ... */
    case class MatchedUpdate(cond: Option[org.apache.spark.sql.Column],
        set: Map[String, org.apache.spark.sql.Column]) extends MergeClause
    /** WHEN MATCHED [AND cond] THEN DELETE */
    case class MatchedDelete(cond: Option[org.apache.spark.sql.Column])
        extends MergeClause
    /** WHEN NOT MATCHED [AND cond] THEN INSERT (...) VALUES (...) —
      * values over source columns; table columns not named insert NULL. */
    case class NotMatchedInsert(cond: Option[org.apache.spark.sql.Column],
        values: Map[String, org.apache.spark.sql.Column]) extends MergeClause
    /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... —
      * cond/set may reference TARGET columns only (the Delta rule; there
      * is no source row). */
    case class NotMatchedBySourceUpdate(
        cond: Option[org.apache.spark.sql.Column],
        set: Map[String, org.apache.spark.sql.Column]) extends MergeClause
    /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE */
    case class NotMatchedBySourceDelete(
        cond: Option[org.apache.spark.sql.Column]) extends MergeClause
  }

  /** FULL-SHAPE MERGE as one atomic commit — the Delta clause semantics
    * (CDC-apply's delete clause, conditional updates, source-driven
    * deletes), generalizing [[mergeByKey]]'s star upsert:
    *
    *  - each TARGET row joined to its source match (single key equality
    *    — the engine's merge contract) takes the FIRST matched clause
    *    whose condition holds: update rewrites it, delete drops it, no
    *    applicable clause carries it unchanged;
    *  - each unmatched SOURCE row takes the first NOT MATCHED clause
    *    whose condition holds and inserts; otherwise it is ignored;
    *  - each target row WITHOUT a source match takes the first NOT
    *    MATCHED BY SOURCE clause whose condition holds (update/delete).
    *
    * Copy-on-write plan, O(files containing affected rows) + O(source):
    * ONE discovery pass finds the files holding matched keys, plus — only
    * when NOT MATCHED BY SOURCE clauses exist — the files holding
    * unmatched rows satisfying some such clause's condition (that clause
    * kind is inherently a table-wide predicate scan, the same cost Delta
    * pays; the scan is still pushed-predicate + semi/anti-join, never a
    * collect). Affected files are rewritten partition-local with the
    * clause cascade applied; inserts land beside them; add + remove
    * commit as ONE version under the same single-attempt OCC claim as
    * every DML. Deletion-vector masks apply to every read and
    * materialize in the rewrite.
    *
    * Refused loudly BEFORE any mutation: duplicate source keys (a target
    * row matching several source rows is ambiguous — the Delta MERGE
    * rule), SET on a partition column (rows cannot move between
    * partition dirs), SET/VALUES naming unknown columns, and a table
    * whose columns collide with [[MergeClause.SrcPrefix]]. Clause SET /
    * VALUES expressions are cast to the column's declared type (a merge
    * never changes the schema — evolution rides [[mergeByKey]]).
    * Returns (newVersion, filesRewritten); a merge where nothing
    * matches any clause commits nothing and returns (-1, 0). */
  def merge(spark: SparkSession, tableDir: String, source: DataFrame,
      key: String, clauses: Seq[MergeClause],
      statsCol: Option[String] = None,
      txn: Option[String] = None): (Long, Int) = {
    import MergeClause._
    require(clauses.nonEmpty, "merge: no clauses")
    require(source.columns.contains(key),
      s"merge: source lacks the key column $key")
    requireIndexColMatch(tableDir, statsCol)
    val matchedClauses = clauses.collect {
      case c: MatchedUpdate => (c.cond, Some(c.set))
      case c: MatchedDelete => (c.cond, None)
    }
    val insertClauses = clauses.collect {
      case c: NotMatchedInsert => (c.cond, c.values)
    }
    val nmbsClauses = clauses.collect {
      case c: NotMatchedBySourceUpdate => (c.cond, Some(c.set))
      case c: NotMatchedBySourceDelete => (c.cond, None)
    }
    // The duplicate-key guard is an independent read of the source —
    // launch it on a driver thread so it overlaps the discovery scan
    // below (guide §2.6, round-15: the MERGE cascade's wall at small
    // deltas is its count of SEQUENTIAL sub-second driver actions, not
    // any one job). It is awaited (and enforced) before anything is
    // staged or committed, so the failure mode is identical — only later
    // by one overlapped job.
    val dupsF = scala.concurrent.Future {
      source.groupBy(col(key)).count()
        .filter(col("count") > 1).limit(1).collect()
    }(scala.concurrent.ExecutionContext.global)
    def requireNoDups(): Unit = {
      val dups = scala.concurrent.Await
        .result(dupsF, scala.concurrent.duration.Duration.Inf)
      require(dups.isEmpty,
        s"merge: source carries duplicate $key = ${dups.headOption.map(_.get(0)).orNull} — " +
          "a target row matching several source rows is ambiguous")
    }
    val srcDf = source.select(source.columns.map(c =>
      col(c).as(SrcPrefix + c)) :+ lit(true).as(SrcPrefix): _*)
    val keys = source.select(col(key)).distinct()
    while (true) {
      val latest = latestVersion(tableDir)
      require(latest >= 0, s"merge: $tableDir has no committed version")
      val (live, dvs) = liveState(spark, tableDir, latest)
      val cur = schemaAt(spark, tableDir, latest)
      val tableSchema = cur.getOrElse(dataRead(spark, None, live).schema)
      val tableCols = tableSchema.fieldNames.toSeq
      val collide = tableCols.filter(_.startsWith(SrcPrefix))
      require(collide.isEmpty,
        s"merge: table column(s) ${collide.mkString(", ")} collide with " +
          s"the reserved source prefix $SrcPrefix")
      val pcolsSet = partitionColsOf(tableDir).toSet
      (matchedClauses ++ nmbsClauses).foreach {
        case (_, Some(set)) =>
          val unknown = set.keys.filterNot(tableCols.contains)
          require(unknown.isEmpty,
            s"merge: SET names unknown column(s) ${unknown.mkString(", ")}")
          val moved = set.keys.filter(pcolsSet.contains)
          require(moved.isEmpty,
            s"merge: column(s) ${moved.mkString(", ")} are partition " +
              s"columns of $tableDir — a merge cannot move rows between " +
              "partition dirs (DELETE + INSERT with the new value instead)")
        case _ => ()
      }
      insertClauses.foreach { case (_, values) =>
        val unknown = values.keys.filterNot(tableCols.contains)
        require(unknown.isEmpty,
          s"merge: INSERT names unknown column(s) ${unknown.mkString(", ")}")
      }
      def readLive(paths: Seq[String]): DataFrame =
        readWithDv(spark, tableDir, paths, dvs, cur)
      // discovery pass 1: files holding MATCHED keys (pushed semi-join;
      // AQE broadcasts `keys` at runtime when its measured size allows)
      val withF = readWithDv(spark, tableDir, live, dvs, cur,
        fileCol = Some("_f"))
      val matchedFiles = withF.join(keys, Seq(key), "left_semi")
        .select("_f").distinct().collect().map(_.getString(0)).toSet
      // enforce the (overlapped) duplicate-key guard before any further
      // work can observe or stage an ambiguous merge
      requireNoDups()
      // discovery pass 2 (only when NMBS clauses exist — they predicate
      // over the whole unmatched remainder by definition): files holding
      // unmatched rows some NMBS condition accepts
      val nmbsFiles =
        if (nmbsClauses.isEmpty) Set.empty[String]
        else {
          val anyNmbs = nmbsClauses
            .map(c => coalesce(c._1.getOrElse(lit(true)), lit(false)))
            .reduce(_ || _)
          withF.join(keys, Seq(key), "left_anti").filter(anyNmbs)
            .select("_f").distinct().collect().map(_.getString(0)).toSet
        }
      val affected = (matchedFiles ++ nmbsFiles).toSeq.sorted
      // which source keys actually matched (matched keys can only live in
      // matched files — O(affected), not O(table))
      val matchedKeys =
        if (matchedFiles.isEmpty) keys.filter(lit(false))
        else readLive(matchedFiles.toSeq).select(col(key))
          .join(keys, Seq(key), "left_semi").distinct()
      val srcUnmatched = srcDf.join(
        matchedKeys.select(col(key).as(SrcPrefix + key)),
        Seq(SrcPrefix + key), "left_anti")
      // clause-application flags: first-true-wins cascades, null-safe
      def applies(conds: Seq[Option[org.apache.spark.sql.Column]], k: Int)
          : org.apache.spark.sql.Column = {
        val mine = coalesce(conds(k).getOrElse(lit(true)), lit(false))
        conds.take(k).map(c => !coalesce(c.getOrElse(lit(true)), lit(false)))
          .foldLeft(mine)(_ && _)
      }
      val matched = coalesce(col(SrcPrefix), lit(false))
      val mConds = matchedClauses.map(_._1)
      val nConds = nmbsClauses.map(_._1)
      def clauseValue(c: String): org.apache.spark.sql.Column = {
        val dt = tableSchema(c).dataType
        val updates =
          matchedClauses.zipWithIndex.collect {
            case ((_, Some(set)), k) if set.contains(c) =>
              (matched && applies(mConds, k), set(c))
          } ++ nmbsClauses.zipWithIndex.collect {
            case ((_, Some(set)), k) if set.contains(c) =>
              (!matched && applies(nConds, k), set(c))
          }
        updates.foldRight(col(c)) { case ((app, v), acc) =>
          when(app, v.cast(dt)).otherwise(acc) }.as(c)
      }
      val deleteApplies = (matchedClauses.zipWithIndex.collect {
        case ((_, None), k) => matched && applies(mConds, k)
      } ++ nmbsClauses.zipWithIndex.collect {
        case ((_, None), k) => !matched && applies(nConds, k)
      }).reduceOption(_ || _).getOrElse(lit(false))
      def joined: DataFrame = readLive(affected).join(srcDf,
        col(key) === col(SrcPrefix + key), "left")
      val rewritten =
        if (affected.isEmpty) None
        else Some(joined.filter(!deleteApplies)
          .select(tableCols.map(clauseValue): _*))
      // inserts: first applicable NOT MATCHED clause per unmatched
      // source row; rows no clause accepts are ignored
      val iConds = insertClauses.map(_._1)
      val anyInsert = insertClauses.zipWithIndex
        .map { case (_, k) => applies(iConds, k) }
        .reduceOption(_ || _).getOrElse(lit(false))
      def insertValue(c: String): org.apache.spark.sql.Column = {
        val dt = tableSchema(c).dataType
        insertClauses.zipWithIndex.foldRight(
            lit(null).cast(dt): org.apache.spark.sql.Column) {
          case (((_, values), k), acc) =>
            values.get(c).map(v => when(applies(iConds, k), v.cast(dt))
              .otherwise(acc)).getOrElse(acc)
        }.as(c)
      }
      val inserts =
        if (insertClauses.isEmpty) None
        else Some(srcUnmatched.filter(anyInsert)
          .select(tableCols.map(insertValue): _*))
      val survivors = (rewritten, inserts) match {
        case (Some(r), Some(i)) => r.unionByName(i)
        case (Some(r), None) => r
        case (None, Some(i)) => i
        case (None, None) => null
      }
      // nothing affected and nothing to insert -> no commit. (An insert
      // frame may still be EMPTY at runtime; that commits an empty add
      // set only when a rewrite carries it — otherwise the cheap count
      // below refuses the no-op.)
      if (survivors == null ||
          (affected.isEmpty && inserts.exists(_.isEmpty)))
        return (-1L, 0)
      val outDir =
        s"$tableDir/data/mg-${java.util.UUID.randomUUID().toString.take(12)}"
      // CDF change rows (the Delta CDC contract): matched updates as
      // pre/post pairs, deletes as "delete", inserts as "insert" —
      // computed from the SAME cascade the rewrite applies. Staged on a
      // driver thread CONCURRENTLY with the survivor write below (guide
      // §2.6): the two jobs read the same affected files and write to
      // disjoint staging dirs, and both are awaited before anything is
      // claimed — a retry cleans both up exactly as before.
      val cdfStagedF = scala.concurrent.Future[Option[String]] {
        if (!cdfEnabled(tableDir)) None
        else Some {
          val ct = "_change_type"
          val updateApplies = (matchedClauses.zipWithIndex.collect {
            case ((_, Some(_)), k) => matched && applies(mConds, k)
          } ++ nmbsClauses.zipWithIndex.collect {
            case ((_, Some(_)), k) => !matched && applies(nConds, k)
          }).reduceOption(_ || _).getOrElse(lit(false))
          val base = if (affected.isEmpty) None else Some(joined)
          val pres = base.map(_.filter(updateApplies)
            .select(tableCols.map(col): _*)
            .withColumn(ct, lit("update_preimage")))
          val posts = base.map(_.filter(updateApplies)
            .select(tableCols.map(clauseValue): _*)
            .withColumn(ct, lit("update_postimage")))
          val dels = base.map(_.filter(deleteApplies)
            .select(tableCols.map(col): _*)
            .withColumn(ct, lit("delete")))
          val ins = inserts.map(_.withColumn(ct, lit("insert")))
          val changes = (pres.toSeq ++ posts.toSeq ++ dels.toSeq ++
            ins.toSeq).reduce(_.unionByName(_))
          stageCdfRows(tableDir, changes)
        }
      }(scala.concurrent.ExecutionContext.global)
      // Round-16 ADVICE: a failure between CDF staging and the claim
      // (survivor-write task failure, the empty-table require) must not
      // leak the concurrently staged CDF dir or detached survivor files —
      // drain the staging future and delete both before rethrowing.
      def abortStaging(e: Throwable): Nothing = {
        try scala.concurrent.Await
          .result(cdfStagedF, scala.concurrent.duration.Duration.Inf)
          .foreach(LayoutDirs.deleteQuiet)
        catch { case _: Throwable => () }
        LayoutDirs.deleteQuiet(outDir)
        throw e
      }
      val (adds, cdfStaged) =
        try {
          writePartitionLocal(survivors, partitionColsOf(tableDir), outDir,
            tableDir)
          val a = LayoutDirs.dataFiles(outDir)
          val c = scala.concurrent.Await
            .result(cdfStagedF, scala.concurrent.duration.Duration.Inf)
          require(a.nonEmpty || affected.size < live.size,
            s"merge would leave $tableDir with no live files (the " +
              "append-only read contract forbids an empty table) — use " +
              "overwrite or drop the table instead")
          (a, c)
        } catch { case e: Throwable => abortStaging(e) }
      val stage = stageActions(spark, tableDir, adds, affected,
        schemaOf = None, txn = txn)
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        cdfStaged.foreach(publishCdf(tableDir, _, latest + 1))
        postWin(spark, tableDir, latest + 1,
          statsCol.filter(_ => adds.nonEmpty),
          Some(outDir).filter(_ => adds.nonEmpty), schemaOf = None)
        return (latest + 1, affected.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(outDir)
      cdfStaged.foreach(LayoutDirs.deleteQuiet)
    }
    (-1L, 0) // unreachable
  }

  // ---- change data feed (per-table switch + commit-time storage) ----------

  private def cdfMarker(tableDir: String) =
    Paths.get(tableDir, "log", "_cdf_enabled")

  /** Per-table CDF switch — the `delta.enableChangeDataFeed` shape,
    * DEFAULT OFF (round-12 ADVICE: unconditional staging made every DML
    * pay a second read+write of its change rows whether or not anyone
    * consumes them). Disabled tables still serve
    * [[changeFeed]] through the read-time diff fallback; the V2
    * `readChangeFeed` surface (which reads stored change data only)
    * refuses loudly and names this switch. Enabling is prospective:
    * commits BEFORE the flip have no stored change rows. */
  def setCdfEnabled(tableDir: String, on: Boolean = true): Unit =
    if (on) {
      Files.createDirectories(cdfMarker(tableDir).getParent)
      Files.write(cdfMarker(tableDir), Array.emptyByteArray,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    } else Files.deleteIfExists(cdfMarker(tableDir))

  def cdfEnabled(tableDir: String): Boolean =
    Files.exists(cdfMarker(tableDir))

  // ---- deletion vectors (merge-on-read DELETE) ----------------------------

  private def dvMarker(tableDir: String) =
    Paths.get(tableDir, "log", "_dv_enabled")

  /** Per-table deletion-vector switch — the `delta.enableDeletionVectors`
    * shape, DEFAULT OFF. With it on, [[deleteWhere]] (and SQL DELETE,
    * which lands there through `SupportsDeleteV2`) records WHICH ROW
    * POSITIONS died instead of rewriting the files that contain them:
    * merge-on-read. The 100-TB economics this buys: a selective delete
    * over a wide table writes O(deleted positions) — two longs per row —
    * instead of rewriting every affected multi-GB file for a handful of
    * dropped rows. The masks are carried as `("dv", <data-file>)` log
    * actions plus `(path, pos)` rows under `dv/version=N`, applied by
    * every read surface, and MATERIALIZED back into clean files by
    * [[optimize]] (the `REORG ... APPLY (PURGE)` shape), which restores
    * the columnar fast path and frees the masks for vacuum. */
  def setDvEnabled(tableDir: String, on: Boolean = true): Unit =
    if (on) {
      Files.createDirectories(dvMarker(tableDir).getParent)
      Files.write(dvMarker(tableDir), Array.emptyByteArray,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    } else Files.deleteIfExists(dvMarker(tableDir))

  def dvEnabled(tableDir: String): Boolean =
    Files.exists(dvMarker(tableDir))

  private[graft] def dvDir(tableDir: String, v: Long) =
    s"$tableDir/dv/version=$v"

  /** Publish staged mask rows as `dv/version=v` — same atomic-rename /
    * crash-replay contract as [[publishCdf]]: v is exclusively ours
    * post-claim, a replay that finds the dir already published discards
    * the duplicate stage, and a real IO failure propagates rather than
    * silently dropping the only copy of the mask. */
  private def publishDv(tableDir: String, staged: String, v: Long): Unit = {
    val dst = Paths.get(dvDir(tableDir, v))
    Files.createDirectories(dst.getParent)
    try Files.move(Paths.get(staged), dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException if Files.exists(dst) =>
        LayoutDirs.deleteQuiet(staged)
      case _: java.nio.file.FileSystemException =>
        Files.move(Paths.get(staged), dst)
    }
  }

  /** Read `paths` under the declared `schema` with every deletion-vector
    * mask in `dvs` applied — THE one read primitive every DV-aware
    * surface (snapshot, pointRead, DML discovery/rewrite, OPTIMIZE)
    * funnels through. Unmasked paths read plainly (zero overhead — the
    * common case pays nothing); masked paths read with the parquet
    * `_metadata.row_index` column and anti-join their `(file, pos)` mask
    * rows. No broadcast hint: masks are small by design (OPTIMIZE
    * materializes heavy ones), so AQE broadcasts the dv side at runtime
    * when its measured size allows — and degrades to a shuffle join
    * instead of an OOM when a pathological mask is large. */
  private[graft] def readWithDv(spark: SparkSession, tableDir: String,
      paths: Seq[String], dvs: Map[String, Seq[Long]],
      schema: Option[org.apache.spark.sql.types.StructType],
      fileCol: Option[String] = None): DataFrame = {
    def read0(ps: Seq[String]): DataFrame = dataRead(spark, schema, ps)
    // `fileCol` must come from `_metadata` ON THE SCAN (before any
    // join): input_file_name() evaluated above a shuffle join returns
    // "" — the DML discovery scans would silently find zero files
    def read(ps: Seq[String]): DataFrame =
      fileCol.map(c => read0(ps).withColumn(c,
        LayoutDirs.plainPath(col("_metadata.file_path"))))
        .getOrElse(read0(ps))
    val (masked, clean) = paths.partition(dvs.contains)
    if (masked.isEmpty) return read(paths)
    val m = dvApply(spark, tableDir,
      withDvMeta(read0(masked)), masked.flatMap(dvs).distinct)
    val maskedDf = fileCol.map(c => m.withColumn(c, col(DvFileCol)))
      .getOrElse(m).drop(DvFileCol, DvPosCol)
    if (clean.isEmpty) maskedDf else maskedDf.unionByName(read(clean))
  }

  private[graft] val DvFileCol = "_dv_file"
  private[graft] val DvPosCol = "_dv_pos"

  /** `df` with its file path (log-normalized) and within-file row
    * position alongside — the join key a deletion vector masks on. The
    * parquet `_metadata.row_index` counts every physical row whether or
    * not a filter later drops it, so positions are stable across reads
    * and across predicates. */
  private def withDvMeta(df: DataFrame): DataFrame =
    df.withColumn(DvFileCol,
        LayoutDirs.plainPath(col("_metadata.file_path")))
      .withColumn(DvPosCol, col("_metadata.row_index"))

  /** Anti-join `df` (carrying [[DvFileCol]]/[[DvPosCol]]) against the
    * mask rows of `dvVersions`. Mask rows for paths the caller is not
    * reading simply never match — no per-path filtering needed. */
  private def dvApply(spark: SparkSession, tableDir: String,
      df: DataFrame, dvVersions: Seq[Long]): DataFrame = {
    if (dvVersions.isEmpty) return df
    // a version can carry ("dv", path) actions whose mask dir is missing
    // only if the publish crashed between the claim rename and the mask
    // move — surface the incomplete commit and its repair instead of a
    // raw path-not-found from the scan (reading ON anyway would silently
    // resurrect the deleted rows)
    val missing = dvVersions.filterNot(v =>
      LayoutDirs.hasParquetData(dvDir(tableDir, v)))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"$tableDir: deletion-vector commit(s) ${missing.mkString(", ")} " +
        "have dv actions but no published mask (the dv publish crashed " +
        "mid-commit) — the commit is incomplete; remove " +
        missing.map(v => s"log/version=$v").mkString(", ") +
        " to roll it back (its staged mask under data/dvstage-* is " +
        "orphaned debris)")
    val mask = spark.read
      .parquet(dvVersions.map(dvDir(tableDir, _)): _*)
      .select(col("path").as(DvFileCol), col("pos").as(DvPosCol))
    df.join(mask, Seq(DvFileCol, DvPosCol), "left_anti")
  }

  /** Write a commit's CHANGE-DATA rows (already tagged `_change_type`) —
    * the Delta `_change_data` design. Computed at COMMIT time (the DML
    * already has the rows in hand; O(changed rows), never O(table))
    * into a staging dir the winner renames to `cdf/version=v`, so CDF
    * readers — API and V2 scan, batch and streaming — read exact change
    * rows per version with no read-time diffing. Updates carry
    * update_preimage/update_postimage pairs (the Delta CDC contract —
    * round-12 ADVICE: the multiset delete+insert representation hid
    * UPDATEs from CDC consumers); deletes carry "delete", new rows
    * "insert". A diff-less rewrite (OPTIMIZE) stages an empty marker
    * instead: "this change commit changed nothing", distinguishable from
    * a legacy commit with no cdf dir at all (whose diff base may already
    * be vacuumed). */
  private def stageCdfRows(tableDir: String, changes: DataFrame): String = {
    val dir =
      s"$tableDir/data/.cdf-${java.util.UUID.randomUUID().toString.take(12)}"
    changes.write.mode("overwrite").parquet(dir)
    dir
  }

  private def cdfDir(tableDir: String, v: Long) =
    s"$tableDir/cdf/version=$v"

  /** An empty CDF marker (no logical change — OPTIMIZE). */
  private def writeCdfEmpty(tableDir: String, v: Long): Unit = {
    val p = Paths.get(cdfDir(tableDir, v), "_empty")
    Files.createDirectories(p.getParent)
    Files.write(p, Array.emptyByteArray,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
  }

  private def publishCdf(tableDir: String, staged: String, v: Long): Unit = {
    val dst = Paths.get(cdfDir(tableDir, v))
    Files.createDirectories(dst.getParent)
    try Files.move(Paths.get(staged), dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException if Files.exists(dst) =>
        // crash-replay already published this version's cdf
        LayoutDirs.deleteQuiet(staged)
      case _: java.nio.file.FileSystemException =>
        // not a replay (dst absent — e.g. a filesystem that refuses
        // ATOMIC_MOVE): v is exclusively ours post-claim, so a plain
        // move is race-free; a real IO failure propagates rather than
        // silently discarding the only copy of the change rows
        Files.move(Paths.get(staged), dst)
    }
  }

  /** True when version `v`'s change rows are stored (data or the empty
    * marker) — the post-round-11 commit format. */
  private[graft] def hasCdf(tableDir: String, v: Long): Boolean =
    Files.exists(Paths.get(cdfDir(tableDir, v)))

  /** `changeRows`: the tagged `_change_type` change set of this rewrite,
    * from the affected files' rows — staged and stored only when the
    * table has CDF enabled (disabled tables keep the [[changeFeed]]
    * read-time-diff fallback). Callers hand the exact semantic:
    * deleteWhere tags matched rows "delete"; updateWhere pairs matched
    * rows as update_preimage/update_postimage. */
  private def rewriteWhere(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column, statsCol: Option[String],
      rewrite: DataFrame => DataFrame,
      changeRows: DataFrame => DataFrame): (Long, Int) = {
    requireIndexColMatch(tableDir, statsCol)
    while (true) {
      val latest = latestVersion(tableDir)
      val (live, dvs) = liveState(spark, tableDir, latest)
      // discovery AND rewrite both read under the declared schema as of
      // `latest`: with mixed generations on disk, a bare parquet read
      // infers one file's footer and a predicate on a late-added column
      // would crash (or resolve nondeterministically by file order).
      // Deletion-vector masks apply to BOTH: a file whose only matches
      // are already-masked rows is not affected, and a rewrite of a
      // masked file drops its dead rows (materializing the mask — the
      // remove action retires mask and file together).
      val cur = schemaAt(spark, tableDir, latest)
      def readLive(paths: Seq[String]): DataFrame =
        readWithDv(spark, tableDir, paths, dvs, cur)
      // one pushed-predicate scan finds the files that contain matches
      // (file identity from `_metadata` via readWithDv — survives the
      // mask anti-join, unlike input_file_name above a shuffle)
      val affected =
        readWithDv(spark, tableDir, live, dvs, cur, fileCol = Some("_f"))
          .filter(pred)
          .select("_f")
          .distinct().collect().map(_.getString(0)).toSeq.sorted
      if (affected.isEmpty) return (-1L, 0)
      val outDir =
        s"$tableDir/data/rw-${java.util.UUID.randomUUID().toString.take(12)}"
      // rewrite under the CURRENT schema (older generations null-fill and
      // come out upgraded); PARTITION-LOCAL: files are rewritten per
      // hive-layout group so a partitioned table's rewrites land back in
      // their `col=value` dirs (dir pruning survives every DELETE/UPDATE;
      // partition values live in the files, so this is layout, not
      // correctness), keeping each group's file count
      val groups = affected
        .groupBy(graft.sources.PartitionPaths.segmentsOf).toSeq.sortBy(_._1)
      // round-15 (guide §2.6 overlap-independent-jobs): the CDF staging
      // reads the ORIGINAL affected files — independent of the rewrite
      // output — so it runs on a driver thread concurrently with the
      // group rewrites; and the per-partition-group rewrites write to
      // DISJOINT dirs, so up to 4 run in flight instead of one write job
      // per group sequentially. Everything is awaited before staging the
      // claim; a lost race cleans up both, exactly as before.
      val cdfStagedF = scala.concurrent.Future[Option[String]] {
        if (!cdfEnabled(tableDir)) None
        else Some(stageCdfRows(tableDir, changeRows(readLive(affected))))
      }(scala.concurrent.ExecutionContext.global)
      def writeGroup(seg: String, paths: Seq[String]): Unit = {
        val dst = if (seg.isEmpty) outDir else s"$outDir/$seg"
        val in = readLive(paths)
        val out = rewrite(in)
        // a rewrite records NO schema action, so its files MUST keep the
        // declared column types: a set expression that widens a column
        // (int + 1000L → long) would write files the declared-schema
        // read then rejects (PARQUET_COLUMN_DATA_TYPE_MISMATCH) — found
        // at sf10 where n_chars is int32. Refuse loudly instead.
        val changed = in.schema.fields.zip(out.schema.fields).collect {
          case (a, b) if a.name != b.name || a.dataType != b.dataType =>
            s"${a.name}: ${a.dataType.simpleString} -> " +
              s"${b.name}: ${b.dataType.simpleString}"
        }
        require(changed.isEmpty,
          s"updateWhere changes column type(s) ${changed.mkString(", ")} " +
            "— updates must preserve the schema (cast the set expression " +
            "back to the column's type, or rebuild the table for a type " +
            "migration)")
        toPhysical(out, tableDir).coalesce(paths.size)
          .write.mode("overwrite").parquet(dst)
      }
      // Round-16 ADVICE: a failed group write must stop the queued/running
      // sibling writes (shutdownNow + drain, so no detached Spark job keeps
      // writing into outDir), then drain the concurrent CDF staging and
      // delete both staging dirs before rethrowing.
      def abortStaging(e: Throwable): Nothing = {
        try scala.concurrent.Await
          .result(cdfStagedF, scala.concurrent.duration.Duration.Inf)
          .foreach(LayoutDirs.deleteQuiet)
        catch { case _: Throwable => () }
        LayoutDirs.deleteQuiet(outDir)
        throw e
      }
      val (adds, cdfStaged) =
        try {
          if (groups.size <= 1)
            groups.foreach { case (s, p) => writeGroup(s, p) }
          else {
            val pool = java.util.concurrent.Executors
              .newFixedThreadPool(math.min(4, groups.size))
            val gec =
              scala.concurrent.ExecutionContext.fromExecutorService(pool)
            try {
              val futs = groups.map { case (s, p) =>
                scala.concurrent.Future(writeGroup(s, p))(gec)
              }
              futs.foreach(f => scala.concurrent.Await
                .result(f, scala.concurrent.duration.Duration.Inf))
            } catch {
              case e: Throwable =>
                pool.shutdownNow()
                pool.awaitTermination(60,
                  java.util.concurrent.TimeUnit.SECONDS)
                throw e
            } finally pool.shutdown()
          }
          val a = LayoutDirs.dataFiles(outDir)
          val c = scala.concurrent.Await
            .result(cdfStagedF, scala.concurrent.duration.Duration.Inf)
          require(a.nonEmpty || affected.size < live.size,
            s"deleteWhere would leave $tableDir with no live files (the " +
              "append-only read contract forbids an empty table) — use " +
              "overwrite or drop the table instead")
          (a, c)
        } catch { case e: Throwable => abortStaging(e) }
      val stage = stageActions(spark, tableDir, adds, affected,
        schemaOf = None, txn = None)
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        cdfStaged.foreach(publishCdf(tableDir, _, latest + 1))
        postWin(spark, tableDir, latest + 1,
          statsCol.filter(_ => adds.nonEmpty),
          Some(outDir).filter(_ => adds.nonEmpty), schemaOf = None)
        return (latest + 1, affected.size)
      }
      // lost the claim: the state we read is stale — discard and recompute
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(outDir)
      cdfStaged.foreach(LayoutDirs.deleteQuiet)
    }
    (-1L, 0) // unreachable
  }

  // ---- OPTIMIZE through the log -------------------------------------------

  /** Small-file compaction AS A COMMIT — the Delta/Iceberg OPTIMIZE shape:
    * live files under `maxFileBytes` are rewritten into target-sized
    * files, and ONE log version records add(compacted) + remove(smalls)
    * atomically. No logical change: every snapshot census is identical
    * before and after, the pre-compaction version stays readable until
    * [[vacuum]] reclaims it, and with `statsCol` the rewrite is
    * range-clustered on the indexed column so commit-time stats stay
    * selective (the new files get index rows in the same commit).
    * Returns (newVersion, nCompacted, nOutput); a table with fewer than
    * two small files is left untouched (returns (-1, 0, 0)). */
  def optimize(spark: SparkSession, tableDir: String,
      statsCol: Option[String] = None,
      maxFileBytes: Long = 128L * 1024L * 1024L): (Long, Int, Int) = {
    requireIndexColMatch(tableDir, statsCol)
    // the removes are a READ of table state (the DML rule): claim exactly
    // latest+1, single attempt, recompute on conflict — a sliding claim
    // could land remove(smalls)+add(compacted) AFTER a concurrent rewrite
    // already replaced one of the smalls, resurrecting its dropped rows
    while (true) {
      val v = latestVersion(tableDir)
      val (live, dvs) = liveState(spark, tableDir, v)
      // PARTITION-LOCAL: smalls compact within their hive-layout group
      // only — merging across `col=value` dirs would un-cluster the
      // layout and kill dir pruning for the merged files.
      // Deletion-vector-masked files are ALWAYS eligible regardless of
      // size, even alone in their group (the Delta REORG ... APPLY
      // (PURGE) semantics): compaction is how a mask gets materialized
      // back into a clean file — restoring the V2 columnar fast path
      // and freeing the mask for vacuum.
      val groups = live
        .filter(p => dvs.contains(p) ||
          (try Files.size(Paths.get(p)) < maxFileBytes
           catch { case _: Exception => false }))
        .groupBy(graft.sources.PartitionPaths.segmentsOf)
        .filter(g => g._2.size >= 2 || g._2.exists(dvs.contains))
        .toSeq.sortBy(_._1)
      if (groups.isEmpty) return (-1L, 0, 0)
      val smalls = groups.flatMap(_._2)
      val declared = schemaAt(spark, tableDir, v)
      val optDir =
        s"$tableDir/data/opt-${java.util.UUID.randomUUID().toString.take(12)}"
      groups.foreach { case (seg, paths) =>
        val totalBytes = paths.map(p => Files.size(Paths.get(p))).sum
        val n =
          math.max(1L, (totalBytes + maxFileBytes - 1) / maxFileBytes).toInt
        // compaction reads under the declared schema as of `v`: on a
        // schema-evolved table the smalls span generations, and a bare
        // read would infer ONE footer's schema — a late-added column
        // silently dropped from the compacted output is data loss through
        // an operation documented as "no logical change" (the
        // rewriteWhere / mergeByKey hazard, guarded the same way).
        // Masks apply: compacted output carries only LIVE rows — for
        // unmasked inputs this is a pure layout move, for masked ones a
        // mask materialization (still no logical change: the snapshot
        // census is identical before and after)
        val in = declared match {
          case Some(st) => readWithDv(spark, tableDir, paths, dvs, Some(st))
          case None =>
            if (paths.exists(dvs.contains))
              readWithDv(spark, tableDir, paths, dvs, None)
            else spark.read.option("mergeSchema", "true")
              .option("recursiveFileLookup", "true").parquet(paths: _*)
        }
        val dst = if (seg.isEmpty) optDir else s"$optDir/$seg"
        toPhysical(statsCol match {
          // range-cluster on the indexed column so point reads stay pruned
          case Some(k) => in.repartitionByRange(n, col(k))
            .sortWithinPartitions(col(k))
          case None => in.repartition(n)
        }, tableDir).write.mode("overwrite").parquet(dst)
      }
      val adds = LayoutDirs.dataFiles(optDir)
      val stage = stageActions(spark, tableDir, adds, smalls,
        schemaOf = None, txn = None, op = Some("optimize"))
      if (tryClaimVersion(tableDir, stage, v + 1)) {
        // a pure layout move changes nothing — the ("op", "optimize")
        // action says exactly that from the log alone; CDF-enabled
        // tables also keep the empty cdf marker (pre-op readers)
        if (cdfEnabled(tableDir)) writeCdfEmpty(tableDir, v + 1)
        postWin(spark, tableDir, v + 1, statsCol, Some(optDir),
          schemaOf = None)
        return (v + 1, smalls.size, adds.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(optDir)
    }
    (-1L, 0, 0) // unreachable
  }

  /** `OPTIMIZE ... ZORDER BY (a, b)` INSIDE the log (round-12 verdict
    * task 5): rewrite the live set range-clustered on the Morton
    * interleave of two columns, as ONE atomic layout-only commit — the
    * Delta shape, bringing `src_zorder`'s clustering
    * ([[graft.sources.ZOrderLayout]]) through the table format so the
    * multi-column stats index (E-143) gets a layout that feeds it: after
    * the rewrite, point reads on EITHER axis prune to ~sqrt-fraction
    * candidate sets through the index's per-file min/max.
    *
    * Commit semantics: add(clustered) + remove(all live) at exactly
    * latest+1 (single-attempt claim, recompute on conflict — the OPTIMIZE
    * rule); the version records ("op", "zorder") so CDF readers skip it
    * with zero diff work, plus ("zorderBy", "a,b") so a RE-RUN against an
    * unchanged table is a NO-OP (returns (-1, 0, 0)) and DESCRIBE HISTORY
    * names the operation. Pinned readers (versionAsOf) keep the
    * pre-rewrite snapshot until vacuum. PARTITION-LOCAL like optimize:
    * files cluster within their `col=value` dirs.
    *
    * Clustering is LAYOUT ONLY — never correctness: negative values
    * interleave to the low Morton region (cast to long, no bias shift)
    * which only weakens pruning for those rows, and the within-file sort
    * keeps row-group stats tight. Returns (version, filesRemoved,
    * filesAdded). */
  def optimizeZOrder(spark: SparkSession, tableDir: String,
      zorderBy: Seq[String], statsCol: Option[String] = None,
      maxFileBytes: Long = 128L * 1024L * 1024L): (Long, Int, Int) = {
    require(zorderBy.size == 2,
      s"optimizeZOrder: exactly two clustering columns (the Morton pair), " +
        s"got ${zorderBy.mkString(", ")}")
    requireIndexColMatch(tableDir, statsCol)
    val spec = zorderBy.mkString(",")
    while (true) {
      val v = latestVersion(tableDir)
      require(v >= 0, s"$tableDir has no committed version")
      // idempotence: the latest version already being THIS clustering
      // means nothing changed since — re-running would burn a full
      // rewrite to produce the same layout
      if (zorderSpecAt(spark, tableDir, v).contains(spec))
        return (-1L, 0, 0)
      val (live, dvs) = liveState(spark, tableDir, v)
      val declared = schemaAt(spark, tableDir, v)
      val outDir =
        s"$tableDir/data/zo-${java.util.UUID.randomUUID().toString.take(12)}"
      val groups = live
        .groupBy(graft.sources.PartitionPaths.segmentsOf).toSeq.sortBy(_._1)
      groups.foreach { case (seg, paths) =>
        // masks apply (the whole live set is rewritten, so every mask
        // materializes here — clustered output carries only live rows)
        val in = declared match {
          case Some(st) => readWithDv(spark, tableDir, paths, dvs, Some(st))
          case None =>
            if (paths.exists(dvs.contains))
              readWithDv(spark, tableDir, paths, dvs, None)
            else spark.read.option("mergeSchema", "true")
              .option("recursiveFileLookup", "true").parquet(paths: _*)
        }
        val missing = zorderBy.filterNot(in.columns.contains)
        require(missing.isEmpty,
          s"optimizeZOrder: column(s) ${missing.mkString(", ")} not in " +
            s"$tableDir's schema")
        // Morton interleave is bit arithmetic over longs: a non-numeric
        // column would cast to NULL and silently cluster nothing —
        // refuse before the rewrite burns a full table pass
        val nonNumeric = zorderBy.filter { c =>
          in.schema(c).dataType match {
            case org.apache.spark.sql.types.LongType |
                org.apache.spark.sql.types.IntegerType |
                org.apache.spark.sql.types.ShortType |
                org.apache.spark.sql.types.ByteType |
                org.apache.spark.sql.types.DateType |
                org.apache.spark.sql.types.TimestampType => false
            case _ => true
          }
        }
        require(nonNumeric.isEmpty,
          s"optimizeZOrder: column(s) ${nonNumeric.mkString(", ")} are " +
            "not integral/date/timestamp — the Morton interleave needs " +
            "long-normalizable axes (cluster strings via a derived " +
            "numeric key instead)")
        val totalBytes = paths.map(p => Files.size(Paths.get(p))).sum
        val n =
          math.max(1L, (totalBytes + maxFileBytes - 1) / maxFileBytes).toInt
        // per-type long normalization: Spark forbids CAST(date AS
        // BIGINT), so a date axis goes through unix_date (days since
        // epoch — exactly the integer the stats index stores for it);
        // a timestamp axis casts to epoch seconds
        def axis(c: String) = in.schema(c).dataType match {
          case org.apache.spark.sql.types.DateType =>
            unix_date(col(c)).cast("long")
          case _ => col(c).cast("long")
        }
        val z = graft.sources.ZOrderLayout.zvalue(
          axis(zorderBy.head), axis(zorderBy(1)))
        val dst = if (seg.isEmpty) outDir else s"$outDir/$seg"
        toPhysical(in.withColumn("_graft_z", z)
          .repartitionByRange(n, col("_graft_z"))
          .sortWithinPartitions(col("_graft_z"))
          .drop("_graft_z"), tableDir)
          .write.mode("overwrite").parquet(dst)
      }
      val adds = LayoutDirs.dataFiles(outDir)
      val stage = stageActions(spark, tableDir, adds, live,
        schemaOf = None, txn = None, op = Some("zorder"),
        extra = Seq(("zorderBy", spec)))
      if (tryClaimVersion(tableDir, stage, v + 1)) {
        if (cdfEnabled(tableDir)) writeCdfEmpty(tableDir, v + 1)
        postWin(spark, tableDir, v + 1, statsCol, Some(outDir),
          schemaOf = None)
        return (v + 1, live.size, adds.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(outDir)
    }
    (-1L, 0, 0) // unreachable
  }

  // ---- OPTIMIZE ... CLUSTER BY CELL (ANN index as a log citizen) ----------

  private def centroidsPath(dir: String) =
    Paths.get(dir, "cluster", "_centroids")
  private def clusterSpecPath(dir: String) =
    Paths.get(dir, "cluster", "_spec")

  private[graft] def clusterSpecOf(tableDir: String): Option[String] =
    try {
      val s0 = new String(
        Files.readAllBytes(clusterSpecPath(tableDir)), "UTF-8").trim
      if (s0.isEmpty) None else Some(s0)
    } catch { case _: Exception => None }

  private[graft] def centroidsOf(tableDir: String)
      : Option[Array[Array[Double]]] =
    try Some(graft.sources.CellMath.parse(new String(
      Files.readAllBytes(centroidsPath(tableDir)), "UTF-8")))
    catch { case _: Exception => None }

  /** The cell a clustered file belongs to — parsed from its `gcell=N`
    * path segment; None for unclustered files (appends since the last
    * OPTIMIZE, DML rewrites) — the probe path always reads those. */
  private[graft] def cellOfFile(path: String): Option[Int] =
    graft.sources.PartitionPaths.valueOf(path, "gcell")
      .flatMap(_.toIntOption)

  /** `OPTIMIZE ... CLUSTER BY CELL` — the ANN serving index as a LOG
    * CITIZEN (round-12 verdict task 6; brings `src_ivf_layout`'s
    * cell-partitioned serving layout through the table format): ONE
    * layout-only commit rewrites the live set grouped by trained IVF
    * cell — files land under `gcell=N` dirs, so a file's path IS its
    * cell id and probe pruning is pure path-string work like hive
    * partition pruning. The quantizer trains ONCE on a bounded
    * deterministic sample (first call; k·dim floats under
    * `cluster/_centroids`) and later re-clusters reuse it, so cell ids
    * are stable across maintenance; appends land unclustered and the
    * next OPTIMIZE folds them in; DML rewrites lose their cell segment
    * and degrade to always-read remainder — conservative, never wrong.
    * Same commit semantics as ZORDER: add(clustered) + remove(live) at
    * exactly latest+1, ("op","cluster") so change-feed readers skip it
    * with zero diff work, pinned readers keep the pre-rewrite snapshot,
    * stats index refreshes in the same commit. A re-run against a table
    * whose latest version is already this clustering is a no-op.
    * Partitioned tables refuse (two dir layouts cannot nest). Returns
    * (version, filesRemoved, filesAdded). */
  def optimizeClusterByCell(spark: SparkSession, tableDir: String,
      embedCol: String, k: Int, idCol: String,
      statsCol: Option[String] = None): (Long, Int, Int) = {
    require(partitionColsOf(tableDir).isEmpty,
      s"optimizeClusterByCell: $tableDir is hive-partitioned — cell " +
        "clustering is its own dir layout; use one or the other")
    requireIndexColMatch(tableDir, statsCol)
    val spec = s"$embedCol,$k"
    require(clusterSpecOf(tableDir).forall(_ == spec),
      s"optimizeClusterByCell: $tableDir is already clustered as " +
        s"(${clusterSpecOf(tableDir).get}) — one quantizer per table " +
        "(cell ids must stay stable); rebuild to re-quantize")
    while (true) {
      val v = latestVersion(tableDir)
      require(v >= 0, s"$tableDir has no committed version")
      // no-op: the latest version is already this clustering and
      // nothing landed since
      if (clusterSpecAt(spark, tableDir, v).contains(spec))
        return (-1L, 0, 0)
      val (live, dvs) = liveState(spark, tableDir, v)
      val cur = schemaAt(spark, tableDir, v)
      val in = readWithDv(spark, tableDir, live, dvs, cur)
      require(in.columns.contains(embedCol) && in.columns.contains(idCol),
        s"optimizeClusterByCell: $tableDir lacks $embedCol/$idCol")
      val cents = centroidsOf(tableDir).getOrElse {
        val c = graft.sources.CellMath.trainCentroids(in, embedCol,
          idCol, k)
        Files.createDirectories(centroidsPath(tableDir).getParent)
        Files.write(centroidsPath(tableDir),
          graft.sources.CellMath.render(c).getBytes("UTF-8"))
        Files.write(clusterSpecPath(tableDir), spec.getBytes("UTF-8"))
        c
      }
      val outDir = s"$tableDir/data/cc-" +
        java.util.UUID.randomUUID().toString.take(12)
      // ONE shuffle on the derived cell, then a partitioned write whose
      // dirs carry the cell id — the column never enters the files, so
      // the schema is untouched
      // cell derives from the LOGICAL column; physical renaming follows
      // (gcell itself is unmapped and stripped into the dir name)
      toPhysical(in.withColumn("gcell",
          graft.sources.CellMath.cellColumn(embedCol, cents)), tableDir)
        .repartition(col("gcell"))
        .write.partitionBy("gcell").mode("overwrite").parquet(outDir)
      val adds = LayoutDirs.dataFiles(outDir)
      val stage = stageActions(spark, tableDir, adds, live,
        schemaOf = None, txn = None, op = Some("cluster"),
        extra = Seq(("clusterBy", spec)))
      if (tryClaimVersion(tableDir, stage, v + 1)) {
        if (cdfEnabled(tableDir)) writeCdfEmpty(tableDir, v + 1)
        postWin(spark, tableDir, v + 1, statsCol, Some(outDir),
          schemaOf = None)
        return (v + 1, live.size, adds.size)
      }
      LayoutDirs.deleteQuiet(stage.toString)
      LayoutDirs.deleteQuiet(outDir)
    }
    (-1L, 0, 0) // unreachable
  }

  private def clusterSpecAt(spark: SparkSession, tableDir: String,
      v: Long): Option[String] = {
    val dir = s"$tableDir/log/version=$v"
    if (!LayoutDirs.hasParquetData(dir)) None
    else spark.read.parquet(dir)
      .filter(col("action") === "clusterBy")
      .select("path").collect().headOption.map(_.getString(0))
  }

  /** The live files a probe of `cells` must open: clustered files of the
    * probed cells + every UNCLUSTERED live file (post-cluster appends and
    * DML rewrites — the always-read remainder that keeps probes exact
    * between maintenance runs). Pure driver-side path work. */
  private[graft] def probeFiles(spark: SparkSession, tableDir: String,
      cells: Seq[Int]): (Seq[String], Map[String, Seq[Long]]) = {
    val latest = latestVersion(tableDir)
    val (live, dvs) = liveState(spark, tableDir, latest)
    val want = cells.toSet
    val keep = live.filter(f =>
      cellOfFile(f).forall(want.contains))
    (keep, dvs.filter(kv => keep.contains(kv._1)))
  }

  /** Probe-pruned ANN read: the `nprobe` nearest cells to `query` by the
    * table's trained quantizer, opened through [[probeFiles]] — at scale
    * a probe reads nprobe/k of the corpus plus the unclustered remainder,
    * never the table. Deletion-vector masks apply. */
  def probeRead(spark: SparkSession, tableDir: String,
      query: Array[Double], nprobe: Int): DataFrame = {
    val cents = centroidsOf(tableDir).getOrElse(
      throw new IllegalStateException(
        s"probeRead: $tableDir has no trained quantizer — run " +
          "optimizeClusterByCell first"))
    val cells = graft.sources.CellMath.probeCells(cents, query, nprobe)
    val (files, dvs) = probeFiles(spark, tableDir, cells)
    readWithDv(spark, tableDir, files, dvs,
      schemaAt(spark, tableDir, latestVersion(tableDir)))
  }

  /** The ("zorderBy", spec) action of version `v`, when v is a zorder
    * commit. */
  private def zorderSpecAt(spark: SparkSession, tableDir: String,
      v: Long): Option[String] = {
    val dir = s"$tableDir/log/version=$v"
    if (!LayoutDirs.hasParquetData(dir)) None
    else spark.read.parquet(dir)
      .filter(col("action") === "zorderBy")
      .select("path").collect().headOption.map(_.getString(0))
  }

  /** Physically delete every data file no retained version (>= retainMin)
    * references — the VACUUM shape: history below the retention floor
    * becomes unreadable, everything at or above it is untouched. Run
    * BEFORE pruning the log partitions themselves (reachability is
    * computed from the log). Returns the deleted paths. */
  def vacuum(spark: SparkSession, tableDir: String,
      retainMin: Long): Seq[String] = {
    val latest = latestVersion(tableDir)
    // retainMin beyond the latest version would make the keep-set EMPTY
    // and delete every data file including the live snapshot — an easy
    // off-by-one in a "retain last N" caller must fail, not destroy
    require(retainMin <= latest,
      s"vacuum: retainMin $retainMin exceeds the latest version $latest " +
        "— the keep-set would be empty and vacuum would delete the live " +
        "table")
    val all = spark.read.parquet(s"$tableDir/log")
      .filter(col("action") === "add")
      .select("path").distinct().collect().map(_.getString(0)).toSet
    val keep = (math.max(retainMin, 0L) to latest)
      .flatMap(v => liveFiles(spark, tableDir, v)).toSet
    // CONTAINMENT: vacuum deletes only files under its OWN table root
    // (the Delta rule). A shallow clone's log references the source's
    // data files by absolute path — vacuuming the clone must never
    // reach into the source table, only unlink the clone's own rewrites.
    val root = Paths.get(tableDir).toAbsolutePath.normalize
    val drop = (all -- keep).toSeq.sorted
      .filter(p => Paths.get(p).toAbsolutePath.normalize.startsWith(root))
    drop.foreach(p => Files.deleteIfExists(Paths.get(p)))
    // stored change data obeys the SAME retention horizon (round-12
    // ADVICE: update-heavy CDF tables leaked cdf/version=v dirs without
    // bound) — a version below the floor is unreadable, so its change
    // rows are unreadable too
    val cdfRoot = Paths.get(tableDir, "cdf")
    val cdfDropped =
      if (!Files.exists(cdfRoot)) Seq.empty[String]
      else {
        val s = Files.list(cdfRoot)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("version="))
            .filter { p =>
              val v = p.getFileName.toString.stripPrefix("version=").toLong
              v < math.max(retainMin, 0L)
            }
            .map { p => LayoutDirs.deleteQuiet(p.toString); p.toString }
            .toSeq
        } finally s.close()
      }
    // deletion-vector masks are CURRENT STATE, not history, so their
    // reclaim rule is liveness, not age: a dv/version=N dir is dead
    // exactly when NO retained version's live set contains any path it
    // masks (each mask is self-describing — its own rows name the files
    // it covers; a mask below the floor whose file is still live must
    // survive, or every retained snapshot resurrects the deleted rows)
    val dvRoot = Paths.get(tableDir, "dv")
    val dvDropped =
      if (!Files.exists(dvRoot)) Seq.empty[String]
      else {
        val s = Files.list(dvRoot)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("version="))
            .filter { p =>
              spark.read.parquet(p.toString)
                .select("path").distinct().collect()
                .forall(r => !keep.contains(r.getString(0)))
            }
            .map { p => LayoutDirs.deleteQuiet(p.toString); p.toString }
            .toSeq
        } finally s.close()
      }
    drop ++ cdfDropped ++ dvDropped
  }

  /** TIME-BASED retention (the production face of [[vacuum]]): reclaim
    * data files only reachable from versions COMMITTED LONGER AGO than
    * `retentionHours` (commit time = the version dir's filesystem mtime —
    * set once by the atomic claim rename, never touched again).
    * Default-safe:
    *
    *  - the LATEST version is always retained, even on an idle table
    *    whose last commit predates the horizon (the keep-set can never
    *    go empty — the [[vacuum]] brick guard, made unreachable here);
    *  - a non-positive or non-finite `retentionHours` is refused loudly
    *    BEFORE any deletion (a config typo must not reclaim the
    *    history a streaming consumer's checkpoint still references —
    *    0 retains nothing but the live snapshot, which is exactly the
    *    too-aggressive request production guards against; callers who
    *    really want that call `vacuum(latest)` explicitly).
    *
    * Returns (retention floor, reclaimed paths); every version ≥ floor
    * stays readable, every version below it becomes unreadable. */
  def vacuumRetention(spark: SparkSession, tableDir: String,
      retentionHours: Double = 168.0): (Long, Seq[String]) = {
    require(java.lang.Double.isFinite(retentionHours) && retentionHours > 0,
      s"vacuumRetention: retentionHours must be positive and finite, " +
        s"got $retentionHours — a zero/negative horizon would reclaim " +
        "every historical version (use vacuum(latestVersion) if that is " +
        "really intended)")
    val latest = latestVersion(tableDir)
    require(latest >= 0, s"$tableDir has no committed version")
    val cutoffMs =
      System.currentTimeMillis() - (retentionHours * 3600000.0).toLong
    val d = Paths.get(s"$tableDir/log")
    val survivors =
      if (!Files.exists(d)) Seq.empty[Long]
      else {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("version="))
            .flatMap { p =>
              val v = p.getFileName.toString.stripPrefix("version=").toLong
              // same commit clock as timestampAsOf (claim-time marker,
              // mtime fallback) — the two surfaces must agree on when a
              // version committed or retention could reclaim a version
              // timestampAsOf still resolves to
              val ts = commitTimeOf(p).getOrElse(Long.MaxValue)
              if (ts >= cutoffMs) Some(v) else None
            }.toSeq
        } finally s.close()
      }
    val floor = math.min(survivors.minOption.getOrElse(latest), latest)
    (floor, vacuum(spark, tableDir, floor))
  }

  // ---- CHECK constraints (the Delta constraints shape) --------------------

  private def constraintsPath(dir: String) =
    Paths.get(dir, "log", "_constraints")

  /** The table's CHECK constraints, (name, sql expression) in declaration
    * order. SQL CHECK semantics throughout: a row violates only when the
    * expression evaluates to FALSE — NULL passes. */
  def checkConstraintsOf(tableDir: String): Seq[(String, String)] =
    try {
      new String(Files.readAllBytes(constraintsPath(tableDir)), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty)
        .map { l =>
          val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
        }
    } catch { case _: Exception => Seq.empty }

  /** ADD CONSTRAINT ... CHECK — the Delta shape: the expression must
    * hold on EVERY EXISTING ROW before it may gate future writes (one
    * pushed-predicate violation probe over the current snapshot — at
    * 100 TB that is the documented one-scan cost of adding a constraint,
    * and the price of the guarantee that a constraint, once added, is an
    * invariant of the whole table, not just of later commits). An
    * unresolvable expression (unknown column, parse error) fails here,
    * before anything is recorded. */
  def addCheckConstraint(spark: SparkSession, tableDir: String,
      name: String, sqlExpr: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"addCheckConstraint: invalid constraint name '$name'")
    require(!checkConstraintsOf(tableDir).exists(_._1 == name),
      s"addCheckConstraint: $tableDir already has a constraint '$name'")
    val probe =
      if (latestVersion(tableDir) >= 0) snapshot(spark, tableDir)
      else declaredSchema(tableDir) match {
        case Some(st) =>
          spark.createDataFrame(new java.util.ArrayList[Row](), st)
        case None => throw new IllegalStateException(
          s"addCheckConstraint: $tableDir has no data and no declared " +
            "schema — nothing to resolve the expression against")
      }
    val viol = probe
      .filter(!coalesce(expr(sqlExpr).cast("boolean"), lit(true)))
      .limit(1).collect()
    require(viol.isEmpty,
      s"addCheckConstraint: existing row violates CHECK ($sqlExpr): " +
        s"${viol.headOption.getOrElse("")} — clean the data first " +
        "(the constraint must be an invariant of the WHOLE table)")
    val p = constraintsPath(tableDir)
    Files.createDirectories(p.getParent)
    Files.write(p, s"$name\t$sqlExpr\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)
  }

  /** DROP CONSTRAINT; returns whether it existed. */
  def dropCheckConstraint(tableDir: String, name: String): Boolean = {
    val cs = checkConstraintsOf(tableDir)
    if (!cs.exists(_._1 == name)) return false
    val rest = cs.filterNot(_._1 == name)
    if (rest.isEmpty) Files.deleteIfExists(constraintsPath(tableDir))
    else Files.write(constraintsPath(tableDir),
      rest.map { case (n, e) => s"$n\t$e\n" }.mkString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    true
  }

  /** Violation probe over a commit's staged adds — one pushed-predicate
    * read of the NEW files only (never the table), run pre-claim so a
    * refused commit mutates nothing: no version lands, readers never see
    * the rows. */
  private def enforceConstraints(spark: SparkSession, tableDir: String,
      adds: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    val cs = checkConstraintsOf(tableDir)
    if (cs.isEmpty) return
    // probe under the commit's (or the table's declared) schema: a
    // constraint naming a schema-evolved column must see an
    // older-generation batch NULL-FILL that column (NULL passes — the
    // SQL CHECK semantic), not fail with an unresolved-column error
    val df = dataRead(spark, schema, adds)
    cs.foreach { case (n, e) =>
      val viol = df
        .filter(!coalesce(expr(e).cast("boolean"), lit(true)))
        .limit(1).collect()
      if (viol.nonEmpty) throw new IllegalStateException(
        s"CHECK constraint $n ($e) violated by ${viol.head} — commit " +
          "refused, no version landed")
    }
  }

  /** Record the claim INSTANT inside the won version dir — the commit
    * time [[versionAt]] resolves timestampAsOf against. Written by the
    * winner immediately after the atomic rename (round-12 ADVICE: a
    * rename PRESERVES the staged dir's own mtime, so "dir mtime = claim
    * time" resolved against stage-write time, and an instant between
    * stage and claim could resolve to a version not yet committed then).
    * The marker name is dot-free but `_`-prefixed, so parquet listings
    * ignore it; a crash between rename and stamp degrades that one
    * version to the mtime fallback — same clock, at most stage-to-claim
    * skew early, never late. */
  private def stampCommitTime(versionDir: java.nio.file.Path): Unit =
    try Files.write(versionDir.resolve("_commit_ms"),
      System.currentTimeMillis().toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    catch { case _: Exception => () } // fallback: dir mtime

  /** The instant version dir `p` committed: the claim-time marker when
    * present, else the dir's mtime (pre-marker commits, or a stamp that
    * crashed). */
  private[graft] def commitTimeOf(p: java.nio.file.Path): Option[Long] = {
    val m = p.resolve("_commit_ms")
    val fromMarker =
      try {
        if (Files.exists(m))
          new String(Files.readAllBytes(m), "UTF-8").trim.toLongOption
        else None
      } catch { case _: Exception => None }
    fromMarker.orElse(
      try Some(Files.getLastModifiedTime(p).toMillis)
      catch { case _: Exception => None })
  }

  /** TIME-based time travel (the Delta `timestampAsOf` resolution):
    * the latest version COMMITTED at or before `tsMillis` — commit time
    * is the claim-time marker the winning rename stamps (mtime fallback
    * for pre-marker commits; the same clock [[vacuumRetention]]
    * trusts). Fails loudly when the instant predates every surviving
    * version (retention may have pruned the history, or the table is
    * younger than the timestamp asks for). */
  def versionAt(tableDir: String, tsMillis: Long): Long = {
    val d = Paths.get(s"$tableDir/log")
    require(Files.exists(d), s"$tableDir has no log — nothing committed")
    val s = Files.list(d)
    val candidates =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("version="))
          .flatMap { p =>
            val v = p.getFileName.toString.stripPrefix("version=").toLong
            val ok = commitTimeOf(p).exists(_ <= tsMillis)
            if (ok && LayoutDirs.hasParquetData(p.toString)) Some(v)
            else None
          }.toSeq
      } finally s.close()
    require(candidates.nonEmpty,
      s"timestampAsOf $tsMillis predates every surviving version of " +
        s"$tableDir (earliest surviving commit is newer, or retention " +
        "pruned the history) — use versionAsOf, or a later timestamp")
    candidates.max
  }

  // ---- shallow clone & restore (the Delta CLONE / RESTORE shapes) ---------

  /** SHALLOW CLONE: a NEW table whose version 0 references the source's
    * live data files BY PATH — zero data bytes copied, O(files) metadata.
    * The clone is immediately a full citizen: reads, appends, DML,
    * OPTIMIZE, time travel all work, and every WRITE lands under the
    * clone's own root — copy-on-write rewrites diverge from the source
    * file-by-file (the source is never touched). Cloned state: schema as
    * of the source's latest version, partitioning, CDF/DV switches,
    * CHECK constraints, and the stats index (path-keyed rows stay valid
    * — readers intersect with the live set); source files carrying a
    * live deletion-vector mask materialize into the clone (see below),
    * so the cloned snapshot is the source's LOGICAL table and the
    * clone's v0 is a pure-append commit every consumer understands.
    * The one shared-fate caveat, same as Delta's: vacuuming the
    * SOURCE can reclaim files the clone still references (the clone's
    * own vacuum is safe — it deletes only under its root). Returns the
    * clone's version 0. */
  def shallowClone(spark: SparkSession, srcDir: String,
      dstDir: String): Long = {
    require(latestVersion(dstDir) < 0,
      s"shallowClone: $dstDir already has committed versions — clone " +
        "into a fresh directory")
    val latest = latestVersion(srcDir)
    require(latest >= 0, s"shallowClone: $srcDir has no committed version")
    val (files, dvs) = liveState(spark, srcDir, latest)
    val schema = schemaAt(spark, srcDir, latest)
    val pcols = partitionColsOf(srcDir)
    if (pcols.nonEmpty) recordPartitionCols(dstDir, pcols)
    if (cdfEnabled(srcDir)) setCdfEnabled(dstDir)
    if (dvEnabled(srcDir)) setDvEnabled(dstDir)
    if (Files.exists(constraintsPath(srcDir))) {
      Files.createDirectories(constraintsPath(dstDir).getParent)
      Files.copy(constraintsPath(srcDir), constraintsPath(dstDir),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    indexedCol(srcDir).foreach { k =>
      // path-keyed stats rows prune for the clone exactly as for the
      // source; one small metadata copy keeps pointRead working
      val srcIdx = Paths.get(srcDir, "index")
      if (Files.exists(srcIdx)) {
        val s = Files.walk(srcIdx)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(Files.isRegularFile(_)).foreach { p =>
            val rel = srcIdx.relativize(p)
            val dst = Paths.get(dstDir, "index").resolve(rel)
            Files.createDirectories(dst.getParent)
            Files.copy(p, dst,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        } finally s.close()
      }
      recordIndexCol(dstDir, k)
    }
    // source files carrying a live deletion-vector mask MATERIALIZE into
    // the clone (read minus mask, partition-local, indexed) instead of
    // re-carrying the mask: a clone whose v0 mixed adds with dv actions
    // would poison every version-0 consumer — changeFeed would misread
    // the commit and a fresh streaming reader would have no pure-append
    // v0 to start from. Zero-copy stays true for the unmasked majority;
    // the masked minority costs O(those files) once.
    val (masked, clean) = files.partition(dvs.contains)
    val outDir =
      if (masked.isEmpty) None
      else Some(s"$dstDir/data/cl-" +
        java.util.UUID.randomUUID().toString.take(12))
    outDir.foreach { out =>
      masked.groupBy(graft.sources.PartitionPaths.segmentsOf)
        .toSeq.sortBy(_._1).foreach { case (seg, paths) =>
          val dst = if (seg.isEmpty) out else s"$out/$seg"
          toPhysicalAs(readWithDv(spark, srcDir, paths,
              dvs.filter(kv => paths.contains(kv._1)), schema),
              schema.map(mappingOf).getOrElse(Map.empty))
            .coalesce(paths.size).write.mode("overwrite").parquet(dst)
        }
    }
    val matAdds = outDir.map(LayoutDirs.dataFiles).getOrElse(Seq.empty)
    val stage = stageActions(spark, dstDir, clean ++ matAdds, Seq.empty,
      schemaOf = schema, txn = None, op = Some("clone"))
    require(tryClaimVersion(dstDir, stage, 0L),
      s"shallowClone: $dstDir version 0 appeared mid-clone")
    postWin(spark, dstDir, 0L,
      statsCol = indexedCol(dstDir).filter(_ => matAdds.nonEmpty),
      statsDir = outDir, schemaOf = schema)
    0L
  }

  /** RESTORE the table to the logical state of `toVersion`, as ONE new
    * commit (the Delta RESTORE shape — history moves FORWARD, the
    * versions in between stay intact for time travel): re-add the files
    * live at the target that since left, remove the files that since
    * arrived. A target-live file carrying a deletion-vector mask
    * committed AFTER the target cannot be re-exposed raw (a mask applies
    * to every read at or above its commit — the restored state would
    * silently miss the target's rows), so restore MATERIALIZES such
    * files: rewrite with only the target's masks applied, partition-
    * local, indexed in the same commit — cost O(those files), zero for
    * the common no-post-target-mask case. Refused loudly when vacuum
    * already reclaimed a needed file or mask. A restore version is a
    * CHANGE commit: incremental consumers fail/skip it, and
    * [[changeFeed]] serves it through the mask-aware read-time diff of
    * the swapped files. The restored snapshot reads under the CURRENT
    * declared schema (schema never moves backward — the append-compat
    * rule): a column added after the target stays declared and
    * null-fills for the re-added files. Returns (newVersion,
    * filesRemoved, filesAdded); restoring to the current state commits
    * nothing and returns (-1, 0, 0). */
  def restore(spark: SparkSession, tableDir: String,
      toVersion: Long): (Long, Int, Int) = {
    while (true) {
      val latest = latestVersion(tableDir)
      require(toVersion >= 0 && toVersion <= latest,
        s"restore: version $toVersion outside committed range " +
          s"[0, $latest] of $tableDir")
      val (want, wantDvs) = liveState(spark, tableDir, toVersion)
      val (cur, _) = liveState(spark, tableDir, latest)
      val curSet = cur.toSet
      val wantSet = want.toSet
      // target-live files with a POST-target mask: swapped out and
      // rewritten below (checked before the no-op return — a dv delete
      // after the target leaves the FILE sets identical while the
      // logical state differs)
      val laterMasked = actionRows(spark, tableDir, latest)
        .filter(col("action") === "dv" && col("version") > toVersion)
        .select("path").distinct().collect().map(_.getString(0))
        .filter(wantSet).toSet
      // a RE-ADDED file with target-time masks must ALSO materialize:
      // re-adding it raw would need its pre-target ("dv", path) actions
      // to still resolve at the new latest, but a log checkpoint written
      // after the file's removal legitimately dropped them (masks of
      // non-live paths don't ride checkpoints) — the re-added file
      // would silently resurrect its deleted rows. Materialization
      // reads the mask rows directly (their dirs are verified below)
      // and owes nothing to log resolution afterwards.
      val readdMasked = want.filterNot(curSet)
        .filter(p => !laterMasked(p) && wantDvs.contains(p)).toSet
      val cleanAdds = want.filterNot(curSet).filterNot(laterMasked)
        .filterNot(readdMasked)
      val toMat = want.filter(p => laterMasked(p) || readdMasked(p))
      val removes =
        (cur.filterNot(wantSet) ++ cur.filter(laterMasked)).sorted
      if (cleanAdds.isEmpty && toMat.isEmpty && removes.isEmpty)
        return (-1L, 0, 0)
      val missing =
        (cleanAdds ++ toMat).filterNot(p => Files.exists(Paths.get(p)))
      require(missing.isEmpty,
        s"restore to $toVersion: vacuum already reclaimed " +
          s"${missing.take(3).mkString(", ")}" +
          s"${if (missing.size > 3) ", …" else ""} — that history is " +
          "gone; restore to a retained version")
      val needDv = (cleanAdds ++ toMat).flatMap(wantDvs.get).flatten
        .distinct.sorted.map(dvDir(tableDir, _))
      val missingDv = needDv.filterNot(LayoutDirs.hasParquetData)
      require(missingDv.isEmpty,
        s"restore to $toVersion: vacuum already reclaimed mask(s) " +
          s"${missingDv.mkString(", ")} a re-added file needs")
      val outDir =
        if (toMat.isEmpty) None
        else Some(s"$tableDir/data/rs-" +
          java.util.UUID.randomUUID().toString.take(12))
      outDir.foreach { out =>
        val cur0 = schemaAt(spark, tableDir, latest)
        toMat.groupBy(graft.sources.PartitionPaths.segmentsOf)
          .toSeq.sortBy(_._1).foreach { case (seg, paths) =>
            val dst = if (seg.isEmpty) out else s"$out/$seg"
            toPhysicalAs(readWithDv(spark, tableDir, paths,
                wantDvs.filter(kv => paths.contains(kv._1)), cur0),
                cur0.map(mappingOf).getOrElse(Map.empty))
              .coalesce(paths.size).write.mode("overwrite").parquet(dst)
          }
      }
      val matAdds = outDir.map(LayoutDirs.dataFiles).getOrElse(Seq.empty)
      val adds = (cleanAdds ++ matAdds).sorted
      val stage = stageActions(spark, tableDir, adds, removes,
        schemaOf = None, txn = None, op = Some("restore"))
      if (tryClaimVersion(tableDir, stage, latest + 1)) {
        // materialized files get index rows in the same commit (the
        // re-added originals keep their immutable-path rows from their
        // first commit) — pointRead must keep pruning correctly
        postWin(spark, tableDir, latest + 1,
          statsCol = indexedCol(tableDir).filter(_ => matAdds.nonEmpty),
          statsDir = outDir, schemaOf = None)
        return (latest + 1, removes.size, adds.size)
      }
      LayoutDirs.deleteQuiet(stage.toString) // stale read — recompute
      outDir.foreach(LayoutDirs.deleteQuiet)
    }
    (-1L, 0, 0) // unreachable
  }

  /** DESCRIBE HISTORY: one row per SURVIVING log version (retention-pruned
    * partitions no longer appear — the checkpoint carries their live
    * state, not their history), with action counts and a derived
    * operation kind. Driver-side metadata read, O(surviving versions). */
  def history(spark: SparkSession, tableDir: String): DataFrame = {
    require(Files.exists(Paths.get(s"$tableDir/log")),
      s"$tableDir has no log — nothing committed yet")
    spark.read.parquet(s"$tableDir/log")
      .groupBy(col("version").cast("long").as("version"))
      .agg(
        sum(when(col("action") === "add", 1).otherwise(0)).as("n_added"),
        sum(when(col("action") === "remove", 1).otherwise(0))
          .as("n_removed"),
        sum(when(col("action") === "dv", 1).otherwise(0)).as("n_masked"),
        max(when(col("action") === "txn", col("path"))).as("txn"),
        max(when(col("action") === "op", col("path"))).as("op"),
        max((col("action") === "schema").cast("int")).cast("boolean")
          .as("schema_change"))
      .withColumn("operation",
        // the recorded op kind (overwrite/optimize/zorder) names the
        // operation exactly; older commits fall back to the derivation
        coalesce(col("op"),
          when(col("n_added") > 0 && col("n_removed") > 0, "rewrite")
            .when(col("n_added") > 0, "append")
            .when(col("n_removed") > 0, "delete")
            .otherwise("metadata")))
      .drop("op")
      .orderBy("version")
  }

  /** Highest COMMITTED version. One driver-side dir listing, then a
    * committed-data probe from the HIGHEST version downward — the first
    * hit answers (a lone in-flight dir is the max one under a sequential
    * writer), so a poll costs O(1) probes, not O(commits) walks. A
    * version dir exists from the moment its write STARTS (the
    * committer's _temporary phase), so only dirs whose part file has
    * landed (= the log write's job commit, the atomic rename) count.
    * After retention deleted every log partition, the checkpoint marker
    * still names the version it captured. */
  def latestVersion(tableDir: String): Long = {
    val d = Paths.get(s"$tableDir/log")
    val fromDirs =
      if (!Files.exists(d)) -1L
      else {
        val s = Files.list(d)
        val versions =
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.map(_.getFileName.toString)
              .collect { case n if n.startsWith("version=") =>
                n.stripPrefix("version=").toLong }
              .toSeq.sorted(Ordering.Long.reverse)
          } finally s.close()
        versions
          .find(v => LayoutDirs.hasParquetData(s"$tableDir/log/version=$v"))
          .getOrElse(-1L)
      }
    math.max(fromDirs, lastCheckpoint(tableDir))
  }

  /** The live file set at `version` (see [[actionRows]] for cost). An
    * EMPTY result is impossible for a committed version of this append-
    * only table, so it means the history below the oldest surviving
    * checkpoint was retention-pruned — fail loudly instead of returning
    * a silently partial (here: vacuous) snapshot. */
  private[graft] def liveFiles(spark: SparkSession, tableDir: String,
      version: Long): Seq[String] =
    liveState(spark, tableDir, version)._1

  /** Live files AND deletion-vector state at `version` in ONE log pass:
    * (live paths, dv versions per masked live path). Liveness is decided
    * by the last ADD-vs-REMOVE action only — a "dv" action annotates a
    * live file (it masks rows, it does not retire the file), so letting
    * it win the max_by would silently drop the file from every read.
    * Masks for paths no longer live (their file was since rewritten by
    * CoW DML / OPTIMIZE, which applied them) drop out here. */
  /** liveState memo — same immutability argument as [[schemaMemo]]: the
    * file set live AT a committed version never changes (vacuum only
    * deletes files dead at the retention horizon; RESTORE/DML mint NEW
    * versions), and the unmemoized form ran one driver aggregation job
    * per call, with every query planning and every DML's
    * plan/claim/postWin paying it again (round-14 verdict Next #3's "a
    * dozen tiny driver jobs"). Only successful resolutions cache. */
  private val liveMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), (Seq[String], Map[String, Seq[Long]])]

  private[graft] def liveState(spark: SparkSession, tableDir: String,
      version: Long): (Seq[String], Map[String, Seq[Long]]) = {
    if (liveMemo.size > MetaMemoMax) liveMemo.clear()
    liveMemo.getOrElseUpdate((tableDir, version),
      liveStateCompute(spark, tableDir, version))
  }

  private def liveStateCompute(spark: SparkSession, tableDir: String,
      version: Long): (Seq[String], Map[String, Seq[Long]]) = {
    // guard BEFORE the log read: a table with no committed version (or a
    // negative version from a caller that skipped latestVersion) must
    // surface the contract message, not a raw path-not-found
    // AnalysisException from reading a log dir that does not exist
    if (version < 0 ||
        (!Files.exists(Paths.get(s"$tableDir/log")) &&
          checkpointsOnDisk(tableDir).isEmpty))
      throw new IllegalStateException(
        s"$tableDir has no committed version (latest = " +
          s"${latestVersion(tableDir)}) — nothing to read at $version")
    // liveness aggregates IN SPARK (round-12 ADVICE: collecting every
    // add/remove/dv action row grew the driver set with tail churn) and
    // in ONE job (round-13: a two-job shape doubled every connector
    // query's planning metadata cost — ScanBench caught the inflation):
    // per path, the last ADD-vs-REMOVE action decides liveness (a "dv"
    // action annotates a live file, it does not retire it — max_by
    // skips the null ordering its rows carry) while collect_set gathers
    // the path's dv versions in the same aggregation. Only the RESULTS
    // come back: live paths + their mask versions, O(live files).
    val rows = actionRows(spark, tableDir, version)
      .filter(col("action").isin("add", "remove", "dv"))
      .groupBy(col("path"))
      .agg(
        max_by(when(col("action") =!= "dv", col("action")),
          when(col("action") =!= "dv", col("version"))).as("last"),
        collect_set(when(col("action") === "dv", col("version")))
          .as("dvv"))
      .filter(col("last") === "add")
      .select("path", "dvv").collect()
    val files = rows.map(_.getString(0)).toSeq.sorted
    if (files.isEmpty)
      throw new IllegalStateException(
        s"no live files at version $version: the table is append-only, " +
          "so this version's history predates the oldest surviving " +
          "checkpoint and was retention-pruned — read at a version >= " +
          s"${checkpointsOnDisk(tableDir).headOption.getOrElse(-1L)}")
    val dvs = rows.iterator
      .map(r => r.getString(0) -> r.getSeq[Long](1).distinct.sorted.toSeq)
      .filter(_._2.nonEmpty).toMap
    (files, dvs)
  }

  /** The table at `version` (or the latest committed version when
    * negative) — the TimeTravel read over this stream's log, under the
    * schema DECLARED AS OF that version: files from an older generation
    * surface NULL for columns added later (parquet fills missing
    * columns), and a version pinned before a schema change reads under
    * its own generation's schema. */
  def snapshot(spark: SparkSession, tableDir: String,
      version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(tableDir)
    val (files, dvs) = liveState(spark, tableDir, v)
    readWithDv(spark, tableDir, files, dvs, schemaAt(spark, tableDir, v))
  }

  /** Point lookup at the latest version through log + commit-time index:
    * live paths from the log, overlap prune from the index, then a scan
    * over only the matching files with the key filter pushed down. A key
    * outside every file's range is an EMPTY result, not an error. */
  def pointRead(spark: SparkSession, tableDir: String, statsCol: String,
      key: Long): DataFrame = {
    if (!LayoutDirs.hasParquetData(s"$tableDir/index"))
      throw new IllegalStateException(
        s"$tableDir was ingested without statsCol — no commit-time index " +
          "exists, so pointRead has nothing to prune with (pass " +
          "statsCol to start/commitOnce, or scan snapshot() instead)")
    val latest = latestVersion(tableDir)
    val (live, dvs) = liveState(spark, tableDir, latest)
    // both reads go under the declared schema as of `latest`: on a
    // mixed-generation table a bare read infers whichever footer wins, so
    // a late-added column would nondeterministically vanish from point
    // reads (snapshot() already reads this way). Deletion-vector masks
    // apply — index bounds may still cover masked rows (stats stay
    // conservative until OPTIMIZE materializes), the mask drops them.
    def readAs(paths: Seq[String]): DataFrame =
      readWithDv(spark, tableDir, paths, dvs,
        schemaAt(spark, tableDir, latest))
    // mergeSchema: index rows from pre-bloom versions lack the sketch
    // column — the merged read null-fills them, and a NULL sketch keeps
    // its file (prune is a speedup, never a correctness dependency)
    val idx = spark.read.option("mergeSchema", "true")
      .parquet(s"$tableDir/index")
      .filter(col("path").isin(live: _*))
      .filter(col("min_key") <= key && col("max_key") >= key)
    // BLOOM consult (E-177): on a high-cardinality interleaved key the
    // [min,max] overlap keeps most files; the per-file sketch cuts the
    // survivors to the true containers (± fpp). Judged executor-side —
    // sketch bytes never reach the driver, only paths do.
    val files = (if (idx.schema.fieldNames.contains("bloom"))
        idx.filter(col("bloom").isNull ||
          org.apache.spark.sql.graft.BloomAgg.mightContainAny(
            col("bloom"), Seq(key)))
      else idx)
      .select("path").collect().map(_.getString(0)).toSeq
    if (files.isEmpty)
      // empty result, O(1): one file supplies the schema, the false
      // filter folds to an empty relation — never plan over the live set
      readAs(live.take(1)).filter(lit(false))
    else
      readAs(files).filter(col(statsCol) === key)
  }

  /** The rows the commit range (from, to] appended — the "read the table
    * AS a stream" contract (the Delta streaming-source shape): for an
    * append-only table the change feed of a version range is exactly the
    * files those versions added, so an incremental consumer pays O(new
    * data) per poll — it never diffs snapshots and never rescans the
    * table. Version dirs are addressed directly (no log listing). */
  def changes(spark: SparkSession, tableDir: String, fromExclusive: Long,
      toInclusive: Long, skipChangeCommits: Boolean = false): DataFrame = {
    val paths = addedFiles(spark, tableDir, fromExclusive, toInclusive,
      skipChangeCommits)
    val declared = schemaAt(spark, tableDir, toInclusive)
    if (paths.isEmpty) {
      // the range holds only metadata versions (empty-batch tombstones /
      // schema actions) — a legitimate zero-row poll, NOT an error. The
      // schema is the one declared as of `toInclusive` when recorded,
      // else one live file supplies it (folded to an empty relation by
      // the false filter, so nothing is actually scanned); a table with
      // no data commits at all still fails loudly through liveFiles'
      // contract guard.
      declared match {
        case Some(st) =>
          spark.createDataFrame(new java.util.ArrayList[Row](), st)
        case None =>
          val live = liveFiles(spark, tableDir, toInclusive)
          dataRead(spark, None, live.take(1)).filter(lit(false))
      }
    } else dataRead(spark, declared, paths)
      // a poll spanning a schema change delivers the NEWEST generation's
      // schema (the Delta change-feed rule): older files null-fill
  }

  /** CHANGE DATA FEED over (from, to] — the Delta CDF shape: every row the
    * range changed, tagged `_change_type` and `_commit_version`. An append
    * version contributes its rows as "insert"; an OVERWRITE contributes
    * its removed files as "delete" + added files as "insert" straight
    * from the log (no diff — the Delta INSERT OVERWRITE rule); a
    * layout-only version (OPTIMIZE/ZORDER) contributes nothing; a DML
    * rewrite on a CDF-ENABLED table ([[setCdfEnabled]]) contributes its
    * STORED change rows — updates as update_preimage/update_postimage
    * pairs, deletes as "delete", merge-inserts as "insert" (the Delta CDC
    * contract). A DML version WITHOUT stored change data (CDF off, or a
    * pre-round-12 commit) falls back to the read-time multiset diff of
    * its removed vs added files, where an update DEGRADES to delete +
    * insert (keyless diff — pair on the key downstream). Cost is
    * O(changed files) per version, never O(table). Unlike [[changes]],
    * version dirs must survive for the whole range (retention past them
    * loses the diff base — fails loudly through the same floor guard). */
  def changeFeed(spark: SparkSession, tableDir: String,
      fromExclusive: Long, toInclusive: Long): DataFrame = {
    val logDir = s"$tableDir/log"
    require(fromExclusive < toInclusive,
      s"changeFeed: empty range ($fromExclusive, $toInclusive]")
    val floor = checkpointsOnDisk(tableDir).lastOption.getOrElse(-1L)
    val schema = schemaAt(spark, tableDir, toInclusive)
    def readFiles(paths: Seq[String]): DataFrame =
      dataRead(spark, schema, paths)
    val perVersion =
      ((fromExclusive + 1) to toInclusive).flatMap { v =>
        val dir = s"$logDir/version=$v"
        if (!LayoutDirs.hasParquetData(dir)) {
          require(v > floor,
            s"changeFeed($fromExclusive, $toInclusive]: version $v at or " +
              s"below the checkpoint floor $floor was retention-pruned — " +
              "the diff base is gone; narrow the range or rebuild from a " +
              "snapshot")
          None // never-committed id above the floor
        } else {
          val actions = spark.read.parquet(dir)
            .select("action", "path").collect()
          val adds = actions.filter(_.getString(0) == "add")
            .map(_.getString(1)).toSeq
          val removes = actions.filter(_.getString(0) == "remove")
            .map(_.getString(1)).toSeq
          val dvMasked = actions.filter(_.getString(0) == "dv")
            .map(_.getString(1)).toSeq
          val ops = actions.filter(_.getString(0) == "op")
            .map(_.getString(1)).toSet
          def tag(df: DataFrame, t: String): DataFrame =
            df.withColumn("_change_type", lit(t))
              .withColumn("_commit_version", lit(v))
          if (dvMasked.nonEmpty) {
            // deletion-vector commit: the deletes are the version's OWN
            // mask rows joined back to their files — O(masked files),
            // exact without stored CDF (stored rows, when present, are
            // identical by construction; reconstruction keeps disabled
            // tables fully served). Masks of LATER versions must not
            // leak into this version's change set, so only version v's
            // dv dir joins.
            if (hasCdf(tableDir, v) &&
                LayoutDirs.hasParquetData(cdfDir(tableDir, v))) {
              val withTag = schema
                .map(_.add("_change_type",
                  org.apache.spark.sql.types.StringType))
              Some((withTag match {
                case Some(st) => spark.read.schema(st)
                  .parquet(cdfDir(tableDir, v))
                case None => spark.read.parquet(cdfDir(tableDir, v))
              }).withColumn("_commit_version", lit(v)))
            } else {
              val mask = spark.read.parquet(dvDir(tableDir, v))
                .select(col("path").as(DvFileCol), col("pos").as(DvPosCol))
              val masked = tag(
                readFiles(dvMasked)
                  .withColumn(DvFileCol,
                    LayoutDirs.plainPath(col("_metadata.file_path")))
                  .withColumn(DvPosCol, col("_metadata.row_index"))
                  .join(mask, Seq(DvFileCol, DvPosCol), "left_semi")
                  .drop(DvFileCol, DvPosCol), "delete")
              // a DV UPDATE commit also carries the re-appended rows: in
              // the no-stored-CDF fallback the update DEGRADES to delete
              // (the masked pre-images) + insert (the added files) — the
              // same keyless-diff rule as the legacy CoW fallback
              if (adds.isEmpty) Some(masked)
              else Some(masked.unionByName(tag(readFiles(adds), "insert")))
            }
          }
          else if (removes.isEmpty && adds.isEmpty) None // metadata-only
          else if (removes.isEmpty) Some(tag(readFiles(adds), "insert"))
          // layout-only rewrite (OPTIMIZE/ZORDER): identical multisets by
          // construction — nothing changed, nothing to read or diff
          else if (ops.exists(LayoutOps)) None
          // overwrite: the change set IS the file swap — removed files
          // are the deletes, added files the inserts, zero diff compute
          else if (ops.contains("overwrite")) {
            // pre-commit masks apply to the removed side: rows a dv
            // version already reported dead must not be re-reported as
            // this overwrite's deletes (the legacy-diff rule below)
            val dvsBefore = liveState(spark, tableDir, v - 1)._2
              .filter(kv => removes.contains(kv._1))
            val dels = readWithDv(spark, tableDir, removes, dvsBefore,
              schema)
            val ins =
              if (adds.isEmpty) dels.filter(lit(false))
              else readFiles(adds)
            Some(tag(dels, "delete").unionByName(tag(ins, "insert")))
          }
          else if (hasCdf(tableDir, v)) {
            // round-11 commits STORE their change rows (cdf/version=v —
            // the Delta _change_data shape): read them directly, zero
            // diff work; an empty marker means "no logical change"
            // (OPTIMIZE) and contributes nothing
            val dir = cdfDir(tableDir, v)
            if (!LayoutDirs.hasParquetData(dir)) None
            else {
              val withTag = schema
                .map(_.add("_change_type",
                  org.apache.spark.sql.types.StringType))
              Some((withTag match {
                case Some(st) => spark.read.schema(st).parquet(dir)
                case None => spark.read.parquet(dir)
              }).withColumn("_commit_version", lit(v)))
            }
          } else {
            // legacy change commit (pre-stored-cdf) and RESTORE: diff
            // the swapped files at read time. Deletion-vector masks
            // apply on BOTH sides (removes under the pre-commit mask
            // state, adds under the post-commit state) — a raw read
            // would double-report rows a mask already deleted at its
            // own dv version.
            val dvsBefore = liveState(spark, tableDir, v - 1)._2
            val dvsAfter = liveState(spark, tableDir, v)._2
            val before = readWithDv(spark, tableDir, removes,
              dvsBefore.filter(kv => removes.contains(kv._1)), schema)
            val after =
              if (adds.isEmpty) before.filter(lit(false))
              else readWithDv(spark, tableDir, adds,
                dvsAfter.filter(kv => adds.contains(kv._1)), schema)
            Some(tag(before.exceptAll(after), "delete")
              .unionByName(tag(after.exceptAll(before), "insert")))
          }
        }
      }
    if (perVersion.isEmpty) {
      // a metadata-only range (idle epochs, schema/txn actions) is a
      // legitimate ZERO-ROW poll, same as [[changes]] — but a range with
      // no committed version at all still fails loudly through liveFiles
      val base = schema match {
        case Some(st) =>
          spark.createDataFrame(new java.util.ArrayList[Row](), st)
        case None =>
          val live = liveFiles(spark, tableDir, toInclusive)
          dataRead(spark, None, live.take(1)).filter(lit(false))
      }
      base.withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(-1L))
    } else perVersion.reduce(_.unionByName(_))
  }

  /** CHANGE-FEED file planning for the V2 read surface
    * (`.option("readChangeFeed", "true")`): every file whose rows the
    * range (from, to] changed, as (path, version, tagOverride) — append
    * versions contribute their added files tagged "insert" (the tag is a
    * per-partition CONSTANT, not in the file), overwrites their removed
    * files tagged "delete" + added tagged "insert" (no diff, no storage),
    * layout-only versions nothing, and DML change commits their STORED
    * `cdf/version=v` files (tag in the file; an empty marker contributes
    * nothing). O(changed files), never O(table). Fails loudly on a
    * retention-pruned range (same floor rule as [[changes]]) and on a
    * DML commit with no stored change data (CDF was off — the message
    * names [[setCdfEnabled]]) — never a silently partial feed. */
  /** Per-file mask positions for the V2 readers: one driver-side read of
    * the relevant `dv/version=N` dirs, O(mask rows), filtered to the
    * requested files (masks are small by design — OPTIMIZE materializes
    * heavy ones). */
  private[graft] def dvPositionsFor(spark: SparkSession, tableDir: String,
      dvs: Map[String, Seq[Long]], files: Seq[String])
      : Map[String, Array[Long]] = {
    val masked = files.filter(dvs.contains)
    if (masked.isEmpty) return Map.empty
    val versions = masked.flatMap(dvs).distinct.sorted
    val maskSet = masked.toSet
    spark.read.parquet(versions.map(dvDir(tableDir, _)): _*)
      .select("path", "pos").collect()
      .filter(r => maskSet(r.getString(0)))
      .groupBy(_.getString(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).distinct.sorted }
  }

  private[graft] def cdfFiles(spark: SparkSession, tableDir: String,
      fromExclusive: Long, toInclusive: Long)
      : Seq[(String, Long, Option[String], Array[Long])] = {
    val floor = checkpointsOnDisk(tableDir).lastOption.getOrElse(-1L)
    ((fromExclusive + 1) to toInclusive).flatMap { v =>
      val dir = s"$tableDir/log/version=$v"
      if (!LayoutDirs.hasParquetData(dir)) {
        require(v > floor,
          s"readChangeFeed($fromExclusive, $toInclusive]: version $v at " +
            s"or below the checkpoint floor $floor was retention-pruned " +
            "— the change base is gone; start from a later version or " +
            "rebuild from a snapshot")
        Seq.empty // never-committed id above the floor
      } else {
        val actions = spark.read.parquet(dir)
          .select("action", "path").collect()
        val adds = actions.filter(_.getString(0) == "add")
          .map(_.getString(1)).toSeq
        val removes = actions.filter(_.getString(0) == "remove")
          .map(_.getString(1)).toSeq
        val hasDv = actions.exists(_.getString(0) == "dv")
        val ops = actions.filter(_.getString(0) == "op")
          .map(_.getString(1)).toSet
        // deletion-vector commit: the V2 surface serves FILES as
        // partitions and cannot express the mask join — it needs the
        // STORED change rows (CDF on), same rule as a CoW DML commit
        val none = Array.emptyLongArray
        if (hasDv) {
          val c = cdfDir(tableDir, v)
          if (hasCdf(tableDir, v) && LayoutDirs.hasParquetData(c))
            LayoutDirs.dataFiles(c)
              .map(p => (p, v, None: Option[String], none))
          else throw new IllegalStateException(
            s"readChangeFeed: version $v is a deletion-vector DML commit " +
              s"with no stored change data (cdf/version=$v missing — " +
              "the table did not have CDF enabled when it committed) — " +
              "CommitLogIngest.setCdfEnabled(dir) before future DML, and " +
              "read this range through CommitLogIngest.changeFeed (mask " +
              "reconstruction) or restart from a snapshot")
        }
        else if (removes.isEmpty && adds.isEmpty) Seq.empty // metadata-only
        else if (removes.isEmpty)
          adds.map(p => (p, v, Some("insert"), none))
        // layout-only rewrite: identical multisets, nothing changed
        else if (ops.exists(LayoutOps)) Seq.empty
        // overwrite: removed files ARE the deletes, added the inserts —
        // MINUS any pre-commit mask (rows a dv version already reported
        // dead must not re-report here; positions ride the partition and
        // the row reader skips them)
        else if (ops.contains("overwrite")) {
          val dvsBefore = liveState(spark, tableDir, v - 1)._2
            .filter(kv => removes.contains(kv._1))
          val pos = dvPositionsFor(spark, tableDir, dvsBefore, removes)
          removes.map(p =>
            (p, v, Some("delete"), pos.getOrElse(p, none))) ++
            adds.map(p => (p, v, Some("insert"), none))
        }
        else if (hasCdf(tableDir, v)) {
          val c = cdfDir(tableDir, v)
          if (!LayoutDirs.hasParquetData(c)) Seq.empty // OPTIMIZE marker
          else LayoutDirs.dataFiles(c)
            .map(p => (p, v, None: Option[String], none))
        } else throw new IllegalStateException(
          s"readChangeFeed: version $v is a DML change commit with no " +
            s"stored change data (cdf/version=$v missing — the table did " +
            "not have CDF enabled when it committed, or its cdf publish " +
            "crashed mid-commit) — CommitLogIngest.setCdfEnabled(dir) " +
            "before future DML, and read this range through " +
            "CommitLogIngest.changeFeed (read-time diff) or restart from " +
            "a snapshot")
      }
    }
  }

  /** The data files the commit range (from, to] ADDED — the planning half
    * of [[changes]], shared with the DSv2 streaming source (which turns
    * each path into an input partition instead of a DataFrame).
    *
    * CHANGE COMMITS (a version with removes — DML rewrite, OPTIMIZE): the
    * files such a version ADDS carry rows that earlier versions already
    * delivered, so streaming them is duplicate delivery. The Delta rule
    * applies: FAIL by default (a change feed over a mutating range needs
    * an explicit decision), or with `skipChangeCommits` deliver only the
    * pure-append versions (mutations are not reflected downstream). A
    * FRESH consumer resolving through a checkpoint is unaffected — the
    * checkpoint is the collapsed LIVE set, where rewrites have already
    * been applied; only real version dirs in the tail are classified. */
  private[graft] def addedFiles(spark: SparkSession, tableDir: String,
      fromExclusive: Long, toInclusive: Long,
      skipChangeCommits: Boolean = false): Seq[String] = {
    val logDir = s"$tableDir/log"
    // a FRESH consumer (from = -1) on a retention-pruned log: the table
    // is append-only, so the cumulative adds through a checkpoint ARE
    // its live set — compose best checkpoint ≤ to + surviving tail (also
    // cheaper than reading every version dir on a long history). A
    // mid-stream consumer (from ≥ 0) must see real version dirs: a gap
    // there is retention past its position, which is data loss for it.
    // retention guard for a MID-STREAM consumer (from >= 0): log
    // partitions at or below the latest checkpoint are deletable, and
    // empty batches land tombstone versions, so a MISSING dir at or below
    // that floor is always retention that pruned past this consumer's
    // position — data loss for it. Fail loudly instead of silently
    // skipping those versions' rows (above the floor nothing may be
    // pruned, so a missing dir there is just a never-committed id).
    if (fromExclusive >= 0) {
      val floor = checkpointsOnDisk(tableDir).lastOption.getOrElse(-1L)
      val pruned = ((fromExclusive + 1) to math.min(toInclusive, floor))
        .filterNot(v => LayoutDirs.hasParquetData(s"$logDir/version=$v"))
      require(pruned.isEmpty,
        s"changes($fromExclusive, $toInclusive]: versions " +
          s"${pruned.mkString(",")} at or below the checkpoint floor " +
          s"$floor were retention-pruned — this consumer lost data; " +
          "restart it fresh (fromExclusive = -1)")
    }
    val c =
      if (fromExclusive < 0)
        checkpointsOnDisk(tableDir).filter(_ <= toInclusive)
          .lastOption.getOrElse(-1L)
      else -1L
    val base: Seq[String] =
      if (c >= 0) {
        val ckpt = spark.read.parquet(s"$tableDir/log_ckpt/c=$c")
        (if (ckpt.columns.contains("action"))
           ckpt.filter(col("action") === "add")
         else ckpt)
          .select("path").collect().map(_.getString(0)).toSeq
      } else Seq.empty
    val dirs = ((math.max(fromExclusive, c) + 1) to toInclusive)
      .map(v => s"$logDir/version=$v").filter(LayoutDirs.hasParquetData)
    require(base.nonEmpty || dirs.nonEmpty,
      s"changes($fromExclusive, $toInclusive]: no committed version " +
        s"in range under $logDir (retention pruned past this consumer?)")
    val tail: Seq[String] =
      if (dirs.isEmpty) Seq.empty
      else {
        val t = spark.read.option("basePath", logDir).parquet(dirs: _*)
          .select(col("version").cast("long").as("v"), col("action"),
            col("path"))
        // a deletion-vector commit is a CHANGE commit too: it adds no
        // files, but rows earlier versions delivered are now dead —
        // an unaware incremental consumer must fail (or explicitly skip)
        // exactly like it does for a CoW rewrite
        val changeVersions = t.filter(col("action").isin("remove", "dv"))
          .select("v").distinct().collect().map(_.getLong(0)).toSet
        if (changeVersions.nonEmpty && !skipChangeCommits)
          throw new IllegalStateException(
            s"changes($fromExclusive, $toInclusive]: versions " +
              s"${changeVersions.toSeq.sorted.mkString(",")} are CHANGE " +
              "commits (DML rewrite / OPTIMIZE) — their added files " +
              "re-carry rows earlier versions already delivered. Pass " +
              "skipChangeCommits=true (option \"skipChangeCommits\" on " +
              "the stream) to deliver appends only, or restart the " +
              "consumer fresh from the latest snapshot")
        val adds = t.filter(col("action") === "add")
        (if (changeVersions.isEmpty) adds
         else adds.filter(!col("v").isin(changeVersions.toSeq: _*)))
          .select("path").collect().map(_.getString(0)).toSeq
      }
    base ++ tail
  }

  /** Start the commit loop. `triggerSec <= 0` drops the processing-time
    * trigger (micro-batches fire as data lands — the test/bench mode);
    * `statsCol` turns on commit-time per-file stats capture. */
  def start(rows: DataFrame, tableDir: String, checkpointDir: String,
      triggerSec: Int = 1, statsCol: Option[String] = None)
      : StreamingQuery = {
    val w = rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitOnce(batch, tableDir, batchId, statsCol)
      }
    (if (triggerSec > 0)
       w.trigger(Trigger.ProcessingTime(s"$triggerSec seconds"))
     else w).start()
  }
}

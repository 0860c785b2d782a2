package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      val base = spark.read.parquet(s"$tableDir/log_ckpt/c=$c")
        .select(col("v").cast("long").as("version"),
          lit("add").as("action"), col("path"))
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
    actionRows(spark, tableDir, upTo, ckptBelow = upTo)
      .groupBy(col("path"))
      .agg(max_by(col("action"), col("version")).as("last"),
        max(col("version")).as("v"))
      .filter(col("last") === "add")
      .select(col("path"), col("v"))
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
      batch.write.mode("overwrite").parquet(dataDir)
      statsCol.foreach { k =>
        spark.read.parquet(dataDir)
          .groupBy(input_file_name().as("path"))
          .agg(min(col(k)).as("min_key"), max(col(k)).as("max_key"),
            count(lit(1)).as("rows"))
          .withColumn("path", LayoutDirs.plainPath(col("path")))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$tableDir/index/version=$batchId")
        recordIndexCol(tableDir, k)
      }
      import spark.implicits._
      LayoutDirs.dataFiles(dataDir).map(("add", _)).toDF("action", "path")
        .coalesce(1).write.mode("overwrite").parquet(versionDir)
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

  private[graft] def recordIndexCol(tableDir: String, k: String): Unit = {
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
      version: Long): Seq[String] = {
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
    val files = actionRows(spark, tableDir, version)
      .groupBy(col("path"))
      .agg(max_by(col("action"), col("version")).as("last"))
      .filter(col("last") === "add")
      .select("path").collect().map(_.getString(0)).toSeq.sorted
    if (files.isEmpty)
      throw new IllegalStateException(
        s"no live files at version $version: the table is append-only, " +
          "so this version's history predates the oldest surviving " +
          "checkpoint and was retention-pruned — read at a version >= " +
          s"${checkpointsOnDisk(tableDir).headOption.getOrElse(-1L)}")
    files
  }

  /** The table at `version` (or the latest committed version when
    * negative) — the TimeTravel read over this stream's log. */
  def snapshot(spark: SparkSession, tableDir: String,
      version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(tableDir)
    spark.read.parquet(liveFiles(spark, tableDir, v): _*)
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
    val live = liveFiles(spark, tableDir, latestVersion(tableDir))
    val files = spark.read.parquet(s"$tableDir/index")
      .filter(col("path").isin(live: _*))
      .filter(col("min_key") <= key && col("max_key") >= key)
      .select("path").collect().map(_.getString(0)).toSeq
    if (files.isEmpty)
      // empty result, O(1): one file supplies the schema, the false
      // filter folds to an empty relation — never plan over the live set
      spark.read.parquet(live.take(1): _*).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(col(statsCol) === key)
  }

  /** The rows the commit range (from, to] appended — the "read the table
    * AS a stream" contract (the Delta streaming-source shape): for an
    * append-only table the change feed of a version range is exactly the
    * files those versions added, so an incremental consumer pays O(new
    * data) per poll — it never diffs snapshots and never rescans the
    * table. Version dirs are addressed directly (no log listing). */
  def changes(spark: SparkSession, tableDir: String, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    val paths = addedFiles(spark, tableDir, fromExclusive, toInclusive)
    if (paths.isEmpty) {
      // the range holds only metadata versions (empty-batch tombstones /
      // schema actions) — a legitimate zero-row poll, NOT an error. The
      // schema comes from one live file of the snapshot at `toInclusive`
      // (folded to an empty relation by the false filter, so nothing is
      // actually scanned); a table with no data commits at all still
      // fails loudly through liveFiles' contract guard.
      val live = liveFiles(spark, tableDir, toInclusive)
      spark.read.parquet(live.take(1): _*).filter(lit(false))
    } else spark.read.parquet(paths: _*)
  }

  /** The data files the commit range (from, to] ADDED — the planning half
    * of [[changes]], shared with the DSv2 streaming source (which turns
    * each path into an input partition instead of a DataFrame). */
  private[graft] def addedFiles(spark: SparkSession, tableDir: String,
      fromExclusive: Long, toInclusive: Long): Seq[String] = {
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
      if (c >= 0)
        spark.read.parquet(s"$tableDir/log_ckpt/c=$c")
          .select("path").collect().map(_.getString(0)).toSeq
      else Seq.empty
    val dirs = ((math.max(fromExclusive, c) + 1) to toInclusive)
      .map(v => s"$logDir/version=$v").filter(LayoutDirs.hasParquetData)
    require(base.nonEmpty || dirs.nonEmpty,
      s"changes($fromExclusive, $toInclusive]: no committed version " +
        s"in range under $logDir (retention pruned past this consumer?)")
    val tail: Seq[String] =
      if (dirs.isEmpty) Seq.empty
      else spark.read.option("basePath", logDir).parquet(dirs: _*)
        .filter(col("action") === "add")
        .select("path").collect().map(_.getString(0)).toSeq
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

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
  * log partition written. So the two crash windows both heal: crash
  * between data-write and log-commit replays into a clean rewrite;
  * crash between log-commit and marker replays into a marker repair,
  * never a duplicate version or a dangling path. On a real object store
  * the per-version log commit needs put-if-absent (the Delta
  * `_delta_log/N.json` contention rule); a local filesystem test gets
  * atomicity from the single writer.
  *
  * Log CHECKPOINTING (the Delta `checkpoint.parquet` shape): a log that
  * grows one partition per commit makes every snapshot read O(commits).
  * Every [[CheckpointEvery]] versions the RESOLVED live set (path +
  * its add version) is written to `log_ckpt/c=N`, and snapshot reads at
  * or above N replay checkpoint + tail only — the tail filter is a
  * partition prune on the `version=` dirs, so the read opens a bounded
  * handful of log files no matter how long the stream has run. Log
  * partitions at or below the checkpoint become RETENTION: they can be
  * deleted (bounding log storage) at the cost of time travel below the
  * checkpoint, and `StreamingCommitSpec` proves the latest snapshot
  * survives exactly that deletion. */
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

  private def dataFiles(dir: String): Seq[String] = {
    val s = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }.map(_.toString).toList.sorted
    } finally s.close()
  }

  private def writeMarker(path: java.nio.file.Path, v: Long): Unit = {
    Files.createDirectories(path.getParent)
    Files.write(path, v.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Resolve the live set at `upTo` from the full log and persist it as
    * the checkpoint `log_ckpt/c=<upTo>` (never overwritten — older
    * checkpoints stay valid for readers that already picked them up). */
  private def writeLogCheckpoint(spark: SparkSession, tableDir: String,
      upTo: Long): Unit = {
    spark.read.parquet(s"$tableDir/log")
      .filter(col("version") <= upTo)
      .groupBy(col("path"))
      .agg(max_by(col("action"), col("version")).as("last"),
        max(col("version")).cast("long").as("v"))
      .filter(col("last") === "add")
      .select(col("path"), col("v"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tableDir/log_ckpt/c=$upTo")
    writeMarker(ckptMarkerPath(tableDir), upTo)
  }

  /** Commit one micro-batch as table version `batchId`, exactly once.
    * With `statsCol` set, per-file min/max/count stats over that column
    * are captured AT COMMIT TIME into `index/version=N` — the streaming
    * half of the E-123 story (the batch side is `TimeTravel.appendIndex`):
    * index rows are keyed by immutable path, written in the same
    * idempotence unit as the log version, so the index can never refer
    * to a version the log doesn't have. */
  private[graft] def commitOnce(batch: DataFrame, tableDir: String,
      batchId: Long, statsCol: Option[String] = None): Unit = {
    if (batchId <= lastCommitted(tableDir)) return
    if (batch.isEmpty) return // no empty versions (the Delta discipline)
    val spark = batch.sparkSession
    val versionDir = s"$tableDir/log/version=$batchId"
    if (!LayoutDirs.hasParquetData(versionDir)) {
      val dataDir = s"$tableDir/data/b$batchId"
      batch.write.mode("overwrite").parquet(dataDir)
      statsCol.foreach { k =>
        spark.read.parquet(dataDir)
          .groupBy(input_file_name().as("path"))
          .agg(min(col(k)).as("min_key"), max(col(k)).as("max_key"),
            count(lit(1)).as("rows"))
          .withColumn("path",
            when(col("path").startsWith("file:"),
              regexp_replace(col("path"), "^file:(//)?", ""))
              .otherwise(col("path")))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$tableDir/index/version=$batchId")
      }
      import spark.implicits._
      dataFiles(dataDir).map(("add", _)).toDF("action", "path")
        .coalesce(1).write.mode("overwrite").parquet(versionDir)
    }
    if ((batchId + 1) % CheckpointEvery == 0)
      writeLogCheckpoint(spark, tableDir, batchId)
    writeMarker(markerPath(tableDir), batchId)
  }

  /** Point lookup at the latest version through log + commit-time index:
    * live paths from the log, overlap prune from the index, then a scan
    * over only the matching files with the key filter pushed down. */
  def pointRead(spark: SparkSession, tableDir: String, statsCol: String,
      key: Long): DataFrame = {
    val live = liveFiles(spark, tableDir, latestVersion(tableDir))
    val files = spark.read.parquet(s"$tableDir/index")
      .filter(col("path").isin(live: _*))
      .filter(col("min_key") <= key && col("max_key") >= key)
      .select("path").collect().map(_.getString(0)).toSeq
    spark.read.parquet(files: _*).filter(col(statsCol) === key)
  }

  /** Highest COMMITTED version, from ONE driver-side dir listing of the
    * `version=` partitions (no Spark job over the log; Delta avoids even
    * the listing with its `_last_checkpoint` pointer — one fs op either
    * way, never a scan). A version dir exists from the moment its write
    * STARTS (the committer's _temporary phase), so a concurrent reader
    * polling offsets mid-commit must not see it yet: only dirs whose
    * part file has landed (= the log write's job commit, the atomic
    * rename) count. */
  def latestVersion(tableDir: String): Long = {
    val d = Paths.get(s"$tableDir/log")
    if (!Files.exists(d)) return -1L
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("version=") =>
          n.stripPrefix("version=").toLong }
        .filter(v => LayoutDirs.hasParquetData(s"$tableDir/log/version=$v"))
        .foldLeft(-1L)(math.max)
    } finally s.close()
  }

  /** The live file set at `version`: checkpoint + tail when a usable
    * checkpoint exists, full log replay otherwise. The tail is addressed
    * by EXPLICIT version dirs (the Delta `N.json` direct-naming shape),
    * so the resolution reads O(tail) log files — it never lists or scans
    * the O(commits) log history. */
  private[graft] def liveFiles(spark: SparkSession, tableDir: String,
      version: Long): Seq[String] = {
    val logDir = s"$tableDir/log"
    val c = lastCheckpoint(tableDir)
    val resolved =
      if (c >= 0 && version >= c) {
        val base = spark.read.parquet(s"$tableDir/log_ckpt/c=$c")
          .select(col("v").as("version"), lit("add").as("action"),
            col("path"))
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
    resolved.groupBy(col("path"))
      .agg(max_by(col("action"), col("version")).as("last"))
      .filter(col("last") === "add")
      .select("path").collect().map(_.getString(0)).toSeq.sorted
  }

  /** The table at `version` (or the latest committed version when
    * negative) — the TimeTravel read over this stream's log. */
  def snapshot(spark: SparkSession, tableDir: String,
      version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(tableDir)
    spark.read.parquet(liveFiles(spark, tableDir, v): _*)
  }

  /** The rows the commit range (from, to] appended — the "read the table
    * AS a stream" contract (the Delta streaming-source shape): for an
    * append-only table the change feed of a version range is exactly the
    * files those versions added, so an incremental consumer pays O(new
    * data) per poll — it never diffs snapshots and never rescans the
    * table. Version dirs are addressed directly (no log listing). */
  def changes(spark: SparkSession, tableDir: String, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    val logDir = s"$tableDir/log"
    val dirs = ((fromExclusive + 1) to toInclusive)
      .map(v => s"$logDir/version=$v").filter(LayoutDirs.hasParquetData)
    require(dirs.nonEmpty, {
      val ls = try java.nio.file.Files.list(Paths.get(logDir))
        .toArray.mkString(", ") catch { case e: Exception => e.toString }
      s"changes($fromExclusive, $toInclusive]: no committed version dirs; log contains: $ls"
    })
    val paths = spark.read.option("basePath", logDir).parquet(dirs: _*)
      .filter(col("action") === "add")
      .select("path").collect().map(_.getString(0)).toSeq
    require(paths.nonEmpty,
      s"changes($fromExclusive, $toInclusive]: no added files " +
        s"(version dirs with data: ${dirs.mkString(", ")})")
    spark.read.parquet(paths: _*)
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

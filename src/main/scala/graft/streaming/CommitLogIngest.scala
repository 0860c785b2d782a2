package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest INTO the commit-log table format (the write-path
  * companion of `sources/TimeTravel`): each micro-batch lands as ONE
  * table version — the batch's rows are written to a fresh immutable
  * file set, then add-actions for those files are appended to the log
  * as a single version. Readers compose unchanged: "the table at
  * version V" is the log's last-action-wins path set, so a reader
  * pinned at V is isolated from every later commit, and the latest
  * snapshot is always a consistent prefix of the stream — the
  * lakehouse contract a 100-TB pipeline lands raw data under.
  *
  * Replay safety (at-least-once foreachBatch): the LOG is the source of
  * truth, not the marker. A replayed batch first consults the log — if
  * its version is already committed, only the fast-path marker is
  * repaired; if not, the data dir is rewritten (clobbering any partial
  * files a crash left, which nothing references yet) and the log
  * appended. So the two crash windows both heal: crash between
  * data-write and log-append replays into a clean rewrite; crash
  * between log-append and marker replays into a marker repair, never a
  * duplicate version or a dangling path. On a real object store the
  * log append itself needs put-if-absent (the Delta `_delta_log/N.json`
  * contention rule); a local filesystem test gets atomicity from the
  * single writer. */
object CommitLogIngest {

  private def markerPath(dir: String) = Paths.get(dir, "_last_batch")

  private[graft] def lastCommitted(dir: String): Long =
    try new String(Files.readAllBytes(markerPath(dir)), "UTF-8").trim.toLong
    catch { case _: Exception => -1L }

  private def logHasVersion(spark: SparkSession, logDir: String,
      version: Long): Boolean =
    Files.exists(Paths.get(logDir)) &&
      graft.sources.LayoutDirs.hasParquetData(logDir) &&
      !spark.read.parquet(logDir)
        .filter(col("version") === version).isEmpty

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

  private def writeMarker(tableDir: String, batchId: Long): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    Files.write(markerPath(tableDir), batchId.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Commit one micro-batch as table version `batchId`, exactly once. */
  private[graft] def commitOnce(
      batch: DataFrame, tableDir: String, batchId: Long): Unit = {
    if (batchId <= lastCommitted(tableDir)) return
    if (batch.isEmpty) return // no empty versions (the Delta discipline)
    val spark = batch.sparkSession
    val logDir = s"$tableDir/log"
    if (!logHasVersion(spark, logDir, batchId)) {
      val dataDir = s"$tableDir/data/b$batchId"
      batch.write.mode("overwrite").parquet(dataDir)
      import spark.implicits._
      dataFiles(dataDir).map((batchId, "add", _))
        .toDF("version", "action", "path")
        .coalesce(1).write.mode("append").parquet(logDir)
    }
    writeMarker(tableDir, batchId)
  }

  /** The table at `version` (or the latest committed version when
    * negative) — the TimeTravel read over this stream's log. */
  def snapshot(spark: SparkSession, tableDir: String,
      version: Long = -1L): DataFrame = {
    val logDir = s"$tableDir/log"
    val v =
      if (version >= 0) version
      else spark.read.parquet(logDir).agg(max(col("version")))
        .head().getLong(0)
    val files = graft.sources.TimeTravel.snapshotFiles(spark, logDir, v)
    spark.read.parquet(files: _*)
  }

  /** Start the commit loop. `triggerSec <= 0` drops the processing-time
    * trigger (micro-batches fire as data lands — the test/bench mode). */
  def start(rows: DataFrame, tableDir: String, checkpointDir: String,
      triggerSec: Int = 1): StreamingQuery = {
    val w = rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitOnce(batch, tableDir, batchId)
      }
    (if (triggerSec > 0)
       w.trigger(Trigger.ProcessingTime(s"$triggerSec seconds"))
     else w).start()
  }
}

package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.IncrementalRollup

/** The maintenance loop that keeps `IncrementalRollup`'s materialized
  * (day, event_type) rollup live against a STREAM of raw events: each
  * micro-batch aggregates alone and merges by dynamic-partition-overwrite
  * of only the days it touches — O(batch) work per trigger, independent
  * of how large the accumulated rollup (or its 100-TB base table) has
  * grown. This is the production shape of E-115: the batch operator is
  * the merge; the stream is just its driver.
  *
  * Replay safety: `foreachBatch` is at-least-once — after a failure the
  * SAME batchId re-runs, and a blind re-merge would double-count its
  * partials. The standard idempotence gate applies: the last merged
  * batchId is persisted in a `_last_batch` marker beside the layout
  * (underscore-prefixed, so parquet readers ignore it) and any batch
  * with `batchId <= marker` is skipped. The marker is written AFTER the
  * merge commits, so the one remaining hazard is a crash between merge
  * and marker — the same at-least-once window the reference accepts for
  * its DLQ replay (main.go:302-321); closing it fully requires a
  * transactional table format, which plain parquet directories are not.
  * `RollupMaintenanceSpec` pins batch-parity, replay idempotence, and
  * restart-from-checkpoint continuity. */
object RollupMaintenance {

  private def markerPath(dir: String) = Paths.get(dir, "_last_batch")

  private[graft] def lastMerged(dir: String): Long =
    try new String(Files.readAllBytes(markerPath(dir)), "UTF-8").trim.toLong
    catch { case _: Exception => -1L }

  /** Merge one micro-batch exactly once per batchId (idempotent under
    * foreachBatch replay). */
  private[graft] def mergeOnce(
      batch: DataFrame, dir: String, batchId: Long): Unit =
    if (batchId > lastMerged(dir)) {
      IncrementalRollup.mergeDelta(batch.sparkSession, dir, batch)
      Files.createDirectories(Paths.get(dir))
      Files.write(markerPath(dir), batchId.toString.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
    }

  /** Start the maintenance stream over raw events (canonical nanos-LONG
    * `ts`, `event_type`, `value` columns — the `Tables.events` shape).
    * `triggerSec <= 0` drops the processing-time trigger entirely
    * (micro-batches fire as soon as data is available — the bench mode;
    * production picks the cadence). */
  def start(events: DataFrame, rollupDir: String, checkpointDir: String,
      triggerSec: Int = 1): StreamingQuery = {
    val w = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeOnce(batch, rollupDir, batchId)
      }
    (if (triggerSec > 0)
       w.trigger(Trigger.ProcessingTime(s"$triggerSec seconds"))
     else w).start()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.ProxyFunctions._

/** Structured-Streaming realization of the reference's ingest loop
  * (/root/reference/main.go:275-299 — SURVEY.md §2.5).
  *
  * Reference model: requests buffer in a map keyed by full URI; every
  * `syncsec` seconds the map is swapped out wholesale and each (key,
  * concatenated-bodies) pair is POSTed downstream; failures spill to a
  * disk DLQ with a retry level that escalates per attempt, tombstoning at
  * 10 (main.go:365-373). No state crosses flush ticks.
  *
  * Spark mapping: `Trigger.ProcessingTime(syncSec)` + `foreachBatch`. Each
  * micro-batch is an independent, complete hash aggregation (exactly the
  * swap-then-send semantics: no cross-batch state), then the sink sends one
  * POST per group; failed groups append to a DLQ parquet with `level + 1`.
  * Checkpointing makes delivery at-least-once — strictly stronger than the
  * reference, which acks before flush (main.go:207-218) and can lose a
  * not-yet-flushed buffer on crash.
  *
  * Scale notes: the per-batch aggregation is a standard partial+final hash
  * agg (the reference serializes every request through ONE mutex — Spark
  * partial aggregation is the distributed version of that same combine).
  * The DLQ is parquet partitioned by `level`, so the replayer's
  * `level < 10` filter is partition pruning, mirroring the reference's
  * skip-by-filename-prefix without reading tombstones.
  */
object IngestPipeline {

  /** Downstream batch sink (one POST per aggregated group). Returns true on
    * success. Implementations must be Serializable: the live flush invokes
    * send() on EXECUTORS (one per aggregated group, from the partition that
    * owns it); the DLQ replayer invokes it on the driver. */
  trait BatchSink extends Serializable {
    def send(uri: String, body: String, rows: Long): Boolean
  }

  /** Per-micro-batch aggregation — the reference's buffer map as one
    * hash-agg over the batch: group by full URI, concatenate bodies with
    * the format delimiter, count rows with raw-substring semantics. One
    * pass through the fused [[org.apache.spark.sql.graft.ConcatCount]]
    * TypedImperativeAggregate (append+count in a single buffer, like the
    * reference's `Buffer{rowcount, buffer}` — no intermediate collect_list
    * array, and no kryo at the partial/final boundary). */
  def aggregateBatch(batch: DataFrame): DataFrame = {
    batch
      // O-14 (main.go:219-221): empty bodies are rejected at ingest (the
      // reference answers 405 and buffers nothing)
      .filter(col("body").isNotNull && length(col("body")) > 0)
      .select(col("uri"), col("body"),
        rowCount(col("uri"), col("body")).as("rows_in"),
        delimiterOf(col("uri")).as("delim"))
      .groupBy(col("uri"))
      .agg(org.apache.spark.sql.graft.ConcatCount(
          col("body"), col("rows_in"), col("delim")).as("cc"),
        sum(length(col("body"))).cast("long").as("bytes_in"))
      .select(col("uri"), col("cc.body").as("body"), col("cc.rows").as("rows"),
        col("cc.reqs").as("reqs"), col("bytes_in"))
  }

  /** Serializes every DLQ append in this JVM: the live stream's failure
    * spill (foreachBatch) and the replayer thread's escalation spill both
    * target the same directory, and two CONCURRENT parquet append jobs
    * share `dlqDir/_temporary` — whichever commits first deletes the
    * other's staged task files (silent row loss). All DLQ writes go
    * through this lock; spills are rare, so serializing them is free. */
  private val dlqWriteLock = new Object

  def spill(spark: SparkSession,
      rows: Seq[(String, String, Long, Int)], dlqDir: String): Unit = {
    import spark.implicits._
    // wall-clock nanos (not System.nanoTime, whose origin is arbitrary per
    // JVM): oldest-first replay order must survive a process restart, like
    // the reference's time.Now().UnixNano() filenames (main.go:365-373)
    // parallelize with bounded slices, NOT rows.toDF: a LocalRelation
    // ships the WHOLE row set inside every task binary (Spark warns
    // "task of very large size" at ~2 MB for a 100k-row spill, and the
    // pattern becomes a driver/task OOM as spills grow); sliced
    // parallelize serializes each task only its own rows
    val slices = math.max(1, math.min(32, rows.length / 8192))
    val df = spark.sparkContext.parallelize(rows, slices)
      .toDF("uri", "body", "rows", "level")
      .withColumn("ts_nano", lit(System.currentTimeMillis() * 1000000L))
    dlqWriteLock.synchronized {
      df.write.mode("append").partitionBy("level").parquet(dlqDir)
    }
  }

  /** Start the ingest stream: micro-batch agg + send + DLQ spill on a
    * processing-time trigger. `source` must be a streaming DataFrame with
    * (uri STRING, body STRING) columns. */
  def start(source: DataFrame, dlqDir: String, checkpointDir: String,
      sink: BatchSink, syncSec: Int = 2,
      metrics: Option[graft.sinks.MetricStorage] = None): StreamingQuery = {
    val spark = source.sparkSession
    source
      // O-4/O-33: the reference's atomic in/bytes counters as observable
      // metrics — surfaced per micro-batch on StreamingQueryProgress
      // without a second pass over the data
      .observe("graft_ingest", count(lit(1)).as("reqs_received"),
        coalesce(sum(length(col("body"))), lit(0L)).as("bytes_received"))
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$syncSec seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        // Executor-side sends: each aggregated group is POSTed from the
        // partition that owns it — the concatenated bodies NEVER visit the
        // driver (collecting them would put the whole flush in driver heap
        // at 100 TB/day). The driver sees only per-group metric tuples.
        // persist() pins the send results so the two downstream actions
        // (metrics collect + failure spill) don't re-send.
        val attempted = aggregateBatch(batch)
          .as[(String, String, Long, Long, Long)]
          .mapPartitions(_.map { case (uri, body, nRows, reqs, bytesIn) =>
            val t0 = System.nanoTime()
            val ok = sink.send(uri, body, nRows)
            (uri, if (ok) "" else body, nRows, reqs, bytesIn,
              body.length.toLong, ok, (System.nanoTime() - t0) / 1000000L)
          })
          .toDF("uri", "body", "rows", "reqs", "bytes_in", "body_len", "ok",
            "dur_ms")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val stats = attempted
            .select("uri", "rows", "reqs", "bytes_in", "body_len", "ok",
              "dur_ms")
            .collect()
          metrics.foreach(m => stats.foreach { r =>
            m.onIngest(r.getAs[String]("uri"), r.getAs[Long]("reqs"),
              r.getAs[Long]("bytes_in"))
            m.onSendDuration(r.getAs[Long]("dur_ms"))
            if (r.getAs[Boolean]("ok"))
              m.onSend(r.getAs[String]("uri"), r.getAs[Long]("rows"),
                r.getAs[Long]("body_len"))
            else m.onSendError(r.getAs[String]("uri"))
          })
          if (stats.exists(!_.getAs[Boolean]("ok")))
            dlqWriteLock.synchronized {
              attempted.filter(!col("ok"))
                .select(col("uri"), col("body"), col("rows"),
                  lit(1).as("level"),
                  lit(System.currentTimeMillis() * 1000000L).as("ts_nano"))
                .write.mode("append").partitionBy("level").parquet(dlqDir)
            }
        } finally attempted.unpersist()
      }
      .start()
  }

  /** Live (level < 10) DLQ part files, ordered by (level asc, file age
    * asc). Level comes from the `level=N` partition directory name; file
    * age orders spill generations within a level like the reference's
    * time-nanos filenames (main.go:365-373). */
  private def liveFiles(dir: java.io.File): Seq[(Int, java.io.File)] =
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("level="))
      .flatMap { d =>
        val lvl = d.getName.stripPrefix("level=").toInt
        if (lvl >= 10) None else Some((lvl, d)) // tombstones never read
      }
      .sortBy(_._1)
      .flatMap { case (lvl, d) =>
        Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .sortBy(f => (f.lastModified(), f.getName))
          .map((lvl, _))
      }.toSeq

  /** One replay pass over the DLQ (reference main.go:447-485): live
    * entries (level < 10 — tombstone partitions never read), oldest
    * level/file first, re-send, escalate failures, delete.
    *
    * Per-FILE processing, like the reference's checkErr which deletes only
    * each processed file (main.go db.DeleteFile()): the file list is
    * snapshotted up front, so batches spilled concurrently by the live
    * stream are untouched; escalations are appended BEFORE the source file
    * is deleted, so a crash in between duplicates (at-least-once) but never
    * loses. Rows stream to the driver via `toLocalIterator` (one partition
    * resident at a time — a multi-GB failed batch never collects whole)
    * and failures re-spill in [[RespillChunk]]-row chunks, so driver
    * memory is bounded by max(one partition, one chunk) regardless of
    * spill-file size. Sends stay sequential on the driver — that is what
    * preserves the reference's strict oldest-first replay order and its
    * 1-per-second pacing (parallel executor-side sends would break both).
    *
    * `paceMillis` throttles sends (reference sleeps 1 s between replays,
    * main.go:480 — O-35); `maxFiles` bounds one pass over a large backlog.
    * Returns (sent, respilled). */
  def replayOnce(spark: SparkSession, dlqDir: String, sink: BatchSink,
      paceMillis: Long = 0L, maxFiles: Int = Int.MaxValue): (Long, Long) = {
    val dir = new java.io.File(dlqDir)
    if (!dir.exists()) return (0L, 0L)
    var sent = 0L
    var respilled = 0L
    liveFiles(dir).take(maxFiles).foreach { case (lvl, f) =>
      // Spark-side sort + toLocalIterator: rows arrive oldest-first
      // (O-34) one partition at a time, never the whole file at once
      val it = spark.read.parquet(f.getAbsolutePath)
        .select("uri", "body", "rows", "ts_nano")
        .sort("ts_nano")
        .toLocalIterator()
      val failedBuf =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Int)]
      var nRows = 0L
      var nFailed = 0L
      while (it.hasNext) {
        val r = it.next()
        nRows += 1
        if (paceMillis > 0) Thread.sleep(paceMillis)
        // faithful quirk: the reference replays with rowcount=1 regardless
        // of the batch's true row count (main.go:479), under-reporting
        // rows_sent for replayed batches — reproduced, not fixed (§3.3)
        val ok =
          sink.send(r.getAs[String]("uri"), r.getAs[String]("body"), rows = 1L)
        if (!ok) {
          nFailed += 1
          failedBuf += ((r.getAs[String]("uri"), r.getAs[String]("body"),
            r.getAs[Long]("rows"), lvl + 1))
          if (failedBuf.length >= RespillChunk) {
            spill(spark, failedBuf.toSeq, dlqDir)
            failedBuf.clear()
          }
        }
      }
      if (failedBuf.nonEmpty) spill(spark, failedBuf.toSeq, dlqDir)
      if (!f.delete())
        throw new java.io.IOException(
          s"DLQ replay: processed but could not delete $f — " +
            "stopping to avoid double-replay")
      sent += nRows - nFailed
      respilled += nFailed
    }
    (sent, respilled)
  }

  /** Failed replay rows re-spill to the DLQ in chunks of this many rows,
    * bounding driver memory during an all-fail replay (downstream still
    * down) to one chunk instead of one whole spill file. */
  private val RespillChunk = 10000

  /** O-3: DLQ backlog → HTTP status (main.go:228-245). Counts only live
    * files (robust to drained-empty `level=` dirs). The replayer deletes
    * files concurrently, so a listed file can vanish before the read —
    * retry with a fresh listing, then fall back to the file count (the
    * reference's own granularity, main.go:230-234) rather than letting a
    * health probe 500 on a healthy, actively-draining queue. */
  def dlqStatus(spark: SparkSession, dlqDir: String,
      warn: Int = 400, crit: Int = 500): Int = {
    val dir = new java.io.File(dlqDir)
    def rowCount(): Long = {
      val files = if (!dir.exists()) Seq.empty else liveFiles(dir)
      if (files.isEmpty) 0L
      else spark.read.parquet(files.map(_._2.getAbsolutePath): _*).count()
    }
    val n = try rowCount() catch {
      case _: Exception => try rowCount() catch {
        case _: Exception =>
          if (!dir.exists()) 0L else liveFiles(dir).size.toLong
      }
    }
    if (n >= crit) 500 else if (n >= warn) 400 else 200
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    * success. Implementations must be Serializable (executed on the driver
    * inside foreachBatch, but kept portable). */
  trait BatchSink extends Serializable {
    def send(uri: String, body: String, rows: Long): Boolean
  }

  /** Per-micro-batch aggregation — the reference's buffer map as one
    * hash-agg over the batch: group by full URI, concatenate bodies with
    * the format delimiter, count rows with raw-substring semantics. One
    * pass through the fused [[graft.functions.ConcatCountAgg]] Aggregator
    * (append+count in a single buffer, like the reference's
    * `Buffer{rowcount, buffer}` — no intermediate collect_list array). */
  def aggregateBatch(batch: DataFrame): DataFrame = {
    val fused = udaf(graft.functions.ConcatCountAgg,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING))
    batch
      // O-14 (main.go:219-221): empty bodies are rejected at ingest (the
      // reference answers 405 and buffers nothing)
      .filter(col("body").isNotNull && length(col("body")) > 0)
      .select(col("uri"), col("body"),
        rowCount(col("uri"), col("body")).as("rows_in"),
        delimiterOf(col("uri")).as("delim"))
      .groupBy(col("uri"))
      .agg(fused(col("body"), col("rows_in"), col("delim")).as("cc"),
        sum(length(col("body"))).cast("long").as("bytes_in"))
      .select(col("uri"), col("cc._1").as("body"), col("cc._2").as("rows"),
        col("cc._3").as("reqs"), col("bytes_in"))
  }

  /** Send every aggregated group; spill failures to the DLQ at
    * `level + 1`. Shared by the live path (level=0) and the replayer.
    * Metric bookkeeping mirrors the reference's send path
    * (main.go:392-434): rows/requests/bytes at 3 grains on success,
    * ch_errors on failure, wall duration either way. */
  def sendOrSpill(spark: SparkSession, agg: Array[Row], dlqDir: String,
      sink: BatchSink, levelOf: Row => Int,
      metrics: Option[graft.sinks.MetricStorage] = None): Unit = {
    val failed = agg.filter { r =>
      val uri = r.getAs[String]("uri")
      val body = r.getAs[String]("body")
      val rows = r.getAs[Long]("rows")
      val t0 = System.nanoTime()
      val ok = sink.send(uri, body, rows)
      metrics.foreach { m =>
        m.onSendDuration((System.nanoTime() - t0) / 1000000L)
        if (ok) m.onSend(uri, rows, body.length.toLong) else m.onSendError(uri)
      }
      !ok
    }
    if (failed.nonEmpty) spill(spark, failed.toSeq.map(r =>
      (r.getAs[String]("uri"), r.getAs[String]("body"),
        r.getAs[Long]("rows"), levelOf(r) + 1)), dlqDir)
  }

  def spill(spark: SparkSession,
      rows: Seq[(String, String, Long, Int)], dlqDir: String): Unit = {
    import spark.implicits._
    rows.toDF("uri", "body", "rows", "level")
      .withColumn("ts_nano", lit(System.nanoTime()))
      .write.mode("append").partitionBy("level").parquet(dlqDir)
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
        val agg = aggregateBatch(batch).collect()
        metrics.foreach(m => agg.foreach { r =>
          m.onIngest(r.getAs[String]("uri"), r.getAs[Long]("reqs"),
            r.getAs[Long]("bytes_in"))
        })
        sendOrSpill(spark, agg, dlqDir, sink, _ => 0, metrics)
      }
      .start()
  }

  /** One replay pass over the DLQ (reference main.go:447-485): read live
    * entries (level < 10 — partition-pruned), oldest level/timestamp
    * first, re-send, escalate failures, tombstone at level 10. The consumed
    * generation is atomically replaced (read → rewrite), matching the
    * reference's delete-after-scan. Returns (sent, respilled). */
  def replayOnce(spark: SparkSession, dlqDir: String,
      sink: BatchSink): (Long, Long) = {
    import spark.implicits._
    val dir = new java.io.File(dlqDir)
    if (!dir.exists() || isEmptyDir(dir)) return (0L, 0L)
    val all = spark.read.parquet(dlqDir)
      .select("uri", "body", "rows", "level", "ts_nano")
      .as[(String, String, Long, Int, Long)].collect()
    val (live, tomb) = all.partition(_._4 < 10)
    val ordered = live.sortBy(r => (r._4, r._5)) // O-34: level, then ts
    // faithful quirk: the reference replays with rowcount=1 regardless of
    // the batch's true row count (main.go:479), under-reporting rows_sent
    // for replayed batches — reproduced, not fixed (SURVEY.md §3.3)
    val failed = ordered.filter(r => !sink.send(r._1, r._2, rows = 1L))
    // rewrite the queue: failures escalate, tombstones are preserved
    val next = failed.map(r => (r._1, r._2, r._3, r._4 + 1, r._5)) ++ tomb
    val tmp = dlqDir + ".next"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
    if (next.nonEmpty)
      next.toSeq.toDF("uri", "body", "rows", "level", "ts_nano")
        .write.mode("overwrite").partitionBy("level").parquet(tmp)
    org.apache.hadoop.fs.FileUtil.fullyDelete(dir)
    if (next.nonEmpty) new java.io.File(tmp).renameTo(dir)
    ((ordered.length - failed.length).toLong, failed.length.toLong)
  }

  private def isEmptyDir(dir: java.io.File): Boolean = {
    val children = dir.listFiles()
    children == null || children.isEmpty
  }

  /** O-3: DLQ backlog → HTTP status (main.go:228-245). */
  def dlqStatus(spark: SparkSession, dlqDir: String,
      warn: Int = 400, crit: Int = 500): Int = {
    val dir = new java.io.File(dlqDir)
    val n = if (!dir.exists() || isEmptyDir(dir)) 0L
      else spark.read.parquet(dlqDir).filter(col("level") < 10).count()
    if (n >= crit) 500 else if (n >= warn) 400 else 200
  }
}

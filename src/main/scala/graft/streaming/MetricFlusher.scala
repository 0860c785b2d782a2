package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sinks.MetricStorage

/** The reference's second background loop (metric.go:21-50): every 2 s,
  * swap the counter map and push each `name value` line to Graphite —
  * skipping entirely when the map is empty.
  *
  * Realized as a Spark rate-source streaming query: the trigger cadence is
  * the flush cadence, and the foreachBatch body is pure sink I/O (no data
  * flows through the rate rows — they are a clock). This keeps the flush
  * loop inside Spark's lifecycle (start/stop/awaitTermination,
  * StreamingQueryListener) instead of a bare thread. */
object MetricFlusher {

  def start(spark: SparkSession, metrics: MetricStorage,
      transport: Seq[String] => Unit, intervalSec: Int = 2): StreamingQuery =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$intervalSec seconds"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        val lines = metrics.flushLines()
        if (lines.nonEmpty) transport(lines) // empty-map skip (metric.go:25)
      }
      .start()

  /** Production transport: Graphite plaintext over UDP. */
  def graphiteTransport(host: String, port: Int): Seq[String] => Unit =
    lines => graft.sinks.Graphite.send(lines, host, port)
}

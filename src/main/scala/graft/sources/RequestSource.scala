package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources for the ingest pipeline (SURVEY.md §2.1 O-1).
  *
  * The reference's source is an HTTP listener producing (uri, body) pairs
  * (/root/reference/main.go:164-226). In Spark the equivalents are:
  *  - batch: any DataFrame with (uri, body) — e.g. the synthesized
  *    request stream over events.parquet (ProxyQueries.requests);
  *  - streaming: `MemoryStream` in tests, or this file-drop source — a
  *    directory watched by Structured Streaming where each JSON line is
  *    one request. A real deployment would front it with an HTTP
  *    receiver writing to the drop directory (or Kafka); the engine-side
  *    contract is identical.
  */
object RequestSource {

  val schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("recv_ts", TimestampType, nullable = true)))

  /** Streaming (uri, body, recv_ts) rows from JSON-lines files dropped
    * into `dir`. maxFilesPerTrigger bounds micro-batch size — the
    * backpressure knob the reference lacks. */
  def fileStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
}

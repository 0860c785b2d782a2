package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The driver regenerates testdata between (and within) rounds and has
  * shipped `events.ts` as TIMESTAMP(NANOS) and as TIMESTAMP(MICROS,
  * isAdjustedToUTC=false). `Tables.events` must surface ONE canonical
  * type — nanos-since-epoch LONG — for every physical encoding, so the
  * ten `ts`-arithmetic query sites never see schema drift (round 7: all
  * ten failed analysis when the on-disk type changed under a reader
  * pinned to NANOS). */
class EventsSchemaSpec extends SparkSuite {

  private val epochMicros = 1704067207179575L // 2024-01-01 00:00:07.179575

  private def dir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-events-schema")
    d.toFile.deleteOnExit()
    d
  }

  private def loadTs(sfDir: String): (org.apache.spark.sql.types.DataType, Long) = {
    val df = graft.model.Tables.events(spark, sfDir)
    (df.schema("ts").dataType, df.select(col("ts")).head().getLong(0))
  }

  test("timestamp-micros parquet (current testdata) normalizes to nanos long") {
    val s = spark
    import s.implicits._
    val d = dir()
    // session TZ is UTC, so this Timestamp writes the same micros value a
    // naive (isAdjustedToUTC=false) writer like pandas stores
    Seq((1L, new Timestamp(epochMicros / 1000), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val (tpe, v) = loadTs(d.toString)
    assert(tpe == LongType)
    assert(v == (epochMicros / 1000) * 1000000L) // millis precision in ctor
  }

  test("timestamp-millis parquet normalizes to nanos long") {
    val s = spark
    import s.implicits._
    val d = dir()
    val prev = s.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      Seq((1L, new Timestamp(epochMicros / 1000), 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    } finally s.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val (tpe, v) = loadTs(d.toString)
    assert(tpe == LongType)
    assert(v == (epochMicros / 1000) * 1000000L)
  }

  test("plain int64 ts (our sf1 generator round-trip) passes through as nanos") {
    val s = spark
    import s.implicits._
    val d = dir()
    val nanos = epochMicros * 1000L
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val (tpe, v) = loadTs(d.toString)
    assert(tpe == LongType)
    assert(v == nanos)
  }

  test("normalized ts agrees with DuckDB's epoch_ms view of the real testdata") {
    // the oracles compute epoch_ms(ts); our canonical nanos div 1e6 must be
    // the same integer instant on the actual driver-generated parquet
    val df = graft.model.Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == LongType)
    val ms = df.select((col("ts") / lit(1000000L)).cast("long")).head().getLong(0)
    // a units slip (nanos-vs-micros confusion) is a 1000× shift that lands
    // millennia away, so a wide window catches it without pinning the
    // corpus epoch the driver may regenerate; exact instant agreement
    // (incl. timezone handling) is proven by the oracle hash gate, not here
    val y2020 = 1577836800000L; val y2040 = 2208988800000L
    assert(ms >= y2020 && ms < y2040, s"ts epoch-ms $ms outside [2020, 2040)")
  }

  test("loader asserts session bootstrap instead of writing session conf") {
    // round-9 fix: normalizeEventTs used to SET nanosAsLong + NTZ-inference
    // confs on every events read — a loader mutating session-global state
    // changes how unrelated parquet reads surface timestamp columns. Now
    // the confs live in Tables.bootstrap (applied once per session) and the
    // loader REQUIRES them: with one flipped, the load must throw, not
    // silently restore it.
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.get(k)
    try {
      spark.conf.set(k, "false")
      val e = intercept[IllegalArgumentException] {
        graft.model.Tables.events(spark, sf0001)
      }
      assert(e.getMessage.contains("Tables.bootstrap"))
      // and it really did not write: the flipped conf is still flipped
      assert(spark.conf.get(k) == "false")
    } finally spark.conf.set(k, prev)
  }
}

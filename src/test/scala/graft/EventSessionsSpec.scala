package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventSessions

/** Event-time sessionization: gap-window merging, watermark-bounded late
  * data, append-mode emission of closed sessions. */
class EventSessionsSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("session_window merges events within gap; separates beyond it") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long)]
    val sessions = EventSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_id"), gap = "30 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      // user 1: events at 0,10,20 (one session) and 60,65 (second session);
      // user 2: single event
      stream.addData(Seq((ts(0), 1L, 1L), (ts(10), 1L, 2L), (ts(20), 1L, 3L),
        (ts(60), 1L, 4L), (ts(65), 1L, 5L), (ts(5), 2L, 6L)))
      q.processAllAvailable()
      // advance watermark far enough to close every session
      stream.addData(Seq((ts(10000), 9L, 99L)))
      q.processAllAvailable()
    } finally q.stop()
    val out = s.sql(
      "SELECT user_id, n_events FROM sessions_out ORDER BY user_id, n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (1L, 3L), (2L, 1L)))
  }

  test("late in-watermark events merge exactly like batch (agreement)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long)]
    val sessions = EventSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_id"),
      gap = "30 minutes", lateness = "60 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("late_agree").outputMode("append").start()
    // waves arrive OUT OF event-time ORDER: ts(45) lands after ts(100) has
    // already advanced the watermark to ts(40) — late but inside the
    // 60-minute bound, so it must still merge/extend sessions
    val waves = Seq(
      Seq((ts(0), 1L, 1L), (ts(20), 1L, 2L), (ts(10), 2L, 3L)),
      Seq((ts(100), 1L, 4L)),
      Seq((ts(45), 1L, 5L), (ts(45), 2L, 6L)), // late, within watermark
      Seq((ts(10000), 9L, 99L))) // close everything for users 1 and 2
    try {
      waves.foreach { w => stream.addData(w); q.processAllAvailable() }
    } finally q.stop()
    val streamed = s.sql(
      """SELECT user_id, session_start, session_end, n_events,
        |  first_event, last_event
        |FROM late_agree WHERE user_id IN (1, 2)""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    // batch twin over the SAME rows: arrival order is invisible to batch,
    // so agreement proves late arrival didn't change session shapes
    val batch = waves.flatten.toDF("ts", "user_id", "event_id")
      .filter(col("user_id").isin(1, 2))
      .groupBy(org.apache.spark.sql.functions.session_window(
        col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_event"), max(col("ts")).as("last_event"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("first_event"), col("last_event"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.size == 4) // u1: {0,20,45},{100}; u2: {10},{45}
  }

  test("late events beyond the watermark are dropped") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long)]
    val sessions = EventSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_id"),
      gap = "30 minutes", lateness = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("late_out").outputMode("append").start()
    try {
      stream.addData(Seq((ts(0), 1L, 1L)))
      q.processAllAvailable()
      stream.addData(Seq((ts(1000), 2L, 2L))) // watermark → ts(990)
      q.processAllAvailable()
      stream.addData(Seq((ts(5), 1L, 3L))) // hours late → dropped
      q.processAllAvailable()
      stream.addData(Seq((ts(10000), 9L, 9L)))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = s.sql("SELECT n_events FROM late_out WHERE user_id = 1")
      .collect().map(_.getLong(0)).toSeq
    assert(u1 == Seq(1L)) // the late event did not reopen/extend the session
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulSessions

/** flatMapGroupsWithState sessionization: per-user session INDEX persists
  * across sessions (the user-lifetime state session_window cannot hold),
  * sessions close on gap or event-time timeout, distinct types tallied. */
class StatefulSessionsSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("per-user session index survives session closes; gap + timeout close") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StatefulSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_type"))
    val q = out.writeStream.format("memory")
      .queryName("stateful_sessions").outputMode("append").start()
    try {
      // user 1: session A (0,10: click,view) then 60 min silence →
      // session B (70,75: click,click); user 2: one event
      stream.addData(Seq((ts(0), 1L, "click"), (ts(10), 1L, "view"),
        (ts(5), 2L, "error")))
      q.processAllAvailable()
      stream.addData(Seq((ts(70), 1L, "click"), (ts(75), 1L, "click")))
      q.processAllAvailable()
      // push the watermark far ahead → timeout closes every open session
      stream.addData(Seq((ts(10000), 9L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(10001), 9L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql(
      """SELECT user_id, session_idx, n_events, n_types, duration_ms
        |FROM stateful_sessions WHERE user_id IN (1, 2)
        |ORDER BY user_id, session_idx""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      (1L, 1L, 2L, 2L, 600000L),  // session A: 2 events, 2 types, 10 min
      (1L, 2L, 2L, 1L, 300000L),  // session B: INDEX 2 — state crossed close
      (2L, 1L, 1L, 1L, 0L)))
  }

  test("session index survives a TIMEOUT close (user-lifetime state)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StatefulSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_type"))
    val q = out.writeStream.format("memory")
      .queryName("stateful_timeout").outputMode("append").start()
    try {
      stream.addData(Seq((ts(0), 1L, "click")))
      q.processAllAvailable()
      // watermark far past last+gap → session 1 closes via TIMEOUT
      stream.addData(Seq((ts(5000), 9L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(5001), 9L, "view")))
      q.processAllAvailable()
      // the user returns: must be session 2, not a reset to 1
      stream.addData(Seq((ts(6000), 1L, "click")))
      q.processAllAvailable()
      stream.addData(Seq((ts(20000), 9L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(20001), 9L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql(
      """SELECT session_idx, n_events FROM stateful_timeout
        |WHERE user_id = 1 ORDER BY session_idx""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 1L), (2L, 1L)))
  }

  test("cross-batch late event extends the session START, like session_window") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StatefulSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_type"),
      lateness = "60 minutes")
    val q = out.writeStream.format("memory")
      .queryName("stateful_late").outputMode("append").start()
    try {
      stream.addData(Seq((ts(10), 1L, "click")))
      q.processAllAvailable()
      // late arrival 5 min EARLIER than the open session's start
      stream.addData(Seq((ts(5), 1L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(10000), 9L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(10001), 9L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val r = s.sql(
      """SELECT n_events, start_ms, duration_ms FROM stateful_late
        |WHERE user_id = 1""".stripMargin).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2L)
    assert(r(0).getLong(1) == ts(5).getTime)       // start extended back
    assert(r(0).getLong(2) == 5L * 60000L)         // 5-minute duration
  }

  test("in-batch out-of-order events sessionize by event time, not arrival") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StatefulSessions.sessionize(
      stream.toDF().toDF("ts", "user_id", "event_type"))
    val q = out.writeStream.format("memory")
      .queryName("stateful_ooo").outputMode("append").start()
    try {
      // arrival order scrambled: 20, 0, 70, 10 — event time says
      // {0,10,20} session 1, {70} session 2
      stream.addData(Seq((ts(20), 1L, "view"), (ts(0), 1L, "click"),
        (ts(70), 1L, "click"), (ts(10), 1L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(10000), 9L, "view")))
      q.processAllAvailable()
      stream.addData(Seq((ts(10001), 9L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql(
      """SELECT session_idx, n_events FROM stateful_ooo
        |WHERE user_id = 1 ORDER BY session_idx""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 3L), (2L, 1L)))
  }
}

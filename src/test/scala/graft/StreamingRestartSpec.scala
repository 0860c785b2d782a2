package graft

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StatefulSessions, StreamingDedup, StreamingNearDup, StreamingTopK}

/** Stop-and-restart state restore for the four custom-state streaming
  * operators. Their other specs prove cross-batch state within ONE run;
  * these prove the state store checkpoint round-trip: run batches, stop
  * the query, start a NEW query from the SAME checkpoint, and assert the
  * restored state drives the next batch — the semantic the reference's
  * disk-backed DLQ replay survives by construction (main.go:302-321) and
  * the `StreamingIngestSpec` restart test pins for the ingest path. A
  * restart that silently reset state would pass every single-run spec
  * while losing session indices / dedup horizons / leaderboards /
  * band-holders on every deploy. */
class StreamingRestartSpec extends SparkSuite {

  private val BaseMs = 1700000000000L
  private def ts(minutes: Int): Timestamp =
    new Timestamp(BaseMs + minutes * 60000L)

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-restart-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Driver-side collector (foreachBatch runs on the driver, so no
    * serialization constraint; synchronized because commits can overlap
    * the test thread's reads). */
  private class Collector[T] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    def add(rows: Seq[T]): Unit = synchronized { buf ++= rows }
    def all: Seq[T] = synchronized { buf.toList }
  }

  test("sessionization: per-user session index and counts survive restart") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val ckpt = tmp("sess")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val coll = new Collector[StatefulSessions.SessionOut]
    def start() = StatefulSessions
      .sessionize(stream.toDF().toDF("ts", "user_id", "event_type"),
        gapMs = 1800000L, lateness = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[StatefulSessions.SessionOut], _: Long) =>
        coll.add(b.collect().toSeq)
      }
      .start()

    val q1 = start()
    try {
      // session 1 of user 7: two events, two distinct types, 1 min apart
      stream.addData(Seq((ts(0), 7L, "click"), (ts(1), 7L, "view")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(coll.all.isEmpty, "no session should close in run 1")

    // NEW query, SAME checkpoint: the 2h-later event exceeds the 30-min
    // gap, which must close session 1 with the PRE-RESTART counts and
    // open session 2 — possible only if the state record was restored
    val q2 = start()
    try {
      stream.addData(Seq((ts(120), 7L, "click")))
      q2.processAllAvailable()
      stream.addData(Seq((ts(240), 7L, "purchase")))
      q2.processAllAvailable()
    } finally q2.stop()

    val sessions = coll.all.sortBy(_.session_idx)
    assert(sessions.map(o => (o.session_idx, o.n_events, o.n_types)) ==
      Seq((1L, 2L, 2L), (2L, 1L, 1L)),
      s"restored-state sessions wrong: ${coll.all}")
    val first = sessions.head
    assert(first.start_ms == BaseMs && first.duration_ms == 60000L,
      s"session 1 must carry its pre-restart start/duration: $first")
  }

  test("exact dedup: fingerprint horizon survives restart") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val ckpt = tmp("dedup")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val coll = new Collector[Long]
    // foreachBatch, not format("memory"): the memory sink refuses
    // checkpoint recovery ("This query does not support recovering from
    // checkpoint location"), and recovery is the entire point here
    def start() = StreamingDedup
      .byFingerprint(stream.toDF().toDF("ts", "doc_id", "text"),
        horizon = "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        coll.add(b.collect().map(_.getAs[Long]("doc_id")).toSeq)
      }
      .start()

    val q1 = start()
    try {
      stream.addData(Seq((ts(0), 1L, "the quick brown fox")))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: the same fingerprint inside the horizon must STILL be
    // suppressed (lost state would re-admit doc 2 as a first arrival)
    val q2 = start()
    try {
      stream.addData(Seq(
        (ts(5), 2L, "THE  quick   BROWN fox"), // same token fp as doc 1
        (ts(6), 3L, "an entirely fresh document")))
      q2.processAllAvailable()
    } finally q2.stop()

    val ids = coll.all.sorted
    assert(ids == Seq(1L, 3L),
      s"dedup state lost across restart (doc 2 re-admitted?): $ids")
  }

  test("top-k: per-key leaderboard survives restart") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val ckpt = tmp("topk")
    val stream = MemoryStream[(Long, Double, Long)]
    val coll = new Collector[StreamingTopK.TopOut]
    def start() = StreamingTopK
      .topK(stream.toDF().toDF("key", "v", "tie"), k = 2)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[StreamingTopK.TopOut], _: Long) =>
        coll.add(b.collect().toSeq)
      }
      .start()

    val q1 = start()
    try {
      stream.addData(Seq((1L, 10.0, 1L), (1L, 5.0, 2L)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(coll.all.map(o => (o.rank, o.v)) == Seq((1, 10.0), (2, 5.0)))

    // restart: v=7 must slot BETWEEN the restored entries (10 stays on
    // top, 5 is evicted); a reset board would emit 7 at rank 1
    val before = coll.all.size
    val q2 = start()
    try {
      stream.addData(Seq((1L, 7.0, 3L)))
      q2.processAllAvailable()
    } finally q2.stop()

    val refreshed = coll.all.drop(before).map(o => (o.rank, o.v, o.tie))
    assert(refreshed == Seq((1, 10.0, 1L), (2, 7.0, 3L)),
      s"leaderboard not restored across restart: $refreshed")
  }

  test("near-dup: band-holder state survives restart") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val ckpt = tmp("neardup")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val coll = new Collector[StreamingNearDup.Candidate]
    def start() = StreamingNearDup
      .candidates(stream.toDF().toDF("ts", "doc_id", "text"),
        horizon = "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[StreamingNearDup.Candidate], _: Long) =>
        coll.add(b.collect().toSeq)
      }
      .start()

    val text = "alpha beta gamma delta epsilon zeta"
    val q1 = start()
    try {
      stream.addData(Seq((ts(0), 1L, text)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(coll.all.isEmpty, "the first holder must emit no candidate")

    // restart: an identical doc inside the horizon must collide with the
    // RESTORED band holders (lost state would make doc 2 the holder and
    // emit nothing)
    val q2 = start()
    try {
      stream.addData(Seq((ts(5), 2L, text)))
      q2.processAllAvailable()
    } finally q2.stop()

    val pairs = coll.all.map(c => (c.doc_id, c.dup_of)).distinct
    assert(pairs == Seq((2L, 1L)),
      s"band holders not restored across restart: ${coll.all}")
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Streaming exact dedup: one survivor per normalized-token fingerprint
  * within the watermark horizon, across micro-batches, agreeing with the
  * batch canonicalization (case/whitespace-insensitive). */
class StreamingDedupSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("cross-batch duplicates collapse to first arrival within the horizon") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDedup.byFingerprint(
      stream.toDF().toDF("ts", "doc_id", "text"), horizon = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("sdedup").outputMode("append").start()
    try {
      stream.addData(Seq(
        (ts(0), 1L, "The quick brown fox"),
        (ts(1), 2L, "the  QUICK   brown fox"), // same tokens → same fp
        (ts(2), 3L, "an entirely different document")))
      q.processAllAvailable()
      stream.addData(Seq(
        (ts(10), 4L, "THE QUICK BROWN FOX"), // dup again, later batch
        (ts(11), 5L, "something new entirely")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = s.sql("SELECT doc_id FROM sdedup ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    // doc 1 survives; 2 and 4 are dups of it; 3 and 5 are unique
    assert(ids == Seq(1L, 3L, 5L))
  }

  test("duplicates beyond the horizon are re-admitted (bounded state)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDedup.byFingerprint(
      stream.toDF().toDF("ts", "doc_id", "text"), horizon = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("sdedup_ttl").outputMode("append").start()
    try {
      stream.addData(Seq((ts(0), 1L, "repeated payload")))
      q.processAllAvailable()
      // watermark sails past the fingerprint's state lifetime
      stream.addData(Seq((ts(600), 2L, "unrelated marker")))
      q.processAllAvailable()
      stream.addData(Seq((ts(601), 3L, "repeated payload")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = s.sql("SELECT doc_id FROM sdedup_ttl ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    // doc 3 re-admitted: its fp state expired with the watermark — the
    // documented horizon trade-off that keeps state bounded
    assert(ids == Seq(1L, 2L, 3L))
  }
}

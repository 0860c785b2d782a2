package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup

/** Streaming MinHash-band near-dup candidates: a document landing in a
  * band an earlier document holds is flagged across micro-batches; the
  * band-holder state expires with the event-time horizon. */
class StreamingNearDupSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private val doc =
    "the quick brown fox jumps over the lazy dog again and again today"

  test("near-identical docs across batches emit a candidate pair") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingNearDup.candidates(
      stream.toDF().toDF("ts", "doc_id", "text"), horizon = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("sneardup").outputMode("append").start()
    try {
      stream.addData(Seq(
        (ts(0), 1L, doc),
        (ts(1), 2L, "a completely unrelated piece of text about spark plans")))
      q.processAllAvailable()
      // identical token stream → identical minhashes → all 4 bands match
      stream.addData(Seq((ts(5), 3L, doc.toUpperCase)))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = s.sql("SELECT DISTINCT doc_id, dup_of FROM sneardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 1L)),
      s"expected doc 3 flagged as dup of band-holder 1, got $pairs")
    // all 4 bands collide for an identical token stream
    val nBands = s.sql("SELECT COUNT(*) FROM sneardup WHERE doc_id = 3")
      .collect().head.getLong(0)
    assert(nBands == 4L)
  }

  test("band-holder state expires with the horizon (bounded state)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingNearDup.candidates(
      stream.toDF().toDF("ts", "doc_id", "text"), horizon = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("sneardup_ttl").outputMode("append").start()
    try {
      stream.addData(Seq((ts(0), 1L, doc)))
      q.processAllAvailable()
      // push the watermark far past the holder's timeout
      stream.addData(Seq((ts(600), 2L, "late unrelated marker text entry")))
      q.processAllAvailable()
      stream.addData(Seq((ts(601), 3L, doc)))
      q.processAllAvailable()
    } finally q.stop()
    val flagged = s.sql("SELECT COUNT(*) FROM sneardup_ttl WHERE doc_id = 3")
      .collect().head.getLong(0)
    assert(flagged == 0L,
      "holder for doc 1's bands should have expired before doc 3 arrived")
  }
}

package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IngestPipeline
import graft.streaming.IngestPipeline.BatchSink

/** End-to-end streaming semantics (SURVEY.md §2.5, §5): the reference's
  * Test_Base invariant (10k concurrent inserts all buffered and flushed,
  * main_test.go:26-61) and the DLQ escalation ladder 1→10→tombstone
  * (README.md:93-96). */
class StreamingIngestSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("10k inserts flush through micro-batches; all rows accounted for") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(String, String)]
    val sink = TestSink()
    val metrics = new graft.sinks.MetricStorage("testhost",
      cntPrefix = "cnt", avgPrefix = "avg")
    val q = IngestPipeline.start(
      stream.toDF().toDF("uri", "body"),
      tmp("dlq"), tmp("ckpt"), sink, syncSec = 1, metrics = Some(metrics))
    try {
      val tables = Seq("a", "b", "c")
      val data = (1 to 10000).map { i =>
        (s"/?query=INSERT%20INTO%20${tables(i % 3)}%20VALUES", s"($i)")
      }
      // two waves to exercise >1 micro-batch
      stream.addData(data.take(5000))
      q.processAllAvailable()
      stream.addData(data.drop(5000))
      q.processAllAvailable()
    } finally q.stop()
    // O-4/O-33: observed metrics account for every request without a
    // second pass (the reference's atomic counters)
    val observed = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("graft_ingest")))
    assert(observed.map(_.getAs[Long]("reqs_received")).sum == 10000L)
    val sent = sink.sent
    // each (wave × key) flushes once: per-batch agg, no cross-batch state
    assert(sent.map(_._3).sum == 10000L)
    assert(sent.map(_._1).distinct.sorted ==
      Seq("/?query=INSERT%20INTO%20a%20VALUES",
        "/?query=INSERT%20INTO%20b%20VALUES",
        "/?query=INSERT%20INTO%20c%20VALUES"))
    // multiset of rows survives concat (order within a batch is
    // nondeterministic — SURVEY.md §1.3)
    val rows = sent.flatMap(_._2.split(",")).sorted
    assert(rows == (1 to 10000).map(i => s"($i)").sorted)
    // live 3-grain counters saw every request (main.go:210-216)
    val lines = metrics.flushLines()
    assert(lines.contains("cnt.requests_received 10000"))
    assert(lines.contains("cnt.byhost.testhost.requests_received 10000"))
    assert(lines.contains("cnt.rows_sent 10000"))
    assert(lines.exists(_.startsWith("cnt.bytable.a.requests_received ")))
  }

  test("DLQ: failed batches spill at level 1 and escalate to tombstone at 10") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dlqDir = tmp("dlq")
    val stream = MemoryStream[(String, String)]
    val failing = TestSink(failUris = _ => true)
    val q = IngestPipeline.start(
      stream.toDF().toDF("uri", "body"),
      dlqDir, tmp("ckpt"), failing, syncSec = 1)
    try {
      stream.addData(Seq(("/?query=INSERT%20INTO%20t%20VALUES", "(1),(2)")))
      q.processAllAvailable()
    } finally q.stop()
    val spilled = s.read.parquet(dlqDir)
    assert(spilled.count() == 1)
    assert(spilled.select("level").head().getInt(0) == 1)
    assert(spilled.select("rows").head().getLong(0) == 2L)

    // replay against a still-failing sink: level escalates each pass
    (2 to 10).foreach { expected =>
      val (sentN, respilled) = IngestPipeline.replayOnce(s, dlqDir, failing)
      assert((sentN, respilled) == ((0L, 1L)))
      assert(s.read.parquet(dlqDir).select("level").head().getInt(0) == expected)
    }
    // at level 10 the entry is a tombstone: replay no longer touches it
    val (sentN, respilled) = IngestPipeline.replayOnce(s, dlqDir, failing)
    assert((sentN, respilled) == ((0L, 0L)))
    assert(s.read.parquet(dlqDir).select("level").head().getInt(0) == 10)
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 200) // tombstones don't count

    // recovery: a now-healthy sink drains nothing (tombstoned forever),
    // matching the reference's give-up-after-10 (README.md:93-96)
    val healthy = TestSink()
    assert(IngestPipeline.replayOnce(s, dlqDir, healthy) == ((0L, 0L)))
  }

  test("empty bodies are rejected at ingest (O-14, main.go:219-221)") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      ("/?query=INSERT%20INTO%20t%20VALUES", "(1)"),
      ("/?query=INSERT%20INTO%20t%20VALUES", ""),
      ("/?query=INSERT%20INTO%20empty%20VALUES", "")
    ).toDF("uri", "body")
    val agg = IngestPipeline.aggregateBatch(batch).collect()
    assert(agg.length == 1) // the all-empty key produces no group at all
    assert(agg.head.getAs[String]("body") == "(1)")
    assert(agg.head.getAs[Long]("reqs") == 1L)
  }

  test("checkpoint restart resumes without reprocessing delivered batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val ckpt = tmp("ckpt")
    val dlq = tmp("dlq")
    val stream = MemoryStream[(String, String)]
    val sink = TestSink()
    val q1 = IngestPipeline.start(stream.toDF().toDF("uri", "body"),
      dlq, ckpt, sink, syncSec = 1)
    try {
      stream.addData(Seq(("/?query=INSERT%20INTO%20t%20VALUES", "(1)")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(sink.sent.size == 1)
    // restart against the SAME checkpoint + source: only new data flows
    val q2 = IngestPipeline.start(stream.toDF().toDF("uri", "body"),
      dlq, ckpt, sink, syncSec = 1)
    try {
      stream.addData(Seq(("/?query=INSERT%20INTO%20t%20VALUES", "(2)")))
      q2.processAllAvailable()
    } finally q2.stop()
    val bodies = sink.sent.map(_._2).sorted
    assert(bodies == Seq("(1)", "(2)")) // (1) was NOT re-delivered
  }

  test("DLQ replay order: lowest level first, then oldest (O-34)") {
    val s = spark
    val dlqDir = tmp("dlq")
    IngestPipeline.spill(s, Seq(("/u3", "(3)", 1L, 3)), dlqDir)
    Thread.sleep(2)
    IngestPipeline.spill(s, Seq(("/u1b", "(1b)", 1L, 1)), dlqDir)
    Thread.sleep(2)
    IngestPipeline.spill(s, Seq(("/u1a", "(1a)", 1L, 1)), dlqDir)
    val sink = TestSink()
    val (sent, _) = IngestPipeline.replayOnce(s, dlqDir, sink)
    assert(sent == 3L)
    val order = sink.sent.map(_._1)
    assert(order == Seq("/u1b", "/u1a", "/u3")) // level 1 (older first), then 3
    // faithful quirk: replay reports rowcount=1 regardless of true rows
    // (main.go:479 — SURVEY.md §3.3)
    assert(sink.sent.forall(_._3 == 1L))
  }

  test("replay never destroys batches spilled concurrently (per-file delete)") {
    val s = spark
    val dlqDir = tmp("dlq")
    IngestPipeline.spill(s, Seq(("/old", "(old)", 1L, 1)), dlqDir)
    // sink that spills a NEW batch mid-replay — the race the wholesale
    // read→delete→rewrite design lost (main.go deletes per processed file).
    // Replay sends are driver-side, so a plain wrapper is fine here.
    val inner = TestSink()
    val sink = new BatchSink {
      override def send(uri: String, body: String, rows: Long): Boolean = {
        IngestPipeline.spill(s, Seq(("/new", "(new)", 1L, 1)), dlqDir)
        inner.send(uri, body, rows)
      }
    }
    val (sent, respilled) = IngestPipeline.replayOnce(s, dlqDir, sink)
    assert((sent, respilled) == ((1L, 0L)))
    // the concurrently spilled batch survived the pass untouched
    val left = s.read.parquet(dlqDir).select("uri", "level").collect()
    assert(left.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("/new", 1)))
    // and the next pass delivers it
    val quiet = TestSink()
    assert(IngestPipeline.replayOnce(s, dlqDir, quiet) == ((1L, 0L)))
    assert(quiet.sent.map(_._1) == Seq("/new"))
  }

  test("large backlog replays file-by-file with a bounded pass (maxFiles)") {
    val s = spark
    val dlqDir = tmp("dlq")
    // 6 spill generations (files) across two levels
    (1 to 3).foreach(i => IngestPipeline.spill(s, Seq((s"/a$i", s"($i)", 1L, 1)), dlqDir))
    (1 to 3).foreach(i => IngestPipeline.spill(s, Seq((s"/b$i", s"($i)", 1L, 2)), dlqDir))
    val sink = TestSink()
    // bounded pass: only the 2 oldest level-1 files are consumed
    assert(IngestPipeline.replayOnce(s, dlqDir, sink, maxFiles = 2) == ((2L, 0L)))
    assert(sink.sent.map(_._1) == Seq("/a1", "/a2"))
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 200)
    assert(s.read.parquet(dlqDir).count() == 4)
    // remaining passes drain level 1 before level 2 (O-34 across passes)
    assert(IngestPipeline.replayOnce(s, dlqDir, sink) == ((4L, 0L)))
    assert(sink.sent.map(_._1) ==
      Seq("/a1", "/a2", "/a3", "/b1", "/b2", "/b3"))
  }

  test("replay streams a 100k-row spill file without collecting it whole") {
    val s = spark
    val dlqDir = tmp("dlq")
    // one spill generation = one level-1 file with 100k rows — the
    // "single multi-GB failed batch" shape scaled to test size. replayOnce
    // reads it via sort + toLocalIterator (one partition resident at a
    // time, asserted by construction in the implementation); this spec
    // pins the semantics at that size: every row sent once, file deleted.
    IngestPipeline.spill(s,
      (1 to 100000).map(i => (s"/u", s"($i)", 1L, 1)), dlqDir)
    val sink = TestSink()
    assert(IngestPipeline.replayOnce(s, dlqDir, sink) == ((100000L, 0L)))
    assert(sink.sent.size == 100000)
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 200)
    // drained: a second pass finds nothing live
    assert(IngestPipeline.replayOnce(s, dlqDir, TestSink()) == ((0L, 0L)))
  }

  test("all-fail replay re-spills in bounded chunks, escalated one level") {
    val s = spark
    val dlqDir = tmp("dlq")
    IngestPipeline.spill(s,
      (1 to 25000).map(i => (s"/u$i", s"($i)", 1L, 1)), dlqDir)
    // downstream still down: every send fails → the respill path must
    // flush its buffer in RespillChunk-sized chunks (25k rows = 3 flushes)
    // rather than holding all failures until the file ends
    val down = TestSink(failUris = _ => true)
    assert(IngestPipeline.replayOnce(s, dlqDir, down) == ((0L, 25000L)))
    val left = s.read.parquet(dlqDir).groupBy("level").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(left == Map(2 -> 25000L)) // all escalated to level 2, none lost
  }

  test("metric flush loop pushes and clears on its own trigger (metric.go:21-50)") {
    val s = spark
    val metrics = new graft.sinks.MetricStorage("h", "cnt", "avg")
    metrics.increment("cnt.requests_received", 7L)
    val flushed = new ConcurrentLinkedQueue[String]()
    val q = graft.streaming.MetricFlusher.start(s, metrics,
      lines => lines.foreach(flushed.add), intervalSec = 1)
    try {
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (flushed.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    } finally q.stop()
    assert(flushed.asScala.toSeq == Seq("cnt.requests_received 7"))
    assert(metrics.flushLines().isEmpty) // cleared by the loop's flush
  }

  test("dlqStatus thresholds against backlog size") {
    val s = spark
    val dlqDir = tmp("dlq")
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 200)
    IngestPipeline.spill(s, (1 to 450).map(i => (s"/u$i", "(1)", 1L, 1)), dlqDir)
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 400)
    IngestPipeline.spill(s, (1 to 60).map(i => (s"/v$i", "(1)", 1L, 1)), dlqDir)
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 500)
  }
}

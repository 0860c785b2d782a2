package graft

import java.nio.file.{Files, Paths}
import graft.sources.RequestSource
import graft.streaming.IngestPipeline

/** Grand tour: the complete proxy pipeline as a user would run it —
  * file-drop streaming source → micro-batch concat/count aggregation →
  * flaky downstream sink → DLQ spill → replay until healthy — with
  * every row accounted for exactly once across live + replayed sends. */
class EndToEndSpec extends SparkSuite {

  test("poison pills: malformed JSON and empty bodies pass through harmlessly") {
    val s = spark
    val dropDir = Files.createTempDirectory("drop").toString
    val sink = TestSink()
    val q = IngestPipeline.start(
      RequestSource.fileStream(s, dropDir).select("uri", "body"),
      Files.createTempDirectory("dlq").toString,
      Files.createTempDirectory("ckpt").toString, sink, syncSec = 1)
    try {
      Files.write(Paths.get(dropDir, "mixed.json"), Seq(
        """{"uri": "/?query=INSERT%20INTO%20t%20VALUES", "body": "(1)"}""",
        """this is not json at all {{{""", // → all-null row (PERMISSIVE)
        """{"uri": "/?query=INSERT%20INTO%20t%20VALUES", "body": ""}""",
        """{"uri": "/?query=INSERT%20INTO%20t%20VALUES", "body": "(2)"}"""
      ).mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()
    // the two well-formed non-empty bodies arrive; garbage and empties are
    // dropped by the null/empty-body ingest gate (O-14), no stream crash
    assert(sink.sent.flatMap(_._2.split(",")).sorted == Seq("(1)", "(2)"))
  }

  test("backpressure: maxFilesPerTrigger bounds each micro-batch (no flood)") {
    val s = spark
    val dropDir = Files.createTempDirectory("drop").toString
    // a flood of 6 drop files lands BEFORE the stream starts
    (1 to 6).foreach { f =>
      Files.write(Paths.get(dropDir, s"f$f.json"),
        s"""{"uri": "/?query=INSERT%20INTO%20t%20VALUES", "body": "($f)"}"""
          .getBytes)
    }
    val sink = TestSink()
    val q = IngestPipeline.start(
      RequestSource.fileStream(s, dropDir, maxFilesPerTrigger = 2)
        .select("uri", "body"),
      Files.createTempDirectory("dlq").toString,
      Files.createTempDirectory("ckpt").toString, sink, syncSec = 1)
    try q.processAllAvailable() finally q.stop()
    // every row arrives, but across >= 3 bounded micro-batches — the
    // backpressure knob the reference lacks (it buffers unboundedly)
    assert(sink.sent.flatMap(_._2.split(",")).sorted ==
      (1 to 6).map(i => s"($i)").sorted)
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected >= 3 bounded batches, saw $batches")
  }

  test("file source → ingest → flaky sink → DLQ replay delivers every row") {
    val s = spark
    val dropDir = Files.createTempDirectory("drop").toString
    val dlqDir = Files.createTempDirectory("dlq").toString
    val ckpt = Files.createTempDirectory("ckpt").toString

    // drop two JSON-lines files of requests (the reference's POST bodies)
    def writeFile(name: String, ids: Range): Unit = {
      val lines = ids.map { i =>
        val tbl = if (i % 2 == 0) "evens" else "odds"
        s"""{"uri": "/?query=INSERT%20INTO%20$tbl%20VALUES", "body": "($i)"}"""
      }
      Files.write(Paths.get(dropDir, name), lines.mkString("\n").getBytes)
    }
    writeFile("wave1.json", 1 to 200)

    val sink = TestSink(failFirst = 1) // first group of wave 1 fails
    val metrics = new graft.sinks.MetricStorage("e2e", "cnt", "avg")
    val q = IngestPipeline.start(
      RequestSource.fileStream(s, dropDir).select("uri", "body"),
      dlqDir, ckpt, sink, syncSec = 1, metrics = Some(metrics))
    try {
      q.processAllAvailable()
      writeFile("wave2.json", 201 to 300)
      q.processAllAvailable()
    } finally q.stop()

    // one aggregated group failed → spilled at level 1
    val backlog = s.read.parquet(dlqDir)
    assert(backlog.count() == 1)

    // replay heals it (sink no longer failing)
    val (sentN, respilled) = IngestPipeline.replayOnce(s, dlqDir, sink)
    assert((sentN, respilled) == ((1L, 0L)))
    assert(IngestPipeline.dlqStatus(s, dlqDir) == 200)

    // every row delivered exactly once across live + replayed sends
    val rows = sink.sent.flatMap(_._2.split(",")).sorted
    assert(rows == (1 to 300).map(i => s"($i)").sorted)

    // metrics saw all 300 requests and the one failure
    val lines = metrics.flushLines()
    assert(lines.contains("cnt.requests_received 300"))
    assert(lines.contains("cnt.ch_errors 1"))
    assert(lines.exists(_.startsWith("cnt.bytable.evens.requests_received ")))
  }
}

package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.RequestSource
import graft.streaming.CommitLogIngest

/** The full proxy-on-lakehouse path (round-13 verdict task 7): the edge
  * drop-dir request stream lands in a commit-log TABLE through the
  * exactly-once streaming sink. IngestBench records its throughput; this
  * spec pins the correctness half — a killed-and-restarted query (same
  * checkpoint) delivers every request EXACTLY once into the table, with
  * the replayed epoch dropped by the txn guard, and the committed table
  * is immediately queryable at a pinned version. */
class IngestLakeSpec extends SparkSuite {

  private def tmp(p: String): String = {
    val d = Files.createTempDirectory(s"graft-ingestlake-$p")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** One JSON-lines drop file of `n` requests with ids [from, from+n). */
  private def drop(dir: String, name: String, from: Long, n: Long): Unit = {
    val lines = (from until from + n).map(i =>
      s"""{"uri":"/?query=INSERT%20INTO%20t${i % 3}%20VALUES",""" +
        s""""body":"($i)"}""").mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), lines.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
  }

  test("edge stream -> commit-log sink survives a kill/restart with " +
      "exactly-once delivery; the table is queryable per version") {
    val s = spark
    val dropDir = tmp("drop")
    val ckpt = tmp("ckpt")
    val table = tmp("lake") + "/t"
    def startQuery() =
      RequestSource.fileStream(s, dropDir, maxFilesPerTrigger = 2)
        .select("uri", "body")
        .writeStream.format("graft-commitlog")
        .option("path", table)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()

    drop(dropDir, "a.json", 0L, 200L)
    drop(dropDir, "b.json", 200L, 200L)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val v1 = CommitLogIngest.latestVersion(table)
    assert(v1 >= 0)
    val n1 = CommitLogIngest.snapshot(s, table).count()
    assert(n1 == 400L, s"pre-restart rows: $n1")

    // more files land while the query is DOWN; the restart must pick up
    // exactly the unprocessed ones (checkpoint) and the sink must drop
    // any replayed epoch (txn guard) — net effect: zero dupes, zero loss
    drop(dropDir, "c.json", 400L, 300L)
    drop(dropDir, "d.json", 700L, 100L)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val snap = CommitLogIngest.snapshot(s, table)
    assert(snap.count() == 800L, "restart lost or duplicated requests")
    assert(snap.select(col("body")).distinct().count() == 800L,
      "restart delivered a request twice")
    // the pre-restart version still answers exactly its own rows
    assert(s.read.format("graft-commitlog").option("path", table)
      .option("versionAsOf", v1.toString).load().count() == n1)
    // per-table routing is preserved end-to-end (the proxy's 3 tables)
    val byTable = snap
      .groupBy(regexp_extract(col("uri"), "INSERT%20INTO%20(t\\d)", 1)
        .as("t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable.keySet == Set("t0", "t1", "t2") &&
      byTable.values.sum == 800L, s"table routing broke: $byTable")
  }
}

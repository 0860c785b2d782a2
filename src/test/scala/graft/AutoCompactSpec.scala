package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** Round-11 operational hardening: the streaming sink's auto-compaction
  * hook (a long-running sink manufactures the small-file problem —
  * `autoCompact.*` options run OPTIMIZE through the log post-commit) and
  * time-based retention (`vacuumRetention`). */
class AutoCompactSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ac-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Age version `v` 3 h into the past through BOTH commit clocks: the
    * claim-time marker (what retention reads since round 13) and the dir
    * mtime (the pre-marker fallback). */
  private def age(table: String, v: Long): Unit = {
    val dir = java.nio.file.Paths.get(s"$table/log/version=$v")
    val past = System.currentTimeMillis() - 3L * 3600000L
    java.nio.file.Files.write(dir.resolve("_commit_ms"),
      past.toString.getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(dir,
      java.nio.file.attribute.FileTime.fromMillis(past))
  }

  test("a sink writing 20 small epochs converges to few files; a live reader is undisturbed") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val table = tmp("sink") + "/t"
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]

    val stream = MemoryStream[(Long, String)]
    val sink = stream.toDF().toDF("id", "payload")
      .writeStream.format("graft-commitlog")
      .option("path", table)
      .option("checkpointLocation", tmp("sinkck"))
      .option("autoCompact.enabled", "true")
      .option("autoCompact.everyEpochs", "5")
      .option("autoCompact.smallFiles", "64") // cadence is the trigger here
      .start()
    try {
      // first epoch so the reader can infer a schema
      stream.addData((0 until 10).map(i => (i.toLong, s"p0-$i")))
      sink.processAllAvailable()
      val reader = s.readStream.format("graft-commitlog")
        .option("path", table)
        .option("skipChangeCommits", "true") // compactions are layout-only
        .load()
        .writeStream.option("checkpointLocation", tmp("readck"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          val ids = b.select("id").collect().map(_.getLong(0))
          got.synchronized { got ++= ids }; ()
        }
        .start()
      try {
        (1 until 20).foreach { w =>
          stream.addData((0 until 10).map(i => (w * 10L + i, s"p$w-$i")))
          sink.processAllAvailable()
          reader.processAllAvailable()
        }
        reader.processAllAvailable()
      } finally reader.stop()
    } finally sink.stop()

    // convergence: 20 one-file epochs compacted down (cadence = every 5
    // epochs), never anywhere near 20 live files
    val latest = CommitLogIngest.latestVersion(table)
    val live = CommitLogIngest.liveFiles(spark, table, latest)
    assert(live.size <= 6,
      s"auto-compaction did not converge: ${live.size} live files")
    assert(latest > 19L, "no compaction commits landed") // epochs + optimizes
    // content: all 200 rows, exactly once
    val ids = CommitLogIngest.snapshot(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 200L), "auto-compaction changed table content")
    // the live reader saw every appended row exactly once (change
    // commits skipped, appends all delivered)
    assert(got.synchronized(got.sorted.toSeq) == (0L until 200L),
      "a live reader was disturbed by auto-compaction")
  }

  test("vacuumRetention keeps every version at or above the floor readable") {
    val s = spark
    import s.implicits._
    val table = tmp("ret")
    // v0-2: appends; v3: OPTIMIZE (replaces the smalls — what makes the
    // pre-rewrite files reclaimable at all); v4: another append
    (0 until 3).foreach { w =>
      CommitLogIngest.commitAppend(
        (w * 10L until w * 10L + 10L).map(i => (i, s"p$i")).toDF("id", "p"),
        table)
    }
    val (ov, _, _) = CommitLogIngest.optimize(s, table)
    assert(ov == 3L)
    CommitLogIngest.commitAppend(
      (30L until 40L).map(i => (i, s"p$i")).toDF("id", "p"), table)
    // age versions 0-2 past a 1-hour horizon
    (0 to 2).foreach(v => age(table, v))
    val (floor, dropped) = CommitLogIngest.vacuumRetention(s, table, 1.0)
    assert(floor == 3L, s"retention floor $floor")
    assert(dropped.nonEmpty, "nothing reclaimed")
    // every version >= floor stays readable and correct
    assert(CommitLogIngest.snapshot(s, table, 3L).count() == 30L)
    assert(CommitLogIngest.snapshot(s, table, 4L).count() == 40L)
    // below the floor: unreadable (the retention contract)
    intercept[Exception] { CommitLogIngest.snapshot(s, table, 2L).count() }

    // too-aggressive requests fail loudly BEFORE deleting anything
    intercept[IllegalArgumentException] {
      CommitLogIngest.vacuumRetention(s, table, 0.0)
    }
    intercept[IllegalArgumentException] {
      CommitLogIngest.vacuumRetention(s, table, -5.0)
    }
    assert(CommitLogIngest.snapshot(s, table, 3L).count() == 30L,
      "a refused retention request mutated the table")

    // an IDLE table (every commit older than the horizon) retains the
    // latest snapshot — the keep-set can never go empty
    (3 to 4).foreach(v => age(table, v))
    val (floor2, _) = CommitLogIngest.vacuumRetention(s, table, 1.0)
    assert(floor2 == 4L)
    assert(CommitLogIngest.snapshot(s, table).count() == 40L,
      "retention on an idle table damaged the live snapshot")
  }
}

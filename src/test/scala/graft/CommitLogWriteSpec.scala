package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.{CommitLogStreamingWrite, CommitLogWriterCommit, LayoutDirs}
import graft.streaming.CommitLogIngest

/** The DataSource V2 WRITE contract of `graft-commitlog`: batch append and
  * truncate through `df.write`, the exactly-once streaming sink through
  * `ds.writeStream`, create-then-insert bootstrap, and the txn replay
  * guard's survival across log checkpoints + retention. */
class CommitLogWriteSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-clw-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("batch append roundtrips every supported column type") {
    val s = spark
    import s.implicits._
    val table = tmp("types")
    val df = s.createDataFrame(Seq(
      (1L, 7, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2),
        java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456"),
        java.sql.Date.valueOf("2026-01-02"),
        Seq(10L, 20L), Seq("x", "y"), (42L, "nested")),
      (2L, -7, -1.5, -2.5f, false, "beta", Array[Byte](3),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.0"),
        java.sql.Date.valueOf("1999-12-31"),
        Seq.empty[Long], Seq.empty[String], (43L, "deep"))))
      .toDF("l", "i", "d", "f", "b", "str", "bin", "ts", "dt",
        "al", "as", "st")
    CommitLogIngest.createTable(table, df.schema)
    df.write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    // snapshot (native parquet reader) sees exactly what was written
    val back = CommitLogIngest.snapshot(s, table)
      .select(df.columns.map(col): _*).orderBy("l").collect()
    val in = df.orderBy("l").collect()
    assert(back.length == 2)
    (back zip in).foreach { case (g, e) =>
      (0 until e.length).foreach { c =>
        (g.get(c), e.get(c)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
          case (a, b) => assert(a == b, s"col ${df.columns(c)}: $a != $b")
        }
      }
    }
    // and the V2 batch reader (GroupRowReader) decodes the writer's files
    val v2 = s.read.format("graft-commitlog").option("path", table).load()
      .select("l", "str", "al", "st").orderBy("l").collect()
    assert(v2(0) == Row(1L, "alpha", Seq(10L, 20L), Row(42L, "nested")))
    assert(v2(1) == Row(2L, "beta", Seq.empty[Long], Row(43L, "deep")))
  }

  test("appends are atomic versions; overwrite truncates but old versions time-travel") {
    val s = spark
    import s.implicits._
    val table = tmp("modes")
    val a = (0 until 10).map(i => (i.toLong, "a")).toDF("id", "tag")
    CommitLogIngest.createTable(table, a.schema)
    a.write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    (10 until 20).map(i => (i.toLong, "b")).toDF("id", "tag")
      .write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    assert(CommitLogIngest.latestVersion(table) == 1L)
    assert(CommitLogIngest.snapshot(s, table).count() == 20)

    (100 until 105).map(i => (i.toLong, "c")).toDF("id", "tag")
      .write.format("graft-commitlog").option("path", table)
      .mode("overwrite").save()
    assert(CommitLogIngest.latestVersion(table) == 2L)
    val latest = CommitLogIngest.snapshot(s, table)
      .select("id").as[Long].collect().sorted.toSeq
    assert(latest == (100L until 105L), s"truncate left $latest")
    // the pre-truncate version is still fully readable
    val v1 = s.read.format("graft-commitlog").option("path", table)
      .option("versionAsOf", "1").load()
      .select("id").as[Long].collect().sorted.toSeq
    assert(v1 == (0L until 20L), "versionAsOf lost the pre-truncate state")
    // truncate-to-empty is refused loudly, not committed
    val e = intercept[Exception] {
      a.filter(lit(false)).write.format("graft-commitlog")
        .option("path", table).mode("overwrite").save()
    }
    assert(e.getMessage != null)
    assert(CommitLogIngest.latestVersion(table) == 2L,
      "refused truncate must not land a version")
  }

  test("fresh-table bootstrap: writes self-create; empty readers need createTable") {
    val s = spark
    import s.implicits._
    // a WRITE carries its own schema — the very first write to an empty
    // dir just works (Spark hands the provider the data schema)
    val fresh = tmp("fresh") + "/t"
    val df = Seq((1L, "x")).toDF("id", "p")
    df.write.format("graft-commitlog").option("path", fresh)
      .mode("append").save()
    assert(CommitLogIngest.snapshot(s, fresh).count() == 1)
    // a READER on a table with no commits has no schema to infer — loud,
    // and the message names the fix
    val empty = tmp("fresh-read") + "/t"
    val e = intercept[Exception] {
      s.read.format("graft-commitlog").option("path", empty).load()
    }
    assert(e.getMessage.contains("createTable"),
      s"bootstrap error must name the fix, got: ${e.getMessage}")
    // after createTable the declared schema is inferable before any commit
    CommitLogIngest.createTable(empty, df.schema)
    assert(s.read.format("graft-commitlog").option("path", empty)
      .load().schema.fieldNames.toSeq == Seq("id", "p"))
  }

  test("streaming sink commits each epoch exactly once, visible to a live readStream") {
    val s = spark
    import s.implicits._
    val table = tmp("sink") + "/t"
    CommitLogIngest.createTable(table,
      Seq((0L, "")).toDF("id", "p").schema)
    // a DSv2 readStream tails the very table the DSv2 sink writes
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val tail = s.readStream.format("graft-commitlog").option("path", table)
      .load()
      .writeStream.option("checkpointLocation", tmp("sink-tail-ck"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.select("id").as[Long].collect() }
        ()
      }.start()

    val in = MemoryStream[(Long, String)](s)
    val q = in.toDF().toDF("id", "p")
      .writeStream.format("graft-commitlog").option("path", table)
      .option("checkpointLocation", tmp("sink-ck"))
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "c"))
      q.processAllAvailable()
      val snap = CommitLogIngest.snapshot(s, table)
        .select("id").as[Long].collect().sorted.toSeq
      assert(snap == Seq(1L, 2L, 3L), s"sink wrote $snap")
      tail.processAllAvailable()
      assert(seen.synchronized(seen.sorted.toSeq) == Seq(1L, 2L, 3L),
        "live readStream must deliver the sink's rows exactly once")
      // each epoch committed a txn action for the query
      assert(CommitLogIngest.lastTxnEpoch(s, table, q.id.toString) >= 1L)
    } finally { q.stop(); tail.stop() }
  }

  test("a replayed epoch is dropped by the txn guard; guard survives checkpoint + retention") {
    val s = spark
    import s.implicits._
    val table = tmp("replay") + "/t"
    val schema = Seq((0L, "")).toDF("id", "p").schema
    CommitLogIngest.createTable(table, schema)
    val qid = "q-replay-test"
    val sw = new CommitLogStreamingWrite(table, schema, qid, None)
    // a restarted query run constructs a NEW StreamingWrite (fresh
    // writer-unique data dir) — replays come through sw2, never sw
    val sw2 = new CommitLogStreamingWrite(table, schema, qid, None)

    def fileFor(w: CommitLogStreamingWrite, epoch: Long, ids: Seq[Long])
        : Seq[String] = {
      val dir = w.epochDir(epoch)
      ids.map(i => (i, s"p$i")).toDF("id", "p")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      LayoutDirs.dataFiles(dir)
    }

    // 12 committed epochs → the checkpoint at version 9 has passed
    (0L until 12L).foreach { e =>
      sw.commit(e, Array(CommitLogWriterCommit(fileFor(sw, e, Seq(e)), 1)))
    }
    assert(CommitLogIngest.latestVersion(table) == 11L)
    assert(CommitLogIngest.lastTxnEpoch(s, table, qid) == 11L)

    // REPLAY of epoch 5 (restart raced the engine's offset commit): its
    // rewritten files must be dropped, no version landed
    val replayFiles = fileFor(sw2, 5L, Seq(999L))
    sw2.commit(5L, Array(CommitLogWriterCommit(replayFiles, 1)))
    assert(CommitLogIngest.latestVersion(table) == 11L,
      "replayed epoch must not land a new version")
    assert(replayFiles.forall(p => !Files.exists(Paths.get(p))),
      "replayed epoch's orphan files must be reclaimed")
    val ids = CommitLogIngest.snapshot(s, table)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 12L), s"table content corrupted: $ids")

    // retention: prune every log partition the checkpoint covers — the
    // guard must still answer from the checkpoint's preserved txn row
    (0L to 9L).foreach(v =>
      LayoutDirs.deleteQuiet(s"$table/log/version=$v"))
    assert(CommitLogIngest.lastTxnEpoch(s, table, qid) == 11L,
      "txn guard must survive log retention via the checkpoint")
    val replay2 = fileFor(sw2, 3L, Seq(888L))
    sw2.commit(3L, Array(CommitLogWriterCommit(replay2, 1)))
    assert(CommitLogIngest.latestVersion(table) == 11L)
    assert(replay2.forall(p => !Files.exists(Paths.get(p))))
  }
}

package graft

import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** Multi-writer optimistic concurrency for the commit log: the
  * put-if-absent version claim (atomic staged-dir rename) guarantees
  * contiguous versions and zero lost commits under a writer race, the
  * loser retries at the next version without rewriting anything, and the
  * conflict metric surfaces every lost race. */
class CommitConcurrencySpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-occ-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("a forced claim collision retries at the next version and bumps the conflict metric") {
    val s = spark
    import s.implicits._
    val table = tmp("forced")
    val v0 = CommitLogIngest.commitAppend(
      Seq((1L, "w0")).toDF("id", "w"), table)
    assert(v0 == 0L)

    // stage a second commit by hand, then claim it STARTING at the
    // already-taken version 0 — deterministic conflict, no race needed
    val stage = java.nio.file.Paths.get(table, "log", ".stage-test")
    Seq(("add", s"$table/data/w0-probe"))
      .toDF("action", "path")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val before = CommitLogIngest.conflicts
    val won = CommitLogIngest.claimVersion(table, stage, startAt = 0L)
    assert(won == 1L, s"loser should land on the next version, got $won")
    assert(CommitLogIngest.conflicts == before + 1,
      "the lost race did not surface in the conflict metric")
    // the staged dir moved: claim is a rename, not a copy
    assert(!java.nio.file.Files.exists(stage))
    assert(graft.sources.LayoutDirs
      .hasParquetData(s"$table/log/version=1"))
  }

  test("two racing writers over 24 commits: zero lost versions, contiguous sequence, all rows present") {
    val s = spark
    import s.implicits._
    val table = tmp("race")
    val perWriter = 12
    val rowsPerCommit = 5
    val barrier = new CyclicBarrier(2)
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val won = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def writer(id: Int): Thread = new Thread(() => {
      try {
        (0 until perWriter).foreach { k =>
          barrier.await() // maximize claim collisions
          val base = (id * perWriter + k) * rowsPerCommit
          val v = CommitLogIngest.commitAppend(
            (0 until rowsPerCommit)
              .map(i => (base + i.toLong, s"w$id-c$k")).toDF("id", "w"),
            table)
          won.add(v)
        }
      } catch { case t: Throwable => errors.add(t) }
    })

    val before = CommitLogIngest.conflicts
    val ts = Seq(writer(0), writer(1))
    ts.foreach(_.start())
    ts.foreach(_.join(120000))
    assert(errors.isEmpty, s"writer died: ${errors.peek()}")

    import scala.jdk.CollectionConverters._
    val versions = won.iterator().asScala.toSeq.sorted
    // contiguous 0..23, each version won by exactly one writer
    assert(versions == (0L until 2L * perWriter),
      s"version sequence has gaps or duplicates: $versions")
    assert(CommitLogIngest.latestVersion(table) == 2L * perWriter - 1)
    // no commit lost a row; both writers' full payload is in the table
    val snap = CommitLogIngest.snapshot(s, table)
    assert(snap.count() == 2L * perWriter * rowsPerCommit)
    assert(snap.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 2L * perWriter * rowsPerCommit),
      "a racing commit's rows went missing or doubled")
    // every version dir is fully formed (claim = atomic rename)
    (0L until 2L * perWriter).foreach { v =>
      assert(graft.sources.LayoutDirs
        .hasParquetData(s"$table/log/version=$v"), s"half version $v")
    }
    info(s"claim conflicts during the race: " +
      s"${CommitLogIngest.conflicts - before}")
    // checkpoints crossed at least one boundary under concurrency and
    // resolution still agrees with a full-log replay
    assert(CommitLogIngest.lastCheckpoint(table) >= 9L)
    val viaCkpt = CommitLogIngest
      .liveFiles(s, table, 2L * perWriter - 1).toSet
    val fullReplay = s.read.parquet(s"$table/log")
      .groupBy(col("path"))
      .agg(max_by(col("action"), col("version")).as("last"))
      .filter(col("last") === "add")
      .select("path").collect().map(_.getString(0)).toSet
    assert(viaCkpt == fullReplay,
      "checkpoint-resolved live set diverged from full-log replay")
  }
}

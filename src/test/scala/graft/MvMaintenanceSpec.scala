package graft

import org.apache.spark.sql.functions._

import graft.sources.CdfRollup
import graft.streaming.{CommitLogIngest, MvMaintenance}

/** The continuous MV loop end to end: the change-feed stream of a
  * mutating commit-log table folds into a commit-log MV table that
  * always equals the full recompute — through appends, CoW update,
  * merge, and deletion-vector delete — with exactly-once epochs (the
  * txn marker rides the overwrite commit atomically, so a replayed
  * batchId is a no-op) and restart-from-checkpoint continuity. */
class MvMaintenanceSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-mvm-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def docs(from: Long, n: Long, source: String) = {
    val s = spark
    import s.implicits._
    (from until from + n).map(i => (i, source, i * 3))
      .toDF("doc_id", "source", "n_chars")
  }

  private def append(table: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft-commitlog").option("path", table)
      .option("enableCdf", "true").option("enableDv", "true")
      .mode("append").save()

  private def asMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("stream folds every mutation kind exactly once, survives restart") {
    val s = spark
    val root = tmp("loop")
    val src = s"$root/src"
    val mv = s"$root/mv"
    val ckpt = s"$root/ckpt"

    append(src, docs(0L, 40L, "web"))
    append(src, docs(100L, 20L, "books"))

    val q1 = MvMaintenance.start(s, src, mv, ckpt, triggerSec = 0)
    try q1.processAllAvailable() finally q1.stop()
    def recompute() =
      asMap(CdfRollup.full(CommitLogIngest.snapshot(s, src)))
    def view() = asMap(CommitLogIngest.snapshot(s, mv))
    assert(view() == recompute(), s"after appends: ${view()}")

    // mutate while the stream is DOWN — restart must pick up exactly
    // the missed versions from the checkpoint
    CommitLogIngest.updateWhere(s, src, col("doc_id") % 4 === 0,
      Map("n_chars" -> (col("n_chars") + lit(5L))))
    val upd = docs(60L, 3L, "arxiv") // below the delete bound
    CommitLogIngest.mergeByKey(s, src, upd, "doc_id")
    CommitLogIngest.deleteWhere(s, src, col("doc_id") >= 110L) // dv mask

    val q2 = MvMaintenance.start(s, src, mv, ckpt, triggerSec = 0)
    try q2.processAllAvailable() finally q2.stop()
    assert(view() == recompute(),
      s"after update+merge+dv delete: ${view()} vs ${recompute()}")
    assert(view().contains("arxiv"))

    // a whole source disappearing leaves the view
    CommitLogIngest.deleteWhere(s, src, col("source") === "books")
    val q3 = MvMaintenance.start(s, src, mv, ckpt, triggerSec = 0)
    try q3.processAllAvailable() finally q3.stop()
    assert(!view().contains("books"))
    assert(view() == recompute())
  }

  test("a replayed epoch is a no-op: the txn marker rides the commit") {
    val s = spark
    val root = tmp("replay")
    val src = s"$root/src"
    val mv = s"$root/mv"
    append(src, docs(0L, 10L, "web"))
    val feed = CommitLogIngest.changeFeed(s, src, -1L,
      CommitLogIngest.latestVersion(src))
    MvMaintenance.foldOnce(feed, mv, "q", 0L)
    val v = CommitLogIngest.latestVersion(mv)
    val before = asMap(CommitLogIngest.snapshot(s, mv))
    // the at-least-once replay: same batchId again — must not commit,
    // must not double-count
    MvMaintenance.foldOnce(feed, mv, "q", 0L)
    assert(CommitLogIngest.latestVersion(mv) == v,
      "replayed epoch must not land a new version")
    assert(asMap(CommitLogIngest.snapshot(s, mv)) == before)
    // a LATER epoch still applies
    val srcV = CommitLogIngest.latestVersion(src)
    append(src, docs(10L, 5L, "web"))
    val feed2 = CommitLogIngest.changeFeed(s, src, srcV,
      CommitLogIngest.latestVersion(src))
    MvMaintenance.foldOnce(feed2, mv, "q", 1L)
    assert(asMap(CommitLogIngest.snapshot(s, mv))("web") ==
      (15L, (0L until 15L).map(_ * 3).sum))
  }
}

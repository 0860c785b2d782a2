package graft

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** OPTIMIZE as a log commit: pure layout move (census identical), the
  * pre-compaction version stays readable until vacuum, vacuum reclaims
  * exactly the replaced smalls, and the stats index follows the rewrite
  * in the same commit so point reads keep pruning. */
class OptimizeCommitSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-opt-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("optimize commits add+remove atomically; history, vacuum, and the index compose") {
    val s = spark
    import s.implicits._
    val table = tmp("table")
    // three commits, three files each: 9 small live files, disjoint ids
    (0 until 3).foreach { c =>
      CommitLogIngest.commitAppend(
        (0 until 90).map(i => (c * 90L + i, s"p$c-$i")).toDF("id", "p")
          .repartitionByRange(3, col("id")),
        table, statsCol = Some("id"))
    }
    val preVersion = CommitLogIngest.latestVersion(table)
    assert(preVersion == 2L)
    val preFiles = CommitLogIngest.liveFiles(s, table, preVersion)
    assert(preFiles.size == 9)
    val preRows = CommitLogIngest.snapshot(s, table)
      .select("id").as[Long].collect().sorted.toSeq

    val (newV, nIn, nOut) = CommitLogIngest.optimize(s, table, Some("id"))
    assert(newV == 3L && nIn == 9 && nOut < nIn,
      s"expected a compacting commit at version 3, got ($newV,$nIn,$nOut)")

    // pure layout move: latest census identical, none of the old files
    // is referenced by the new version
    val postFiles = CommitLogIngest.liveFiles(s, table, newV)
    assert(postFiles.size == nOut)
    assert(postFiles.toSet.intersect(preFiles.toSet).isEmpty)
    assert(CommitLogIngest.snapshot(s, table)
      .select("id").as[Long].collect().sorted.toSeq == preRows,
      "optimize changed table content")

    // the PRE-compaction version is still readable and identical (pinned
    // readers are isolated from the rewrite)
    assert(CommitLogIngest.snapshot(s, table, preVersion)
      .select("id").as[Long].collect().sorted.toSeq == preRows,
      "pre-compaction snapshot broke after optimize")

    // the index followed the rewrite IN the optimize commit: a point
    // read prunes to at most one of the range-clustered output files
    val hit = CommitLogIngest.pointRead(s, table, "id", 137L)
    assert(hit.count() == 1)
    assert(hit.inputFiles.length <= 1,
      s"point read opened ${hit.inputFiles.length} of $nOut files " +
        "after optimize")

    // vacuum with retention at the optimize version reclaims EXACTLY the
    // replaced smalls; the latest snapshot is untouched, the pre-
    // compaction version becomes unreadable (the retention contract)
    val dropped = CommitLogIngest.vacuum(s, table, retainMin = newV)
    assert(dropped.toSet == preFiles.toSet,
      "vacuum did not reclaim exactly the files optimize replaced")
    assert(CommitLogIngest.snapshot(s, table)
      .select("id").as[Long].collect().sorted.toSeq == preRows,
      "vacuum damaged the retained snapshot")
    intercept[Exception] {
      CommitLogIngest.snapshot(s, table, preVersion).count()
    }

    // idempotence at scale: a second optimize over already-compacted
    // files is a no-op (nothing under the size threshold twice over)
    val again = CommitLogIngest.optimize(s, table, Some("id"),
      maxFileBytes = 1L) // nothing is smaller than 1 byte
    assert(again == ((-1L, 0, 0)), s"re-optimize was not a no-op: $again")
  }

  test("the registry face compacts the fragmented documents table without changing its census") {
    val s = spark
    val table = graft.sources.OptimizeCommit.ensure(s, sf0001)
    val latest = CommitLogIngest.latestVersion(table)
    assert(latest == graft.sources.OptimizeCommit.Commits.toLong)
    // live files after optimize < the fragmented ingest's file count
    val live = CommitLogIngest.liveFiles(s, table, latest)
    assert(live.size <
      graft.sources.OptimizeCommit.Commits *
        graft.sources.OptimizeCommit.FilesPerCommit)
    // census through the log equals a direct census of the source
    val viaLog = graft.sources.OptimizeCommit.optimizedCensus(s, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val direct = graft.model.Tables.documents(s, sf0001)
      .groupBy(col("source"))
      .agg(count(lit(1)), sum(col("n_chars")), min(col("doc_id")),
        max(col("doc_id")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(viaLog == direct,
      "optimized commit-log census diverged from the source documents")
  }
}

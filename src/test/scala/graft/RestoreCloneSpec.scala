package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** Shallow CLONE and RESTORE through the commit log (the Delta shapes),
  * plus the vacuum containment rule that makes clones safe:
  *
  *  - a shallow clone references the source's live files by path (zero
  *    data copied) and is immediately independent for WRITES: DML on the
  *    clone copy-on-writes under the clone's root, the source never
  *    moves; live deletion-vector masks carry over so the cloned
  *    snapshot is the source's logical table;
  *  - vacuum deletes only under its OWN table root — a clone's vacuum
  *    can never reach the source's data files;
  *  - RESTORE is a forward commit swapping the live set back to the
  *    target's: census identical to the time-travel read, intermediate
  *    versions stay readable, a second restore is a no-op, incremental
  *    consumers see a change commit, and a vacuumed-away target refuses
  *    loudly before any mutation. */
class RestoreCloneSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-rc-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def appendRows(table: String, from: Long, n: Long,
      enableDv: Boolean = false): Unit = {
    val s = spark
    import s.implicits._
    val w = (from until from + n).map(i => (i, s"p$i", i * 10))
      .toDF("id", "p", "n")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append")
    (if (enableDv) w.option("enableDv", "true") else w).save()
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("shallow clone: zero data copied, reads equal, writes diverge, " +
      "masks carry over") {
    val s = spark
    val src = tmp("src")
    appendRows(src, 0L, 100L, enableDv = true)
    appendRows(src, 100L, 100L, enableDv = true)
    // a live mask on the source must be part of the cloned snapshot
    CommitLogIngest.deleteWhere(s, src, col("id") % 9 === 0)
    val srcExpect = (0L until 200L).filter(_ % 9 != 0)

    val dst = tmp("dst")
    assert(CommitLogIngest.shallowClone(s, src, dst) == 0L)
    // masked source files MATERIALIZE (the clone's v0 must be a pure
    // append); everything else is referenced by path — the clone's own
    // data dir holds exactly the materialized minority
    val (srcLive, srcDvs) = CommitLogIngest.liveState(s, src,
      CommitLogIngest.latestVersion(src))
    val cloneLive = CommitLogIngest.liveFiles(s, dst, 0L)
    val (copied, referenced) = cloneLive.partition(_.startsWith(dst))
    assert(srcDvs.nonEmpty && copied.nonEmpty &&
      copied.size <= srcLive.count(srcDvs.contains),
      s"clone must copy only (the compaction of) the masked files: " +
        s"$copied")
    assert(referenced.toSet == srcLive.filterNot(srcDvs.contains).toSet,
      "every unmasked source file must be referenced, never copied")
    // no mask rides the clone, and its v0 serves a fresh CDF consumer
    // as plain inserts
    assert(CommitLogIngest.liveState(s, dst, 0L)._2.isEmpty)
    val feed0 = CommitLogIngest.changeFeed(s, dst, -1L, 0L)
    assert(feed0.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(ids(feed0) == srcExpect)
    assert(ids(CommitLogIngest.snapshot(s, dst)) == srcExpect)
    assert(ids(s.read.format("graft-commitlog").option("path", dst)
      .load()) == srcExpect)
    // the clone's index carried over: pointRead prunes
    assert(CommitLogIngest.pointRead(s, dst, "id", 11L).count() == 1L)

    // writes diverge: a delete on the CLONE (dv-enabled, carried over)
    // must not disturb the source; a CoW update rewrites under the
    // clone's root only
    assert(CommitLogIngest.dvEnabled(dst))
    CommitLogIngest.deleteWhere(s, dst, col("id") < 50L)
    CommitLogIngest.updateWhere(s, dst, col("id") === 100L,
      Map("n" -> lit(999L).cast("long")), statsCol = Some("id"))
    assert(ids(CommitLogIngest.snapshot(s, src)) == srcExpect,
      "clone writes must never disturb the source")
    val dstExpect = srcExpect.filter(_ >= 50L)
    assert(ids(CommitLogIngest.snapshot(s, dst)) == dstExpect)
    // the update rewrote INTO the clone's root; the source file carrying
    // id=100 is untouched
    val srcFiles = CommitLogIngest.liveFiles(s, src,
      CommitLogIngest.latestVersion(src)).toSet
    assert(srcFiles.forall(p => Files.exists(Paths.get(p))))

    // vacuum containment: vacuuming the clone at its latest reclaims
    // only clone-root files — every source file survives
    CommitLogIngest.vacuum(s, dst, CommitLogIngest.latestVersion(dst))
    assert(srcFiles.forall(p => Files.exists(Paths.get(p))),
      "clone vacuum must never delete source files")
    assert(ids(CommitLogIngest.snapshot(s, src)) == srcExpect)
    assert(ids(CommitLogIngest.snapshot(s, dst)) == dstExpect)
    // clone into a non-empty dir refuses
    intercept[IllegalArgumentException] {
      CommitLogIngest.shallowClone(s, src, dst)
    }
  }

  test("restore: forward commit back to the target's live set") {
    val s = spark
    val table = tmp("restore")
    appendRows(table, 0L, 100L)
    val target = CommitLogIngest.latestVersion(table)
    appendRows(table, 100L, 50L)
    CommitLogIngest.deleteWhere(s, table, col("id") % 4 === 2,
      statsCol = Some("id"))
    val preRestore = CommitLogIngest.latestVersion(table)
    val mangled = ids(CommitLogIngest.snapshot(s, table))

    val (rv, nRem, nAdd) = CommitLogIngest.restore(s, table, target)
    assert(rv == preRestore + 1 && nRem > 0 && nAdd > 0)
    // census == the time-travel read of the target
    assert(ids(CommitLogIngest.snapshot(s, table)) == (0L until 100L))
    assert(ids(s.read.format("graft-commitlog").option("path", table)
      .load()) == (0L until 100L))
    // intermediate history intact (forward restore, not rollback)
    assert(ids(CommitLogIngest.snapshot(s, table, preRestore)) == mangled)
    // re-restore is a no-op
    assert(CommitLogIngest.restore(s, table, target) == (-1L, 0, 0))
    // history names the operation
    val op = CommitLogIngest.history(s, table)
      .filter(col("version") === rv).collect()(0)
      .getAs[String]("operation")
    assert(op == "restore")
    // a restore is a change commit for incremental consumers
    val e = intercept[IllegalStateException] {
      CommitLogIngest.changes(s, table, preRestore, rv).count()
    }
    assert(e.getMessage.contains("CHANGE commits"))
    // changeFeed over the restore version: net effect = the post-target
    // appends deleted, the target's deleted rows re-inserted
    val feed = CommitLogIngest.changeFeed(s, table, preRestore, rv)
    assert(ids(feed.filter(col("_change_type") === "delete")) ==
      (100L until 150L).filter(_ % 4 != 2))
    assert(ids(feed.filter(col("_change_type") === "insert")) ==
      (0L until 100L).filter(_ % 4 == 2))
    // out-of-range target refuses
    intercept[IllegalArgumentException] {
      CommitLogIngest.restore(s, table, rv + 10)
    }
  }

  test("restore across a dv delete materializes; vacuumed target " +
      "refuses before any mutation") {
    val s = spark
    val table = tmp("refuse")
    appendRows(table, 0L, 60L)
    val target = CommitLogIngest.latestVersion(table)
    // a CoW delete rewrites the files; vacuum reclaims the target's
    CommitLogIngest.deleteWhere(s, table, col("id") % 3 === 0,
      statsCol = Some("id"))
    CommitLogIngest.vacuum(s, table, CommitLogIngest.latestVersion(table))
    val vBefore = CommitLogIngest.latestVersion(table)
    val e = intercept[IllegalArgumentException] {
      CommitLogIngest.restore(s, table, target)
    }
    assert(e.getMessage.contains("vacuum"))
    assert(CommitLogIngest.latestVersion(table) == vBefore,
      "refused restore must not commit")

    // dv-after-target: the file sets at target and latest are IDENTICAL
    // (a mask moves no files) — restore must still see the logical
    // difference and materialize the masked files back to target state
    val t2 = tmp("matdv")
    appendRows(t2, 0L, 60L, enableDv = true)
    val target2 = CommitLogIngest.latestVersion(t2)
    CommitLogIngest.deleteWhere(s, t2, col("id") < 5L) // dv commit
    assert(ids(CommitLogIngest.snapshot(s, t2)) == (5L until 60L))
    val (rv, nRem, nAdd) = CommitLogIngest.restore(s, t2, target2)
    assert(rv > 0 && nRem > 0 && nAdd > 0)
    assert(ids(CommitLogIngest.snapshot(s, t2)) == (0L until 60L),
      "restore must undo the post-target mask by materializing")
    assert(ids(s.read.format("graft-commitlog").option("path", t2)
      .load()) == (0L until 60L))
    // no mask survives on the restored live set, and the materialized
    // files carry index rows (pointRead still prunes)
    val (_, dvsAfter) = CommitLogIngest.liveState(s, t2, rv)
    assert(dvsAfter.isEmpty)
    assert(CommitLogIngest.pointRead(s, t2, "id", 2L).count() == 1L)
    // composition: target masks stay applied when restoring to a
    // version BETWEEN two dv deletes
    val dvv = CommitLogIngest.latestVersion(t2)
    val (dv2, _) = CommitLogIngest.deleteWhere(s, t2, col("id") >= 55L)
    CommitLogIngest.deleteWhere(s, t2, col("id") < 10L)
    CommitLogIngest.restore(s, t2, dv2) // state: ids 0..55
    assert(ids(CommitLogIngest.snapshot(s, t2)) == (0L until 55L),
      s"restore to the mid-mask version $dv2 (post-restore-base $dvv) " +
        "must keep its own mask and drop the later one")
  }

  test("restore MATERIALIZES a re-added file whose target state was " +
      "masked (its dv actions may not survive checkpoints)") {
    val s = spark
    val table = tmp("readd")
    appendRows(table, 0L, 60L, enableDv = true)
    CommitLogIngest.deleteWhere(s, table, col("id") % 6 === 1) // dv mask
    val target = CommitLogIngest.latestVersion(table)
    val targetIds = (0L until 60L).filter(_ % 6 != 1)
    // a CoW UPDATE (always copy-on-write, even on a DV table) REMOVES
    // the masked files — the rewrite materializes their masks
    CommitLogIngest.updateWhere(s, table, col("id") % 2 === 0,
      Map("n" -> (col("n") + 1L)), statsCol = Some("id"))
    val (rv, _, _) = CommitLogIngest.restore(s, table, target)
    assert(ids(CommitLogIngest.snapshot(s, table)) == targetIds,
      "restored state must equal the masked target")
    // the restored live set owes NOTHING to the old dv actions: every
    // re-added-masked file was rewritten, so no mask rides the result
    // (resolution after a later checkpoint would have dropped the
    // removed files' dv rows — raw re-adds would resurrect)
    val (_, dvsNow) = CommitLogIngest.liveState(s, table, rv)
    assert(dvsNow.isEmpty,
      s"re-added files must be materialized, not re-masked: $dvsNow")
    assert(ids(s.read.format("graft-commitlog").option("path", table)
      .load()) == targetIds)
  }
}

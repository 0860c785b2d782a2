package graft

import org.apache.spark.sql.functions._

import graft.sources.CommitLogReadTracker
import graft.streaming.CommitLogIngest

/** Column mapping — RENAME/DROP COLUMN through the log (round-12 verdict
  * task 4, the Delta `columnMapping.mode=name` shape): logical names map
  * to immutable PHYSICAL names, so a rename is one metadata commit and
  * zero file rewrites — at 100 TB the difference between "rename" and
  * "never rename". Pinned here:
  *
  *  - rename moves NO data files; reads across generations resolve each
  *    version under its own logical names;
  *  - appends after a rename write the PHYSICAL name into files, so the
  *    table's files stay homogeneous forever;
  *  - the stats index follows the physical name: a filtered V2 scan on
  *    the NEW logical name still skips non-overlapping files;
  *  - DML on a renamed column works (logical in, physical bytes out);
  *  - DROP hides the column, leaves files untouched, and retires the
  *    physical name — re-adding it is refused (old bytes must never
  *    resurrect into a new column);
  *  - collisions and protected columns (partition, stats) refuse loudly. */
class ColumnMappingSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-cm-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def seed(table: String): Unit = {
    val s = spark
    import s.implicits._
    (0L until 100L).map(i => (i, i * 2, s"p$i")).toDF("id", "a", "tag")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
  }

  test("rename is one metadata commit: no file moves, old versions keep " +
      "their own logical names, new appends land physical") {
    val s = spark
    import s.implicits._
    val table = tmp("rename")
    seed(table)
    val filesBefore = CommitLogIngest.liveFiles(s, table, 0L)
    val v = CommitLogIngest.renameColumn(s, table, "a", "x")
    assert(v == 1L, "rename must land as one version")
    assert(CommitLogIngest.liveFiles(s, table, v) == filesBefore,
      "rename must move no data files")
    // latest generation reads under the new name, same values
    val snap = CommitLogIngest.snapshot(s, table)
    assert(snap.columns.toSeq == Seq("id", "x", "tag"))
    assert(snap.filter(col("id") === 3L).select("x")
      .collect()(0).getLong(0) == 6L)
    // the pinned pre-rename generation keeps ITS logical name
    val old = CommitLogIngest.snapshot(s, table, 0L)
    assert(old.columns.toSeq == Seq("id", "a", "tag"))
    // an append AFTER the rename uses the new logical name; on disk the
    // file carries the PHYSICAL name, so both generations read as one
    (100L until 110L).map(i => (i, i * 2, s"p$i")).toDF("id", "x", "tag")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    val all = CommitLogIngest.snapshot(s, table)
    assert(all.count() == 110L)
    assert(all.filter(col("x") === col("id") * 2).count() == 110L,
      "old and new generations must agree under the renamed column")
    // the new file physically carries 'a' (the immutable physical name)
    val newFiles = CommitLogIngest.liveFiles(s, table,
      CommitLogIngest.latestVersion(table)).filterNot(filesBefore.contains)
    assert(newFiles.nonEmpty)
    val raw = s.read.parquet(newFiles: _*)
    assert(raw.columns.contains("a") && !raw.columns.contains("x"),
      s"new files must carry the physical name, got ${raw.columns.toSeq}")
    // V2 read agrees, and a filter on the NEW name returns exact rows
    val v2 = s.read.format("graft-commitlog").option("path", table).load()
    assert(v2.columns.toSeq == Seq("id", "x", "tag"))
    assert(v2.filter(col("x") === 14L).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // SQL time travel across the rename boundary
    assert(s.read.format("graft-commitlog").option("path", table)
      .option("versionAsOf", "0").load().columns.toSeq ==
      Seq("id", "a", "tag"))
  }

  test("the stats index follows the physical name: a V2 filter on the " +
      "renamed column still skips non-overlapping files") {
    val s = spark
    import s.implicits._
    val table = tmp("idx")
    // two appends with disjoint `a` ranges -> per-file mins/maxs stats
    (0L until 50L).map(i => (i, i, s"p$i")).toDF("id", "a", "tag")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    (50L until 100L).map(i => (i, i + 1000L, s"p$i")).toDF("id", "a", "tag")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    CommitLogIngest.renameColumn(s, table, "a", "score")
    CommitLogReadTracker.enable()
    try {
      val got = s.read.format("graft-commitlog").option("path", table)
        .load().filter(col("score") >= 1000L).count()
      assert(got == 50L)
      val opened = CommitLogReadTracker.drain().distinct
      val secondGen = CommitLogIngest.liveFiles(s, table, 1L)
        .filterNot(CommitLogIngest.liveFiles(s, table, 0L).toSet)
      assert(opened.toSet == secondGen.toSet,
        s"index must prune through the rename: opened $opened")
    } finally CommitLogReadTracker.disable()
  }

  test("DML through a renamed column: UPDATE/DELETE/MERGE see the " +
      "logical name, files keep the physical one") {
    val s = spark
    import s.implicits._
    val table = tmp("dml")
    seed(table)
    CommitLogIngest.renameColumn(s, table, "a", "x")
    CommitLogIngest.updateWhere(s, table, col("id") < 10L,
      Map("x" -> (col("x") + 1000L)), statsCol = Some("id"))
    assert(CommitLogIngest.snapshot(s, table)
      .filter(col("x") >= 1000L).count() == 10L)
    CommitLogIngest.deleteWhere(s, table, col("x") >= 1000L,
      statsCol = Some("id"))
    assert(CommitLogIngest.snapshot(s, table).count() == 90L)
    val up = Seq((10L, 7777L, "up")).toDF("id", "x", "tag")
    CommitLogIngest.mergeByKey(s, table, up, "id", statsCol = Some("id"))
    val r = CommitLogIngest.snapshot(s, table).filter(col("id") === 10L)
      .select("x", "tag").collect()(0)
    assert((r.getLong(0), r.getString(1)) == ((7777L, "up")))
    // every live file carries ONLY physical names
    val live = CommitLogIngest.liveFiles(s, table,
      CommitLogIngest.latestVersion(table))
    assert(!s.read.option("recursiveFileLookup", "true").parquet(live: _*)
      .columns.contains("x"), "files must stay physical-named through DML")
  }

  test("DROP hides the column without touching files; re-adding the " +
      "name is refused (retired physical bytes must not resurrect)") {
    val s = spark
    import s.implicits._
    val table = tmp("drop")
    seed(table)
    val filesBefore = CommitLogIngest.liveFiles(s, table, 0L)
    val v = CommitLogIngest.dropColumn(s, table, "a")
    assert(CommitLogIngest.liveFiles(s, table, v) == filesBefore,
      "drop must move no data files")
    assert(CommitLogIngest.snapshot(s, table).columns.toSeq ==
      Seq("id", "tag"))
    // the pinned pre-drop generation still sees the column
    assert(CommitLogIngest.snapshot(s, table, 0L).columns.contains("a"))
    // re-adding the dropped name refuses loudly, with zero mutation
    val pre = CommitLogIngest.latestVersion(table)
    val e = intercept[Exception] {
      (0L until 5L).map(i => (i + 200L, i, s"n$i")).toDF("id", "a", "tag")
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append").save()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("resurrect"))),
      s"wrong refusal: ${e.getMessage}")
    assert(CommitLogIngest.latestVersion(table) == pre)
    // OPTIMIZE rewrites under the current schema and naturally sheds the
    // dropped column's bytes from the rewritten files
    val (ov, _, _) = CommitLogIngest.optimize(s, table,
      statsCol = Some("id"))
    assert(ov > pre)
    val live = CommitLogIngest.liveFiles(s, table, ov)
    assert(!s.read.option("recursiveFileLookup", "true").parquet(live: _*)
      .columns.contains("a"), "OPTIMIZE must shed the dropped column")
  }

  test("retirement survives losing the side-file cache: the commit's " +
      "own _retire marker self-heals it (round-14 crash-window fix)") {
    val s = spark
    import s.implicits._
    val table = tmp("heal")
    seed(table)
    CommitLogIngest.dropColumn(s, table, "a")
    // simulate the crash window / a lost cache: delete _retired_cols
    // entirely — the marker staged INSIDE the drop commit's log
    // partition is the durable record
    val side = java.nio.file.Paths.get(table, "log", "_retired_cols")
    assert(java.nio.file.Files.deleteIfExists(side))
    assert(CommitLogIngest.retiredCols(table).exists(_.nonEmpty),
      "retiredCols must re-derive the name from the commit marker")
    // and the healed knowledge still refuses the resurrection append
    val e = intercept[Exception] {
      (0L until 5L).map(i => (i + 500L, i, s"n$i")).toDF("id", "a", "tag")
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append").save()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("resurrect"))),
      s"wrong refusal after heal: ${e.getMessage}")
    // the heal rewrote the cache with its high-water mark
    assert(java.nio.file.Files.exists(side))
  }

  test("SQL forms and refusals: ALTER TABLE RENAME/DROP COLUMN; " +
      "collisions, partition and stats columns refuse") {
    val s = spark
    import s.implicits._
    val table = tmp("sql")
    seed(table)
    assert(s.sql(s"ALTER TABLE '$table' RENAME COLUMN a TO x")
      .collect()(0).getLong(0) == 1L)
    assert(CommitLogIngest.snapshot(s, table).columns.toSeq ==
      Seq("id", "x", "tag"))
    assert(s.sql(s"ALTER TABLE '$table' DROP COLUMN tag")
      .collect()(0).getLong(0) == 2L)
    assert(CommitLogIngest.snapshot(s, table).columns.toSeq ==
      Seq("id", "x"))
    // refusals: collision, stats column, unknown column — zero mutation
    val pre = CommitLogIngest.latestVersion(table)
    intercept[Exception] {
      CommitLogIngest.renameColumn(s, table, "x", "id")
    }
    intercept[Exception] {
      CommitLogIngest.renameColumn(s, table, "id", "key") // statsCol
    }
    intercept[Exception] {
      CommitLogIngest.dropColumn(s, table, "id") // statsCol
    }
    intercept[Exception] {
      CommitLogIngest.renameColumn(s, table, "nope", "y")
    }
    assert(CommitLogIngest.latestVersion(table) == pre,
      "refused column changes must not mutate")
    // a partitioned table refuses renaming its partition column
    val pt = tmp("part")
    (0L until 20L).map(i => (i, i % 3, s"p$i")).toDF("id", "day", "tag")
      .write.format("graft-commitlog").option("path", pt)
      .option("partitionCols", "day").partitionBy("day")
      .mode("append").save()
    intercept[Exception] {
      CommitLogIngest.renameColumn(s, pt, "day", "d")
    }
  }
}

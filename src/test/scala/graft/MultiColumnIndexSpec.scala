package graft

import org.apache.spark.sql.functions._

import graft.sources.CommitLogReadTracker
import graft.streaming.CommitLogIngest

/** The multi-column commit-time stats index (round 11): every integral
  * leaf column gets per-file min/max (plus nullCounts for all atomics)
  * beside the legacy statsCol `min_key`/`max_key`, and the V2 scan prunes
  * with whichever filtered column has stats — a filter on the SECOND
  * column opens only its overlapping files. */
class MultiColumnIndexSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-midx-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("index rows carry per-column stats that agree with recomputed truth") {
    val s = spark
    import s.implicits._
    val table = tmp("truth")
    (0L until 1000L).map(i => (i, i * 3 + 7, s"p$i", i * 0.5))
      .toDF("id", "score", "p", "x")
      .repartitionByRange(4, col("id"))
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    val idx = s.read.option("mergeSchema", "true").parquet(s"$table/index")
      .collect().map(r => r.getString(r.fieldIndex("path")) -> r).toMap
    assert(idx.nonEmpty)
    val truth = CommitLogIngest.snapshot(s, table)
      .groupBy(graft.sources.LayoutDirs.plainPath(input_file_name())
        .as("f"))
      .agg(min("id"), max("id"), min("score"), max("score"),
        count(lit(1)))
      .collect()
    truth.foreach { t =>
      val r = idx(t.getString(0))
      assert(r.getAs[Long]("min_key") == t.getLong(1) &&
        r.getAs[Long]("max_key") == t.getLong(2),
        s"legacy statsCol stats diverged for ${t.getString(0)}")
      val mins = r.getStruct(r.fieldIndex("mins"))
      val maxs = r.getStruct(r.fieldIndex("maxs"))
      assert(mins.getAs[Long]("score") == t.getLong(3) &&
        maxs.getAs[Long]("score") == t.getLong(4),
        s"second-column stats diverged for ${t.getString(0)}")
      val nulls = r.getStruct(r.fieldIndex("nullCounts"))
      assert(nulls.getAs[Long]("p") == 0L)
    }
  }

  test("a filtered scan on the SECOND column opens only its overlapping files") {
    val s = spark
    import s.implicits._
    val table = tmp("second")
    // 4 commits with DISJOINT score bands (and disjoint ids): every file's
    // [min,max] on BOTH columns is tight
    (0 until 4).foreach { w =>
      (0L until 250L).map(i => (w * 250L + i, w * 1000L + i, s"p$w-$i"))
        .toDF("id", "score", "p")
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append").save()
    }
    val live = CommitLogIngest.liveFiles(s, table, 3L)
    val t = s.read.format("graft-commitlog").option("path", table).load()

    // equality probe on `score` (NOT the statsCol): only band 2's files
    CommitLogReadTracker.enable()
    assert(t.filter(col("score") === 2100L).collect()
      .map(_.getLong(0)).toSeq == Seq(600L))
    val openedEq = CommitLogReadTracker.drain().distinct
    // range probe: bands hold scores w*1000+[0,249], so [900,1100]
    // overlaps band 1 only (scores 1000..1100)
    assert(t.filter(col("score") >= 900L && col("score") <= 1100L)
      .count() == 101L)
    val openedRange = CommitLogReadTracker.drain().distinct
    CommitLogReadTracker.disable()
    val perBand = math.max(1, live.size / 4)
    assert(openedEq.nonEmpty && openedEq.size <= perBand,
      s"score= probe opened ${openedEq.size} of ${live.size} files")
    assert(openedRange.size <= perBand,
      s"score range opened ${openedRange.size} of ${live.size} files")

    // conjunction: id bound (legacy path) AND score bound (v2 path)
    // prunes to the intersection
    CommitLogReadTracker.enable()
    assert(t.filter(col("id") < 250L && col("score") > 2000L).count() == 0L)
    val openedBoth = CommitLogReadTracker.drain().distinct
    CommitLogReadTracker.disable()
    assert(openedBoth.isEmpty,
      s"disjoint id+score bounds still opened $openedBoth")
  }

  test("schema evolution: a filter on a late-added column keeps old files, prunes new ones") {
    val s = spark
    import s.implicits._
    val table = tmp("evo")
    // gen 1: no score column (its index rows lack score stats)
    (0L until 300L).map(i => (i, s"p$i")).toDF("id", "p")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    val gen1 = CommitLogIngest.liveFiles(s, table, 0L).toSet
    // gen 2: two commits with disjoint score bands
    (0 until 2).foreach { w =>
      (0L until 300L).map(i => (1000L + w * 300L + i, w * 100L + i % 100,
        s"q$i")).toDF("id", "score", "p")
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append").save()
    }
    val t = s.read.format("graft-commitlog").option("path", table).load()
    CommitLogReadTracker.enable()
    val n = t.filter(col("score") >= 100L && col("score") <= 199L).count()
    val opened = CommitLogReadTracker.drain().distinct.toSet
    CommitLogReadTracker.disable()
    assert(n == 300L)
    // band-0 gen-2 files are provably out of range → pruned by the index;
    // gen-1 files lack score entirely → the READER's missing-column skip
    // drops them without a page read (they may or may not appear here,
    // but band-0 must not)
    val band0 = CommitLogIngest.liveFiles(s, table, 1L).toSet -- gen1
    assert(opened.intersect(band0).isEmpty,
      s"provably-out-of-range new-generation files opened: " +
        s"${opened.intersect(band0)}")
  }
}

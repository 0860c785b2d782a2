package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}

import graft.sources.{CommitLogReadTracker, CommitLogScan}
import graft.streaming.CommitLogIngest

/** RUNTIME file pruning (E-179, `SupportsRuntimeFiltering` — the
  * Iceberg/Delta dynamic-file-pruning shape): after a join's build side
  * materializes, Spark hands the commit-log scan the collected join-key
  * values; they merge into the same partition-dir / stats-index / bloom
  * prune the static filters feed, so a fact scan joined to a filtered
  * dim opens only the files the dim's keys can touch. Static planning
  * cannot see these keys at all — they exist only at runtime. */
class RuntimeFilterSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-rtf-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  /** 5 day-partitioned commits, one file per day; ids interleave so only
    * the sketch (not min/max) can prune id probes. */
  private def seed(table: String): Unit = {
    val s = spark
    import s.implicits._
    (0 until 5).foreach { day =>
      (0 until 200).map(i => (i * 10L + day, day, s"d$day-$i"))
        .toDF("id", "day", "tag").coalesce(1)
        .write.format("graft-commitlog").option("path", table)
        .option("partitionCols", "day")
        .option("statsCol", "id").mode("append").save()
    }
  }

  private def v2(table: String) =
    spark.read.format("graft-commitlog").option("path", table).load()

  test("dynamic partition pruning: joining a filtered tiny dim opens only " +
      "the matching day dirs") {
    val s = spark
    import s.implicits._
    val table = tmp("dpp")
    seed(table)
    // the dim must be FILE-backed: an in-memory dim's selective filter
    // constant-folds into the LocalRelation and DPP (which requires a
    // visible selective predicate on the build side) declines — the
    // production shape is a table anyway
    val dimPath = java.nio.file.Paths.get(table).getParent.toString + "/dim"
    (0 until 5).map(d => (d, s"name$d")).toDF("dday", "nm")
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("nm").isin("name1", "name3"))
    val q = v2(table).join(dim, col("day") === col("dday"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    CommitLogReadTracker.enable()
    val got = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val opened = CommitLogReadTracker.drain().distinct
    assert(got == Map(1 -> 200L, 3 -> 200L))
    assert(opened.nonEmpty && opened.forall(f =>
        f.contains("day=1") || f.contains("day=3")),
      s"runtime keys {1,3} must prune the other day dirs, opened $opened")
    // the executed plan carries the injected runtime filter
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in:\n$planStr")
  }

  test("scan.filter() translation + memo: partition In, integral In " +
      "(bloom), and EqualTo narrow an already-resolved scan") {
    val table = tmp("unit")
    seed(table)
    def freshScan(): CommitLogScan = {
      val df = v2(table)
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case a: AdaptiveSparkPlanExec =>
          a.inputPlan.collectLeaves().collectFirst {
            case b: BatchScanExec => b.scan
          }.get
        case b: BatchScanExec => b.scan
      }.get.asInstanceOf[CommitLogScan]
    }
    // baseline: all 5 files
    val scan = freshScan()
    assert(scan.resolvedSnapshot._1.length == 5)
    // partition In narrows to the named dirs — even though resolution
    // was ALREADY memoized (the stats report forces it at optimization
    // time, runtime filters always arrive after)
    scan.filter(Array[Filter](In("day", Array(0, 4))))
    assert(scan.resolvedSnapshot._3.forall(f =>
        f.contains("day=0") || f.contains("day=4")))
    assert(scan.resolvedSnapshot._1.length == 2)
    // integral In on the interleaved id: day ranges all overlap, so this
    // narrows through the bloom sketch (ids 15,37 live in days 5? no —
    // id = i*10+day: 15 ≡ day 5 doesn't exist; use real ids)
    val scan2 = freshScan()
    scan2.filter(Array[Filter](In("id", Array(102L, 1003L)))) // days 2, 3
    assert(scan2.resolvedSnapshot._1.length == 2)
    assert(scan2.resolvedSnapshot._3.forall(f =>
        f.contains("day=2") || f.contains("day=3")))
    // EqualTo composes: a single id key prunes to its one file
    val scan3 = freshScan()
    scan3.filter(Array[Filter](EqualTo("id", 501L))) // day 1, i=50
    assert(scan3.resolvedSnapshot._1.length == 1)
    assert(scan3.resolvedSnapshot._3.head.contains("day=1"))
    // an un-renderable runtime value contributes nothing (kept files)
    val scan4 = freshScan()
    scan4.filter(Array[Filter](EqualTo("id", java.lang.Double.valueOf(1.5))))
    assert(scan4.resolvedSnapshot._1.length == 5,
      "a fractional value against an integral column must not prune")
  }

  test("a runtime In containing the literal string \"null\" keeps the " +
      "shared null dir (real \"null\"-string rows must not vanish)") {
    val s = spark
    import s.implicits._
    val table = tmp("nulldir")
    Seq((1L, "a"), (2L, "null"), (3L, null.asInstanceOf[String]))
      .toDF("id", "src").coalesce(1)
      .write.format("graft-commitlog").option("path", table)
      .option("partitionCols", "src")
      .option("statsCol", "id").mode("append").save()
    val scan = {
      val df = v2(table)
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case a: AdaptiveSparkPlanExec =>
          a.inputPlan.collectLeaves().collectFirst {
            case b: BatchScanExec => b.scan
          }.get
        case b: BatchScanExec => b.scan
      }.get.asInstanceOf[CommitLogScan]
    }
    scan.filter(Array[Filter](In("src", Array("null"))))
    // the null dir is SHARED between NULL rows and real "null" strings —
    // it may hold a match, so it must survive the runtime prune (Spark's
    // row-level re-filter then drops the NULL row, never here)
    assert(scan.resolvedSnapshot._3.exists(_.contains("src=null")),
      s"the shared null dir was pruned: ${scan.resolvedSnapshot._3}")
    assert(!scan.resolvedSnapshot._3.exists(_.contains("src=a")))
    // end-to-end: the real "null" string row survives, the NULL row and
    // the "a" row do not match
    assert(v2(table).filter(col("src").isin("null"))
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("runtime-pruned join values equal the unpruned join") {
    val s = spark
    import s.implicits._
    val table = tmp("vals")
    seed(table)
    val keys = Seq(53L, 1024L, 1041L) // days 3, 4, 1
    val dim = keys.toDF("kid")
    val pruned = v2(table).join(dim, col("id") === col("kid"))
      .select("id", "tag").collect().map(_.toSeq).toSet
    val direct = v2(table).filter(col("id").isin(keys: _*))
      .select("id", "tag").collect().map(_.toSeq).toSet
    assert(pruned == direct && pruned.size == keys.size)
  }
}

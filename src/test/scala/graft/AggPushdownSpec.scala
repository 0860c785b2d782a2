package graft

import org.apache.spark.sql.functions._

import graft.sources.CommitLogReadTracker
import graft.streaming.CommitLogIngest

/** Aggregate pushdown through the V2 reader (round-12 verdict task 7):
  * COUNT(*) / COUNT(col) / MIN / MAX with no GROUP BY answer from parquet
  * footers plus the deletion-vector masks — NO data page is opened. The
  * fallback contract matters as much as the fast path: any shape the
  * footer cannot answer EXACTLY (filters, group-by, doubles, masked
  * min/max) silently falls back to the normal scan and stays correct. */
class AggPushdownSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-agg-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def seed(table: String, dv: Boolean = false): Unit = {
    val s = spark
    import s.implicits._
    (0 until 2).foreach { g =>
      val w = (g * 100L until g * 100L + 100L)
        .map(i => (i, s"p$i", i.toDouble / 7))
        .toDF("id", "tag", "score")
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append")
      (if (dv) w.option("enableDv", "true") else w).save()
    }
  }

  private def v2(table: String) =
    spark.read.format("graft-commitlog").option("path", table).load()

  test("COUNT(*)/COUNT(col)/MIN/MAX plan with ZERO data-page reads and " +
      "exact values; the plan shows the agg scan") {
    val s = spark
    val table = tmp("basic")
    seed(table)
    val df = v2(table).agg(
      count(lit(1)).as("n"), count(col("tag")).as("nt"),
      min(col("id")).as("mn"), max(col("id")).as("mx"),
      min(col("tag")).as("smn"), max(col("tag")).as("smx"))
    CommitLogReadTracker.enable()
    val r = try df.collect()(0) finally CommitLogReadTracker.disable()
    assert(CommitLogReadTracker.drain().isEmpty,
      "a pushed aggregate must open no data pages")
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L)
    assert(r.getLong(2) == 0L && r.getLong(3) == 199L)
    assert(r.getString(4) == "p0" && r.getString(5) == "p99",
      s"string extremes wrong: ${r.getString(4)}/${r.getString(5)}")
    assert(df.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"),
      "the physical plan must carry the footer-only agg scan")
  }

  test("masks: COUNT(*) stays pushed and exact; MIN/MAX fall back to the " +
      "scan and stay exact") {
    val s = spark
    val table = tmp("mask")
    seed(table, dv = true)
    CommitLogIngest.deleteWhere(s, table, col("id") % 10 === 0,
      statsCol = Some("id"))
    // COUNT(*): footer rows minus mask positions, no pages opened
    val cdf = v2(table).agg(count(lit(1)))
    CommitLogReadTracker.enable()
    val n = try cdf.collect()(0).getLong(0)
      finally CommitLogReadTracker.disable()
    assert(CommitLogReadTracker.drain().isEmpty,
      "masked COUNT(*) is still metadata-only")
    assert(n == 180L)
    // MIN under a mask cannot come from footers (the extreme row might
    // be dead) — the normal scan answers, and answers right: id 0 is
    // masked, so MIN is 1
    val mdf = v2(table).agg(min(col("id")))
    assert(!mdf.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    assert(mdf.collect()(0).getLong(0) == 1L)
  }

  test("declines keep correctness: filters, group-by, double columns, " +
      "time travel answers at the pinned version") {
    val s = spark
    val table = tmp("decl")
    seed(table)
    // a filtered count must NOT be answered from footers
    val f = v2(table).filter(col("id") > 150L).agg(count(lit(1)))
    assert(!f.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    assert(f.collect()(0).getLong(0) == 49L)
    // group-by falls back
    val g = v2(table).groupBy(col("tag")).count()
    assert(!g.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    assert(g.count() == 200L)
    // double min/max declines (NaN ordering — same rule as the index)
    val d = v2(table).agg(min(col("score")))
    assert(!d.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    // a COUNT over a pinned version answers that version
    val pinned = s.read.format("graft-commitlog").option("path", table)
      .option("versionAsOf", "0").load().agg(count(lit(1)))
    assert(pinned.collect()(0).getLong(0) == 100L)
    assert(pinned.queryExecution.executedPlan.toString
      .contains("AGG-PUSHDOWN"))
    // schema evolution: COUNT(late) counts only the generation that has it
    val s2 = s
    import s2.implicits._
    (1000L until 1010L).map(i => (i, s"p$i", 0.0, i * 2))
      .toDF("id", "tag", "score", "late")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    val lateCount = v2(table).agg(count(col("late")))
    assert(lateCount.collect()(0).getLong(0) == 10L)
    assert(lateCount.queryExecution.executedPlan.toString
      .contains("AGG-PUSHDOWN"))
    // and MIN over the renamed column translates through column mapping
    CommitLogIngest.renameColumn(s, table, "late", "extra")
    val mr = v2(table).agg(max(col("extra")))
    assert(mr.collect()(0).getLong(0) == 2018L)
    assert(mr.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
  }

  test("COUNT over an array column declines (leaf-path chunks would read " +
      "as absent → 0); SHORT/BYTE extremes narrow to the declared width") {
    val s = spark
    import s.implicits._
    val table = tmp("complex")
    (0 until 50).map(i => (i.toLong, Seq(i.toFloat, i + 1f),
        (i % 7).toShort, (i % 5).toByte))
      .toDF("id", "vec", "sh", "by")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    // COUNT(array col): its footer chunks live under vec.list.element,
    // so the top-level-name match is empty — must decline to the scan,
    // never answer 0
    val c = v2(table).agg(count(col("vec")).as("nv"))
    assert(!c.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"),
      "COUNT over a complex column must not be footer-answered")
    assert(c.collect()(0).getLong(0) == 50L)
    // SHORT/BYTE columns store as parquet INT32: the pushed extreme must
    // narrow the boxed Integer stat or row access throws CCE
    val m = v2(table).agg(min(col("sh")).as("a"), max(col("sh")).as("b"),
      min(col("by")).as("c"), max(col("by")).as("d"))
    assert(m.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    val r = m.collect()(0)
    assert(r.getShort(0) == 0.toShort && r.getShort(1) == 6.toShort)
    assert(r.getByte(2) == 0.toByte && r.getByte(3) == 4.toByte)
  }

  test("GROUP BY a partition column answers from footers (round-13 task " +
      "5): zero data pages, exact per-day counts/extremes; masked counts " +
      "subtract per group and fully-masked groups vanish; extremes under " +
      "masks and non-partition keys decline") {
    val s = spark
    import s.implicits._
    val table = tmp("grp")
    (0L until 1000L).map(i => (i, i % 4, s"p$i")).toDF("id", "day", "tag")
      .write.format("graft-commitlog").option("path", table)
      .option("partitionCols", "day").option("statsCol", "id")
      .option("enableDv", "true").mode("append").save()
    val df = v2(table).groupBy(col("day"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    CommitLogReadTracker.enable()
    val r = try df.collect() finally CommitLogReadTracker.disable()
    assert(CommitLogReadTracker.drain().isEmpty,
      "a pushed grouped aggregate must open no data pages")
    assert(df.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    val m = r.map(x =>
      x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(m == (0L until 4L).map(d =>
      d -> ((250L, d, 996L + d))).toMap, s"wrong groups: $m")
    // non-partition group key declines even on a partitioned table
    val gt = v2(table).groupBy(col("tag")).count()
    assert(!gt.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    assert(gt.count() == 1000L)
    // dv-delete ALL of day 1 and half of day 2: counts stay pushed and
    // exact (footer rows − per-file mask), the empty group disappears
    CommitLogIngest.deleteWhere(s, table, col("day") === 1L,
      statsCol = Some("id"))
    CommitLogIngest.deleteWhere(s, table,
      col("day") === 2L && col("id") < 500L, statsCol = Some("id"))
    val c2 = v2(table).groupBy(col("day")).agg(count(lit(1)).as("n"))
    CommitLogReadTracker.enable()
    val r2 = try c2.collect() finally CommitLogReadTracker.disable()
    assert(CommitLogReadTracker.drain().isEmpty,
      "masked grouped COUNT(*) is still metadata-only")
    assert(c2.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    val m2 = r2.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(m2 == Map(0L -> 250L, 2L -> 125L, 3L -> 250L),
      s"masked group counts wrong: $m2")
    // grouped MIN under a mask cannot come from footers — falls back and
    // stays exact (first live day-2 id is 502)
    val gmn = v2(table).groupBy(col("day")).agg(min(col("id")).as("mn"))
    assert(!gmn.queryExecution.executedPlan.toString
      .contains("AGG-PUSHDOWN"))
    val m3 = gmn.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(m3 == Map(0L -> 0L, 2L -> 502L, 3L -> 3L), s"fallback wrong: $m3")
  }

  test("SQL COUNT(*) on the catalog table rides the same pushdown") {
    val s = spark
    val table = tmp("sql")
    seed(table)
    s.sql(s"""CREATE TABLE aggsql (id BIGINT, tag STRING, score DOUBLE)
      USING `graft-commitlog` OPTIONS (path '$table')""")
    try {
      val df = s.sql("SELECT COUNT(*) FROM aggsql")
      assert(df.collect()(0).getLong(0) == 200L)
      assert(df.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    } finally s.sql("DROP TABLE IF EXISTS aggsql")
  }
}

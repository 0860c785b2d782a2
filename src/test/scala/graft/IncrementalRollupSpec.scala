package graft


import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.IncrementalRollup

/** The incremental rollup's reason to exist is O(delta) maintenance:
  * merging a batch must rewrite ONLY the day partitions the delta
  * touches, and its read of the existing rollup must partition-prune to
  * those days. Value equality with a full recompute is the DuckDB
  * oracle's job (`src_incr_rollup`); this spec pins the maintenance
  * mechanics the oracle cannot see. */
class IncrementalRollupSpec extends SparkSuite {

  // ts is CANONICAL nanos-since-epoch LONG (the shape Tables.events
  // normalizes every encoding to — buildBase/mergeDelta operate on
  // normalized frames; the staleness test's parquet round-trips through
  // Tables.events' plain-int64 path)
  private def synthEvents(nDays: Int, perDay: Int, valueSeed: Double) = {
    val s = spark
    import s.implicits._
    (0 until nDays * perDay).map { i =>
      val day = i / perDay
      (i.toLong,
        (1704067200000L + day.toLong * 86400000L + i % perDay) * 1000000L,
        (i % 7).toLong,
        if (i % 3 == 0) "click" else "view",
        valueSeed + i % 11,
        "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def listing(dir: String): Map[String, Seq[(String, Long, Long)]] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(_.getName.startsWith("day="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.isFile).toSeq.sortBy(_.getName)
          .map(f => (f.getName, f.length(), f.lastModified()))
      }.toMap
  }

  test("merge rewrites only the delta's day partitions") {
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-mech").toString + "/rollup"
    val events = synthEvents(nDays = 5, perDay = 60, valueSeed = 1.0)
    val dayCol = expr(s"ts div ${graft.sources.EventsLayout.NanosPerDay}")
    val dmax = events.agg(max(dayCol)).head().getLong(0)

    IncrementalRollup.buildBase(events.filter(dayCol < dmax), dir)
    val before = listing(dir)
    assert(before.size == 4, s"expected 4 base day dirs, got ${before.size}")

    IncrementalRollup.mergeDelta(s, dir, events.filter(dayCol === dmax))
    val after = listing(dir)
    assert(after.size == 5, s"expected 5 day dirs after merge, got ${after.size}")
    // every pre-existing partition is byte-identical (same files, sizes,
    // mtimes): dynamic overwrite replaced ONLY the delta's day
    before.foreach { case (day, files) =>
      assert(after(day) == files,
        s"untouched partition $day was rewritten by the merge")
    }
  }

  test("the merge's read of the existing rollup partition-prunes to touched days") {
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-prune").toString + "/rollup"
    val events = synthEvents(nDays = 6, perDay = 30, valueSeed = 2.0)
    IncrementalRollup.buildBase(events, dir)
    val d0 = events
      .agg(min(expr(s"ts div ${graft.sources.EventsLayout.NanosPerDay}")))
      .head().getLong(0)
    val read = IncrementalRollup.touchedPartials(s, dir, Seq(d0, d0 + 1))
    read.collect()
    val scans = unwrapPlan(read.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no scan over the rollup layout found")
    scans.foreach { f =>
      val pf = f.partitionFilters.map(_.sql).mkString(" ")
      assert(pf.contains("day"),
        s"existing-rollup read has no day partition filter (filters: $pf)")
      assert(f.selectedPartitions.partitionCount <= 2,
        s"merge read ${f.selectedPartitions.partitionCount} partitions of " +
          "the rollup, wanted <= 2 (O(delta) maintenance violated)")
    }
  }

  test("incremental base+merge equals a full recompute") {
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-eq").toString + "/rollup"
    val events = synthEvents(nDays = 4, perDay = 50, valueSeed = 3.0)
    val dayCol = expr(s"ts div ${graft.sources.EventsLayout.NanosPerDay}")
    val dmax = events.agg(max(dayCol)).head().getLong(0)
    IncrementalRollup.buildBase(events.filter(dayCol < dmax), dir)
    IncrementalRollup.mergeDelta(s, dir, events.filter(dayCol === dmax))

    val incremental = s.read.parquet(dir)
      .select(col("day").cast("long").as("day"), col("event_type"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val full = events
      .groupBy(dayCol.as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(incremental == full,
      s"incremental rollup diverged from full recompute")
  }

  test("single-day corpus: empty base build then delta merge bootstraps cleanly") {
    // all rows on one epoch day ⇒ buildBase runs on an EMPTY frame and
    // leaves a dir holding only _SUCCESS; the merge must treat that as
    // "no layout" (reading it would throw UNABLE_TO_INFER_SCHEMA)
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-oneday").toString + "/rollup"
    val events = synthEvents(nDays = 1, perDay = 30, valueSeed = 6.0)
    val dayCol = expr(s"ts div ${graft.sources.EventsLayout.NanosPerDay}")
    val dmax = events.agg(max(dayCol)).head().getLong(0)
    IncrementalRollup.buildBase(events.filter(dayCol < dmax), dir)
    IncrementalRollup.mergeDelta(s, dir, events.filter(dayCol === dmax))
    val n = s.read.parquet(dir).agg(sum(col("n_events"))).head().getLong(0)
    assert(n == 30, s"single-day bootstrap lost rows (rolled up $n of 30)")
  }

  test("base+merge rollup is invariant to shuffle partition count") {
    // counts are exact; double sums round before compare (the suite-wide
    // sum-oracle treatment) — a placement-sensitive merge would diverge
    val s = spark
    val events = synthEvents(nDays = 4, perDay = 45, valueSeed = 5.0)
    val dayCol = expr(s"ts div ${graft.sources.EventsLayout.NanosPerDay}")
    val dmax = events.agg(max(dayCol)).head().getLong(0)
    def buildAt(parts: String): Seq[String] = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-incr-inv").toString + "/rollup"
      try {
        s.conf.set("spark.sql.shuffle.partitions", parts)
        IncrementalRollup.buildBase(events.filter(dayCol < dmax), dir)
        IncrementalRollup.mergeDelta(s, dir, events.filter(dayCol === dmax))
        s.read.parquet(dir)
          .select(col("day").cast("long"), col("event_type"),
            col("n_events"), round(col("sum_value"), 4))
          .collect().map(_.toString).sorted.toSeq
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val at4 = buildAt("4")
    val at37 = buildAt("37")
    assert(at4.nonEmpty && at4 == at37,
      "maintained rollup differs across partition counts")
  }

  test("regenerated events rebuild the rollup (fingerprint staleness)") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-stale")
    dir.toFile.deleteOnExit()
    val d = dir.toString
    def write(perDay: Int): Unit =
      synthEvents(nDays = 3, perDay = perDay, valueSeed = 4.0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    write(perDay = 20)
    val n1 = IncrementalRollup.rollupRead(s, d)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(n1 == 60, s"expected 60 events rolled up, got $n1")
    write(perDay = 40)
    val n2 = IncrementalRollup.rollupRead(s, d)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(n2 == 120,
      s"stale rollup served after events regeneration (saw $n2)")
  }
}

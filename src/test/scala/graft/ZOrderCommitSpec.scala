package graft

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** `OPTIMIZE ... ZORDER BY` INSIDE the commit log (round-12 verdict task
  * 5) and the SQL maintenance surface (task 6): the Morton re-clustering
  * lands as one atomic layout-only version whose census is unchanged,
  * point reads on EITHER clustered axis prune through the multi-column
  * stats index to a strict fraction of the files, pinned readers keep the
  * pre-rewrite snapshot, a re-run is a no-op, and every SQL maintenance
  * form lands identical results to its API call. */
class ZOrderCommitSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-zoc-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  /** events-shaped table, ts-ordered appends (the anti-clustered layout:
    * every file spans the full user range). */
  private def buildLinear(table: String, files: Int = 8): Unit = {
    val s = spark
    import s.implicits._
    // 4000 rows over 64 users × 64 days, written in DAY order so each
    // append (= file) covers ALL users of its day slice
    (0 until files).foreach { w =>
      (0 until 500).map { i =>
        val g = w * 500 + i
        val day = (g / 64) % 64
        val user = g % 64
        (g.toLong, user.toLong, day.toLong, g * 1.5)
      }.toDF("id", "user_id", "day", "v")
        .coalesce(1)
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append").save()
    }
  }

  private def census(table: String): Seq[(Long, Long, Long)] = {
    val s = spark
    CommitLogIngest.snapshot(s, table)
      .agg(count(lit(1)), sum("id"), sum("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("zorder commit: census unchanged, both axes prune, pinned snapshot, re-run no-op") {
    val s = spark
    val table = tmp("core")
    buildLinear(table)
    val before = census(table)
    val preV = CommitLogIngest.latestVersion(table)
    val preCount = CommitLogIngest.snapshot(s, table).count()

    // small target bytes force a multi-file clustered layout, so the
    // geometry assertion below measures clustering, not a 1-file trivium
    val (v, removed, added) = CommitLogIngest.optimizeZOrder(s, table,
      Seq("user_id", "day"), statsCol = Some("id"),
      maxFileBytes = 4L * 1024)
    assert(v == preV + 1 && removed == 8 && added >= 4,
      s"unexpected commit shape: v$v, $removed removed, $added added")
    assert(census(table) == before, "zorder changed the census")

    // geometry through the E-143 index: a point read on EITHER axis
    // keeps a strict fraction of the clustered files
    val live = CommitLogIngest.liveFiles(s, table, v)
    val idx = s.read.option("mergeSchema", "true").parquet(s"$table/index")
      .filter(col("path").isin(live: _*))
      .select(col("path"),
        col("mins").getField("user_id").as("umin"),
        col("maxs").getField("user_id").as("umax"),
        col("mins").getField("day").as("dmin"),
        col("maxs").getField("day").as("dmax"))
      .collect()
    assert(idx.length == live.size, "every clustered file must have stats")
    def overlapping(lo: String, hi: String, p: Long): Int =
      idx.count(r => r.getAs[Long](lo) <= p && p <= r.getAs[Long](hi))
    // average over several probes (file boundaries are quantile-derived,
    // not dyadic-aligned, so single-point counts swing). The user axis —
    // unprunable pre-zorder: every day-ordered file spanned ALL users —
    // must drop to ≤ half; the day axis gets the odd interleave bit
    // (5 day bits vs 4 user bits per 512-cell Morton block), so its
    // blocks are twice as wide — bounded at 2/3.
    def avgHits(lo: String, hi: String): Double = {
      val probes = Seq(5L, 17L, 33L, 49L)
      probes.map(p => overlapping(lo, hi, p)).sum.toDouble / probes.size
    }
    val userHits = avgHits("umin", "umax")
    val dayHits = avgHits("dmin", "dmax")
    assert(userHits <= live.size / 2.0,
      s"point-user candidate set $userHits of ${live.size} — not clustered")
    assert(dayHits <= live.size * 2.0 / 3.0,
      s"point-day candidate set $dayHits of ${live.size} — not clustered")

    // pinned reader: the pre-rewrite version still reads in full
    assert(s.read.format("graft-commitlog").option("path", table)
      .option("versionAsOf", preV.toString).load().count() == preCount)
    // a layout-only version contributes nothing to the change feed
    assert(CommitLogIngest.changeFeed(s, table, v - 1, v).count() == 0L)
    // re-run against the unchanged table: no-op, no new version
    assert(CommitLogIngest.optimizeZOrder(s, table, Seq("user_id", "day"),
      Some("id"), maxFileBytes = 4L * 1024) == ((-1L, 0, 0)))
    assert(CommitLogIngest.latestVersion(table) == v)
    // ...but a fresh append re-arms it
    buildLinear(table, files = 1)
    val (v2, _, _) = CommitLogIngest.optimizeZOrder(s, table,
      Seq("user_id", "day"), Some("id"), maxFileBytes = 4L * 1024)
    assert(v2 == v + 2, "zorder after new data must land a fresh version")
    // history names the operation
    val ops = CommitLogIngest.history(s, table)
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(v) == "zorder" && ops(v2) == "zorder")
  }

  test("SQL OPTIMIZE / ZORDER BY / VACUUM / DESCRIBE HISTORY match the API") {
    val s = spark
    val table = tmp("sql")
    buildLinear(table, files = 4)
    val before = census(table)

    // OPTIMIZE (size compaction): 4 small files converge
    val opt = s.sql(s"OPTIMIZE '$table'").collect()(0)
    assert(opt.getLong(0) == 4L && opt.getInt(1) == 4,
      s"unexpected OPTIMIZE result $opt")
    assert(census(table) == before)

    // OPTIMIZE ... ZORDER BY: same engine as optimizeZOrder
    val zo = s.sql(s"OPTIMIZE '$table' ZORDER BY (user_id, day)")
      .collect()(0)
    assert(zo.getLong(0) == 5L, s"unexpected ZORDER version $zo")
    assert(census(table) == before)
    // idempotent through SQL too
    assert(s.sql(s"OPTIMIZE '$table' ZORDER BY (user_id, day)")
      .collect()(0).getLong(0) == -1L)

    // DESCRIBE HISTORY mirrors the API frame
    val viaSql = s.sql(s"DESCRIBE HISTORY '$table'").collect()
      .map(_.toString).sorted.toSeq
    val viaApi = CommitLogIngest.history(s, table)
      .select("version", "n_added", "n_removed", "n_masked", "txn",
        "schema_change", "operation").collect().map(_.toString).sorted.toSeq
    assert(viaSql == viaApi, "DESCRIBE HISTORY diverged from the API")
    assert(viaSql.nonEmpty)

    // VACUUM ... RETAIN: mtimes are 'now', so a 1000h horizon reclaims
    // nothing and floors at the oldest surviving version
    val vac = s.sql(s"VACUUM '$table' RETAIN 1000 HOURS").collect()(0)
    assert(vac.getInt(1) == 0, "a wide horizon must reclaim nothing")
    assert(census(table) == before)

    // malformed retention refused at ANALYSIS, zero mutation
    val vBefore = CommitLogIngest.latestVersion(table)
    val e = intercept[Exception] {
      s.sql(s"VACUUM '$table' RETAIN -1 HOURS")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("positive"))))
    assert(CommitLogIngest.latestVersion(table) == vBefore)
    // and unrelated SQL still parses through the delegate
    assert(s.sql("SELECT 1 + 1").collect()(0).getInt(0) == 2)

    // a non-numeric clustering axis is refused before any rewrite
    val z = intercept[IllegalArgumentException] {
      CommitLogIngest.optimizeZOrder(s, table, Seq("user_id", "v"),
        Some("id"))
    }
    assert(z.getMessage.contains("integral"))
    assert(CommitLogIngest.latestVersion(table) == vBefore,
      "refused zorder must not commit")
  }

  test("a DateType clustering axis works (unix_date, not the forbidden " +
      "date->bigint cast)") {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-zod")
    d.toFile.deleteOnExit()
    val table = d.toString + "/t"
    (0L until 200L).map(i =>
        (i, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d")))
      .toDF("id", "day")
      .write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    val before = CommitLogIngest.snapshot(s, table).count()
    val (v, nRem, nAdd) = CommitLogIngest.optimizeZOrder(s, table,
      Seq("day", "id"))
    assert(v > 0 && nRem > 0 && nAdd > 0,
      s"date-axis zorder must commit, got ($v, $nRem, $nAdd)")
    assert(CommitLogIngest.snapshot(s, table).count() == before)
    // census-exact through the rewrite
    assert(CommitLogIngest.snapshot(s, table)
      .agg(sum(col("id"))).collect()(0).getLong(0) ==
      (0L until 200L).sum)
  }
}

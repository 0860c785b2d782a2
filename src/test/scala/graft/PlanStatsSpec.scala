package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** PRUNE-AWARE planning statistics through the V2 connector
  * (`SupportsReportStatistics`): a V2 scan without them reports
  * `defaultSizeInBytes` — effectively infinite — so a commit-log
  * dimension table could never auto-broadcast and every join against one
  * planned sort-merge regardless of its real size. The scan now reports
  * the on-disk byte sum of exactly the files it will open (after
  * partition/index/sketch pruning), so Catalyst's JoinSelection sees the
  * true cost and a filtered read shrinks to its pruned size. */
class PlanStatsSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-stats-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def seed(table: String): Unit = {
    val s = spark
    import s.implicits._
    (0 until 3).foreach { day =>
      (0 until 200).map(i => (day * 1000L + i, day, s"p$i"))
        .toDF("id", "day", "tag").coalesce(1)
        .write.format("graft-commitlog").option("path", table)
        .option("partitionCols", "day")
        .option("statsCol", "id").mode("append").save()
    }
  }

  private def v2(table: String) =
    spark.read.format("graft-commitlog").option("path", table).load()

  private def reportedSize(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
    }.head

  private def bytesOf(files: Seq[String]): Long =
    files.map(f => java.nio.file.Files.size(
      java.nio.file.Paths.get(graft.sources.LayoutDirs.localPath(f)))).sum

  test("reported sizeInBytes equals the live on-disk byte sum; a pushed " +
      "partition filter shrinks it to the pruned files") {
    val table = tmp("size")
    seed(table)
    val live = CommitLogIngest.liveState(spark, table,
      CommitLogIngest.latestVersion(table))._1
    assert(reportedSize(v2(table)) == BigInt(bytesOf(live)))
    val oneDay = live.filter(_.contains("day=1"))
    assert(oneDay.nonEmpty && oneDay.size < live.size)
    assert(reportedSize(v2(table).filter(col("day") === 1)) ==
      BigInt(bytesOf(oneDay)),
      "day filter must shrink reported stats to the pruned partition")
  }

  test("a small commit-log table auto-broadcasts in a join — and stops " +
      "broadcasting when the threshold drops below its reported size") {
    val table = tmp("join")
    seed(table)
    // the probe side must EXCEED the 10MB default threshold (range
    // reports 8 bytes/row), or Spark would broadcast IT and the plan
    // would carry a BroadcastHashJoin with or without this feature —
    // with both sides over the threshold, a broadcast can only come
    // from the commit-log side's reported size
    val big = spark.range(0, 3000000L).select(col("id"),
      (col("id") % 7).as("grp"))
    def joined = big.join(v2(table), Seq("id")).groupBy(col("day"))
      .agg(count(lit(1)).as("n"))
    def shape: String = joined.queryExecution.executedPlan.toString
    assert(shape.contains("BroadcastHashJoin"),
      "a KiB-sized commit-log table must broadcast under the default " +
        "10MB threshold:\n" + shape)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")
      assert(!joined.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
        "threshold 1 byte must defeat the auto-broadcast — proves " +
          "JoinSelection consulted the REPORTED size, not an accident")
    } finally spark.conf.set(key, old)
    // values stay exact through the broadcast plan
    val got = joined.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 200L, 1 -> 200L, 2 -> 200L))
  }

  test("a pinned version reports ITS OWN file set's size, not the " +
      "latest's") {
    val table = tmp("pin")
    seed(table)
    val v0Files = CommitLogIngest.liveState(spark, table, 0L)._1
    val (delV, _) = CommitLogIngest.deleteWhere(spark, table,
      col("day") === 0, statsCol = Some("id"))
    val latest = CommitLogIngest.liveState(spark, table, delV)._1
    assert(reportedSize(spark.read.format("graft-commitlog")
        .option("path", table).option("versionAsOf", "0").load()) ==
      BigInt(bytesOf(v0Files)))
    assert(reportedSize(v2(table)) == BigInt(bytesOf(latest)))
    assert(v0Files.size == 1 && latest != v0Files,
      "sanity: the pinned and latest file sets genuinely differ")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** Round-12 CDF contracts: stored change data is PER-TABLE OPT-IN
  * (default off — a plain table's DML pays no change-row storage), the
  * read-time diff fallback keeps disabled tables readable through the
  * API, overwrites derive their change set from the log with zero diff
  * compute, vacuum reclaims stored change data under the same retention
  * floor, and the reserved CDF column names are refused on collision. */
class CdfGatingSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-cdfg-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def appendRows(table: String, from: Long, n: Long,
      enableCdf: Boolean = false): Unit = {
    val s = spark
    import s.implicits._
    val w = (from until from + n).map(i => (i, s"p$i", i * 10))
      .toDF("id", "p", "n")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append")
    (if (enableCdf) w.option("enableCdf", "true") else w).save()
  }

  test("CDF is off by default: DML stores nothing, the API falls back") {
    val s = spark
    val table = tmp("off")
    appendRows(table, 0L, 100L)
    assert(!CommitLogIngest.cdfEnabled(table))
    val (dv, _) = CommitLogIngest.deleteWhere(s, table,
      col("id") % 7 === 3, statsCol = Some("id"))
    val (uv, _) = CommitLogIngest.updateWhere(s, table,
      col("id") % 5 === 0, Map("n" -> (col("n") + 1L)),
      statsCol = Some("id"))
    // no stored change data anywhere
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "cdf")))
    // the API still answers through the read-time diff (an update
    // DEGRADES to delete+insert without the stored pairs — documented)
    val delFeed = CommitLogIngest.changeFeed(s, table, dv - 1, dv)
    assert(delFeed.filter(col("_change_type") === "delete").count() > 0)
    val updFeed = CommitLogIngest.changeFeed(s, table, uv - 1, uv)
    val types = updFeed.select("_change_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("delete", "insert"),
      s"fallback diff should be keyless delete+insert, got $types")
    // the V2 stored-CDF surface refuses loudly and names the switch
    val e = intercept[Exception] {
      s.read.format("graft-commitlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", dv.toString).load().count()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("setCdfEnabled")))
  }

  test("an overwrite stores no change rows yet feeds CDF from the log") {
    val s = spark
    import s.implicits._
    val table = tmp("ovw")
    appendRows(table, 0L, 50L, enableCdf = true)
    // the overwrite WRITES THE SAME 20 ROWS twice over — under the old
    // exceptAll diff these would cancel; the Delta overwrite semantic
    // (old snapshot logically deleted, new one inserted) keeps both
    (0L until 20L).map(i => (i, s"p$i", i * 10)).toDF("id", "p", "n")
      .write.format("graft-commitlog").option("path", table)
      .mode("overwrite").save()
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "cdf", "version=1")),
      "overwrite must not store change rows — the log already knows")
    val feed = CommitLogIngest.changeFeed(s, table, 0L, 1L)
    assert(feed.filter(col("_change_type") === "delete").count() == 50L)
    assert(feed.filter(col("_change_type") === "insert").count() == 20L)
    // V2 surface agrees
    val v2 = s.read.format("graft-commitlog").option("path", table)
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load()
    assert(v2.filter(col("_change_type") === "delete").count() == 50L)
    assert(v2.filter(col("_change_type") === "insert").count() == 20L)
    // history names the op exactly
    val ops = CommitLogIngest.history(s, table)
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(1L) == "overwrite")
  }

  test("vacuum reclaims stored change data below the retention floor") {
    val s = spark
    val table = tmp("vac")
    appendRows(table, 0L, 100L, enableCdf = true)   // v0
    val (dv, _) = CommitLogIngest.deleteWhere(s, table,
      col("id") % 7 === 3, statsCol = Some("id"))   // v1 stores cdf
    val (uv, _) = CommitLogIngest.updateWhere(s, table,
      col("id") % 5 === 0, Map("n" -> (col("n") + 1L)),
      statsCol = Some("id"))                        // v2 stores cdf
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "cdf", s"version=$dv")))
    val dropped = CommitLogIngest.vacuum(s, table, retainMin = uv)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "cdf", s"version=$dv")),
      "v1's change rows are below the floor — must be reclaimed")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "cdf", s"version=$uv")),
      "v2 is at the floor — its change rows must survive")
    assert(dropped.exists(_.contains(s"version=$dv")))
    // the surviving version's stored CDF still reads
    assert(CommitLogIngest.changeFeed(s, table, uv - 1, uv).count() > 0)
  }

  test("merge on a CDF-enabled table stores keyed pre/post images + inserts") {
    val s = spark
    import s.implicits._
    val table = tmp("merge")
    appendRows(table, 0L, 100L, enableCdf = true)
    // 10 matched keys (n bumped by 7) + 5 brand-new keys
    val upd = ((0L until 10L).map(i => (i * 10, s"p${i * 10}",
        i * 100 + 7)) ++
      (500L until 505L).map(i => (i, s"new$i", i)))
      .toDF("id", "p", "n")
    val (v, _) = graft.streaming.CommitLogIngest.mergeByKey(s, table, upd,
      "id", statsCol = Some("id"))
    val feed = graft.streaming.CommitLogIngest.changeFeed(s, table, v - 1, v)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType ==
      Map("update_preimage" -> 10L, "update_postimage" -> 10L,
        "insert" -> 5L), s"merge CDF tags wrong: $byType")
    // images pair per key and the post value is the update's
    val pairs = feed.filter(col("_change_type") =!= "insert")
      .groupBy("id").agg(
        sum(when(col("_change_type") === "update_preimage", col("n")))
          .as("pre"),
        sum(when(col("_change_type") === "update_postimage", col("n")))
          .as("post")).collect()
    assert(pairs.length == 10)
    pairs.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id * 10L, s"pre-image n wrong for id $id")
      assert(r.getLong(2) == (id / 10L) * 100L + 7L,
        s"post-image n wrong for id $id")
    }
    // inserts are exactly the unmatched keys
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (500L until 505L))
    // and the V2 surface reads the same stored rows
    val v2 = s.read.format("graft-commitlog").option("path", table)
      .option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load()
    assert(v2.count() == 25L)
  }

  test("reserved CDF column names are refused on collision") {
    val s = spark
    import s.implicits._
    val table = tmp("clash")
    Seq((1L, "x")).toDF("id", "_change_type")
      .write.format("graft-commitlog").option("path", table)
      .mode("append").save()
    val e = intercept[Exception] {
      s.read.format("graft-commitlog").option("path", table)
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load().count()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("reserved"))))
    // the plain read is untouched
    assert(s.read.format("graft-commitlog").option("path", table)
      .load().count() == 1L)
  }

  test("date partition values render as days-since-epoch on both sides") {
    import graft.sources.PartitionPaths
    val d = java.sql.Date.valueOf("2024-01-03")
    val days = d.toLocalDate.toEpochDay
    assert(PartitionPaths.renderValue(d) == days.toString,
      "driver-side renderValue must match the task-side days-since-epoch")
    assert(PartitionPaths.renderValue(java.time.LocalDate.of(2024, 1, 3)) ==
      days.toString)
    // task-side render writes the int days — the two sides must agree or
    // partition-local rewrites route into dirs no write ever used
    val row = org.apache.spark.sql.catalyst.InternalRow(days.toInt)
    assert(PartitionPaths.render(
      org.apache.spark.sql.types.DateType, row, 0) == days.toString)
  }
}

package graft

import org.apache.spark.sql.Row

import graft.streaming.CommitLogIngest

/** The pure-SQL face of the commit-log table format: CREATE TABLE ...
  * USING graft-commitlog, INSERT INTO (append commit), INSERT OVERWRITE
  * (truncate commit), and SELECT — all resolved through the session
  * catalog and the same V2 read/write stack the DataFrame surface uses,
  * so every SQL mutation is one atomic log version with full time
  * travel underneath. */
class CommitLogSqlSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-sql-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("CREATE TABLE USING graft-commitlog + INSERT INTO + SELECT round-trip in SQL") {
    val s = spark
    val dir = tmp("sql") + "/t"
    s.sql(s"""CREATE TABLE clsql (id BIGINT, tag STRING)
      USING `graft-commitlog` OPTIONS (path '$dir')""")
    try {
      s.sql("INSERT INTO clsql VALUES (1, 'a'), (2, 'b')")
      s.sql("INSERT INTO clsql VALUES (3, 'c')")
      assert(CommitLogIngest.latestVersion(dir) == 1L,
        "each INSERT must land as one atomic log version")
      val rows = s.sql("SELECT id, tag FROM clsql ORDER BY id").collect()
      assert(rows.toSeq == Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
      // INSERT OVERWRITE = truncate commit; the pre-truncate version
      // still time-travels through the DataFrame reader
      s.sql("INSERT OVERWRITE clsql VALUES (9, 'z')")
      assert(s.sql("SELECT * FROM clsql").collect().toSeq ==
        Seq(Row(9L, "z")))
      assert(s.read.format("graft-commitlog").option("path", dir)
        .option("versionAsOf", "1").load().count() == 3)
      // aggregation pushes through the V2 scan
      assert(s.sql("SELECT COUNT(*) FROM clsql").collect()(0).getLong(0)
        == 1L)
    } finally s.sql("DROP TABLE IF EXISTS clsql")
  }

  test("SQL DELETE FROM lands one copy-on-write version; untranslatable predicates fail analysis") {
    val s = spark
    val dir = tmp("sqldel") + "/t"
    s.sql(s"""CREATE TABLE clsqldel (id BIGINT, tag STRING)
      USING `graft-commitlog` OPTIONS (path '$dir')""")
    try {
      s.sql("INSERT INTO clsqldel VALUES " +
        (0 until 20).map(i => s"($i, 't$i')").mkString(", "))
      s.sql("DELETE FROM clsqldel WHERE id < 5 OR id >= 18")
      assert(s.sql("SELECT MIN(id), MAX(id), COUNT(*) FROM clsqldel")
        .collect()(0).toSeq == Seq(5L, 17L, 13L))
      assert(CommitLogIngest.latestVersion(dir) == 1L,
        "the SQL delete must land as exactly one log version")
      // the pre-delete snapshot still time-travels
      assert(s.read.format("graft-commitlog").option("path", dir)
        .option("versionAsOf", "0").load().count() == 20)
      // an untranslatable predicate is an ANALYSIS error, never a wrong
      // delete (canDeleteWhere says no)
      val e = intercept[Exception] {
        s.sql("DELETE FROM clsqldel WHERE tag LIKE 't1%'")
      }
      assert(e.getMessage != null)
      assert(s.sql("SELECT COUNT(*) FROM clsqldel")
        .collect()(0).getLong(0) == 13L, "refused delete must not mutate")
      // DELETE without WHERE empties but keeps the table readable
      s.sql("DELETE FROM clsqldel")
      assert(s.sql("SELECT COUNT(*) FROM clsqldel")
        .collect()(0).getLong(0) == 0L)
    } finally s.sql("DROP TABLE IF EXISTS clsqldel")
  }

  test("SQL UPDATE matches the updateWhere API; subqueries are refused without mutating") {
    val s = spark
    import s.implicits._
    val sqlDir = tmp("squpd") + "/t"
    val apiDir = tmp("aupd") + "/t"
    def seed(): Unit = (0 until 2).foreach { w =>
      s.sql(s"INSERT INTO clsqlupd VALUES " +
        (w * 10 until w * 10 + 10)
          .map(i => s"($i, 't$i', ${i * 10})").mkString(", "))
    }
    s.sql(s"""CREATE TABLE clsqlupd (id BIGINT, tag STRING, n BIGINT)
      USING `graft-commitlog` OPTIONS (path '$sqlDir')""")
    try {
      seed()
      s.sql("UPDATE clsqlupd SET n = n + 1000, tag = concat(tag, '!') " +
        "WHERE id % 3 = 0")
      assert(CommitLogIngest.latestVersion(sqlDir) == 2L,
        "the SQL update must land as exactly one log version")
      // the API run on an identical table produces identical rows
      (0 until 2).foreach { w =>
        CommitLogIngest.commitAppend(
          (w * 10 until w * 10 + 10)
            .map(i => (i.toLong, s"t$i", i * 10L)).toDF("id", "tag", "n"),
          apiDir)
      }
      CommitLogIngest.updateWhere(s, apiDir,
        org.apache.spark.sql.functions.col("id") % 3 === 0,
        Map("n" -> (org.apache.spark.sql.functions.col("n") + 1000L),
          "tag" -> org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.col("tag"),
            org.apache.spark.sql.functions.lit("!"))))
      val viaSql = s.sql("SELECT * FROM clsqlupd").collect()
        .map(_.toString).sorted.toSeq
      val viaApi = CommitLogIngest.snapshot(s, apiDir).collect()
        .map(_.toString).sorted.toSeq
      assert(viaSql == viaApi, "SQL UPDATE diverged from updateWhere")
      // a subquery condition is refused loudly, and nothing mutates
      val pre = CommitLogIngest.latestVersion(sqlDir)
      val e = intercept[Exception] {
        s.sql("UPDATE clsqlupd SET n = 0 WHERE id IN " +
          "(SELECT id FROM clsqlupd WHERE n > 100)")
      }
      assert(chain(e).exists(_.contains("subqueries are not supported")),
        s"wrong refusal: ${e.getMessage}")
      assert(CommitLogIngest.latestVersion(sqlDir) == pre,
        "refused UPDATE must not mutate")
    } finally s.sql("DROP TABLE IF EXISTS clsqlupd")
  }

  test("SQL MERGE INTO matches the mergeByKey API; non-upsert shapes are refused") {
    val s = spark
    import s.implicits._
    val sqlDir = tmp("sqmrg") + "/t"
    val apiDir = tmp("amrg") + "/t"
    s.sql(s"""CREATE TABLE clsqlmrg (id BIGINT, tag STRING, n BIGINT)
      USING `graft-commitlog` OPTIONS (path '$sqlDir')""")
    try {
      s.sql("INSERT INTO clsqlmrg VALUES " +
        (0 until 10).map(i => s"($i, 't$i', ${i * 10})").mkString(", "))
      // upsert: ids 3,4 update; ids 100,101 insert
      s.sql(
        """MERGE INTO clsqlmrg t USING (
          |  SELECT * FROM VALUES (3, 'U3', 333), (4, 'U4', 444),
          |    (100, 'N0', 1), (101, 'N1', 2) AS v(id, tag, n)) sRc
          |ON t.id = sRc.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(CommitLogIngest.latestVersion(sqlDir) == 1L,
        "the SQL merge must land as exactly one log version")
      CommitLogIngest.commitAppend(
        (0 until 10).map(i => (i.toLong, s"t$i", i * 10L))
          .toDF("id", "tag", "n"), apiDir)
      CommitLogIngest.mergeByKey(s, apiDir,
        Seq((3L, "U3", 333L), (4L, "U4", 444L), (100L, "N0", 1L),
          (101L, "N1", 2L)).toDF("id", "tag", "n"), "id")
      val viaSql = s.sql("SELECT * FROM clsqlmrg").collect()
        .map(_.toString).sorted.toSeq
      val viaApi = CommitLogIngest.snapshot(s, apiDir).collect()
        .map(_.toString).sorted.toSeq
      assert(viaSql == viaApi, "SQL MERGE diverged from mergeByKey")
      // WHEN MATCHED THEN DELETE routes through the full clause-shape
      // merge since round 13 (CommitMergeFullSpec has the full matrix):
      // one more atomic version, id 3 gone
      val preDel = CommitLogIngest.latestVersion(sqlDir)
      s.sql(
        """MERGE INTO clsqlmrg t USING (SELECT 3 AS id) sRc
          |ON t.id = sRc.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(CommitLogIngest.latestVersion(sqlDir) == preDel + 1)
      assert(s.sql("SELECT COUNT(*) FROM clsqlmrg WHERE id = 3")
        .collect()(0).getLong(0) == 0L)
      assert(s.sql("SELECT COUNT(*) FROM clsqlmrg")
        .collect()(0).getLong(0) == viaSql.size - 1L)
      // a non-equality ON is still refused loudly, and nothing mutates
      val pre = CommitLogIngest.latestVersion(sqlDir)
      val e2 = intercept[Exception] {
        s.sql(
          """MERGE INTO clsqlmrg t USING (
            |  SELECT 3 AS id, 'x' AS tag, 1 AS n) sRc
            |ON t.id = sRc.id AND t.n > 0
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(chain(e2).exists(_.contains("key equality")),
        s"wrong refusal: ${e2.getMessage}")
      assert(CommitLogIngest.latestVersion(sqlDir) == pre,
        "refused MERGE must not mutate")
    } finally s.sql("DROP TABLE IF EXISTS clsqlmrg")
  }

  test("SQL RESTORE / SHALLOW CLONE land identical results to the API; " +
      "SQL DELETE goes merge-on-read once deletion vectors are enabled") {
    val s = spark
    import s.implicits._
    val dir = tmp("sqlrc") + "/t"
    (0L until 100L).map(i => (i, s"p$i")).toDF("id", "tag")
      .write.format("graft-commitlog").option("path", dir)
      .mode("append").save()
    val target = CommitLogIngest.latestVersion(dir)
    // flip DV on, then SQL DELETE through the catalog table: the commit
    // must be a mask, not a rewrite
    CommitLogIngest.setDvEnabled(dir)
    s.sql(s"""CREATE TABLE clsqlrc (id BIGINT, tag STRING)
      USING `graft-commitlog` OPTIONS (path '$dir')""")
    try {
      val filesBefore = CommitLogIngest.liveFiles(s, dir, target)
      s.sql("DELETE FROM clsqlrc WHERE id < 10")
      val vDel = CommitLogIngest.latestVersion(dir)
      assert(CommitLogIngest.liveFiles(s, dir, vDel) == filesBefore,
        "SQL DELETE on a DV table must move no data files")
      assert(s.sql("SELECT COUNT(*) FROM clsqlrc").collect()(0)
        .getLong(0) == 90L)
      // SQL RESTORE: back to the pre-delete state (materializes the mask)
      val r = s.sql(s"RESTORE '$dir' TO VERSION AS OF $target").collect()(0)
      assert(r.getLong(0) == vDel + 1)
      assert(s.sql("SELECT COUNT(*) FROM clsqlrc").collect()(0)
        .getLong(0) == 100L)
      assert(CommitLogIngest.snapshot(s, dir).count() == 100L)
      // SQL SHALLOW CLONE: zero-copy, census equal, then diverges
      val dst = tmp("sqlclone") + "/c"
      assert(s.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$dir'")
        .collect()(0).getLong(0) == 0L)
      assert(CommitLogIngest.snapshot(s, dst).count() == 100L)
      CommitLogIngest.deleteWhere(s, dst, org.apache.spark.sql
        .functions.col("id") < 50L)
      assert(CommitLogIngest.snapshot(s, dst).count() == 50L)
      assert(CommitLogIngest.snapshot(s, dir).count() == 100L,
        "clone writes must not disturb the source")
      // DESCRIBE DETAIL: the at-a-glance row reflects table state
      val det = s.sql(s"DESCRIBE DETAIL '$dir'").collect()(0)
      assert(det.getAs[String]("format") == "graft-commitlog")
      assert(det.getAs[Long]("version") ==
        CommitLogIngest.latestVersion(dir))
      assert(det.getAs[Int]("num_files") ==
        CommitLogIngest.liveFiles(s, dir,
          CommitLogIngest.latestVersion(dir)).size)
      assert(det.getAs[Boolean]("dv_enabled"))
      assert(det.getAs[Int]("num_masked_files") == 0,
        "restore materialized the mask — detail must agree")
      // DESCRIBE HISTORY carries the mask count column
      val hist = s.sql(s"DESCRIBE HISTORY '$dir'").collect()
      assert(hist.exists(r0 => r0.getAs[String]("operation") == "restore"))
      assert(hist.filter(_.getLong(0) == vDel)
        .head.getAs[Long]("n_masked") > 0L)
      // an out-of-range RESTORE refuses with zero mutation
      val pre = CommitLogIngest.latestVersion(dir)
      intercept[Exception] {
        s.sql(s"RESTORE '$dir' TO VERSION AS OF 99999").collect()
      }
      assert(CommitLogIngest.latestVersion(dir) == pre)
    } finally s.sql("DROP TABLE IF EXISTS clsqlrc")
  }

  test("SQL SELECT time travel: VERSION AS OF / TIMESTAMP AS OF match " +
      "the option-based read; pre-table instants refuse like the API") {
    val s = spark
    val dir = tmp("sqltt") + "/t"
    val preTable = System.currentTimeMillis()
    Thread.sleep(1100) // second-granular commit clocks on some FS
    s.sql(s"""CREATE TABLE clsqltt (id BIGINT, tag STRING)
      USING `graft-commitlog` OPTIONS (path '$dir')""")
    try {
      s.sql("INSERT INTO clsqltt VALUES (1, 'a'), (2, 'b')")
      Thread.sleep(1100)
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(1100)
      s.sql("INSERT INTO clsqltt VALUES (3, 'c')")
      // VERSION AS OF — both grammar forms — equals the option-based read
      def optRead(v: Long) =
        s.read.format("graft-commitlog").option("path", dir)
          .option("versionAsOf", v.toString).load()
          .collect().map(_.toString).sorted.toSeq
      def sqlRows(q: String) =
        s.sql(q).collect().map(_.toString).sorted.toSeq
      assert(sqlRows("SELECT * FROM clsqltt VERSION AS OF 0") == optRead(0))
      assert(
        sqlRows("SELECT * FROM clsqltt FOR VERSION AS OF 0") == optRead(0))
      assert(sqlRows("SELECT * FROM clsqltt VERSION AS OF 1") == optRead(1))
      assert(sqlRows("SELECT * FROM clsqltt VERSION AS OF 0").size == 2)
      // the pinned relation composes with ordinary SQL (agg + filter)
      assert(s.sql("SELECT COUNT(*) FROM clsqltt VERSION AS OF 1 WHERE " +
        "id > 1").collect()(0).getLong(0) == 2L)
      // TIMESTAMP AS OF: an instant between the commits pins version 0,
      // through the same claim-time clock the API resolves against
      val t = new java.sql.Timestamp(betweenMs).toString.stripSuffix(".0")
      assert(sqlRows(s"SELECT * FROM clsqltt TIMESTAMP AS OF '$t'")
        == optRead(0))
      assert(CommitLogIngest.versionAt(dir, betweenMs) == 0L,
        "SQL and API must resolve the instant to the same version")
      // a pre-table instant refuses with the API's own message
      val pre = new java.sql.Timestamp(preTable).toString.stripSuffix(".0")
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM clsqltt TIMESTAMP AS OF '$pre'").collect()
      }
      assert(chain(e).exists(_.contains("predates every surviving version")),
        s"wrong refusal: ${e.getMessage}")
      // a non-commit-log relation keeps Spark's own verdict
      s.sql("CREATE OR REPLACE TEMP VIEW plainview AS SELECT 1 AS x")
      val e2 = intercept[Exception] {
        s.sql("SELECT * FROM plainview VERSION AS OF 0").collect()
      }
      assert(chain(e2).nonEmpty)
    } finally s.sql("DROP TABLE IF EXISTS clsqltt")
  }

  private def chain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}

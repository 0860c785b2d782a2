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
}

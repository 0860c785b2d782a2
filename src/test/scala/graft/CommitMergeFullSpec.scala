package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest
import graft.streaming.CommitLogIngest.MergeClause._

/** FULL-shape MERGE through the commit log (round-12 verdict task 1) —
  * the Delta clause model: WHEN MATCHED [AND cond] THEN UPDATE/DELETE,
  * WHEN NOT MATCHED [AND cond] THEN INSERT, WHEN NOT MATCHED BY SOURCE
  * [AND cond] THEN UPDATE/DELETE. What a CDC-apply user needs pinned:
  *
  *  - clause semantics: first-true-wins within each clause family,
  *    unmatched-by-any-clause rows carried/ignored unchanged;
  *  - ONE atomic log version per merge, time travel below it intact;
  *  - SQL MERGE with the full clause list lands identical rows to the
  *    API call (same engine, two faces);
  *  - CDF rows follow the CDC contract (update pre/post pairs, deletes,
  *    inserts) when the table opted in;
  *  - ambiguity/shape refusals happen BEFORE any mutation. */
class CommitMergeFullSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-mf-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def seed(table: String, enableCdf: Boolean = false): Unit = {
    val s = spark
    import s.implicits._
    val w = (0L until 20L).map(i => (i, s"t$i", i * 10L)).toDF("id", "tag", "n")
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append")
    (if (enableCdf) w.option("enableCdf", "true") else w).save()
  }

  private def source() = {
    val s = spark
    import s.implicits._
    Seq((0L, 1L), (4L, 5L), (8L, 9L), (12L, 13L), (100L, 101L),
      (101L, 102L)).toDF("id", "m")
  }

  private val clauses = Seq(
    MatchedDelete(Some(src("m") > 10)),
    MatchedUpdate(Some(src("m") % 2 === 1), Map("n" -> (src("m") * 100))),
    NotMatchedInsert(Some(src("m") % 2 === 0),
      Map("id" -> src("id"), "tag" -> lit("new"), "n" -> src("m"))),
    NotMatchedBySourceUpdate(Some(col("id") === 5), Map("n" -> lit(555))),
    NotMatchedBySourceDelete(Some(col("id") >= 18)))

  /** The hand-computed end state of `clauses` over the seed table. */
  private def expected: Seq[(Long, String, Long)] = {
    val updated = Map(0L -> 100L, 4L -> 500L, 8L -> 900L, 5L -> 555L)
    (0L until 20L).filterNot(Set(12L, 18L, 19L))
      .map(i => (i, s"t$i", updated.getOrElse(i, i * 10L))) :+
      ((101L, "new", 102L))
  }

  private def rows(table: String): Seq[(Long, String, Long)] =
    CommitLogIngest.snapshot(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("all five clause kinds in one merge: matched delete/update, " +
      "conditional insert, NMBS update/delete — one atomic version") {
    val s = spark
    val table = tmp("all")
    seed(table)
    val (v, n) = CommitLogIngest.merge(s, table, source(), "id", clauses,
      statsCol = Some("id"))
    assert(v == 1L, s"full merge must land as ONE version, got $v")
    assert(n > 0)
    assert(rows(table) == expected)
    // time travel below the merge: the pre-merge snapshot is intact
    assert(CommitLogIngest.snapshot(s, table, 0L).count() == 20L)
    // unmatched source row no insert clause accepts (id=100, m=101 odd)
    // was ignored — already implied by `expected`, stated for the reader
    assert(!rows(table).exists(_._1 == 100L))
  }

  test("clause order is first-true-wins: an update listed before an " +
      "overlapping delete claims the row") {
    val s = spark
    val table = tmp("order")
    seed(table)
    val reordered = Seq(
      MatchedUpdate(Some(src("m") > 10), Map("n" -> lit(1))),
      MatchedDelete(None))
    CommitLogIngest.merge(s, table, source(), "id", reordered,
      statsCol = Some("id"))
    val r = rows(table)
    // id 12 (m=13 > 10): the UPDATE claims it before the catch-all DELETE
    assert(r.exists(x => x._1 == 12L && x._3 == 1L))
    // ids 0,4,8 (m <= 10): fall through to the DELETE
    assert(!r.exists(x => Set(0L, 4L, 8L).contains(x._1)))
    // unmatched targets carried; no insert clause -> no inserts
    assert(r.exists(_._1 == 13L) && !r.exists(_._1 > 19L))
  }

  test("SQL MERGE with the full clause list lands identical rows to the " +
      "API; one atomic version") {
    val s = spark
    val sqlT = tmp("sql")
    val apiT = tmp("api")
    seed(sqlT); seed(apiT)
    CommitLogIngest.merge(s, apiT, source(), "id", clauses,
      statsCol = Some("id"))
    s.sql(s"""CREATE TABLE mfull (id BIGINT, tag STRING, n BIGINT)
      USING `graft-commitlog` OPTIONS (path '$sqlT')""")
    try {
      s.sql(
        """MERGE INTO mfull t USING (
          |  SELECT * FROM VALUES (0L, 1L), (4L, 5L), (8L, 9L), (12L, 13L),
          |    (100L, 101L), (101L, 102L) AS v(id, m)) s
          |ON t.id = s.id
          |WHEN MATCHED AND s.m > 10 THEN DELETE
          |WHEN MATCHED AND s.m % 2 = 1 THEN UPDATE SET n = s.m * 100
          |WHEN NOT MATCHED AND s.m % 2 = 0 THEN
          |  INSERT (id, tag, n) VALUES (s.id, 'new', s.m)
          |WHEN NOT MATCHED BY SOURCE AND t.id = 5 THEN UPDATE SET n = 555
          |WHEN NOT MATCHED BY SOURCE AND t.id >= 18 THEN DELETE
          |""".stripMargin)
      assert(CommitLogIngest.latestVersion(sqlT) == 1L,
        "the SQL merge must land as exactly one log version")
      assert(rows(sqlT) == rows(apiT), "SQL full merge diverged from API")
      assert(rows(sqlT) == expected)
    } finally s.sql("DROP TABLE IF EXISTS mfull")
  }

  test("CDF rows of a full merge follow the CDC contract: pre/post " +
      "pairs, deletes, inserts") {
    val s = spark
    val table = tmp("cdf")
    seed(table, enableCdf = true)
    val (v, _) = CommitLogIngest.merge(s, table, source(), "id", clauses,
      statsCol = Some("id"))
    val feed = CommitLogIngest.changeFeed(s, table, v - 1, v)
      .select("id", "n", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val pre = feed.filter(_._3 == "update_preimage").map(x => (x._1, x._2))
    val post = feed.filter(_._3 == "update_postimage").map(x => (x._1, x._2))
    val del = feed.filter(_._3 == "delete").map(_._1)
    val ins = feed.filter(_._3 == "insert").map(x => (x._1, x._2))
    assert(pre == Set((0L, 0L), (4L, 40L), (8L, 80L), (5L, 50L)),
      s"wrong pre-images: $pre")
    assert(post == Set((0L, 100L), (4L, 500L), (8L, 900L), (5L, 555L)),
      s"wrong post-images: $post")
    assert(del == Set(12L, 18L, 19L), s"wrong deletes: $del")
    assert(ins == Set((101L, 102L)), s"wrong inserts: $ins")
  }

  test("refusals fire before any mutation: duplicate source keys, " +
      "unknown SET column, non-equality SQL ON, source-referencing NMBS") {
    val s = spark
    import s.implicits._
    val table = tmp("refuse")
    seed(table)
    // duplicate source keys: ambiguous — refused
    val e1 = intercept[IllegalArgumentException] {
      CommitLogIngest.merge(s, table,
        Seq((1L, 1L), (1L, 2L)).toDF("id", "m"), "id",
        Seq(MatchedDelete(None)))
    }
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)
    // unknown SET column
    val e2 = intercept[IllegalArgumentException] {
      CommitLogIngest.merge(s, table, source(), "id",
        Seq(MatchedUpdate(None, Map("nope" -> lit(1)))))
    }
    assert(e2.getMessage.contains("unknown column"), e2.getMessage)
    assert(CommitLogIngest.latestVersion(table) == 0L,
      "refused merges must not mutate")
    // SQL shapes: non-equality ON; NMBS referencing the source side
    s.sql(s"""CREATE TABLE mfref (id BIGINT, tag STRING, n BIGINT)
      USING `graft-commitlog` OPTIONS (path '$table')""")
    try {
      val e3 = intercept[Exception] {
        s.sql(
          """MERGE INTO mfref t USING (SELECT 3L AS id, 1L AS m) s
            |ON t.id = s.id AND t.n > 0
            |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(chain(e3).exists(_.contains("key equality")),
        s"wrong refusal: ${e3.getMessage}")
      // an NMBS condition reading the source is meaningless (no source
      // row on that side) — refused at analysis/planning, zero mutation
      intercept[Exception] {
        s.sql(
          """MERGE INTO mfref t USING (SELECT 3L AS id, 1L AS m) s
            |ON t.id = s.id
            |WHEN NOT MATCHED BY SOURCE AND s.m > 0 THEN DELETE""".stripMargin)
      }
      assert(CommitLogIngest.latestVersion(table) == 0L,
        "refused SQL merges must not mutate")
    } finally s.sql("DROP TABLE IF EXISTS mfref")
  }

  test("src_merge_full: the registry census equals the oracle SQL " +
      "replayed over the raw documents table") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.sources.DmlCommit.fullMergeCensus(s, sf)
      .collect().map(_.toString).sorted.toSeq
    graft.model.Tables.documents(s, sf)
      .createOrReplaceTempView("documents")
    val want = s.sql(graft.sources.DmlCommit.fullMergeCensusSql)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, s"oracle replay mismatch:\n got=$got\nwant=$want")
  }

  private def chain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}

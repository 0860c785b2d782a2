package graft

import org.apache.spark.sql.functions._

import graft.sources.CdfRollup
import graft.streaming.CommitLogIngest

/** Incremental MV maintenance from the change feed: the folded view must
  * equal the full recompute through EVERY mutation kind the feed can
  * carry — append (insert), CoW delete (delete), update (pre/post image
  * pairs), merge (pairs + inserts), deletion-vector delete (delete via
  * mask reconstruction) — with groups disappearing at count zero and
  * layout-only commits contributing nothing. */
class CdfRollupSpec extends SparkSuite {

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-mv")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def docs(from: Long, n: Long, source: String) = {
    val s = spark
    import s.implicits._
    (from until from + n).map(i => (i, source, i * 3))
      .toDF("doc_id", "source", "n_chars")
  }

  private def append(table: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft-commitlog").option("path", table)
      .option("enableCdf", "true").option("enableDv", "true")
      .mode("append").save()

  private def asMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("folded view tracks full recompute through append, CoW update, " +
      "merge, dv delete; a group vanishes at zero; OPTIMIZE contributes " +
      "nothing") {
    val s = spark
    import s.implicits._
    val table = tmp()
    append(table, docs(0L, 30L, "web"))
    val initV = CommitLogIngest.latestVersion(table)

    // every mutation kind, in sequence
    append(table, docs(100L, 20L, "books")) // insert
    CommitLogIngest.updateWhere(s, table, col("doc_id") % 4 === 0,
      Map("n_chars" -> (col("n_chars") + lit(7L)))) // pre/post pairs
    val upd = Seq((5L, "web", 999L), (50L, "arxiv", 50L))
      .toDF("doc_id", "source", "n_chars")
    CommitLogIngest.mergeByKey(s, table, upd, "doc_id") // pair + insert
    CommitLogIngest.deleteWhere(s, table, col("doc_id") >= 110L) // dv mask
    CommitLogIngest.optimize(s, table) // layout only — feed contributes 0

    val mv = asMap(CdfRollup.maintained(s, table, initV))
    val fullRecompute =
      asMap(CdfRollup.full(CommitLogIngest.snapshot(s, table)))
    assert(mv == fullRecompute,
      s"incremental $mv != recompute $fullRecompute")
    assert(mv("arxiv") == (1L, 50L), s"merge insert must reach the view: $mv")

    // a whole group disappearing must leave the view (not linger at 0)
    CommitLogIngest.deleteWhere(s, table, col("source") === "books")
    val mv2 = asMap(CdfRollup.maintained(s, table, initV))
    assert(!mv2.contains("books"), s"zero-count group lingered: $mv2")
    assert(mv2 ==
      asMap(CdfRollup.full(CommitLogIngest.snapshot(s, table))))

    // composability: a refresh from a LATER base (the previous fold's
    // horizon) lands the same view — the incremental loop's invariant.
    // `maintained` pins its version range at CALL time, so the frame
    // built BEFORE the append stays the mid-horizon view even though it
    // evaluates lazily after it.
    val mid = CommitLogIngest.latestVersion(table)
    val mvAtMid = CdfRollup.maintained(s, table, initV)
    append(table, docs(200L, 5L, "web"))
    val folded = CdfRollup.fold(mvAtMid,
      CdfRollup.delta(CommitLogIngest.changeFeed(s, table, mid,
        CommitLogIngest.latestVersion(table))))
    assert(asMap(folded) ==
      asMap(CdfRollup.full(CommitLogIngest.snapshot(s, table))))
  }
}

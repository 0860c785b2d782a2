package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.CommitLogIngest

/** Truncated-string stats in the commit-time index (round 12 — the Delta
  * truncated-string-stats semantics): equality/range string probes open
  * only overlapping files, a file whose stored max was PREFIX-INCREMENTED
  * is never wrongly skipped, and non-ASCII bounds never prune (the one
  * regime where UTF8/char orderings can disagree). Lives in
  * `graft.sources` to drive `CommitLogPlanning.pruneByIndex` directly —
  * the parquet footer skip would otherwise mask which layer pruned. */
class StringIndexSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-sidx-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def b(lo: String = null, hi: String = null)
      : Map[String, (Option[String], Option[String])] =
    Map("source" -> (Option(lo), Option(hi)))

  test("string probes keep only index-overlapping files across generations") {
    val s = spark
    import s.implicits._
    val table = tmp("bands")
    // 4 commits with DISJOINT source bands; every value < 32 chars so the
    // stored bounds are exact
    val bands = Seq("alpha", "beta", "gamma", "delta")
    bands.zipWithIndex.foreach { case (band, w) =>
      (0L until 100L).map(i => (w * 100L + i, f"$band-$i%03d"))
        .toDF("id", "source")
        .coalesce(1)
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "id").mode("append").save()
    }
    val live = CommitLogIngest.liveFiles(s, table, 3L)
    assert(live.size == 4)
    def prune(bounds: Map[String, (Option[String], Option[String])]) =
      CommitLogPlanning.pruneByIndex(s, table, live, Map.empty, bounds)

    // equality probe: exactly one band's file survives
    val eq = prune(b(lo = "beta-050", hi = "beta-050"))
    assert(eq.size == 1, s"equality probe kept ${eq.size} files")
    // range probe spanning two bands keeps exactly those two
    val rng = prune(b(lo = "beta-000", hi = "delta-999"))
    assert(rng.size == 2, s"[beta, delta] kept ${rng.size} files") // beta+delta
    // a probe below every band keeps nothing; above keeps nothing
    assert(prune(b(hi = "aaa")).isEmpty)
    assert(prune(b(lo = "zzz")).isEmpty)
    // the probes PROVE nothing was wrongly pruned: full results intact
    val t = s.read.format("graft-commitlog").option("path", table).load()
    assert(t.filter(col("source") === "beta-050").count() == 1L)
    assert(t.filter(col("source") >= "beta-000" &&
      col("source") <= "delta-999").count() == 200L)
  }

  test("a prefix-incremented truncated max never wrongly skips its file") {
    val s = spark
    import s.implicits._
    val table = tmp("trunc")
    val p32 = "x" * 32
    // every value shares a 32-char prefix and differs past the
    // truncation width: stored max = the prefix, strMaxExact = false
    Seq((1L, p32 + "a"), (2L, p32 + "m"), (3L, p32 + "z"))
      .toDF("id", "source").coalesce(1)
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    val idx = s.read.option("mergeSchema", "true").parquet(s"$table/index")
      .collect()
    assert(idx.forall { r =>
      val mx = r.getStruct(r.fieldIndex("strMaxs")).getAs[String]("source")
      val ex = r.getStruct(r.fieldIndex("strMaxExact"))
        .getAs[Boolean]("source")
      mx == p32 && !ex
    }, "expected a truncated, inexact stored max")
    val live = CommitLogIngest.liveFiles(s, table, 0L)
    def prune(bounds: Map[String, (Option[String], Option[String])]) =
      CommitLogPlanning.pruneByIndex(s, table, live, Map.empty, bounds)
    // probing a value INSIDE the truncated range must keep the file —
    // the naive "truncated max as upper bound" would wrongly skip it
    assert(prune(b(lo = p32 + "z", hi = p32 + "z")) == live)
    // a value the prefix-incremented bound proves absent is pruned:
    // everything with prefix x*32 is < x*31 + "y"
    assert(prune(b(lo = "x" * 31 + "y")).isEmpty)
    // and the read agrees with the kept files
    val t = s.read.format("graft-commitlog").option("path", table).load()
    assert(t.filter(col("source") === p32 + "z").count() == 1L)
    assert(t.filter(col("source") > "x" * 31 + "y").count() == 0L)
  }

  test("non-ASCII bounds and values never prune; all-0x7F max has no upper") {
    val s = spark
    import s.implicits._
    val table = tmp("nonascii")
    Seq((1L, "éclair"), (2L, "zebra"))
      .toDF("id", "source").coalesce(1)
      .write.format("graft-commitlog").option("path", table)
      .option("statsCol", "id").mode("append").save()
    val live = CommitLogIngest.liveFiles(s, table, 0L)
    def prune(bounds: Map[String, (Option[String], Option[String])]) =
      CommitLogPlanning.pruneByIndex(s, table, live, Map.empty, bounds)
    // stored max "éclair"... wait — Spark UTF8 max of (éclair, zebra):
    // 'z' = 0x7a < 0xc3 (é's first UTF-8 byte), so max = "éclair",
    // non-ASCII → the lo side must not prune even for a huge probe
    assert(prune(b(lo = "zzzz")) == live,
      "non-ASCII stored max must never prune")
    // non-ASCII PROBE value: orderings may disagree — never prune
    assert(prune(b(hi = "À")) == live,
      "non-ASCII probe value must never prune")
    // prefixUpper edge: an all-DEL prefix admits no safe upper bound
    assert(CommitLogPlanning.prefixUpper("").isEmpty)
    assert(CommitLogPlanning.prefixUpper("ab") == Some("ac"))
  }

  test("a startsWith probe prunes BOTH sides: files above the prefix " +
      "range never open") {
    val s = spark
    import s.implicits._
    val table = tmp("prefix")
    Seq("alpha", "beta", "gamma", "delta").zipWithIndex.foreach {
      case (band, w) =>
        (0L until 50L).map(i => (w * 100L + i, f"$band-$i%03d"))
          .toDF("id", "source").coalesce(1)
          .write.format("graft-commitlog").option("path", table)
          .option("statsCol", "id").mode("append").save()
    }
    graft.sources.CommitLogReadTracker.enable()
    val rows = spark.read.format("graft-commitlog").option("path", table)
      .load().filter(col("source").startsWith("beta"))
      .collect()
    val opened = graft.sources.CommitLogReadTracker.drain()
    assert(rows.length == 50)
    // without the prefixUpper hi bound, gamma/delta (wholly ABOVE the
    // prefix range) survived pruning and were opened
    assert(opened.size == 1,
      s"startsWith('beta') must open only the beta band, opened $opened")

    // an IN list prunes by its [min, max] envelope: both probe values in
    // one band -> one file opens; results exact
    graft.sources.CommitLogReadTracker.enable()
    val inRows = spark.read.format("graft-commitlog").option("path", table)
      .load()
      .filter(col("source").isin("beta-001", "beta-040"))
      .collect()
    val inOpened = graft.sources.CommitLogReadTracker.drain()
    assert(inRows.length == 2)
    assert(inOpened.size == 1,
      s"IN envelope within one band must open one file, opened $inOpened")
  }
}

package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.DedupIndex
import graft.streaming.CommitLogIngest

/** The incremental near-dup index (round-13 verdict, Next round #1): a
  * MinHash-signature side table maintained through the commit log from
  * the base table's change feed. Four properties the driver oracle
  * cannot see:
  *
  *  1. incremental maintenance ≡ full recompute through append + CoW
  *     delete + update, and the advance watermark is exactly-once (a
  *     replayed advance commits nothing);
  *  2. the advance is O(delta) IN FACT, not just in theory — with every
  *     historical corpus file physically moved aside, an advance over a
  *     fresh append still succeeds (it reads only the delta's files and
  *     the signature table) and still finds a cross-generation dup;
  *  3. an advance whose change rows are all no-ops against the index
  *     (deletes of never-indexed docs) still moves the watermark;
  *  4. `newPairsAt` (delta sigs probed against the index) equals the
  *     full pair set filtered to pairs touching the delta. */
class IncrementalDedupIndexSpec extends SparkSuite {

  private def tmp(): (String, String) = {
    val d = Files.createTempDirectory("graft-didx-spec")
    d.toFile.deleteOnExit()
    (d.toString + "/base", d.toString + "/index")
  }

  /** Letter-only deterministic word (digits would split `tokens`). */
  private def w(n: Int): String =
    "t" + n.toString.map(d => ('a' + (d - '0')).toChar)

  /** Six-word unique text for doc i (5 distinct 3-shingles). */
  private def txt(i: Int): String = (0 to 5).map(k => w(i * 10 + k)).mkString(" ")

  private def docs(ids: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toDF("doc_id", "text")
  }

  private def append(base: String, df: DataFrame): Unit =
    df.write.format("graft-commitlog").option("path", base)
      .option("statsCol", "doc_id").option("enableCdf", "true")
      .mode("append").save()

  /** Full-recompute pair set over the base's LIVE snapshot — the truth
    * the index must match: freshly-computed signatures (never the
    * index), through the SAME shared band join (`DedupIndex.pairsOf`);
    * the join logic itself is pinned independently by the DuckDB oracle
    * (`d_incr_index`), so sharing it here is reuse, not circularity. */
  private def fullPairs(base: String): Set[(Long, Long, Long)] =
    DedupIndex.pairsOf(DedupIndex.sigRows(
        CommitLogIngest.snapshot(spark, base).select("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def idxPairs(index: String): Set[(Long, Long, Long)] =
    DedupIndex.pairsFromIndex(spark, index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental == full recompute through append/delete/update; " +
      "replayed advance is a no-op (txn watermark)") {
    val (base, index) = tmp()
    // v0: 12 unique docs + one exact-dup pair (100, 101)
    append(base, docs((0L until 12L).map(i => i -> txt(i.toInt)) ++
      Seq(100L -> txt(900), 101L -> txt(900))))
    DedupIndex.init(spark, base, index, baseVersion = 0L)
    assert(DedupIndex.appliedVersion(spark, index) == 0L)
    // v1: append a dup of doc 3 and two unique docs
    append(base, docs(Seq(200L -> txt(3), 201L -> txt(800), 202L -> txt(801))))
    // v2: CoW delete one side of the (100, 101) dup pair
    val (delV, _) = CommitLogIngest.deleteWhere(spark, base,
      col("doc_id") === 101L, statsCol = Some("doc_id"))
    assert(delV == 2L)
    // v3: update doc 201 to become an exact dup of doc 5
    val (updV, _) = CommitLogIngest.updateWhere(spark, base,
      col("doc_id") === 201L, Map("text" -> lit(txt(5))),
      statsCol = Some("doc_id"))
    assert(updV == 3L)
    assert(DedupIndex.advance(spark, base, index) == 3L)
    assert(DedupIndex.appliedVersion(spark, index) == 3L)
    val got = idxPairs(index)
    assert(got == fullPairs(base),
      s"incremental pairs diverge from full recompute: $got")
    // the planted facts: (3,200) and (5,201) are dup pairs, 101 is gone
    assert(got.exists(p => p._1 == 3L && p._2 == 200L && p._3 == 4L))
    assert(got.exists(p => p._1 == 5L && p._2 == 201L && p._3 == 4L))
    assert(!got.exists(p => p._1 == 101L || p._2 == 101L))
    // replay: advance again — watermark current, NOTHING committed
    val vBefore = CommitLogIngest.latestVersion(index)
    assert(DedupIndex.advance(spark, base, index) == 3L)
    assert(CommitLogIngest.latestVersion(index) == vBefore,
      "a replayed advance must not commit")
  }

  test("the advance is O(delta): with every historical corpus file " +
      "moved aside, a fresh append still advances and finds its dups") {
    val (base, index) = tmp()
    append(base, docs((0L until 10L).map(i => i -> txt(i.toInt))))
    DedupIndex.init(spark, base, index, baseVersion = 0L)
    // physically remove the historical corpus: any read of it now fails
    val stash = Files.createTempDirectory("graft-didx-stash")
    val live = CommitLogIngest.liveFiles(spark, base,
      CommitLogIngest.latestVersion(base))
    live.zipWithIndex.foreach { case (f, i) =>
      Files.move(Paths.get(f), stash.resolve(s"f$i"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    // v1: new batch containing a dup of HISTORICAL doc 7
    append(base, docs(Seq(300L -> txt(7), 301L -> txt(777))))
    assert(DedupIndex.advance(spark, base, index) == 1L,
      "advance must read only the delta files + the signature table")
    val got = idxPairs(index)
    assert(got.contains((7L, 300L, 4L)),
      s"cross-generation dup not found from the index alone: $got")
    // restore for hygiene (tmp dirs are deleteOnExit anyway)
    live.zipWithIndex.foreach { case (f, i) =>
      Files.move(stash.resolve(s"f$i"), Paths.get(f),
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  test("an advance that is a no-op against the index still moves the " +
      "watermark (delete of never-indexed docs)") {
    val (base, index) = tmp()
    // docs 50/51 have 2 tokens → no 3-shingles → never indexed
    append(base, docs((0L until 4L).map(i => i -> txt(i.toInt)) ++
      Seq(50L -> "aa bb", 51L -> "cc dd")))
    DedupIndex.init(spark, base, index, baseVersion = 0L)
    val (delV, _) = CommitLogIngest.deleteWhere(spark, base,
      col("doc_id") >= 50L, statsCol = Some("doc_id"))
    assert(delV == 1L)
    assert(DedupIndex.advance(spark, base, index) == 1L)
    assert(DedupIndex.appliedVersion(spark, index) == 1L,
      "watermark must advance even when the merge had nothing to do")
    assert(idxPairs(index) == fullPairs(base))
  }

  test("two BARRIER-ALIGNED concurrent advances over the same range are " +
      "net-exactly-once: the index equals full recompute either way") {
    val (base, index) = tmp()
    append(base, docs((0L until 8L).map(i => i -> txt(i.toInt))))
    DedupIndex.init(spark, base, index, baseVersion = 0L)
    // one range carrying an insert, a delete and an update
    append(base, docs(Seq(600L -> txt(1), 601L -> txt(660))))
    CommitLogIngest.deleteWhere(spark, base, col("doc_id") === 6L,
      statsCol = Some("doc_id"))
    CommitLogIngest.updateWhere(spark, base, col("doc_id") === 2L,
      Map("text" -> lit(txt(7))), statsCol = Some("doc_id"))
    val s = spark
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Long]]()
    val ts = (0 until 2).map(_ => new Thread(() => {
      barrier.await()
      out.add(try Right(DedupIndex.advance(s, base, index))
        catch { case t: Throwable => Left(t) })
    }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    // both racers either applied the range or observed it applied; a
    // double-applied merge is idempotent by clause construction (same
    // sigs re-SET, tombstones of absent docs ignored) — the INDEX, not
    // the racers' return values, is the contract
    import scala.jdk.CollectionConverters._
    out.iterator().asScala.foreach(r =>
      assert(r.isRight, s"racing advance died: $r"))
    assert(DedupIndex.appliedVersion(spark, index) == 3L)
    assert(idxPairs(index) == fullPairs(base),
      "racing advances corrupted the index")
    // planted: (1,600) pair present; (2,7) pair from the update; doc 6 gone
    val got = idxPairs(index)
    assert(got.contains((1L, 600L, 4L)) && got.contains((2L, 7L, 4L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("newPairsAt == full pairs filtered to the delta's docs") {
    val (base, index) = tmp()
    append(base, docs((0L until 10L).map(i => i -> txt(i.toInt)) ++
      Seq(400L -> txt(2)))) // (2, 400) dup inside history
    DedupIndex.init(spark, base, index, baseVersion = 0L)
    // delta: dup of doc 4 TWICE (500, 503 — a delta-delta pair, whose
    // bands arrive symmetrically from the probe join and must count
    // distinct, not double), dup of doc 2's text, one unique
    append(base, docs(Seq(500L -> txt(4), 501L -> txt(2),
      502L -> txt(555), 503L -> txt(4))))
    assert(DedupIndex.advance(spark, base, index) == 1L)
    val deltaIds = Set(500L, 501L, 502L, 503L)
    val expected = idxPairs(index).filter(p =>
      deltaIds.contains(p._1) || deltaIds.contains(p._2))
    val got = DedupIndex.newPairsAt(spark, base, index, version = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"newPairsAt mismatch: got $got want $expected")
    // the historical pair (2,400) is NOT new; (2,501) and (400,501) are
    assert(!got.contains((2L, 400L, 4L)))
    assert(got.contains((2L, 501L, 4L)) && got.contains((400L, 501L, 4L)))
    // delta-delta pair counts each band ONCE despite the symmetric join
    assert(got.contains((500L, 503L, 4L)),
      s"delta-delta pair must have n_bands=4 (distinct), got: $got")
  }
}

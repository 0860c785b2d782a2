package graft

import org.apache.spark.sql.functions._

import graft.streaming.CommitLogIngest

/** OPTIMIZE ... CLUSTER BY CELL — the ANN serving index through the log
  * (round-12 verdict task 6). Pinned:
  *
  *  - the rewrite is LAYOUT ONLY: census identical before/after, one
  *    atomic version, pinned readers keep the pre-rewrite snapshot,
  *    changeFeed contributes nothing;
  *  - a probe opens ONLY the probed cells' files (plus the unclustered
  *    remainder) and still answers exactly;
  *  - appends land unclustered, probes stay exact through them, the next
  *    OPTIMIZE folds them in, a re-run is a no-op;
  *  - the quantizer trains once — cell ids are stable across re-clusters
  *    — and a different spec on the same table refuses. */
class ClusterCommitSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-cc-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def seed(table: String): Unit = {
    val s = spark
    import s.implicits._
    // 4 tight clusters around distinct anchors -> k-means separates them
    val rows = (0L until 400L).map { i =>
      val c = (i % 4).toInt
      val base = Array(c * 10.0f, c * -7.0f, 3.0f + c, 0.5f * c)
      (i, base.map(x => x + (i % 5) * 0.01f).toSeq, c)
    }
    Seq(0, 1).foreach { g =>
      CommitLogIngest.commitAppend(
        rows.filter(_._1 % 2 == g).toDF("vec_id", "embedding", "label"),
        table, statsCol = Some("vec_id"))
    }
  }

  private def census(table: String): Seq[String] =
    CommitLogIngest.snapshot(spark, table)
      .select("vec_id", "label").collect().map(_.toString).sorted.toSeq

  test("cluster rewrite: census unchanged, one version, probe opens only " +
      "probed cells + remainder, re-run no-op, append folds in") {
    val s = spark
    import s.implicits._
    val table = tmp("basic")
    seed(table)
    val before = census(table)
    val (v, removed, added) = CommitLogIngest.optimizeClusterByCell(
      s, table, "embedding", 4, "vec_id", statsCol = Some("vec_id"))
    assert(v == 2L && removed > 0 && added > 0)
    assert(census(table) == before, "cluster rewrite changed the data")
    // pinned pre-rewrite snapshot intact; layout-only for the change feed
    assert(CommitLogIngest.snapshot(s, table, 1L).count() == 400L)
    assert(CommitLogIngest.changeFeed(s, table, v - 1, v).count() == 0L,
      "a layout-only cluster commit must contribute no change rows")
    // every live file is clustered, and cells partition the live set
    val live = CommitLogIngest.liveFiles(s, table, v)
    assert(live.forall(f => CommitLogIngest.cellOfFile(f).isDefined))
    val cells = live.flatMap(CommitLogIngest.cellOfFile).distinct
    assert(cells.size > 1, s"expected multiple cells, got $cells")
    // a probe for one anchor opens a strict subset of the files and
    // still covers the whole anchor cluster (nprobe=2 rides out a
    // k-means split of the anchor across two cells — the IVF recall
    // story, not a luck-of-the-init story)
    val q = Array(30.0, -21.0, 6.0, 1.5) // anchor of label 3
    val (probeSet, _) = CommitLogIngest.probeFiles(s, table,
      graft.sources.CellMath.probeCells(
        CommitLogIngest.centroidsOf(table).get, q, 2))
    assert(probeSet.size < live.size,
      "the probe must open a strict subset of the live set")
    val hits = CommitLogIngest.probeRead(s, table, q, 2)
    assert(hits.filter(col("label") === 3).count() == 100L,
      "the probed cells must hold the whole anchor-3 cluster")
    // probing every cell is the full table — the exactness backstop
    assert(CommitLogIngest.probeRead(s, table, q, 4).count() == 400L)
    // re-run: no-op
    assert(CommitLogIngest.optimizeClusterByCell(s, table, "embedding", 4,
      "vec_id", statsCol = Some("vec_id")) == ((-1L, 0, 0)))
    // append lands UNclustered; probes still see its rows (remainder)
    CommitLogIngest.commitAppend(
      Seq((9999L, Seq(30.0f, -21.0f, 6.0f, 1.5f), 3))
        .toDF("vec_id", "embedding", "label"),
      table, statsCol = Some("vec_id"))
    val hits2 = CommitLogIngest.probeRead(s, table, q, 2)
    assert(hits2.filter(col("vec_id") === 9999L).count() == 1L,
      "the unclustered remainder must always be probed")
    // the next OPTIMIZE folds the remainder in with STABLE cell ids
    val centsBefore = CommitLogIngest.centroidsOf(table).get
    val (v2, _, _) = CommitLogIngest.optimizeClusterByCell(s, table,
      "embedding", 4, "vec_id", statsCol = Some("vec_id"))
    assert(v2 > v)
    assert(CommitLogIngest.centroidsOf(table).get.map(_.toSeq).toSeq ==
      centsBefore.map(_.toSeq).toSeq,
      "re-clustering must reuse the trained quantizer")
    val live2 = CommitLogIngest.liveFiles(s, table, v2)
    assert(live2.forall(f => CommitLogIngest.cellOfFile(f).isDefined),
      "the fold must leave no unclustered file")
    assert(CommitLogIngest.snapshot(s, table).count() == 401L)
    // a different spec refuses (cell ids must stay stable)
    intercept[IllegalArgumentException] {
      CommitLogIngest.optimizeClusterByCell(s, table, "embedding", 8,
        "vec_id", statsCol = Some("vec_id"))
    }
  }

  test("SQL OPTIMIZE CLUSTER BY CELL matches the API; DML after " +
      "clustering degrades its files to remainder, never loses rows") {
    val s = spark
    import s.implicits._
    val table = tmp("sql")
    seed(table)
    val r = s.sql(
      s"OPTIMIZE '$table' CLUSTER BY CELL (embedding, 4, vec_id)")
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getInt(2) > 0)
    // DV-less CoW delete rewrites some clustered files; the rewritten
    // files lose their gcell segment and probes read them as remainder
    CommitLogIngest.deleteWhere(s, table, col("vec_id") === 0L,
      statsCol = Some("vec_id"))
    val q = Array(0.0, 0.0, 3.0, 0.0) // anchor of label 0
    val hits = CommitLogIngest.probeRead(s, table, q, 2)
    assert(hits.filter(col("label") === 0).count() == 99L,
      "post-DML probes must still see every surviving anchor-0 row")
    assert(CommitLogIngest.snapshot(s, table).count() == 399L)
  }

  test("ANN under DV DML (round-13 task 6): a probe never returns a " +
      "masked vector; the next OPTIMIZE materializes the masks and " +
      "re-clusters the survivors into stable cells") {
    val s = spark
    val table = tmp("dv")
    seed(table)
    val (v, _, nAdd) = CommitLogIngest.optimizeClusterByCell(s, table,
      "embedding", 4, "vec_id", statsCol = Some("vec_id"))
    assert(v == 2L && nAdd > 0)
    // merge-on-read delete of half the label-0 anchors: pure metadata,
    // no clustered file moves — the mask alone hides the dead vectors
    CommitLogIngest.setDvEnabled(table)
    val before = CommitLogIngest.liveFiles(s, table, 2L).toSet
    val (dv, nMask) = CommitLogIngest.deleteWhere(s, table,
      col("label") === 0 && col("vec_id") % 8 === 0,
      statsCol = Some("vec_id"))
    assert(dv == 3L && nMask > 0)
    assert(CommitLogIngest.liveFiles(s, table, 3L).toSet == before,
      "a dv delete must not move clustered files")
    // label-0 ids are ≡ 0 (mod 4); the masked half is ≡ 0 (mod 8)
    val q = Array(0.0, 0.0, 3.0, 0.0)
    def probe0(): Set[Long] = CommitLogIngest.probeRead(s, table, q, 2)
      .filter(col("label") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val got = probe0()
    assert(got.size == 50 &&
        got.forall(id => id % 4 == 0 && id % 8 != 0),
      s"the probe returned a masked vector: ${got.filter(_ % 8 == 0)}")
    // re-cluster: same spec, stable quantizer — the rewrite reads under
    // the mask, so the masks materialize and every survivor lands in a
    // gcell dir (no unclustered remainder, no live dv)
    val (v2, _, nAdd2) = CommitLogIngest.optimizeClusterByCell(s, table,
      "embedding", 4, "vec_id", statsCol = Some("vec_id"))
    assert(v2 == 4L && nAdd2 > 0)
    val (live2, dvs2) = CommitLogIngest.liveState(s, table, v2)
    assert(dvs2.isEmpty, "re-cluster must materialize the masks")
    assert(live2.forall(f =>
        graft.sources.PartitionPaths.valueOf(f, "gcell").isDefined),
      "re-cluster left an unclustered remainder")
    assert(probe0() == got,
      "probe answers changed across the mask-materializing re-cluster")
    assert(CommitLogIngest.snapshot(s, table).count() == 350L)
  }
}

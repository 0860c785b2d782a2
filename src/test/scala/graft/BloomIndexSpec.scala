package graft

import org.apache.spark.sql.functions._

import graft.sources.CommitLogReadTracker
import graft.streaming.CommitLogIngest

/** BLOOM-FILTER data skipping through the commit-time stats index
  * (E-177, the Delta bloom-index shape): a point probe on a
  * high-cardinality column whose values INTERLEAVE across files is the
  * one shape min/max bounds cannot prune — every file's [min,max] covers
  * every key. The per-file Bloom sketch written with the index row
  * proves non-membership and cuts the scan to the true containing
  * file(s); no false negatives means the prune is sound at any sizing,
  * and a NULL/absent sketch (legacy index rows) keeps its file.
  *
  * The corpus is built so the premise is itself asserted: keys
  * `10*i + (i mod 3)`, commit j taking `i mod 3 == j` — three files
  * whose key RANGES almost coincide while their key SETS are disjoint. */
class BloomIndexSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-bloom-$prefix")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  /** Key for index i: strictly increasing, residue-tagged so each commit
    * owns a disjoint key set while the three ranges interleave. */
  private def key(i: Int): Long = 10L * i + (i % 3)

  private def seed(table: String): Unit = {
    val s = spark
    import s.implicits._
    (0 until 3).foreach { j =>
      (0 until 300).filter(_ % 3 == j)
        .map(i => (key(i), s"v${key(i)}"))
        .toDF("k", "payload").coalesce(1)
        .write.format("graft-commitlog").option("path", table)
        .option("statsCol", "k").mode("append").save()
    }
  }

  private def v2(table: String) =
    spark.read.format("graft-commitlog").option("path", table).load()

  private def opened[T](body: => T): (T, Seq[String]) = {
    CommitLogReadTracker.enable()
    val r = body
    (r, CommitLogReadTracker.drain())
  }

  test("point probe opens ONLY the containing file where min/max keeps " +
      "everything; an absent-but-in-range key opens NOTHING") {
    val table = tmp("point")
    seed(table)
    // the premise, asserted: every live file's [min_key, max_key] covers
    // the probe keys — min/max pruning alone would open ALL of them
    val idx = spark.read.option("mergeSchema", "true")
      .parquet(s"$table/index")
      .select("path", "min_key", "max_key").collect()
    assert(idx.length == 3)
    val probe = key(151) // residue 1 -> lives only in commit 1's file
    idx.foreach { r =>
      assert(r.getLong(1) <= probe && probe <= r.getLong(2),
        s"interleave premise broken: ${r.getString(0)} " +
          s"[${r.getLong(1)}, ${r.getLong(2)}] does not cover $probe")
    }
    val (rows, files) = opened(
      v2(table).filter(col("k") === probe).collect())
    assert(rows.map(_.getString(1)).toSeq == Seq(s"v$probe"))
    assert(files.size == 1,
      s"bloom must cut 3 range-overlapping files to 1, opened $files")

    // in-range key of no residue class: every sketch proves absence —
    // zero partitions planned, zero files opened, empty result
    val (absent, none) = opened(
      v2(table).filter(col("k") === 15L).collect())
    assert(absent.isEmpty)
    assert(none.isEmpty,
      s"absent key must prune every file via bloom, opened $none")
  }

  test("IN-list probe opens the union of containing files; keys from two " +
      "commits open two of three") {
    val table = tmp("in")
    seed(table)
    val ks = Seq(key(30), key(121)) // residues 0 and 1
    val (rows, files) = opened(
      v2(table).filter(col("k").isin(ks: _*)).collect())
    assert(rows.map(_.getLong(0)).toSeq.sorted == ks.sorted)
    assert(files.size == 2,
      s"IN over two residue classes must open exactly their files: $files")
  }

  test("legacy index rows without the sketch column stay conservative: " +
      "the file is kept and results are exact") {
    val table = tmp("legacy")
    seed(table)
    // strip the bloom column from version 0's index rows — exactly what
    // an index written before the sketch existed looks like
    val v0 = s"$table/index/version=0"
    val stripped = spark.read.parquet(v0).drop("bloom")
    val tmpDir = v0 + ".rewrite"
    stripped.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    sources.LayoutDirs.deleteQuiet(v0)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmpDir),
      java.nio.file.Paths.get(v0))
    // probe a key living in commit 1: commit 0's file has no sketch ->
    // kept; commits 1 (container) kept, 2 pruned -> 2 files open
    val probe = key(151)
    val (rows, files) = opened(
      v2(table).filter(col("k") === probe).collect())
    assert(rows.map(_.getString(1)).toSeq == Seq(s"v$probe"))
    assert(files.size == 2,
      s"sketchless file must be KEPT (no false pruning), sketched " +
        s"non-container pruned: $files")
  }

  test("pointRead routes through the sketch: one file for a present key, " +
      "an empty plan for an absent one; values exact") {
    val table = tmp("pread")
    seed(table)
    val probe = key(212) // residue 2
    // pointRead reads the pruned path list through the plain parquet
    // reader (not the V2 connector), so the file census is the plan's
    // inputFiles, not the tracker
    val df = CommitLogIngest.pointRead(spark, table, "k", probe)
    assert(df.collect().map(_.getString(1)).toSeq == Seq(s"v$probe"))
    assert(df.inputFiles.length == 1,
      s"pointRead must plan 1 file, planned ${df.inputFiles.toSeq}")
    // absent key: the sketch empties the candidate list; the contract
    // empty-result branch plans one schema-supplying file folded to an
    // empty relation by the false filter — zero rows either way
    val absent = CommitLogIngest.pointRead(spark, table, "k", 15L)
    assert(absent.collect().isEmpty)
    assert(absent.inputFiles.length <= 1,
      s"absent pointRead must not plan the live set: " +
        s"${absent.inputFiles.toSeq}")
  }

  test("DML rewrite refreshes the sketch: a CoW update's new file answers " +
      "point probes for its keys; stale path's sketch row is dead weight, " +
      "never consulted") {
    val table = tmp("dml")
    seed(table)
    val victim = key(60) // residue 0
    val (v, _) = CommitLogIngest.updateWhere(spark, table,
      col("k") === victim, Map("payload" -> lit("updated")),
      statsCol = Some("k"))
    assert(v == 3L)
    // the updated key: its row now lives in the rewrite file
    val (upd, updFiles) = opened(
      v2(table).filter(col("k") === victim).collect())
    assert(upd.map(_.getString(1)).toSeq == Seq("updated"))
    assert(updFiles.size == 1,
      s"post-update probe must open only the rewrite file: $updFiles")
    // an untouched residue-0 key also moved into the rewrite file (CoW
    // rewrites the whole victim file); probe stays single-file and exact
    val carried = key(30)
    val (car, carFiles) = opened(
      v2(table).filter(col("k") === carried).collect())
    assert(car.map(_.getString(1)).toSeq == Seq(s"v$carried"))
    assert(carFiles.size == 1,
      s"carried key must resolve to the rewrite file alone: $carFiles")
    // absent key still opens nothing after the rewrite
    val (absent, none) = opened(
      v2(table).filter(col("k") === 15L).collect())
    assert(absent.isEmpty && none.isEmpty,
      s"absent key must stay zero-file after DML: $none")
  }

  test("a V2 streaming read prunes batches by sketch via the explicit " +
      "index.eq option (the streaming route, like index.lo/hi)") {
    val table = tmp("stream")
    seed(table)
    val probe = key(151)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-bloom-ck").toString
    CommitLogReadTracker.enable()
    // the engine does not push data filters into micro-batch scans, so
    // the sketch consult rides the option; the row filter stays for
    // exactness
    val q = spark.readStream.format("graft-commitlog")
      .option("path", table)
      .option("index.eq", probe.toString).load()
      .filter(col("k") === probe)
      .writeStream.format("memory").queryName("bloom_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val files = CommitLogReadTracker.drain()
    val got = spark.table("bloom_stream").collect()
    assert(got.map(_.getString(1)).toSeq == Seq(s"v$probe"))
    assert(files.size == 1,
      s"streaming catch-up must sketch-prune the other commits: $files")
  }
}

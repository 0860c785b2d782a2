package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.sources.Compaction

/** The compaction rewrite's contract: fragment count collapses to the
  * byte-derived target count, output files are row-balanced, the rewrite
  * reclaims (never inflates) bytes, content survives untouched, and the
  * fingerprint cache rebuilds when the source regenerates. Content
  * equality against the original table is the DuckDB oracle's job
  * (`src_compaction`); this spec pins the layout mechanics the oracle
  * cannot see. */
class CompactionSpec extends SparkSuite {

  test("fragmented table collapses to the byte-derived file count") {
    val s = spark
    val (frag, comp) = Compaction.ensure(s, sf0001)
    val nFrag = Compaction.parquetFileCount(frag)
    val nComp = Compaction.parquetFileCount(comp)
    assert(nFrag == Compaction.FragmentCount,
      s"fragmented layout has $nFrag files, expected ${Compaction.FragmentCount}")
    val expected = Compaction.targetFileCount(Compaction.parquetBytes(frag))
    assert(nComp == expected,
      s"compacted layout has $nComp files, expected $expected")
    assert(nComp < nFrag / 4,
      s"compaction barely compacted: $nFrag -> $nComp files")
  }

  test("compacted files are row-balanced and bytes are reclaimed") {
    val s = spark
    val (frag, comp) = Compaction.ensure(s, sf0001)
    val rowsPerFile = s.read.parquet(comp)
      .groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    if (rowsPerFile.length > 1) {
      assert(rowsPerFile.max <= 2 * rowsPerFile.min,
        s"round-robin rewrite produced imbalanced files: " +
          s"${rowsPerFile.sorted.mkString(",")} rows")
    }
    // tiny-file footer overhead is reclaimed, never inflated
    assert(Compaction.parquetBytes(comp) <= Compaction.parquetBytes(frag),
      "compacted layout is larger than the fragmented input")
    // membership: compaction is a pure layout move
    val nRows = s.read.parquet(comp).count()
    val nOrig = graft.model.Tables.events(s, sf0001).count()
    assert(nRows == nOrig, s"compaction changed row count: $nOrig -> $nRows")
  }

  test("regenerated events rebuild the compacted layout (fingerprint staleness)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-stale")
    dir.toFile.deleteOnExit()
    val d = dir.toString

    def write(n: Int): Unit =
      (0 until n).map { i =>
        (i.toLong, new Timestamp(1704067200000L + i.toLong * 1000L),
          (i % 5).toLong, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$d/events.parquet")

    write(200)
    val (_, comp1) = Compaction.ensure(s, d)
    assert(s.read.parquet(comp1).count() == 200)

    // regenerate under the SAME path: a stale cache would keep serving
    // the 200-row compaction of the old bytes
    write(300)
    val (_, comp2) = Compaction.ensure(s, d)
    assert(s.read.parquet(comp2).count() == 300,
      "stale compacted layout served after source regeneration")
  }
}

package graft.sources

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables

/** Small-file compaction: the storage rewrite every streaming ingest needs
  * at scale. The reference flushes its buffer every `resendint` seconds
  * (main.go flush loop), so a day of ingest is thousands of tiny batch
  * files; our own `DropSpool` edge rolls a drop file per POST burst. At
  * 100 TB a table made of millions of KB-sized files is unqueryable —
  * every scan pays per-file open/footer costs and the driver pays a
  * file-listing that dwarfs the query. Compaction rewrites a fragmented
  * table into few, balanced, target-sized files with identical content.
  *
  * Mechanics (the Delta/Iceberg OPTIMIZE shape, expressed in plain Spark):
  * measure the fragmented table's on-disk bytes, derive the output file
  * count from a target file size (`TargetFileBytes` models the 128 MiB-at-
  * scale dial, set small so the test-scale corpus exercises multi-file
  * output), and rewrite via round-robin `repartition(n)` so output files
  * are row-balanced regardless of input skew. Content is untouched — no
  * resort, no re-encode of values — so the rewrite is a pure layout move
  * that can run concurrently with readers of the old files.
  *
  * `src_compaction` is the correctness face: a per-event-type census read
  * THROUGH the compacted layout, hash-matched against a DuckDB oracle over
  * the ORIGINAL events parquet — proving the fragmented→compacted
  * round-trip preserved membership and content. `CompactionSpec` pins the
  * mechanics: fragment count collapses to the derived target count, output
  * files are balanced, reclaimed bytes never exceed the input, and the
  * fingerprint cache rebuilds on source regeneration.
  */
object Compaction {

  /** How many files the simulated ingest fragments events into — the
    * "thousands of drop files" stand-in, sized so even sf0.001 (1k rows)
    * produces genuinely tiny files dominated by parquet footer overhead. */
  val FragmentCount = 48

  /** Target compacted file size bounds. The effective target for a table
    * of B bytes is `clamp(B/6, MinTargetBytes, MaxTargetBytes)`: at scale
    * the 128 MiB cap is the whole dial (the Delta/Iceberg OPTIMIZE
    * shape); below ~768 KiB the B/6 term keeps the output multi-file — a
    * read-parallelism floor that also keeps the balance assertions
    * non-vacuous at the sf0.001/0.01 gates. Without the floor, "compact
    * everything into one file" would be the degenerate answer for every
    * test corpus; without the cap, a fixed small target would FRAGMENT a
    * large table (more output files than input — anti-compaction). */
  val MinTargetBytes = 64L * 1024L
  val MaxTargetBytes = 128L * 1024L * 1024L

  // sfDir -> (events source fingerprint, (fragmentedDir, compactedDir)).
  // Fingerprint in the VALUE so a driver regeneration under the same sfDir
  // evicts the stale layout and rewrites (BucketedTables discipline).
  private val created = TrieMap.empty[String, (String, (String, String))]

  private def deleteQuiet(dir: String): Unit =
    LayoutDirs.deleteQuiet(dir)

  /** Sum of parquet data-file bytes directly under `dir`. */
  private[graft] def parquetBytes(dir: String): Long =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum

  private[graft] def parquetFileCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Output file count for a fragmented dir of `bytes` on-disk bytes:
    * one file per effective target, floored at 1. The measured bytes
    * include per-fragment footer overhead the rewrite reclaims, so the
    * compacted files land at-or-under target — the safe side of the dial
    * (oversized files are the failure mode that re-fragments downstream). */
  private[graft] def targetFileCount(bytes: Long): Int = {
    val target = math.min(MaxTargetBytes, math.max(MinTargetBytes, bytes / 6))
    math.max(1L, (bytes + target - 1) / target).toInt
  }

  private[graft] def ensure(spark: SparkSession, sfDir: String): (String, String) =
    created.synchronized {
      val fp = SourceFingerprint.key(sfDir, "events.parquet")
      created.get(sfDir) match {
        case Some((`fp`, dirs)) => dirs
        case stale =>
          stale.foreach { case (_, (frag, comp)) =>
            deleteQuiet(frag); deleteQuiet(comp)
            created.remove(sfDir)
          }
          val root = Files.createTempDirectory("graft-compaction")
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            deleteQuiet(root.toString)
          }))
          val frag = root.toString + "/events_fragmented"
          val comp = root.toString + "/events_compacted"
          // Simulated ingest: round-robin fragmentation (each drop file a
          // slice of the stream, no clustering — the worst realistic case).
          Tables.events(spark, sfDir)
            .repartition(FragmentCount)
            .write.mode("overwrite").parquet(frag)
          val n = targetFileCount(parquetBytes(frag))
          // The rewrite reads the FRAGMENTED files (compaction operates on
          // the table as ingested, not on a fresh export of the source).
          spark.read.parquet(frag)
            .repartition(n)
            .write.mode("overwrite").parquet(comp)
          created.put(sfDir, (fp, (frag, comp)))
          (frag, comp)
      }
    }

  /** Drop every cached layout (and its temp dirs) so the next `ensure`
    * re-pays the fragment + rewrite — the ScaleCheck measurement hook. */
  private[graft] def clearCache(): Unit =
    created.synchronized {
      created.foreach { case (k, (_, (frag, comp))) =>
        deleteQuiet(frag); deleteQuiet(comp); created.remove(k)
      }
    }

  /** Per-event-type census through the compacted layout: proves the
    * fragmented→compacted rewrite preserved membership and content
    * against a DuckDB oracle reading the ORIGINAL events parquet. */
  def compactedCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, comp) = ensure(spark, sfDir)
    spark.read.parquet(comp)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val compactedCensusSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  def queries: Map[String, Q] = Map(
    "src_compaction" -> Q(compactedCensusSql)(compactedCensus))
}

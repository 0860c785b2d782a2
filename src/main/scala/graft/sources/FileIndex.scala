package graft.sources

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables

/** Explicit per-file min/max index — the METADATA-TABLE file-skipping
  * primitive (the Iceberg manifest / Delta add-file-stats shape). Spark's
  * parquet reader already does row-group skipping from footer stats, but
  * at 100 TB on an object store the footers themselves are the cost: a
  * point lookup over ~800k files pays ~800k GET round-trips just to
  * discover that almost none of them matter. The lakehouse answer is an
  * INDEX TABLE — one row per data file carrying its per-column min/max —
  * consulted BEFORE any data file is opened, so the planner-side prune
  * costs one small-table read instead of a footer sweep.
  *
  * Demonstrated on a user-sorted events layout: events are range-
  * partitioned + sorted by `user_id` into a byte-derived file count
  * (floor 16 so the skipping property is exercised at test SFs), and the
  * index table (file, min_user, max_user, rows) is derived from ONE
  * column-pruned scan grouped by `input_file_name()`, persisted beside
  * the layout. A point lookup consults the index, selects the
  * overlapping files (1-2 of 16 for range-sorted data — driver-side, a
  * bounded handful of paths, exactly what a metastore hands a planner),
  * and reads ONLY those. `src_file_index` is the correctness face: the
  * census of one user's events read through the index, hash-matched
  * against DuckDB computing the same census from the ORIGINAL parquet.
  * `FileIndexSpec` pins what the oracle cannot see: the index agrees
  * with a full recompute of every file's true min/max, the point read
  * touches ≤ 2 of the files, and the layout cache is
  * fingerprint-validated. Build is once per session per source
  * fingerprint with stale eviction (the EventsLayout cache discipline).
  */
object FileIndex {

  /** Byte-derived data-file count (TargetFileBytes per file at scale,
    * floor so the skip property is real at test SFs — the ZOrderLayout
    * sizing discipline). */
  val MinFiles = 16
  val TargetFileBytes = 128L * 1024L * 1024L

  // sfDir -> (events fingerprint, (dataDir, indexDir))
  private val created = TrieMap.empty[String, (String, (String, String))]

  private def eventsFp(sfDir: String): String =
    SourceFingerprint.key(sfDir, "events.parquet")

  private def sourceBytes(sfDir: String): Long =
    try {
      val s = Files.walk(java.nio.file.Paths.get(sfDir, "events.parquet"))
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    } catch { case _: Exception => 0L }

  private[graft] def ensure(spark: SparkSession, sfDir: String)
      : (String, String) =
    created.synchronized {
      val fp = eventsFp(sfDir)
      created.get(sfDir) match {
        case Some((`fp`, dirs)) => dirs
        case stale =>
          stale.foreach { case (_, (d, i)) =>
            LayoutDirs.deleteQuiet(d); LayoutDirs.deleteQuiet(i)
            created.remove(sfDir)
          }
          val root = Files.createTempDirectory("graft-file-index")
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            LayoutDirs.deleteQuiet(root.toString)
          }))
          val dataDir = root.toString + "/events_by_user"
          val indexDir = root.toString + "/file_index"
          val nFiles = math.max(MinFiles,
            (sourceBytes(sfDir) / TargetFileBytes).toInt)
          Tables.events(spark, sfDir)
            .repartitionByRange(nFiles, col("user_id"))
            .sortWithinPartitions(col("user_id"))
            .write.mode("overwrite").parquet(dataDir)
          // the index: ONE column-pruned scan of the fresh layout. At
          // 100 TB this is the write path's job (stats captured as files
          // are written); deriving it post-hoc keeps the demo honest
          // about what the index CONTAINS without a custom writer.
          spark.read.parquet(dataDir)
            .groupBy(input_file_name().as("file"))
            .agg(min(col("user_id")).as("min_user"),
              max(col("user_id")).as("max_user"),
              count(lit(1)).as("rows"))
            .coalesce(1)
            .write.mode("overwrite").parquet(indexDir)
          created.put(sfDir, (fp, (dataDir, indexDir)))
          (dataDir, indexDir)
      }
    }

  /** The data files whose [min_user, max_user] range covers `u` —
    * driver-side by design: this bounded path list is exactly what a
    * metastore hands the planner, and it is what lets the read below
    * open 1-2 files instead of all of them. */
  private[graft] def filesForUser(
      spark: SparkSession, indexDir: String, u: Long): Seq[String] =
    spark.read.parquet(indexDir)
      .filter(col("min_user") <= u && col("max_user") >= u)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Census of one user's events, read through the index: only the
    * index-selected files are opened. The probe user is the corpus MIN
    * (the stand-in for the point-lookup literal a real query carries). */
  def pointLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, indexDir) = ensure(spark, sfDir)
    val u0 = Tables.events(spark, sfDir)
      .agg(min(col("user_id"))).head().getLong(0)
    val files = filesForUser(spark, indexDir, u0)
    spark.read.parquet(files: _*)
      .filter(col("user_id") === u0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(expr(s"ts div ${EventsLayout.NanosPerDay}"))
          .as("n_days"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val pointLookupSql: String =
    """WITH m AS (SELECT MIN(user_id) AS u FROM events)
      |SELECT e.user_id, COUNT(*) AS n_events,
      |  CAST(COUNT(DISTINCT epoch_ms(e.ts) // 86400000) AS BIGINT)
      |    AS n_days,
      |  ROUND(SUM(e.value), 4) AS sum_value
      |FROM events e, m WHERE e.user_id = m.u
      |GROUP BY e.user_id""".stripMargin

  /** Test hook: drop cached layouts (the shared clear contract). */
  private[graft] def clearCache(): Unit = created.synchronized {
    created.values.foreach { case (_, (d, i)) =>
      LayoutDirs.deleteQuiet(d); LayoutDirs.deleteQuiet(i)
    }
    created.clear()
  }

  def queries: Map[String, Q] = Map(
    "src_file_index" -> Q(pointLookupSql)(pointLookup))
}

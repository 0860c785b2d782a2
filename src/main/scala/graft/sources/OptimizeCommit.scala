package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables
import graft.streaming.CommitLogIngest

/** OPTIMIZE as a commit-log citizen — the round-9 `src_compaction` rewrote
  * a STANDALONE layout; a real lakehouse compacts THROUGH the log: one
  * commit records add(compacted) + remove(smalls) atomically with no
  * logical change, so it composes with everything the log already gives —
  * pinned readers keep their pre-compaction snapshot, time travel still
  * reaches it, vacuum reclaims the small files only after retention, and
  * the commit-time stats index follows the rewrite in the same commit.
  *
  * The registry face builds a documents-backed commit-log table the way a
  * streaming ingest fragments one (six multi-writer `commitAppend` commits,
  * each split into several files), runs `CommitLogIngest.optimize` (range-
  * clustered on `doc_id`, the indexed column), and reads the census of the
  * LATEST snapshot through the log. The DuckDB oracle computes the same
  * census from the ORIGINAL documents parquet — equality proves the
  * rewrite was a pure layout move. `OptimizeCommitSpec` pins what the
  * oracle cannot see: the pre-compaction version stays readable and
  * identical, live file count actually drops, vacuum reclaims exactly the
  * replaced smalls, and point reads keep pruning through the refreshed
  * index.
  *
  * 100-TB shape: the rewrite reads only the files it replaces (never the
  * table), the commit is one atomic rename, and because `optimize` skips
  * files already at target size, repeated runs touch only the new small
  * tail — the incremental-maintenance contract OPTIMIZE needs at scale. */
object OptimizeCommit {

  val Commits = 6
  val FilesPerCommit = 4

  private val cache = new LayoutCache[String](table =>
    LayoutDirs.deleteQuiet(
      java.nio.file.Paths.get(table).getParent.toString))

  private[graft] def ensure(spark: SparkSession, sfDir: String): String =
    cache.get(sfDir, "documents.parquet") {
      val root = Files.createTempDirectory("graft-optimize")
      val table = root.toString + "/table"
      val docs = Tables.documents(spark, sfDir)
      // the fragmented ingest: six commits, several files each — the
      // small-file debris a per-trigger streaming writer accumulates
      (0 until Commits).foreach { i =>
        CommitLogIngest.commitAppend(
          docs.filter(col("doc_id") % Commits === i)
            .repartition(FilesPerCommit),
          table, statsCol = Some("doc_id"))
      }
      val (newV, nIn, nOut) =
        CommitLogIngest.optimize(spark, table, Some("doc_id"))
      require(newV == Commits.toLong && nOut < nIn,
        s"optimize did not compact: version $newV, $nIn -> $nOut files")
      table
    }

  /** Census of the LATEST snapshot, read through the log after OPTIMIZE —
    * hash-equality with the oracle over the original documents proves the
    * rewrite changed layout, not content. */
  def optimizedCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val table = ensure(spark, sfDir)
    CommitLogIngest.snapshot(spark, table)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  val optimizedCensusSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY source""".stripMargin

  /** Test hook: drop cached layouts (the shared clear contract). */
  private[graft] def clearCache(): Unit = cache.clear()

  def queries: Map[String, Q] = Map(
    "src_optimize_commit" -> Q(optimizedCensusSql)(optimizedCensus))
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables
import graft.streaming.CommitLogIngest

/** Schema evolution THROUGH the commit log — the round-9 gap: E-116 proved
  * `mergeSchema` over a flat directory, but a log-formatted table had no
  * schema action, so a streamed table could not evolve. Now a commit whose
  * batch schema differs from the last recorded one carries a
  * ("schema", json) metadata action, and every reader resolves "the schema
  * AS OF version V" from the log (checkpoints carry the latest schema row,
  * so resolution survives retention like the live file set does).
  *
  * The registry face ingests documents in two generations through the
  * STREAMING commit path: generation 1 (even doc_id) commits
  * (doc_id, source, n_chars); generation 2 (odd doc_id) adds a `quality`
  * column mid-stream. The census reads the LATEST snapshot — generation-1
  * rows must surface `quality` as NULL, generation-2 rows their real
  * values, with the NULL placement exact per generation. The DuckDB
  * oracle replays the generation rule from the original documents, so a
  * reader that dropped the new column, null-filled the wrong generation,
  * or lost a generation's rows hash-mismatches.
  *
  * `CommitSchemaSpec` pins the parts the oracle cannot see: per-version
  * schema resolution (a snapshot pinned before the change reads under the
  * OLD schema), the DSv2 stream delivering across the boundary, and
  * resolution through a checkpoint after the pre-evolution log is
  * retention-pruned. */
object CommitSchemaEvolution {

  /** Deterministic generation-2 quality: n_chars mod QualityMod. */
  val QualityMod = 97

  private val cache = new LayoutCache[String](table =>
    LayoutDirs.deleteQuiet(
      java.nio.file.Paths.get(table).getParent.toString))

  private[graft] def ensure(spark: SparkSession, sfDir: String): String =
    cache.get(sfDir, "documents.parquet") {
      val root = Files.createTempDirectory("graft-schema-evo")
      val table = root.toString + "/table"
      val docs = Tables.documents(spark, sfDir)
      val gen1 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val gen2 = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("n_chars"),
          (col("n_chars") % QualityMod).as("quality"))
      // four commits through the streaming path (batchId-addressed):
      // versions 0-1 are generation 1, the schema action rides the
      // generation-2 commit at version 2
      CommitLogIngest.commitOnce(
        gen1.filter(col("doc_id") % 4 === 0), table, 0L)
      CommitLogIngest.commitOnce(
        gen1.filter(col("doc_id") % 4 === 2), table, 1L)
      CommitLogIngest.commitOnce(
        gen2.filter(col("doc_id") % 4 === 1), table, 2L)
      CommitLogIngest.commitOnce(
        gen2.filter(col("doc_id") % 4 === 3), table, 3L)
      table
    }

  /** Census of the LATEST snapshot across the schema boundary: NULL
    * `quality` must land exactly on generation-1 rows. */
  def evolvedCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val table = ensure(spark, sfDir)
    CommitLogIngest.snapshot(spark, table)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("quality").isNull, 1L).otherwise(0L))
          .as("n_null_quality"),
        sum(col("quality")).as("sum_quality"))
  }

  val evolvedCensusSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_null_quality,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 1
       |    THEN n_chars % $QualityMod END) AS BIGINT) AS sum_quality
       |FROM documents GROUP BY source""".stripMargin

  /** Test hook: drop cached layouts (the shared clear contract). */
  private[graft] def clearCache(): Unit = cache.clear()

  def queries: Map[String, Q] = Map(
    "src_commit_schema_evo" -> Q(evolvedCensusSql)(evolvedCensus))
}

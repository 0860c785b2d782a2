package graft.sources

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables

/** Schema-evolution-tolerant corpus read — the corpus-LIFECYCLE concern
  * at 100 TB: a training corpus accretes over years, and files written
  * by generation-1 pipelines lack columns later generations added. The
  * files are immutable (rewriting 100 TB to backfill a column is not a
  * plan); the READ must absorb the drift: `mergeSchema` unions the
  * per-file parquet schemas, absent columns surface as NULL for the
  * files that predate them, and the query layer supplies defaults
  * (`coalesce`) where the semantics need one. Parquet stays
  * self-describing per file, so column pruning still works on the
  * merged schema — a projection reads only its columns from BOTH
  * generations (`SchemaEvolutionSpec` gates the ReadSchema).
  *
  * Demonstrated on a two-generation copy of `documents`: generation 1
  * (an md5-split ~half of the corpus) is written WITHOUT `n_chars` —
  * the early pipeline didn't compute it — generation 2 carries the full
  * schema plus a NEW `quality_v2` column (a deterministic derivation,
  * `n_chars / 100`, so the DuckDB oracle can replay it from the
  * original table). Both generations' files sit flat in ONE directory
  * (mode=append with a different schema — exactly the mess a real
  * corpus dir is). `src_schema_evolution` is the correctness face: a
  * per-source census over the merged read (doc counts, per-generation
  * presence counts, null-defaulted aggregates) hash-matched against a
  * DuckDB oracle that recomputes the same numbers from the ORIGINAL
  * documents and the same md5 generation rule. Build is once per
  * session per source fingerprint with stale eviction (the EventsLayout
  * cache discipline). */
object SchemaEvolution {

  // sfDir -> (documents source fingerprint, mixed-generation dir)
  private val created = TrieMap.empty[String, (String, String)]

  private def docsFp(sfDir: String): String =
    SourceFingerprint.key(sfDir, "documents.parquet")

  private def deleteQuiet(dir: String): Unit =
    LayoutDirs.deleteQuiet(dir)

  /** Engine-portable generation rule: gen 2 iff the first md5 nibble of
    * the doc_id string is ≥ 8 (an unbiased ~half split both engines
    * compute identically). NULL-safe: a NULL doc_id hashes as '' — an
    * unguarded md5(NULL) is NULL, which BOTH generation filters reject,
    * silently dropping the row from the mixed dir while the oracle's
    * COUNT(*) keeps it. */
  private[graft] val gen2Cond =
    "substring(md5(COALESCE(CAST(doc_id AS STRING), '')), 1, 1) >= '8'"

  private[graft] def ensure(spark: SparkSession, sfDir: String): String =
    created.synchronized {
      val fp = docsFp(sfDir)
      created.get(sfDir) match {
        case Some((`fp`, dir)) => dir
        case stale =>
          stale.foreach { case (_, dir) =>
            deleteQuiet(dir)
            created.remove(sfDir)
          }
          val root = Files.createTempDirectory("graft-schema-evo")
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            deleteQuiet(root.toString)
          }))
          val dir = root.toString + "/documents_mixed"
          val docs = Tables.documents(spark, sfDir)
          // generation 1: the early pipeline's narrow schema
          docs.filter(not(expr(gen2Cond)))
            .select("doc_id", "text", "lang", "source")
            .write.mode("overwrite").parquet(dir)
          // generation 2: full schema + the late-added derived column,
          // APPENDED with a different schema into the same directory
          docs.filter(expr(gen2Cond))
            .select(col("doc_id"), col("text"), col("lang"), col("source"),
              col("n_chars"),
              (col("n_chars").cast("double") / 100).as("quality_v2"))
            .write.mode("append").parquet(dir)
          created.put(sfDir, (fp, dir))
          dir
      }
    }

  /** The merged read itself (mergeSchema unions the two generations'
    * file schemas; gen-1 rows surface NULL n_chars / quality_v2). */
  private[graft] def mergedRead(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(ensure(spark, sfDir))

  /** Per-source census over the mixed-generation corpus: total docs,
    * how many carry each late column, and null-defaulted aggregates —
    * the numbers a curation dashboard needs to be CORRECT across the
    * schema boundary, not just on the newest generation. */
  def evolutionCensus(spark: SparkSession, sfDir: String): DataFrame =
    mergedRead(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_gen2"),
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_nchars"),
        round(sum(coalesce(col("quality_v2"), lit(0.0))), 4)
          .as("sum_q2"),
        // AVG ignores NULL in both engines: the late column's mean is
        // correct over the docs that HAVE it, with no gen-1 pollution
        round(avg(col("quality_v2")), 6).as("avg_q2_present"))

  val evolutionCensusSql: String =
    """WITH g AS (
      |  SELECT source, n_chars,
      |    substring(md5(COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 1)
      |      >= '8' AS gen2
      |  FROM documents
      |)
      |SELECT source,
      |  COUNT(*) AS n_docs,
      |  CAST(COUNT(CASE WHEN gen2 THEN n_chars END) AS BIGINT) AS n_gen2,
      |  CAST(SUM(CASE WHEN gen2 THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS sum_nchars,
      |  ROUND(SUM(CASE WHEN gen2 THEN n_chars / 100.0 ELSE 0 END), 4)
      |    AS sum_q2,
      |  ROUND(AVG(CASE WHEN gen2 THEN n_chars / 100.0 END), 6)
      |    AS avg_q2_present
      |FROM g GROUP BY source""".stripMargin

  /** Test hook: drop cached layouts (the shared clear contract). */
  private[graft] def clearCache(): Unit = created.synchronized {
    created.values.foreach { case (_, dir) => deleteQuiet(dir) }
    created.clear()
  }

  def queries: Map[String, Q] = Map(
    "src_schema_evolution" -> Q(evolutionCensusSql)(evolutionCensus))
}

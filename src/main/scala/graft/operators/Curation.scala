package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.TextFunctions.tokens
import graft.model.Tables

/** The end-to-end curation deliverable: one funnel that chains the four
  * standard training-data passes — quality gate, exact dedup, text
  * near-dup, semantic (embedding) dedup — over the SAME corpus the
  * individual operators are verified on, emitting the per-source
  * survivor census after each stage. This is the query a dataset curator
  * actually runs: every stage reuses the already-oracled primitive
  * (withQuality / the shared Jaccard pair list / embedNearDup), so the
  * funnel's cost at 100 TB is three drop-set joins, one fingerprint
  * window and a single conditional aggregate over one corpus pass, on
  * top of artifacts the pipeline builds anyway.
  *
  * Drop-set semantics are dedupCorpus's conservative keep-first: a doc
  * is dropped if it is the higher id of a duplicate pair, regardless of
  * whether its partner survived an earlier stage (a doc similar only to
  * an already-dropped doc still drops). Stages apply in order, so each
  * census column is the size of the intersection of keep-sets up to that
  * stage — the funnel reads left to right as attrition.
  */
object Curation {

  /** Logistic-composite floor for the quality gate: sits just below the
    * corpus median (~0.68 at sf0.01), so the gate is a real filter at
    * every SF rather than a pass-through. */
  private val QualityFloor = 0.6

  /** Jaccard floor for the text near-dup drop (dedupCorpus's). */
  private val JaccardFloor = 0.5

  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    // stage 1: quality gate (row-local score, no shuffle) as a FLAG —
    // all five census columns come from one conditional aggregate over
    // one pass, so the quality scoring / fingerprint window / drop-set
    // joins each run once (a per-stage census join re-derived the
    // shared prefix once per branch)
    val scored = TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("source"),
        (col("quality") >= QualityFloor).as("q_ok"))
    // stage 2: exact dedup — keep the lowest doc_id per md5(text)
    // fingerprint; one hash shuffle of (fp, id)
    val exactDrop = docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("mn", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") > col("mn"))
      .select(col("doc_id"), lit(true).as("xd"))
    // stage 3: text near-dup — the SHARED persisted Jaccard pair list
    val nearDrop = Dedup.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= JaccardFloor)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("nd", lit(true))
    // stage 4: semantic dedup — LSH-blocked embedding near-dup pairs
    // (vec_id aligns 1:1 with doc_id by the data contract)
    val semDrop = Similarity.embedNearDup(spark, sfDir)
      .select(col("vec_b").as("doc_id")).distinct()
      .withColumn("sd", lit(true))
    val keepEx = col("q_ok") && col("xd").isNull
    val keepNd = keepEx && col("nd").isNull
    scored
      .join(exactDrop, Seq("doc_id"), "left_outer")
      .join(nearDrop, Seq("doc_id"), "left_outer")
      .join(semDrop, Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        count(when(col("q_ok"), 1)).as("n_quality"),
        count(when(keepEx, 1)).as("n_exact"),
        count(when(keepNd, 1)).as("n_neardup"),
        count(when(keepNd && col("sd").isNull, 1)).as("n_final"))
  }

  /** Oracle composed by WRAPPING the three finished sibling oracles as
    * sub-CTEs (DuckDB allows a WITH inside a CTE body) — no textual
    * surgery on their internals, so a rewording of any stage's oracle
    * flows through here automatically. */
  val curationFunnelSql: String =
    s"""WITH qsc AS (
       |${TextAnalysis.qualityScoreSql}
       |), jp AS (
       |${Dedup.ngramJaccardSql}
       |), ep AS (
       |${Similarity.embedNearDupSql}
       |), fp AS (
       |  SELECT doc_id, md5(text) AS fp FROM documents
       |), exact_drop AS (
       |  SELECT DISTINCT a.doc_id FROM fp a
       |  JOIN fp b ON a.fp = b.fp AND b.doc_id < a.doc_id
       |), s1 AS (
       |  SELECT d.doc_id, d.source FROM documents d
       |  JOIN qsc ON d.doc_id = qsc.doc_id WHERE qsc.quality >= $QualityFloor
       |), s2 AS (
       |  SELECT * FROM s1
       |  WHERE doc_id NOT IN (SELECT doc_id FROM exact_drop)
       |), s3 AS (
       |  SELECT * FROM s2 WHERE doc_id NOT IN (
       |    SELECT DISTINCT doc_b FROM jp WHERE jaccard >= $JaccardFloor)
       |), s4 AS (
       |  SELECT * FROM s3 WHERE doc_id NOT IN (SELECT DISTINCT vec_b FROM ep)
       |)
       |SELECT r.source, r.n_raw,
       |  COALESCE(c1.n, 0) AS n_quality, COALESCE(c2.n, 0) AS n_exact,
       |  COALESCE(c3.n, 0) AS n_neardup, COALESCE(c4.n, 0) AS n_final
       |FROM (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY 1) r
       |LEFT JOIN (SELECT source, COUNT(*) AS n FROM s1 GROUP BY 1) c1
       |  USING (source)
       |LEFT JOIN (SELECT source, COUNT(*) AS n FROM s2 GROUP BY 1) c2
       |  USING (source)
       |LEFT JOIN (SELECT source, COUNT(*) AS n FROM s3 GROUP BY 1) c3
       |  USING (source)
       |LEFT JOIN (SELECT source, COUNT(*) AS n FROM s4 GROUP BY 1) c4
       |  USING (source)""".stripMargin

  /** Cross-modal dup-detector agreement: of all near-dup PAIRS found by
    * either detector, how many does each modality see? `text_only` pairs
    * are surface dups below the embedding radius (templates, boilerplate
    * edits); `semantic_only` are paraphrase/re-encode dups token overlap
    * can't see; `both` is the overlap. Curators read this to decide
    * whether one pass can be dropped at 100 TB — the shape is two
    * already-built pair lists full-outer-joined on the (lo, hi) pair
    * key, so the query costs one join of two small artifacts. */
  def modalAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val tp = Dedup.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= JaccardFloor)
      .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
    val sp = Similarity.embedNearDup(spark, sfDir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        lit(1).as("s"))
    tp.join(sp, Seq("doc_a", "doc_b"), "full_outer")
      .select(when(col("t").isNotNull && col("s").isNotNull, "both")
        .when(col("t").isNotNull, "text_only")
        .otherwise("semantic_only").as("modality"))
      .groupBy(col("modality")).agg(count(lit(1)).as("n_pairs"))
  }

  val modalAgreementSql: String =
    s"""WITH jp AS (
       |${Dedup.ngramJaccardSql}
       |), ep AS (
       |${Similarity.embedNearDupSql}
       |), tpair AS (
       |  SELECT doc_a, doc_b FROM jp WHERE jaccard >= $JaccardFloor
       |), spair AS (
       |  SELECT vec_a AS doc_a, vec_b AS doc_b FROM ep
       |)
       |SELECT modality, COUNT(*) AS n_pairs FROM (
       |  SELECT CASE
       |    WHEN t.doc_a IS NOT NULL AND s.doc_a IS NOT NULL THEN 'both'
       |    WHEN t.doc_a IS NOT NULL THEN 'text_only'
       |    ELSE 'semantic_only' END AS modality
       |  FROM tpair t FULL OUTER JOIN spair s
       |    ON t.doc_a = s.doc_a AND t.doc_b = s.doc_b
       |) GROUP BY modality""".stripMargin

  // ---- Right-to-be-forgotten propagation audit -------------------------------

  /** Share of each derived artifact a deletion request invalidates — the
    * audit a pipeline owner runs BEFORE promising GDPR-style erasure.
    * The purge set is a deterministic 5% slice (md5 of the stable doc
    * key, salt "forget" — stands in for an external delete-list table;
    * the query shape is identical for a real one). Each artifact is the
    * already-oracled derived table, counted total vs rows TOUCHING a
    * purged doc: per-doc rows (tfidf) purge by key, pair artifacts
    * (jaccard / semantic near-dup) purge when EITHER endpoint is purged
    * — the fan-out number that makes naive "delete the row" erasure
    * wrong at 100 TB and motivates tombstone-join replay. Cost: one
    * anti-ish left join per artifact against a corpus-derived purge set;
    * the pair artifacts are already-built shared frames. */
  def purgeAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket =
      (conv(substring(md5(concat(lit("forget"), col("doc_id"))), 1, 8), 16, 10)
        .cast("long") % 100)
    val purged = Tables.documents(spark, sfDir)
      .select(col("doc_id")).filter(bucket < 5)
      .withColumn("p", lit(true))
    def one(name: String, df: DataFrame, hit: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(hit, 1L).otherwise(0L)).as("n_purged"))
        .select(lit(name).as("artifact"), col("n_rows"), col("n_purged"))
    val docs = Tables.documents(spark, sfDir).select("doc_id")
      .join(purged, Seq("doc_id"), "left_outer")
    // Round-15: the tfidf-artifact leg needs only HOW MANY tfidf rows
    // each doc contributes, and that is min(3, distinct terms) BY
    // CONSTRUCTION (tfIdf assigns every (doc, term) a finite score and
    // keeps rnk ≤ 3 per doc), so the leg is one row-local expression
    // over the corpus instead of the full tf → df → join → window
    // chain — the audit's dominant cost. Output identical; the oracle
    // still counts the real tfidf CTE's rows.
    // coalesce (round-16 ADVICE): for a NULL text the tokenize chain is
    // NULL and least() would SKIP the null, yielding k=3 where the real
    // tfIdf chain emits 0 rows — null text must contribute 0
    val tfr = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        least(coalesce(
          size(array_distinct(tokens(col("text")))).cast("long"), lit(0L)),
          lit(3L)).as("k"))
      .join(purged, Seq("doc_id"), "left_outer")
    val jp = Dedup.ngramJaccard(spark, sfDir)
      .join(purged.as("pa"), col("doc_a") === col("pa.doc_id"), "left_outer")
      .join(purged.as("pb"), col("doc_b") === col("pb.doc_id"), "left_outer")
    val ep = Similarity.embedNearDup(spark, sfDir)
      .join(purged.as("pa"), col("vec_a") === col("pa.doc_id"), "left_outer")
      .join(purged.as("pb"), col("vec_b") === col("pb.doc_id"), "left_outer")
    val tfLeg = tfr.agg(
        coalesce(sum(col("k")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("p").isNotNull, col("k")).otherwise(0L)),
          lit(0L)).as("n_purged"))
      .select(lit("tfidf_rows").as("artifact"), col("n_rows"),
        col("n_purged"))
    one("documents", docs, col("p").isNotNull)
      .unionByName(tfLeg)
      .unionByName(one("jaccard_pairs", jp,
        col("pa.p").isNotNull || col("pb.p").isNotNull))
      .unionByName(one("semantic_pairs", ep,
        col("pa.p").isNotNull || col("pb.p").isNotNull))
  }

  val purgeAuditSql: String =
    s"""WITH tf AS (
       |${TextAnalysis.tfIdfSql}
       |), jp AS (
       |${Dedup.ngramJaccardSql}
       |), ep AS (
       |${Similarity.embedNearDupSql}
       |), pg AS (
       |  SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(md5('forget' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |    % 100 < 5
       |)
       |SELECT 'documents' AS artifact, COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM pg)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_purged
       |FROM documents
       |UNION ALL
       |SELECT 'tfidf_rows', COUNT(*),
       |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM pg)
       |    THEN 1 ELSE 0 END) AS BIGINT)
       |FROM tf
       |UNION ALL
       |SELECT 'jaccard_pairs', COUNT(*),
       |  CAST(SUM(CASE WHEN doc_a IN (SELECT doc_id FROM pg)
       |    OR doc_b IN (SELECT doc_id FROM pg) THEN 1 ELSE 0 END) AS BIGINT)
       |FROM jp
       |UNION ALL
       |SELECT 'semantic_pairs', COUNT(*),
       |  CAST(SUM(CASE WHEN vec_a IN (SELECT doc_id FROM pg)
       |    OR vec_b IN (SELECT doc_id FROM pg) THEN 1 ELSE 0 END) AS BIGINT)
       |FROM ep""".stripMargin

  // ---- Quality × near-dup calibration ----------------------------------------

  /** Near-dup rate per quality decile — the calibration table behind the
    * standing curation question "does the quality gate already remove
    * the duplicates?" (If dup rate concentrates in low deciles, the
    * near-dup pass can run AFTER the quality cut on the survivors —
    * a large corpus-scan saving at 100 TB; if it's flat, it can't.)
    * Reuses the row-local quality score and the shared pair list; the
    * dup flag is membership in any jaccard ≥ $JaccardFloor pair, either
    * side (unlike the funnel's keep-first drop set — a calibration
    * counts BOTH members as duplicated material). */
  def qualityDupCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = TextAnalysis.withQuality(
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"),
        least(floor(col("quality") * 10), lit(9L)).as("decile"))
    val pairs = Dedup.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= JaccardFloor)
    val dup = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("dp", lit(true))
    scored.join(dup, Seq("doc_id"), "left_outer")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dp").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        round(sum(when(col("dp").isNotNull, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 4).as("dup_rate"))
  }

  val qualityDupCorrSql: String =
    s"""WITH qsc AS (
       |${TextAnalysis.qualityScoreSql}
       |), jp AS (
       |${Dedup.ngramJaccardSql}
       |), dup AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM jp WHERE jaccard >= $JaccardFloor
       |    UNION SELECT doc_b FROM jp WHERE jaccard >= $JaccardFloor)
       |)
       |SELECT CAST(LEAST(FLOOR(quality * 10), 9) AS BIGINT) AS decile,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup,
       |  ROUND(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    / CAST(COUNT(*) AS DOUBLE), 4) AS dup_rate
       |FROM qsc LEFT JOIN dup ON qsc.doc_id = dup.doc_id
       |GROUP BY 1""".stripMargin

  def queries: Map[String, Q] = Map(
    "d_curation_funnel" -> Q(curationFunnelSql)(curationFunnel),
    "d_modal_agreement" -> Q(modalAgreementSql)(modalAgreement),
    "d_purge_audit" -> Q(purgeAuditSql)(purgeAudit),
    "d_quality_dup_corr" -> Q(qualityDupCorrSql)(qualityDupCorr))
}

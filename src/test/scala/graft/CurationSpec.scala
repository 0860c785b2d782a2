package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}

/** Value-level invariants for the curation funnel: per-source attrition
  * must be monotone, and each stage's census must reconcile with an
  * independent recomputation from the standalone (separately oracled)
  * stage primitives. */
class CurationSpec extends SparkSuite {

  test("funnel attrition is monotone and reconciles with the stage primitives") {
    val s = spark
    val rows = Curation.curationFunnel(s, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (src, (raw, q, ex, nd, fin)) =>
      assert(raw >= q && q >= ex && ex >= nd && nd >= fin,
        s"$src: funnel must be monotone, got $raw/$q/$ex/$nd/$fin")
      assert(fin > 0, s"$src: a whole source vanished")
    }

    // independent stage-1 recomputation: quality floor over the corpus
    val wantQ = TextAnalysis.withQuality(
        Tables.documents(s, sf0001).select(col("doc_id"), col("source"),
          col("text")))
      .filter(col("quality") >= 0.6)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.view.mapValues(_._2).toMap == wantQ,
      "stage-1 census must equal the standalone quality-floor count")

    // stage-3/4 drop sets: survivors must be disjoint from the standalone
    // pair lists' higher-id members (the keep-first contract)
    val nearDrop = Dedup.ngramJaccard(s, sf0001)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_b")).collect().map(_.getLong(0)).toSet
    val semDrop = Similarity.embedNearDup(s, sf0001)
      .select(col("vec_b")).collect().map(_.getLong(0)).toSet
    val total = rows.values.map(_._5).sum
    // recompute the full funnel independently, driver-side, from the
    // standalone primitives (tiny at sf0.001)
    val quality = TextAnalysis.withQuality(
        Tables.documents(s, sf0001).select(col("doc_id"), col("source"),
          col("text")))
      .filter(col("quality") >= 0.6)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val fps = Tables.documents(s, sf0001)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val minPerFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val exactDrop = fps.collect {
      case (id, fp) if id > minPerFp(fp) => id
    }.toSet
    val survivors = quality -- exactDrop -- nearDrop -- semDrop
    assert(survivors.size.toLong == total,
      s"driver-side funnel recomputation (${survivors.size}) " +
        s"disagrees with the query ($total)")
  }

  test("modal agreement partitions the union of the two pair lists") {
    val s = spark
    val rows = Curation.modalAgreement(s, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf(Set("both", "text_only", "semantic_only")))
    val tPairs = Dedup.ngramJaccard(s, sf0001)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sPairs = Similarity.embedNearDup(s, sf0001)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.getOrElse("both", 0L) == (tPairs & sPairs).size.toLong)
    assert(rows.getOrElse("text_only", 0L) == (tPairs -- sPairs).size.toLong)
    assert(rows.getOrElse("semantic_only", 0L)
      == (sPairs -- tPairs).size.toLong)
    assert(rows.values.sum == (tPairs | sPairs).size.toLong,
      "categories must partition the pair union")
  }
}

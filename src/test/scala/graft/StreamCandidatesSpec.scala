package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The round-15 streamed candidate/stop generator must reproduce, over
  * any (doc_id, h) multiset, exactly what the round-14 formulations
  * computed: candidate pairs with distinct-common-rare-shingle counts
  * (the df-filter + self-join + countDistinct shape) and per-doc distinct
  * stop-shingle sets — including under within-doc duplicate h (the md5
  * collision case), hot keys, occurrence-vs-distinct gate differences,
  * and multi-partition inputs. */
class StreamCandidatesSpec extends SparkSuite {

  private val MaxDf = 10 // mirrors Dedup.MaxShingleDf

  private implicit class SeqOps[A](s: Seq[A]) {
    def asJava: java.util.List[A] = java.util.Arrays.asList(s: _*)
  }

  private def ex() = {
    val rows =
      // h=1 shared by docs 1,2,3; doc 2 carries it TWICE (collision)
      Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 1L)) ++
        // h=2: 6 occurrences, 5 distinct docs — still rare (occ ≤ 10)
        Seq((10L, 2L), (10L, 2L), (11L, 2L), (12L, 2L), (13L, 2L), (14L, 2L)) ++
        // h=3: HOT — 20 distinct docs; contributes stop rows, no pairs
        (100L until 120L).map(d => (d, 3L)) ++
        // h=4: a pair; h=5: singleton (no pairs, no stop rows)
        Seq((5L, 4L), (6L, 4L), (7L, 5L)) ++
        // h=6: 11 occurrences over 9 distinct docs — OCCURRENCE gate
        // makes it STOP even though distinct docs ≤ 10
        ((200L until 209L).map(d => (d, 6L)) ++ Seq((200L, 6L), (201L, 6L))) ++
        // h=7: shared by the same docs as h=1 → c_rare=2 for (1,2) etc.
        Seq((1L, 7L), (2L, 7L), (3L, 7L))
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("h", LongType))))
  }

  test("streamed pairs equal the self-join + countDistinct formulation") {
    val e = ex()
    val dfKeys = e.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxDf).select("h")
    val rare = e.join(dfKeys, Seq("h"))
    val expect = rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(countDistinct(col("a.h")).as("c_rare"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tagged = graft.operators.Dedup.streamCandidates(
        e.select(col("h"), col("doc_id")).repartition(5, col("h"))
          .sortWithinPartitions(col("h"), col("doc_id")))
      .toDF("kind", "a", "b")
    val got = tagged.filter(col("kind") === 0)
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("c_rare"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.contains((1L, 2L, 2L))) // h=1 and h=7 both count once each
  }

  test("streamed stop rows equal the df-filter + distinct formulation") {
    val e = ex()
    val dfc = e.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val expect = e.join(dfc.filter(col("df") > MaxDf).select("h"), Seq("h"))
      .select(col("doc_id"), col("h")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.operators.Dedup.streamCandidates(
        e.select(col("h"), col("doc_id")).repartition(3, col("h"))
          .sortWithinPartitions(col("h"), col("doc_id")))
      .toDF("kind", "a", "b")
      .filter(col("kind") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // the occurrence-gated h=6 is stop despite ≤ 10 distinct docs
    assert(got.exists(_._2 == 6L))
    assert(got.count(_._2 == 6L) == 9) // distinct docs, not occurrences
  }

  test("empty and single-group inputs") {
    val empty = spark.createDataFrame(Seq.empty[Row].asJava,
      StructType(Seq(StructField("h", LongType),
        StructField("doc_id", LongType))))
    assert(graft.operators.Dedup.streamCandidates(empty).count() == 0L)
  }
}

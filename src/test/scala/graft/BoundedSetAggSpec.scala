package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.graft.BoundedSetAgg

/** The round-15 dedup candidate-generation rewrite: one groupBy(h) with a
  * BOUNDED doc-set aggregate + row-local pair explode must produce exactly
  * the pairs and common-rare-shingle counts of the old formulation (ex
  * joined to df-filtered keys, self-joined on h, groupBy countDistinct) —
  * including under within-doc duplicate h (the 60-bit md5 collision case)
  * and hot keys past the cap. */
class BoundedSetAggSpec extends SparkSuite {

  private val MaxDf = 10

  /** Synthetic exploded (doc_id, h) with: rare keys shared by 2..10 docs,
    * a hot key over the cap, a doc carrying the same h twice (collision),
    * and singleton keys. */
  private def ex() = {
    val rows =
      // h=1 shared by docs 1,2,3 (and doc 2 carries it TWICE — collision)
      Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 1L)) ++
        // h=2: exactly at the df cap via occurrences: docs 10..14, doc 10
        // has it twice → 6 occurrences, 5 distinct docs
        Seq((10L, 2L), (10L, 2L), (11L, 2L), (12L, 2L), (13L, 2L), (14L, 2L)) ++
        // h=3: HOT — 20 distinct docs, df over the cap, must yield no pairs
        (100L until 120L).map(d => (d, 3L)) ++
        // h=4: a pair
        Seq((5L, 4L), (6L, 4L)) ++
        // h=5: singleton
        Seq((7L, 5L)) ++
        // h=6: occurrences 11 (over cap) but distinct docs 9 (under) —
        // the OCCURRENCE count is the gate, as in the original
        ((200L until 209L).map(d => (d, 6L)) ++ Seq((200L, 6L), (201L, 6L)))
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("h", LongType))))
      .repartition(7) // force multi-partition partial-merge paths
  }

  private implicit class SeqOps[A](s: Seq[A]) {
    def asJava: java.util.List[A] = java.util.Arrays.asList(s: _*)
  }

  test("bounded-set pair generation matches the self-join formulation") {
    val e = ex()
    // OLD: df census → join → self-join → countDistinct
    val dfKeys = e.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxDf).select("h")
    val rare = e.join(dfKeys, Seq("h"))
    val oldCand = rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(countDistinct(col("a.h")).as("c_rare"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // NEW: bounded set + row-local pair explode
    val dfh = e.groupBy(col("h"))
      .agg(count(lit(1)).as("df"),
        BoundedSetAgg(col("doc_id"), MaxDf + 1).as("docs"))
    val newCand = dfh.filter(col("df") <= MaxDf)
      .select(explode(expr(
        "flatten(transform(docs, (a, i) -> " +
          "transform(slice(docs, i + 2, size(docs)), " +
          "b -> struct(a AS doc_a, b AS doc_b))))")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("c_rare"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(newCand == oldCand)
    assert(newCand.nonEmpty)
    // the hot key contributed nothing
    assert(!newCand.exists { case (a, b, _) => a >= 100L && b < 200L })
  }

  test("bounded set is sorted, distinct, capped, and null-skipping") {
    val rows = Seq[java.lang.Long](5L, 3L, 3L, null, 9L, 1L, 1L, 7L)
      .map(v => Row(v))
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("v", LongType, nullable = true))))
    val out = df.agg(BoundedSetAgg(col("v"), 3).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(out.length == 3)
    assert(out == out.sorted)
    assert(out.distinct.length == 3)
    val full = df.agg(BoundedSetAgg(col("v"), 16).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(full == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("stop-set vtab matches the array_except formulation") {
    val e = ex()
    val s = e.groupBy(col("doc_id")).agg(collect_set(col("h")).as("s"))
    val dfc = e.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // OLD: per-doc rare list, st = array_except(s, rh)
    val rareSets = e.join(dfc.filter(col("df") <= MaxDf).select("h"), Seq("h"))
      .groupBy(col("doc_id")).agg(collect_list(col("h")).as("rh"))
    val oldSt = s.join(rareSets, Seq("doc_id"), "left")
      .select(col("doc_id"), array_sort(array_except(col("s"),
        coalesce(col("rh"), typedLit(Array.empty[Long])))).as("st"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // NEW: join exploded against stop keys, collect_set
    val stopSets = e.join(dfc.filter(col("df") > MaxDf).select("h"), Seq("h"))
      .groupBy(col("doc_id")).agg(collect_set(col("h")).as("sth"))
    val newSt = s.join(stopSets, Seq("doc_id"), "left")
      .select(col("doc_id"), array_sort(coalesce(col("sth"),
        typedLit(Array.empty[Long]))).as("st"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(newSt == oldSt)
  }
}

package graft

import org.apache.spark.sql.functions._

/** BPE merge-induction invariants, plus a golden check of the
  * double-separator replace encoding the whole operator rests on. */
class BpeSpec extends SparkSuite {

  /** Apply one merge to an encoded symbol string the way the operator
    * does — via the engine's replace, not a reimplementation. */
  private def mergeOnce(s: String, l: String, r: String): String =
    spark.range(1).select(
      expr(s"replace('$s', '|$l||$r|', '|$l$r|')").as("s"))
      .collect()(0).getString(0)

  test("double-separator replace implements greedy-left BPE merging") {
    // disjoint consecutive pairs all merge
    assert(mergeOnce("||a||b||a||b||", "a", "b") == "||ab||ab||")
    // overlapping run merges greedy-left: aaa -> (aa)a, aaaa -> (aa)(aa)
    assert(mergeOnce("||a||a||a||", "a", "a") == "||aa||a||")
    assert(mergeOnce("||a||a||a||a||", "a", "a") == "||aa||aa||")
    // no mid-symbol false positives: 'ba','ab' must not merge as (a,a)
    assert(mergeOnce("||ba||ab||", "a", "a") == "||ba||ab||")
    // merged symbols are atomic next round: (ab,b) does not chain
    assert(mergeOnce("||ab||b||b||", "ab", "b") == "||abb||b||")
  }

  test("regenerated documents invalidate the cached BPE trajectory") {
    // the OrcStalenessSpec pattern: the cache key carries a fingerprint of
    // the source parquet (names + sizes + mtimes), so an in-session
    // regeneration under the SAME path must retrain, not serve merges
    // learned on the old bytes (the driver regenerates testdata mid-round)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-stale")
    dir.toFile.deleteOnExit()
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, "web", "en", t) }
        .toDF("doc_id", "source", "lang", "text")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def topMerge(): (String, String) = {
      val r = graft.operators.TextAnalysis.bpeMerges(s, dir.toString)
        .filter(col("merge_round") === 1).collect()(0)
      (r.getAs[String]("l_sym"), r.getAs[String]("r_sym"))
    }
    write(Seq.fill(8)("xy"))
    assert(topMerge() == ("x", "y"))
    write(Seq.fill(8)("qr"))
    assert(topMerge() == ("q", "r"),
      "stale BPE merges served after the source parquet was regenerated")
  }

  test("learned merges: concat integrity, monotone counts, full rounds") {
    val rows = graft.operators.TextAnalysis.bpeMerges(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    rows.foreach { case (rd, l, r, m, c) =>
      assert(m == l + r, s"round $rd: merged '$m' != '$l'+'$r'")
      assert(c > 0, s"round $rd: non-positive pair count")
    }
    // each round's winner count cannot exceed the previous round's: any
    // new pair (x, lr) inherits from a subset of (x, l) occurrences, and
    // old pairs only lose mass to the merge
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5,
        s"round ${b._1} count ${b._5} exceeds round ${a._1} count ${a._5}")
    }
  }

  test("tokenize census conserves symbols against the merge counts") {
    val census = graft.operators.TextAnalysis.bpeTokenize(spark, sf0001)
      .collect()(0)
    val (types, before, after, ratio) =
      (census.getLong(0), census.getLong(1), census.getLong(2),
        census.getDouble(3))
    assert(types > 0 && before > after && after > 0)
    // each applied merge removes exactly one symbol; greedy-left skips
    // overlapping occurrences, so removals are bounded by the counted
    // pair mass but must be positive
    val pairMass = graft.operators.TextAnalysis.bpeMerges(spark, sf0001)
      .collect().map(_.getLong(4)).sum
    assert(before - after <= pairMass,
      s"removed ${before - after} symbols > counted pair mass $pairMass")
    assert(ratio == BigDecimal(1.0 - after.toDouble / before)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble ||
      math.abs(ratio - (1.0 - after.toDouble / before)) < 1e-4)
  }
}

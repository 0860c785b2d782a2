package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.model.Tables

/** Value-level invariants for the round-4 continuation operators —
  * semantic properties derivable from first principles, checked
  * independently of the DuckDB oracles (the Round4OperatorsSpec
  * discipline). */
class ContinuationOperatorsSpec extends SparkSuite {

  test("gap fill: hours span observed hours, gaps reconcile, fill only adds") {
    val rows = graft.operators.Analytics.gapFill(spark, sf0001).collect()
    val hourly = Tables.events(spark, sf0001)
      .select(col("user_id"),
        expr("date_trunc('hour', timestamp_millis(ts div 1000000))").as("h"),
        col("value"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("h")).as("n_obs"),
        round(sum(col("value")), 2).as("sum_obs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.length == hourly.size, "one audit row per user")
    rows.foreach { r =>
      val (user, nHours, nGaps, sumFilled) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (nObs, sumObs) = hourly(user)
      assert(nHours - nGaps == nObs,
        s"user $user: observed-hour reconciliation failed")
      assert(nHours >= nObs, s"user $user: span must cover observations")
      // carry-forward re-counts earlier (positive) values, never removes
      assert(sumFilled >= sumObs - 0.01,
        s"user $user: fill lost value ($sumFilled < $sumObs)")
    }
  }

  test("chunk windows: stride anchoring, width cap, exact tail coverage") {
    val chunks = graft.operators.TextAnalysis.chunkWindows(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val sizes = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, cs) =>
      val n = sizes(doc)
      val starts = cs.map(_._2).sorted
      assert(starts.head == 1L, s"doc $doc: first window anchors at 1")
      assert(starts.sliding(2).filter(_.size == 2)
        .forall(p => p(1) - p(0) == 48L), s"doc $doc: stride must be 48")
      assert(cs.forall(_._3 <= 64L), s"doc $doc: width cap 64")
      // exact tail coverage: the last window ends at the last token (or
      // the doc is empty and the single window is empty)
      val lastEnd = cs.map(c => c._2 + c._3 - 1).max
      if (n > 0) assert(lastEnd == n, s"doc $doc: tail uncovered ($lastEnd/$n)")
      // overlap design: every token index is inside >= 1 window because
      // stride (48) < width (64) and the start sequence stops at n-16
      assert(cs.forall(c => c._3 == 64L || c._2 + c._3 - 1 == n),
        s"doc $doc: only the tail window may be short")
    }
  }

  test("upsert merge: counts reconcile with the delta construction") {
    val out = graft.operators.Dedup.upsertMerge(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"))
    val expected = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_base"),
        count(when(col("doc_id") % 10 === 0, 1)).as("n_rev"),
        count(when(col("doc_id") % 20 === 0, 1)).as("n_ins"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (src, (nDocs, nRevised, nInserted)) =>
      val (nBase, nRev, nIns) = expected(src)
      assert(nDocs == nBase + nIns,
        s"$src: merged corpus = base + insertions ($nDocs vs $nBase+$nIns)")
      assert(nRevised == nRev, s"$src: every %10 doc must surface revised")
      assert(nInserted == nIns, s"$src: every %20 doc must surface inserted")
    }
  }

  test("sample estimate: 10x-scaled sample lands within the statistical bound") {
    val rows = graft.operators.Analytics.sampleEstimate(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nExact, sumExact) = (r.getLong(1).toDouble, r.getDouble(2))
      val (nSample, sumSample) = (r.getLong(3).toDouble, r.getDouble(4))
      assert(nSample > 0, "each flag must draw sample rows")
      // ~binomial(n, 0.1): 5-sigma relative bound ≈ 5·sqrt(0.9/(0.1·n))
      val bound = 5.0 * math.sqrt(0.9 / (0.1 * nExact))
      assert(math.abs(nSample * 10 - nExact) / nExact <= bound,
        s"${r.getString(0)}: count estimate off (${nSample * 10} vs $nExact)")
      assert(math.abs(sumSample * 10 - sumExact) / sumExact <= bound * 1.5,
        s"${r.getString(0)}: sum estimate off (${sumSample * 10} vs $sumExact)")
    }
  }

  test("funnel: converted users are a subset of signed-up users") {
    val r = graft.operators.Analytics.funnel(spark, sf0001).head
    val (users, signed, converted, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(signed <= users)
    assert(converted <= signed, "conversion requires a prior signup")
    assert(converted > 0, "the synthetic corpus has converting users")
    assert(math.abs(rate - converted.toDouble / signed) < 1e-3)
  }

  test("transitions: matrix total equals events minus one per active user") {
    val total = graft.operators.Analytics.transitions(spark, sf0001)
      .agg(sum(col("n_transitions"))).head.getLong(0)
    val perUser = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") - 1)).head.getLong(0)
    assert(total == perUser,
      s"every event except each user's first must appear as a transition " +
        s"($total vs $perUser)")
  }

  test("range frame: rolling sum equals a hand-computed frame for one user") {
    val rows = graft.operators.Analytics.rangeFrame(spark, sf0001)
      .filter(col("user_id") === 3L)
      .select("ts_sec", "value", "rolling_1h")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (t, _, rolling) =>
      val want = BigDecimal(rows.filter(r => r._1 >= t - 3600 && r._1 <= t)
        .map(_._2).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert((BigDecimal(rolling) - want).abs <= BigDecimal(0.01),
        s"t=$t: rolling=$rolling want=$want")
    }
  }

  test("bigram LM: doc census matches >=2-token docs; surprisal bounded") {
    val rows = graft.operators.TextAnalysis.bigramSurprisal(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // independent recomputation of the census: a doc contributes iff it
    // has at least one bigram, i.e. >= 2 letter-run tokens
    val want = Tables.documents(spark, sf0001)
      .select(col("source"), size(tokens(col("text"))).as("n"))
      .filter(col("n") >= 2)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.view.mapValues(_._1).toMap == want,
      "per-source doc counts must equal docs with >= 2 tokens")
    // smoothed -ln P is bounded: P <= c2+a / (cctx+a) <= 1 up to the aV
    // denominator, so surprisal > 0; and avg <= max by construction
    rows.foreach { case (src, (_, avg, mx)) =>
      assert(avg > 0.0 && mx > 0.0, s"$src: surprisal must be positive")
      assert(avg <= mx + 1e-9, s"$src: avg exceeds max")
    }
  }
}

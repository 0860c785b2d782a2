package graft

import org.apache.spark.sql.functions._

/** Value-level invariants for the round-4 operators (the DuckDB gate
  * checks engine equivalence; these pin the SEMANTICS — the properties a
  * curator relies on — so a future refactor that stays engine-consistent
  * but changes meaning still fails). */
class Round4OperatorsSpec extends SparkSuite {

  test("containment dominates jaccard and subset pairs reach 1.0") {
    val rows = graft.operators.Dedup.containmentPairs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, c) = (r.getAs[Double]("jaccard"), r.getAs[Double]("containment"))
      assert(c >= j - 1e-9, s"containment $c < jaccard $j")
      assert(c > 0 && c <= 1.0 + 1e-9)
    }
    // the lens exists to catch what Jaccard under-scores
    assert(rows.exists(r =>
      r.getAs[Double]("containment") > r.getAs[Double]("jaccard")))
  }

  test("edit near-dup similarity is consistent and bounded") {
    val rows = graft.operators.Dedup.editNearDup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sim = r.getAs[Double]("edit_sim")
      assert(sim >= 0.6 && sim <= 1.0)
      assert(r.getAs[Long]("lev") >= 0L)
    }
  }

  test("kNN join yields at most k=3 strictly ranked neighbors per vector") {
    val df = graft.operators.Similarity.knnJoin(spark, sf0001)
    val bad = df.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
      .filter(col("n") > 3 || col("maxrk") > 3)
    assert(bad.count() == 0)
    // ranks are dense from 1 and cosine is non-increasing in rank
    val viol = df.as("a").join(df.as("b"),
        col("a.q_id") === col("b.q_id") &&
          col("a.rk") === col("b.rk") - 1)
      .filter(col("a.cosine") < col("b.cosine"))
    assert(viol.count() == 0, "cosine must not increase with rank")
  }

  test("knn bucket width scales with corpus size (linear pair volume)") {
    import graft.operators.Similarity.adaptiveBits
    // floor: every oracle/bench SF (n ≤ 2^8·64 = 16k vectors) hashes with
    // the same 8 bits the static DuckDB oracle uses — r11 parity preserved
    assert(adaptiveBits(500) == 8)     // sf0.01, the oracle SF
    assert(adaptiveBits(2000) == 8)    // sf0.1, the bench SF
    assert(adaptiveBits(16384) == 8)
    // past the floor the expected bucket stays in (32, 64] rows, so the
    // within-bucket pair volume n²/2^bits is ≤ 64·n — linear, the r11
    // verdict's quadratic fan-out (constant 8 bits) is structurally gone
    // (recorded sweep: sf1→sf10 wall-clock 1.11 s → 1.92 s, 1.7× for 10×)
    Seq(100000L, 200000L, 1000000L, 100000000L, 10000000000L).foreach { n =>
      val bits = adaptiveBits(n)
      val bucket = n.toDouble / math.pow(2.0, bits.toDouble)
      assert(bucket <= 64.0 + 1e-6, s"n=$n bits=$bits bucket=$bucket")
      assert(bucket > 32.0 - 1e-6, s"n=$n bits=$bits bucket=$bucket")
    }
    // cap: one axis-aligned hyperplane per dimension is the family's max;
    // the largest Long corpus needs 57 bits (2^57·64 ≈ Long.MaxValue),
    // so the 64 cap is defensive headroom, never binding
    assert(adaptiveBits(Long.MaxValue) == 57)
    // monotone non-decreasing in n
    val pts = Seq(1L, 500L, 32768L, 65536L, 1000000L, Long.MaxValue)
    pts.zip(pts.tail).foreach { case (a, b) =>
      assert(adaptiveBits(a) <= adaptiveBits(b))
    }
  }

  test("semantic dedup partitions every cell into kept + dropped") {
    val rows = graft.operators.Similarity.semDedup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("n_kept") >= 1L,
        "keep-lowest-id must retain at least one member per cell")
    }
    // non-degenerate on this corpus: something is actually dropped
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0)
  }

  test("stratified sample honors rates and keeps the smallest source whole") {
    val rows = graft.operators.TextAnalysis
      .stratifiedSample(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("rate")
      assert(rate > 0 && rate <= 1.0)
    }
    assert(rows.exists(_.getAs[Double]("rate") == 1.0),
      "the min-token source defines the target and must be kept whole")
  }

  test("mixture weights normalize and favor small sources per token") {
    val rows = graft.operators.TextAnalysis
      .mixtureWeights(spark, sf0001).collect()
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    // temperature < 1 ⇒ smallest source gets MORE than proportional share:
    // its effective epoch count exceeds the largest source's
    val byTokens = rows.sortBy(_.getAs[Long]("tokens"))
    assert(byTokens.head.getAs[Double]("effective_epochs") >
      byTokens.last.getAs[Double]("effective_epochs"))
  }

  test("LM buckets tercile the corpus and order by surprisal") {
    val rows = graft.operators.TextAnalysis.lmBuckets(spark, sf0001).collect()
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    val n = byBucket.values.sum
    // percent-rank terciles: each bucket within 1 of n/3
    byBucket.values.foreach(c => assert(math.abs(c - n / 3.0) <= 1.5,
      s"tercile sizes skewed: $byBucket"))
    // head is the predictable (low-surprisal) end
    def wavg(b: String) = {
      val rs = rows.filter(_.getAs[String]("bucket") == b)
      rs.map(r => r.getAs[Double]("avg_surprisal") * r.getAs[Long]("n_docs"))
        .sum / rs.map(_.getAs[Long]("n_docs")).sum
    }
    assert(wavg("head") < wavg("middle") && wavg("middle") < wavg("tail"))
  }

  test("perceptual-hash census finds candidate groups and stays consistent") {
    val r = graft.operators.Multimodal.phashDup(spark, sf0001).collect().head
    val (nImg, nSig, nGrp, nDupImg, maxGrp) = (r.getAs[Long]("n_images"),
      r.getAs[Long]("n_signatures"), r.getAs[Long]("n_dup_groups"),
      r.getAs[Long]("n_dup_images"), r.getAs[Long]("max_group"))
    assert(nSig <= nImg && nDupImg <= nImg)
    assert(nGrp > 0 && nDupImg >= 2 * nGrp, "bands must form candidate groups")
    assert(maxGrp >= 2 && maxGrp <= nDupImg)
    // identical blobs must land in the same band (exact-dup containment)
    import graft.operators.Multimodal.{MediaRow, phashForTest}
    val twin = Seq(
      MediaRow(0L, "the same bytes here".getBytes("UTF-8"), "image/png", 64, 64),
      MediaRow(3L, "the same bytes here".getBytes("UTF-8"), "image/png", 64, 64))
    val sigs = phashForTest(twin)
    assert(sigs.map(_.sig).distinct.size == 1)
  }

  test("IVF probe curve: recall@5 is monotone in probe count") {
    val rows = graft.operators.Similarity.probeCurve(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("probes"))
    assert(rows.map(_.getAs[Long]("probes")).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getAs[Double]("avg_recall_at_5"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as probes widen: ${recalls.toSeq}")
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    rows.foreach(r => assert(r.getAs[Long]("n_queries") > 0))
  }

  test("dedup curve: pairs and drops shrink as the threshold rises") {
    val rows = graft.operators.Dedup.dedupCurve(spark, sf0001)
      .collect().sortBy(_.getAs[Double]("threshold"))
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      Seq(0.3, 0.5, 0.7, 0.9))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"pair count must be non-increasing in the floor: ${pairs.toSeq}")
    rows.foreach(r => assert(
      r.getAs[Long]("n_docs_dropped") <= r.getAs[Long]("n_pairs")))
  }

  test("pack assignment conserves tokens and numbers packs densely") {
    val packs = graft.operators.TextAnalysis.packAssign(spark, sf0001)
      .collect()
    val stats = graft.operators.TextAnalysis.packStats(spark, sf0001)
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("sum_tokens")).toMap
    val bySrc = packs.groupBy(_.getAs[String]("source"))
    assert(bySrc.keySet == stats.keySet)
    bySrc.foreach { case (src, rows) =>
      // every token lands in exactly one pack
      assert(rows.map(_.getAs[Long]("pack_tokens")).sum == stats(src))
      // pack ids are dense from 0 (the tape has no holes)
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq,
        s"$src pack ids not dense: ${ids.toSeq}")
    }
  }

  test("delta-vs-base dedup audits the slice without all-pairs work") {
    val r = graft.operators.Dedup.deltaDedup(spark, sf0001).collect().head
    val (nb, nd) = (r.getAs[Long]("n_base"), r.getAs[Long]("n_delta"))
    assert(nb + nd == 500L, "split must partition the corpus")
    assert(nd > 0 && nd < nb, "delta is the small slice")
    assert(r.getAs[Long]("n_delta_exact_dup") <= nd)
    val near = r.getAs[Long]("n_delta_near_dup")
    assert(near > 0 && near <= nd,
      "this corpus has near-dup pairs crossing the split")
  }

  test("gopher repetition fractions are bounded and the gate flags docs") {
    val rows = graft.operators.TextAnalysis
      .gopherRepetition(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, df) = (r.getAs[Double]("avg_top_frac"),
        r.getAs[Double]("avg_dup_frac"))
      assert(tf >= 0 && tf <= 1.0 && df >= 0 && df <= 1.0)
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
    assert(rows.map(_.getAs[Long]("n_flagged")).sum > 0,
      "gate threshold should flag at least one repetitive doc in the corpus")
  }
}

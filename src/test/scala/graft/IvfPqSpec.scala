package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** IVF-PQ invariants (s_ivfpq_topk / s_ivfpq_recall) — the residual-
  * coded serving index.
  *
  * The residual chain works in integer MICROUNITS end-to-end (exact
  * long distances, centroid means of exact longs), because residuals
  * are exact 6-decimal values and a rounded-6 double AVG of those sits
  * exactly on half-ulp boundaries often enough that engine summation
  * order flips the rounding (see pqLloyd's micro scaladoc). The first
  * test proves the trajectory is parallelism-independent NON-vacuously:
  * caches cleared between settings so both trainings actually run. */
class IvfPqSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("IVF-PQ training and ADC ranking are invariant to partitioning") {
    val s = spark
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      Similarity.clearKmeansCache() // also clears the derived IVF-PQ model
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val top4 = canon(Similarity.ivfpqTopK(s, sf0001))
      Similarity.clearKmeansCache()
      s.conf.set("spark.sql.shuffle.partitions", "37")
      val top37 = canon(Similarity.ivfpqTopK(s, sf0001))
      assert(top4 == top37, "IVF-PQ ADC top-k differs across partitioning")
      assert(top4.nonEmpty)
    } finally {
      Similarity.clearKmeansCache()
      s.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("codes table: one code per (vector, subspace), coarse cell attached") {
    val s = spark
    val (_, codes) = Similarity.ivfpqTrain(s, sf0001)
    val n = graft.model.Tables.embeddings(s, sf0001).count()
    val rows = codes.select("vec_id", "sub", "cell", "ccell").collect()
    assert(rows.length == n * 4, s"${rows.length} codes for $n vectors")
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).distinct.length ==
      rows.length, "duplicate (vec, sub) code")
    assert(rows.forall { r =>
      r.getLong(2) >= 0 && r.getLong(2) < 16 && // PqK codes
        r.getLong(3) >= 0 && r.getLong(3) < 8   // KmK coarse cells
    })
  }

  test("clearing the coarse model invalidates the derived IVF-PQ model") {
    val s = spark
    val (rcent1, _) = Similarity.ivfpqTrain(s, sf0001)
    // same cache entry on a plain re-ask
    val (rcent2, _) = Similarity.ivfpqTrain(s, sfDir = sf0001)
    assert(rcent1 eq rcent2, "cache did not serve the same trained frame")
    // SNAPSHOT before the clear: clearKmeansCache deliberately frees the
    // model's localCheckpoint blocks (leak hygiene, CheckpointHygieneSpec),
    // so a frame handle held across a clear is use-after-free by contract —
    // collecting rcent1 after the clear dies with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (this spec's round-7 failure mode).
    val c1 = canon(rcent1)
    Similarity.clearKmeansCache()
    val (rcent3, _) = Similarity.ivfpqTrain(s, sf0001)
    assert(!(rcent1 eq rcent3),
      "derived IVF-PQ model survived the coarse-model clear")
    // the retrained codebook is bit-identical (deterministic training)
    assert(c1 == canon(rcent3))
  }

  test("recall@5 is well-formed and the compressed index finds neighbors") {
    val r = Similarity.ivfpqRecall(spark, sf0001).collect()
    assert(r.length == 1)
    val recall = r(0).getDouble(1)
    // Floor calibrated on the current testdata via the attribution trio
    // (round-8): s_probe_curve puts the 4-of-8 probe ceiling at 0.78;
    // s_pq_recall puts the code-loss bound (m4_k16 = 16 bits/vector, full
    // corpus scan) at 0.172; IVF-PQ measures 0.176 — the residual coding
    // recovers MORE than the probe pruning costs, so the code budget, not
    // the plumbing, is the binding loss. Random ranking would score
    // ~5/n ≈ 0.005; the 0.1 floor proves the index ranks real neighbors
    // with ~20× margin over noise while tolerating testdata regeneration.
    assert(recall > 0.1 && recall <= 1.0, s"recall@5 = $recall")
    assert(r(0).getLong(2) == 50) // n_queries
  }
}

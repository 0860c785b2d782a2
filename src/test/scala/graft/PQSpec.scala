package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** Product-quantization invariants (s_pq_cells / s_pq_topk / s_pq_recall).
  *
  * The generic partition-invariance gate (DeterminismSpec) reads the
  * SHARED cached model on its second pass, so it cannot see a
  * partitioning-sensitive training bug — the first test here clears the
  * PQ cache between partition settings so BOTH trainings run, proving the
  * per-round rounding discipline makes the whole trajectory (codebooks,
  * codes, ADC ranking) parallelism-independent, which is the contract
  * that lets the same job run on 4 cores or 1000 executors. */
class PQSpec extends SparkSuite {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("PQ training and ADC ranking are invariant to shuffle partitioning") {
    val s = spark
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      Similarity.clearPqCache()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val cells4 = canon(Similarity.pqCells(s, sf0001))
      val top4 = canon(Similarity.pqAdcTopK(s, sf0001))
      Similarity.clearPqCache()
      s.conf.set("spark.sql.shuffle.partitions", "37")
      val cells37 = canon(Similarity.pqCells(s, sf0001))
      val top37 = canon(Similarity.pqAdcTopK(s, sf0001))
      assert(cells4 == cells37, "PQ training differs across partition counts")
      assert(top4 == top37, "ADC top-k differs across partition counts")
      assert(cells4.nonEmpty && top4.nonEmpty)
    } finally {
      Similarity.clearPqCache()
      s.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("codebook census covers the corpus: 4 codes per vector, cells seeded") {
    val s = spark
    val cells = Similarity.pqCells(s, sf0001).collect()
    // every (sub, cell) is one of the 4 subspaces x 16 seed-derived cells
    assert(cells.forall { r =>
      val sub = r.getInt(0); val cell = r.getLong(1)
      sub >= 0 && sub < 4 && cell >= 0 && cell < 16
    })
    assert(cells.forall(_.getDouble(3) >= 0.0)) // sq_err is a sum of squares
    // each vector contributes exactly one code per subspace, so per-sub
    // membership sums to the corpus size (nrm>0 vectors)
    val n = graft.model.Tables.embeddings(s, sf0001).count()
    val perSub = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perSub.values.toSet == Set(n),
      s"per-subspace memberships $perSub do not all equal corpus size $n")
  }

  test("ADC top-5 is exactly 5 per query, rank-ordered by (adc, neighbor)") {
    val rows = Similarity.pqAdcTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val perQ = rows.groupBy(_._1)
    assert(perQ.size == 50)
    perQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q has ${rs.length} neighbors")
      assert(rs.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val byRank = rs.sortBy(_._4)
      // adc non-decreasing with rank; ties broken by ascending neighbor id
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2),
          s"query $q rank order violated: $a then $b")
      }
      assert(rs.forall(_._2 != q), s"query $q returned itself")
    }
  }

  test("recall@5 is a valid probability over all 50 queries") {
    val r = Similarity.pqRecall(spark, sf0001).collect()
    assert(r.length == 1)
    val recall = r(0).getDouble(1)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(r(0).getLong(2) == 50L)
    assert(r(0).getString(0) == "pq_m4_k16")
  }
}

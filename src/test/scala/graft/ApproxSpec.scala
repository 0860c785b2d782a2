package graft

/** HLL approximate-distinct quality: the query itself computes the
  * estimate-vs-exact relative error and emits `within_bound`
  * (≤ 3×rsd = 15%, deterministic-safe; typical error is far lower) —
  * the same boolean the DuckDB oracle asserts TRUE. */
class ApproxSpec extends SparkSuite {

  test("approx_count_distinct within error bound of exact") {
    val rows = graft.operators.Analytics.approxDistinct(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") > 0)
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("event_type")}: estimate outside 15% of exact")
    }
  }
}

package graft

/** HLL approximate-distinct quality: the estimate stays within the
  * configured relative standard deviation of the exact count (asserted at
  * 3×rsd = 15% to keep the test deterministic-safe; typical error is
  * far lower). */
class ApproxSpec extends SparkSuite {

  test("approx_count_distinct within error bound of exact") {
    val rows = graft.operators.Analytics.approxDistinct(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.15,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact relErr=$relErr")
    }
  }
}

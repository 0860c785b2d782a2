package graft

/** Every registered operator query runs at sf0.001 and yields a readable,
  * non-degenerate result (value-level correctness is the driver's DuckDB
  * gate; this catches runtime regressions fast). */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      df.count() // forces execution; throws on any runtime error
    }
  }
}

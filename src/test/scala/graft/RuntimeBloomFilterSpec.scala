package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Runtime bloom-filter injection — the NON-partition-column sibling of
  * the `src_events_dpp` plan gate. DPP prunes a partitioned fact scan
  * through a dim join on the PARTITION column; on any other join key the
  * 100-TB lever is Catalyst's InjectRuntimeFilter: the selective dim side
  * builds a bloom filter at runtime and the fact scan applies
  * `might_contain` BEFORE the join's shuffle, so the exchange carries only
  * rows that can match (the explicit, oracle-checked form of the same idea
  * is `d_bloom_contam`, Dedup.scala — this spec proves the OPTIMIZER path
  * fires under the confs a production deployment runs).
  *
  * Thresholds: injection requires the application-side scan to exceed
  * `applicationSideScanSizeThreshold` (default 10 GB — sized for real
  * clusters, so test-SF parquet needs it lowered) and a selective filter
  * on the creation side. Values are conf-independent (the bloom only
  * prunes rows the join would drop), so the gate-SF oracle for the same
  * join shape needs no conf overrides. */
class RuntimeBloomFilterSpec extends SparkSuite {

  test("InjectRuntimeFilter plants might_contain on the fact side of a selective dim join") {
    val s = spark
    val confs = Seq(
      // fact side is tiny at test SF; production default is 10 GB
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the fact-fact (shuffle) join shape a 100-TB run gets —
      // a broadcast join needs no runtime filter (the broadcast IS one)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val dim = Tables.orders(s, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val fact = Tables.lineitem(s, sf0001)
        .select("l_orderkey", "l_extendedprice")
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))

      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        s"expected InjectRuntimeFilter to plant a bloom probe, got:\n$optimized")
      // the probe must sit on the APPLICATION (lineitem) side, keyed by the
      // join key — i.e. above the lineitem relation, not the orders one
      val factSide = optimized.linesIterator
        .find(_.toLowerCase.contains("might_contain"))
        .getOrElse("")
      assert(factSide.contains("l_orderkey"),
        s"bloom probe should test the fact join key, got: $factSide")
      // and the rewrite must not change results: same numbers as the
      // un-filtered plan shape (bloom false positives are re-checked by
      // the join itself)
      val rows = q.collect()
      assert(rows.length == 1 && rows.head.getString(0) == "1-URGENT")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}

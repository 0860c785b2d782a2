package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Shuffle-free co-located joins via bucketing — the storage-layout lever
  * for repeated fact-fact joins at 100 TB: both tables bucketed by the
  * join key join with ZERO Exchange in the plan (each bucket pair joins
  * locally). Verified by inspecting the physical plan. */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed orders ⋈ lineitem plans without a shuffle") {
    val s = spark
    val wh = Files.createTempDirectory("graft-buckets").toString
    // disable auto-broadcast: at real scale both sides are too big to
    // broadcast — force the plan shape a fact-fact join would get
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables.orders(s, sf0001).select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_orders").saveAsTable("b_orders")
      Tables.lineitem(s, sf0001).select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

      val joined = s.table("b_orders").join(s.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))

      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the join itself needs no Exchange (the only exchange
      // allowed is the one introduced by the final groupBy if its key
      // doesn't line up — here it bucket-aligns too, so expect none)
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and it is a sort-merge join over the bucketed sort order
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("src_bucketed_join: only the final 16-group summary shuffles") {
    val df = graft.sources.BucketedTables.bucketedJoin(spark, sf0001)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    // AdaptiveSparkPlanExec is a leaf to collect — unwrap it (the
    // PlanQualitySpec discipline) or the gate silently asserts nothing
    def shufflesOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectWithSubqueries {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shufflesOf(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shufflesOf(s.plan)
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          Seq(e)
      }.flatten
    val shuffles = shufflesOf(plan)
    assert(shuffles.size == 1,
      s"expected exactly one shuffle (the bucket summary), got ${shuffles.size}:\n$plan")
    // the shuffle carries 16-group partials, never the joined fact rows
    assert(shuffles.head.toString.contains("bucket"),
      s"the one shuffle should be the bucket summary:\n${shuffles.head}")
    assert(plan.toString.contains("SortMergeJoin"),
      s"bucketed fact-fact join should sort-merge:\n$plan")
  }

  test("bucket count is sized from source bytes, floored for test SFs") {
    import graft.sources.BucketedTables.bucketCountForBytes
    // test-SF corpora (≤ a few hundred MB) keep the deterministic floor
    assert(bucketCountForBytes(0L) == 8)
    assert(bucketCountForBytes(300L << 20) == 8)
    // a 10× corpus widens past the floor: ~1.4 GB of source → ~30 buckets,
    // so the bucket-local serving join is no longer capped at 8 tasks
    assert(bucketCountForBytes(1400L << 20) > 16)
    // growth is linear in bytes (≈ bytes / 48 MB)…
    assert(bucketCountForBytes(4800L << 20) == 100)
    // …and capped so a pathological input can't mint millions of files
    assert(bucketCountForBytes(Long.MaxValue) == 4096)
    // the live path floors at the gate SF (layout determinism for the
    // plan specs above)
    assert(graft.sources.BucketedTables.bucketCount(sf0001) == 8)
  }

  test("regenerated source parquet rebuilds the bucketed copies") {
    // the ensure() cache keys on the source fingerprint (IvfLayout
    // pattern): rewriting orders/lineitem under the same dir must rebuild
    // the layout, not serve buckets of the old bytes while the oracle
    // reads the new parquet
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-bucket-stale")
    dir.toFile.deleteOnExit()
    def write(price: Double): Unit = {
      Seq((1L, "1-URGENT"), (2L, "2-HIGH"))
        .toDF("o_orderkey", "o_orderpriority")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Seq((1L, price), (2L, price))
        .toDF("l_orderkey", "l_extendedprice")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    def revenue(): Double =
      graft.sources.BucketedTables.bucketedJoin(s, dir.toString)
        .agg(sum(col("revenue"))).head().getDouble(0)
    write(10.0)
    assert(revenue() == 20.0)
    write(35.0)
    assert(revenue() == 70.0,
      "stale bucketed layout served after the source parquet was regenerated")
  }
}

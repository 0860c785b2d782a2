package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.model.Tables

/** The explicit hot-key-split join: semantics must equal the plain join
  * (the split is an execution detail), and the hot path must actually be
  * a broadcast join so hot keys never enter an exchange. */
class SkewJoinSpec extends SparkSuite {

  private def unwrap(p: SparkPlan): Seq[SparkPlan] = unwrapPlan(p)

  test("agrees with the plain join formulation") {
    val split = graft.operators.Analytics.skewJoin(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val ev = Tables.events(spark, sf0001).select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(cust, Seq("user_id"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(split.nonEmpty)
    assert(split == plain)
  }

  test("hot fact rows take a broadcast join, never a shuffled one") {
    val df = graft.operators.Analytics.skewJoin(spark, sf0001)
    df.collect()
    val nodes = unwrap(df.queryExecution.executedPlan)
    val bhj = nodes.count(_.nodeName.contains("BroadcastHashJoin"))
    // three broadcast sites minimum: the semi split, the anti split, and
    // the hot-path join against the broadcast dim slice
    assert(bhj >= 3, s"expected >=3 broadcast joins, found $bhj")
  }

  test("hot and cold paths partition the fact rows exactly") {
    val ev = Tables.events(spark, sf0001).select(col("user_id"))
    val hot = ev.groupBy(col("user_id")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("user_id")).limit(16).select("user_id")
    val nHot = ev.join(broadcast(hot), Seq("user_id"), "left_semi").count()
    val nCold = ev.join(broadcast(hot), Seq("user_id"), "left_anti").count()
    assert(nHot > 0)
    assert(nHot + nCold == ev.count())
  }
}

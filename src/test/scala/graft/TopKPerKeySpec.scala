package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.plans.{TopK, TopKPerKey, TopKPerKeyExec}

/** The custom whole-operator extension (logical node → strategy → two
  * bounded-heap exec stages): exact agreement with the window-rank
  * formulation, the partial→exchange→final plan shape, shuffle-volume
  * reduction, the key-filter pushdown rule, and edge cases. */
class TopKPerKeySpec extends SparkSuite {

  private def unwrap(p: SparkPlan): Seq[SparkPlan] = unwrapPlan(p)

  test("agrees exactly with the row_number window formulation") {
    val custom = graft.operators.Analytics.topKCustom(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val window = graft.operators.Analytics.windowTopK(spark, sf0001)
      .drop("rk").collect().map(_.toString).sorted.toSeq
    assert(custom.nonEmpty)
    assert(custom == window)
  }

  test("plans partial heap -> exchange -> final heap, no sort, no window") {
    val df = graft.operators.Analytics.topKCustom(spark, sf0001)
    df.collect()
    val nodes = unwrap(df.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.partial).sorted == Seq(false, true),
      s"expected one partial and one final TopKPerKeyExec, got $topks")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "expected exactly one exchange (between partial and final)")
    val names = nodes.map(_.nodeName)
    assert(!names.exists(_.contains("Sort")), s"no sort should appear: $names")
    assert(!names.exists(_.contains("Window")), s"no window should appear: $names")
  }

  test("the exchange carries only heap-pruned rows, not the table") {
    val df = graft.operators.Analytics.topKCustom(spark, sf0001)
    df.collect()
    val shuffles = unwrap(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    val written = shuffles.flatMap(_.metrics.collectFirst {
      case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
    }).sum
    val tableRows = Tables.lineitem(spark, sf0001).count()
    assert(written > 0)
    assert(written < tableRows / 10,
      s"partial stage should prune the shuffle: wrote $written of $tableRows")
  }

  test("key-only filters push through the operator to the scan") {
    val base = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val someKey = base.select(col("l_suppkey")).head.getLong(0)
    val filtered = TopK.perKey(base, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true),
          ("l_linenumber", true)), 3)
      .filter(col("l_suppkey") === someKey)
    // the PushFilterThroughTopK rule moves the key predicate below the
    // node, where the scan picks it up as a pushed filter
    val optimized = filtered.queryExecution.optimizedPlan
    val filterAboveTopK = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.collect { case t: TopKPerKey => t }.nonEmpty => f
    }
    assert(filterAboveTopK.isEmpty,
      s"key filter should sit below TopKPerKey:\n$optimized")
    assert(filtered.queryExecution.executedPlan.toString
        .contains(s"EqualTo(l_suppkey,$someKey)"),
      "key predicate should reach the parquet scan as a pushed filter")
    // and semantics are unchanged: filter-before == filter-after for keys
    val pre = TopK.perKey(base.filter(col("l_suppkey") === someKey),
      Seq("l_suppkey"), Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), 3).collect().map(_.toString).sorted.toSeq
    assert(filtered.collect().map(_.toString).sorted.toSeq == pre)
    assert(pre.size == 3)
  }

  test("non-key filters do NOT move below the operator") {
    val base = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val topk = TopK.perKey(base, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true),
        ("l_linenumber", true)), 3)
    val cutoff = 2000.0
    val filtered = topk.filter(col("l_extendedprice") > cutoff)
    val filterAboveTopK = filtered.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.collect { case t: TopKPerKey => t }.nonEmpty => f
    }
    assert(filterAboveTopK.nonEmpty,
      "a value filter must stay above TopKPerKey (the semantics differ)")
    // semantic check: top-3-then-filter keeps a subset of the top-3 rows,
    // filter-then-top-3 could promote rows from below the cutoff's top 3
    val expected = topk.collect().filter(_.getDouble(3) > cutoff)
      .map(_.toString).sorted.toSeq
    assert(filtered.collect().map(_.toString).sorted.toSeq == expected)
  }

  test("sorted final stage: sort sits on the pruned stream, result identical") {
    val base = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val spec = Seq(("l_extendedprice", false), ("l_orderkey", true),
      ("l_linenumber", true))
    val sorted = TopK.perKey(base, Seq("l_suppkey"), spec, 3,
      sortedFinal = true)
    val heap = TopK.perKey(base, Seq("l_suppkey"), spec, 3)
    assert(sorted.collect().map(_.toString).sorted.toSeq ==
      heap.collect().map(_.toString).sorted.toSeq)
    val nodes = unwrap(sorted.queryExecution.executedPlan)
    val iSort = nodes.indexWhere(_.nodeName.contains("Sort"))
    val iExchange = nodes.indexWhere(_.isInstanceOf[ShuffleExchangeExec])
    val iPartial = nodes.indexWhere {
      case t: TopKPerKeyExec => t.partial
      case _ => false
    }
    // top-down collect order: final topk < sort < exchange < partial topk —
    // i.e. the sort orders only the heap-pruned exchange output
    assert(iSort >= 0 && iExchange >= 0 && iPartial >= 0)
    assert(iSort < iExchange && iExchange < iPartial,
      s"sort must sit between the exchange and the final stage: $nodes")
  }

  test("projection above the operator prunes the scan to needed columns") {
    // top-k over the FULL 16-column lineitem, then a 2-column projection:
    // PruneColumnsThroughTopK must shrink the scan to projected ∪ key ∪
    // order columns — without it the opaque node pins all 16 alive
    val full = Tables.lineitem(spark, sf0001)
    val projected = TopK.perKey(full, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true),
          ("l_linenumber", true)), 3)
      .select(col("l_suppkey"), col("l_extendedprice"))
    val scans = unwrap(projected.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.requiredSchema.map(_.name).toSet ==
      Set("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
      s"scan should read 4 of 16 columns, got ${scans.head.requiredSchema}")
    assert(projected.collect().length ==
      graft.operators.Analytics.topKCustom(spark, sf0001).collect().length)
  }

  test("k >= group size returns whole groups; empty input returns empty") {
    import spark.implicits._
    val tiny = Seq((1L, 10.0, 1L), (1L, 20.0, 2L), (2L, 5.0, 3L))
      .toDF("key", "v", "tie")
    val all = TopK.perKey(tiny, Seq("key"), Seq(("v", false), ("tie", true)), 10)
    assert(all.count() == 3)
    val empty = TopK.perKey(tiny.filter($"key" < 0), Seq("key"),
      Seq(("v", false), ("tie", true)), 2)
    assert(empty.count() == 0)
  }

  test("multi-column keys and ascending order work") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 5.0, 1L), ("a", 1, 3.0, 2L), ("a", 1, 4.0, 3L),
      ("a", 2, 9.0, 4L), ("b", 1, 7.0, 5L), ("b", 1, 8.0, 6L))
      .toDF("k1", "k2", "v", "tie")
    val got = TopK.perKey(df, Seq("k1", "k2"), Seq(("v", true), ("tie", true)), 2)
      .select("k1", "k2", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    assert(got == Seq(("a", 1, 3.0), ("a", 1, 4.0), ("a", 2, 9.0),
      ("b", 1, 7.0), ("b", 1, 8.0)))
  }

  test("ensurePlanner never double-registers on an extensions session") {
    // the suite session carries TopKStrategy via GraftExtensions'
    // injectPlannerStrategy: repeated TopK.perKey calls must not stack
    // copies into experimental.extraStrategies
    val before = spark.experimental.extraStrategies
      .count(_ == graft.plans.TopKStrategy)
    TopK.ensurePlanner(spark)
    TopK.ensurePlanner(spark)
    val after = spark.experimental.extraStrategies
      .count(_ == graft.plans.TopKStrategy)
    assert(after == before,
      s"extension session gained $after experimental copies (had $before)")
  }

  test("null keys group together; null order values match window semantics") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq[(Option[Long], Option[Double], Long)](
      (Some(1L), Some(5.0), 1L), (Some(1L), None, 2L),
      (None, Some(7.0), 3L), (None, None, 4L), (None, Some(1.0), 6L),
      (Some(1L), Some(2.0), 5L))
      .toDF("key", "v", "tie")
    val custom = TopK.perKey(df, Seq("key"), Seq(("v", false), ("tie", true)), 2)
      .collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy(col("key"))
      .orderBy(col("v").desc, col("tie"))
    val window = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).drop("rk")
      .collect().map(_.toString).sorted.toSeq
    assert(custom == window)
    assert(custom.size == 4, "two groups (null key and key 1) of two rows")
  }

  test("results are invariant to input partitioning") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i % 7L, (i * 37 % 101).toDouble, i.toLong))
    def run(parts: Int): Seq[String] =
      TopK.perKey(rows.toDF("key", "v", "tie").repartition(parts),
        Seq("key"), Seq(("v", false), ("tie", true)), 5)
        .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
    assert(run(1).size == 35)
  }

  test("empty keys and empty order are rejected at construction") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 3L)).toDF("key", "v", "tie")
    // an empty order would silently keep whichever k rows arrived first —
    // the node's determinism contract forbids it, so it must throw, not
    // degrade
    val e1 = intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq("key"), Seq.empty, 1)
    }
    assert(e1.getMessage.contains("order"))
    val e2 = intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq.empty, Seq(("v", false)), 1)
    }
    assert(e2.getMessage.contains("key"))
  }

  test("duplicate column names are ambiguous, not first-match") {
    import spark.implicits._
    val a = Seq((1L, 5.0)).toDF("id", "v")
    val b = Seq((1L, 7.0)).toDF("id", "w")
    // the join output carries BOTH sides' `id` — binding either one
    // silently would group on an arbitrary column
    val joined = a.join(b, a("id") === b("id"))
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(joined, Seq("id"), Seq(("v", false)), 1)
    }
    assert(e.getMessage.contains("ambiguous"))
  }
}

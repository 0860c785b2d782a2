package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.Shim

/** Whole-operator Catalyst extension: exact top-k rows per key WITHOUT a
  * per-key sort of the full input.
  *
  * The window formulation (`row_number() OVER (PARTITION BY key ORDER BY v)
  * <= k`, SURVEY §2.4 ordering/limits + `Analytics.windowTopK`) shuffles the
  * ENTIRE table on the key and then sorts every group end-to-end, only to
  * throw away everything past rank k. At 100 TB that is a full-data shuffle
  * plus a full-data sort. This operator is the map-side-combine formulation:
  *
  *   partial stage (any distribution): one bounded heap of size k per key
  *     per input partition — at most `inputPartitions × keysPerPartition × k`
  *     rows survive, and only THOSE shuffle;
  *   exchange on the key (inserted by EnsureRequirements from the final
  *     stage's ClusteredDistribution requirement);
  *   final stage: the same bounded-heap pass per key, now exact because all
  *     surviving rows of a key are co-located.
  *
  * Both stages stream their input; memory is O(keys-in-partition × k), the
  * same bound as the operator's own output, never O(rows). The partial stage
  * additionally caps its hash map at `MaxPartialKeys` keys and passes rows of
  * further keys straight through (correct — the final stage is exact — so a
  * pathological keys≈rows input degrades to the plain shuffle, never to OOM;
  * the same posture as HashAggregate's sort-based fallback).
  *
  * Ties are impossible by contract: callers supply a total (unique) order —
  * same discipline as every other deterministic query in this repo.
  *
  * This is the architecture path (c) of the build brief: custom
  * `LogicalPlan` + `Rule` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` (GraftExtensions) and self-installing via
  * `spark.experimental.extraStrategies` for sessions built without it.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxPartialKeys: Int,
    sortedFinal: Boolean,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxPartialKeys > 0, s"maxPartialKeys must be positive")
  require(keys.nonEmpty, "TopKPerKey requires at least one key expression")
  // an empty order would silently degrade to arbitrary-k-per-key — the
  // heaps would keep whichever k rows arrived first — violating the
  // operator's tie-free determinism contract; refuse at construction
  require(order.nonEmpty, "TopKPerKey requires a non-empty ordering " +
    "(an empty order selects arbitrary rows per key)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node as partial-heap → (exchange) → final stage.
  * Two final-stage forms, both exact:
  *  - heap (default): hash map of per-key heaps, memory O(keys-in-partition
  *    × k) — no sort anywhere;
  *  - sorted (`sortedFinal`): declares requiredChildOrdering (keys ++
  *    order), so EnsureRequirements plants a spillable SortExec over the
  *    PRUNED exchange output (≤ partitions × keys × k rows — never the
  *    table); groups then arrive contiguous and already ordered, and the
  *    final stage just forwards the first k rows of each group in O(1)
  *    memory. The right form when keys-per-reducer × k itself strains
  *    memory. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, cap, sortedFinal, child) =>
      TopKPerKeyExec(keys, order, k, partial = false, cap, sortedFinal,
        TopKPerKeyExec(keys, order, k, partial = true, cap,
          sortedFinal = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Deterministic filters that touch ONLY key columns select or drop whole
  * key groups, so they commute with per-key top-k — push them below the
  * operator where Catalyst can carry them further down to the scan
  * (PushedFilters). Non-key predicates must NOT move: filter-then-topk and
  * topk-then-filter differ for them, and Catalyst's builtin pushdown rules
  * correctly refuse to look through an unknown node.
  *
  * Fires only when every key is a bare Attribute: for an expression-valued
  * key (e.g. `a % 10`), a predicate on `a` is NOT constant within a key
  * group, so pushing it would change which rows rank — reference-subset
  * alone is an unsound test there. */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerKey)
        if cond.deterministic &&
          t.keys.forall(_.isInstanceOf[Attribute]) &&
          f.references.subsetOf(AttributeSet(t.keys)) =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Column pruning through the opaque node: TopKPerKey's row selection
  * depends only on its key/order columns, so a Project above it needs the
  * child to produce just (projected ∪ key ∪ order) attributes — without
  * this rule Catalyst must conservatively keep EVERY child column alive
  * and the scan reads the full wide table. Fixed point: once the child is
  * the pruned Project, `needed` equals the child output and the rule no
  * longer fires. */
object PruneColumnsThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, t: TopKPerKey) =>
      val keep = p.references ++ t.references
      val needed = t.child.output.filter(keep.contains)
      if (needed.length < t.child.output.length) {
        p.copy(child = t.copy(child = Project(needed, t.child)))
      } else p
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialKeys: Int,
    sortedFinal: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (sortedFinal) Seq(keys.map(SortOrder(_, Ascending)) ++ order)
    else Seq(Nil)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "heapKeys" -> SQLMetrics.createMetric(sparkContext,
      "distinct keys heaped"),
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through at key cap"))

  override protected def doExecute(): RDD[InternalRow] = {
    val attrs = child.output
    val keyExprs = keys
    val orderExprs = order
    val kk = k
    val cap = if (partial) maxPartialKeys else Int.MaxValue
    val numOut = longMetric("numOutputRows")
    val numKeys = longMetric("heapKeys")
    val numPass = longMetric("passThroughRows")
    if (sortedFinal) {
      // input arrives clustered AND ordered by (keys, order): each group's
      // first k rows are its exact top-k — forward them, skip the rest.
      // O(1) memory (one saved key), zero copies of skipped rows.
      return child.execute().mapPartitions({ iter =>
        val toUnsafe = UnsafeProjection.create(attrs, attrs)
        val keyProj = UnsafeProjection.create(keyExprs, attrs)
        var curKey: UnsafeRow = null
        var emitted = 0
        iter.flatMap { row =>
          val u = toUnsafe(row)
          val key = keyProj(u)
          if (curKey == null || key != curKey) {
            curKey = key.copy()
            emitted = 0
            numKeys.add(1)
          }
          if (emitted < kk) {
            emitted += 1
            numOut.add(1)
            Some(u)
          } else None
        }
      }, preservesPartitioning = true)
    }
    child.execute().mapPartitions({ iter =>
      val toUnsafe = UnsafeProjection.create(attrs, attrs)
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      val cmp = GenerateOrdering.generate(orderExprs, attrs)
      // PriorityQueue dequeues the MAX per this ordering = the row sorting
      // LAST under `order` = the current worst of the kept k.
      val rowOrd = new Ordering[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(a, b)
      }
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      // Streams: rows of capped-out keys are emitted immediately (partial
      // stage only); kept rows drain from the heaps after input exhausts
      // (`++` evaluates its right side lazily).
      val overflow = iter.flatMap { row =>
        val u = toUnsafe(row)
        heaps.get(keyProj(u)) match {
          case Some(pq) =>
            if (pq.size < kk) pq.enqueue(u.copy())
            else if (rowOrd.compare(u, pq.head) < 0) {
              pq.dequeue(); pq.enqueue(u.copy())
            }
            None
          case None if heaps.size < cap =>
            val pq = mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
            pq.enqueue(u.copy())
            heaps.put(keyProj(u).copy(), pq)
            numKeys.add(1)
            None
          case None => // cap hit: pass through, final stage is exact
            numPass.add(1)
            Some(u)
        }
      }
      (overflow ++ heaps.valuesIterator.flatMap(_.iterator)).map { r =>
        numOut.add(1); r
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Partial-stage key cap: bounds the per-task hash map at ~2M keys × k
    * row copies; beyond it the stage degrades to pass-through, never OOM. */
  val MaxPartialKeys: Int = 1 << 21
}

/** Column-API entry point (mirrors GraftFunctions): resolves names against
  * the frame, installs the planner strategy if the session lacks it. */
object TopK {
  /** Top-`k` rows per `keyCols` group, first-k under `orderSpec`
    * ((column, ascending) pairs — supply a unique total order).
    * `maxPartialKeys` bounds the partial stage's per-task hash map
    * (beyond it rows pass through unpruned; the final stage stays
    * exact) — the default suits production, tests shrink it to force
    * the pass-through path. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int,
      maxPartialKeys: Int = TopKPerKeyExec.MaxPartialKeys,
      sortedFinal: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    ensurePlanner(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not among ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          // first-match here would silently bind one of the duplicates —
          // e.g. after a join that carried both sides' `id` — and rank or
          // group on the wrong column with no error
          s"column $n is ambiguous: ${many.size} attributes share the name " +
            s"(${many.map(_.qualifiedName).mkString(", ")}); " +
            "rename with toDF/alias before TopK.perKey")
      }
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Shim.ofRows(spark, TopKPerKey(keyCols.map(attr), order, k,
      maxPartialKeys, sortedFinal, plan))
  }

  /** Idempotent: GraftExtensions injects TopKStrategy at session build; for
    * sessions built without the extension this adds it on first use. The
    * planner's full strategy list is consulted (not just the experimental
    * slot) so extension-built sessions don't accumulate a second copy. */
  def ensurePlanner(spark: SparkSession): Unit = synchronized {
    if (!Shim.plannerStrategies(spark).contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        TopKStrategy +: spark.experimental.extraStrategies
    }
  }
}

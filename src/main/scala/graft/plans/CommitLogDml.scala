package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.Shim

import graft.sources.CommitLogTable
import graft.streaming.CommitLogIngest

/** SQL `UPDATE` and `MERGE INTO` for commit-log tables (VERDICT r10 task
  * 4) — the session-extensions route: Spark 4 analyzes both statements
  * fully and only fails at PHYSICAL planning for tables without
  * `SupportsRowLevelOperations` (`BasicOperators` throws
  * UNSUPPORTED_FEATURE.TABLE_OPERATION), so an injected strategy that
  * matches first routes them onto the existing copy-on-write engines:
  *
  *  - `UPDATE t SET c = e WHERE p` → [[CommitLogIngest.updateWhere]],
  *    with the resolved condition/value expressions re-anchored BY NAME
  *    against the table snapshot (any Catalyst expression translates;
  *    subqueries are refused loudly);
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
  *    WHEN NOT MATCHED THEN INSERT *` → [[CommitLogIngest.mergeByKey]].
  *    The upsert SHAPE is the contract: a single key equality, star (or
  *    star-expanded name-aligned) actions, no action conditions, no
  *    NOT MATCHED BY SOURCE — anything else fails loudly BEFORE any
  *    mutation, never silently approximated.
  *
  * Both statements are Commands, so `spark.sql(...)` executes them
  * eagerly; each lands as ONE atomic log version with identical results
  * to the API calls (CommitLogSqlSpec pins the equivalence). */
object CommitLogDmlStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u @ UpdateTable(TableRelation(t), assignments, condition)
        if u.resolved =>
      // translate AT PLANNING: an untranslatable statement (subquery,
      // non-column assignment target) fails here, before any mutation —
      // and the exec node carries only Columns, which Spark's physical
      // subquery/canonicalization machinery never rewrites
      val set = assignments.filterNot(DmlTranslate.isIdentity)
        .map(a => DmlTranslate.keyName(a.key) ->
          DmlTranslate.toColumn(a.value)).toMap
      require(set.nonEmpty, "graft-commitlog UPDATE: no column changes")
      val pred = condition.map(DmlTranslate.toColumn).getOrElse(lit(true))
      CommitLogUpdateExec(t.dir, set, pred) :: Nil
    case m @ MergeIntoTable(TableRelation(t), source, cond, matched,
        notMatched, notMatchedBySource, withSchemaEvolution)
        if m.resolved =>
      require(notMatchedBySource.isEmpty,
        "graft-commitlog MERGE: WHEN NOT MATCHED BY SOURCE is not " +
          "supported (the engine's merge is an upsert — rebuild with " +
          "deleteWhere + mergeByKey for source-driven deletes)")
      require(!withSchemaEvolution,
        "graft-commitlog MERGE: WITH SCHEMA EVOLUTION is not supported " +
          "through SQL (wider updates evolve the schema through " +
          "mergeByKey directly)")
      val (updates, key) =
        MergeTranslate.upsertOf(source, cond, matched, notMatched)
      CommitLogMergeExec(t.dir, updates, key) :: Nil
    case _ => Nil
  }

  /** The commit-log table under any alias wrapping — before OR after the
    * optimizer's scan pushdown (which rewrites `DataSourceV2Relation`
    * into `DataSourceV2ScanRelation`; the planner sees the latter). */
  private object TableRelation {
    def unapply(plan: LogicalPlan): Option[CommitLogTable] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case r: DataSourceV2Relation => r.table match {
        case t: CommitLogTable => Some(t)
        case _ => None
      }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table match {
          case t: CommitLogTable => Some(t)
          case _ => None
        }
      case _ => None
    }
  }
}

private[plans] object DmlTranslate {

  /** Re-anchor a RESOLVED expression by NAME so it evaluates against the
    * fresh snapshot frame the copy-on-write engines read. Subqueries
    * cannot re-anchor — refused loudly. */
  def toColumn(e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft-commitlog DML: subqueries are not supported in this " +
        s"clause: $e")
    Shim.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** An assignment that sets a column to ITSELF (alignment padding from
    * the analyzer) — dropped, so only real mutations rewrite. */
  def isIdentity(a: Assignment): Boolean = (a.key, a.value) match {
    case (k: AttributeReference, v: AttributeReference) =>
      k.exprId == v.exprId
    case _ => false
  }

  def keyName(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"graft-commitlog DML: can only assign top-level columns, got $other")
  }
}

/** Eagerly-executed physical node for SQL UPDATE (Commands run via
  * executeCollect in QueryExecution's eager command path). Carries only
  * name-anchored Columns — never raw plan Expressions. */
case class CommitLogUpdateExec(dir: String, set: Map[String, Column],
    pred: Column) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val sideEffect: Array[InternalRow] = {
    CommitLogIngest.updateWhere(SparkSession.active, dir, pred, set,
      statsCol = CommitLogIngest.indexedCol(dir))
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = sideEffect

  override protected def doExecute(): RDD[InternalRow] = {
    sideEffect
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
}

/** MERGE → upsert translation, run AT PLANNING so any non-upsert shape
  * fails before a single byte mutates. */
private[plans] object MergeTranslate {

  private def refuse(why: String): Nothing =
    throw new UnsupportedOperationException(
      "graft-commitlog MERGE supports the upsert shape only (ON t.k = " +
        "s.k, WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN " +
        s"INSERT *): $why")

  /** A star action, or its analyzer-expanded form: unconditional, every
    * assignment keyed by a target column with a value computed from the
    * SOURCE side only (the expansion wraps width-adjusting casts around
    * the source attributes). Returns the per-target-column projection,
    * None for an unexpanded star (= raw source row). */
  private def starProjection(a: MergeAction,
      sourceAttrs: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[Option[Seq[Assignment]]] = a match {
    case UpdateStarAction(None) | InsertStarAction(None) => Some(None)
    case UpdateAction(None, assigns, _)
        if assigns.forall(fromSource(_, sourceAttrs)) =>
      Some(Some(assigns))
    case InsertAction(None, assigns)
        if assigns.forall(fromSource(_, sourceAttrs)) =>
      Some(Some(assigns))
    case _ => None
  }

  private def fromSource(a: Assignment,
      sourceAttrs: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Boolean =
    a.key.isInstanceOf[AttributeReference] &&
      a.value.references.subsetOf(sourceAttrs)

  /** The (updates frame, key) pair [[CommitLogIngest.mergeByKey]] runs
    * with, or a loud refusal. */
  def upsertOf(source: LogicalPlan, mergeCondition: Expression,
      matched: Seq[MergeAction], notMatched: Seq[MergeAction])
      : (org.apache.spark.sql.DataFrame, String) = {
    val spark = SparkSession.active
    val sourceAttrs = source.outputSet
    val matchedProj = matched match {
      case Seq(one) => starProjection(one, sourceAttrs)
        .getOrElse(refuse(s"matched actions: $matched"))
      case _ => refuse(s"matched actions: $matched")
    }
    val insertProj = notMatched match {
      case Seq(one) => starProjection(one, sourceAttrs)
        .getOrElse(refuse(s"not-matched actions: $notMatched"))
      case _ => refuse(s"not-matched actions: $notMatched")
    }
    // both actions must write the SAME row (the upsert contract: one
    // updates frame replaces matched keys and inserts new ones)
    def canon(p: Option[Seq[Assignment]]): Option[Seq[(String, Expression)]] =
      p.map(_.map(a =>
        DmlTranslate.keyName(a.key) -> a.value.canonicalized)
        .sortBy(_._1))
    if (canon(matchedProj) != canon(insertProj))
      refuse("matched and not-matched actions write different rows " +
        s"($matched vs $notMatched)")
    // the analyzer wraps width-adjusting casts around the key sides
    def keyAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        keyAttr(c.child)
      case _ => None
    }
    val (targetKey, sourceKey) = mergeCondition match {
      case EqualTo(l, r) =>
        (keyAttr(l), keyAttr(r)) match {
          case (Some(a), Some(b)) =>
            if (sourceAttrs.contains(b)) (a.name, b.name)
            else if (sourceAttrs.contains(a)) (b.name, a.name)
            else refuse(s"condition sides unresolved: $mergeCondition")
          case _ => refuse(s"merge condition: $mergeCondition")
        }
      case other => refuse(s"merge condition: $other")
    }
    val sourceDf = Shim.ofRows(spark, source)
    val updates = matchedProj match {
      case Some(assigns) => sourceDf.select(assigns.map(a =>
        DmlTranslate.toColumn(a.value)
          .as(DmlTranslate.keyName(a.key))): _*)
      case None =>
        if (sourceKey == targetKey) sourceDf
        else sourceDf.withColumnRenamed(sourceKey, targetKey)
    }
    (updates, targetKey)
  }
}

/** Eagerly-executed physical node for SQL MERGE INTO (upsert shape);
  * carries only the pre-translated updates frame and key. */
case class CommitLogMergeExec(dir: String,
    updates: org.apache.spark.sql.DataFrame, key: String)
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val sideEffect: Array[InternalRow] = {
    CommitLogIngest.mergeByKey(SparkSession.active, dir, updates, key,
      statsCol = CommitLogIngest.indexedCol(dir))
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = sideEffect

  override protected def doExecute(): RDD[InternalRow] = {
    sideEffect
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
}

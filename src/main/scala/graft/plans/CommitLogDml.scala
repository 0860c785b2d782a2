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
    case m @ MergeIntoTable(tgt @ TableRelation(t), source, cond, matched,
        notMatched, notMatchedBySource, withSchemaEvolution)
        if m.resolved =>
      require(!withSchemaEvolution,
        "graft-commitlog MERGE: WITH SCHEMA EVOLUTION is not supported " +
          "through SQL (wider updates evolve the schema through " +
          "mergeByKey directly)")
      // the pure star upsert keeps the mergeByKey fast path (identical
      // results, pinned by CommitLogSqlSpec); every other clause shape —
      // WHEN MATCHED [AND c] THEN DELETE, conditional updates, NOT
      // MATCHED BY SOURCE — translates to the full clause-list merge
      // (round-12 verdict task 1). Both translate AT PLANNING, so an
      // untranslatable statement fails before any mutation.
      def general: SparkPlan = {
        val (src, key, clauses) = MergeGeneral.translate(tgt, source,
          cond, matched, notMatched, notMatchedBySource)
        CommitLogMergeFullExec(t.dir, src, key, clauses)
      }
      val exec =
        if (notMatchedBySource.isEmpty &&
            MergeTranslate.isStarUpsert(source, matched, notMatched))
          try {
            val (updates, key) =
              MergeTranslate.upsertOf(source, cond, matched, notMatched)
            CommitLogMergeExec(t.dir, updates, key)
          } catch {
            // the ACTIONS are an upsert but something else (e.g. the ON
            // condition) fails the fast path's contract — the general
            // translator owns the final verdict and its refusal message
            case _: UnsupportedOperationException => general
          }
        else general
      exec :: Nil
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

  /** True when the statement is the PURE star upsert (one unconditional
    * star/aligned UPDATE, one unconditional star/aligned INSERT, both
    * writing the same row) — the shape [[CommitLogIngest.mergeByKey]]
    * serves; everything else goes through [[MergeGeneral]]. */
  def isStarUpsert(source: LogicalPlan, matched: Seq[MergeAction],
      notMatched: Seq[MergeAction]): Boolean = {
    val sourceAttrs = source.outputSet
    def canon(p: Option[Seq[Assignment]]): Option[Seq[(String, Expression)]] =
      p.map(_.map(a =>
        DmlTranslate.keyName(a.key) -> a.value.canonicalized).sortBy(_._1))
    (matched, notMatched) match {
      case (Seq(m), Seq(i)) =>
        (starProjection(m, sourceAttrs), starProjection(i, sourceAttrs)) match {
          case (Some(mp), Some(ip)) => canon(mp) == canon(ip)
          case _ => false
        }
      case _ => false
    }
  }

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

/** Full clause-shape MERGE translation (round-12 verdict task 1):
  * analyzed MergeActions → [[graft.streaming.CommitLogIngest.MergeClause]]
  * list, with every condition / SET / VALUES expression re-anchored BY
  * NAME — target attributes under their own names, source attributes
  * under the merge frame's source prefix — so they evaluate against the
  * joined snapshot frame the engine builds. Run AT PLANNING: a
  * non-translatable statement (non-equality key, subquery, an NMBS
  * clause referencing the source) fails before a single byte mutates. */
private[plans] object MergeGeneral {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.DeleteAction
  import graft.streaming.CommitLogIngest.MergeClause
  import graft.streaming.CommitLogIngest.MergeClause._

  private def refuse(why: String): Nothing =
    throw new UnsupportedOperationException(
      "graft-commitlog MERGE cannot translate this statement (supported: " +
        "single key equality ON, WHEN MATCHED [AND cond] THEN UPDATE/" +
        "DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT, WHEN NOT " +
        s"MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE): $why")

  private def keyAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: org.apache.spark.sql.catalyst.expressions.Cast => keyAttr(c.child)
    case _ => None
  }

  /** Re-anchor a resolved expression for the merge frame: source attrs →
    * prefix + name (the key attr under the TARGET key's name — the
    * source frame is renamed to it), target attrs → plain name. */
  private def toMergeColumn(e: Expression, sourceAttrs: AttributeSet,
      sourceKey: AttributeReference, targetKeyName: String)
      : org.apache.spark.sql.Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft-commitlog MERGE: subqueries are not supported in this " +
        s"clause: $e")
    Shim.column(e.transform {
      case a: AttributeReference if a.exprId == sourceKey.exprId =>
        UnresolvedAttribute.quoted(SrcPrefix + targetKeyName)
      case a: AttributeReference if sourceAttrs.contains(a) =>
        UnresolvedAttribute.quoted(SrcPrefix + a.name)
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  def translate(target: LogicalPlan, source: LogicalPlan,
      mergeCondition: Expression, matched: Seq[MergeAction],
      notMatched: Seq[MergeAction], notMatchedBySource: Seq[MergeAction])
      : (org.apache.spark.sql.DataFrame, String, Seq[MergeClause]) = {
    val spark = SparkSession.active
    val sourceAttrs = source.outputSet
    val targetAttrs = target.outputSet
    val (targetKey, sourceKeyAttr) = mergeCondition match {
      case EqualTo(l, r) => (keyAttr(l), keyAttr(r)) match {
        case (Some(a), Some(b)) =>
          if (sourceAttrs.contains(b) && targetAttrs.contains(a)) (a.name, b)
          else if (sourceAttrs.contains(a) && targetAttrs.contains(b))
            (b.name, a)
          else refuse(s"condition sides unresolved: $mergeCondition")
        case _ => refuse(s"merge condition must be a single key " +
          s"equality (t.k = s.k), got: $mergeCondition")
      }
      case other => refuse(s"merge condition must be a single key " +
        s"equality (t.k = s.k), got: $other")
    }
    def cv(e: Expression) =
      toMergeColumn(e, sourceAttrs, sourceKeyAttr, targetKey)
    val targetCols = target.output.map(_.name)
    def starSet: Map[String, org.apache.spark.sql.Column] =
      targetCols.map(c => c -> MergeClause.src(c)).toMap
    def setOf(assigns: Seq[Assignment])
        : Map[String, org.apache.spark.sql.Column] =
      assigns.filterNot(DmlTranslate.isIdentity)
        .map(a => DmlTranslate.keyName(a.key) -> cv(a.value)).toMap
    val mc = matched.map {
      case UpdateStarAction(c) => MatchedUpdate(c.map(cv), starSet)
      case UpdateAction(c, assigns, _) =>
        MatchedUpdate(c.map(cv), setOf(assigns))
      case DeleteAction(c) => MatchedDelete(c.map(cv))
      case other => refuse(s"matched action: $other")
    }
    val ic = notMatched.map {
      case InsertStarAction(c) => NotMatchedInsert(c.map(cv), starSet)
      case InsertAction(c, assigns) =>
        NotMatchedInsert(c.map(cv),
          assigns.map(a => DmlTranslate.keyName(a.key) -> cv(a.value)).toMap)
      case other => refuse(s"not-matched action: $other")
    }
    val nc = notMatchedBySource.map { a =>
      // there is no source row on this side — a condition or SET value
      // referencing the source is meaningless (the Delta analysis rule)
      def targetOnly(e: Expression): Unit =
        require(e.references.subsetOf(targetAttrs),
          s"graft-commitlog MERGE: NOT MATCHED BY SOURCE clauses may " +
            s"reference target columns only, got: $e")
      a match {
        case UpdateAction(c, assigns, _) =>
          c.foreach(targetOnly); assigns.foreach(x => targetOnly(x.value))
          NotMatchedBySourceUpdate(c.map(cv), setOf(assigns))
        case DeleteAction(c) =>
          c.foreach(targetOnly)
          NotMatchedBySourceDelete(c.map(cv))
        case other => refuse(s"not-matched-by-source action: $other")
      }
    }
    // the engine joins on the TARGET key name: surface the source under it
    val sourceDf = Shim.ofRows(spark, source)
    val src =
      if (sourceKeyAttr.name == targetKey) sourceDf
      else sourceDf.withColumnRenamed(sourceKeyAttr.name, targetKey)
    (src, targetKey, mc ++ ic ++ nc)
  }
}

/** Eagerly-executed physical node for full clause-shape SQL MERGE INTO;
  * carries the pre-translated source frame, key, and clause list. */
case class CommitLogMergeFullExec(dir: String,
    source: org.apache.spark.sql.DataFrame, key: String,
    clauses: Seq[graft.streaming.CommitLogIngest.MergeClause])
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val sideEffect: Array[InternalRow] = {
    CommitLogIngest.merge(SparkSession.active, dir, source, key, clauses,
      statsCol = CommitLogIngest.indexedCol(dir))
    Array.empty
  }

  override def executeCollect(): Array[InternalRow] = sideEffect

  override protected def doExecute(): RDD[InternalRow] = {
    sideEffect
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
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

package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}

import graft.streaming.CommitLogIngest

/** SQL maintenance surface for commit-log tables (round-12 verdict task
  * 6) — the statements Delta exposes that the API already implements:
  *
  * {{{
  *   OPTIMIZE '<tableDir>'
  *   OPTIMIZE '<tableDir>' ZORDER BY (colA, colB)
  *   VACUUM '<tableDir>' RETAIN <hours> HOURS
  *   DESCRIBE HISTORY '<tableDir>'
  *   DESCRIBE DETAIL '<tableDir>'
  *   RESTORE '<tableDir>' TO VERSION AS OF <n>
  *   CREATE TABLE '<dstDir>' SHALLOW CLONE '<srcDir>'
  *   ALTER TABLE '<tableDir>' ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TABLE '<tableDir>' DROP CONSTRAINT <name>
  * }}}
  *
  * Injected as a DELEGATING parser (`injectParser`): these statements are
  * not Spark grammar, so interception happens before the delegate; every
  * other string parses through the session's normal parser untouched.
  * Each form lands on the IDENTICAL API call (`optimize`,
  * `optimizeZOrder`, `vacuumRetention`, `history`) as a `RunnableCommand`
  * — eager, atomic, and returning the same observable rows the API
  * returns. A malformed retention is refused AT ANALYSIS (command
  * construction) with zero mutation. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.resolveTimeTravel(
      GraftSqlParser.maintenancePlan(sqlText)
        .getOrElse(delegate.parsePlan(sqlText)))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {

  /** SQL SELECT time travel on commit-log catalog tables (round-12
    * verdict task 2): Spark's grammar already parses `FROM t [FOR]
    * VERSION AS OF n` / `[FOR] TIMESTAMP AS OF ts` into
    * `RelationTimeTravel`, but the session catalog has no
    * `loadTable(ident, version)` for provider-backed tables, so analysis
    * throws UNSUPPORTED_FEATURE.TIME_TRAVEL before any injected
    * resolution rule runs. The delegating parser therefore substitutes
    * the node RIGHT AFTER PARSE with the analyzed plan of the
    * OPTION-BASED read (`versionAsOf` on the V2 reader) — SQL and
    * DataFrame time travel are the same read by construction, and a
    * pre-table instant refuses with the API's own message (versionAt).
    * Relations that are not commit-log catalog tables (other providers,
    * temp views) pass through untouched for Spark's own verdict. */
  private[plans] def resolveTimeTravel(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
    if (!plan.exists(_.isInstanceOf[RelationTimeTravel])) return plan
    plan.transform {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        commitLogDirOf(u.multipartIdentifier) match {
          case None => tt
          case Some(dir) =>
            val spark = SparkSession.active
            val v: Long = ver match {
              case Some(n) => n.toLongOption.getOrElse(
                throw new IllegalArgumentException(
                  s"VERSION AS OF: not a version number: $n"))
              case None =>
                val micros = evalTimestampMicros(spark, ts.getOrElse(
                  throw new IllegalArgumentException(
                    "time travel needs VERSION AS OF or TIMESTAMP AS OF")))
                CommitLogIngest.versionAt(dir, micros / 1000L)
            }
            spark.read.format("graft-commitlog")
              .option("path", dir).option("versionAsOf", v.toString)
              .load().queryExecution.analyzed
        }
    }
  }

  /** Evaluate a (foldable) TIMESTAMP AS OF operand to epoch micros —
    * string literals go through Cast with the session zone, exactly how
    * Spark's own time-travel resolution evaluates them. */
  private def evalTimestampMicros(spark: SparkSession,
      ts: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.TimestampType
    require(ts.foldable,
      s"TIMESTAMP AS OF must be a constant expression, got $ts")
    val zid = spark.sessionState.conf.sessionLocalTimeZone
    val v = Cast(ts, TimestampType, Option(zid)).eval(null)
    require(v != null, s"TIMESTAMP AS OF: cannot read $ts as a timestamp")
    v.asInstanceOf[Long]
  }

  /** The table dir when `ident` names a commit-log table in the session
    * catalog (and is not shadowed by a temp view); None otherwise. */
  private def commitLogDirOf(ident: Seq[String]): Option[String] = {
    val spark = SparkSession.getActiveSession.orNull
    if (spark == null) return None
    val cat = spark.sessionState.catalog
    if (cat.isTempView(ident)) return None
    val tid = ident match {
      case Seq(t) => Some(TableIdentifier(t))
      case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
      case Seq(c, db, t) if c.equalsIgnoreCase("spark_catalog") =>
        Some(TableIdentifier(t, Some(db)))
      case _ => None
    }
    tid.filter { t =>
      try cat.tableExists(t) catch { case _: Exception => false }
    }.flatMap { t =>
      val meta = cat.getTableMetadata(t)
      if (meta.provider.exists(_.equalsIgnoreCase("graft-commitlog")))
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.toString))
          .map(graft.sources.LayoutDirs.localPath)
      else None
    }
  }

  // single-quoted table dir; columns are plain identifiers
  private val OptimizeCluster =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+CLUSTER\s+BY\s+CELL\s*\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\w+)\s*\)\s*;?\s*""".r
  private val OptimizeZorder =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*\)\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'\s+RETAIN\s+([0-9.eE+-]+)\s+HOURS\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CREATE\s+TABLE\s+'([^']+)'\s+SHALLOW\s+CLONE\s+'([^']+)'\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val RenameColumn =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val DropColumn =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r

  private[plans] def maintenancePlan(sql: String): Option[LogicalPlan] =
    sql match {
      case OptimizeCluster(dir, c, k, id) =>
        Some(ClusterCommand(dir, c, k.toInt, id))
      case OptimizeZorder(dir, a, b) =>
        Some(OptimizeCommand(dir, Seq(a, b)))
      case Optimize(dir) => Some(OptimizeCommand(dir, Seq.empty))
      case Vacuum(dir, hours) =>
        Some(VacuumCommand(dir, hours.toDouble))
      case History(dir) => Some(DescribeHistoryCommand(dir))
      case Detail(dir) => Some(DescribeDetailCommand(dir))
      case Restore(dir, v) => Some(RestoreCommand(dir, v.toLong))
      case Clone(dst, src) => Some(ShallowCloneCommand(src, dst))
      case AddConstraint(dir, name, check) =>
        Some(ConstraintCommand(dir, name, Some(check.trim)))
      case DropConstraint(dir, name) =>
        Some(ConstraintCommand(dir, name, None))
      case RenameColumn(dir, a, b) => Some(ColumnChangeCommand(dir, a, Some(b)))
      case DropColumn(dir, a) => Some(ColumnChangeCommand(dir, a, None))
      case _ => None
    }
}

/** `ALTER TABLE '<dir>' RENAME COLUMN a TO b` / `... DROP COLUMN a` —
  * the column-mapping metadata commits (no data file touched); identical
  * to the API calls including every refusal. */
case class ColumnChangeCommand(dir: String, column: String,
    renameTo: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)())

  override def run(spark: SparkSession): Seq[Row] = Seq(Row(renameTo match {
    case Some(b) => CommitLogIngest.renameColumn(spark, dir, column, b)
    case None => CommitLogIngest.dropColumn(spark, dir, column)
  }))
}

/** `ALTER TABLE '<dir>' ADD CONSTRAINT n CHECK (expr)` /
  * `... DROP CONSTRAINT n` — identical to the API calls (ADD scans the
  * existing snapshot and refuses on any violating row). */
case class ConstraintCommand(dir: String, name: String,
    check: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("existed", BooleanType)())

  override def run(spark: SparkSession): Seq[Row] = check match {
    case Some(e) =>
      CommitLogIngest.addCheckConstraint(spark, dir, name, e)
      Seq(Row(false))
    case None =>
      Seq(Row(CommitLogIngest.dropCheckConstraint(dir, name)))
  }
}

/** `OPTIMIZE '<dir>' CLUSTER BY CELL (embedCol, k, idCol)` — the ANN
  * cell-clustering rewrite, identical to the API call. */
case class ClusterCommand(dir: String, embedCol: String, k: Int,
    idCol: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("files_removed", IntegerType)(),
    AttributeReference("files_added", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (v, removed, added) = CommitLogIngest.optimizeClusterByCell(
      spark, dir, embedCol, k, idCol,
      statsCol = CommitLogIngest.indexedCol(dir))
    Seq(Row(v, removed, added))
  }
}

/** `OPTIMIZE` (size compaction) / `OPTIMIZE ... ZORDER BY` (Morton
  * re-clustering) — identical to the API calls, statsCol from the
  * table's recorded index column. */
case class OptimizeCommand(dir: String, zorderBy: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("files_removed", IntegerType)(),
    AttributeReference("files_added", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val statsCol = CommitLogIngest.indexedCol(dir)
    val (v, removed, added) =
      if (zorderBy.isEmpty) CommitLogIngest.optimize(spark, dir, statsCol)
      else CommitLogIngest.optimizeZOrder(spark, dir, zorderBy, statsCol)
    Seq(Row(v, removed, added))
  }
}

/** `VACUUM ... RETAIN n HOURS` — the time-based retention face. The
  * horizon is validated HERE (analysis time): a config typo must fail
  * before any deletion, with zero mutation. */
case class VacuumCommand(dir: String, retainHours: Double)
    extends LeafRunnableCommand {

  require(java.lang.Double.isFinite(retainHours) && retainHours > 0,
    s"VACUUM: RETAIN must be a positive, finite hour count, got " +
      s"$retainHours — a zero/negative horizon would reclaim every " +
      "historical version")

  override val output: Seq[Attribute] = Seq(
    AttributeReference("retention_floor", LongType)(),
    AttributeReference("files_reclaimed", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (floor, dropped) =
      CommitLogIngest.vacuumRetention(spark, dir, retainHours)
    Seq(Row(floor, dropped.size))
  }
}

/** `DESCRIBE HISTORY` — one row per surviving log version, the API's
  * `history` frame verbatim. */
case class DescribeHistoryCommand(dir: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("n_added", LongType)(),
    AttributeReference("n_removed", LongType)(),
    AttributeReference("n_masked", LongType)(),
    AttributeReference("txn", StringType)(),
    AttributeReference("schema_change", BooleanType)(),
    AttributeReference("operation", StringType)())

  override def run(spark: SparkSession): Seq[Row] =
    CommitLogIngest.history(spark, dir)
      .select("version", "n_added", "n_removed", "n_masked", "txn",
        "schema_change", "operation")
      .collect().toSeq
}

/** `DESCRIBE DETAIL '<dir>'` — the table-at-a-glance row (the Delta
  * shape): current version, live file count and bytes, masked-file
  * count (deletion vectors awaiting OPTIMIZE), layout, switches,
  * constraint count. Driver-side metadata only — no data reads. */
case class DescribeDetailCommand(dir: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType)(),
    AttributeReference("version", LongType)(),
    AttributeReference("num_files", IntegerType)(),
    AttributeReference("size_bytes", LongType)(),
    AttributeReference("num_masked_files", IntegerType)(),
    AttributeReference("partition_columns", StringType)(),
    AttributeReference("stats_column", StringType)(),
    AttributeReference("cdf_enabled", BooleanType)(),
    AttributeReference("dv_enabled", BooleanType)(),
    AttributeReference("num_constraints", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = CommitLogIngest.latestVersion(dir)
    val (files, dvs) =
      if (v < 0) (Seq.empty[String], Map.empty[String, Seq[Long]])
      else CommitLogIngest.liveState(spark, dir, v)
    val bytes = files.map { p =>
      try java.nio.file.Files.size(java.nio.file.Paths.get(p))
      catch { case _: Exception => 0L }
    }.sum
    Seq(Row("graft-commitlog", v, files.size, bytes, dvs.size,
      CommitLogIngest.partitionColsOf(dir).mkString(","),
      CommitLogIngest.indexedCol(dir).orNull,
      CommitLogIngest.cdfEnabled(dir), CommitLogIngest.dvEnabled(dir),
      CommitLogIngest.checkConstraintsOf(dir).size))
  }
}

/** `RESTORE '<dir>' TO VERSION AS OF n` — the forward-commit rollback,
  * identical to the API call (post-target deletion-vector masks
  * materialize, vacuumed history refuses loudly before any mutation). */
case class RestoreCommand(dir: String, toVersion: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("files_removed", IntegerType)(),
    AttributeReference("files_added", IntegerType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (v, removed, added) = CommitLogIngest.restore(spark, dir, toVersion)
    Seq(Row(v, removed, added))
  }
}

/** `CREATE TABLE '<dst>' SHALLOW CLONE '<src>'` — zero-copy metadata
  * clone, identical to the API call. */
case class ShallowCloneCommand(src: String, dst: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(CommitLogIngest.shallowClone(spark, src, dst)))
}

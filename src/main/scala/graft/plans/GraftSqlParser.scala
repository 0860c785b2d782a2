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
    GraftSqlParser.maintenancePlan(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

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

  // single-quoted table dir; columns are plain identifiers
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

  private[plans] def maintenancePlan(sql: String): Option[LogicalPlan] =
    sql match {
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
      case _ => None
    }
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

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.ProxyFunctions._
import ProxyQueries.{requests, requestsCte}

/** Dead-letter-queue semantics (SURVEY.md §2: O-3, O-6, O-20, O-21, O-32,
  * O-34). The reference persists failed batches as files named
  * `<level-digit><unixNano>` (or `O...` tombstones past 10 retries,
  * /root/reference/main.go:365-373) and replays them in lexicographic
  * filename order (main.go:456).
  *
  * A deterministic DLQ is synthesized from the request stream: every
  * request with `event_id % 11 < 2` "failed", with a synthetic retry level
  * and nano timestamp. The same derivation is inlined in the oracles.
  */
object DlqQueries {

  /** Shared DLQ DataFrame: (file, level, ts_nano, uri, body). */
  def dlq(spark: SparkSession, sfDir: String): DataFrame = {
    val level  = (col("event_id") % 12).cast("int")
    val tsNano = lit(1700000000000000000L) + col("event_id") * 1000000L
    requests(spark, sfDir)
      .filter(col("event_id") % 11 < 2)
      .select(
        concat(dlqPrefix(level), tsNano.cast("string")).as("file"),
        level.as("level"), tsNano.as("ts_nano"),
        col("uri"), col("body"))
  }

  /** DuckDB mirror of [[dlq]] (expects `requests` CTE in scope). */
  val dlqCte: String =
    """dlq AS (
      |  SELECT
      |    CASE WHEN CAST(event_id % 12 AS INT) >= 10 THEN 'O'
      |         ELSE CAST(CAST(event_id % 12 AS INT) AS VARCHAR) END ||
      |      CAST(1700000000000000000 + event_id * 1000000 AS VARCHAR) AS file,
      |    CAST(event_id % 12 AS INT) AS level,
      |    1700000000000000000 + event_id * 1000000 AS ts_nano,
      |    uri, body
      |  FROM requests WHERE event_id % 11 < 2
      |)""".stripMargin

  /** O-20 + O-34 + O-6: scan the DLQ, skip tombstones (non-digit prefix,
    * main.go:474-478), parse the retry level back out of the file name, and
    * assign the replay order (lexicographic = level digit, then nano ts).
    * The global rank encodes replay order into values so the multiset
    * compare still checks ordering.
    *
    * Replay is a single ordered queue in the reference (1 send/sec), but
    * the RANK COMPUTATION need not single-partition-sort the backlog:
    * live file names start with the level digit and carry a fixed-width
    * nano timestamp, so global lexicographic order = (parsed_level,
    * file-within-level). Rank = within-level row_number + the cumulative
    * count of lower levels — the same range-bucket + offsets formulation
    * as distributedPercentRank (the offsets window runs over the ≤10-row
    * aggregated per-level counts, never the backlog itself). */
  def replayOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val live = dlq(spark, sfDir)
      .filter(substring(col("file"), 1, 1).rlike("[0-9]"))
      .select(col("file"),
        substring(col("file"), 1, 1).cast("int").as("parsed_level"),
        col("uri"))
    val wLvl = Window.partitionBy(col("parsed_level")).orderBy(col("file"))
    val offsets = live.groupBy(col("parsed_level"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(
        Window.orderBy(col("parsed_level"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("parsed_level"), col("_off"))
    live.withColumn("_r", row_number().over(wLvl))
      .join(broadcast(offsets), Seq("parsed_level"))
      .withColumn("replay_rank", (col("_off") + col("_r")).cast("int"))
      .select(col("file"), col("parsed_level"), col("uri"),
        col("replay_rank"))
  }

  val replayOrderSql: String =
    s"""WITH $requestsCte, $dlqCte
       |SELECT file,
       |  CAST(substr(file, 1, 1) AS INT) AS parsed_level,
       |  uri,
       |  CAST(row_number() OVER (ORDER BY file) AS INT) AS replay_rank
       |FROM dlq WHERE substr(file, 1, 1) BETWEEN '0' AND '9'""".stripMargin

  /** O-21: retry-level escalation ladder — the file name a batch would get
    * if its next send failed (level+1; >=10 → `O` tombstone). */
  def escalation(spark: SparkSession, sfDir: String): DataFrame =
    dlq(spark, sfDir).select(
      col("file"), col("level"),
      (col("level") + 1).as("next_level"),
      concat(dlqPrefix(col("level") + 1), col("ts_nano").cast("string"))
        .as("next_file"))

  val escalationSql: String =
    s"""WITH $requestsCte, $dlqCte
       |SELECT file, level,
       |  level + 1 AS next_level,
       |  CASE WHEN level + 1 >= 10 THEN 'O' ELSE CAST(level + 1 AS VARCHAR) END ||
       |    CAST(ts_nano AS VARCHAR) AS next_file
       |FROM dlq""".stripMargin

  /** O-3 + O-32: DLQ backlog count (tombstones excluded, main.go:487-502)
    * classified into an HTTP status (main.go:239-243). Thresholds scaled to
    * the testdata so both branches are reachable across SFs. */
  def status(spark: SparkSession, sfDir: String): DataFrame =
    dlq(spark, sfDir)
      .filter(!col("file").startsWith("O"))
      .agg(count(lit(1)).as("errcount"))
      .select(col("errcount"),
        statusCode(col("errcount"), warn = 100, crit = 300).as("http_code"))

  val statusSql: String =
    s"""WITH $requestsCte, $dlqCte,
       |c AS (SELECT COUNT(*) AS errcount FROM dlq WHERE NOT starts_with(file, 'O'))
       |SELECT errcount,
       |  CAST(CASE WHEN errcount >= 300 THEN 500
       |            WHEN errcount >= 100 THEN 400 ELSE 200 END AS INT) AS http_code
       |FROM c""".stripMargin

  def queries: Map[String, Q] = Map(
    "o20_o34_dlq_replay" -> Q(replayOrderSql)(replayOrder),
    "o21_dlq_escalation" -> Q(escalationSql)(escalation),
    "o3_dlq_status"      -> Q(statusSql)(status))
}

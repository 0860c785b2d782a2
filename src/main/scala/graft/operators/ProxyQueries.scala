package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables
import graft.functions.ProxyFunctions._

/** proxyhouse core semantics as batch DataFrame queries (SURVEY.md §2).
  *
  * The reference's unit of work is an HTTP insert request `(uri, body)`
  * (/root/reference/main.go:164-226). We synthesize a deterministic request
  * stream from the driver's `events` table (FIXTURES.md §1.1) — the same
  * derivation is inlined in every DuckDB oracle below so both engines see
  * identical inputs.
  */
object ProxyQueries {

  // ---- synthesized request stream -----------------------------------------

  /** (event_id, user_id, tbl, fmt, uri, body, host) derived from events.
    * fmt rotates Values/TSV/CSV; Values bodies carry 1-3 tuples; every 5th
    * Values request carries a password query param (exercises O-17).
    */
  def requests(spark: SparkSession, sfDir: String): DataFrame =
    requestsFrom(Tables.events(spark, sfDir))

  /** [[requests]] over a caller-supplied events frame — lets a consumer
    * spread the NARROW raw columns before the synthesis projection
    * instead of exchanging the synthesized uri/body strings (round 16:
    * src_parsed_roundtrip). */
  def requestsFrom(ev: DataFrame): DataFrame = {
    val fmt = when(col("event_id") % 7 === 0, "TSV")
      .when(col("event_id") % 7 === 1, "CSV")
      .otherwise("Values")
    val vi     = floor(col("value") * 100).cast("string")
    val uid    = col("user_id").cast("string")
    val nrows  = (col("event_id") % 3 + 1).cast("int")
    val tuple  = concat(lit("("), uid, lit(","), vi, lit(")"))
    val tsvRow = concat(uid, lit("\t"), vi, lit("\n"))
    val csvRow = concat(uid, lit(","), vi, lit("\n"))
    val pw = when(col("event_id") % 5 === 0,
      concat(lit("&password=pw"), (col("user_id") % 100).cast("string")))
      .otherwise(lit(""))
    ev.select(
      col("event_id"), col("user_id"), col("event_type").as("tbl"),
      fmt.as("fmt"),
      concat(lit("/?query=INSERT%20INTO%20"), col("event_type"),
        when(fmt === "TSV", lit("%20FORMAT%20TSV"))
          .when(fmt === "CSV", lit("%20FORMAT%20CSV"))
          .otherwise(concat(lit("%20VALUES"), pw))).as("uri"),
      when(fmt === "TSV", array_join(array_repeat(tsvRow, nrows), ""))
        .when(fmt === "CSV", array_join(array_repeat(csvRow, nrows), ""))
        .otherwise(array_join(array_repeat(tuple, nrows), ",")).as("body"),
      concat(lit("h"), (col("user_id") % 4).cast("string")).as("host"))
  }

  /** DuckDB mirror of [[requests]]; inlined as a CTE in every oracle. */
  val requestsCte: String =
    """requests AS (
      |  SELECT event_id, user_id, event_type AS tbl,
      |    CASE WHEN event_id % 7 = 0 THEN 'TSV'
      |         WHEN event_id % 7 = 1 THEN 'CSV' ELSE 'Values' END AS fmt,
      |    '/?query=INSERT%20INTO%20' || event_type ||
      |      CASE WHEN event_id % 7 = 0 THEN '%20FORMAT%20TSV'
      |           WHEN event_id % 7 = 1 THEN '%20FORMAT%20CSV'
      |           ELSE '%20VALUES' ||
      |             CASE WHEN event_id % 5 = 0
      |                  THEN '&password=pw' || CAST(user_id % 100 AS VARCHAR)
      |                  ELSE '' END
      |      END AS uri,
      |    CASE WHEN event_id % 7 = 0 THEN array_to_string(list_transform(
      |           range(1 + event_id % 3), i -> CAST(user_id AS VARCHAR) ||
      |             chr(9) || CAST(FLOOR(value * 100) AS BIGINT) || chr(10)), '')
      |         WHEN event_id % 7 = 1 THEN array_to_string(list_transform(
      |           range(1 + event_id % 3), i -> CAST(user_id AS VARCHAR) ||
      |             ',' || CAST(FLOOR(value * 100) AS BIGINT) || chr(10)), '')
      |         ELSE array_to_string(list_transform(
      |           range(1 + event_id % 3), i -> '(' || CAST(user_id AS VARCHAR) ||
      |             ',' || CAST(FLOOR(value * 100) AS BIGINT) || ')'), ',')
      |    END AS body,
      |    'h' || CAST(user_id % 4 AS VARCHAR) AS host
      |  FROM events
      |)""".stripMargin

  // ---- O-27/O-28: the core keyed concat + rowcount aggregation ------------

  /** Group by full URI (the reference's group key, main.go:187), concatenate
    * bodies with the format's delimiter, count rows with raw-substring
    * semantics (main.go:198-208). Concat order is nondeterministic in the
    * reference (SURVEY.md §1.3) → canonical array_sort for the oracle.
    * One hash aggregation; Spark runs it partial (map-side) + final.
    */
  def keyedConcat(spark: SparkSession, sfDir: String): DataFrame = {
    val req = requests(spark, sfDir)
    req.groupBy(col("uri")).agg(
        sort_array(collect_list(col("body"))).as("bodies"),
        sum(rowCount(col("uri"), col("body"))).as("rows_sent"),
        count(lit(1)).as("reqs"),
        sum(length(col("body"))).as("bytes_received"))
      .select(
        col("uri"),
        when(formatOf(col("uri")) === "Values",
          array_join(col("bodies"), ","))
          .otherwise(array_join(col("bodies"), "")).as("batch_body"),
        col("rows_sent"), col("reqs"), col("bytes_received"))
  }

  /** DuckDB twin of formatOf's query-param isolation (O-15): the `query`
    * parameter's value, for suffix-testing both space encodings. */
  private val qParamSql = "regexp_extract(uri, '[?&]query=([^&]*)', 1)"
  private val isTsvOrCsvSql =
    s"(ends_with($qParamSql, 'FORMAT%20TSV') OR ends_with($qParamSql, 'FORMAT+TSV') OR " +
    s"ends_with($qParamSql, 'FORMAT%20CSV') OR ends_with($qParamSql, 'FORMAT+CSV'))"

  val keyedConcatSql: String =
    s"""WITH $requestsCte
       |SELECT uri,
       |  CASE WHEN ${isTsvOrCsvSql}
       |       THEN string_agg(body, '' ORDER BY body)
       |       ELSE string_agg(body, ',' ORDER BY body) END AS batch_body,
       |  CAST(SUM(CASE WHEN ${isTsvOrCsvSql}
       |           THEN len(string_split(body, chr(10))) - 1
       |           ELSE len(string_split(body, '),')) END) AS BIGINT) AS rows_sent,
       |  COUNT(*) AS reqs,
       |  CAST(SUM(LENGTH(body)) AS BIGINT) AS bytes_received
       |FROM requests GROUP BY uri""".stripMargin

  /** O-27/O-28 through the FUSED custom aggregate
    * (org.apache.spark.sql.graft.ConcatCount, a TypedImperativeAggregate —
    * single-buffer append+count, the reference's exact execution shape,
    * raw-binary partial buffers instead of kryo). Concat order is arrival
    * order
    * (nondeterministic across partitions, like the reference under
    * concurrency), so the checked outputs are the order-invariant
    * aggregates: batch byte length, row count, request count. */
  def fusedConcat(spark: SparkSession, sfDir: String): DataFrame =
    graft.streaming.IngestPipeline.aggregateBatch(requests(spark, sfDir))
      .select(col("uri"), length(col("body")).cast("long").as("batch_bytes"),
        col("rows").as("rows_sent"), col("reqs"))

  val fusedConcatSql: String =
    s"""WITH $requestsCte
       |SELECT uri,
       |  CAST(SUM(LENGTH(body)) + (COUNT(*) - 1) *
       |    CASE WHEN ${isTsvOrCsvSql}
       |         THEN 0 ELSE 1 END AS BIGINT) AS batch_bytes,
       |  CAST(SUM(CASE WHEN ${isTsvOrCsvSql}
       |           THEN len(string_split(body, chr(10))) - 1
       |           ELSE len(string_split(body, '),')) END) AS BIGINT) AS rows_sent,
       |  COUNT(*) AS reqs
       |FROM requests GROUP BY uri""".stripMargin

  // ---- scalar operator queries (O-15..O-19) --------------------------------

  /** O-15 + O-19: format sniff drives (delimiter, separator, addrows) and the
    * per-request row count; aggregate per format for a compact check. */
  def formatSniff(spark: SparkSession, sfDir: String): DataFrame = {
    val req = requests(spark, sfDir)
    req.select(
        formatOf(col("uri")).as("fmt_sniffed"),
        delimiterOf(col("uri")).as("delim"),
        rowCount(col("uri"), col("body")).as("rows_in_body"))
      .groupBy(col("fmt_sniffed"), col("delim"))
      .agg(sum(col("rows_in_body")).as("rows_total"),
        count(lit(1)).as("reqs"))
  }

  val formatSniffSql: String =
    s"""WITH $requestsCte
       |SELECT
       |  CASE WHEN ends_with($qParamSql, 'FORMAT%20TSV')
       |         OR ends_with($qParamSql, 'FORMAT+TSV') THEN 'TSV'
       |       WHEN ends_with($qParamSql, 'FORMAT%20CSV')
       |         OR ends_with($qParamSql, 'FORMAT+CSV') THEN 'CSV'
       |       ELSE 'Values' END AS fmt_sniffed,
       |  CASE WHEN ${isTsvOrCsvSql}
       |       THEN '' ELSE ',' END AS delim,
       |  CAST(SUM(CASE WHEN ${isTsvOrCsvSql}
       |           THEN len(string_split(body, chr(10))) - 1
       |           ELSE len(string_split(body, '),')) END) AS BIGINT) AS rows_total,
       |  COUNT(*) AS reqs
       |FROM requests GROUP BY 1, 2""".stripMargin

  /** O-16: extractTable (main.go:323-349) over every synthesized URI. */
  def extractTableQ(spark: SparkSession, sfDir: String): DataFrame =
    requests(spark, sfDir)
      .select(extractTable(col("uri")).as("table_name"))
      .groupBy(col("table_name")).agg(count(lit(1)).as("reqs"))

  val extractTableSql: String =
    s"""WITH $requestsCte
       |SELECT coalesce(
       |    nullif(regexp_extract(lower(uri), 'insert%20into%20([^%]+)%20', 1), ''),
       |    nullif(regexp_extract(lower(uri), 'insert\\+into\\+([^+]+)\\+', 1), ''),
       |    'unknown') AS table_name,
       |  COUNT(*) AS reqs
       |FROM requests GROUP BY 1""".stripMargin

  /** O-17: hidePassword (main.go:352-363) — mask then count distinct masked
    * URIs (all pw<N> variants of a table collapse onto one masked key). */
  def hidePasswordQ(spark: SparkSession, sfDir: String): DataFrame =
    requests(spark, sfDir)
      .select(hidePassword(col("uri")).as("masked_uri"))
      .groupBy(col("masked_uri")).agg(count(lit(1)).as("reqs"))

  val hidePasswordSql: String =
    s"""WITH $requestsCte
       |SELECT regexp_replace(uri, 'password=[^&]*', 'password=*', 'g') AS masked_uri,
       |  COUNT(*) AS reqs
       |FROM requests GROUP BY 1""".stripMargin

  /** O-18: URI rewrite onto the forward host (main.go:385-389). */
  def rewriteUriQ(spark: SparkSession, sfDir: String): DataFrame =
    requests(spark, sfDir)
      .select(rewriteUri(col("uri"), "http://localhost:8123").as("target_uri"))
      .groupBy(col("target_uri")).agg(count(lit(1)).as("reqs"))

  val rewriteUriSql: String =
    s"""WITH $requestsCte
       |SELECT CASE WHEN starts_with(uri, '/')
       |            THEN 'http://localhost:8123' || uri ELSE uri END AS target_uri,
       |  COUNT(*) AS reqs
       |FROM requests GROUP BY 1""".stripMargin

  // ---- registry ------------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "o27_keyed_concat"  -> Q(keyedConcatSql)(keyedConcat),
    "o27_fused_concat"  -> Q(fusedConcatSql)(fusedConcat),
    "o15_format_sniff"  -> Q(formatSniffSql)(formatSniff),
    "o16_extract_table" -> Q(extractTableSql)(extractTableQ),
    "o17_hide_password" -> Q(hidePasswordSql)(hidePasswordQ),
    "o18_uri_rewrite"   -> Q(rewriteUriSql)(rewriteUriQ))
}

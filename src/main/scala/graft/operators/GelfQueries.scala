package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables
import graft.functions.ProxyFunctions._

/** GELF log-record derivations (SURVEY.md §2.2 O-22..O-24), batch form.
  * Log messages are synthesized from `documents` (long texts exercise all
  * three short-message branches of /root/reference/graylog.go:130-139;
  * newlines injected deterministically). zlib/UDP chunking is sink plumbing
  * (graft.sinks.Gelf), not relational — tested in ScalaTest, not here.
  */
object GelfQueries {

  /** Log-record view: newline-injected full message + syslog level. */
  private def logs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      (col("doc_id") % 7 + 1).cast("int").as("level"),
      replace(col("text"), lit(" table "), lit("\n")).as("full"))

  private val logsCte: String =
    """logs AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 7 + 1 AS INT) AS level,
      |    replace(text, ' table ', chr(10)) AS "full"
      |  FROM documents
      |)""".stripMargin

  /** O-22: short-message truncation ladder. */
  def shortMessageQ(spark: SparkSession, sfDir: String): DataFrame =
    logs(spark, sfDir).select(
      col("doc_id"),
      length(col("full")).cast("long").as("full_len"),
      shortMessage(col("full")).as("short_message"))

  val shortMessageSql: String =
    s"""WITH $logsCte
       |SELECT doc_id,
       |  LENGTH("full") AS full_len,
       |  CASE WHEN LENGTH("full") < 128 THEN "full"
       |       WHEN position(chr(10) IN "full") > 0
       |            AND position(chr(10) IN "full") <= 129
       |         THEN split_part("full", chr(10), 1)
       |       ELSE substr("full", 1, 125) || '...' END AS short_message
       |FROM logs""".stripMargin

  /** O-23 + O-24: level filter (graylog.go:193-197) + GELF JSON encode with
    * fixed field order (graylog.go:143-153), built by explicit concat so the
    * byte layout is deterministic and oracle-checkable. */
  def gelfEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val l = logs(spark, sfDir).filter(col("level") <= 6)
    l.select(
      col("doc_id"),
      gelfJson(lit("spark-graft"), lit(1594916275L) + col("doc_id"),
        lit("graft"), col("level"),
        shortMessage(col("full")), col("full")).as("gelf"))
  }

  val gelfEncodeSql: String =
    s"""WITH $logsCte,
       |s AS (
       |  SELECT doc_id, level, "full",
       |    CASE WHEN LENGTH("full") < 128 THEN "full"
       |         WHEN position(chr(10) IN "full") > 0
       |              AND position(chr(10) IN "full") <= 129
       |           THEN split_part("full", chr(10), 1)
       |         ELSE substr("full", 1, 125) || '...' END AS short
       |  FROM logs WHERE level <= 6
       |),
       |e AS (
       |  SELECT doc_id, level, short,
       |    replace(replace(replace("full", chr(92), chr(92) || chr(92)),
       |      '"', chr(92) || '"'), chr(10), chr(92) || 'n') AS jfull,
       |    replace(replace(replace(short, chr(92), chr(92) || chr(92)),
       |      '"', chr(92) || '"'), chr(10), chr(92) || 'n') AS jshort
       |  FROM s
       |)
       |SELECT doc_id,
       |  '{"version":"1.1","host":"spark-graft","timestamp":' ||
       |    CAST(1594916275 + doc_id AS VARCHAR) ||
       |    ',"file":"graft","level":' || CAST(level AS VARCHAR) ||
       |    ',"short_message":"' || jshort || '","full_message":"' || jfull ||
       |    '"}' AS gelf
       |FROM e""".stripMargin

  def queries: Map[String, Q] = Map(
    "o22_short_message" -> Q(shortMessageSql)(shortMessageQ),
    "o23_gelf_encode"   -> Q(gelfEncodeSql)(gelfEncode))
}

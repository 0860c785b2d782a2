package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import ProxyQueries.{requests, requestsCte}

/** proxyhouse's multi-dimensional counter aggregations (SURVEY.md §2.3
  * O-29/O-30/O-31): every ingest/send bumps the same measure at three grains
  * — global, by-host, by-table (/root/reference/main.go:210-216,394-405) —
  * which is semantically a GROUPING SETS aggregation, realized here as one
  * grouping-sets hash-agg (single scan + one shuffle; the name fan-out is a
  * post-aggregation projection, so it stays cheap at scale).
  */
object MetricsRollup {

  /** O-30: grouping-sets rollup producing Graphite-style dotted metric
    * names. Two measures (request count, byte sum) per grain. */
  def metricRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val req = requests(spark, sfDir)
    val g = req
      .groupingSets(Seq(Seq(), Seq(col("host")), Seq(col("tbl"))),
        col("host"), col("tbl"))
      .agg(count(lit(1)).as("cnt"), sum(length(col("body"))).as("bytes"))
    val prefix = when(col("host").isNotNull,
        concat(lit("proxyhouse.byhost."), col("host"), lit(".")))
      .when(col("tbl").isNotNull,
        concat(lit("proxyhouse.bytable."), col("tbl"), lit(".")))
      .otherwise(lit("proxyhouse."))
    g.select(explode(array(
        struct(concat(prefix, lit("requests_received")).as("metric"),
          col("cnt").as("value")),
        struct(concat(prefix, lit("bytes_received")).as("metric"),
          col("bytes").as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
  }

  val metricRollupSql: String =
    s"""WITH $requestsCte,
       |g AS (
       |  SELECT host, tbl, COUNT(*) AS cnt,
       |    CAST(SUM(LENGTH(body)) AS BIGINT) AS bytes
       |  FROM requests GROUP BY GROUPING SETS ((), (host), (tbl))
       |),
       |named AS (
       |  SELECT CASE WHEN host IS NOT NULL THEN 'proxyhouse.byhost.' || host || '.'
       |              WHEN tbl IS NOT NULL THEN 'proxyhouse.bytable.' || tbl || '.'
       |              ELSE 'proxyhouse.' END AS p, cnt, bytes
       |  FROM g
       |)
       |SELECT p || 'requests_received' AS metric, cnt AS value FROM named
       |UNION ALL
       |SELECT p || 'bytes_received' AS metric, bytes AS value FROM named""".stripMargin

  /** O-31: derived ratio metric (metric.go:26-38) — bytes/duration consumed
    * as a pair; global + per-table via ROLLUP. Send duration is synthesized
    * deterministically per request. */
  def sendSpeed(spark: SparkSession, sfDir: String): DataFrame = {
    val req = requests(spark, sfDir)
      .withColumn("duration_ms", (col("event_id") % 50 + 1).cast("long"))
      .withColumn("bytes", length(col("body")).cast("long"))
    req.rollup(col("tbl")).agg(
      sum(col("bytes")).as("bytes_sent"),
      sum(col("duration_ms")).as("duration_ms_total"),
      round(sum(col("bytes")) / sum(col("duration_ms")), 4).as("send_speed"))
  }

  val sendSpeedSql: String =
    s"""WITH $requestsCte
       |SELECT tbl,
       |  CAST(SUM(LENGTH(body)) AS BIGINT) AS bytes_sent,
       |  CAST(SUM(event_id % 50 + 1) AS BIGINT) AS duration_ms_total,
       |  ROUND(SUM(LENGTH(body)) / CAST(SUM(event_id % 50 + 1) AS DOUBLE), 4)
       |    AS send_speed
       |FROM requests GROUP BY ROLLUP (tbl)""".stripMargin

  def queries: Map[String, Q] = Map(
    "o30_metric_rollup" -> Q(metricRollupSql)(metricRollup),
    "o31_send_speed"    -> Q(sendSpeedSql)(sendSpeed))
}

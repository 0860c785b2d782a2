package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.ProxyFunctions._
import graft.operators.ProxyQueries
import graft.streaming.IngestPipeline

/** Typed parsing of the wire-format payloads (SURVEY.md §1.2: the
  * reference forwards opaque bytes; the Spark engine ADDS schema-on-read
  * so queries can run on the ingested data, not just forward it).
  *
  * `parse` inverts the ingest concat for all three formats — Values
  * `(a,b),(c,d)`, TSV lines, CSV lines — into typed rows. The registered
  * query is a round-trip proof: synthesize requests → aggregate into
  * batches (the fused Aggregator) → parse back → per-table totals must
  * equal the same totals computed directly from the raw events table
  * (which is exactly what the DuckDB oracle does).
  */
object ParsedRequests {

  /** (uri, body) batches → typed (tbl, user_id, v) rows. */
  def parse(batches: DataFrame): DataFrame = {
    val pieces = when(formatOf(col("uri")) === "Values",
        expr("regexp_extract_all(body, '\\\\(([^)]+)\\\\)', 1)"))
      .otherwise(expr("filter(split(body, '\n'), x -> x != '')"))
    val sep = when(formatOf(col("uri")) === "TSV", "\t").otherwise(",")
    batches
      .select(extractTable(col("uri")).as("tbl"), sep.as("sep"),
        explode(pieces).as("piece"))
      .select(col("tbl"),
        split_part(col("piece"), col("sep"), lit(1)).cast("long").as("user_id"),
        split_part(col("piece"), col("sep"), lit(2)).cast("long").as("v"))
  }

  /** Round-trip query: totals over parse(synthesize(events)) — oracled
    * against the raw events table directly. Parsing happens at request
    * granularity (small strings, full scan parallelism); the batch-level
    * invariant parse∘aggregate ≡ parse is proven separately in
    * ParsedRequestsSpec — exploding a handful of giant concatenated
    * bodies would serialize the work onto one task per group. */
  def parsedTotals(spark: SparkSession, sfDir: String): DataFrame =
    // Tables.spread (round 16): the events corpus arrives in far fewer
    // scan partitions than cores (one 2 MB file at sf0.1; two splits at
    // sf10), so the regex piece-split + per-piece parse otherwise run on
    // a core or two of 32 — the r15 spread rule's exact case. The spread
    // ships the NARROW raw event columns and the uri/body synthesis runs
    // post-exchange (an earlier shape that spread the synthesized
    // strings regressed sf10 4.04 -> 5.01 s). Scoped HERE, not inside
    // requests(): the o_* consumers are scan-bound and must not pay an
    // exchange.
    parse(ProxyQueries.requestsFrom(graft.model.Tables.spread(
        graft.model.Tables.events(spark, sfDir)
          .select("event_id", "user_id", "event_type", "value"),
        "event_id")).select("uri", "body"))
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v")).as("sum_v"),
        countDistinct(col("user_id")).as("n_users"))

  /** The oracle never sees the wire formats: it recomputes the totals
    * from raw events, so a PASS proves parse ∘ concat ∘ synthesize =
    * identity on every format. */
  val parsedTotalsSql: String =
    """SELECT event_type AS tbl,
      |  CAST(SUM(1 + event_id % 3) AS BIGINT) AS n_rows,
      |  CAST(SUM((1 + event_id % 3) * CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_v,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  /** JSON round-trip proof for the JSONL source/sink path: events →
    * `to_json(struct(...))` (the serialized form a JSONL export writes)
    * → `from_json` with an explicit schema (the schema-on-read a JSONL
    * source applies) → totals, oracled against the raw events table
    * (the oracle never sees JSON, so a PASS proves from_json ∘ to_json
    * = identity on these types). Both directions are codegen'd
    * expressions in one narrow projection — a JSONL corpus scan adds no
    * shuffle over the parquet path. */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    // Tables.spread (round 16): same single-partition-scan rationale as
    // parsedTotals — to_json/from_json per row is the query's whole cost
    val js = graft.model.Tables.spread(
        graft.model.Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value")),
        "event_id")
      .select(to_json(struct(
        col("event_id"), col("user_id"), col("event_type"), col("value")))
        .as("j"))
    js.select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"))
        .as("r"))
      .select(col("r.event_type").as("event_type"),
        col("r.user_id").as("user_id"), col("r.value").as("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val jsonRoundtripSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  def queries: Map[String, Q] = Map(
    "src_parsed_roundtrip" -> Q(parsedTotalsSql)(parsedTotals),
    "src_json_roundtrip"   -> Q(jsonRoundtripSql)(jsonRoundtrip))
}

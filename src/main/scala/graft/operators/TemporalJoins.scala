package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables

/** Temporal/interval join operators Spark lacks natively — the brief's
  * canonical "compose existing ops" cases (as-of join, range join), each
  * expressed as a scale-safe composition rather than an O(n×m) theta join.
  */
object TemporalJoins {

  // ---- as-of join -----------------------------------------------------------

  /** AS-OF join without a join: for every click event, the most recent
    * STRICTLY-earlier purchase by the same user. The naive formulation is a
    * range self-join (every click × every earlier purchase, then argmax) —
    * quadratic in events-per-user. Instead, union both sides tagged, one
    * shuffle on user_id, and a running `last(..., ignoreNulls)` window over
    * strictly-preceding rows carries the latest purchase forward: O(n log n)
    * in each user's events and embarrassingly parallel across users (the
    * standard distributed as-of pattern; DuckDB's ASOF JOIN is the oracle).
    *
    * Strictness: ordering is (ms, is_purchase, event_id) with clicks (0)
    * before purchases (1) at equal ms, and the window frame ends at -1 —
    * so a same-millisecond purchase is never matched. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000").as("ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms"), lit(0).as("is_purchase"),
        col("event_id"))
    // dedupe purchases per (user, ms) keeping max event_id BEFORE the
    // as-of: with several purchases at one ms, DuckDB's ASOF picks an
    // arbitrary row while our window picks deterministically — removing
    // the tie at the source keeps both engines exact (memory:
    // spark-duckdb-oracle-rules — unique ordering keys everywhere)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("event_id"))
      .select(col("user_id"), col("ms"), lit(1).as("is_purchase"),
        col("event_id"))
    val tagged = clicks.unionByName(purchases)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pMs = when(col("is_purchase") === 1, col("ms"))
    val pId = when(col("is_purchase") === 1, col("event_id"))
    tagged
      .withColumn("last_p_ms", last(pMs, ignoreNulls = true).over(w))
      .withColumn("last_p_id", last(pId, ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 0)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("last_p_id").as("purchase_id"),
        (col("ms") - col("last_p_ms")).as("gap_ms"))
  }

  val asofJoinSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
      |), c AS (SELECT * FROM ev WHERE event_type = 'click'),
      |   p AS (
      |     SELECT user_id, ms, MAX(event_id) AS event_id FROM ev
      |     WHERE event_type = 'purchase' GROUP BY user_id, ms
      |   )
      |SELECT c.event_id AS click_id, c.user_id,
      |  p.event_id AS purchase_id, c.ms - p.ms AS gap_ms
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ms > p.ms""".stripMargin

  // ---- range (interval) join ------------------------------------------------

  /** Non-uniform value bands — an interval-lookup dim (the price-tier /
    * IP-range / bucket-config shape). NOT reducible to floor(v/width). */
  private val bands: Seq[(String, Double, Double)] = Seq(
    ("nano", 0, 10), ("micro", 10, 25), ("small", 25, 50), ("mid", 50, 100),
    ("large", 100, 200), ("xl", 200, 350), ("jumbo", 350, 500))

  private val BucketWidth = 50.0

  /** Interval join events.value ∈ [lo, hi) via BUCKETIZATION: each band
    * explodes to the fixed-width buckets it overlaps, the fact side
    * computes its bucket with one floor(), and the join becomes an
    * EQUI-join on bucket + residual range filter. A plain inequality join
    * is a BroadcastNestedLoopJoin — every fact row tested against every
    * band; fine for 7 bands, quadratic death for a 1M-interval dim. The
    * bucketed form shuffles/hashes like any equi-join regardless of dim
    * size (the standard range-join optimization, cf. interval joins in
    * Flink/Databricks). */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = bands.toDF("band", "lo", "hi")
      .withColumn("bucket", explode(sequence(
        floor(col("lo") / BucketWidth).cast("int"),
        floor((col("hi") - lit(0.001)) / BucketWidth).cast("int"))))
    val ev = Tables.events(spark, sfDir)
      .select(col("value"), floor(col("value") / BucketWidth).cast("int").as("bucket"))
    ev.join(broadcast(dim), Seq("bucket"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("value")), 4).as("avg_value"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  val rangeJoinSql: String = {
    val values = bands.map { case (b, lo, hi) => s"('$b', $lo, $hi)" }
      .mkString(", ")
    s"""WITH bands(band, lo, hi) AS (VALUES $values)
       |SELECT band, COUNT(*) AS n_events,
       |  ROUND(AVG(value), 4) AS avg_value,
       |  ROUND(SUM(value), 2) AS sum_value
       |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
       |GROUP BY band""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "q_asof_join"  -> Q(asofJoinSql)(asofJoin),
    "q_range_join" -> Q(rangeJoinSql)(rangeJoin))
}

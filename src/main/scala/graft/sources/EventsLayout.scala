package graft.sources

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables

/** Time-partitioned events serving layout: the storage answer to the one
  * acknowledged scale-tradeoff in the hot path. `Tables.normalizeEventTs`
  * projects the on-disk timestamp to canonical nanos-LONG, which defeats
  * raw `ts` range pushdown into the parquet scan — at 100 TB a scan-heavy
  * consumer must not pay a full-corpus scan for a bounded time window.
  * This layout writes events PARTITIONED BY epoch-day (derived from the
  * canonical ts), so a day-bounded read prunes to the queried days'
  * directories in the driver, before a single event byte moves — the same
  * storage lever `IvfLayout` applies to ANN probes, pointed at time.
  *
  * `src_events_layout` is the correctness face: the first two days of the
  * corpus read THROUGH the layout, aggregated per day (count, distinct
  * users, value mass), hash-matched against a DuckDB oracle that computes
  * the same window from the ORIGINAL parquet — proving the partitioned
  * round-trip preserved membership and content. `EventsLayoutSpec` pins
  * the pruning itself (PartitionFilters on the scan, ≤ 2 of the ~30 day
  * dirs read). Write is once per session per source fingerprint with
  * stale-entry eviction (the BucketedTables cache discipline).
  */
object EventsLayout {

  /** Nanoseconds per day: canonical `ts` is nanos-since-epoch, so
    * `ts div NanosPerDay` is the epoch-day — the same integer DuckDB
    * reaches via `epoch_ms(ts) // 86400000` (floor-of-floor composes for
    * the positive-epoch corpus). */
  val NanosPerDay = 86400000000000L

  // sfDir -> (events source fingerprint, layout dir). Fingerprint in the
  // VALUE so a driver regeneration under the same sfDir evicts the stale
  // layout (and its temp dir) and rewrites, instead of serving days carved
  // from the old bytes while the oracle reads the new.
  private val created = TrieMap.empty[String, (String, String)]

  private def eventsFp(sfDir: String): String =
    SourceFingerprint.key(sfDir, "events.parquet")

  private def deleteQuiet(dir: String): Unit =
    LayoutDirs.deleteQuiet(dir)

  private[graft] def ensure(spark: SparkSession, sfDir: String): String =
    created.synchronized {
      val fp = eventsFp(sfDir)
      created.get(sfDir) match {
        case Some((`fp`, dir)) => dir
        case stale =>
          stale.foreach { case (_, dir) =>
            deleteQuiet(dir)
            created.remove(sfDir)
          }
          val root = Files.createTempDirectory("graft-events-layout")
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            deleteQuiet(root.toString)
          }))
          val dir = root.toString + "/events_by_day"
          // day is derived from the CANONICAL ts (nanos LONG), so the
          // layout is encoding-independent: whatever physical timestamp
          // type the driver ships, the directories mean the same days.
          Tables.events(spark, sfDir)
            .drop("day") // layout-shaped sources already carry it
            .withColumn("day", expr(s"ts div $NanosPerDay"))
            .write.mode("overwrite").partitionBy("day").parquet(dir)
          created.put(sfDir, (fp, dir))
          dir
      }
    }

  /** Read a bounded two-day window through the layout and census it per
    * day. The window anchor (the corpus' first day) comes from one
    * column-pruned min-aggregate over the original events — the stand-in
    * for the "last N days" literal a real dashboard query carries — so the
    * layout read itself plans with LITERAL day partition filters and
    * prunes in the driver. */
  def eventsWindowRead(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    val d0 = Tables.events(spark, sfDir)
      .agg(min(expr(s"ts div $NanosPerDay"))).head().getLong(0)
    spark.read.parquet(dir)
      .filter(col("day").isin(d0, d0 + 1))
      .groupBy(col("day").cast("long").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val eventsWindowReadSql: String =
    """WITH e AS (
      |  SELECT epoch_ms(ts) // 86400000 AS day, user_id, value FROM events
      |), m AS (SELECT MIN(day) AS d0 FROM e)
      |SELECT e.day, COUNT(*) AS n_events,
      |  COUNT(DISTINCT e.user_id) AS n_users,
      |  ROUND(SUM(e.value), 4) AS sum_value
      |FROM e, m WHERE e.day IN (m.d0, m.d0 + 1)
      |GROUP BY e.day""".stripMargin

  /** Star-schema read through the layout: fact (partitioned events) joined
    * to a filtered dim whose day set is only known at RUNTIME — the shape
    * where static partition pruning is impossible and dynamic partition
    * pruning (DPP) is the 100-TB survival mechanism. The dim (distinct
    * days, filtered to the first two) broadcasts; Spark reuses the
    * broadcast as a dynamic partition filter on the fact scan, so only
    * the dim's days are read even though the fact side carries no
    * literal day predicate. `EventsLayoutSpec` pins the
    * DynamicPruningExpression in the plan and the ≤ 2 partitions read;
    * this query is the content face. */
  def eventsDppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    val d0 = Tables.events(spark, sfDir)
      .agg(min(expr(s"ts div $NanosPerDay"))).head().getLong(0)
    // dim from the ORIGINAL table (a stand-in for a calendar/holiday dim):
    // distinct days, filtered dim-side only — the fact scan must learn its
    // day set through the join. The dim key is cast to the layout's
    // inferred partition type (int) so the fact-side join key stays the
    // RAW partition attribute: a cast on the fact side would block the
    // dynamic pruning subquery from reaching the scan.
    val dim = Tables.events(spark, sfDir)
      .select(expr(s"ts div $NanosPerDay").cast("int").as("day")).distinct()
      .filter(col("day") <= d0 + 1)
    spark.read.parquet(dir)
      .join(dim, "day")
      .groupBy(col("day").cast("long").as("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val eventsDppJoinSql: String =
    """WITH e AS (
      |  SELECT epoch_ms(ts) // 86400000 AS day, value FROM events
      |), m AS (SELECT MIN(day) AS d0 FROM e),
      |dim AS (SELECT DISTINCT day FROM e, m WHERE day <= m.d0 + 1)
      |SELECT e.day, COUNT(*) AS n_events,
      |  ROUND(SUM(e.value), 4) AS sum_value
      |FROM e JOIN dim USING (day)
      |GROUP BY e.day""".stripMargin

  def queries: Map[String, Q] = Map(
    "src_events_layout" -> Q(eventsWindowReadSql)(eventsWindowRead),
    "src_events_dpp" -> Q(eventsDppJoinSql)(eventsDppJoin))
}

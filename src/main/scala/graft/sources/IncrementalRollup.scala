package graft.sources

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.Checkpoints.LineageOps
import graft.model.Tables

/** Incrementally-maintained rollup — materialized-view maintenance as a
  * storage operator. A 100-TB pipeline cannot recompute its daily
  * (day, event_type) rollup from the full fact table every time a new
  * batch lands; the maintenance move is: aggregate ONLY the delta, then
  * merge it into the materialized rollup by rewriting ONLY the day
  * partitions the delta touches (dynamic partition overwrite — the
  * INSERT OVERWRITE ... PARTITION shape). Cost per batch is
  * O(delta + touched-partition partials), independent of the fact
  * table's total size — the property that keeps a rollup maintainable
  * when the base table is 100 TB and the delta is one day.
  *
  * The maintained state is sum/count PARTIALS, so merge = re-aggregate
  * (counts add exactly; double sums add one more partial level — the
  * same fold-order freedom any distributed sum already has). AVG-style
  * ratios must be derived at READ time from the partials, never stored.
  *
  * Demonstrated here by construction: the base build aggregates every
  * day EXCEPT the corpus' last; the last day is then merged as the
  * delta batch. `src_incr_rollup` is the correctness face — the final
  * rollup read back, value-equal to the DuckDB oracle's full recompute
  * over the ORIGINAL events, proving base+merge lost nothing.
  * `IncrementalRollupSpec` pins the two properties the oracle cannot
  * see: the merge's read of the existing rollup partition-prunes to the
  * touched days, and the untouched day directories come through the
  * merge byte-identical (only the delta's partitions were rewritten).
  * Build is once per session per source fingerprint with stale-entry
  * eviction (the EventsLayout cache discipline). */
object IncrementalRollup {

  // sfDir -> (events source fingerprint, rollup dir)
  private val created = TrieMap.empty[String, (String, String)]

  private def eventsFp(sfDir: String): String =
    SourceFingerprint.key(sfDir, "events.parquet")

  private def deleteQuiet(dir: String): Unit =
    LayoutDirs.deleteQuiet(dir)

  /** Per-(day, event_type) partials of an event slice — the one shape
    * both the base build and every delta batch aggregate to. */
  private def partials(events: DataFrame): DataFrame =
    events
      // delta batches re-read from the day layout already carry `day`;
      // drop-then-derive keeps the build warning-clean (no-op otherwise)
      .drop("day")
      .withColumn("day", expr(s"ts div ${EventsLayout.NanosPerDay}"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Full (non-incremental) rollup build of `events` into `dir`. */
  private[graft] def buildBase(events: DataFrame, dir: String): Unit =
    partials(events)
      .write.mode("overwrite").partitionBy("day").parquet(dir)

  /** Merge one delta batch of raw events into the rollup at `dir`,
    * rewriting only the day partitions the delta touches. */
  private[graft] def mergeDelta(
      spark: SparkSession, dir: String, delta: DataFrame): Unit = {
    val deltaAgg = partials(delta).truncateLineage()
    // the touched-day set is driver-side by design: a maintenance batch
    // spans hours-to-days, so this is a bounded handful of literals —
    // and literals are what let the existing-rollup read below prune at
    // PLAN time (IncrementalRollupSpec gates it)
    val touched = deltaAgg.select(col("day")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touched.nonEmpty) {
      // bootstrap: the very first batch of a maintenance STREAM arrives
      // before any base build — there is no layout to read partials from.
      // "Has a layout" means the dir holds at least one parquet DATA file:
      // a dir containing only _SUCCESS/_last_batch (an all-one-day base
      // build's empty half, or an empty first micro-batch's marker) would
      // crash the read with UNABLE_TO_INFER_SCHEMA if mistaken for data.
      val hasLayout = LayoutDirs.hasParquetData(dir)
      val existing =
        if (!hasLayout) deltaAgg.limit(0)
        else touchedPartials(spark, dir, touched)
          // lineage cut: the merged frame is about to OVERWRITE partitions
          // of the very path it reads (the read-modify-write hazard Spark
          // rejects as "cannot overwrite a path being read from").
          // Bounded: touched days × event types rows.
          .truncateLineage()
      existing.unionByName(deltaAgg)
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("sum_value")).as("sum_value"))
        .write.mode("overwrite")
        // dynamic: replace ONLY the day= dirs present in this frame —
        // passed as a WRITE option, so no session conf is mutated
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(dir)
    }
  }

  /** The existing rollup's partials for `days` only — a literal
    * partition-pruned read (the spec asserts ≤ days.size dirs touched). */
  private[graft] def touchedPartials(
      spark: SparkSession, dir: String, days: Seq[Long]): DataFrame =
    spark.read.parquet(dir)
      // int literals: the inferred partition column is IntegerType, and a
      // cast planted on the ATTRIBUTE side would defeat partition pruning
      .filter(col("day").isin(days.map(_.toInt): _*))
      .select(col("day").cast("long").as("day"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Build base (all days but the last) + merge the last day as the
    * delta, once per source fingerprint; returns the rollup dir. */
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
          val root = Files.createTempDirectory("graft-incr-rollup")
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            deleteQuiet(root.toString)
          }))
          val dir = root.toString + "/rollup_by_day"
          val events = Tables.events(spark, sfDir)
          val dmax = events
            .agg(max(expr(s"ts div ${EventsLayout.NanosPerDay}")))
            .head().getLong(0)
          val dayCol = expr(s"ts div ${EventsLayout.NanosPerDay}")
          buildBase(events.filter(dayCol < dmax), dir)
          mergeDelta(spark, dir, events.filter(dayCol === dmax))
          created.put(sfDir, (fp, dir))
          dir
      }
    }

  /** Read the maintained rollup back in full — every (day, event_type)
    * partial, ratios derived from partials at read time. Value-equal to
    * a full recompute iff base+merge lost nothing. */
  def rollupRead(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    spark.read.parquet(dir)
      .select(col("day").cast("long").as("day"), col("event_type"),
        col("n_events"),
        round(col("sum_value"), 4).as("sum_value"),
        round(col("sum_value") / col("n_events"), 6).as("avg_value"))
  }

  val rollupReadSql: String =
    """SELECT epoch_ms(ts) // 86400000 AS day, event_type,
      |  COUNT(*) AS n_events,
      |  ROUND(SUM(value), 4) AS sum_value,
      |  ROUND(SUM(value) / COUNT(*), 6) AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Test hook: drop every cached rollup (mirrors the other layout
    * caches' clear contract). */
  private[graft] def clearCache(): Unit = created.synchronized {
    created.values.foreach { case (_, dir) => deleteQuiet(dir) }
    created.clear()
  }

  def queries: Map[String, Q] = Map(
    "src_incr_rollup" -> Q(rollupReadSql)(rollupRead))
}

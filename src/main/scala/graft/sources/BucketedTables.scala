package graft.sources

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables

/** Bucketed-layout source: the STORAGE lever for repeated fact-fact joins
  * at 100 TB. Both sides of a join are written once with
  * `bucketBy(k, joinKey).sortBy(joinKey)`; every later join on that key
  * plans with ZERO Exchange and ZERO Sort — each bucket pair joins
  * locally, the shuffle was paid once at write time and amortizes over
  * every downstream query. (The reference has no storage layer at all —
  * it proxies inserts — so this is a pure extension; the bucket count is
  * sized from source bytes by `bucketCount` — 8 at the test SFs, growing
  * with the data so bucket-local parallelism tracks cluster width.)
  *
  * `BucketedJoinSpec` is the plan gate (asserts no `Exchange`, join is
  * `SortMergeJoin`); `src_bucketed_join` is the correctness face: same
  * numbers as the plain parquet join the DuckDB oracle runs.
  */
object BucketedTables {

  // one bucketed copy per sfDir per JVM; Verify/Bench run many queries
  // in one session, so creation amortizes exactly like the shared caches.
  // Keyed by sfDir with the SOURCE FINGERPRINT of both inputs in the
  // VALUE (the Dedup-cache pattern, round-9 ADVICE fix): a driver
  // regeneration of orders/lineitem under the same sfDir misses the
  // fingerprint check, so the stale entry — and its temp warehouse dir —
  // is evicted and the bucketed copy rewritten, instead of a fresh key
  // accreting next to an orphaned layout of the old bytes. Creation runs
  // under the cache monitor (TrieMap.getOrElseUpdate could run the
  // builder twice concurrently, colliding on DROP/saveAsTable of the
  // shared bk_* names).
  private val created = TrieMap.empty[String, (String, String, String, String)]

  private def sourcesFp(sfDir: String): String =
    SourceFingerprint.key(sfDir, "orders.parquet") + "|" +
      SourceFingerprint.key(sfDir, "lineitem.parquet")

  private def dirBytes(sfDir: String, table: String): Long =
    try {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir, table))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    } catch { case _: Exception => 0L }

  /** Bucket count sized from source bytes (~48 MB of raw source per
    * bucket, floor 8, cap 4096): a fixed count is the classic bucketing
    * trap — 8 buckets caps every downstream bucket-local join at 8 tasks
    * regardless of cluster width (measured: the sf10 serving join ran
    * 8-wide on 32 cores, turning IO variance straight into wall time).
    * Sizing by bytes keeps the gate/test SFs at 8 (deterministic layout
    * for the plan specs) while a 10× corpus gets ~30 and a cluster-scale
    * table gets thousands — the "executors × cores" sizing the scaladoc
    * above describes, derived instead of hand-picked. Deterministic given
    * the source bytes, so the fingerprinted cache key stays valid. */
  private[graft] def bucketCountForBytes(bytes: Long): Int =
    math.min(4096L, math.max(8L, bytes / (48L << 20))).toInt

  private[graft] def bucketCount(sfDir: String): Int =
    bucketCountForBytes(
      dirBytes(sfDir, "orders.parquet") + dirBytes(sfDir, "lineitem.parquet"))

  private def deleteQuiet(dir: String): Unit =
    LayoutDirs.deleteQuiet(dir)

  /** Create (once per source fingerprint) bucketed copies of
    * orders+lineitem for this sfDir; returns the two table names. */
  def ensure(spark: SparkSession, sfDir: String): (String, String) =
    created.synchronized {
      val fp = sourcesFp(sfDir)
      created.get(sfDir) match {
        case Some((`fp`, to, tl, _)) => (to, tl)
        case stale =>
          stale.foreach { case (_, to, tl, wh) =>
            try spark.sql(s"DROP TABLE IF EXISTS $to")
            catch { case _: Exception => () }
            try spark.sql(s"DROP TABLE IF EXISTS $tl")
            catch { case _: Exception => () }
            deleteQuiet(wh)
            created.remove(sfDir)
          }
          val token = sfDir.replaceAll("[^A-Za-z0-9]", "_")
          val (to, tl) = (s"bk_orders$token", s"bk_lineitem$token")
          val wh = Files.createTempDirectory("graft-bucketed").toString
          spark.sql(s"DROP TABLE IF EXISTS $to")
          spark.sql(s"DROP TABLE IF EXISTS $tl")
          val k = bucketCount(sfDir)
          Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_orderpriority"))
            .write.bucketBy(k, "o_orderkey").sortBy("o_orderkey")
            .option("path", s"$wh/$to").saveAsTable(to)
          Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_extendedprice"))
            .write.bucketBy(k, "l_orderkey").sortBy("l_orderkey")
            .option("path", s"$wh/$tl").saveAsTable(tl)
          created.put(sfDir, (fp, to, tl, wh))
          (to, tl)
      }
    }

  /** Join the bucketed copies (hint("merge") keeps the fact-fact shape a
    * broadcast would mask at test scale), roll up per order — the
    * bucket-aligned agg needs no exchange either, since
    * HashPartitioning(o_orderkey) already clusters the grouping keys —
    * then summarize to 16 audit rows. The only shuffle in the whole plan
    * is the final 16-group summary. */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (to, tl) = ensure(spark, sfDir)
    spark.table(to).hint("merge")
      .join(spark.table(tl), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n_items"))
      .groupBy((col("o_orderkey") % 16).as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_items")).as("n_items"),
        round(sum(col("rev")), 2).as("revenue"))
  }

  val bucketedJoinSql: String =
    """WITH per_order AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    SUM(l_extendedprice) AS rev, COUNT(*) AS n_items
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2
      |)
      |SELECT o_orderkey % 16 AS bucket,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(n_items) AS BIGINT) AS n_items,
      |  ROUND(SUM(rev), 2) AS revenue
      |FROM per_order GROUP BY 1""".stripMargin

  def queries: Map[String, Q] = Map(
    "src_bucketed_join" -> Q(bucketedJoinSql)(bucketedJoin))
}

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
  * it proxies inserts — so this is a pure extension; at cluster scale the
  * bucket count would be sized to executors × cores, here 8 for
  * local[32] test data.)
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

  private def deleteQuiet(dir: String): Unit =
    try {
      import java.nio.file.{Files => F, Paths}
      import java.util.Comparator
      F.walk(Paths.get(dir)).sorted(Comparator.reverseOrder())
        .forEach(p => F.deleteIfExists(p))
    } catch { case _: Exception => () }

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
          Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_orderpriority"))
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .option("path", s"$wh/$to").saveAsTable(to)
          Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_extendedprice"))
            .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
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

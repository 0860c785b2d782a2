package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only check.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(sql))
  def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}

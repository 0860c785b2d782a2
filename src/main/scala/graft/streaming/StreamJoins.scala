package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of the batch as-of
  * join (operators/TemporalJoins): every click pairs with same-user
  * purchases from the preceding `windowMinutes`, or emits unmatched
  * (left outer) once the watermark proves no purchase can still arrive.
  *
  * Scale design: both sides are watermarked and the join condition is an
  * equi-key (user_id) PLUS a bounded time range — exactly what Spark
  * needs to (a) shuffle both streams once on user_id and (b) expire join
  * state as the watermark advances, so state holds only `windowMinutes +
  * lateness` of data per side, regardless of stream age. An unbounded
  * condition (no time range) would accumulate state forever. */
object StreamJoins {

  /** `clicks` = streaming (c_ts TIMESTAMP, user_id, click_id);
    * `purchases` = streaming (p_ts TIMESTAMP, p_user_id, purchase_id).
    * Emits (click_id, user_id, purchase_id NULLABLE, gap_sec). */
  def clicksWithRecentPurchases(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30, lateness: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("c_ts", lateness)
    val p = purchases.withWatermark("p_ts", lateness)
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("c_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
          col("p_ts") <= col("c_ts"),
        "leftOuter")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        (unix_timestamp(col("c_ts")) - unix_timestamp(col("p_ts")))
          .as("gap_sec"))
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamJoins

/** Stream-stream interval join: in-window purchases pair with clicks,
  * out-of-window ones don't, and unmatched clicks emit (left outer) only
  * after the watermark proves no purchase can still arrive. */
class StreamJoinsSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("interval join pairs in-window purchases; left-outer after watermark") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamJoins.clicksWithRecentPurchases(
      clicks.toDF().toDF("c_ts", "user_id", "click_id"),
      purchases.toDF().toDF("p_ts", "p_user_id", "purchase_id"),
      windowMinutes = 30)
    val q = out.writeStream.format("memory")
      .queryName("sj_out").outputMode("append").start()
    try {
      // user 1: purchase at 10, clicks at 20 (in window) and 50 (in window:
      // 50-10=40 > 30 → OUT of window); user 2: click with no purchase
      purchases.addData(Seq((ts(10), 1L, 100L)))
      clicks.addData(Seq((ts(20), 1L, 1L), (ts(50), 1L, 2L), (ts(25), 2L, 3L)))
      q.processAllAvailable()
      // advance BOTH watermarks far enough to close unmatched clicks
      purchases.addData(Seq((ts(10000), 9L, 999L)))
      clicks.addData(Seq((ts(10000), 9L, 99L)))
      q.processAllAvailable()
      purchases.addData(Seq((ts(10001), 9L, 998L)))
      clicks.addData(Seq((ts(10001), 9L, 98L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql(
      """SELECT click_id, purchase_id, gap_sec FROM sj_out
        |WHERE user_id IN (1, 2) ORDER BY click_id""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq(
      (1L, 100L, 600L), // click 20 ⋈ purchase 10: within 30-min window
      (2L, -1L, -1L),   // click 50: purchase is 40 min old — outside window
      (3L, -1L, -1L)))  // user 2 never purchased
  }
}

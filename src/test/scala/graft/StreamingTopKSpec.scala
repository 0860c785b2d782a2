package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingTopK

/** The live per-key leaderboard: converges to the batch top-k over
  * everything seen, emits only on change, dedups replayed rows, and is
  * insensitive to arrival order (the set-property the operator's no-
  * watermark design relies on). */
class StreamingTopKSpec extends SparkSuite {

  private def collectRows(table: String): Seq[(Long, Int, Double, Long)] =
    spark.sql(s"SELECT key, rank, v, tie FROM $table").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSeq

  test("leaderboard converges to batch top-k; quiet keys emit nothing") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, Double, Long)]
    val q = StreamingTopK.topK(stream.toDF().toDF("key", "v", "tie"), k = 2)
      .writeStream.format("memory").queryName("stopk")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, 5.0, 1L), (1L, 3.0, 2L),
        (2L, 7.0, 3L), (2L, 6.5, 7L)))
      q.processAllAvailable()
      assert(collectRows("stopk").toSet == Set(
        (1L, 1, 5.0, 1L), (1L, 2, 3.0, 2L),
        (2L, 1, 7.0, 3L), (2L, 2, 6.5, 7L)))

      // batch 2: a better key-1 row evicts the worst; key 2's FULL board
      // sees only a below-the-bar row (unchanged — must not emit); key 3
      // appears
      stream.addData(Seq((1L, 9.0, 4L), (2L, 1.0, 5L), (3L, 2.0, 6L)))
      q.processAllAvailable()
      assert(collectRows("stopk").toSet == Set(
        // batch-1 emissions stay in the sink
        (1L, 1, 5.0, 1L), (1L, 2, 3.0, 2L),
        (2L, 1, 7.0, 3L), (2L, 2, 6.5, 7L),
        // batch-2: key 1's refreshed board and key 3's debut; key 2 silent
        (1L, 1, 9.0, 4L), (1L, 2, 5.0, 1L), (3L, 1, 2.0, 6L)))
    } finally q.stop()
  }

  test("replayed rows dedup by tie; evicted values never re-enter") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, Double, Long)]
    val q = StreamingTopK.topK(stream.toDF().toDF("key", "v", "tie"), k = 3)
      .writeStream.format("memory").queryName("stopk2")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, 4.0, 10L), (1L, 6.0, 11L)))
      q.processAllAvailable()
      // replay both rows (at-least-once delivery) plus one genuinely new
      stream.addData(Seq((1L, 4.0, 10L), (1L, 6.0, 11L), (1L, 5.0, 12L)))
      q.processAllAvailable()
      val rows = collectRows("stopk2")
      assert(rows.sorted == Seq(
        // batch 1: the two-entry board
        (1L, 1, 6.0, 11L), (1L, 2, 4.0, 10L),
        // batch 2: the refreshed three-entry board — replays added nothing
        (1L, 1, 6.0, 11L), (1L, 2, 5.0, 12L), (1L, 3, 4.0, 10L)).sorted)
    } finally q.stop()
  }
}

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

  test("idle TTL evicts a key's board; a re-appearing key restarts empty") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, Double, Long)]
    // With ProcessingTimeTimeout the engine runs no-data batches forever
    // (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    // unconditionally true) — `processAllAvailable` NEVER returns on such
    // a query, so this spec polls the sink against a deadline instead,
    // and throttles the perpetual batch loop with a real trigger.
    val q = StreamingTopK.topK(stream.toDF().toDF("key", "v", "tie"),
        k = 1, idleTtlMillis = Some(200L))
      .writeStream.format("memory").queryName("stopk3")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .start()
    def awaitRows(expect: Set[(Long, Int, Double, Long)]): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        collectRows("stopk3").toSet != expect) Thread.sleep(50)
      assert(collectRows("stopk3").toSet == expect)
    }
    try {
      stream.addData(Seq((1L, 9.0, 1L)))
      awaitRows(Set((1L, 1, 9.0, 1L)))
      // key 1 sits idle well past the TTL: a no-data batch fires its
      // timeout and drops the board (emitting nothing: eviction is state
      // cleanup, not output)
      Thread.sleep(1000)
      stream.addData(Seq((2L, 5.0, 2L)))
      awaitRows(Set((1L, 1, 9.0, 1L), (2L, 1, 5.0, 2L)))
      // a WORSE key-1 row now debuts at rank 1: only an evicted (empty)
      // board admits it — surviving state [9.0] would have stayed silent
      stream.addData(Seq((1L, 1.0, 3L)))
      awaitRows(Set((1L, 1, 9.0, 1L), (2L, 1, 5.0, 2L), (1L, 1, 1.0, 3L)))
    } finally q.stop()
  }

  test("without a TTL, an idle key's board survives (default unchanged)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, Double, Long)]
    val q = StreamingTopK.topK(stream.toDF().toDF("key", "v", "tie"), k = 1)
      .writeStream.format("memory").queryName("stopk4")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, 9.0, 1L)))
      q.processAllAvailable()
      Thread.sleep(500)
      stream.addData(Seq((2L, 5.0, 2L)))
      q.processAllAvailable()
      // below-the-bar row for the long-idle key: state survived, so no emit
      stream.addData(Seq((1L, 1.0, 3L)))
      q.processAllAvailable()
      assert(collectRows("stopk4").toSet ==
        Set((1L, 1, 9.0, 1L), (2L, 1, 5.0, 2L)))
    } finally q.stop()
  }
}

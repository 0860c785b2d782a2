package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingQuantizer

/** Streaming IVF assignment: vectors assigned in-flight must land in
  * EXACTLY the cells the batch training assigned them to (same rounded
  * distances, same tie-break), and the census must window correctly. */
class StreamingQuantizerSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("streamed assignments match the batch trained assignment exactly") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val model = StreamingQuantizer.modelFor(s, sf0001)
    val batch = graft.operators.Similarity.kmeansAssignment(s, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // stream the first 40 corpus vectors through in two micro-batches
    val vecs = graft.model.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Long, Array[Float])]
    val out = StreamingQuantizer.assign(
      stream.toDF().toDF("vec_id", "embedding"), model)
    val q = out.writeStream.format("memory")
      .queryName("squant").outputMode("append").start()
    try {
      stream.addData(vecs.take(20).toSeq)
      q.processAllAvailable()
      stream.addData(vecs.drop(20).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.sql("SELECT vec_id, cell, d FROM squant")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(streamed.size == vecs.length)
    streamed.foreach { case (id, (cell, d)) =>
      assert(batch(id) == ((cell, d)),
        s"vec $id: streamed ($cell, $d) != batch ${batch(id)}")
    }
  }

  test("streamed PQ codes match the batch trained codes exactly") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val pqModel = StreamingQuantizer.pqModelFor(s, sf0001)
    // batch truth: (vec_id, sub) -> (cell, d) from the trained codes
    val batch = graft.operators.Similarity.pqTrainedCodes(s, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val vecs = graft.model.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Long, Array[Float])]
    val out = StreamingQuantizer.encodePq(
      stream.toDF().toDF("vec_id", "embedding"), pqModel)
      .select(col("vec_id"), explode(col("codes")).as("c"))
      .select(col("vec_id"), col("c.sub"), col("c.cell"), col("c.d"))
    val q = out.writeStream.format("memory")
      .queryName("spq").outputMode("append").start()
    try {
      stream.addData(vecs.take(20).toSeq)
      q.processAllAvailable()
      stream.addData(vecs.drop(20).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.sql("SELECT vec_id, sub, cell, d FROM spq")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed.size == vecs.length * graft.operators.Similarity.PqM,
      s"expected PqM codes per vector, got ${streamed.size}")
    streamed.foreach { case (k, code) =>
      assert(batch(k) == code, s"vec/sub $k: streamed $code != batch ${batch(k)}")
    }
  }

  test("cell census windows arrivals with bounded state") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val model = StreamingQuantizer.modelFor(s, sf0001)
    val v = graft.model.Tables.embeddings(s, sf0001)
      .filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[(Timestamp, Long, Array[Float])]
    val assigned = StreamingQuantizer.assign(
      stream.toDF().toDF("ts", "vec_id", "embedding"), model)
    val census = StreamingQuantizer.cellCensus(assigned, "ts")
    val q = census.writeStream.format("memory")
      .queryName("scensus").outputMode("append").start()
    try {
      stream.addData(v.map { case (id, e) => (ts(0), id, e) }.toSeq)
      q.processAllAvailable()
      // advance the watermark far past the first window so it emits
      stream.addData(Seq((ts(30), 999L, v.head._2)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql("SELECT cell, n_vecs FROM scensus")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._2).sum == 4L,
      s"first-window census must cover the 4 vectors, got ${rows.toSeq}")
  }
}

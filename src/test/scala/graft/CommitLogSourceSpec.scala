package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CommitLogIngest

/** The readStream direction of the commit-log table: versions are
  * offsets, each trigger delivers exactly the new versions' rows, and a
  * reader restarted from its checkpoint resumes where it stopped — the
  * downstream-pipeline contract (exactly-once per version through the
  * engine's offset log). */
class CommitLogSourceSpec extends SparkSuite {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-clsrc-$prefix")
    d.toFile.deleteOnExit()
    d.toString
  }

  private class Collector {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def add(rows: Seq[Long]): Unit = synchronized { buf ++= rows }
    def all: Seq[Long] = synchronized { buf.toList }
  }

  test("versions stream as micro-batches exactly once, across a reader restart") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val table = tmp("table")
    val writerCkpt = tmp("wck")
    val readerCkpt = tmp("rck")

    // writer: commit two waves before the reader exists (schema inference
    // needs a committed version)
    val in = MemoryStream[(Long, String)]
    val writer = CommitLogIngest.start(
      in.toDF().toDF("id", "payload"), table, writerCkpt, triggerSec = 0)
    def wave(w: Int): Unit = {
      in.addData((0 until 50).map(i => (w * 50L + i, s"p$w-$i")))
      writer.processAllAvailable()
    }
    val got = new Collector
    def startReader() = s.readStream
      .format("graft-commitlog").option("path", table).load()
      .writeStream.option("checkpointLocation", readerCkpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.add(b.select("id").collect().map(_.getLong(0)).toSeq)
      }
      .start()

    try {
      wave(0); wave(1)
      val r1 = startReader()
      try {
        r1.processAllAvailable()
        assert(got.all.sorted == (0L until 100L),
          "reader did not deliver the pre-existing versions exactly once")
        wave(2)
        r1.processAllAvailable()
        assert(got.all.sorted == (0L until 150L),
          "reader missed or duplicated a live commit")
      } finally r1.stop()
      // two more commits while NO reader runs, then restart from the
      // same checkpoint: only the unseen versions may arrive
      wave(3); wave(4)
      val r2 = startReader()
      try {
        r2.processAllAvailable()
        assert(got.all.length == 250 && got.all.sorted == (0L until 250L),
          "restarted reader replayed or skipped versions")
      } finally r2.stop()
    } finally writer.stop()
  }
}

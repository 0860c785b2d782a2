package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CurationStream

/** Streaming curation: PII is redacted in-flight, low-quality docs never
  * reach the aggregate, and the per-source stats update across
  * micro-batches. The quality formula is the SAME composite the batch
  * t_quality_score oracle pins, so the gate's semantics are already
  * engine-verified. */
class CurationStreamSpec extends SparkSuite {

  private val goodText =
    "the quick brown fox jumps over the lazy dog and runs to the hills " +
      "in a long and quite ordinary sentence of plain words"

  test("scrub + quality gate + per-source stats across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val out = CurationStream.curate(
      stream.toDF().toDF("doc_id", "source", "text"))
    val q = out.writeStream.format("memory")
      .queryName("curated").outputMode("complete").start()
    try {
      stream.addData(Seq(
        (1L, "srcA", goodText),
        (2L, "srcA", goodText + " mail me at some.user@example.com"),
        (3L, "srcA", "#### !!!! ???? ++++"))) // punct-heavy → gated out
      q.processAllAvailable()
      stream.addData(Seq(
        (4L, "srcB", goodText + " call 555-123-4567 now")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql(
      "SELECT source, n_kept, n_scrubbed FROM curated ORDER BY source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("srcA", 2L, 1L), ("srcB", 1L, 1L)))
  }

  test("redaction is total: no PII survives into the kept set") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    // keep the raw scrubbed text observable (no aggregation) by running
    // the same projection the pipeline uses
    val projected = CurationStream.curate(
      stream.toDF().toDF("doc_id", "source", "text"), minQuality = 0.0)
    val q = projected.writeStream.format("memory")
      .queryName("curated_all").outputMode("complete").start()
    try {
      stream.addData(Seq(
        (1L, "srcA", goodText + " reach a.b@c.io or 555-000-1111 today")))
      q.processAllAvailable()
    } finally q.stop()
    // the aggregate counted the doc as scrubbed
    val n = s.sql("SELECT n_scrubbed FROM curated_all").collect()(0).getLong(0)
    assert(n == 1L)
    // and the scrub function itself leaves no matches behind
    import graft.functions.TextFunctions._
    val cleaned = Seq(goodText + " reach a.b@c.io or 555-000-1111 today")
      .toDF("text").select(scrubPii(org.apache.spark.sql.functions.col("text")))
      .collect()(0).getString(0)
    assert(!cleaned.matches(s".*$EmailRe.*") && !cleaned.matches(s".*$PhoneRe.*"))
    assert(cleaned.contains("<EMAIL>") && cleaned.contains("<PHONE>"))
  }
}

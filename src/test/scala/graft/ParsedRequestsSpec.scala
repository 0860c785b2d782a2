package graft

import org.apache.spark.sql.functions._
import graft.operators.ProxyQueries
import graft.sources.ParsedRequests
import graft.streaming.IngestPipeline

/** Typed payload parsing: batch-level round-trip (parsing the aggregated
  * concat batches yields the same typed rows as parsing the individual
  * requests — i.e. the concat step is lossless for all three formats). */
class ParsedRequestsSpec extends SparkSuite {

  test("parse ∘ aggregateBatch ≡ parse (multiset, all formats)") {
    val req = ProxyQueries.requests(spark, sf0001).select("uri", "body")
    val direct = ParsedRequests.parse(req)
    val batched = ParsedRequests.parse(
      IngestPipeline.aggregateBatch(req).select("uri", "body"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("tbl", "user_id", "v").count()
    assert(canon(direct).exceptAll(canon(batched)).isEmpty)
    assert(canon(batched).exceptAll(canon(direct)).isEmpty)
    assert(direct.count() == batched.count() && direct.count() > 0)
  }

  test("parse extracts typed rows from each wire format") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("/?query=INSERT%20INTO%20t%20VALUES", "(7,70),(8,80)"),
      ("/?query=INSERT%20INTO%20t%20FORMAT%20TSV", "9\t90\n10\t100\n"),
      ("/?query=INSERT%20INTO%20t%20FORMAT%20CSV", "11,110\n")
    ).toDF("uri", "body")
    val rows = ParsedRequests.parse(df)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((7L, 70L), (8L, 80L), (9L, 90L), (10L, 100L), (11L, 110L)))
  }
}

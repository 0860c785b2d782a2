package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Streaming twin of the batch curation path (PII scrub → quality gate →
  * per-source intake stats): documents arrive as a stream, redaction and
  * scoring are pure row-local projections (the streaming plan IS the
  * batch plan under a trigger — no state), and only the final per-source
  * aggregation carries streaming state, updated per micro-batch.
  *
  * At 100 TB/day this is the shape that matters: the expensive text work
  * is stateless and scales with executors; the stateful tail aggregates
  * a handful of rows per source. */
object CurationStream {

  /** docs: streaming frame with (doc_id, source, text). Output (update
    * mode): per source — docs kept, docs that carried PII, mean quality
    * of the kept set. */
  def curate(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val scrubbed = docs
      .withColumn("clean", scrubPii(col("text")))
      .withColumn("had_pii", col("clean") =!= col("text"))
      .drop("text").withColumnRenamed("clean", "text")
    graft.operators.TextAnalysis.withQuality(scrubbed)
      .filter(col("quality") >= minQuality)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(when(col("had_pii"), 1L).otherwise(0L)).as("n_scrubbed"),
        round(avg(col("quality")), 4).as("avg_quality"))
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming exact dedup — the streaming twin of the batch
  * `d_exact_stats` canonicalization: normalize text to a token
  * fingerprint (SAME md5-of-normalized-tokens key as the batch path, so a
  * corpus deduped incrementally matches one deduped in batch), then keep
  * the first arrival per fingerprint.
  *
  * Scale design: `dropDuplicatesWithinWatermark` holds ONE state entry per
  * fingerprint only until the watermark passes its event time — state is
  * bounded by the dedup horizon, not corpus size (a plain streaming
  * dropDuplicates grows state forever, the classic OOM-in-week-two bug).
  * The horizon is the deliverable knob: duplicates arriving farther apart
  * than `horizon` are re-admitted, which a periodic batch `d_exact_stats`
  * compaction then catches — the standard lambda split for dedup. */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with (ts TIMESTAMP, doc_id,
    * text, ...). Emits first-arrival docs with their fingerprint. */
  def byFingerprint(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(
        TextFunctions.tokens(col("text"))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
}

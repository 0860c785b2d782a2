package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time sessionization with watermarking — the streaming twin of the
  * batch `q_sessionize` operator (Analytics.sessionize). The reference is
  * processing-time-only (SURVEY.md §2.5: no event time, no late data);
  * this is the extension a real event pipeline needs.
  *
  * `session_window` keeps per-(user, session) state that closes
  * `gap` after the last event; the watermark bounds state retention and
  * admits late events up to `lateness`. State is partitioned by user_id —
  * high-cardinality, so it shards evenly across 1000 executors; no global
  * ordering is ever required (contrast with the batch form's per-user
  * window sort).
  */
object EventSessions {

  /** `events` must be a streaming DataFrame with (ts TIMESTAMP, user_id,
    * event_id) columns. Emits one row per closed session (append mode). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_event"),
        max(col("ts")).as("last_event"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("first_event"), col("last_event"))
}

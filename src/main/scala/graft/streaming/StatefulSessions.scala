package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via flatMapGroupsWithState — the
  * escape hatch for semantics `session_window` cannot express. Here the
  * cross-session feature is a PER-USER SESSION INDEX (this is the user's
  * n-th session) plus a distinct-event-type tally: session_window state is
  * per-(user, session) and forgets everything at close, so a running
  * session counter needs user-lifetime state.
  *
  * State design for scale: one small fixed-size record per ACTIVE user
  * (index, start/last ms, counts) — not per event; the event-time timeout
  * closes idle sessions as the watermark passes last+gap, so state size
  * tracks concurrently-active users, and the state store shards by user
  * across executors. Closing on timeout is safe: once watermark > last+gap,
  * any still-admissible event (ts > watermark) would exceed the gap and
  * open a new session anyway. */
object StatefulSessions {

  case class Ev(ts: Timestamp, user_id: Long, event_type: String)

  /** `open = false` marks a timeout-closed session whose record is kept
    * ONLY to carry sessionIdx forward — the user-lifetime counter is the
    * whole reason this operator exists, so timeout must not erase it.
    * One small record per user ever seen; a deployment with truly
    * unbounded user churn would add a long TTL eviction on top. */
  case class SessState(sessionIdx: Long, startMs: Long, lastMs: Long,
      n: Long, types: Set[String], open: Boolean = true)

  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
      n_types: Long, start_ms: Long, duration_ms: Long)

  private def close(user: Long, st: SessState): SessionOut =
    SessionOut(user, st.sessionIdx, st.n, st.types.size.toLong, st.startMs,
      st.lastMs - st.startMs)

  /** `events` must be a streaming DataFrame with (ts TIMESTAMP, user_id,
    * event_type). Emits one row per closed session, append mode. */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L,
      lateness: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .select("ts", "user_id", "event_type").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, evs, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            // close the session but KEEP the state record (open = false):
            // removing it would reset the per-user session index to 1 on
            // the user's next visit
            state.update(st.copy(open = false))
            Iterator.single(close(user, st))
          } else {
            // order within the batch; cross-batch disorder is bounded by
            // the watermark and either lands in the open session (merged
            // below) or would exceed the gap regardless
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            val closed = scala.collection.mutable.Buffer.empty[SessionOut]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val ms = e.ts.getTime
              if (st == null)
                st = SessState(1L, ms, ms, 1L, Set(e.event_type))
              else if (!st.open) // resume after a timeout close: index + 1
                st = SessState(st.sessionIdx + 1, ms, ms, 1L, Set(e.event_type))
              else if (ms - st.lastMs > gapMs) {
                closed += close(user, st)
                st = SessState(st.sessionIdx + 1, ms, ms, 1L, Set(e.event_type))
              } else
                // a cross-batch late event may precede the session start
                // (within watermark): extend BOTH ends, like session_window
                st = st.copy(startMs = math.min(st.startMs, ms),
                  lastMs = math.max(st.lastMs, ms), n = st.n + 1,
                  types = st.types + e.event_type)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
            closed.iterator
          }
      }
  }
}

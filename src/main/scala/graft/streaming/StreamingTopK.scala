package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `TopKPerKey` operator: a live per-key
  * leaderboard maintained in `flatMapGroupsWithState`.
  *
  * Top-k is a SET property — insertion-order-insensitive and monotone
  * (an element once evicted can never re-enter, since the bar only
  * rises) — so no watermark or event-time reasoning is needed: late and
  * out-of-order rows merge exactly like on-time ones, and replays are
  * absorbed by the by-tie dedup. State is O(k) per key (the k held
  * entries; nothing per-event), the streaming mirror of the batch
  * operator's bounded heaps; unbounded KEY churn is the one thing that
  * grows state, so `idleTtlMillis` bounds it: a key silent for the TTL is
  * evicted (ProcessingTimeTimeout), the same discipline as
  * [[StatefulSessions]]. A re-appearing key restarts an empty leaderboard
  * — the deployment trade-off a TTL always implies. `None` keeps state
  * forever, for bounded key domains (hosts, tables) where eviction would
  * only lose data.
  *
  * Emits the full refreshed leaderboard of a key ONLY when its membership
  * or order changed in the batch (Update output mode) — quiet keys cost
  * zero output rows. */
object StreamingTopK {

  case class In(key: Long, v: Double, tie: Long)
  case class Entry(v: Double, tie: Long)
  case class Board(entries: Seq[Entry])
  case class TopOut(key: Long, rank: Int, v: Double, tie: Long)

  /** `input` must be a streaming DataFrame with (key LONG, v DOUBLE,
    * tie LONG — a unique id making the order total). `idleTtlMillis`
    * (optional) evicts a key's leaderboard after that much processing
    * time without new rows for the key.
    *
    * Engine note when the TTL is on: ProcessingTimeTimeout makes the
    * engine schedule no-data micro-batches indefinitely (that is HOW
    * idle keys get their timeout callback —
    * FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
    * true for this conf), so give the query a real trigger interval
    * (the default 0 busy-loops) and never wait on
    * `processAllAvailable()` — it only returns on no-new-data batches,
    * which this query never reports. Poll the sink instead. */
  def topK(input: DataFrame, k: Int,
      idleTtlMillis: Option[Long] = None): Dataset[TopOut] = {
    require(k > 0)
    idleTtlMillis.foreach(t => require(t > 0, s"TTL must be positive: $t"))
    val spark = input.sparkSession
    import spark.implicits._
    val timeoutConf = idleTtlMillis
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    input.select("key", "v", "tie").as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Board, TopOut](
        OutputMode.Update, timeoutConf) {
        (key: Long, rows: Iterator[In], state: GroupState[Board]) =>
          if (state.hasTimedOut) {
            // key idle past the TTL: drop the board; nothing to emit
            // (consumers hold the last leaderboard they were sent)
            state.remove()
            Iterator.empty
          } else {
            val cur = state.getOption.map(_.entries).getOrElse(Seq.empty)
            // by-tie dedup absorbs at-least-once replays; sort is over
            // ≤ cur + batch rows of THIS key, never global
            val merged = (cur ++ rows.map(r => Entry(r.v, r.tie)))
              .groupBy(_.tie).map(_._2.head).toSeq
              .sortBy(e => (-e.v, e.tie)).take(k)
            val out =
              if (merged == cur) Iterator.empty
              else {
                state.update(Board(merged))
                merged.iterator.zipWithIndex.map { case (e, i) =>
                  TopOut(key, i + 1, e.v, e.tie)
                }
              }
            // refresh the clock on ANY activity for the key, including
            // no-change batches — TTL measures idleness, not change
            idleTtlMillis.foreach(state.setTimeoutDuration)
            out
          }
      }
  }
}

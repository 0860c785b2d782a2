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
  * absorbed by the by-tie dedup. State is O(k) per key FOREVER (the k
  * held entries; nothing per-event), the streaming mirror of the batch
  * operator's bounded heaps; unbounded KEY churn is the one thing that
  * grows state, which a deployment bounds with a TTL the same way
  * [[StatefulSessions]] notes for user records.
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
    * tie LONG — a unique id making the order total). */
  def topK(input: DataFrame, k: Int): Dataset[TopOut] = {
    require(k > 0)
    val spark = input.sparkSession
    import spark.implicits._
    input.select("key", "v", "tie").as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Board, TopOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[In], state: GroupState[Board]) =>
          val cur = state.getOption.map(_.entries).getOrElse(Seq.empty)
          // by-tie dedup absorbs at-least-once replays; sort is over
          // ≤ cur + batch rows of THIS key, never global
          val merged = (cur ++ rows.map(r => Entry(r.v, r.tie)))
            .groupBy(_.tie).map(_._2.head).toSeq
            .sortBy(e => (-e.v, e.tie)).take(k)
          if (merged == cur) Iterator.empty
          else {
            state.update(Board(merged))
            merged.iterator.zipWithIndex.map { case (e, i) =>
              TopOut(key, i + 1, e.v, e.tie)
            }
          }
      }
  }
}

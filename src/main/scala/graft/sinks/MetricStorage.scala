package graft.sinks

import scala.collection.concurrent.TrieMap

/** Live counter storage — the reference's `MetricStorage`
  * (/root/reference/metric.go:10-60): add-or-insert increments under
  * concurrent access, flushed-and-cleared on a cadence, with the
  * bytesSent/sendDuration pair consumed into a derived
  * `<avg>.bytes_to_milliseconds` ratio (metric.go:26-38 — the pair is
  * REMOVED even when the ratio isn't emitted, and integer division is
  * intentional).
  *
  * Metric names carry their full dotted prefix at increment time, exactly
  * like the reference (main.go:210-216, 394-405): the 3-grain fan-out is
  * global × byhost.<h> × bytable.<t>.
  */
final class MetricStorage(hostname: String,
    cntPrefix: String = "one_sec.proxyhouse",
    avgPrefix: String = "one_min.proxyhouse") extends Serializable {

  private val storage = TrieMap.empty[String, Long]

  def increment(name: String, value: Long): Unit =
    storage.updateWith(name) {
      case Some(v) => Some(v + value)
      case None => Some(value)
    }

  /** Ingest-side increments (main.go:210-216). */
  def onIngest(uri: String, reqs: Long, bytes: Long): Unit = {
    val table = extractTable(uri)
    increment(s"$cntPrefix.requests_received", reqs)
    increment(s"$cntPrefix.byhost.$hostname.requests_received", reqs)
    increment(s"$cntPrefix.bytable.$table.requests_received", reqs)
    increment(s"$cntPrefix.bytes_received", bytes)
    increment(s"$cntPrefix.byhost.$hostname.bytes_received", bytes)
    increment(s"$cntPrefix.bytable.$table.bytes_received", bytes)
  }

  /** Send-side increments (main.go:392-405). */
  def onSend(uri: String, rowcount: Long, bytes: Long): Unit = {
    val table = extractTable(uri)
    increment(s"$cntPrefix.rows_sent", rowcount)
    increment(s"$cntPrefix.requests_sent", 1L)
    increment(s"$cntPrefix.byhost.$hostname.rows_sent", rowcount)
    increment(s"$cntPrefix.byhost.$hostname.requests_sent", 1L)
    increment(s"$cntPrefix.bytable.$table.rows_sent", rowcount)
    increment(s"$cntPrefix.bytable.$table.requests_sent", 1L)
    increment(s"$cntPrefix.bytes_sent", bytes)
    increment(s"$cntPrefix.byhost.$hostname.bytes_sent", bytes)
    increment(s"$cntPrefix.bytable.$table.bytes_sent", bytes)
    increment(s"$avgPrefix.bytes_sent", bytes)
    increment(s"$avgPrefix.byhost.$hostname.bytes_sent", bytes)
    increment(s"$avgPrefix.bytable.$table.bytes_sent", bytes)
    increment("bytesSent", bytes)
  }

  def onSendDuration(durationMs: Long): Unit = {
    increment("sendDuration", durationMs)
    increment(s"$avgPrefix.byhost.$hostname.send_duration", durationMs)
  }

  /** Failure increments (main.go:432-434). */
  def onSendError(uri: String): Unit = {
    val table = extractTable(uri)
    increment(s"$cntPrefix.ch_errors", 1L)
    increment(s"$cntPrefix.byhost.$hostname.ch_errors", 1L)
    increment(s"$cntPrefix.bytable.$table.ch_errors", 1L)
  }

  /** Swap-and-render (metric.go:23-45): drain the counters, consume the
    * bytesSent/sendDuration pair into the ratio line. Each key is removed
    * ATOMICALLY and its removed value counted — an increment racing the
    * flush either lands before the remove (counted now) or recreates the
    * key (counted next flush), never dropped. (A snapshot-then-clear drops
    * increments landing in between; the reference swaps under a mutex,
    * metric.go:24-45.) */
  def flushLines(): Seq[String] = {
    val snapshot: Map[String, Long] =
      storage.keySet.iterator.flatMap(k => storage.remove(k).map(k -> _)).toMap
    if (snapshot.isEmpty) Seq.empty
    else {
      val bytesSent = snapshot.getOrElse("bytesSent", 0L)
      val sendDuration = snapshot.getOrElse("sendDuration", 0L)
      val rest = snapshot - "bytesSent" - "sendDuration"
      val ratio =
        if (bytesSent != 0 && sendDuration != 0)
          Seq(s"$avgPrefix.bytes_to_milliseconds ${bytesSent / sendDuration}")
        else Seq.empty
      ratio ++ rest.toSeq.sortBy(_._1).map { case (k, v) => s"$k $v" }
    }
  }

  /** Non-relational twin of ProxyFunctions.extractTable (O-16). */
  private[sinks] def extractTable(uri: String): String =
    MetricStorage.extractTable(uri)
}

object MetricStorage {
  def extractTable(uri: String): String = {
    val l = uri.toLowerCase
    val pct = "insert%20into%20([^%]+)%20".r.findFirstMatchIn(l).map(_.group(1))
    val plus = "insert\\+into\\+([^+]+)\\+".r.findFirstMatchIn(l).map(_.group(1))
    pct.orElse(plus).getOrElse("unknown")
  }
}

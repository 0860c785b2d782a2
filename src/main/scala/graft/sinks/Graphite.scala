package graft.sinks

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** Graphite plaintext-protocol metric sink over UDP, the twin of the
  * reference's `SendMetrics` (/root/reference/metric.go:21-50): each
  * counter flushes as one `name value` line; the `bytesSent`/`sendDuration`
  * pair is consumed into a derived `speed` ratio before flushing
  * (metric.go:26-38).
  */
object Graphite {

  /** Render the counter map to plaintext lines, reproducing the derived
    * send-speed ratio: bytesSent/sendDuration replace their inputs. */
  def renderLines(counters: Map[String, Long], prefix: String): Seq[String] = {
    val bytes = counters.get("bytesSent")
    val dur = counters.get("sendDuration")
    val withSpeed = (bytes, dur) match {
      case (Some(b), Some(d)) if d != 0 =>
        counters - "bytesSent" - "sendDuration" + ("speed" -> b / d)
      case _ => counters - "bytesSent" - "sendDuration"
    }
    withSpeed.toSeq.sortBy(_._1).map { case (k, v) => s"$prefix.$k $v" }
  }

  def send(lines: Seq[String], host: String, port: Int): Unit = {
    val socket = new DatagramSocket()
    try {
      val addr = InetAddress.getByName(host)
      lines.foreach { line =>
        val payload = (line + "\n").getBytes(StandardCharsets.UTF_8)
        socket.send(new DatagramPacket(payload, payload.length, addr, port))
      }
    } finally socket.close()
  }
}

package graft.sinks

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** Graphite plaintext-protocol transport over UDP (one `name value` line
  * per datagram) — the wire half of the reference's metric flush
  * (/root/reference/metric.go:21-50); rendering/derivation lives in
  * [[MetricStorage.flushLines]]. */
object Graphite {
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

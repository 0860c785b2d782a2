package graft.sinks

import java.io.ByteArrayOutputStream
import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** GELF (Graylog Extended Log Format) UDP sink — the twin of
  * /root/reference/graylog.go:102-191: JSON-encode with fixed field order,
  * zlib-compress, and chunk payloads over `ChunkSize` bytes with 12-byte
  * GELF chunk headers (magic 0x1e 0x0f, 8-byte message id, sequence
  * number, sequence count).
  */
object Gelf {

  val ChunkSize = 8192
  private val Magic = Array(0x1e.toByte, 0x0f.toByte)

  /** Syslog levels (graylog.go:22-28). */
  val Emergency = 0; val Alert = 1; val Critical = 2; val Error = 3
  val Warning = 4; val Notice = 5; val Info = 6; val Debug = 7

  /** Short message derivation (graylog.go:130-139): under 128 chars →
    * unchanged; else cut at the first newline if that prefix is under 128;
    * else first 125 chars + "...". Mirrors
    * graft.functions.ProxyFunctions.shortMessage (O-22). */
  def shortMessage(full: String): String =
    if (full.length < 128) full
    else {
      val nl = full.indexOf('\n')
      if (nl >= 0 && nl <= 128) full.substring(0, nl) // inclusive bound, graylog.go:134
      else full.substring(0, 125) + "..."
    }

  /** Fixed-field-order GELF JSON (graylog.go:143-153). */
  def packMessage(host: String, timestamp: Long, file: String, level: Int,
      full: String): String = {
    def js(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    s"""{"version":"1.1","host":${js(host)},"timestamp":$timestamp,""" +
      s""""file":${js(file)},"level":$level,""" +
      s""""short_message":${js(shortMessage(full))},""" +
      s""""full_message":${js(full)}}"""
  }

  def compress(payload: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(payload)
    deflater.finish()
    val out = new ByteArrayOutputStream(payload.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  /** Split a compressed payload into GELF chunks (graylog.go:166-190); a
    * payload within ChunkSize is sent as-is (single datagram, no header). */
  def chunks(payload: Array[Byte], messageId: Array[Byte]): Seq[Array[Byte]] = {
    require(messageId.length == 8, "GELF message id must be 8 bytes")
    if (payload.length <= ChunkSize) Seq(payload)
    else {
      val n = math.ceil(payload.length.toDouble / ChunkSize).toInt
      (0 until n).map { i =>
        val from = i * ChunkSize
        val until = math.min(from + ChunkSize, payload.length)
        val header = Magic ++ messageId ++ Array(i.toByte, n.toByte)
        header ++ payload.slice(from, until)
      }
    }
  }

  /** Deterministic 8-byte message id (the reference uses random bytes,
    * graylog.go:171-173; a payload hash keeps tests reproducible and is
    * unique per message in practice). */
  def messageId(payload: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    md.take(8)
  }

  def send(host: String, port: Int, logHost: String, timestamp: Long,
      file: String, level: Int, full: String, logLevel: Int = Info): Unit = {
    if (level > logLevel) return // O-24 (graylog.go:193-197)
    val payload = compress(packMessage(logHost, timestamp, file, level, full)
      .getBytes(StandardCharsets.UTF_8))
    val socket = new DatagramSocket()
    try {
      val addr = InetAddress.getByName(host)
      chunks(payload, messageId(payload)).foreach { c =>
        socket.send(new DatagramPacket(c, c.length, addr, port))
      }
    } finally socket.close()
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Gelf, MetricStorage}

/** Golden-output tests for the GELF/Graphite sink plumbing, mirroring the
  * reference's byte-exact graylog_test.go (zlib round-trip + short-message
  * truncation cases) and metric.go's derived-ratio flush. */
class GelfSpec extends AnyFunSuite {

  private def inflate(bytes: Array[Byte]): String = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val buf = new Array[Byte](1 << 16)
    val n = inf.inflate(buf)
    inf.end()
    new String(buf, 0, n, StandardCharsets.UTF_8)
  }

  test("packMessage golden JSON with fixed field order") {
    // under 128 chars the short message is the FULL text, newline included
    // (the newline cut only applies to long messages, graylog.go:130-139)
    val json = Gelf.packMessage("host1", 1700000000L, "main.go", Gelf.Error,
      "boom \"quoted\"\nline2")
    assert(json ==
      """{"version":"1.1","host":"host1","timestamp":1700000000,""" +
      """"file":"main.go","level":3,"short_message":"boom \"quoted\"\nline2",""" +
      """"full_message":"boom \"quoted\"\nline2"}""")
    val long = "head\n" + "x" * 150
    val json2 = Gelf.packMessage("h", 1L, "f", Gelf.Info, long)
    assert(json2.contains(""""short_message":"head","""))
  }

  test("reference golden: graylog_test.go byte-exact (zlib round-trip)") {
    // exact inputs and expected JSON from /root/reference/graylog_test.go
    val message = "To write a new test suite, create a file whose name ends _test.go"
    assert(Gelf.shortMessage(message) == message) // short passthrough

    val longMessage = "To write a new test suite, create a file whose name " +
      "ends _test.go that contains the TestXxx functions as described here. " +
      "Put the file in the same package as the one being tested. The file " +
      "will be excluded from regular package builds but will be included " +
      "when the “go test” command is run."
    val shortMessage = longMessage.substring(0, 125) + "..."
    assert(Gelf.shortMessage(longMessage) == shortMessage)

    val packed = Gelf.compress(
      Gelf.packMessage("testhostname", 1594916275L, "screwdriver", Gelf.Info,
        longMessage).getBytes(StandardCharsets.UTF_8))
    val want = "{\"version\":\"1.1\",\"host\":\"testhostname\"," +
      "\"timestamp\":1594916275,\"file\":\"screwdriver\",\"level\":6," +
      "\"short_message\":\"" + shortMessage + "\",\"full_message\":\"" +
      longMessage + "\"}"
    assert(inflate(packed) == want)
  }

  test("newline cut bound is INCLUSIVE at index 128 (graylog.go:134)") {
    val at128 = "x" * 128 + "\n" + "y" * 50
    assert(Gelf.shortMessage(at128) == "x" * 128)
    val at129 = "x" * 129 + "\n" + "y" * 50
    assert(Gelf.shortMessage(at129) == "x" * 125 + "...")
  }

  test("zlib round-trip preserves the packed message") {
    val json = Gelf.packMessage("h", 1L, "f", Gelf.Info, "x" * 300)
    val packed = Gelf.compress(json.getBytes(StandardCharsets.UTF_8))
    assert(packed.length < json.length) // actually compressed
    assert(inflate(packed) == json)
  }

  test("payloads within 8 KiB are a single unchunked datagram") {
    val payload = Array.fill[Byte](8192)(1)
    val cs = Gelf.chunks(payload, Gelf.messageId(payload))
    assert(cs.length == 1 && (cs.head sameElements payload))
  }

  test("oversize payloads chunk with 12-byte GELF headers") {
    val payload = Array.tabulate[Byte](20000)(i => (i % 251).toByte)
    val id = Gelf.messageId(payload)
    val cs = Gelf.chunks(payload, id)
    assert(cs.length == 3) // ceil(20000 / 8192)
    cs.zipWithIndex.foreach { case (c, i) =>
      assert(c(0) == 0x1e.toByte && c(1) == 0x0f.toByte)
      assert(c.slice(2, 10) sameElements id)
      assert(c(10) == i.toByte && c(11) == 3.toByte)
    }
    // chunks reassemble to the original payload
    val body = cs.flatMap(_.drop(12)).toArray
    assert(body sameElements payload)
  }

  test("metric flush derives bytes_to_milliseconds and clears (metric.go:23-45)") {
    val m = new MetricStorage("h1", cntPrefix = "cnt", avgPrefix = "avg")
    m.increment("cnt.requests_received", 10L)
    m.increment("bytesSent", 1000L)
    m.increment("sendDuration", 4L)
    val lines = m.flushLines()
    assert(lines == Seq("avg.bytes_to_milliseconds 250",
      "cnt.requests_received 10"))
    assert(m.flushLines().isEmpty) // swap-and-clear, like the reference
  }

  test("metric flush: zero-duration guard consumes the pair without a ratio") {
    val m = new MetricStorage("h1", cntPrefix = "cnt", avgPrefix = "avg")
    m.increment("bytesSent", 1000L)
    m.increment("sendDuration", 0L)
    assert(m.flushLines().isEmpty) // pair removed even when ratio not emitted
  }

  test("3-grain metric fan-out matches the reference's names (main.go:210-216,392-405)") {
    val m = new MetricStorage("hostA", cntPrefix = "one_sec.ph",
      avgPrefix = "one_min.ph")
    m.onIngest("/?query=INSERT%20INTO%20clicks%20VALUES", reqs = 2L, bytes = 20L)
    m.onSend("/?query=INSERT%20INTO%20clicks%20VALUES", rowcount = 5L, bytes = 40L)
    m.onSendError("/?query=INSERT%20INTO%20clicks%20VALUES")
    val lines = m.flushLines().toSet
    assert(lines.contains("one_sec.ph.requests_received 2"))
    assert(lines.contains("one_sec.ph.byhost.hostA.requests_received 2"))
    assert(lines.contains("one_sec.ph.bytable.clicks.requests_received 2"))
    assert(lines.contains("one_sec.ph.rows_sent 5"))
    assert(lines.contains("one_sec.ph.bytable.clicks.bytes_sent 40"))
    assert(lines.contains("one_min.ph.bytes_sent 40"))
    assert(lines.contains("one_sec.ph.bytable.clicks.ch_errors 1"))
  }
}

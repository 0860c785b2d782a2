package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The HTTP front surface shared by [[HttpReceiver]] (JDK
  * `com.sun.net.httpserver` backend) and [[FastHttpReceiver]] (lean
  * blocking-socket backend). Both implement status-for-status parity with
  * the reference listener (/root/reference/main.go:164-260) over the same
  * [[DropSpool]]; they are interchangeable at construction time, so the
  * accept-rate-critical deployments can pick the fast edge without
  * touching the pipeline. */
trait IngestReceiver {
  def start(): IngestReceiver
  def stop(): Unit
  def boundPort: Int
  def inRequests: AtomicLong
  def outFiles: AtomicLong
  def totalRequests: AtomicLong
  def currentRequests: AtomicLong
  def closedRequests: AtomicLong
}

/** Thin HTTP front for the drop-directory ingest source — the piece that
  * makes [[graft.ProxyApp]] an actual drop-in for the reference's listener
  * (/root/reference/main.go:164-260):
  *
  *  - `POST /`  (dorequest, main.go:180-226): body + raw URI are queued and
  *    rolled into JSON-lines files in the drop directory, which
  *    [[RequestSource.fileStream]] tails. Empty body → 405 "No data given.",
  *    non-root path → 404, other methods → 405 — status-for-status parity.
  *  - `GET /`   (main.go:172-178): health — `status = "OK"`.
  *  - `GET /status` (showstatus, main.go:228-245): DLQ backlog mapped to
  *    200/400/500 via a caller-supplied status function (wire to
  *    `IngestPipeline.dlqStatus`).
  *  - `GET /statistic` (showstatistic, main.go:247-255): in/out request
  *    counters (O-5's connection tallies reduced to what exists here —
  *    the JDK server doesn't surface socket states).
  *
  * Deliberately NOT a Spark component: the receiver is the world-facing
  * edge; Spark's unit of ingest is a file. Requests spool through
  * [[DropSpool]] (bounded queue + atomic-rename roll). Ingest metrics stay
  * with the pipeline (which sees every request) to avoid double counting. */
final class HttpReceiver(dropDir: String, port: Int = 0,
    rollMillis: Long = 200L, status: () => Int = () => 200,
    maxQueued: Int = 100000) extends IngestReceiver {

  val inRequests = new AtomicLong(0)
  // O-5 (statelistener, main.go:257-271): per-connection-state gauges at
  // the observable boundaries. The JDK server exposes exchange lifecycle,
  // not socket states, so the Go states map as: New+Active → exchange
  // entered/in-flight, Closed → exchange completed; Idle and Hijacked
  // have no JDK-observable equivalent (accepted parity gap — COVERAGE.md)
  val totalRequests = new AtomicLong(0)   // state "new": exchanges accepted
  val currentRequests = new AtomicLong(0) // state "active": in-flight
  val closedRequests = new AtomicLong(0)  // state "closed": completed
  private val spool = new DropSpool(dropDir, rollMillis, maxQueued)
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def outFiles: AtomicLong = spool.outFiles

  private def jsonEscape(s: String): String = graft.JsonUtil.escape(s)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    ex.getResponseHeaders.set("Server", "proxyhousespark")
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/", (ex: HttpExchange) => {
    totalRequests.incrementAndGet()
    currentRequests.incrementAndGet()
    try {
      if (ex.getRequestURI.getPath == "/status") {
        respond(ex, status(), "status:OK")
      } else if (ex.getRequestURI.getPath == "/statistic") {
        respond(ex, 200,
          s"total connections:${totalRequests.get()}\r\n" +
            s"current connections:${currentRequests.get()}\r\n" +
            s"state new:${totalRequests.get()}\r\n" +
            s"state active:${currentRequests.get()}\r\n" +
            s"state closed:${closedRequests.get()}\r\n" +
            s"in requests:${inRequests.get()}\r\nout files:${outFiles.get()}\r\n")
      } else if (ex.getRequestURI.getPath != "/") {
        respond(ex, 404, "404 not found.")
      } else ex.getRequestMethod match {
        case "GET" => respond(ex, 200, "status = \"OK\"\r\n")
        case "POST" =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          if (body.isEmpty) respond(ex, 405, "No data given.")
          else {
            // raw path + raw query, like the reference's
            // r.URL.RawPath + "?" + r.URL.RawQuery (main.go:187)
            val raw = ex.getRequestURI.getRawPath +
              Option(ex.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
            val line = s"""{"uri": "${jsonEscape(raw)}", """ +
              s""""body": "${jsonEscape(body)}"}"""
            if (spool.offer(line)) {
              inRequests.incrementAndGet()
              respond(ex, 200, "")
            } else {
              respond(ex, 503, "Ingest queue full — drop directory stalled.")
            }
          }
        case _ => respond(ex, 405, "Sorry, only GET and POST methods are supported.")
      }
    } catch { case e: Exception =>
      try respond(ex, 500, e.getMessage) catch { case _: Exception => () }
    } finally {
      currentRequests.decrementAndGet()
      closedRequests.incrementAndGet()
    }
  })

  private val handlerPool = java.util.concurrent.Executors.newFixedThreadPool(8)

  def start(): HttpReceiver = {
    Files.createDirectories(Paths.get(dropDir))
    server.setExecutor(handlerPool)
    server.start()
    spool.start()
    this
  }

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = {
    server.stop(0)
    // the handler pool's threads are non-daemon: without an explicit
    // shutdown they keep the JVM alive after main() returns (surfaced by
    // graft.IngestBench hanging at exit)
    handlerPool.shutdown()
    spool.stop()
  }
}

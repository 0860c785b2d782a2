package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import graft.streaming.IngestPipeline.BatchSink

/** HTTP batch sink mirroring the reference's forwarder
  * (/root/reference/main.go:376-445): POST the concatenated batch body to
  * `fwd + uri` (keys always start with "/" under default config, so the
  * prefix branch of the URI rewrite is the whole behavior, main.go:385-389);
  * any non-200 response is a failure (main.go:423-424) — the caller spills
  * to the DLQ.
  *
  * Connection reuse: one shared HttpClient (HTTP/1.1 keep-alive pool) per
  * JVM, the analogue of the reference's MaxIdleConnsPerHost=1000
  * (main.go:90).
  */
final class ClickHouseSink(fwd: String, timeoutMs: Long = 10000)
    extends BatchSink {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()

  def targetUri(uri: String): String =
    if (uri.startsWith("/")) fwd + uri else uri

  override def send(uri: String, body: String, rows: Long): Boolean = {
    try {
      val req = HttpRequest.newBuilder(URI.create(targetUri(uri)))
        .timeout(Duration.ofMillis(timeoutMs))
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding())
        .statusCode() == 200
    } catch {
      case _: Exception => false
    }
  }
}

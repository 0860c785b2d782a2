package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import graft.streaming.IngestPipeline.BatchSink

/** Serializable recording sink for flush/replay tests.
  *
  * The live flush invokes BatchSink.send on EXECUTORS, so the sink closure
  * is serialized per task — a plain inner-class sink would (a) drag the
  * enclosing spec into the closure and (b) record into a per-task COPY's
  * state. This sink carries only an id; all mutable state lives in a
  * JVM-static registry, which local-mode tasks share. */
object TestSink {
  private val sentQ = TrieMap.empty[String, ConcurrentLinkedQueue[(String, String, Long)]]
  private val failFirstN = TrieMap.empty[String, AtomicInteger]
  private val failWhen = TrieMap.empty[String, String => Boolean]
  private val ids = new AtomicLong()

  /** `failFirst` sends fail before any succeed; `failUris` fails matching
    * URIs forever. The predicate stays registry-side — never serialized. */
  def apply(failUris: String => Boolean = _ => false,
      failFirst: Int = 0): TestSink = {
    val id = "sink-" + ids.incrementAndGet()
    sentQ(id) = new ConcurrentLinkedQueue
    failFirstN(id) = new AtomicInteger(failFirst)
    failWhen(id) = failUris
    new TestSink(id)
  }

  private[graft] def record(id: String, uri: String, body: String,
      rows: Long): Boolean = {
    if (failWhen(id)(uri)) false
    else if (failFirstN(id).getAndDecrement() > 0) false
    else { sentQ(id).add((uri, body, rows)); true }
  }

  private[graft] def recorded(id: String): Seq[(String, String, Long)] =
    sentQ(id).asScala.toSeq
}

class TestSink private[graft] (val id: String) extends BatchSink {
  /** All successful sends, in arrival order: (uri, body, rows). */
  def sent: Seq[(String, String, Long)] = TestSink.recorded(id)
  override def send(uri: String, body: String, rows: Long): Boolean =
    TestSink.record(id, uri, body, rows)
}

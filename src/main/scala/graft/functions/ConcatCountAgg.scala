package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for the fused concat+count aggregation: accumulated body parts,
  * raw-substring row count, contribution count, and the group's delimiter
  * (carried in the buffer because it is derived from the group key).
  *
  * Parts are a growable array, NOT an eagerly concatenated string — an
  * immutable-string buffer would copy the whole accumulated body on every
  * append (quadratic in group size); the single O(total) concatenation
  * happens once in `finish`. Kryo-encoded: the buffer only serializes at
  * the partial→final shuffle boundary, mutation inside a partition is
  * object-level (TypedImperativeAggregate semantics). */
final class ConcatBuf(
    val parts: ArrayBuffer[String],
    var rows: Long,
    var reqs: Long,
    var delim: String) extends Serializable

/** The reference's per-key Buffer as ONE custom typed Aggregator
  * (SURVEY.md §2.6): `store.Req[key]` append+count in a single pass
  * (/root/reference/main.go:198-208, Buffer at main.go:65-68) — buffer
  * append + `rowcount += rows` fused, no intermediate collect_list array.
  *
  * IN = (body, rowsInBody, delimiter); the delimiter comes from the format
  * sniff (O-15) and is constant within a group (derived from the group-key
  * URI). Merge joins two partial buffers — the distributed version of the
  * reference's single-mutex append (the reference even pre-sizes its
  * buffers, main.go:84; ArrayBuffer growth amortizes the same way).
  *
  * Concat order is arrival order, nondeterministic across partitions —
  * same as the reference under concurrency (SURVEY.md §1.3); correctness
  * checks compare the multiset of rows / order-invariant aggregates, not
  * the byte sequence.
  */
object ConcatCountAgg
    extends Aggregator[(String, Long, String), ConcatBuf, (String, Long, Long)] {

  override def zero: ConcatBuf = new ConcatBuf(ArrayBuffer.empty, 0L, 0L, "")

  override def reduce(b: ConcatBuf, in: (String, Long, String)): ConcatBuf = {
    b.parts += in._1
    b.rows += in._2
    b.reqs += 1L
    b.delim = in._3
    b
  }

  override def merge(a: ConcatBuf, b: ConcatBuf): ConcatBuf = {
    a.parts ++= b.parts
    a.rows += b.rows
    a.reqs += b.reqs
    if (a.delim.isEmpty && b.delim.nonEmpty) a.delim = b.delim
    a
  }

  override def finish(r: ConcatBuf): (String, Long, Long) =
    (r.parts.mkString(r.delim), r.rows, r.reqs)

  override def bufferEncoder: Encoder[ConcatBuf] = Encoders.kryo[ConcatBuf]
  override def outputEncoder: Encoder[(String, Long, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
}

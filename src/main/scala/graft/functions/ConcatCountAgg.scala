package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for the fused concat+count aggregation: accumulated body bytes,
  * raw-substring row count, contribution count, and the group's delimiter
  * (carried in the buffer because it is derived from the group key). */
case class ConcatBuf(body: String, rows: Long, reqs: Long, delim: String)

/** The reference's per-key Buffer as ONE custom typed Aggregator
  * (SURVEY.md §2.6): `store.Req[key]` append+count under a single pass
  * (/root/reference/main.go:198-208, Buffer at main.go:65-68) —
  * `buffer += delim + body; rowcount += rows` fused, no intermediate
  * collect_list array.
  *
  * IN = (body, rowsInBody, delimiter); delimiter comes from the format
  * sniff (O-15) and is constant within a group (it is derived from the
  * group key URI). Merge joins two partial buffers with the same delimiter
  * — the distributed version of the reference's single-mutex append.
  *
  * Concat order is arrival order, nondeterministic across partitions —
  * same as the reference under concurrency (SURVEY.md §1.3); correctness
  * checks compare the multiset of rows / order-invariant aggregates, not
  * the byte sequence.
  */
object ConcatCountAgg
    extends Aggregator[(String, Long, String), ConcatBuf, (String, Long, Long)] {

  override def zero: ConcatBuf = ConcatBuf(null, 0L, 0L, "")

  override def reduce(b: ConcatBuf, in: (String, Long, String)): ConcatBuf =
    if (b.body == null) ConcatBuf(in._1, in._2, 1L, in._3)
    else ConcatBuf(b.body + b.delim + in._1, b.rows + in._2, b.reqs + 1L, in._3)

  override def merge(a: ConcatBuf, b: ConcatBuf): ConcatBuf =
    if (a.body == null) b
    else if (b.body == null) a
    else ConcatBuf(a.body + a.delim + b.body, a.rows + b.rows,
      a.reqs + b.reqs, a.delim)

  override def finish(r: ConcatBuf): (String, Long, Long) =
    (if (r.body == null) "" else r.body, r.rows, r.reqs)

  override def bufferEncoder: Encoder[ConcatBuf] = Encoders.product[ConcatBuf]
  override def outputEncoder: Encoder[(String, Long, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
}

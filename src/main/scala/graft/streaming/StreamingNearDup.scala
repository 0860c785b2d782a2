package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup candidate detection — the streaming twin of the
  * batch MinHash+LSH banding (`d_minhash_lsh`): each arriving document
  * gets the SAME 16 Carter-Wegman minhashes and 4 band signatures as the
  * batch path, computed ROW-LOCALLY (`array_min` over the in-row hashed
  * shingle array — no aggregation, so the signature is map-side and the
  * only stateful operator is the band match itself), then
  * flatMapGroupsWithState keyed by band signature emits a candidate pair
  * the moment a document lands in a band some earlier document holds.
  *
  * Scale design: state is ONE (docId, ts) holder per distinct band
  * signature seen within the horizon — bounded by the event-time timeout,
  * not corpus size. Candidates are exactly that: the downstream verify
  * (exact Jaccard / edit similarity, as in the batch operators) stays a
  * batch job over the emitted pair stream — the lambda split every
  * published streaming-dedup design uses.
  *
  * Cites the batch constants (16 hashes, 4×4 bands, P = 4294967311, md5
  * h1/h2 halves) so a corpus processed incrementally flags the same
  * band collisions the batch `d_minhash_lsh` would.
  */
object StreamingNearDup {

  private val NumHashes = 16
  private val BandSize = 4
  private val MinHashP = 4294967311L

  /** Candidate emitted when a doc lands in a band already held. */
  final case class Candidate(doc_id: Long, dup_of: Long, band_sig: String)

  /** Band-holder state (public: Catalyst's generated encoder code must
    * reach the constructor). */
  final case class BandHolder(docId: Long, tsMillis: Long)

  /** Row-local band signatures: band b = md5 of the 4 minhashes
    * m(4b)..m(4b+3), each m(i) = array_min over the hashed shingles —
    * identical values to the batch groupBy/min formulation (min over a
    * set ignores multiplicity), with zero shuffles. */
  def withBandSigs(docs: DataFrame): DataFrame = {
    val sh = graft.functions.TextFunctions.shinglesSql("t", 3)
    def h(part: Int) = // h1 = md5[0:8), h2 = md5[8:16) as longs
      s"CAST(conv(substring(md5(x), ${1 + part * 8}, 8), 16, 10) AS BIGINT)"
    def m(i: Int) =
      s"array_min(transform($sh, x -> (${h(0)} + $i * ${h(1)}) % $MinHashP))"
    val bands = (0 until NumHashes / BandSize).map { b =>
      val sig = (0 until BandSize)
        .map(j => s"CAST(${m(b * BandSize + j)} AS STRING)")
        .mkString("md5(concat_ws('|', ", ", ", "))")
      expr(sig).as(s"band$b")
    }
    docs.withColumn("t", graft.functions.TextFunctions.tokens(col("text")))
      // docs too short to have a 3-shingle have NO signature (array_min
      // of an empty list is NULL, and concat_ws would silently collapse
      // every such doc onto md5('') — one hot state key pairing all
      // short docs as "near-dups"); the batch minhashLsh likewise emits
      // nothing for them, so drop them here to keep the twin contract
      .filter(size(col("t")) >= 3)
      .select(Seq(col("ts"), col("doc_id")) ++ bands: _*)
  }

  /** `docs`: streaming DataFrame with (ts TIMESTAMP, doc_id LONG, text).
    * Emits `Candidate` rows; band-holder state expires `horizon` past the
    * watermark. */
  def candidates(docs: DataFrame, horizon: String = "1 hour")
      : Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = horizon.split(" ")(0).toLong * (horizon match {
      case h if h.endsWith("hour") || h.endsWith("hours") => 3600000L
      case h if h.endsWith("minute") || h.endsWith("minutes") => 60000L
      case _ => 1000L
    })
    val banded = withBandSigs(docs)
      .withWatermark("ts", horizon)
      .select(col("ts"), col("doc_id"),
        explode(array((0 until NumHashes / BandSize)
          .map(b => col(s"band$b")): _*)).as("band_sig"))
      .as[(Timestamp, Long, String)]
    banded.groupByKey(_._3)
      .flatMapGroupsWithState[BandHolder, Candidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (sig, rows, state: GroupState[BandHolder]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val sorted = rows.toSeq.sortBy(r => (r._1.getTime, r._2))
            val out = Seq.newBuilder[Candidate]
            // a holder whose horizon already passed the watermark is
            // expired even if its timeout callback hasn't fired yet
            // (Spark delivers new-data invocations before timeouts) —
            // never match against it, let the next doc take the band
            var holder = state.getOption
              .filter(h => h.tsMillis + horizonMs > wm)
            sorted.foreach { case (ts, docId, _) =>
              holder match {
                case Some(h) if h.docId != docId =>
                  out += Candidate(docId, h.docId, sig)
                case Some(_) => () // same doc re-observed
                case None =>
                  holder = Some(BandHolder(docId, ts.getTime))
              }
            }
            holder match {
              case Some(h) =>
                state.update(h)
                // never earlier than the watermark: setTimeoutTimestamp
                // throws on a timestamp the watermark already passed
                state.setTimeoutTimestamp(
                  math.max(h.tsMillis + horizonMs, wm + 1))
              case None => state.remove()
            }
            out.result().iterator
          }
      }
  }
}

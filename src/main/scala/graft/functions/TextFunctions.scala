package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column functions for the training-data operators
  * (dedup, language-ID, quality scoring, fingerprinting) over the
  * `documents` table.
  *
  * Everything is built-in Catalyst expressions (higher-order array
  * functions, regexp, md5) — codegen'd, no UDFs, and every primitive has an
  * exact DuckDB twin so the operators stay oracle-checkable:
  * `regexp_extract_all` / `md5` / `ascii` produce identical results in both
  * engines, and all floating-point math is done in DOUBLE with explicit
  * folds so cross-engine drift is ~1 ulp (rounded away at 6 decimals).
  */
object TextFunctions {

  /** Word tokens of the lower-cased text: runs of [a-z]. The shared token
    * definition for all text operators. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Whitespace-delimited token count (runs of non-space). */
  def wsTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * non-alphanumeric marks — the usual pre-tokenizer regex shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"),
      lit(0))).cast("long")

  /** Distinct k-shingles (k consecutive tokens joined by one space) of the
    * token-array column named `toksCol`.
    *
    * Built as a zip_with chain over k shifted slices — measured 2-3× faster
    * than transform+element_at (no per-element ANSI bounds checks), and
    * slice(_, _, 0) handles short docs without a CASE guard.
    *
    * PLAN NOTE: always explode this in the SAME select that computes it
    * (`df.select(explode(shingles(...)))`). Binding it to a column first and
    * exploding in a later select makes the optimizer re-inline the array
    * expression around the Generate, measured ~10× slower. */
  def shinglesSql(toksCol: String, k: Int): String = {
    val n = s"greatest(size($toksCol) - ${k - 1}, 0)"
    def chain(j: Int): String =
      if (j == k - 1) s"slice($toksCol, ${j + 1}, $n)"
      else s"zip_with(slice($toksCol, ${j + 1}, $n), ${chain(j + 1)}, " +
        "(a, b) -> concat(a, ' ', b))"
    s"array_distinct(${chain(0)})"
  }

  def shingles(toksCol: String, k: Int): Column = expr(shinglesSql(toksCol, k))

  /** Like [[shinglesSql]] but WITH duplicates (no array_distinct) — for
    * within-doc repetition measures, where the duplicate shingles ARE the
    * signal. */
  def shinglesAllSql(toksCol: String, k: Int): String = {
    val n = s"greatest(size($toksCol) - ${k - 1}, 0)"
    def chain(j: Int): String =
      if (j == k - 1) s"slice($toksCol, ${j + 1}, $n)"
      else s"zip_with(slice($toksCol, ${j + 1}, $n), ${chain(j + 1)}, " +
        "(a, b) -> concat(a, ' ', b))"
    chain(0)
  }

  /** Count of tokens (in array column `toksCol`) in `set`, with multiplicity. */
  def tokenHits(toksCol: String, set: Seq[String]): Column = {
    val inList = set.map(s => s"'$s'").mkString(", ")
    expr(s"size(filter($toksCol, x -> x IN ($inList)))").cast("long")
  }

  // ---- PII scrubbing (shared by t_pii_scrub and the streaming twin) --------

  /** Email / US-phone patterns kept to the common subset of Java regex
    * and RE2 so Spark and DuckDB match the same spans. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** Redact emails and phone numbers (row-local, codegen'd). */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Document fingerprint: md5 of the space-joined token stream —
    * whitespace/punct/case-insensitive exact-dup key. */
  def fingerprint(toks: Column): Column = md5(concat_ws(" ", toks))

  /** Prefix fingerprint over the first 8 tokens (cheap blocking key). */
  def prefixFingerprint(toks: Column): Column =
    md5(concat_ws(" ", slice(toks, 1, 8)))

  // ---- vector (Array[Float] embedding) helpers -----------------------------

  /** L2 norm of float-array column `vecCol`, in DOUBLE via a fused
    * codegen'd left fold (round-15 — was an interpreted
    * aggregate/transform fold; same deterministic index order, same
    * null-element poisoning, bit-identical result). */
  def l2Norm(vecCol: String): Column =
    sqrt(graft.plans.GraftFunctions.floatSqNorm(col(vecCol)))

  /** Dot product of two DOUBLE-cast float arrays (explicit left fold). */
  def dotExpr(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0D, (s, v) -> s + v)")

  /** Sign-LSH bucket: sign bits of `nBits` evenly-spaced dimensions,
    * concatenated to a bitstring. Axis-aligned random-hyperplane LSH —
    * deterministic, engine-portable, and the bucket count (2^nBits) is the
    * scale knob for blocked near-dup / ANN. Dimensions past the vector's
    * actual length read bit "0" via try_element_at (NULL ≥ 0 is null →
    * the otherwise branch), so a short or ragged vector degrades to a
    * coarser bucket instead of failing the scan task — and the bit
    * matches the DuckDB oracle exactly, whose out-of-range
    * `embedding[k] >= 0` is also NULL → ELSE '0'. On full-length
    * vectors the behavior is byte-identical (DegenerateCorpusSpec
    * forced this: the hard element_at killed the whole job on one
    * 4-dim vector). */
  def signBucket(vecCol: String, dim: Int, nBits: Int): Column = {
    val stride = dim / nBits
    val bits = (0 until nBits).map { j =>
      when(expr(s"try_element_at($vecCol, ${1 + j * stride})") >= 0f, "1")
        .otherwise("0")
    }
    concat(bits: _*)
  }
}

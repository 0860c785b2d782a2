package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar operator pack reproducing proxyhouse's string/classification logic
  * as pure `Column` compositions (SURVEY.md §2.2, O-12..O-26).
  *
  * Everything here is built-in Catalyst expressions — codegen'd, pushdown-
  * friendly, no UDFs. Reference behavior cited per function (file:line into
  * /root/reference/).
  */
object ProxyFunctions {

  /** O-15 — format sniff (main.go:192-197): suffix match on the DECODED
    * `query` parameter selects (delimiter-between-bodies, row-separator,
    * addrows). TSV/CSV → ("", "\n", 0); everything else (Values) →
    * (",", "),", 1).
    *
    * The reference tests `r.URL.Query().Get("query")` — the isolated,
    * decoded parameter — so a trailing `&password=...` or a '+'-encoded
    * space must not defeat the sniff. We isolate the parameter and match
    * BOTH encodings of the space rather than url-decoding, because Spark
    * and DuckDB (the oracle) disagree on '+' in url_decode.
    */
  def formatOf(uri: Column): Column = {
    val q = regexp_extract(uri, "[?&]query=([^&]*)", 1)
    when(q.endsWith("FORMAT%20TSV") || q.endsWith("FORMAT+TSV"), lit("TSV"))
      .when(q.endsWith("FORMAT%20CSV") || q.endsWith("FORMAT+CSV"), lit("CSV"))
      .otherwise(lit("Values"))
  }

  def delimiterOf(uri: Column): Column =
    when(formatOf(uri) === "Values", lit(",")).otherwise(lit(""))

  /** O-19 — row counter (main.go:206): `addrows + count(body, separator)`,
    * raw substring counting by design (a `),` inside a quoted string
    * over-counts — reproduce, don't fix; SURVEY.md §1.3).
    * count(body, sep) == size(split(body, quote(sep))) - 1.
    */
  def rowCount(uri: Column, body: Column): Column = {
    val valuesRows = size(split(body, "\\),")) // 1 + raw count of "),"
    val tsvRows    = size(split(body, "\n")) - 1 // 0 + raw count of "\n"
    when(formatOf(uri) === "Values", valuesRows).otherwise(tsvRows)
      .cast("long")
  }

  /** O-16 — extractTable (main.go:323-349): table name between
    * `insert%20into%20` / `insert+into+` and the next `%20` / `+`, on the
    * lower-cased URI; "unknown" if absent.
    */
  def extractTable(uri: Column): Column = {
    val l = lower(uri)
    val pct  = regexp_extract(l, "insert%20into%20([^%]+)%20", 1)
    val plus = regexp_extract(l, "insert\\+into\\+([^+]+)\\+", 1)
    coalesce(nullif(pct, lit("")), nullif(plus, lit("")), lit("unknown"))
  }

  /** O-17 — hidePassword (main.go:352-363): mask `password=...` up to the
    * next `&` (or end of string) with a single `*`. */
  def hidePassword(uri: Column): Column =
    regexp_replace(uri, "password=[^&]*", "password=*")

  /** O-18 — URI rewrite (main.go:385-389): key starting with `/` → prefix
    * with the forward host; default config (`repl=""`) makes the replace
    * branch dead code, so the prefix branch is the whole behavior. */
  def rewriteUri(uri: Column, fwd: String): Column =
    when(uri.startsWith("/"), concat(lit(fwd), uri)).otherwise(uri)

  /** O-3 — status classifier (main.go:239-243): DLQ backlog count →
    * HTTP code (>=crit → 500, >=warn → 400, else 200). */
  def statusCode(errCount: Column, warn: Int = 400, crit: Int = 500): Column =
    when(errCount >= crit, lit(500))
      .when(errCount >= warn, lit(400))
      .otherwise(lit(200))
      .cast("int")

  /** O-21 — retry-level escalation (main.go:366-369): +1 per failure, >=10
    * becomes the `O` tombstone prefix; O-20 parses it back. */
  def escalate(level: Column): Column = level + lit(1)
  def dlqPrefix(level: Column): Column =
    when(level >= 10, lit("O")).otherwise(level.cast("string"))

  /** O-22 — GELF short-message derivation (graylog.go:130-139):
    * full < 128 chars → as-is; else cut at the first '\n' when its 0-based
    * index is ≤ 128 (reference bound is INCLUSIVE, graylog.go:134);
    * else first 125 chars + "...". */
  def shortMessage(full: Column): Column = {
    val nl = locate("\n", full) // 1-based; 0 if absent
    when(length(full) < 128, full)
      .when(nl > 0 && nl <= 129, substring_index(full, "\n", 1))
      .otherwise(concat(substring(full, 1, 125), lit("...")))
  }

  /** O-23 — GELF JSON encode (graylog.go:143-153), fixed field order. Built
    * by explicit concat (not to_json) so the byte layout is deterministic
    * and oracle-checkable. */
  def gelfJson(host: Column, ts: Column, file: Column, level: Column,
               short: Column, full: Column): Column = {
    def js(s: Column): Column = // minimal JSON string escape for our inputs
      concat(lit("\""),
        replace(replace(replace(s,
          lit("\\"), lit("\\\\")), lit("\""), lit("\\\"")), lit("\n"), lit("\\n")),
        lit("\""))
    concat(
      lit("{\"version\":\"1.1\",\"host\":"), js(host),
      lit(",\"timestamp\":"), ts.cast("string"),
      lit(",\"file\":"), js(file),
      lit(",\"level\":"), level.cast("string"),
      lit(",\"short_message\":"), js(short),
      lit(",\"full_message\":"), js(full),
      lit("}"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.ProxyFunctions._

/** Edge cases for the scalar operator pack (SURVEY.md §2.2), including the
  * reference quirks called out in §1.3: raw-substring row counting, suffix
  * (not infix) format sniffing, first-branch URI rewrite. */
class ProxyFunctionsSpec extends SparkSuite {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("O-15 format sniff is suffix-only (infix FORMAT TSV is Values)") {
    assert(eval1(formatOf(lit("/?query=INSERT%20INTO%20t%20FORMAT%20TSV"))) == "TSV")
    assert(eval1(formatOf(lit("/?query=INSERT%20INTO%20t%20FORMAT%20CSV"))) == "CSV")
    // FORMAT TSV mid-string does NOT trigger TSV handling (suffix match,
    // main.go:192-197)
    assert(eval1(formatOf(lit("/?query=FORMAT%20TSV%20something"))) == "Values")
    assert(eval1(formatOf(lit("/?query=INSERT%20INTO%20t%20VALUES"))) == "Values")
    // the reference sniffs the ISOLATED, decoded query param
    // (r.URL.Query().Get("query"), main.go:192-197): a trailing param or a
    // '+'-encoded space must not defeat the match
    assert(eval1(formatOf(
      lit("/?query=INSERT%20INTO%20t%20FORMAT%20TSV&password=x"))) == "TSV")
    assert(eval1(formatOf(lit("/?query=INSERT+INTO+t+FORMAT+CSV"))) == "CSV")
    assert(eval1(formatOf(
      lit("/?user=u&query=INSERT+INTO+t+FORMAT+TSV&password=x"))) == "TSV")
  }

  test("O-19 row count: Values raw-substring semantics, ),-inside-string quirk") {
    val u = lit("/?query=INSERT%20INTO%20t%20VALUES")
    assert(eval1(rowCount(u, lit("(1),(2),(3)"))) == 3L)
    assert(eval1(rowCount(u, lit("(1)"))) == 1L)
    // the reference OVER-counts a literal "),(" inside a quoted string
    // (bytes.Count raw matching, main.go:206) — reproduce, don't fix
    assert(eval1(rowCount(u, lit("('a),(b'),(2)"))) == 3L)
  }

  test("O-19 row count: TSV counts newlines, addrows=0") {
    val u = lit("/?query=INSERT%20INTO%20t%20FORMAT%20TSV")
    assert(eval1(rowCount(u, lit("1\t2\n3\t4\n"))) == 2L)
    assert(eval1(rowCount(u, lit(""))) == 0L)
  }

  test("rowcount additivity: count(a ++ ',' ++ b) == count(a) + count(b) for Values") {
    // ScalaCheck generators, fixed seed (no scalatestplus bridge offline)
    val body = Gen.nonEmptyListOf(Gen.chooseNum(0, 999))
      .map(_.map(i => s"($i)").mkString(","))
    val cases = Gen.listOfN(30, Gen.zip(body, body))
      .pureApply(Gen.Parameters.default, Seed(42L))
    val u = "/?query=INSERT%20INTO%20t%20VALUES"
    import spark.implicits._
    val df = cases.toDF("a", "b").select(
      rowCount(lit(u), col("a")).as("ca"),
      rowCount(lit(u), col("b")).as("cb"),
      rowCount(lit(u), concat_ws(",", col("a"), col("b"))).as("cab"))
    assert(df.filter(col("cab") =!= col("ca") + col("cb")).count() == 0)
  }

  test("O-16 extractTable handles %20 and + encodings, falls back to unknown") {
    assert(eval1(extractTable(lit("/?query=INSERT%20INTO%20Events%20VALUES"))) == "events")
    assert(eval1(extractTable(lit("/?query=insert+into+metrics+values"))) == "metrics")
    assert(eval1(extractTable(lit("/?query=SELECT%201"))) == "unknown")
  }

  test("O-17 hidePassword masks to next & or EOL") {
    assert(eval1(hidePassword(lit("/?query=x&password=secret&user=u"))) ==
      "/?query=x&password=*&user=u")
    assert(eval1(hidePassword(lit("/?query=x&password=secret"))) == "/?query=x&password=*")
    assert(eval1(hidePassword(lit("/?query=x"))) == "/?query=x")
  }

  test("O-18 rewrite prefixes / keys with fwd") {
    assert(eval1(rewriteUri(lit("/?query=q"), "http://ch:8123")) ==
      "http://ch:8123/?query=q")
    assert(eval1(rewriteUri(lit("http://абс"), "http://ch:8123")) == "http://абс")
  }

  test("O-22 short message: three branches (graylog.go:130-139)") {
    val short = "short message"
    assert(eval1(shortMessage(lit(short))) == short)
    val long = "x" * 200
    assert(eval1(shortMessage(lit(long))) == "x" * 125 + "...")
    val withNl = "head line\n" + "y" * 200
    assert(eval1(shortMessage(lit(withNl))) == "head line")
    // newline beyond 128 chars → truncation branch, not the newline branch
    val lateNl = "z" * 150 + "\ntail"
    assert(eval1(shortMessage(lit(lateNl))) == "z" * 125 + "...")
  }

  test("O-3 status classifier thresholds (main.go:239-243)") {
    val codes = spark.range(1).select(
      statusCode(lit(0)).as("a"), statusCode(lit(399)).as("b"),
      statusCode(lit(400)).as("c"), statusCode(lit(500)).as("d")).head()
    assert((codes.getInt(0), codes.getInt(1), codes.getInt(2), codes.getInt(3))
      == ((200, 200, 400, 500)))
  }

  test("O-21 escalation and tombstone prefix") {
    assert(eval1(dlqPrefix(lit(3))) == "3")
    assert(eval1(dlqPrefix(lit(10))) == "O")
    assert(eval1(dlqPrefix(escalate(lit(9)))) == "O")
  }
}

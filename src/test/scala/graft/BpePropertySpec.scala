package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property test for the BPE merge encoding: on seeded random symbol
  * sequences (including multi-char symbols and self-pair runs), the
  * engine-side `replace` over the double-separator string must equal an
  * independent greedy-left reference fold — the encoding is the one
  * piece of the BPE operator whose correctness isn't obvious from its
  * plan, so it gets pinned against a direct implementation, not just the
  * BpeSpec goldens. */
class BpePropertySpec extends SparkSuite {

  /** Reference greedy-left merge: scan left to right, merge the first
    * eligible (l, r) pair, continue AFTER it (never re-examining the
    * merged token within the pass). */
  private def refMerge(syms: List[String], l: String,
      r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  test("double-separator replace equals the greedy-left reference fold") {
    val s = spark
    import s.implicits._
    // symbols deliberately overlap textually (a, b, ab, aa) so boundary
    // bugs (mid-symbol matches, separator sharing) would surface
    val alphabet = Seq("a", "b", "ab", "aa")
    val genCase = for {
      n <- Gen.chooseNum(0, 12)
      syms <- Gen.listOfN(n, Gen.oneOf(alphabet))
      l <- Gen.oneOf(alphabet)
      r <- Gen.oneOf(alphabet)
    } yield (syms, l, r)
    val cases = Gen.listOfN(300, genCase)
      .pureApply(Gen.Parameters.default, Seed(13L))

    val df = cases.zipWithIndex.map { case ((syms, l, r), i) =>
      (i.toLong, "||" + syms.mkString("||") + "||", l, r)
    }.toDF("case_id", "s", "l", "r")
    val merged = df.select(col("case_id"),
        expr("replace(s, '|' || l || '||' || r || '|', " +
          "'|' || l || r || '|')").as("m"))
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap

    cases.zipWithIndex.foreach { case ((syms, l, r), i) =>
      val got = merged(i.toLong).split("\\|\\|").filter(_.nonEmpty).toList
      val want = refMerge(syms, l, r)
      assert(got == want,
        s"case $i: syms=$syms merge=($l,$r) engine=$got reference=$want")
    }
  }
}

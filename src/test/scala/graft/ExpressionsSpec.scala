package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{dotExpr, l2Norm}
import graft.plans.GraftFunctions.{cosineSim, replaceFirst}

/** Custom Catalyst expressions: value parity with the built-in fold they
  * replace, Go-semantics parity for replace_first, and SQL registration
  * through GraftExtensions. */
class ExpressionsSpec extends SparkSuite {

  test("cosine_sim matches the explicit double-fold composition bit-for-bit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .withColumn("na", l2Norm("a")).withColumn("nb", l2Norm("b"))
      .select(
        cosineSim(col("a"), col("b")).as("custom"),
        (dotExpr("a", "b") / (col("na") * col("nb"))).as("fold"))
    assert(df.filter(col("custom") =!= col("fold")).count() == 0)
  }

  test("cosine_sim: zero vector yields NULL, identical vectors yield 1.0") {
    val s = spark
    import s.implicits._
    val v = Array.fill(8)(0.5f)
    val z = Array.fill(8)(0.0f)
    val r = Seq((v, v, z)).toDF("a", "b", "z")
      .select(cosineSim(col("a"), col("b")).as("same"),
        cosineSim(col("a"), col("z")).as("vs_zero")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.isNullAt(1))
  }

  test("replace_first: Go strings.Replace(s, old, new, 1) parity") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a.b.a.b", ".", "-"),   // only first dot replaced
      ("abc", "x", "y"),        // no match → unchanged
      ("abc", "", "P:"),        // empty search → insert at start (Go quirk)
      ("repl", "repl", "")      // full-string removal
    ).toDF("s", "o", "r")
      .select(replaceFirst(col("s"), col("o"), col("r")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("a-b.a.b", "abc", "P:abc", ""))
  }

  test("extensions register cosine_sim and replace_first for SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c, " +
        "replace_first('x.y.z', '.', '!') AS r").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getString(1) == "x!y.z")
  }

  test("optimizer canonicalizes commutative cosine_sim argument order") {
    val s = spark
    import graft.model.Tables
    val e = Tables.embeddings(s, sf0001)
    val shifted = e.select(col("embedding").as("a"),
      reverse(col("embedding")).as("b"))
    def canonicalArgs(c: org.apache.spark.sql.Column): Seq[String] =
      shifted.select(c).queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case cs: org.apache.spark.sql.graft.CosineSimilarity =>
          cs.children.map(_.sql)
      }).flatten
    val ab = canonicalArgs(cosineSim(col("a"), col("b")))
    val ba = canonicalArgs(cosineSim(col("b"), col("a")))
    // both orders normalize to the same operand sequence
    assert(ab.nonEmpty && ab == ba)
    val r = shifted.select(cosineSim(col("a"), col("b")).as("x"),
      cosineSim(col("b"), col("a")).as("y")).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    val rows = (1 to 50).map(i =>
      (Array.fill(16)(i * 0.1f), Array.fill(16)((70 - i) * 0.1f)))
    def run(mode: String): Seq[Double] = {
      s.conf.set("spark.sql.codegen.factoryMode", mode)
      try rows.toDF("a", "b").select(cosineSim(col("a"), col("b")))
        .collect().map(_.getDouble(0)).toSeq
      finally s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}

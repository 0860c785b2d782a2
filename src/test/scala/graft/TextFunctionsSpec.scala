package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Edge cases for the text/vector pipeline primitives. */
class TextFunctionsSpec extends SparkSuite {

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.head().getAs[T](0)

  test("tokens: lowercased letter runs only") {
    val s = spark
    import s.implicits._
    val t = one[collection.Seq[String]](Seq("Hello, World-42 foo_bar").toDF("text")
      .select(tokens(col("text"))))
    assert(t == Seq("hello", "world", "foo", "bar"))
  }

  test("shingles: short docs yield empty set, no ANSI index errors") {
    val s = spark
    import s.implicits._
    val df = Seq("", "one", "one two", "one two three", "a b c d")
      .toDF("text").select(tokens(col("text")).as("t"))
      .select(size(shingles("t", 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 0, 1, 2))
  }

  test("shingles are distinct and space-joined") {
    val s = spark
    import s.implicits._
    val sh = one[collection.Seq[String]](Seq("a b a b a").toDF("text")
      .select(tokens(col("text")).as("t")).select(shingles("t", 3)))
    assert(sh.sorted == Seq("a b a", "b a b"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val s = spark
    import s.implicits._
    val r = Seq("Hello world, 42 times!").toDF("text")
      .select(wsTokenCount(col("text")).as("ws"),
        bpeishTokenCount(col("text")).as("bpe")).head()
    // ws: [Hello, world,, 42, times!]
    assert(r.getLong(0) == 4L)
    // bpe: [hello, world, ",", 42, times, "!"]
    assert(r.getLong(1) == 6L)
  }

  test("fingerprint is whitespace/case/punct insensitive") {
    val s = spark
    import s.implicits._
    val fps = Seq("Hello   World!", "hello world", "HELLO... world")
      .toDF("text").select(fingerprint(tokens(col("text"))))
      .collect().map(_.getString(0)).toSeq
    assert(fps.distinct.size == 1)
  }

  test("signBucket maps sign pattern of strided dims") {
    val s = spark
    import s.implicits._
    val vec = Array.tabulate(64)(i => if (i % 16 == 0) -1.0f else 1.0f)
    // bits read dims 1,9,17,...,57 (1-based stride 8): dim 1 (idx 0) is neg,
    // dims 17/33/49 (idx 16/32/48) are neg → bits 0,2,4,6 are '0'
    val b = one[String](Seq(Tuple1(vec)).toDF("embedding")
      .select(signBucket("embedding", 64, 8)))
    assert(b == "01010101")
  }

  test("l2Norm in double precision") {
    val s = spark
    import s.implicits._
    val n = one[Double](Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
      .select(l2Norm("v")))
    assert(math.abs(n - 5.0) < 1e-12)
  }
}

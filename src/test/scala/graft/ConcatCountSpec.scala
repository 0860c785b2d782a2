package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ConcatCount

/** Focused spec for the fused concat+count aggregate's buffer contract:
  * the delimSet flag (an empty TSV delimiter is a VALUE, not "unset"),
  * its survival across partial-buffer serialization, and implicit
  * widening of integral rows inputs. The end-to-end semantics are pinned
  * by the o27 oracles and the 10k-insert streaming spec. */
class ConcatCountSpec extends SparkSuite {

  test("empty TSV delimiter adds zero separator bytes across partitions") {
    val s = spark
    import s.implicits._
    val bodies = (1 to 100).map(i => s"line$i\n")
    // repartition(7) forces partial buffers through serialize/merge on
    // the exchange — the path that must carry delimSet, not infer it
    // from delimiter emptiness
    val df = bodies.map(b => ("k", b)).toDF("uri", "body").repartition(7)
    val out = df.groupBy(col("uri"))
      .agg(ConcatCount(col("body"), lit(1L), lit("")).as("cc"))
      .select(col("cc.body"), col("cc.rows"), col("cc.reqs"))
      .head()
    assert(out.getString(0).length == bodies.map(_.length).sum,
      "an empty delimiter must contribute no bytes between parts")
    assert(out.getLong(1) == 100L)
    assert(out.getLong(2) == 100L)
  }

  test("integral rows input widens to LONG implicitly") {
    val s = spark
    import s.implicits._
    // rows column is INT here — ImplicitCastInputTypes must coerce like
    // built-in aggregates instead of failing analysis
    val df = Seq(("k", "(1)", 1), ("k", "(2)", 2)).toDF("uri", "body", "r")
    val out = df.groupBy(col("uri"))
      .agg(ConcatCount(col("body"), col("r"), lit(",")).as("cc"))
      .select(col("cc.rows"), col("cc.reqs")).head()
    assert(out.getLong(0) == 3L)
    assert(out.getLong(1) == 2L)
  }

  test("non-empty delimiter joins parts with exactly reqs-1 separators") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => ("k", s"($i)")).toDF("uri", "body")
      .repartition(5)
    val out = df.groupBy(col("uri"))
      .agg(ConcatCount(col("body"), lit(1L), lit(",")).as("cc"))
      .select(col("cc.body"), col("cc.reqs")).head()
    val expectedLen = (1 to 50).map(i => s"($i)".length).sum + 49
    assert(out.getString(0).length == expectedLen)
    assert(out.getString(0).count(_ == ',') == 49)
  }
}

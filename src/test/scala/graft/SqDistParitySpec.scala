package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.graft.SqDistPico

import graft.plans.GraftFunctions.{sqDist, sqDistLong, sqDistPico}

/** The fused SqDist/SqDistPico/SqDistLong kernels (round-15 codegen
  * replacements for the aggregate/filter/zip_with folds in the ANN/PQ hot
  * paths) must be BIT-IDENTICAL to the SQL folds they replaced — including
  * on the inputs where "almost the same" implementations diverge: ragged
  * array lengths (zip_with null padding), null elements, empty arrays,
  * null arrays, NaN/Infinity terms, and values that land exactly on the
  * HALF_UP rounding boundary of the picounit round. */
class SqDistParitySpec extends SparkSuite {

  // the original folds, verbatim from Similarity before the swap
  private def sqDistSqlFold(a: String, b: String): String =
    s"aggregate(filter(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "v -> v IS NOT NULL), 0D, (s, v) -> s + v)"
  private def sqDistPicoSqlFold(a: String, b: String): String =
    s"aggregate(filter(zip_with($a, $b, " +
      "(x, y) -> CAST(round((x - y) * (x - y) * 1e12, 0) AS BIGINT)), " +
      "v -> v IS NOT NULL), CAST(0 AS BIGINT), (s, v) -> s + v)"
  private def sqDistLongSqlFold(a: String, b: String): String =
    s"aggregate(filter(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "v -> v IS NOT NULL), CAST(0 AS BIGINT), (s, v) -> s + v)"

  private val doubleCases: Seq[(Array[java.lang.Double], Array[java.lang.Double])] = Seq(
    // plain
    (Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](4.0, 6.0, 3.0)),
    // ragged: zip_with pads the short side with nulls -> filtered
    (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.5)),
    (Array[java.lang.Double](), Array[java.lang.Double](1.0, 2.0)),
    // null elements on either side
    (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](2.0, 5.0, null)),
    // both empty
    (Array[java.lang.Double](), Array[java.lang.Double]()),
    // NOTE no NaN/±Infinity/overflow cases: under Spark 4's default ANSI
    // mode the ORIGINAL folds throw (CAST_OVERFLOW on NaN→BIGINT,
    // ARITHMETIC_OVERFLOW on long wrap), so there is no fold result to
    // match. The kernels' domain in production is the nrm>0-filtered
    // float-origin corpus — every term finite and < ~8e12 — where the
    // folds never threw; the kernels are total there and bit-identical.
    // exact HALF_UP boundary in picounits: (x-y)^2*1e12 = 0.5 exactly
    // requires (x-y)^2 = 5e-13; use the closest representable seed
    (Array[java.lang.Double](7.0710678118654755e-7), Array[java.lang.Double](0.0)),
    // tiny values straddling the shortest-decimal-representation subtlety
    (Array[java.lang.Double](1.0000000000000002, 0.1), Array[java.lang.Double](1.0, 0.30000000000000004)))

  test("SqDist and SqDistPico match the SQL folds on adversarial doubles") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val rows = doubleCases.map { case (a, b) => Row(a.toSeq, b.toSeq) } ++
      // null arrays -> whole result null
      Seq(Row(null, Seq(1.0d)), Row(Seq(1.0d), null), Row(null, null))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val out = df.select(
      sqDist(col("a"), col("b")).as("fused_d"),
      expr(sqDistSqlFold("a", "b")).as("fold_d"),
      sqDistPico(col("a"), col("b")).as("fused_p"),
      expr(sqDistPicoSqlFold("a", "b")).as("fold_p")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"case $i: double null parity")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"case $i: double bits ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(r.isNullAt(2) == r.isNullAt(3), s"case $i: pico null parity")
      if (!r.isNullAt(2))
        assert(r.getLong(2) == r.getLong(3),
          s"case $i: pico ${r.getLong(2)} vs ${r.getLong(3)}")
    }
  }

  test("SqDist/SqDistPico match the folds on random float-cast vectors") {
    // the production shape: 64-dim float-origin doubles (emb() transform)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { _ =>
      Row(Seq.fill(64)(rnd.nextFloat().toDouble: java.lang.Double),
        Seq.fill(64)(rnd.nextFloat().toDouble: java.lang.Double))
    }
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val bad = df.select(
      sqDist(col("a"), col("b")).as("fd"),
      expr(sqDistSqlFold("a", "b")).as("od"),
      sqDistPico(col("a"), col("b")).as("fp"),
      expr(sqDistPicoSqlFold("a", "b")).as("op"))
      .filter(col("fd") =!= col("od") || col("fp") =!= col("op"))
      .count()
    assert(bad == 0L)
  }

  test("SqDistLong matches the SQL fold including nulls and ragged arrays") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = true), nullable = true),
      StructField("b", ArrayType(LongType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(Seq(1000000L, -2000000L, 3L), Seq(999999L, 2000000L, 3L)),
      Row(Seq(5L, null), Seq(2L, 7L)),
      Row(Seq[Any](), Seq(1L)),
      Row(null, Seq(1L)),
      // microunit magnitudes: coord ≤ ~1e6, term ≤ ~1e12 — the real
      // domain (no overflow case: the ANSI fold throws on wrap, see above)
      Row(Seq(1000000L, -1000000L), Seq(-1000000L, 1000000L)))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val out = df.select(
      sqDistLong(col("a"), col("b")).as("fused"),
      expr(sqDistLongSqlFold("a", "b")).as("fold")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"case $i: null parity")
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1), s"case $i: value parity")
    }
  }

  test("roundPicoToLong's arithmetic fast path equals the BigDecimal round") {
    // the ORIGINAL implementation, verbatim (round-15 swapped it for pure
    // arithmetic — one Double.toString allocation per vector element was
    // the measured cost of every brute-force recall baseline)
    def reference(p: Double): Long = {
      val rounded =
        if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) p
        else java.math.BigDecimal.valueOf(p)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      rounded.toLong
    }
    val twoTo52 = 4.503599627370496e15
    val boundary = Seq(0.0, -0.0, 0.5, -0.5, 1.5, 2.5, -1.5, -2.5,
      0.49999999999999994, // largest double < 0.5
      0.5000000000000001, 2.675, -2.675,
      Math.nextDown(1.5), Math.nextUp(1.5), Math.nextDown(-1.5),
      twoTo52, Math.nextDown(twoTo52), Math.nextUp(twoTo52),
      twoTo52 - 0.5, -(twoTo52 - 0.5), twoTo52 + 1.0,
      4503599627370495.5, // largest representable k.5 below 2^52
      9.007199254740992e15, 1.8e18, 9.3e18, -9.3e18, // beyond Long.MaxValue
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1.0e12, 7.0710678118654755e-7, 5.0e-13, 1.4999999999999998e0)
    boundary.foreach { p =>
      assert(SqDistPico.roundPicoToLong(p) == reference(p),
        s"boundary $p: fast=${SqDistPico.roundPicoToLong(p)} " +
          s"ref=${reference(p)}")
    }
    val rnd = new scala.util.Random(7)
    (0 until 200000).foreach { _ =>
      // mix magnitudes across the whole domain incl. the 2^52 band
      val p = rnd.nextInt(4) match {
        case 0 => (rnd.nextDouble() - 0.5) * 1e3
        case 1 => (rnd.nextDouble() - 0.5) * 1e13
        case 2 => (rnd.nextDouble() - 0.5) * 1.1e16
        case _ => math.floor(rnd.nextDouble() * 1e6) + 0.5 // exact halves
      }
      assert(SqDistPico.roundPicoToLong(p) == reference(p),
        s"random $p: fast=${SqDistPico.roundPicoToLong(p)} " +
          s"ref=${reference(p)}")
    }
  }

  test("the fused kernels run inside WholeStageCodegen") {
    val df = spark.range(64)
      .agg(collect_list(col("id").cast("double")).as("a"))
      .select(col("a"), reverse(col("a")).as("b"))
    val q = df.select(sqDist(col("a"), col("b")).as("d"),
      sqDistPico(col("a"), col("b")).as("p"))
    q.collect()
    val plan = q.queryExecution.executedPlan
    val hasCodegen = unwrapPlan(plan).exists {
      case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
      case _ => false
    }
    assert(hasCodegen,
      "fused distance kernels fell out of WholeStageCodegen:\n" + plan)
  }
}

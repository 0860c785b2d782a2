package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Codegen'd fused squared-euclidean-distance kernels replacing the
  * interpreted `aggregate(filter(zip_with(...)))` folds in the ANN/PQ hot
  * paths (round-15 optimization, guide §"codegen-friendly expressions").
  *
  * Each is BIT-IDENTICAL to the higher-order-function SQL it replaces —
  * same element order, same null discipline (a term where either side is
  * null, including the zip_with padding of ragged arrays, is SKIPPED, not
  * poisoning), same IEEE operations per term, same fold order, and for
  * [[SqDistPico]] literally the same per-term rounding as Spark's
  * `CAST(round(d, 0) AS BIGINT)` (BigDecimal.valueOf / HALF_UP / toDouble
  * / truncating cast, with Round's NaN/Infinity passthrough). The DuckDB
  * oracles are therefore unaffected; SqDistParitySpec pins the parity
  * against the original folds on adversarial inputs.
  *
  * Why custom Expressions (SURVEY.md §2.6 preference order, the
  * [[CosineSimilarity]] precedent): the composed-builtin fold materializes
  * an intermediate product array per row, boxes every element through the
  * lambda variables, and — being a higher-order function — breaks the
  * enclosing WholeStageCodegen span. These stay inside codegen as one
  * tight primitive loop; the brute-force recall baselines evaluate the
  * kernel corpus×queries times per query.
  */

/** Σ (a[i]-b[i])² in DOUBLE over dims present (non-null) in both arrays —
  * the fused form of `aggregate(filter(zip_with(a, b,
  * (x,y) -> (x-y)*(x-y)), v -> v IS NOT NULL), 0D, (s,v) -> s+v)`. */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
            double $d = $x.getDouble($i) - $y.getDouble($i);
            $acc += $d * $d;
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SqDist].getName, "sq_dist")
}

/** Σ CAST(round((a[i]-b[i])²·1e12, 0) AS BIGINT) — integer picounits,
  * exact long arithmetic after the per-term round. The per-term round is
  * Spark's own double ROUND semantics verbatim (NaN/Infinity pass
  * through Round untouched, then the cast truncates; finite values go
  * BigDecimal.valueOf → setScale(0, HALF_UP) → toDouble → truncating
  * cast), so the result is bit-identical to the SQL fold on ANY input. */
case class SqDistPico(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_pico"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += SqDistPico.roundPicoToLong(d * d * 1.0e12)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val helper = SqDistPico.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
            double $d = $x.getDouble($i) - $y.getDouble($i);
            double $p = $d * $d * 1.0E12;
            $acc += $helper.roundPicoToLong($p);
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistPico =
    copy(left = newLeft, right = newRight)
}

object SqDistPico {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SqDistPico].getName, "sq_dist_pico")

  /** `CAST(round(p, 0) AS BIGINT)` verbatim — but in pure arithmetic,
    * PROVABLY equal to Round's DoubleType branch (BigDecimal.valueOf, i.e.
    * the shortest-decimal-string value, setScale(0, HALF_UP), back to
    * double, then the non-ANSI double→long cast: NaN → 0, ±∞ saturates).
    *
    * Why the string round can be replaced (round-15: the BigDecimal path
    * was one Double.toString allocation PER VECTOR ELEMENT and dominated
    * the brute-force recall baselines — a measured 2.5 s single job at
    * sf0.1):
    *  - |p| ≥ 2⁵² : every such double is an integer; setScale(0) is the
    *    identity, so the round is `p.toLong` (and the long cast saturates
    *    past 2⁶³ exactly as before).
    *  - |p| < 2⁵² : the half-way points k.5 are themselves representable
    *    doubles here (spacing ≤ 0.5), so any decimal string that parses
    *    back to p lies strictly on p's side of every k.5 (a string on the
    *    far side would be nearer to k.5 — a different double — than to p).
    *    The shortest-string HALF_UP decision therefore agrees with the
    *    EXACT binary comparison of p's fraction against 0.5 — and that
    *    comparison is computable without error: floor(p) and p − floor(p)
    *    are exact for |p| < 2⁵² (both multiples of ulp(p), Sterbenz).
    *  - NaN/±∞: Round passes them through untouched; the cast gives 0 /
    *    saturation — preserved verbatim below.
    *
    * SqDistParitySpec pins this equivalence against the original
    * BigDecimal formula on boundary-adversarial inputs. Called from
    * generated code — keep it a static-shaped method on the companion. */
  def roundPicoToLong(p: Double): Long = {
    if (java.lang.Double.isNaN(p)) return 0L
    if (p >= 4.503599627370496e15) return p.toLong // integral; +∞ saturates
    if (p <= -4.503599627370496e15) return p.toLong
    if (p >= 0) {
      val r = Math.floor(p)
      val b = r.toLong
      if (p - r >= 0.5) b + 1 else b
    } else {
      val r = Math.ceil(p)
      val b = r.toLong
      if (r - p >= 0.5) b - 1 else b // HALF_UP = away from zero
    }
  }
}

/** Σ (CAST(x AS DOUBLE))² over a FLOAT array — the fused form of
  * `aggregate(transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
  * 0D, (s, v) -> s + v)` (TextFunctions.l2Norm's inner sum; callers wrap
  * it in sqrt). NOTE the null discipline DIFFERS from the SqDist family
  * on purpose: that fold has NO null filter, so a null ELEMENT poisons
  * the whole sum to null — replicated here exactly. */
case class FloatSqNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_sq_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      acc += xi * xi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      s"""
        int $n = $x.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($x.isNullAt($i)) {
            ${ev.isNull} = true;
          } else {
            double $xi = (double) $x.getFloat($i);
            $acc += $xi * $xi;
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): FloatSqNorm = copy(child = newChild)
}

object FloatSqNorm {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FloatSqNorm].getName, "float_sq_norm")
}

/** Σ (a[i]-b[i])² over two BIGINT (microunit) arrays — pure long
  * arithmetic, the fused form of the `sqDistLongSql` fold. Non-ANSI long
  * multiplication semantics (wraparound) match the SQL's. */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
            long $d = $x.getLong($i) - $y.getLong($i);
            $acc += $d * $d;
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SqDistLong].getName, "sq_dist_long")
}

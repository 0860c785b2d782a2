package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Literal (non-regex) FIRST-occurrence string replacement — exact parity
  * with Go's `strings.Replace(s, old, new, 1)` used by the reference's URI
  * rewrite (/root/reference/main.go:385-389).
  *
  * This is the one built-in gap called out in SURVEY.md §2.6:
  * `regexp_replace` replaces every occurrence (and interprets the pattern);
  * Go replaces only the first, literally, and an empty search string
  * inserts the replacement at the start. */
case class ReplaceFirst(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "replace_first"

  override def nullSafeEval(s: Any, search: Any, repl: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val o = search.asInstanceOf[UTF8String].toString
    val r = repl.asInstanceOf[UTF8String].toString
    val idx = if (o.isEmpty) 0 else str.indexOf(o)
    if (idx < 0) s.asInstanceOf[UTF8String]
    else UTF8String.fromString(
      str.substring(0, idx) + r + str.substring(idx + o.length))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, search, repl) => {
      val str = ctx.freshName("str")
      val o = ctx.freshName("o")
      val r = ctx.freshName("r")
      val idx = ctx.freshName("idx")
      s"""
        String $str = $s.toString();
        String $o = $search.toString();
        String $r = $repl.toString();
        int $idx = $o.isEmpty() ? 0 : $str.indexOf($o);
        if ($idx < 0) {
          ${ev.value} = $s;
        } else {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            $str.substring(0, $idx) + $r + $str.substring($idx + $o.length()));
        }
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ReplaceFirst =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ReplaceFirst {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ReplaceFirst].getName, "replace_first")
}

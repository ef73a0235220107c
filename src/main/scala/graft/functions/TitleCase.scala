package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Python `str.title()` semantics as a codegen'd Catalyst
  * expression.
  *
  * Differs from Spark's `initcap`, which uppercases only after
  * whitespace: Python titles every alphabetic run, so `"ai/ml"` becomes
  * `"Ai/Ml"` (initcap: `"Ai/ml"`) and `"o'neil"` becomes `"O'Neil"`.
  * The reference pipeline title-cases cleaned job titles this way
  * (reference `src/transform.py:96`), so parity needs the exact rule:
  * an alpha char is uppercased iff the previous char is non-alpha.
  */
object TitleCaseOps {
  def title(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevAlpha = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val alpha = Character.isLetter(c)
      sb.append(
        if (!alpha) c
        else if (prevAlpha) Character.toLowerCase(c)
        else Character.toUpperCase(c))
      prevAlpha = alpha
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class TitleCase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TitleCaseOps.title(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TitleCaseOps.title($c)")
  override protected def withNewChildInternal(c: Expression): TitleCase = copy(c)
  override def prettyName: String = "title_case"
}

object TitleCase {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: exact Python-title-case of a string column. */
  def titleCase(c: Column): Column =
    ColumnBridge.column(TitleCase(ColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable string hash: the classic polynomial rolling hash
  * h = fold(codepoints, 0)((acc, cp) => (acc * 31 + cp) mod 1e9+7).
  *
  * Unlike xxhash64/murmur (engine-specific), this is reproducible in any
  * SQL engine with codepoint access — DuckDB:
  * `list_reduce(list_prepend(0, list_transform(range(1, len(s)+1),
  *   j -> unicode(s[j]))), (acc, x) -> (acc * 31 + x) % 1000000007)` —
  * which is what makes winnowing fingerprints (q37) oracle-checkable
  * end-to-end. Iterates true codepoints (not UTF-16 units), matching
  * `unicode()` on supplementary characters. Codegen'd tight loop.
  */
object TextHash {
  final val Mod = 1000000007L

  def polyHash(s: UTF8String, base: Int): Long = {
    var h = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) h = (h * base + it.nextInt()) % Mod
    h
  }
}

case class PolyHash(child: Expression, base: Int = 31) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.polyHash(v.asInstanceOf[UTF8String], base)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.polyHash($c, $base)")
  override protected def withNewChildInternal(c: Expression): PolyHash =
    copy(child = c)
  override def prettyName: String = "poly_hash"
}

object PolyHash {
  def polyHash(c: Column, base: Int = 31): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), base))
}

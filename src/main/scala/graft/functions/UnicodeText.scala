package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression
  * (round-15 verdict #2). Real corpora carry decomposed sequences
  * (e.g. `e` + U+0301 vs the composed `é`) that must canonically
  * compose BEFORE tokenization, or the combining mark — category Mn,
  * matched by neither \p{L} nor \p{N} — splits a word in half.
  * java.text.Normalizer implements the Unicode NFC spec (UAX #15);
  * DuckDB's `nfc_normalize` replays the identical transform for the
  * oracle.
  */
object UnicodeTextOps {
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    // fast path: pure ASCII is always NFC, skip the normalizer walk
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UnicodeTextOps.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeTextOps.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(c)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: Unicode NFC canonical composition of a string column. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row span-dedup reconstruction kernels (q78/q100/q101, SURVEY
  * §2.14 and the curation pipeline's rewrite stage).
  *
  * The expression-pipeline formulation of "remove every duplicated
  * w-gram span" — sequence → array_except → sort_array → an aggregate()
  * interval fold → a transform() of gap slices → flatten → array_join →
  * polyHash — is row-local but runs as a deep tree of interpreted
  * higher-order functions over materialized intermediate arrays, and
  * its generated code is large enough to dominate the span-dedup
  * queries' wall time at small scale. The semantics are one linear
  * pass, so these kernels compute them in one: given a document's text
  * and its FIRST-occurrence gram starts (the distributed election's
  * output — the only cross-row information), mark duplicate-start
  * coverage with a diff array, then stream the uncovered tokens
  * directly through the polynomial hash (or into the rebuilt string)
  * without building interval or slice arrays at all.
  *
  * Portability contract unchanged: tokenization is `split(" ", -1)`
  * with empty tokens dropped, and `kept_hash` is the base-31
  * polynomial codepoint hash of the single-space-joined kept tokens —
  * exactly what the DuckDB oracle replays.
  */
object SpanKernel {
  private final val P = TextHash.Mod

  /** [n_tok, n_dup_spans, n_removed, kept_hash] for one document.
    * `firstStarts` holds the gram start positions whose FIRST corpus
    * occurrence lies in this document (callers coalesce a join miss to
    * an empty array); every other start in [0, n_tok - w] is a
    * duplicate and its w tokens are removed.
    */
  def spanStats(s: UTF8String, firstStarts: ArrayData, w: Int): ArrayData = {
    val toks = s.toString.split(" ", -1).filter(_.nonEmpty)
    val n = toks.length
    val nStarts = math.max(0, n - w + 1)
    val isFirst = new Array[Boolean](nStarts)
    var i = 0
    while (i < firstStarts.numElements()) {
      val p = firstStarts.getInt(i)
      if (p >= 0 && p < nStarts) isFirst(p) = true
      i += 1
    }
    // diff-mark covered positions: O(n), no interval materialization
    val diff = new Array[Int](n + 1)
    var dupStarts = 0L
    i = 0
    while (i < nStarts) {
      if (!isFirst(i)) { dupStarts += 1; diff(i) += 1; diff(i + w) -= 1 }
      i += 1
    }
    var cover = 0
    var removed = 0L
    var h = 0L
    var emitted = false
    i = 0
    while (i < n) {
      cover += diff(i)
      if (cover > 0) removed += 1
      else {
        if (emitted) h = (h * 31 + 32) % P // the joining space
        val it = toks(i).codePoints().iterator()
        while (it.hasNext) h = (h * 31 + it.nextInt()) % P
        emitted = true
      }
      i += 1
    }
    new GenericArrayData(Array(n.toLong, dupStarts, removed, h))
  }

  /** The rebuilt post-dedup text itself (the curation pipeline's
    * rewrite stage): same coverage walk as [[spanStats]], emitting the
    * kept tokens instead of hashing them.
    */
  def spanKeptText(s: UTF8String, firstStarts: ArrayData, w: Int): UTF8String = {
    val toks = s.toString.split(" ", -1).filter(_.nonEmpty)
    val n = toks.length
    val nStarts = math.max(0, n - w + 1)
    val isFirst = new Array[Boolean](nStarts)
    var i = 0
    while (i < firstStarts.numElements()) {
      val p = firstStarts.getInt(i)
      if (p >= 0 && p < nStarts) isFirst(p) = true
      i += 1
    }
    val diff = new Array[Int](n + 1)
    i = 0
    while (i < nStarts) {
      if (!isFirst(i)) { diff(i) += 1; diff(i + w) -= 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder(s.numBytes())
    var cover = 0
    i = 0
    while (i < n) {
      cover += diff(i)
      if (cover <= 0) {
        if (sb.length() > 0) sb.append(' ')
        sb.append(toks(i))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def spanStats(text: Column, firstStarts: Column, w: Int): Column =
    ColumnBridge.column(SpanStats(ColumnBridge.expression(text),
      ColumnBridge.expression(firstStarts), w))
  def spanKeptText(text: Column, firstStarts: Column, w: Int): Column =
    ColumnBridge.column(SpanKeptText(ColumnBridge.expression(text),
      ColumnBridge.expression(firstStarts), w))
}

case class SpanStats(left: Expression, right: Expression, w: Int)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any, f: Any): Any =
    SpanKernel.spanStats(t.asInstanceOf[UTF8String], f.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, f) =>
      s"graft.functions.SpanKernel.spanStats($t, $f, $w)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SpanStats = copy(left = l, right = r)
  override def prettyName: String = "span_stats"
}

case class SpanKeptText(left: Expression, right: Expression, w: Int)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(t: Any, f: Any): Any =
    SpanKernel.spanKeptText(t.asInstanceOf[UTF8String], f.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, f) =>
      s"graft.functions.SpanKernel.spanKeptText($t, $f, $w)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SpanKeptText = copy(left = l, right = r)
  override def prettyName: String = "span_kept_text"
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML boilerplate extraction — the first stage of every real web-crawl
  * corpus (the trafilatura/jusText stage the reference never needs
  * because it ingests pre-extracted CSV, `data_extract.py:62`).
  *
  * Two halves, both codegen'd Catalyst expressions so the pass stays
  * inside whole-stage codegen (no UDF, no mapPartitions):
  *
  *  - [[HtmlWrap]] renders a document's text into a deterministic HTML
  *    page with PLANTED boilerplate — nav link list, page header,
  *    script, a link-farm "related" div, a copyright footer — around
  *    the real content split into `<p>` paragraphs of 12 tokens. The
  *    wrapper is a pure function of (doc_id, text), which is what lets
  *    the DuckDB oracle replay page generation exactly.
  *
  *  - [[HtmlMainStats]] extracts the main text back out with the
  *    standard two-rule extractor (jusText/Arc90 family, public
  *    algorithms):
  *      1. semantic-tag pruning: subtrees under nav / footer / aside /
  *         header / script / style are never content;
  *      2. block classification: every remaining block element
  *         (p, div, li, h1..h6) with nonempty text is kept iff its text
  *         has >= MinChars characters AND link density < 0.3 — exact
  *         integer form `10*linkChars < 3*textChars`, so the SQL oracle
  *         replays the rule bit-for-bit.
  *    Characters are counted in CODEPOINTS (DuckDB `length()`
  *    semantics), not UTF-16 units.
  *
  * The parser is a single linear scan with a tag stack: no regex, no
  * allocation per character, O(page) per row; rows are independent, so
  * the operator is embarrassingly parallel at any corpus size. It
  * handles the well-formed subset the wrapper emits plus the usual
  * benign variations (attributes, self-closing tags, unknown tags,
  * stray close tags); it never throws on hostile text — garbage yields
  * garbage blocks, not a crash (the degenerate corpora run through it).
  */
object HtmlExtractOps {

  /** jusText-lite floor: a content block has at least this many chars. */
  val MinChars = 25

  private val Pruned = Set("nav", "footer", "aside", "header", "script", "style")
  private val BlockTags = Set("p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6")

  /** Render doc text into the deterministic HTML wrapper. Planted
    * boilerplate (all a pure function of docId): head title + script,
    * a 3-link nav, an `<h1>` page header, a "related" div with
    * 2 + docId%3 links, a copyright footer. Content: the text's
    * tokens in `<p>` blocks of 12.
    */
  def wrap(docId: Long, text: UTF8String): UTF8String = {
    val t = text.toString
    val sb = new java.lang.StringBuilder(t.length + (t.length >> 2) + 512)
    sb.append("<html><head><title>doc ").append(docId)
      .append("</title><script>var page=").append(docId)
      .append(";</script></head><body>")
    sb.append("<nav><ul><li><a href=\"/home\">home</a></li>")
      .append("<li><a href=\"/about\">about</a></li>")
      .append("<li><a href=\"/contact\">contact</a></li></ul></nav>")
    sb.append("<h1>document ").append(docId).append("</h1>")
    val toks = t.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      sb.append("<p>")
      val end = math.min(i + 12, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      sb.append("</p>")
      i += 12
    }
    sb.append("<div class=\"related\">related: ")
    val nl = (2 + math.floorMod(docId, 3L)).toInt
    var j = 0
    while (j < nl) {
      if (j > 0) sb.append(' ')
      val k = math.floorMod(docId + j, 1000L)
      sb.append("<a href=\"/d/").append(k).append("\">doc-").append(k)
        .append("</a>")
      j += 1
    }
    sb.append("</div>")
    sb.append("<footer>copyright 2026 the corpus company all rights reserved</footer>")
    sb.append("</body></html>")
    UTF8String.fromString(sb.toString)
  }

  private final class Block {
    val sb = new java.lang.StringBuilder()
    var chars = 0L // codepoints
    var linkChars = 0L // codepoints inside <a> anchors
  }

  /** Tag-walk + classify. Returns the struct
    * (n_blocks, n_kept, kept_chars, link_chars, main_text): candidate
    * block counts, total codepoints of kept blocks, total anchor
    * codepoints over candidates, and the kept blocks' texts joined by
    * '\n' (null when nothing survives).
    */
  def stats(html: UTF8String): InternalRow = {
    val s = html.toString
    val n = s.length
    var i = 0
    var pruneDepth = 0
    var anchorDepth = 0
    val stack = new java.util.ArrayDeque[Block]()
    var nBlocks = 0L; var nKept = 0L; var keptChars = 0L; var linkChars = 0L
    val kept = new java.lang.StringBuilder()
    var anyKept = false
    while (i < n) {
      if (s.charAt(i) == '<') {
        val close = i + 1 < n && s.charAt(i + 1) == '/'
        var j = i + (if (close) 2 else 1)
        val nameStart = j
        while (j < n && s.charAt(j) != '>' && s.charAt(j) != ' ' &&
               s.charAt(j) != '/' && s.charAt(j) != '\t' &&
               s.charAt(j) != '\n' && s.charAt(j) != '\r') j += 1
        val name = s.substring(nameStart, j).toLowerCase
        var k = j
        while (k < n && s.charAt(k) != '>') k += 1
        val selfClose = k > i && k < n && s.charAt(k - 1) == '/'
        i = math.min(k + 1, n)
        if (name.nonEmpty && !selfClose) {
          if (close) {
            if (Pruned(name)) { if (pruneDepth > 0) pruneDepth -= 1 }
            else if (name == "a") { if (anchorDepth > 0) anchorDepth -= 1 }
            else if (BlockTags(name) && pruneDepth == 0 && !stack.isEmpty) {
              val b = stack.pop()
              if (b.chars > 0) {
                nBlocks += 1
                linkChars += b.linkChars
                if (b.chars >= MinChars && b.linkChars * 10 < b.chars * 3) {
                  nKept += 1; keptChars += b.chars
                  if (anyKept) kept.append('\n')
                  kept.append(b.sb); anyKept = true
                }
              }
            }
          } else {
            if (Pruned(name)) pruneDepth += 1
            else if (pruneDepth == 0) {
              if (name == "a") anchorDepth += 1
              else if (BlockTags(name)) stack.push(new Block)
            }
          }
        }
      } else {
        var k = i
        while (k < n && s.charAt(k) != '<') k += 1
        if (pruneDepth == 0 && !stack.isEmpty) {
          val b = stack.peek()
          b.sb.append(s, i, k)
          val cp = Character.codePointCount(s, i, k).toLong
          b.chars += cp
          if (anchorDepth > 0) b.linkChars += cp
        }
        i = k
      }
    }
    new GenericInternalRow(Array[Any](nBlocks, nKept, keptChars, linkChars,
      if (anyKept) UTF8String.fromString(kept.toString) else null))
  }
}

/** html_wrap(doc_id, text): the deterministic HTML page for a doc. */
case class HtmlWrap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(id: Any, t: Any): Any =
    HtmlExtractOps.wrap(id.asInstanceOf[Long], t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (id, t) => s"graft.ops.HtmlExtractOps.wrap($id, $t)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HtmlWrap = copy(l, r)
  override def prettyName: String = "html_wrap"
}

/** html_main_stats(html): boilerplate-extraction result struct. */
case class HtmlMainStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("kept_chars", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false),
    StructField("main_text", StringType, nullable = true)))
  override def nullSafeEval(v: Any): Any =
    HtmlExtractOps.stats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.HtmlExtractOps.stats($c)")
  override protected def withNewChildInternal(c: Expression): HtmlMainStats =
    copy(c)
  override def prettyName: String = "html_main_stats"
}

object HtmlExtract {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: deterministic HTML wrapper page for (doc_id, text). */
  def htmlWrap(docId: Column, text: Column): Column =
    ColumnBridge.column(HtmlWrap(
      ColumnBridge.expression(docId), ColumnBridge.expression(text)))

  /** Column API: extraction stats struct
    * (n_blocks, n_kept, kept_chars, link_chars, main_text).
    */
  def htmlMainStats(html: Column): Column =
    ColumnBridge.column(HtmlMainStats(ColumnBridge.expression(html)))
}

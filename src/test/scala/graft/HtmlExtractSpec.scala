package graft

import graft.ops.HtmlExtractOps
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** HTML boilerplate extraction (q172/q175, round-15 verdict #1):
  * planted-boilerplate removal, the two classification rules (length
  * floor, link density), semantic-tag pruning, parser robustness on
  * real-world HTML shapes, and the q172 oracle-twin run.
  */
class HtmlExtractSpec extends SparkSpec {

  private def stats(html: String): InternalRow =
    HtmlExtractOps.stats(UTF8String.fromString(html))
  private def mainText(r: InternalRow): String =
    if (r.isNullAt(4)) null else r.getUTF8String(4).toString

  test("planted boilerplate is removed; content paragraphs survive intact") {
    val text = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi") // 22 tokens
    val html = HtmlExtractOps
      .wrap(7L, UTF8String.fromString(text)).toString
    // the wrapper really planted the boilerplate...
    assert(html.contains("<nav>") && html.contains("<footer>") &&
      html.contains("related: ") && html.contains("<script>"))
    val r = stats(html)
    val out = mainText(r)
    // ...and the extractor removed every planted string
    assert(!out.contains("copyright"))
    assert(!out.contains("home") && !out.contains("about"))
    assert(!out.contains("related:") && !out.contains("doc-"))
    assert(!out.contains("document 7")) // the h1 header
    assert(!out.contains("var page")) // the script body
    // content = two 12/10-token paragraphs, both >= 25 chars => all kept
    val paras = out.split("\n")
    assert(paras.length == 2)
    assert(paras.mkString(" ") == text, "extracted content must equal input")
    // n_blocks: h1 + 2 paragraphs + related div = 4; kept = 2 paragraphs
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
  }

  test("length floor: a short tail paragraph drops; link farm drops by DENSITY") {
    // 13 tokens => second paragraph is one 2-char token, < 25 chars
    val text = "one two three four five six seven eight nine ten eleven twelve xy"
    val r = stats(HtmlExtractOps.wrap(1002L, UTF8String.fromString(text)).toString)
    val out = mainText(r)
    assert(out != null && !out.contains("xy"))
    assert(out == text.split(" ").take(12).mkString(" "))
    // doc_id 1002 => 2 + 1002%3 = 2 links: related text is SHORT (< 25).
    // doc_id 1004 => 4 links of 'doc-5..doc-8': 9 + 4*5 + 3 = 32 chars,
    // passes the length floor — only the density rule can drop it.
    val h4 = HtmlExtractOps.wrap(1004L, UTF8String.fromString(text)).toString
    val relText = "related: doc-4 doc-5 doc-6 doc-7"
    assert(h4.contains(">doc-4</a>") && h4.contains(">doc-7</a>"))
    val r4 = stats(h4)
    assert(relText.length >= HtmlExtractOps.MinChars) // floor passes...
    assert(!mainText(r4).contains("doc-")) // ...density still drops it
    // link_chars counted: 4 anchors x 5 chars
    assert(r4.getLong(3) == 20)
  }

  test("density boundary is the exact integer rule 10*link < 3*chars") {
    // 30 chars of text with 9 anchor chars: 90 < 90 is false => dropped
    val atBound = "<p>" + "x" * 21 + "<a href=\"/z\">" + "y" * 9 + "</a></p>"
    val rb = stats(atBound)
    assert(rb.getLong(1) == 0, "density == 0.3 must drop (strict <)")
    // 31 chars with 9 anchor chars: 90 < 93 => kept
    val under = "<p>" + "x" * 22 + "<a href=\"/z\">" + "y" * 9 + "</a></p>"
    val ru = stats(under)
    assert(ru.getLong(1) == 1 && ru.getLong(2) == 31 && ru.getLong(3) == 9)
  }

  test("semantic pruning: nested pruned tags, blocks inside aside/header die") {
    val html = "<body><header><p>" + "h" * 40 + "</p></header>" +
      "<aside><div><p>" + "a" * 40 + "</p></div></aside>" +
      "<p>" + "k" * 40 + "</p>" +
      "<footer><footer><p>" + "f" * 40 + "</p></footer><p>" + "g" * 40 +
      "</p></footer></body>"
    val r = stats(html)
    assert(r.getLong(0) == 1 && r.getLong(1) == 1)
    assert(mainText(r) == "k" * 40)
  }

  test("parser robustness: attributes, self-closing, unknown tags, hostile text") {
    val html = "<div id=\"main\" class='x y'>" + "m" * 30 +
      "<br/><img src=\"/i.png\"/><span>" + "s" * 10 + "</span></div>"
    val r = stats(html)
    assert(r.getLong(1) == 1 && r.getLong(2) == 40)
    // unclosed tags / stray closers / angle garbage: no crash, no throw
    stats("<p>never closed")
    stats("</p></div><p>stray</p>")
    stats("a < b > c <<>> <1bad>")
    stats("")
    // codepoints, not UTF-16 units: astral chars count once
    val astral = "<p>" + "😀".repeat(30) + "</p>" // 30 emoji
    assert(stats(astral).getLong(2) == 30)
  }

  test("q172 oracle twin runs and the composed q175 chain yields rows") {
    val out = queries.Registry.byName("q172_html_extract")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every fixture doc keeps at least one paragraph and always sees
    // the planted candidates (h1 + related)
    assert(out.forall(r => r.getLong(1) >= 1))
    assert(out.forall(r => r.getLong(2) > 0))
    val prep = queries.Registry.byName("q175_html_corpus_prep")
      .run(spark, sfDir).collect()
    assert(prep.nonEmpty)
  }
}

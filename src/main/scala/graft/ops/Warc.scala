package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500 / WARC/1.0) container framing — the on-disk format
  * every web-scale crawl corpus actually arrives in (Common Crawl et
  * al.), and the stage in FRONT of the HTML boilerplate extractor: a
  * real 100 TB pipeline reads WARC segments, walks Content-Length-framed
  * records, and feeds each response payload to extraction. The reference
  * ingests pre-extracted CSV (reference `src/data_extract.py:62`), so
  * this is beyond-reference surface, built from the public spec only.
  *
  * Same codec playbook as JPEG/WAV/AVI (`ops/{Jpeg,Audio,Video}.scala`):
  *  - [[WarcBuild]] renders one response record — a pure function of
  *    (uri, payload), which is what lets the DuckDB oracle replay the
  *    exact header bytes and therefore every record length;
  *  - [[WarcParse]] walks a multi-record segment by the spec's framing
  *    (version line, header lines to the blank line, `Content-Length`
  *    octet count, 2×CRLF record separator) and returns one struct per
  *    record with its absolute segment offset. Offsets are produced by
  *    the WALK, not arithmetic, so the oracle's independently computed
  *    cumulative-length offsets check the framing itself.
  *
  * Scale posture: records are self-delimiting, segments are bounded
  * (the registry query packs ~512 docs ≈ 1 MB per segment regardless of
  * sf), and both halves are per-row work inside whole-stage codegen —
  * the only exchange in the round-trip query is the one shuffle that
  * materializes each segment's records in file order, exactly the
  * shuffle a real segment writer pays.
  *
  * Malformed input follows the codec quarantine contract: any framing
  * violation (bad magic, missing/oversized Content-Length, truncated
  * payload, broken separator) raises IllegalArgumentException with the
  * byte offset — never an index crash and never a silent partial parse.
  */
object WarcOps {

  private val Crlf = "\r\n"

  /** Render one WARC/1.0 response record: version line, three named
    * headers, `Content-Length` in payload octets, blank line, payload,
    * 2×CRLF separator. Header text is ASCII; the payload is copied
    * verbatim (already UTF-8 when it came from a string column).
    */
  def build(uri: UTF8String, payload: Array[Byte]): Array[Byte] = {
    val head = new java.lang.StringBuilder(160 + uri.numBytes())
    head.append("WARC/1.0").append(Crlf)
      .append("WARC-Type: response").append(Crlf)
      .append("WARC-Target-URI: ").append(uri.toString).append(Crlf)
      .append("Content-Type: text/html").append(Crlf)
      .append("Content-Length: ").append(payload.length).append(Crlf)
      .append(Crlf)
    val hb = head.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Concatenate pre-built records (array of binary, already in file
    * order) into one segment blob.
    */
  def segment(recs: ArrayData): Array[Byte] = {
    val n = recs.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val r = recs.getBinary(i)
      require(r != null, "warc segment: null record")
      total += r.length; i += 1
    }
    require(total <= Int.MaxValue, s"warc segment over 2 GiB ($total bytes)")
    val out = new Array[Byte](total.toInt)
    var off = 0
    i = 0
    while (i < n) {
      val r = recs.getBinary(i)
      System.arraycopy(r, 0, out, off, r.length)
      off += r.length; i += 1
    }
    out
  }

  private def fail(off: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"warc parse at offset $off: $msg")

  /** Find the next plausible record start at or after `from`: the next
    * occurrence of the version-line bytes "WARC/1.0\r\n". No
    * line-boundary requirement — a truncated record can butt its
    * payload directly against the next record's magic, and a false
    * positive can only occur INSIDE a region already being skipped
    * (good records are framed by Content-Length, never scanned), where
    * it costs one more failed parse attempt, not data. Returns
    * seg.length when none remains.
    */
  private def nextMagic(seg: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 10 <= seg.length) {
      if (seg(i) == 'W' && seg(i + 1) == 'A' && seg(i + 2) == 'R' &&
          seg(i + 3) == 'C' && seg(i + 4) == '/' && seg(i + 5) == '1' &&
          seg(i + 6) == '.' && seg(i + 7) == '0' &&
          seg(i + 8) == '\r' && seg(i + 9) == '\n') return i
      i += 1
    }
    seg.length
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 >= b.length) fail(from, "header line without CRLF")
    i
  }

  /** Parse one record starting at `start`; returns (record struct, end
    * offset). Throws IAE on any framing violation.
    */
  private def parseRecord(seg: Array[Byte], start: Int)
      : (GenericInternalRow, Int) = {
    var off = start
    var e = lineEnd(seg, off)
    if (!(e - off == 8 && seg(off) == 'W' && seg(off + 1) == 'A' &&
          seg(off + 2) == 'R' && seg(off + 3) == 'C' && seg(off + 4) == '/' &&
          seg(off + 5) == '1' && seg(off + 6) == '.' && seg(off + 7) == '0'))
      fail(off, "missing WARC/1.0 version line")
    off = e + 2
    var uri: String = null
    var recType: String = null
    var clen = -1L
    // header lines until the blank line
    var done = false
    while (!done) {
      e = lineEnd(seg, off)
      if (e == off) { done = true; off += 2 }
      else {
        val line = new String(seg, off, e - off,
          java.nio.charset.StandardCharsets.UTF_8)
        val c = line.indexOf(':')
        if (c < 0) fail(off, s"header line without colon: '$line'")
        val k = line.substring(0, c)
        val v = line.substring(c + 1).trim
        if (k.equalsIgnoreCase("Content-Length")) {
          try clen = java.lang.Long.parseLong(v)
          catch { case _: NumberFormatException =>
            fail(off, s"bad Content-Length '$v'") }
        } else if (k.equalsIgnoreCase("WARC-Target-URI")) uri = v
        else if (k.equalsIgnoreCase("WARC-Type")) recType = v
        off = e + 2
      }
    }
    if (clen < 0) fail(start, "record without Content-Length")
    if (clen > seg.length - off - 4)
      fail(start, s"Content-Length $clen overruns segment")
    val payload = java.util.Arrays.copyOfRange(seg, off, off + clen.toInt)
    off += clen.toInt
    if (!(seg(off) == '\r' && seg(off + 1) == '\n' &&
          seg(off + 2) == '\r' && seg(off + 3) == '\n'))
      fail(off, "missing record separator")
    off += 4
    (new GenericInternalRow(Array[Any](
      if (uri == null) null else UTF8String.fromString(uri),
      if (recType == null) null else UTF8String.fromString(recType),
      start.toLong, clen, payload)), off)
  }

  /** Walk a segment: one struct (uri, rec_type, offset, content_length,
    * payload) per record, in segment order. Quarantines (IAE) on any
    * framing violation — the whole segment is rejected (q178's
    * round-trip contract; use [[parseLenient]] for record-level
    * salvage over dirty segments).
    */
  def parse(seg: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var off = 0
    while (off < seg.length) {
      val (rec, next) = parseRecord(seg, off)
      out += rec
      off = next
    }
    new GenericArrayData(out.toArray)
  }

  /** Record-level salvage over a possibly dirty segment — what a real
    * crawl reader does, because one flipped byte must cost one record,
    * not a whole 1 GB segment: on any framing violation, scan forward
    * to the next plausible record start (a "WARC/1.0\r\n" at a line
    * boundary) and resume; the bytes jumped over are accounted, never
    * silently dropped. Returns (records, n_bad, skipped_bytes).
    */
  def parseLenient(seg: Array[Byte]): InternalRow = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var off = 0
    var nBad = 0L
    var skipped = 0L
    while (off < seg.length) {
      try {
        val (rec, next) = parseRecord(seg, off)
        out += rec
        off = next
      } catch {
        case _: IllegalArgumentException =>
          val resume = nextMagic(seg, off + 1)
          nBad += 1
          skipped += resume - off
          off = resume
      }
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(out.toArray), nBad, skipped))
  }
}

/** warc_build(uri, payload): one WARC/1.0 response record as bytes. */
case class WarcBuild(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(u: Any, p: Any): Any =
    WarcOps.build(u.asInstanceOf[UTF8String], p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, p) => s"graft.ops.WarcOps.build($u, $p)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WarcBuild = copy(l, r)
  override def prettyName: String = "warc_build"
}

/** warc_segment(array<binary>): concatenate records into a segment. */
case class WarcSegment(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    WarcOps.segment(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.WarcOps.segment($c)")
  override protected def withNewChildInternal(c: Expression): WarcSegment =
    copy(c)
  override def prettyName: String = "warc_segment"
}

/** warc_parse(segment): array of per-record structs, in segment order. */
case class WarcParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("uri", StringType, nullable = true),
    StructField("rec_type", StringType, nullable = true),
    StructField("offset", LongType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    WarcOps.parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.WarcOps.parse($c)")
  override protected def withNewChildInternal(c: Expression): WarcParse =
    copy(c)
  override def prettyName: String = "warc_parse"
}

/** warc_parse_lenient(segment): (records, n_bad, skipped_bytes) with
  * record-level salvage instead of whole-segment quarantine.
  */
case class WarcParseLenient(child: Expression) extends UnaryExpression {
  private val recordType = WarcParse(child).dataType
  override def dataType: DataType = StructType(Seq(
    StructField("records", recordType, nullable = false),
    StructField("n_bad", LongType, nullable = false),
    StructField("skipped_bytes", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    WarcOps.parseLenient(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.WarcOps.parseLenient($c)")
  override protected def withNewChildInternal(c: Expression)
      : WarcParseLenient = copy(c)
  override def prettyName: String = "warc_parse_lenient"
}

object Warc {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def warcBuild(uri: Column, payload: Column): Column =
    ColumnBridge.column(WarcBuild(
      ColumnBridge.expression(uri), ColumnBridge.expression(payload)))

  def warcSegment(recs: Column): Column =
    ColumnBridge.column(WarcSegment(ColumnBridge.expression(recs)))

  def warcParse(segment: Column): Column =
    ColumnBridge.column(WarcParse(ColumnBridge.expression(segment)))

  def warcParseLenient(segment: Column): Column =
    ColumnBridge.column(WarcParseLenient(ColumnBridge.expression(segment)))
}

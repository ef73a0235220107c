package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2.11 E5): media payloads ride
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition so heavyweight codec state is
  * initialized once per task, never per row.
  *
  * Two decode paths:
  *  - `decodeImages` runs REAL codecs: binary PPM (P6) parse and a
  *    pure-JVM PNG decode (zlib + all five scanline filters), sniffed
  *    per payload, plus pixel-grid nearest-neighbor resize — no
  *    external libraries (q96/q166 oracle-check the full
  *    encode→decode→feature chain).
  *  - `decodeStub` stands in for formats that need external codecs
  *    (JPEG/audio/video — absent in this container): it derives a
  *    fixed-length feature vector from the bytes. The surrounding
  *    plumbing — schema, binary transport, partition batching — is the
  *    same either way; swapping the stub for a JNI/codec call is a
  *    one-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** STUB decoder: stands in for image decode + resize + embed. Features:
    * payload length, xxhash-like rolling checksum, mean byte value, and a
    * 4-bin byte histogram — deterministic in the bytes alone.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(7)(0.0)
    var checksum = 1125899906842597L
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = checksum * 31 + b
      sum += b
      hist(b >> 6) += 1
      i += 1
    }
    Array(
      payload.length.toDouble,
      (checksum & 0x7fffffffL).toDouble,
      sum.toDouble / payload.length,
      hist(0).toDouble, hist(1).toDouble, hist(2).toDouble, hist(3).toDouble)
  }

  /** Wrap raw payload rows (id, bytes) into the media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** Deterministic stub resize: stride-sample the payload down to
    * `target` bytes (the byte-level analogue of nearest-neighbor image
    * downsampling). Stands in for a codec resize; deterministic in the
    * bytes alone, identity when already small enough.
    */
  private[ops] def resizeStub(payload: Array[Byte], target: Int): Array[Byte] = {
    if (payload == null) return Array.emptyByteArray
    if (payload.length <= target) return payload
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = payload((i.toLong * payload.length / target).toInt)
      i += 1
    }
    out
  }

  /** Resize every payload to at most `targetBytes` (per-partition codec
    * init point, same contract as [[extractFeatures]]); metadata is
    * recomputed so downstream stages see the true stored size.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val enc = ExpressionEncoder(mediaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val resized = resizeStub(r.getAs[Array[Byte]](payloadIdx), targetBytes)
        val mime = r.getStruct(metaIdx).getString(0)
        Row(r.getLong(idIdx), resized, Row(mime, resized.length.toLong))
      }
    }(enc)
  }

  /** Frame sampling (the video analogue: one payload → every n-th
    * fixed-size frame as its own row). flatMap inside mapPartitions so a
    * real demuxer would be initialized once per task; frame indices are
    * the ORIGINAL positions, so downstream can reconstruct timing.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame", BinaryType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val id = r.getLong(idIdx)
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyNth == 0 =>
            Row(id, idx.toLong, frame)
        }
      }
    }(enc)
  }

  // ---- REAL image codec: binary PPM (P6) ---------------------------------
  // PPM needs no codec library, so this path is NOT a stub: a
  // spec-compliant parser (magic, '#' comments, arbitrary token
  // whitespace, maxval, raster) plus a true nearest-neighbor resize on
  // the decoded pixel grid. It exercises every piece of the multimodal
  // contract — binary transport, per-task decode, malformed-payload
  // failure — on a genuine image format.

  /** Decoded 8-bit image: dimensions + packed RGB raster. */
  final case class RgbImage(w: Int, h: Int, rgb: Array[Byte])

  /** Encode an 8-bit RGB raster as binary PPM (P6). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a binary PPM (P6) payload per the Netpbm spec. Throws
    * IllegalArgumentException on malformed input — an ingestion pipeline
    * catches and quarantines those rows.
    */
  def decodePpm(payload: Array[Byte]): RgbImage = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (payload == null || payload.length < 2 ||
        payload(0) != 'P' || payload(1) != '6') fail("not a P6 ppm")
    var pos = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < payload.length) {
        val b = payload(pos)
        if (b == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else done = true
      }
    }
    def intToken(): Int = {
      skipWs()
      val start = pos
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9')
        pos += 1
      if (pos == start) fail(s"expected integer at byte $start")
      new String(payload, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII).toInt
    }
    val w = intToken(); val h = intToken(); val maxval = intToken()
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    pos += 1 // exactly one whitespace byte separates maxval from raster
    val n = w * h * 3
    if (payload.length - pos < n) fail("truncated raster")
    val rgb = new Array[Byte](n)
    System.arraycopy(payload, pos, rgb, 0, n)
    RgbImage(w, h, rgb)
  }

  /** True nearest-neighbor resize on the decoded pixel grid:
    * out(x, y) = in(floor(x*w/tw), floor(y*h/th)).
    */
  def nnResize(img: RgbImage, tw: Int, th: Int): RgbImage = {
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.h / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.w / tw).toInt
        val src = (sy * img.w + sx) * 3
        val dst = (y * tw + x) * 3
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    RgbImage(tw, th, out)
  }

  /** Decode every payload with the REAL codecs (P6 or PNG, sniffed per
    * payload via [[decodeImage]]), then emit image-level
    * features: dimensions, stored size, per-channel sums, and the total
    * of a (tw x th) nearest-neighbor thumbnail. Integer outputs keep the
    * whole chain engine-exact for the oracle.
    */
  def decodeImages(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("w", LongType),
      StructField("h", LongType),
      StructField("n_bytes", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("rsum", LongType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img = decodeImage(payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.rgb.length) {
          sr += img.rgb(i) & 0xff
          sg += img.rgb(i + 1) & 0xff
          sb += img.rgb(i + 2) & 0xff
          i += 3
        }
        val small = nnResize(img, tw, th)
        var rs = 0L; var j = 0
        while (j < small.rgb.length) { rs += small.rgb(j) & 0xff; j += 1 }
        Row(r.getLong(idIdx), img.w.toLong, img.h.toLong,
            payload.length.toLong, sr, sg, sb, rs)
      }
    }(enc)
  }

  // ---- REAL image codec #2: PNG (ISO/IEC 15948) --------------------------
  // Pure-JVM PNG support — java.util.zip {Deflater, Inflater, CRC32} plus
  // the five scanline filters from the public spec; integer-exact, zero
  // new dependencies. Every real multimodal corpus leads with PNG/JPEG,
  // and PNG is fully implementable without a codec library, so this path
  // is NOT a stub either: chunk framing, per-chunk CRC verification,
  // zlib round-trip, and filter reversal are all the genuine article.
  // Scope: 8-bit RGB (color type 2), no interlace — the shape our
  // renders produce; anything else fails loudly for quarantine.

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** PNG filter transform for one scanline (bpp = 3). `raw` is the
    * unfiltered row, `prior` the previous unfiltered row (zeros for row
    * 0); returns the filtered bytes for filter type `ft`. Inverse below.
    */
  private def pngFilterRow(ft: Int, raw: Array[Byte],
                           prior: Array[Byte]): Array[Byte] = {
    val n = raw.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = raw(i) & 0xff
      val a = if (i >= 3) raw(i - 3) & 0xff else 0
      val b = prior(i) & 0xff
      val c = if (i >= 3) prior(i - 3) & 0xff else 0
      out(i) = (ft match {
        case 0 => x
        case 1 => x - a
        case 2 => x - b
        case 3 => x - (a + b) / 2
        case 4 => x - paeth(a, b, c)
      }).toByte
      i += 1
    }
    out
  }

  /** Paeth predictor exactly as specified (PNG spec §9, Filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit RGB raster as a PNG: signature, IHDR (bit depth 8,
    * color type 2 truecolor, no interlace), one zlib-deflated IDAT, IEND
    * — each chunk CRC'd per the spec. `filterOf(row)` picks the scanline
    * filter (0..4) so a round-trip can exercise every filter type the
    * decoder must reverse (a single-filter encoder would leave 4 of the
    * 5 inverse paths untested).
    */
  def encodePng(w: Int, h: Int, rgb: Array[Byte],
                filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w * h * 3}")
    val stride = w * 3
    val filtered = new java.io.ByteArrayOutputStream()
    var prior = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val raw = java.util.Arrays.copyOfRange(rgb, y * stride, (y + 1) * stride)
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"bad filter $ft for row $y")
      filtered.write(ft)
      filtered.write(pngFilterRow(ft, raw, prior))
      prior = raw
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      be32(data.length) ++ t ++ data ++ be32(crc32(t, data))
    }
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse a PNG payload per the public spec: signature, chunk walk with
    * per-chunk CRC verification, IHDR validation (8-bit RGB, no
    * interlace), IDAT concatenation + zlib inflate, and exact reversal
    * of all five scanline filters. Throws IllegalArgumentException on
    * anything malformed — same quarantine contract as [[decodePpm]].
    */
  def decodePng(payload: Array[Byte]): RgbImage = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (payload == null || payload.length < 8 ||
        !java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(payload, 0, 8), PngSig))
      fail("not a png (bad signature)")
    var pos = 8
    def readBe32(): Int = {
      if (pos + 4 > payload.length) fail("truncated chunk header")
      val v = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      pos += 4; v
    }
    var w = 0; var h = 0; var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      val len = readBe32()
      // Long arithmetic: len near 2^31 would overflow an Int sum and
      // bypass this bound, dying later with a non-contract IOOBE.
      if (len < 0 || pos.toLong + 8L + len > payload.length) fail("truncated chunk")
      val tag = new String(payload, pos, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val tagBytes = java.util.Arrays.copyOfRange(payload, pos, pos + 4)
      val data = java.util.Arrays.copyOfRange(payload, pos + 4, pos + 4 + len)
      pos += 4 + len
      val crc = readBe32()
      if (crc != crc32(tagBytes, data)) fail(s"bad CRC on $tag chunk")
      tag match {
        case "IHDR" =>
          if (len != 13) fail(s"IHDR length $len != 13")
          w = ((data(0) & 0xff) << 24) | ((data(1) & 0xff) << 16) |
            ((data(2) & 0xff) << 8) | (data(3) & 0xff)
          h = ((data(4) & 0xff) << 24) | ((data(5) & 0xff) << 16) |
            ((data(6) & 0xff) << 8) | (data(7) & 0xff)
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          if (data(8) != 8) fail(s"unsupported bit depth ${data(8)}")
          if (data(9) != 2) fail(s"unsupported color type ${data(9)} (want RGB)")
          if (data(10) != 0 || data(11) != 0) fail("bad compression/filter method")
          if (data(12) != 0) fail("interlaced png unsupported")
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) fail("IDAT before IHDR")
          idat.write(data)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
    }
    if (!sawIhdr) fail("missing IHDR")
    val stride = w * 3
    val expect = (stride + 1) * h
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val scan = new Array[Byte](expect)
    var got = 0
    try {
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(scan, got, expect - got)
        // n==0 with the stream unfinished covers every stall: exhausted
        // input (truncation) AND a zlib header demanding a preset
        // dictionary (FDICT) — without this the FDICT case spins forever.
        if (n == 0 && !inflater.finished()) fail("stalled IDAT stream (truncated or needs preset dictionary)")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"corrupt zlib stream: ${e.getMessage}")
    } finally inflater.end()
    if (got != expect) fail(s"short raster: $got of $expect bytes")
    val rgb = new Array[Byte](w * h * 3)
    val prior = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val ft = scan(y * (stride + 1)) & 0xff
      if (ft > 4) fail(s"bad filter type $ft on row $y")
      var i = 0
      while (i < stride) {
        val x = scan(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val b = prior(i) & 0xff
        val c = if (i >= 3) prior(i - 3) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }
        rgb(y * stride + i) = (recon & 0xff).toByte
        i += 1
      }
      System.arraycopy(rgb, y * stride, prior, 0, stride)
      y += 1
    }
    RgbImage(w, h, rgb)
  }

  /** Decode a payload by sniffing its magic: PNG signature, JPEG SOI
    * (0xFFD8), or PPM "P6". The per-task dispatch point a real
    * multi-codec pipeline has.
    */
  def decodeImage(payload: Array[Byte]): RgbImage = {
    if (payload != null && payload.length >= 8 &&
        payload(0) == PngSig(0) && payload(1) == 'P' && payload(2) == 'N')
      decodePng(payload)
    else if (payload != null && payload.length >= 2 &&
        (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      Jpeg.decodeJpeg(payload)
    else decodePpm(payload)
  }

  /** Perceptual difference-hash (dHash) of every payload: decode with
    * the REAL P6 parser, gray each pixel as the integer mean of its
    * channels, then one bit per horizontally-adjacent pixel pair —
    * bit(r, c) = gray(r, c+1) > gray(r, c) — packed little-endian as
    * h·(w−1) bits of a long. The standard image near-dup fingerprint
    * (dHash; same family as aHash/pHash): brightness shifts and small
    * re-encodes preserve most gradient signs, so near-identical images
    * land within a few bits of Hamming distance. Integer-exact and
    * codec-deterministic, so a SQL oracle replays it from the source
    * floats. Output: (media_id, dhash long, bits int).
    */
  def dHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType),
      StructField("bits", IntegerType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodeImage(r.getAs[Array[Byte]](payloadIdx))
        val nBits = (img.w - 1) * img.h
        require(nBits > 0 && nBits <= 63,
          s"dHash needs 1..63 gradient bits, got $nBits (${img.w}x${img.h})")
        def gray(p: Int): Int = {
          val i = p * 3
          ((img.rgb(i) & 0xff) + (img.rgb(i + 1) & 0xff) +
            (img.rgb(i + 2) & 0xff)) / 3
        }
        var h = 0L
        var row = 0
        while (row < img.h) {
          var c = 0
          while (c < img.w - 1) {
            if (gray(row * img.w + c + 1) > gray(row * img.w + c))
              h |= 1L << (row * (img.w - 1) + c)
            c += 1
          }
          row += 1
        }
        Row(r.getLong(idIdx), h, nBits)
      }
    }(enc)
  }

  /** Fixed-point 8×8 DCT-II basis: DctCoef(u)(x) =
    * round(cos((2x+1)·u·π/16) · 4096). Precomputed LITERALS — the SQL
    * oracle embeds the same 64 integers, so neither engine runs trig at
    * query time and the whole pHash chain stays integer-exact. Max
    * |F(u,v)| ≤ 255·64·4096² ≈ 2.7e11, far inside BIGINT.
    */
  private[graft] val DctCoef: Array[Array[Long]] = Array(
    Array(4096L, 4096L, 4096L, 4096L, 4096L, 4096L, 4096L, 4096L),
    Array(4017L, 3406L, 2276L, 799L, -799L, -2276L, -3406L, -4017L),
    Array(3784L, 1567L, -1567L, -3784L, -3784L, -1567L, 1567L, 3784L),
    Array(3406L, -799L, -4017L, -2276L, 2276L, 4017L, 799L, -3406L),
    Array(2896L, -2896L, -2896L, 2896L, 2896L, -2896L, -2896L, 2896L),
    Array(2276L, -4017L, 799L, 3406L, -3406L, -799L, 4017L, -2276L),
    Array(1567L, -3784L, 3784L, -1567L, -1567L, 3784L, -3784L, 1567L),
    Array(799L, -2276L, 3406L, -4017L, 4017L, -3406L, 2276L, -799L))

  /** Perceptual DCT-hash (pHash) of every 8×8 payload: decode, gray as
    * the integer channel mean, fixed-point 2-D DCT-II
    * (F(u,v) = ΣΣ gray(x,y)·DctCoef(u)(x)·DctCoef(v)(y), exact BIGINT),
    * then one bit per NON-DC coefficient — bit(u,v) = F(u,v) > median of
    * the 63 non-DC values (median = the 32nd smallest, an exact element,
    * never an average) — packed as 63 bits at position u·8+v−1. The
    * robustness rung dHash lacks: dHash compares ADJACENT pixels, so
    * near-tie neighbors flip under ±1 pixel noise, while pHash
    * thresholds LOW-FREQUENCY energy against its own median, which such
    * noise barely moves (ImagePhashDctSpec measures the separation on a
    * planted pair). Same output shape as [[dHash]] — (media_id, dhash,
    * bits) — so [[hammingPairs]] mines either fingerprint unchanged.
    */
  def pHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType),
      StructField("bits", IntegerType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodeImage(r.getAs[Array[Byte]](payloadIdx))
        require(img.w == 8 && img.h == 8,
          s"pHash wants an 8x8 thumbnail, got ${img.w}x${img.h}")
        val gray = new Array[Long](64)
        var p = 0
        while (p < 64) {
          val i = p * 3
          gray(p) = ((img.rgb(i) & 0xff) + (img.rgb(i + 1) & 0xff) +
            (img.rgb(i + 2) & 0xff)) / 3
          p += 1
        }
        // separable 2-D DCT: rowPass(v, x) = Σ_y gray(x, y)·c(v)(y)
        val rowPass = Array.ofDim[Long](8, 8)
        var v = 0
        while (v < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0L; var y2 = 0
            while (y2 < 8) { acc += gray(y2 * 8 + x) * DctCoef(v)(y2); y2 += 1 }
            rowPass(v)(x) = acc
            x += 1
          }
          v += 1
        }
        val f = new Array[Long](63)
        var u = 0; var k = 0
        while (u < 8) {
          var v2 = if (u == 0) 1 else 0
          while (v2 < 8) {
            var acc = 0L; var x2 = 0
            while (x2 < 8) { acc += rowPass(v2)(x2) * DctCoef(u)(x2); x2 += 1 }
            f(k) = acc; k += 1
            v2 += 1
          }
          u += 1
        }
        val sorted = f.clone(); java.util.Arrays.sort(sorted)
        val med = sorted(31)
        var h = 0L; var b = 0
        while (b < 63) { if (f(b) > med) h |= 1L << b; b += 1 }
        Row(r.getLong(idIdx), h, 63)
      }
    }(enc)
  }

  /** EXACT Hamming-ball pair mining over perceptual hashes: every
    * unordered pair with bit_count(ha XOR hb) ≤ maxDist, found without
    * an all-pairs join, via TWO-LEVEL pigeonhole banding.
    *
    * Level 1 (the q71 banding generalized to any bit width): the hash
    * splits into maxDist+1 contiguous bands; a pair within maxDist
    * differs in at most maxDist bands, so it agrees on at least one.
    * Level 2 (the corpus-scale refinement, r14 verdict #3): one band's
    * key space is only bits/(maxDist+1) wide (~11 bits for q165), so at
    * N documents every bucket holds ~N/2^11 items and candidate
    * generation degenerates to Σ C(n_k,2) ≈ N²/2^12 per band —
    * quadratic blowup measured as THE cost at rung scale. But a pair
    * that agrees on band i still has ≤ maxDist differing bits in the
    * REMAINING bits, so those split into maxDist+1 sub-bands pigeonhole
    * again: the pair collides on some (band, sub-band) composite key of
    * ~2× the width, dividing expected bucket occupancy — and therefore
    * candidates — by 2^subWidth (~512× for q165) at the price of a
    * (maxDist+1)² explode instead of (maxDist+1). Still sound (exact
    * bit_count filter keeps no false positives) and complete (both
    * pigeonholes are over disjoint bit sets of the same hash).
    * Candidate generation is a composite-keyed equi-join — the corpus
    * shuffles on (band, bk, sk) — and the bit_count gate runs map-side
    * BEFORE the pair distinct, so the dedup shuffle carries survivors
    * only. Output: (media_a, media_b, hamming), media_a < media_b.
    */
  def hammingPairs(hashes: DataFrame, bits: Int, maxDist: Int): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be 1..63, got $bits")
    require(maxDist >= 0 && maxDist < bits,
      s"maxDist must be 0..${bits - 1}, got $maxDist")
    val bands = maxDist + 1
    val bounds = (0 to bands).map(i => i * bits / bands)
    def mask(w: Int): Long = if (w <= 0) 0L else (1L << w) - 1
    val bandCols = for {
      i <- 0 until bands
      j <- 0 until bands
    } yield {
      val off = bounds(i)
      val width = bounds(i + 1) - off
      // the hash with band i excised: low bits below the band OR'd with
      // the high bits shifted down into its place (rem = bits - width)
      val rem = bits - width
      val remCol = shiftleft(shiftright(col("dhash"), off + width), off)
        .bitwiseOR(col("dhash").bitwiseAND(lit(mask(off))))
      val sb0 = j * rem / bands
      val sw = (j + 1) * rem / bands - sb0
      struct(lit(i * bands + j).as("band"),
        shiftright(col("dhash"), off).bitwiseAND(lit(mask(width))).as("bk"),
        shiftright(remCol, sb0).bitwiseAND(lit(mask(sw))).as("sk"))
    }
    val chunks = hashes.select(col("media_id"), col("dhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("media_id"), col("dhash"),
        col("bb.band").as("band"), col("bb.bk").as("bk"), col("bb.sk").as("sk"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.sk") === col("y.sk") && col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Feature-extract every payload via mapPartitions (codec state would be
    * initialized once per partition here).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition init point (decoder/codec handles would live here)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = decodeStub(payload)
        Row(r.getLong(idIdx),
            if (payload == null) 0L else payload.length.toLong,
            feats.toSeq)
      }
    }(enc)
  }
}

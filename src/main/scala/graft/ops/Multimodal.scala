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
  *  - `decodeImages` is a REAL codec: binary PPM (P6) parse + pixel-grid
  *    nearest-neighbor resize, no external libraries (q96 oracle-checks
  *    the full encode→decode→feature chain).
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

  /** Decode every payload with the REAL P6 parser, then emit image-level
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
        val img = decodePpm(payload)
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
        val img = decodePpm(r.getAs[Array[Byte]](payloadIdx))
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

  /** EXACT Hamming-ball pair mining over perceptual hashes: every
    * unordered pair with bit_count(ha XOR hb) ≤ maxDist, found without
    * an all-pairs join. The q71 pigeonhole banding generalized to any
    * bit width: the hash splits into maxDist+1 contiguous bands, and a
    * pair within maxDist differs in at most maxDist bands, so it
    * COLLIDES in at least one — candidate generation is a band-keyed
    * equi-join (corpus shuffles on (band, bits), hot bands collapse
    * map-side like any skewed group key), and the exact bit_count
    * filter keeps no false positives. Output: (media_a, media_b,
    * hamming), media_a < media_b.
    */
  def hammingPairs(hashes: DataFrame, bits: Int, maxDist: Int): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be 1..63, got $bits")
    require(maxDist >= 0 && maxDist < bits,
      s"maxDist must be 0..${bits - 1}, got $maxDist")
    val bands = maxDist + 1
    val bounds = (0 to bands).map(i => i * bits / bands)
    val bandCols = (0 until bands).map { i =>
      val off = bounds(i)
      val width = bounds(i + 1) - off
      struct(lit(i).as("band"),
        shiftright(col("dhash"), off).bitwiseAND(lit((1L << width) - 1))
          .as("bk"))
    }
    val chunks = hashes.select(col("media_id"), col("dhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("media_id"), col("dhash"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash")))
          .cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
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

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._

/** Minimal spec-compliant AVI (RIFF 'AVI ') MJPEG container — the video
  * tier of E5, composing the RIFF chunk walk (the WAV pattern) with the
  * baseline JPEG codec: a real demux → per-frame decode chain where
  * q82's byte-stub frame sampler stood. Public-spec layout only
  * (Microsoft RIFF/AVI: LIST hdrl {avih, LIST strl {strh 'vids'/'MJPG',
  * strf BITMAPINFOHEADER}}, LIST movi with '00dc' frame chunks). Same
  * loud-IllegalArgumentException quarantine contract as the other
  * codecs; unknown chunks skip by declared size, word-aligned.
  */
object Video {

  /** Demuxed clip: dimensions, fps, and the raw per-frame codec
    * payloads (JPEG bytes for MJPG) in stream order.
    */
  final case class MjpegClip(w: Int, h: Int, fps: Int,
                             frames: Vector[Array[Byte]])

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    fourcc(tag) ++ le32(data.length) ++ data ++ pad
  }
  private def list(tag: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(tag) ++ data)

  /** Encode JPEG frame payloads as a canonical single-stream MJPG AVI. */
  def encodeAvi(w: Int, h: Int, fps: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(fps > 0, s"bad fps $fps")
    require(frames.nonEmpty, "empty frame list")
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      fourcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Demux an AVI payload: magic checks, hdrl validation, and the movi
    * frame walk. Real-world files interleave a video stream with audio
    * (and text) streams, so the demux takes the FIRST 'vids' stream —
    * which must be MJPG, or the payload is quarantined — and SKIPS any
    * other stream (auds/txts/mids and further vids): their movi chunks
    * ('01wb', '01dc', ...) are passed over by stream number. Frame
    * chunks are collected only while walking INSIDE the movi LIST
    * (a stray top-level '##dc' is container garbage, not a frame), in
    * stream order per the spec. Throws IllegalArgumentException on
    * anything malformed.
    */
  def demuxAvi(payload: Array[Byte]): MjpegClip = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (payload == null || payload.length < 12) fail("not an avi (too short)")
    def tag(at: Int): String =
      new String(payload, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(at: Int): Long =
      (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
        ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF") fail("not an avi (bad RIFF magic)")
    if (tag(8) != "AVI ") fail("not an avi (bad AVI magic)")
    var w = -1; var h = -1; var fps = -1
    var streamIdx = 0 // strh order defines AVI stream numbering
    var vidsStream = -1 // first 'vids' stream; the one we demux
    val frames = Vector.newBuilder[Array[Byte]]
    var sawMovi = false

    // walk chunks in [from, to); recurse into hdrl/strl/movi LISTs
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val ct = tag(pos)
        val len = u32(pos + 4)
        if (len < 0 || pos + 8L + len > to) fail(s"truncated $ct chunk")
        ct match {
          case "LIST" =>
            if (len < 4) fail("LIST too short")
            val lt = tag(pos + 8)
            if (lt == "hdrl" || lt == "strl" || lt == "movi" || lt == "rec ") {
              if (lt == "movi") sawMovi = true
              walk(pos + 12, pos + 8 + len.toInt,
                inMovi || lt == "movi" || lt == "rec ")
            }
          case "avih" =>
            if (len < 56) fail(s"avih too short ($len)")
            fps = {
              val usPerFrame = u32(pos + 8)
              if (usPerFrame <= 0) fail("bad avih frame rate")
              (1000000L / usPerFrame).toInt
            }
            w = u32(pos + 8 + 32).toInt; h = u32(pos + 8 + 36).toInt
            if (w <= 0 || h <= 0) fail(s"bad avih dimensions ${w}x$h")
          case "strh" =>
            if (len < 8) fail(s"strh too short ($len)")
            if (tag(pos + 8) == "vids" && vidsStream < 0) {
              // the stream we will decode MUST be motion-JPEG; other
              // streams are skipped wholesale, never decoded
              if (tag(pos + 12) != "MJPG")
                fail("unsupported codec handler (want MJPG)")
              vidsStream = streamIdx
            }
            streamIdx += 1
          case _ =>
            // movi-scoped '##dc' chunks of the chosen vids stream are
            // frames; everything else (strf/idx1/JUNK, other streams'
            // '##wb'/'##dc', any stray top-level '##dc') skips by size
            if (inMovi && vidsStream >= 0 && ct.length == 4 &&
                ct(2) == 'd' && ct(3) == 'c' &&
                ct(0).isDigit && ct(1).isDigit &&
                (ct(0) - '0') * 10 + (ct(1) - '0') == vidsStream)
              frames += java.util.Arrays
                .copyOfRange(payload, pos + 8, pos + 8 + len.toInt)
        }
        pos += 8 + len.toInt + (len.toInt & 1)
      }
    }
    walk(12, payload.length, inMovi = false)
    if (w < 0) fail("missing avih header")
    if (vidsStream < 0) fail("missing vids/MJPG stream header")
    if (!sawMovi) fail("missing movi list")
    val fs = frames.result()
    if (fs.isEmpty) fail("movi holds no frames")
    MjpegClip(w, h, fps, fs)
  }

  /** Demux every payload and decode every frame with the REAL JPEG
    * decoder, emitting one row per frame with exact integer features
    * (gray render ⇒ one channel sum suffices). The container walk and
    * per-frame codec both initialize per task, the real demux shape.
    */
  def decodeFrames(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("w", LongType),
      StructField("h", LongType),
      StructField("gsum", LongType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val clip = demuxAvi(r.getAs[Array[Byte]](payloadIdx))
        val id = r.getLong(idIdx)
        clip.frames.zipWithIndex.map { case (f, i) =>
          val img = Jpeg.decodeJpeg(f)
          var s = 0L; var p = 0
          while (p < img.w * img.h) { s += img.rgb(p * 3) & 0xff; p += 1 }
          Row(id, i.toLong, img.w.toLong, img.h.toLong, s)
        }
      }
    }(enc)
  }
}

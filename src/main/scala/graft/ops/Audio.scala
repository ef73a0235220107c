package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._

/** Pure-JVM RIFF/WAVE PCM audio codec (the public RIFF container +
  * Microsoft WAVEFORMAT spec) — upgrades E5's audio path from the byte
  * stub to a genuine parser the way PPM/PNG/JPEG did images. Zero
  * dependencies; PCM is lossless, so the full encode→decode→feature
  * chain is integer-exact and a SQL oracle replays it from the
  * synthesized source (q169).
  *
  * Scope: 16-bit signed little-endian PCM (format tag 1), any sample
  * rate, 1..8 channels; chunk walk skips unknown chunks (LIST, fact,
  * cue) by their declared size like a spec-compliant reader must.
  * Anything else — bad magics, truncated chunks, non-PCM formats,
  * other bit depths — throws a descriptive IllegalArgumentException:
  * the same quarantine contract as the image codecs.
  */
object Audio {

  /** Decoded PCM clip: rate, channel count, interleaved samples. */
  final case class PcmClip(sampleRate: Int, channels: Int,
                           samples: Array[Short])

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** Encode interleaved 16-bit PCM as a canonical RIFF/WAVE payload. */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channel count $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataBytes = samples.length * 2
    val blockAlign = channels * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataBytes)
    out.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le32(36 + dataBytes))
    out.write("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * blockAlign)) // byte rate
    out.write(le16(blockAlign))
    out.write(le16(16)) // bits per sample
    out.write("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le32(dataBytes))
    samples.foreach { s =>
      out.write(s & 0xff); out.write((s >> 8) & 0xff)
    }
    out.toByteArray
  }

  /** Parse a RIFF/WAVE payload: magic checks, chunk walk (unknown
    * chunks skipped by declared size, word-aligned per the RIFF spec),
    * fmt validation, and the PCM data. Throws IllegalArgumentException
    * on anything malformed.
    */
  def decodeWav(payload: Array[Byte]): PcmClip = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (payload == null || payload.length < 12) fail("not a wav (too short)")
    def tag(at: Int): String =
      new String(payload, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(at: Int): Int =
      (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8)
    def u32(at: Int): Long =
      (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
        ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF") fail("not a wav (bad RIFF magic)")
    if (tag(8) != "WAVE") fail("not a wav (bad WAVE magic)")
    var pos = 12
    var rate = -1; var channels = -1
    var data: Array[Short] = null
    while (pos + 8 <= payload.length && (rate < 0 || data == null)) {
      val ct = tag(pos)
      val len = u32(pos + 4)
      // Long bound math — a hostile 32-bit length must hit the
      // truncation contract, not overflow into an IOOBE
      if (len < 0 || pos + 8L + len > payload.length)
        fail(s"truncated $ct chunk")
      ct match {
        case "fmt " =>
          if (len < 16) fail(s"fmt chunk too short ($len)")
          val fmtTag = u16(pos + 8)
          if (fmtTag != 1) fail(s"unsupported format tag $fmtTag (want PCM)")
          channels = u16(pos + 10)
          if (channels < 1 || channels > 8) fail(s"bad channel count $channels")
          rate = u32(pos + 12).toInt
          if (rate <= 0) fail(s"bad sample rate $rate")
          val bits = u16(pos + 22)
          if (bits != 16) fail(s"unsupported bit depth $bits (want 16)")
        case "data" =>
          if (rate < 0) fail("data chunk before fmt")
          if (len % 2 != 0) fail("odd data chunk length for 16-bit PCM")
          val n = (len / 2).toInt
          if (n % channels != 0) fail("data not a whole number of frames")
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = ((payload(pos + 8 + 2 * i) & 0xff) |
              (payload(pos + 9 + 2 * i) << 8)).toShort
            i += 1
          }
          data = s
        case _ => () // LIST/fact/cue/...: skip by declared size
      }
      pos += 8 + len.toInt + (len.toInt & 1) // RIFF chunks word-align
    }
    if (rate < 0) fail("missing fmt chunk")
    if (data == null) fail("missing data chunk")
    PcmClip(rate, channels, data)
  }

  /** Decode every payload with the REAL wav parser and emit exact
    * integer clip features: frame count, rate, channels, sample sum,
    * max |amplitude|, and strict zero crossings (s_i * s_{i+1} < 0 on
    * the interleaved stream) — all replayable by the oracle from the
    * synthesized source samples. Runs per-partition like the image
    * decode (per-task codec init point).
    */
  def decodeClips(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", LongType),
      StructField("sample_rate", LongType),
      StructField("channels", LongType),
      StructField("sum_samples", LongType),
      StructField("max_abs", LongType),
      StructField("zero_crossings", LongType)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val clip = decodeWav(r.getAs[Array[Byte]](payloadIdx))
        var sum = 0L; var maxAbs = 0L; var zc = 0L
        var i = 0
        while (i < clip.samples.length) {
          val s = clip.samples(i).toLong
          sum += s
          val a = math.abs(s)
          if (a > maxAbs) maxAbs = a
          if (i > 0 && clip.samples(i - 1).toLong * s < 0) zc += 1
          i += 1
        }
        Row(r.getLong(idIdx),
          (clip.samples.length / clip.channels).toLong,
          clip.sampleRate.toLong, clip.channels.toLong, sum, maxAbs, zc)
      }
    }(enc)
  }
}

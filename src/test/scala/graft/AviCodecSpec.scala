package graft

import graft.ops.{Jpeg, Video}

/** AVI/MJPEG container (q171, SURVEY §2.11 E5 video tier): demux
  * round-trips, per-frame payload fidelity, unknown-chunk skipping,
  * and the malformed-payload quarantine contract.
  */
class AviCodecSpec extends SparkSpec {

  private def grayJpeg(seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    val rgb = new Array[Byte](8 * 8 * 3)
    var p = 0
    while (p < 64) {
      val v = rng.nextInt(256).toByte
      rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
      p += 1
    }
    Jpeg.encodeJpeg(8, 8, rgb, "444")
  }

  test("demux returns the exact frame payloads in stream order") {
    val frames = (1 to 5).map(grayJpeg)
    val clip = Video.demuxAvi(Video.encodeAvi(8, 8, 25, frames))
    assert(clip.w == 8 && clip.h == 8 && clip.fps == 25)
    assert(clip.frames.length == 5)
    clip.frames.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
      assert(java.util.Arrays.equals(got, want), s"frame $i bytes differ")
    }
    // and every demuxed frame still decodes with the real JPEG decoder
    clip.frames.foreach(f => assert(Jpeg.decodeJpeg(f).w == 8))
  }

  test("odd-length frames word-align; unknown chunks (JUNK/idx1) skip") {
    // a frame of odd byte length forces the RIFF pad byte between chunks
    val odd = grayJpeg(3)
    val oddFrame =
      if (odd.length % 2 == 0) odd ++ Array[Byte](0xff.toByte, 0xd9.toByte)
      else odd
    // (JPEG ends in FFD9; appending another EOI keeps it decodable-prefix
    //  irrelevant — demux fidelity is byte-level, decode not needed here)
    val clip = Video.demuxAvi(Video.encodeAvi(8, 8, 10,
      Seq(oddFrame, grayJpeg(4))))
    assert(clip.frames.length == 2)
    assert(java.util.Arrays.equals(clip.frames(0), oddFrame))
    // splice a JUNK chunk between hdrl and movi: skipped by size
    val good = Video.encodeAvi(8, 8, 10, Seq(grayJpeg(5)))
    val moviAt = (12 until good.length - 12).find(i =>
      new String(good, i, 4) == "LIST" &&
        new String(good, i + 8, 4) == "movi").get
    val junk = "JUNK".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "zzzz".getBytes
    val spliced = good.take(moviAt) ++ junk ++ good.drop(moviAt)
    assert(Video.demuxAvi(spliced).frames.length == 1)
  }

  test("malformed payloads fail loudly, never demux garbage") {
    val good = Video.encodeAvi(8, 8, 25, Seq(grayJpeg(1), grayJpeg(2)))
    def boom(payload: Array[Byte], clue: String): Unit = {
      val e = intercept[IllegalArgumentException](Video.demuxAvi(payload))
      assert(e.getMessage.toLowerCase.contains(clue),
        s"wanted '$clue' in: ${e.getMessage}")
    }
    boom("definitely not a video container".getBytes, "riff")
    boom(good.take(8) ++ "WAVE".getBytes ++ good.drop(12), "avi magic")
    boom(good.take(good.length - 7), "truncated")
    // patch the stream handler to a non-MJPG codec
    val h264 = good.clone()
    val strhAt = (12 until h264.length - 16).find(i =>
      new String(h264, i, 4) == "strh").get
    System.arraycopy("H264".getBytes, 0, h264, strhAt + 12, 4)
    boom(h264, "handler")
    // cut the movi list entirely
    val moviAt = (12 until good.length - 12).find(i =>
      new String(good, i, 4) == "LIST" &&
        new String(good, i + 8, 4) == "movi").get
    boom(good.take(moviAt), "movi")
  }

  // hand-rolled RIFF helpers for containers encodeAvi never produces
  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def cc(s: String) = s.getBytes("US-ASCII")
  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    cc(tag) ++ le32(data.length) ++ data ++ pad
  }
  private def list(tag: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(tag) ++ data)

  test("mixed-stream AVI: audio stream skipped, vids frames demux by stream number") {
    // stream 0 = auds (PCM), stream 1 = vids/MJPG — the first real-world
    // shape a user feeds the demux. Frames live in '01dc'; '00wb' audio
    // chunks interleave and must be passed over, not fail and not demux.
    val f1 = grayJpeg(11); val f2 = grayJpeg(12)
    val avih = le32(1000000 / 25) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(2) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(8) ++ le32(8) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strhAud = cc("auds") ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(8000) ++ le32(0) ++
      le32(16000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(0) ++ le16(0)
    val strfAud = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16)
    val strhVid = cc("vids") ++ cc("MJPG") ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(2) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(8) ++ le16(8)
    val strfVid = le32(40) ++ le32(8) ++ le32(8) ++ le16(1) ++ le16(24) ++
      cc("MJPG") ++ le32(8 * 8 * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strhAud) ++ chunk("strf", strfAud)) ++
      list("strl", chunk("strh", strhVid) ++ chunk("strf", strfVid)))
    val movi = list("movi",
      chunk("00wb", Array.fill[Byte](32)(7)) ++ chunk("01dc", f1) ++
        chunk("00wb", Array.fill[Byte](32)(9)) ++ chunk("01dc", f2))
    val body = cc("AVI ") ++ hdrl ++ movi
    val clip = Video.demuxAvi(cc("RIFF") ++ le32(body.length) ++ body)
    assert(clip.w == 8 && clip.h == 8 && clip.frames.length == 2)
    assert(java.util.Arrays.equals(clip.frames(0), f1))
    assert(java.util.Arrays.equals(clip.frames(1), f2))
    // vids is stream 1 here, so a '00dc' chunk (the AUDIO stream's
    // number with a video suffix) inside movi must NOT be collected
    val movi2 = list("movi", chunk("00dc", f1) ++ chunk("01dc", f2))
    val body2 = cc("AVI ") ++ hdrl ++ movi2
    val clip2 = Video.demuxAvi(cc("RIFF") ++ le32(body2.length) ++ body2)
    assert(clip2.frames.length == 1)
    assert(java.util.Arrays.equals(clip2.frames(0), f2))
  }

  test("stray top-level '00dc' outside movi is container garbage, not a frame") {
    val good = Video.encodeAvi(8, 8, 25, Seq(grayJpeg(21)))
    // append a top-level 00dc AFTER the movi list (inside RIFF bounds)
    val stray = chunk("00dc", grayJpeg(22))
    val riffLen = good.length - 8 + stray.length
    val patched = cc("RIFF") ++ le32(riffLen) ++ good.drop(8) ++ stray
    val clip = Video.demuxAvi(patched)
    assert(clip.frames.length == 1, "stray top-level frame chunk was collected")
    assert(java.util.Arrays.equals(clip.frames(0),
      Video.demuxAvi(good).frames(0)))
  }

  test("q171 oracle twin: demuxed+decoded frame features match the replay from text") {
    val out = queries.Registry.byName("q171_video_mjpeg_frames")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    // two frames per doc, 8x8 each
    assert(out.length % 2 == 0)
    assert(out.forall(r => r.getLong(2) == 8L && r.getLong(3) == 8L))
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length == 2))
  }
}

package graft

import graft.ops.Audio

/** RIFF/WAVE PCM codec (q169, SURVEY §2.11 E5 audio tier): lossless
  * round-trips incl. stereo interleave and unknown-chunk skipping, and
  * the malformed-payload quarantine contract.
  */
class WavCodecSpec extends SparkSpec {

  private def tone(n: Int, seed: Int): Array[Short] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(65536) - 32768).toShort)
  }

  test("PCM round-trip is bit-exact, mono and stereo") {
    for ((ch, n) <- Seq((1, 64), (2, 128), (4, 64))) {
      val s = tone(n, ch * 7)
      val clip = Audio.decodeWav(Audio.encodeWav(8000, ch, s))
      assert(clip.sampleRate == 8000 && clip.channels == ch)
      assert(clip.samples.toSeq == s.toSeq, s"$ch-channel PCM corrupted")
    }
    // extremes survive the little-endian pack/unpack
    val edge = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1)
    assert(Audio.decodeWav(Audio.encodeWav(44100, 1, edge)).samples.toSeq
      == edge.toSeq)
  }

  test("unknown chunks are skipped by declared size (word-aligned)") {
    val s = tone(32, 3)
    val good = Audio.encodeWav(8000, 1, s)
    // splice a LIST chunk with an ODD length between WAVE and fmt —
    // the walker must skip len + pad byte per the RIFF spec
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'x', 'y', 'z', 'z', 'y', 0 /* pad */)
    val spliced = good.take(12) ++ junk ++ good.drop(12)
    // fix the RIFF size field (not validated strictly, but keep honest)
    val clip = Audio.decodeWav(spliced)
    assert(clip.samples.toSeq == s.toSeq)
  }

  test("malformed payloads fail loudly, never decode garbage") {
    val good = Audio.encodeWav(8000, 1, tone(32, 9))
    def boom(payload: Array[Byte], clue: String): Unit = {
      val e = intercept[IllegalArgumentException](Audio.decodeWav(payload))
      assert(e.getMessage.toLowerCase.contains(clue),
        s"wanted '$clue' in: ${e.getMessage}")
    }
    boom("not audio at all".getBytes, "riff")
    boom(good.take(8) ++ "OGGS".getBytes ++ good.drop(12), "wave")
    // truncated mid-data
    boom(good.take(good.length - 10), "truncated")
    // non-PCM format tag (patch fmt tag bytes at offset 20)
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float
    boom(nonPcm, "format tag")
    // 8-bit depth (patch bits at offset 34)
    val bad8 = good.clone(); bad8(34) = 8
    boom(bad8, "bit depth")
    // fmt missing entirely (cut the fmt chunk: bytes 12..35)
    boom(good.take(12) ++ good.drop(36), "before fmt")
  }

  test("q169 oracle twin: decoded clip features match the grid replayed from text") {
    val out = queries.Registry.byName("q169_audio_wav_roundtrip")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) == 64L && r.getLong(2) == 8000L &&
      r.getLong(3) == 1L))
    // samples are (g-128)*256 for g in 0..255: bounded amplitudes
    assert(out.forall(r => r.getLong(5) <= 32768L))
  }
}

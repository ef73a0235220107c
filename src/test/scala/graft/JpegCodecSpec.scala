package graft

import graft.ops.{Jpeg, Multimodal}

/** Pure-JVM baseline JPEG codec (q168, SURVEY §2.11 E5): gray / 4:4:4 /
  * 4:2:0 round-trips, exact closed-form expectations on constant
  * blocks, the cross-mode consistency identities the fixed-point
  * design guarantees, and the malformed-payload quarantine contract.
  */
class JpegCodecSpec extends SparkSpec {

  private def grayImage(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    val out = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val v = rng.nextInt(256).toByte
      out(p * 3) = v; out(p * 3 + 1) = v; out(p * 3 + 2) = v
      p += 1
    }
    out
  }

  /** Closed-form decode of a CONSTANT 8x8 block through the quant chain
    * — independent scalar replay of the fixed-point spec (only the DC
    * coefficient survives on a flat block, so the whole 2-D transform
    * collapses to one multiply each way).
    */
  private def constantRoundTrip(v: Int, qdc: Int): Int = {
    def roundDiv(n: Long, d: Long): Long = {
      val q = (2L * math.abs(n) + d) / (2L * d)
      if (n < 0) -q else q
    }
    val s = 23168L * 23168L * (v - 128L) // sum of basis row 0 = 8*2896
    val level = roundDiv(s, (1L << 26) * qdc)
    val r = level * qdc * 2896L * 2896L
    math.max(0L, math.min(255L, roundDiv(r, 1L << 26) + 128L)).toInt
  }

  test("encode is deterministic; gray and 4:4:4 decode identically on gray input") {
    val rgb = grayImage(8, 8, 42)
    assert(java.util.Arrays.equals(
      Jpeg.encodeJpeg(8, 8, rgb, "444"), Jpeg.encodeJpeg(8, 8, rgb, "444")))
    // gray input => chroma exactly 128 through the integer transform, so
    // the 3-component 4:4:4 decode must equal the 1-component gray decode
    val g1 = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, "gray"))
    val g3 = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, "444"))
    assert(g1.w == 8 && g1.h == 8 && g3.w == 8 && g3.h == 8)
    assert(java.util.Arrays.equals(g1.rgb, g3.rgb),
      "4:4:4 color path diverged from the pure luma path on gray input")
    // and every decoded pixel stays gray (r = g = b)
    assert(g3.rgb.grouped(3).forall(p => p(0) == p(1) && p(1) == p(2)))
  }

  test("4:2:0 on an 8x8 gray image equals 4:4:4 (luma block 0 is the image)") {
    val rgb = grayImage(8, 8, 7)
    val d444 = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, "444"))
    val d420 = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, "420"))
    assert(d420.w == 8 && d420.h == 8)
    assert(java.util.Arrays.equals(d444.rgb, d420.rgb),
      "4:2:0 MCU assembly / chroma upsampling diverged on the exact-chroma case")
  }

  test("constant images round-trip to the closed-form expectation (all modes)") {
    for (v <- Seq(0, 64, 127, 128, 200, 255); mode <- Seq("gray", "444", "420")) {
      val rgb = Array.fill(8 * 8 * 3)(v.toByte)
      val dec = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, mode))
      val want = constantRoundTrip(v, 16) // QLum DC = 16
      assert(dec.rgb.forall(b => (b & 0xff) == want),
        s"constant $v via $mode: wanted $want, got ${dec.rgb(0) & 0xff}")
      assert(math.abs(want - v) <= 1, s"flat-block loss should be <=1, got $want vs $v")
    }
  }

  test("non-multiple-of-8 dims: edge padding + crop are exact on flat input") {
    for ((w, h) <- Seq((5, 3), (9, 6), (17, 11)); mode <- Seq("444", "420")) {
      val rgb = Array.fill(w * h * 3)(90.toByte)
      val dec = Jpeg.decodeJpeg(Jpeg.encodeJpeg(w, h, rgb, mode))
      assert(dec.w == w && dec.h == h, s"${w}x$h via $mode dims")
      val want = constantRoundTrip(90, 16)
      assert(dec.rgb.forall(b => (b & 0xff) == want), s"${w}x$h via $mode pixels")
    }
  }

  test("a saturated-color image round-trips within JPEG-loss tolerance") {
    // constant pure-ish color: every block flat, so loss is quant-of-DC
    // + color-transform rounding only; bound it tightly
    val rgb = new Array[Byte](8 * 8 * 3)
    var p = 0
    while (p < 64) {
      rgb(p * 3) = 200.toByte; rgb(p * 3 + 1) = 80.toByte; rgb(p * 3 + 2) = 40.toByte
      p += 1
    }
    val dec = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, "444"))
    dec.rgb.grouped(3).foreach { px =>
      assert(math.abs((px(0) & 0xff) - 200) <= 6 &&
        math.abs((px(1) & 0xff) - 80) <= 6 && math.abs((px(2) & 0xff) - 40) <= 6,
        s"color drifted: ${px.map(_ & 0xff).mkString(",")}")
    }
    // 4:2:0 of a constant color is the same chroma everywhere
    val dec420 = Jpeg.decodeJpeg(Jpeg.encodeJpeg(8, 8, rgb, "420"))
    assert(java.util.Arrays.equals(dec.rgb, dec420.rgb))
  }

  test("decodeImage sniffs JPEG next to PNG and PPM") {
    val rgb = grayImage(8, 8, 3)
    val viaJpeg = Multimodal.decodeImage(Jpeg.encodeJpeg(8, 8, rgb, "444"))
    assert(viaJpeg.w == 8 && viaJpeg.h == 8)
    // lossless formats still round-trip exactly through the same sniff
    assert(java.util.Arrays.equals(
      Multimodal.decodeImage(Multimodal.encodePng(8, 8, rgb)).rgb, rgb))
  }

  test("malformed payloads fail loudly, never decode garbage") {
    val good = Jpeg.encodeJpeg(8, 8, grayImage(8, 8, 9), "444")
    def boom(payload: Array[Byte], clue: String): Unit = {
      val e = intercept[IllegalArgumentException](Jpeg.decodeJpeg(payload))
      assert(e.getMessage.toLowerCase.contains(clue),
        s"wanted '$clue' in: ${e.getMessage}")
    }
    // bad SOI
    boom("definitely not a jpeg".getBytes, "soi")
    // truncated mid-entropy-stream
    boom(java.util.Arrays.copyOfRange(good, 0, good.length - 6), "truncated")
    // progressive SOF: patch the 0xFFC0 marker to 0xFFC2 (no CRC in JPEG,
    // so byte surgery is enough)
    def patch(find: Int, to: Byte): Array[Byte] = {
      val p = good.clone()
      val i = p.indices.drop(2).find(i =>
        (p(i - 1) & 0xff) == 0xff && (p(i) & 0xff) == find).get
      p(i) = to
      p
    }
    boom(patch(0xc0, 0xc2.toByte), "progressive")
    // restart-interval marker where SOF belongs
    boom(patch(0xc0, 0xdd.toByte), "restart")
    // unsupported sampling factor: 0xFFC0 payload byte 9 is comp-1 H<<4|V
    val badSamp = good.clone()
    val sofAt = badSamp.indices.drop(2).find(i =>
      (badSamp(i - 1) & 0xff) == 0xff && (badSamp(i) & 0xff) == 0xc0).get
    badSamp(sofAt + 10) = 0x33 // H=V=3
    boom(badSamp, "sampling")
    // missing EOI
    boom(java.util.Arrays.copyOfRange(good, 0, good.length - 2), "eoi")
    // over-subscribed DHT (round-15 ADVICE): 3 codes of length 1 breaks
    // the canonical-code invariant; must quarantine, not index out of
    // vals(). The fixed encoder's first DHT row is DC: bits[0..15] then
    // 12 symbol values — patch bits[0] (one byte after the table id).
    val dhtAt = good.indices.drop(2).find(i =>
      (good(i - 1) & 0xff) == 0xff && (good(i) & 0xff) == 0xc4).get
    val overSub = good.clone()
    overSub(dhtAt + 4) = 3 // bits[0] = 3 one-bit codes > 2^1
    boom(overSub, "over-subscribed")
    // implausible SOF dimensions (round-15 ADVICE): a tiny payload
    // declaring 65535x65535 must quarantine BEFORE allocating planes
    val hugeDims = good.clone()
    val sof = hugeDims.indices.drop(2).find(i =>
      (hugeDims(i - 1) & 0xff) == 0xff && (hugeDims(i) & 0xff) == 0xc0).get
    hugeDims(sof + 4) = 0xff.toByte; hugeDims(sof + 5) = 0xff.toByte // h
    hugeDims(sof + 6) = 0xff.toByte; hugeDims(sof + 7) = 0xff.toByte // w
    boom(hugeDims, "implausible")
  }

  test("multi-MCU scan: cross-block DC prediction survives the round-trip (q174)") {
    // 24x16 = 6 MCUs at 4:4:4; per-block constant values chosen so the
    // DC diffs swing sign and magnitude across the prediction chain.
    // A constant block quantizes exactly (only the DC coefficient is
    // nonzero, and Q(0,0)=16 divides the fixed-point DC evenly enough
    // that the closed-form round-trip is block-value-preserving for
    // multiples of 2): decoded == encoded input per block.
    val vals = Array(0, 254, 16, 240, 128, 64) // one per block, raster order
    val rgb = new Array[Byte](24 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 24) {
      val b = (y / 8) * 3 + (x / 8)
      val v = vals(b).toByte
      val o = (y * 24 + x) * 3
      rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
    }
    val img = Jpeg.decodeJpeg(Jpeg.encodeJpeg(24, 16, rgb, "444"))
    assert(img.w == 24 && img.h == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val b = (y / 8) * 3 + (x / 8)
      val got = img.rgb((y * 24 + x) * 3) & 0xff
      assert(math.abs(got - vals(b)) <= 1,
        s"block $b at ($x,$y): $got != ${vals(b)}")
    }
    // the gated registry row: 500 docs, 24x16 each, grays agree
    val out = queries.Registry.byName("q174_image_jpeg_multiblock")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) == 24L && r.getLong(2) == 16L))
    assert(out.forall(r => r.getLong(3) == r.getLong(4) &&
      r.getLong(4) == r.getLong(5)))
  }

  test("q168 oracle twin: decoded JPEG features match the quant chain replayed from text") {
    val out = queries.Registry.byName("q168_image_jpeg_roundtrip")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) == 8L && r.getLong(2) == 8L))
    // gray render + exact-chroma color path => channel sums identical
    assert(out.forall(r => r.getLong(3) == r.getLong(4) && r.getLong(4) == r.getLong(5)))
  }
}

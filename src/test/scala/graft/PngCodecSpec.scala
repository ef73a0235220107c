package graft

import graft.ops.Multimodal

/** Pure-JVM PNG codec (q166, SURVEY §2.11 E5): encode/decode round-trip
  * across all five scanline filters, format sniffing, and the
  * malformed-payload quarantine contract (same as decodePpm's).
  */
class PngCodecSpec extends SparkSpec {

  private def raster(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(w * h * 3)(rng.nextInt(256).toByte)
  }

  test("round-trip is exact under every single filter type and the cycling mix") {
    val rgb = raster(8, 8, 11)
    for (ft <- 0 to 4) {
      val img = Multimodal.decodePng(Multimodal.encodePng(8, 8, rgb, _ => ft))
      assert(img.w == 8 && img.h == 8)
      assert(java.util.Arrays.equals(img.rgb, rgb), s"filter $ft corrupted pixels")
    }
    val mixed = Multimodal.decodePng(Multimodal.encodePng(8, 8, rgb, r => r % 5))
    assert(java.util.Arrays.equals(mixed.rgb, rgb), "cycling filters corrupted pixels")
  }

  test("round-trip is exact on non-square dimensions (stride math)") {
    for ((w, h) <- Seq((5, 3), (1, 7), (16, 2))) {
      val rgb = raster(w, h, w * 31 + h)
      val img = Multimodal.decodePng(Multimodal.encodePng(w, h, rgb, r => (r + 2) % 5))
      assert(img.w == w && img.h == h)
      assert(java.util.Arrays.equals(img.rgb, rgb), s"${w}x$h corrupted")
    }
  }

  test("decodeImage sniffs PNG vs PPM and decodes both to the same pixels") {
    val rgb = raster(8, 8, 5)
    val viaPng = Multimodal.decodeImage(Multimodal.encodePng(8, 8, rgb))
    val viaPpm = Multimodal.decodeImage(Multimodal.encodePpm(8, 8, rgb))
    assert(java.util.Arrays.equals(viaPng.rgb, viaPpm.rgb))
    assert(viaPng.w == 8 && viaPpm.w == 8)
  }

  test("malformed payloads fail loudly, never decode garbage") {
    val good = Multimodal.encodePng(8, 8, raster(8, 8, 3), r => r % 5)
    def boom(payload: Array[Byte], clue: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodePng(payload))
      assert(e.getMessage.toLowerCase.contains(clue),
        s"wanted '$clue' in: ${e.getMessage}")
    }
    // bad signature
    boom("not a png at all".getBytes, "signature")
    // flipped pixel byte inside IDAT: the chunk CRC must catch it
    val crcHit = good.clone()
    crcHit(good.length - 20) = (crcHit(good.length - 20) ^ 0x55).toByte
    boom(crcHit, "crc")
    // truncated mid-chunk
    boom(java.util.Arrays.copyOfRange(good, 0, good.length - 15), "truncated")
    // unsupported color type (grayscale IHDR), with a CORRECT chunk CRC so
    // the validation error is what surfaces
    val ihdrGray = {
      val data = Array[Byte](0, 0, 0, 8, 0, 0, 0, 8, 8, 0, 0, 0, 0)
      val tag = "IHDR".getBytes
      val crc = new java.util.zip.CRC32
      crc.update(tag); crc.update(data)
      val c = crc.getValue.toInt
      Array[Byte](0, 0, 0, 13) ++ tag ++ data ++
        Array(((c >>> 24) & 0xff).toByte, ((c >>> 16) & 0xff).toByte,
          ((c >>> 8) & 0xff).toByte, (c & 0xff).toByte)
    }
    boom(java.util.Arrays.copyOfRange(good, 0, 8) ++ ihdrGray, "color type")
    // a filter byte outside 0..4: build a valid container around a raw
    // scanline block whose first filter byte is 7
    val badScan = new Array[Byte]((8 * 3 + 1) * 8)
    badScan(0) = 7
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(badScan); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def chunk(tagS: String, data: Array[Byte]): Array[Byte] = {
      val tag = tagS.getBytes
      val crc = new java.util.zip.CRC32
      crc.update(tag); crc.update(data)
      val c = crc.getValue.toInt
      Array(((data.length >>> 24) & 0xff).toByte, ((data.length >>> 16) & 0xff).toByte,
        ((data.length >>> 8) & 0xff).toByte, (data.length & 0xff).toByte) ++
        tag ++ data ++
        Array(((c >>> 24) & 0xff).toByte, ((c >>> 16) & 0xff).toByte,
          ((c >>> 8) & 0xff).toByte, (c & 0xff).toByte)
    }
    val ihdrRgb = Array[Byte](0, 0, 0, 8, 0, 0, 0, 8, 8, 2, 0, 0, 0)
    val badFilter = java.util.Arrays.copyOfRange(good, 0, 8) ++
      chunk("IHDR", ihdrRgb) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    boom(badFilter, "filter")
    // IDAT bytes missing entirely: inflate comes up short
    val noIdat = java.util.Arrays.copyOfRange(good, 0, 8) ++
      chunk("IHDR", ihdrRgb) ++ chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Multimodal.decodePng(noIdat))
    // ADVICE r14: zlib header with FDICT set — inflate() returns 0 with
    // needsInput()==false forever; must throw, not spin. 0x78 0xBB has
    // CM=8, CINFO=7, FDICT=1 and passes the (CMF*256+FLG)%31==0 check.
    val dictId = Array[Byte](1, 2, 3, 4)
    val fdictIdat = chunk("IDAT", Array[Byte](0x78, 0xBB.toByte) ++ dictId)
    val fdict = java.util.Arrays.copyOfRange(good, 0, 8) ++
      chunk("IHDR", ihdrRgb) ++ fdictIdat ++ chunk("IEND", Array.emptyByteArray)
    boom(fdict, "stalled")
    // ADVICE r14: a declared chunk length near 2^31 must hit the
    // truncation check (Long math), not overflow into a raw IOOBE
    val lenOverflow = java.util.Arrays.copyOfRange(good, 0, 8) ++
      Array[Byte](0x7f, 0xff.toByte, 0xff.toByte, 0xf0.toByte) ++
      "IDAT".getBytes ++ Array[Byte](0, 0, 0, 0)
    boom(lenOverflow, "truncated")
  }

  test("q166 oracle twin: decoded PNG features match the grid replayed from text") {
    // engine-side sanity at the suite's fixture scale; the sf0.01 gate
    // does the DuckDB hash-compare
    val out = queries.Registry.byName("q166_image_png_roundtrip")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) == 8L && r.getLong(2) == 8L))
    // gray render ⇒ the three channel sums are identical
    assert(out.forall(r => r.getLong(3) == r.getLong(4) && r.getLong(4) == r.getLong(5)))
  }
}

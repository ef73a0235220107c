package graft.ops

import graft.ops.Multimodal.RgbImage

/** Pure-JVM baseline JPEG codec — ITU-T T.81 / ISO 10918-1, public spec
  * only (the container/entropy layer is Annex B/C/F; the quantization
  * tables are the Annex K.1/K.2 examples). Zero external dependencies,
  * same quarantine contract as [[Multimodal.decodePng]]: anything
  * malformed throws a descriptive IllegalArgumentException.
  *
  * Decoder (the general half): full marker walk (SOI/APP/COM/DQT/DHT/
  * SOF0/SOS/EOI), Huffman tables built FROM THE STREAM's DHT segments
  * (not assumed), byte-stuffing-aware bit reader, DC prediction,
  * zigzag + dequant, fixed-point IDCT, and MCU assembly for grayscale,
  * 4:4:4 and 4:2:0 sampling with edge-cropped partial MCUs.
  *
  * Encoder (the minimal fixed-table half, so round-trips are
  * self-contained like the PNG path's): fixed Annex-K quant tables and
  * fixed CANONICAL Huffman tables (every DC category at 4 bits, every
  * AC run/size symbol at 8 bits — legal, compact to declare, and
  * emitted in-stream via DHT so the decoder exercises its real
  * table-building path on every payload).
  *
  * Everything numeric is integer fixed-point so a SQL oracle can replay
  * the LOSSY round-trip bit-for-bit (q168): the DCT basis is
  * [[Basis]] — 64 shared literals with the c(u) normalization folded
  * in — and quantization rounds half away from zero via [[roundDiv]].
  * The spec mandates no particular DCT arithmetic (T.81 only bounds
  * conformance error), so pinning one exact integer convention on both
  * encode and decode is a valid baseline implementation AND makes the
  * decode deterministic enough to hash-compare against DuckDB.
  */
object Jpeg {

  /** Fixed-point DCT-II basis with the c(u) normalization folded in:
    * Basis(u)(x) = round(c(u) * cos((2x+1) u pi / 16) * 4096) with
    * c(0) = 1/sqrt(2) (=> 2896) and c(u>0) = 1 (rows shared with
    * [[Multimodal.DctCoef]]). Forward: S(u,v) = sum s(x,y) B(u)(x)
    * B(v)(y); the true normalized DCT coefficient is S / 2^26, so
    * quantized level = roundDiv(S, 2^26 * Q). Inverse: R(x,y) =
    * sum D(u,v) B(u)(x) B(v)(y); sample = clamp(roundDiv(R, 2^26) +
    * 128). Max |S| <= 128*64*4096^2 ~ 1.4e11 and max |R| <= 64*2048*
    * 4096^2 ~ 2.2e12 — far inside Long.
    */
  private[graft] val Basis: Array[Array[Long]] =
    Array(Array.fill(8)(2896L)) ++ (1 to 7).map(Multimodal.DctCoef(_))

  /** ITU-T T.81 Annex K.1 luminance quantization table (row-major). */
  private[graft] val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** ITU-T T.81 Annex K.2 chrominance quantization table (row-major). */
  private[graft] val QChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag scan: position k in scan order -> row-major block index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Exact round-half-away-from-zero division (d > 0) — the one
    * rounding convention of the whole codec, replayed verbatim by the
    * q168 oracle SQL.
    */
  private[graft] def roundDiv(n: Long, d: Long): Long = {
    val q = (2L * math.abs(n) + d) / (2L * d)
    if (n < 0) -q else q
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  // ---- color space (JFIF integer form) ----------------------------------
  // The luma weights sum to exactly 256 and each chroma row to exactly 0,
  // so a gray pixel (r=g=b=v) maps to (Y=v, Cb=128, Cr=128) EXACTLY —
  // which is what lets the q168 oracle replay only the luma chain.

  private[graft] def rgbToY(r: Int, g: Int, b: Int): Int =
    (77 * r + 150 * g + 29 * b + 128) >> 8
  private[graft] def rgbToCb(r: Int, g: Int, b: Int): Int =
    clamp255(128L + ((-43 * r - 85 * g + 128 * b + 128) >> 8))
  private[graft] def rgbToCr(r: Int, g: Int, b: Int): Int =
    clamp255(128L + ((128 * r - 107 * g - 21 * b + 128) >> 8))

  private def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp255(y + ((359 * (cr - 128) + 128) >> 8)),
    clamp255(y - ((88 * (cb - 128) + 183 * (cr - 128) + 128) >> 8)),
    clamp255(y + ((454 * (cb - 128) + 128) >> 8)))

  // ---- transform ----------------------------------------------------------

  /** Level-shift, forward DCT (separable, exact Long), quantize. `block`
    * is 64 row-major samples 0..255; returns 64 row-major levels.
    */
  private def fdctQuant(block: Array[Int], q: Array[Int]): Array[Int] = {
    val rp = Array.ofDim[Long](8, 8) // rp(v)(x) = sum_y s(x,y) B(v)(y)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L; var y = 0
        while (y < 8) { acc += (block(y * 8 + x) - 128L) * Basis(v)(y); y += 1 }
        rp(v)(x) = acc; x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v2 = 0
      while (v2 < 8) {
        var acc = 0L; var x = 0
        while (x < 8) { acc += rp(v2)(x) * Basis(u)(x); x += 1 }
        out(v2 * 8 + u) =
          roundDiv(acc, (1L << 26) * q(v2 * 8 + u)).toInt
        v2 += 1
      }
      u += 1
    }
    out
  }

  /** Dequantized coefficients (64 row-major Longs, already * Q) ->
    * 64 row-major samples 0..255.
    */
  private def idct(d: Array[Long]): Array[Int] = {
    val cp = Array.ofDim[Long](8, 8) // cp(v)(x) = sum_u D(u,v) B(u)(x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L; var u = 0
        while (u < 8) { acc += d(v * 8 + u) * Basis(u)(x); u += 1 }
        cp(v)(x) = acc; x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L; var v2 = 0
        while (v2 < 8) { acc += cp(v2)(x) * Basis(v2)(y); v2 += 1 }
        out(y * 8 + x) = clamp255(roundDiv(acc, 1L << 26) + 128L)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- Huffman (fixed canonical tables, declared in-stream) --------------

  // DC: all 12 magnitude categories at code length 4 (12 < 2^4, and the
  // all-ones length-4 code stays unused as T.81 C.2 requires).
  private val DcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  // AC: EOB, ZRL and every (run,size) symbol at code length 8
  // (162 < 2^8; the all-ones length-8 code stays unused).
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    (Seq(0x00, 0xf0) ++
      (for { run <- 0 to 15; size <- 1 to 10 } yield (run << 4) | size)).toArray

  /** Canonical code assignment (T.81 Annex C): returns
    * (codeOf(symbol), lengthOf(symbol)) arrays indexed by symbol value.
    */
  private def buildEncodeTable(bits: Array[Int],
                               vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256); val len = new Array[Int](256)
    var c = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        code(vals(k)) = c; len(vals(k)) = l; c += 1; k += 1; i += 1
      }
      c <<= 1; l += 1
    }
    (code, len)
  }

  /** Decoder-side table (T.81 F.2.2.3 MINCODE/MAXCODE/VALPTR walk),
    * built from the DHT bytes actually present in the stream. The
    * canonical assignment is validated while building: a hostile DHT
    * whose bits[] over-subscribes the code space (Kraft sum > 1, i.e.
    * more than 2^l codes of length <= l at some l) would otherwise
    * yield maxCode/minCode pairs that send decode() outside vals() —
    * an ArrayIndexOutOfBoundsException instead of the documented
    * IllegalArgumentException quarantine contract.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var c = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k; minCode(l) = c
          c += bits(l - 1); k += bits(l - 1)
          maxCode(l) = c - 1
          // canonical consistency: every code of length l fits in l bits
          if (c > (1 << l))
            throw new IllegalArgumentException(
              s"over-subscribed DHT: $c codes exceed the length-$l code space")
        }
        c <<= 1; l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1; var code = br.bit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit(); l += 1
      }
      if (l > 16)
        throw new IllegalArgumentException("invalid Huffman code (no match in 16 bits)")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit writer with T.81 byte stuffing (0x00 after any 0xFF
    * data byte) and 1-bit padding at flush.
    */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0)
        n -= 8
      }
    }
    def flush(): Unit = {
      val pad = (8 - n % 8) % 8
      if (pad > 0) put((1 << pad) - 1, pad)
    }
  }

  /** MSB-first bit reader over the entropy-coded segment: un-stuffs
    * 0xFF00, fails loudly on truncation or an embedded marker.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= data.length)
          throw new IllegalArgumentException("truncated entropy stream")
        val b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length)
            throw new IllegalArgumentException("truncated after 0xFF in entropy stream")
          val m = data(pos) & 0xff
          if (m == 0) pos += 1
          else throw new IllegalArgumentException(
            f"marker 0x$m%02X inside entropy stream (truncated scan)")
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(t: Int): Int = {
      var v = 0; var i = 0
      while (i < t) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Magnitude category: t with 2^(t-1) <= |v| < 2^t (0 for v = 0). */
  private def bitSize(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** T.81 F2.2.1 EXTEND: t received bits -> signed value. */
  private def extend(r: Int, t: Int): Int =
    if (t == 0) 0
    else if (r < (1 << (t - 1))) r - (1 << t) + 1
    else r

  // ---- encoder ------------------------------------------------------------

  /** Encode an 8-bit RGB raster as a baseline JFIF JPEG.
    * `mode`: "gray" (single luma component), "444" (three components,
    * no subsampling), "420" (2x2-subsampled chroma, 16x16 MCUs).
    * Deterministic: fixed quant + Huffman tables, defined rounding.
    */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte],
                 mode: String = "444"): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w * h * 3}")
    require(Set("gray", "444", "420").contains(mode), s"bad mode $mode")
    val gray = mode == "gray"
    val sub = mode == "420"
    val hMax = if (sub) 2 else 1
    val mcuPx = 8 * hMax
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx

    // component planes (Y or Y/Cb/Cr), padded by edge replication to the
    // MCU grid each component needs
    def plane(f: (Int, Int) => Int, cw: Int, ch: Int,
              bw: Int, bh: Int): Array[Int] = {
      val p = new Array[Int](bw * bh)
      var y = 0
      while (y < bh) {
        val sy = math.min(y, ch - 1)
        var x = 0
        while (x < bw) { p(y * bw + x) = f(math.min(x, cw - 1), sy); x += 1 }
        y += 1
      }
      p
    }
    def px(x: Int, y: Int, c: Int): Int = rgb((y * w + x) * 3 + c) & 0xff
    def lum(x: Int, y: Int): Int = rgbToY(px(x, y, 0), px(x, y, 1), px(x, y, 2))
    // chroma at full res, then (for 4:2:0) 2x2 mean with round-half-up
    def cbF(x: Int, y: Int): Int = rgbToCb(px(x, y, 0), px(x, y, 1), px(x, y, 2))
    def crF(x: Int, y: Int): Int = rgbToCr(px(x, y, 0), px(x, y, 1), px(x, y, 2))
    def subsampled(f: (Int, Int) => Int)(cx: Int, cy: Int): Int = {
      val x0 = cx * 2; val y0 = cy * 2
      val x1 = math.min(x0 + 1, w - 1); val y1 = math.min(y0 + 1, h - 1)
      (f(x0, y0) + f(x1, y0) + f(x0, y1) + f(x1, y1) + 2) / 4
    }

    // (samplingH==samplingV always here) per component: plane, hv, qtab id
    val comps: Seq[(Array[Int], Int, Int)] =
      if (gray)
        Seq((plane(lum, w, h, mcusX * 8, mcusY * 8), 1, 0))
      else if (!sub)
        Seq((plane(lum, w, h, mcusX * 8, mcusY * 8), 1, 0),
          (plane(cbF, w, h, mcusX * 8, mcusY * 8), 1, 1),
          (plane(crF, w, h, mcusX * 8, mcusY * 8), 1, 1))
      else {
        val cw = (w + 1) / 2; val ch = (h + 1) / 2
        Seq((plane(lum, w, h, mcusX * 16, mcusY * 16), 2, 0),
          (plane(subsampled(cbF), cw, ch, mcusX * 8, mcusY * 8), 1, 1),
          (plane(subsampled(crF), cw, ch, mcusX * 8, mcusY * 8), 1, 1))
      }

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16); out.write('J'); out.write('F'); out.write('I'); out.write('F')
    out.write(0); out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    // DQT: luminance always; chrominance only for color — zigzag order
    val qtabs = if (gray) Seq((0, QLum)) else Seq((0, QLum), (1, QChr))
    marker(0xdb); u16(2 + 65 * qtabs.size)
    qtabs.foreach { case (id, q) =>
      out.write(id) // Pq=0 (8-bit), Tq=id
      var i = 0
      while (i < 64) { out.write(q(ZigZag(i))); i += 1 }
    }
    // SOF0 (baseline DCT)
    marker(0xc0); u16(8 + 3 * comps.size); out.write(8); u16(h); u16(w)
    out.write(comps.size)
    comps.zipWithIndex.foreach { case ((_, hv, tq), i) =>
      out.write(i + 1); out.write((hv << 4) | hv); out.write(tq)
    }
    // DHT: (class 0, id 0) DC + (class 1, id 0) AC; duplicated as id 1
    // for the chroma components in color mode
    val huffIds = if (gray) Seq(0) else Seq(0, 1)
    marker(0xc4)
    u16(2 + huffIds.size * ((17 + DcVals.length) + (17 + AcVals.length)))
    huffIds.foreach { id =>
      out.write(id) // class 0 (DC), table id
      DcBits.foreach(out.write); DcVals.foreach(out.write)
      out.write(0x10 | id) // class 1 (AC)
      AcBits.foreach(out.write); AcVals.foreach(out.write)
    }
    // SOS
    marker(0xda); u16(6 + 2 * comps.size); out.write(comps.size)
    comps.zipWithIndex.foreach { case ((_, _, tq), i) =>
      out.write(i + 1); out.write((tq << 4) | tq)
    }
    out.write(0); out.write(63); out.write(0) // Ss/Se/Ah-Al (baseline)

    // entropy-coded data
    val (dcCode, dcLen) = buildEncodeTable(DcBits, DcVals)
    val (acCode, acLen) = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val pred = new Array[Int](comps.size)
    val block = new Array[Int](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var ci = 0
        while (ci < comps.size) {
          val (p, hv, tq) = comps(ci)
          val pw = mcusX * hv * 8
          var by = 0
          while (by < hv) {
            var bx = 0
            while (bx < hv) {
              val ox = (mx * hv + bx) * 8; val oy = (my * hv + by) * 8
              var i = 0
              while (i < 64) {
                block(i) = p((oy + i / 8) * pw + ox + i % 8); i += 1
              }
              val q = if (tq == 0) QLum else QChr
              val lv = fdctQuant(block, q)
              // DC
              val diff = lv(0) - pred(ci); pred(ci) = lv(0)
              val t = bitSize(diff)
              require(t <= 11, s"DC category $t out of baseline range")
              bw.put(dcCode(t), dcLen(t))
              if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
              // AC, zigzag with run-length coding
              var run = 0; var k = 1
              while (k < 64) {
                val v = lv(ZigZag(k))
                if (v == 0) run += 1
                else {
                  while (run >= 16) { bw.put(acCode(0xf0), acLen(0xf0)); run -= 16 }
                  val s = bitSize(v)
                  require(s <= 10, s"AC category $s out of baseline range")
                  val sym = (run << 4) | s
                  bw.put(acCode(sym), acLen(sym))
                  bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
                  run = 0
                }
                k += 1
              }
              if (run > 0) bw.put(acCode(0x00), acLen(0x00)) // EOB
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ------------------------------------------------------------

  /** Decode a baseline JFIF JPEG per the T.81 marker/entropy spec.
    * Supports 1-component (grayscale) and 3-component frames with
    * 4:4:4 or 4:2:0 sampling; everything else — progressive/extended
    * SOF, restart intervals, 12-bit precision, arithmetic coding —
    * fails loudly for quarantine.
    */
  def decodeJpeg(payload: Array[Byte]): RgbImage = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (payload == null || payload.length < 4 ||
        (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8)
      fail("not a jpeg (bad SOI)")
    var pos = 2
    def u8(): Int = {
      if (pos >= payload.length) fail("truncated jpeg")
      val v = payload(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val a = u8(); (a << 8) | u8() }

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    // frame: (w, h, per-comp (id, hv, tq))
    var fw = 0; var fh = 0
    var fcomps: Array[(Int, Int, Int)] = null
    var result: RgbImage = null

    while (result == null) {
      // marker: one or more 0xFF fill bytes then the code
      var b = u8()
      if (b != 0xff) fail(f"expected marker, got 0x$b%02X")
      var m = u8()
      while (m == 0xff) m = u8()
      m match {
        case 0xd9 => fail("EOI before any scan")
        case 0xc0 => // SOF0 baseline
          val len = u16()
          if (u8() != 8) fail("unsupported sample precision (want 8-bit)")
          fh = u16(); fw = u16()
          if (fw <= 0 || fh <= 0) fail(s"bad dimensions ${fw}x$fh")
          val nf = u8()
          if (nf != 1 && nf != 3) fail(s"unsupported component count $nf")
          if (len != 8 + 3 * nf) fail("bad SOF0 length")
          fcomps = Array.fill(nf) {
            val id = u8(); val hv = u8(); val tq = u8()
            val sh = hv >> 4; val sv = hv & 15
            if (sh != sv || (sh != 1 && sh != 2))
              fail(s"unsupported sampling ${sh}x$sv (want 1x1 or 2x2)")
            if (tq > 3) fail(s"bad quant table id $tq")
            (id, sh, tq)
          }
          if (nf == 3 && (fcomps(1)._2 != 1 || fcomps(2)._2 != 1))
            fail("unsupported chroma sampling (want 1x1)")
          if (nf == 1 && fcomps(0)._2 != 1)
            fail("unsupported grayscale sampling (want 1x1)")
        case 0xc4 => // DHT (possibly several tables)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tc = u8(); val cls = tc >> 4; val id = tc & 15
            if (cls > 1 || id > 3) fail(s"bad DHT class/id 0x$tc%02X")
            val bits = Array.fill(16)(u8())
            val n = bits.sum
            if (n == 0 || n > 256) fail(s"bad DHT symbol count $n")
            val vals = Array.fill(n)(u8())
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
          }
          if (pos != end) fail("bad DHT length")
        case 0xdb => // DQT (possibly several tables)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val pq = u8()
            if ((pq >> 4) != 0) fail("unsupported 16-bit quant table")
            val id = pq & 15
            if (id > 3) fail(s"bad quant table id $id")
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(ZigZag(i)) = u8(); i += 1 }
            qtabs(id) = q
          }
          if (pos != end) fail("bad DQT length")
        case 0xda => // SOS + entropy-coded scan
          if (fcomps == null) fail("SOS before SOF0")
          val len = u16()
          val ns = u8()
          if (ns != fcomps.length) fail("scan must cover every component")
          if (len != 6 + 2 * ns) fail("bad SOS length")
          val scan = Array.fill(ns) { val cs = u8(); val tt = u8(); (cs, tt >> 4, tt & 15) }
          if (u8() != 0 || u8() != 63 || u8() != 0)
            fail("non-baseline spectral selection")
          // map scan comps to frame comps in order, validate tables exist
          val order = scan.map { case (cs, td, ta) =>
            val fi = fcomps.indexWhere(_._1 == cs)
            if (fi < 0) fail(s"scan component $cs not in frame")
            if (dcTabs(td) == null) fail(s"missing DC Huffman table $td")
            if (acTabs(ta) == null) fail(s"missing AC Huffman table $ta")
            if (qtabs(fcomps(fi)._3) == null)
              fail(s"missing quant table ${fcomps(fi)._3}")
            (fi, td, ta)
          }
          val hMax = fcomps.map(_._2).max
          val mcuPx = 8 * hMax
          val mcusX = (fw + mcuPx - 1) / mcuPx
          val mcusY = (fh + mcuPx - 1) / mcuPx
          // plausibility cap BEFORE allocating: every coded block costs
          // at least 2 entropy bits (1-bit DC code + 1-bit EOB), so a
          // payload of B bytes cannot hold more than 4B blocks. A tiny
          // hostile payload declaring 65535x65535 in SOF would otherwise
          // trigger multi-GB plane allocations instead of the documented
          // IllegalArgumentException quarantine.
          val totalBlocks =
            mcusX.toLong * mcusY * fcomps.map(c => c._2 * c._2).sum
          if (totalBlocks > 4L * payload.length)
            fail(s"implausible dimensions ${fw}x$fh: $totalBlocks blocks " +
              s"cannot fit a ${payload.length}-byte payload")
          // per-component plane sized to its own block grid
          val planes = fcomps.map { case (_, hv, _) =>
            new Array[Int](mcusX * hv * 8 * mcusY * hv * 8)
          }
          val br = new BitReader(payload, pos)
          val pred = new Array[Int](fcomps.length)
          val dq = new Array[Long](64)
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              order.foreach { case (fi, td, ta) =>
                val hv = fcomps(fi)._2
                val q = qtabs(fcomps(fi)._3)
                val pw = mcusX * hv * 8
                var by = 0
                while (by < hv) {
                  var bx = 0
                  while (bx < hv) {
                    java.util.Arrays.fill(dq, 0L)
                    // DC
                    val t = dcTabs(td).decode(br)
                    if (t > 11) fail(s"bad DC category $t")
                    pred(fi) += extend(br.bits(t), t)
                    dq(0) = pred(fi).toLong * q(0)
                    // AC
                    var k = 1
                    while (k < 64) {
                      val sym = acTabs(ta).decode(br)
                      if (sym == 0x00) k = 64 // EOB
                      else if (sym == 0xf0) k += 16 // ZRL
                      else {
                        k += sym >> 4
                        val s = sym & 15
                        if (s > 10) fail(s"bad AC category $s")
                        if (k > 63) fail("AC run past block end")
                        dq(ZigZag(k)) = extend(br.bits(s), s).toLong * q(ZigZag(k))
                        k += 1
                      }
                    }
                    if (k > 64) fail("AC run past block end (ZRL)")
                    val samples = idct(dq)
                    val ox = (mx * hv + bx) * 8; val oy = (my * hv + by) * 8
                    var i = 0
                    while (i < 64) {
                      planes(fi)((oy + i / 8) * pw + ox + i % 8) = samples(i)
                      i += 1
                    }
                    bx += 1
                  }
                  by += 1
                }
              }
              mx += 1
            }
            my += 1
          }
          // after the last MCU: padding bits, then EOI (stuffing-free zone)
          pos = br.pos
          var sawEoi = false
          while (!sawEoi) {
            if (pos + 1 >= payload.length) fail("missing EOI after scan")
            if ((payload(pos) & 0xff) == 0xff && (payload(pos + 1) & 0xff) == 0xd9)
              sawEoi = true
            else pos += 1
          }
          // compose RGB
          val rgb = new Array[Byte](fw * fh * 3)
          val pws = fcomps.map(c => mcusX * c._2 * 8)
          var y = 0
          while (y < fh) {
            var x = 0
            while (x < fw) {
              val o = (y * fw + x) * 3
              if (fcomps.length == 1) {
                val v = planes(0)(y * pws(0) + x).toByte
                rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
              } else {
                val yv = planes(0)(y * pws(0) + x)
                val cx = x * fcomps(1)._2 / hMax; val cy = y * fcomps(1)._2 / hMax
                val cb = planes(1)(cy * pws(1) + cx)
                val cr = planes(2)(cy * pws(2) + cx)
                val (r, g, b2) = yccToRgb(yv, cb, cr)
                rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b2.toByte
              }
              x += 1
            }
            y += 1
          }
          result = RgbImage(fw, fh, rgb)
        case 0xdd => fail("restart intervals unsupported")
        case 0xc8 | 0xcc => fail(f"unsupported marker 0x$m%02X")
        case x if x >= 0xc1 && x <= 0xcf =>
          fail(f"unsupported SOF type 0x$x%02X (progressive/extended/lossless)")
        case x if (x >= 0xe0 && x <= 0xef) || x == 0xfe => // APPn / COM
          val len = u16()
          if (len < 2 || pos + len - 2 > payload.length) fail("truncated APP/COM")
          pos += len - 2
        case x => fail(f"unexpected marker 0x$x%02X")
      }
    }
    result
  }
}

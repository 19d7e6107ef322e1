package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the pure-JVM baseline JPEG decoder. The key independence
 * property: encoded streams are checked against a NAIVE direct
 * O(n^4) IDCT computed straight from the T.81 A.3.3 double sum in
 * this spec — the decoder's separable fast path must agree within
 * +-1 (identical double math modulo summation order), and exactly on
 * DC-only blocks (where both sums collapse to one term).
 */
class JpegBaselineSpec extends AnyFunSuite {

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Direct T.81 A.3.3 reference: dequantized natural-order coefs in,
    * level-shifted clamped pixels out. Deliberately the slow textbook
    * quadruple loop, sharing nothing with the decoder's separable path. */
  private def refIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (row <- 0 until 8; col <- 0 until 8) {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv / 4.0 * coef(u * 8 + v) *
          math.cos((2 * row + 1) * u * math.Pi / 16.0) *
          math.cos((2 * col + 1) * v * math.Pi / 16.0)
      }
      out(row * 8 + col) = clamp(math.round(s + 128.0).toInt)
    }
    out
  }

  /** zigzag quantized block -> expected pixels via the reference IDCT */
  private def expectedPixels(zz: Array[Int], quantZz: Array[Int]): Array[Int] = {
    val natural = new Array[Int](64)
    for (k <- 0 until 64) natural(JpegBaseline.Zigzag(k)) = zz(k) * quantZz(k)
    refIdct(natural)
  }

  private val flatQuant = Array.fill(64)(8)

  private def flatBlock(v: Int): Array[Int] = {
    val zz = new Array[Int](64)
    zz(0) = v - 128 // DC quant 8 divides the flat-block coefficient 8*(v-128)
    zz
  }

  test("flat DC-only blocks round-trip EXACTLY (the driver-oracle property)") {
    val vals = Array(40, 200, 128, 3) // 2x2 blocks, 16x16 gray
    val jpeg = JpegBaseline.encodeGrayBlocks(vals.map(flatBlock), 2, 2, flatQuant)
    val d = JpegBaseline.decodePixels(jpeg).get
    assert((d.width, d.height, d.channels) === ((16, 16, 1)))
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = vals((y / 8) * 2 + (x / 8))
      assert((d.samples(y * 16 + x) & 0xff) === want, s"pixel ($x,$y)")
    }
    // and the existing header parser agrees on dimensions
    assert(MultimodalOps.parseHeader(jpeg)
      .contains(MultimodalOps.MediaHeader("jpeg", 16, 16, 1, 0)))
  }

  test("AC coefficients: decoder matches the naive reference IDCT") {
    // deterministic pseudo-random blocks exercising DC swings, AC runs,
    // negative values and a non-flat quant table
    val quant = Array.tabulate(64)(k => 1 + (k * 7) % 23)
    val blocks = Array.tabulate(6) { b =>
      val zz = new Array[Int](64)
      zz(0) = (b * 97 % 255) - 127 // DC swings across categories
      for (k <- 1 until 64 if (k * 31 + b * 17) % 5 == 0)
        zz(k) = ((k * 13 + b * 41) % 15) - 7
      zz
    }
    val jpeg = JpegBaseline.encodeGrayBlocks(blocks, 3, 2, quant)
    val d = JpegBaseline.decodePixels(jpeg).get
    assert((d.width, d.height) === ((24, 16)))
    for (b <- 0 until 6) {
      val want = expectedPixels(blocks(b), quant)
      val bx = (b % 3) * 8; val by = (b / 3) * 8
      for (y <- 0 until 8; x <- 0 until 8) {
        val got = d.samples((by + y) * 24 + bx + x) & 0xff
        assert(math.abs(got - want(y * 8 + x)) <= 1,
          s"block $b pixel ($x,$y): got $got want ${want(y * 8 + x)}")
      }
    }
  }

  test("ZRL (16-zero runs) and high-index coefficients decode") {
    val zz = new Array[Int](64)
    zz(0) = 10
    zz(20) = 5   // needs one ZRL after the DC
    zz(40) = -3  // another long run
    zz(63) = 2   // the last coefficient, maximal run handling
    val jpeg = JpegBaseline.encodeGrayBlocks(Array(zz), 1, 1, flatQuant)
    val d = JpegBaseline.decodePixels(jpeg).get
    val want = expectedPixels(zz, flatQuant)
    for (i <- 0 until 64)
      assert(math.abs((d.samples(i) & 0xff) - want(i)) <= 1, s"pixel $i")
  }

  test("12-bit extended sequential: flat blocks round-trip to the top-8-bit mapping") {
    // flat 12-bit block v: DC coefficient 8*(v-2048), DC quant 8 makes
    // the round-trip exact at full precision; output is v >> 4
    def flat12(v: Int): Array[Int] = { val zz = new Array[Int](64); zz(0) = v - 2048; zz }
    val vals = Array(0, 4095, 2048, 40 << 4, 3000)
    // 5 blocks of a 40x8 frame; DRI exercises the restart path at P=12
    val jpeg = JpegBaseline.encodeGray12Blocks(vals.map(flat12), 5, 1, flatQuant, dri = 2)
    // the stream declares SOF1 P=12 (byte after the SOF length)
    assert(jpeg.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc1) > 0)
    val d = JpegBaseline.decodePixels(jpeg).get
    assert((d.width, d.height, d.channels) === ((40, 8, 1)))
    for (b <- vals.indices; y <- 0 until 8; x <- 0 until 8)
      assert((d.samples(y * 40 + b * 8 + x) & 0xff) === (vals(b) >> 4),
        s"block $b pixel ($x,$y)")
  }

  test("12-bit: wide DC categories (to 15) and AC sizes above 10 decode") {
    // DC quant 1 keeps the full 8*(v-2048) coefficient: block-to-block
    // diffs reach +-32760 = category 15, and AC values up to +-8191
    // need sizes 11..14 — none of which exist in the 8-bit tables
    val quant1 = Array.fill(64)(1)
    val b0 = new Array[Int](64); b0(0) = 8 * (0 - 2048)     // -16384
    val b1 = new Array[Int](64); b1(0) = 8 * (4095 - 2048)  // +16376: diff 32760, cat 15
    b1(5) = 8191; b1(9) = -4096                             // AC sizes 13-14
    val jpeg = JpegBaseline.encodeGray12Blocks(Array(b0, b1), 2, 1, quant1)
    val d = JpegBaseline.decodePixels(jpeg).get
    // block 0 is flat 0, block 1 has the reference-IDCT pixels >> 4
    for (y <- 0 until 8; x <- 0 until 8)
      assert((d.samples(y * 16 + x) & 0xff) === 0, s"b0 ($x,$y)")
    val natural = new Array[Int](64)
    for (k <- 0 until 64) natural(JpegBaseline.Zigzag(k)) = b1(k) * 1
    // reference 12-bit IDCT: textbook sum, +2048 shift, 4095 clamp
    for (row <- 0 until 8; col <- 0 until 8) {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv / 4.0 * natural(u * 8 + v) *
          math.cos((2 * row + 1) * u * math.Pi / 16.0) *
          math.cos((2 * col + 1) * v * math.Pi / 16.0)
      }
      val want12 = math.max(0, math.min(4095, math.round(s + 2048.0).toInt))
      val got = d.samples(row * 16 + 8 + col) & 0xff
      assert(math.abs(got - (want12 >> 4)) <= 1,
        s"b1 ($col,$row): got $got want ${want12 >> 4}")
    }
  }

  test("hierarchical: flat lo frame + EXP + flat differential corrections round-trip") {
    // one 8x8 lo block at 100, four full-res diff quadrant blocks: the
    // decoded 16x16 image is exactly 100 + d per quadrant (flat blocks
    // survive DC-quant-8 exactly in BOTH frames; a flat reference
    // upsamples to itself, so the correction applies to a flat base)
    val lo = { val zz = new Array[Int](64); zz(0) = 100 - 128; zz }
    def diff(d: Int): Array[Int] = { val zz = new Array[Int](64); zz(0) = d; zz }
    val ds = Array(30, -20, 0, 100) // block raster order: TL TR BL BR
    val jpeg = JpegBaseline.encodeGrayHier(Array(lo), 1, 1, ds.map(diff), flatQuant)
    // the stream really is hierarchical: DHP, EXP, SOF5 all present
    def has(m: Int): Boolean =
      jpeg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(has(0xde) && has(0xdf) && has(0xc5))
    val d = JpegBaseline.decodePixels(jpeg).get
    assert((d.width, d.height, d.channels) === ((16, 16, 1)))
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = 100 + ds((y / 8) * 2 + (x / 8))
      assert((d.samples(y * 16 + x) & 0xff) === want, s"pixel ($x,$y)")
    }
  }

  test("hierarchical 12-bit: differential DC categories reach SSSS=16 (DIFF=32768, no appended bits)") {
    // 12-bit hier stream (DHP P=12, SOF1 lo frame, SOF5 diff frame):
    // flat lo at 2048 (zz(0)=0 after level shift, DC quant 8); one diff
    // quadrant coded with DC=32768 — category 16, which T.81 F.1.2.1.1
    // codes as SSSS=16 with NO appended bits. Decoded quadrant is
    // clamp(2048+32768)=4095 -> byte 255; the other quadrants pin the
    // ordinary 12-bit differential path around it.
    val lo = new Array[Int](64) // flat 2048: zz(0) = 2048 - 2048 = 0
    def diff(d: Int): Array[Int] = { val zz = new Array[Int](64); zz(0) = d; zz }
    val ds = Array(32768, 100, -50, 0) // TL TR BL BR
    val jpeg = JpegBaseline.encodeGrayHier(Array(lo), 1, 1, ds.map(diff), flatQuant,
      precision = 12)
    def has(m: Int): Boolean =
      jpeg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(has(0xde) && has(0xdf) && has(0xc1) && has(0xc5) && !has(0xc0))
    val d = JpegBaseline.decodePixels(jpeg).get
    assert((d.width, d.height, d.channels) === ((16, 16, 1)))
    for (y <- 0 until 16; x <- 0 until 16) {
      val v12 = math.max(0, math.min(4095, 2048 + ds((y / 8) * 2 + (x / 8))))
      val want = v12 >> 4 // the precision-independent top-8-bits mapping
      assert((d.samples(y * 16 + x) & 0xff) === want, s"pixel ($x,$y)")
    }
  }

  test("hierarchical: non-flat reference goes through the J.1.1.2 interpolation") {
    // lo block with AC structure, zero diff frame: the output must be
    // the lo frame's pixels expanded by the (a+b+1)>>1 filter — checked
    // against an upsample computed here from the reference-IDCT pixels
    val lo = new Array[Int](64)
    lo(0) = 10; lo(1) = -40; lo(8) = 25; lo(5) = 7
    val zeroDiff = Array.fill(4)(new Array[Int](64))
    val jpeg = JpegBaseline.encodeGrayHier(Array(lo), 1, 1, zeroDiff, flatQuant)
    val d = JpegBaseline.decodePixels(jpeg).get
    val base = expectedPixels(lo, flatQuant) // 8x8 reference pixels
    // independent 1:2 expand: horizontal then vertical, edge replicated
    val hw = new Array[Int](16 * 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val a = base(y * 8 + x / 2)
      hw(y * 16 + x) =
        if (x % 2 == 0) a
        else { val b = if (x / 2 + 1 < 8) base(y * 8 + x / 2 + 1) else a; (a + b + 1) >> 1 }
    }
    for (y <- 0 until 16; x <- 0 until 16) {
      val a = hw((y / 2) * 16 + x)
      val want =
        if (y % 2 == 0) a
        else { val b = if (y / 2 + 1 < 8) hw((y / 2 + 1) * 16 + x) else a; (a + b + 1) >> 1 }
      val got = d.samples(y * 16 + x) & 0xff
      // base pixels carry the usual +-1 separable-vs-naive IDCT slack,
      // halved-then-rounded by the filter: allow the same +-1
      assert(math.abs(got - want) <= 1, s"pixel ($x,$y): got $got want $want")
    }
  }

  test("hierarchical: malformed sequences refuse cleanly") {
    val lo = { val zz = new Array[Int](64); zz(0) = 0; zz }
    def diff(d: Int): Array[Int] = { val zz = new Array[Int](64); zz(0) = d; zz }
    val good = JpegBaseline.encodeGrayHier(Array(lo), 1, 1, Array.fill(4)(diff(0)), flatQuant)
    assert(JpegBaseline.decodePixels(good).isDefined)
    // (a) differential SOF5 with no DHP: strip the DHP segment AND
    // demote frame 1 to SOF5 (without the demotion the leading SOF0
    // frame is a perfectly valid standalone baseline stream)
    val dhpIdx = good.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xde)
    val dhpLen = ((good(dhpIdx + 2) & 0xff) << 8) | (good(dhpIdx + 3) & 0xff)
    val noDhp = good.take(dhpIdx) ++ good.drop(dhpIdx + 2 + dhpLen)
    val c0 = noDhp.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    noDhp(c0 + 1) = 0xc5.toByte
    assert(JpegBaseline.decodePixels(noDhp).isEmpty)
    // (b) frame dims exceeding the DHP dims refuse
    val c5 = good.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc5)
    val bad = good.clone()
    bad(c5 + 7) = 64.toByte // SOF5 width low byte: 16 -> 64 > DHP's 16
    assert(JpegBaseline.decodePixels(bad).isEmpty)
    // (c) truncation inside the differential frame's entropy data
    assert(JpegBaseline.decodePixels(good.dropRight(6)).isEmpty)
  }

  test("12-bit on SOF0 refuses (T.81: baseline is 8-bit only)") {
    def flat12(v: Int): Array[Int] = { val zz = new Array[Int](64); zz(0) = v - 2048; zz }
    val jpeg = JpegBaseline.encodeGray12Blocks(Array(flat12(3000)), 1, 1, flatQuant)
    val i = jpeg.sliding(2).indexWhere(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc1)
    jpeg(i + 1) = 0xc0.toByte // demote the frame marker to SOF0, keep P=12
    assert(JpegBaseline.decodePixels(jpeg).isEmpty)
  }

  test("restart markers: DRI resets predictors and realigns") {
    // 8 MCUs with dri=3 -> RST0 after 3, RST1 after 6; DC predictors
    // reset at each boundary, so values after a marker re-encode from 0
    val vals = Array(10, 250, 60, 200, 5, 128, 99, 180)
    val jpeg = JpegBaseline.encodeGrayBlocks(vals.map(flatBlock), 8, 1, flatQuant, dri = 3)
    // the stream really contains restart markers (not just a DRI header)
    def count(pat: Int): Int = jpeg.sliding(2).count(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == pat)
    assert(count(0xd0) >= 1 && count(0xd1) >= 1)
    val d = JpegBaseline.decodePixels(jpeg).get
    for (b <- vals.indices; x <- 0 until 8)
      assert((d.samples(x + b * 8) & 0xff) === vals(b), s"block $b col $x")
  }

  test("flat color: 4:4:4 and 4:2:0 YCbCr->RGB with hand-computed constants") {
    // neutral chroma: R=G=B=Y exactly, no rounding in the matrix
    val gray = JpegBaseline.encodeFlatColor(120, 128, 128, 2, 2, 1, 1)
    val dg = JpegBaseline.decodePixels(gray).get
    assert((dg.width, dg.height, dg.channels) === ((16, 16, 3)))
    assert(dg.samples.forall(b => (b & 0xff) == 120))
    // saturated chroma, hand-computed: Y=100 Cb=200 Cr=50 ->
    // R = round(100 + 1.402*(50-128))  = round(-9.356)  -> clamp 0
    // G = round(100 - 0.344136*72 - 0.714136*(-78)) = round(130.92) = 131
    // B = round(100 + 1.772*(200-128)) = round(227.58) = 228
    for ((h, v) <- Seq((1, 1), (2, 2), (2, 1))) { // 4:4:4, 4:2:0, 4:2:2
      val jpeg = JpegBaseline.encodeFlatColor(100, 200, 50, 1, 1, h, v)
      val d = JpegBaseline.decodePixels(jpeg).get
      assert((d.width, d.height, d.channels) === ((8 * h, 8 * v, 3)), s"$h:$v dims")
      for (i <- 0 until d.width * d.height) {
        assert((d.samples(3 * i) & 0xff) === 0, s"$h:$v R at $i")
        assert((d.samples(3 * i + 1) & 0xff) === 131, s"$h:$v G at $i")
        assert((d.samples(3 * i + 2) & 0xff) === 228, s"$h:$v B at $i")
      }
    }
  }

  test("progressive: six-scan successive approximation equals the baseline decode") {
    // the T.81 equivalence: a progressive stream carrying the same
    // quantized coefficients must decode to the same pixels as the
    // baseline stream — covers DC first/refine, AC first bands with
    // EOB runs, AC refinement correction bits and refinement ZRL
    val quant = Array.tabulate(64)(k => 1 + (k * 7) % 23)
    val blocks = Array.tabulate(6) { b =>
      val zz = new Array[Int](64)
      zz(0) = (b * 97 % 255) - 127
      for (k <- 1 until 64 if (k * 31 + b * 17) % 5 == 0)
        zz(k) = ((k * 13 + b * 41) % 15) - 7
      zz
    }
    val base = JpegBaseline.decodePixels(
      JpegBaseline.encodeGrayBlocks(blocks, 3, 2, quant)).get
    val prog = JpegBaseline.decodePixels(
      JpegBaseline.encodeGrayProgressive(blocks, 3, 2, quant)).get
    assert((prog.width, prog.height, prog.channels) === ((24, 16, 1)))
    assert(prog.samples.toSeq === base.samples.toSeq)
  }

  test("progressive: EOB runs across blocks, refinement ZRL, odd values round-trip") {
    // block 0: empty bands (rides EOB runs in every scan); blocks 1-2:
    // sparse high-index coefficients forcing ZRL in first AND refine
    // scans; odd values exercise the refinement bit both ways
    val zzEmpty = { val z = new Array[Int](64); z(0) = 4; z }
    val zzSparse = { val z = new Array[Int](64); z(0) = -3; z(40) = 5; z(63) = -1; z }
    val zzOdd = { val z = new Array[Int](64); z(0) = 7; z(1) = 1; z(30) = -9; z }
    val blocks = Array(zzEmpty, zzSparse, zzOdd, zzEmpty)
    val base = JpegBaseline.decodePixels(
      JpegBaseline.encodeGrayBlocks(blocks, 4, 1, flatQuant)).get
    val prog = JpegBaseline.decodePixels(
      JpegBaseline.encodeGrayProgressive(blocks, 4, 1, flatQuant)).get
    assert(prog.samples.toSeq === base.samples.toSeq)
    // and against the reference IDCT directly
    for (b <- blocks.indices) {
      val want = expectedPixels(blocks(b), flatQuant)
      for (y <- 0 until 8; x <- 0 until 8)
        assert(math.abs((prog.samples(y * 32 + b * 8 + x) & 0xff) - want(y * 8 + x)) <= 1)
    }
  }

  test("progressive: truncation before EOI and mid-scan refuse cleanly") {
    val blocks = Array.tabulate(4) { b =>
      val zz = new Array[Int](64); zz(0) = b * 30 - 60; zz(5) = b; zz
    }
    val prog = JpegBaseline.encodeGrayProgressive(blocks, 2, 2, flatQuant)
    assert(JpegBaseline.decodePixels(prog).isDefined)
    // no partial renders: cutting the EOI (or any tail) returns None
    assert(JpegBaseline.decodePixels(prog.take(prog.length - 2)) === None)
    assert(JpegBaseline.decodePixels(prog.take(prog.length / 2)) === None)
  }

  test("hostile and out-of-scope streams refuse, never crash or hang") {
    val good = JpegBaseline.encodeGrayBlocks(Array(flatBlock(77)), 1, 1, flatQuant)
    assert(JpegBaseline.decodePixels(good).isDefined)
    // truncated entropy stream: cut before EOI — the bit reader must
    // starve cleanly
    assert(JpegBaseline.decodePixels(good.take(good.length - 4)) === None)
    // SOF0 patched to SOF2: the baseline scan header (Ss=0, Se=63) is
    // ILLEGAL for a progressive DC scan — refuse, don't misdecode
    val prog = good.clone()
    val sofAt = good.indices.find(i => (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegBaseline.decodePixels(prog) === None)
    // 12-bit precision
    val deep = good.clone(); deep(sofAt + 4) = 12
    assert(JpegBaseline.decodePixels(deep) === None)
    // dimension bomb: 65535x65535 must refuse on the pixel cap before
    // allocating planes
    val bomb = good.clone()
    bomb(sofAt + 5) = 0xff.toByte; bomb(sofAt + 6) = 0xff.toByte
    bomb(sofAt + 7) = 0xff.toByte; bomb(sofAt + 8) = 0xff.toByte
    assert(JpegBaseline.decodePixels(bomb) === None)
    // desynced marker stream and junk
    assert(JpegBaseline.decodePixels(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3)) === None)
    assert(JpegBaseline.decodePixels("not a jpeg".getBytes("US-ASCII")) === None)
    assert(JpegBaseline.decodePixels(null) === None)
    assert(JpegBaseline.decodePixels(Array.emptyByteArray) === None)
    // header-only planted JPEG (the m_media_resize fixture shape): a
    // SOF but no scan data -> None, the pixelFeatures fallback path
    val headerOnly = good.take(sofAt + 13) // SOI..SOF segment only (2 marker + len 11)
    assert(JpegBaseline.decodePixels(headerOnly) === None)
  }
}

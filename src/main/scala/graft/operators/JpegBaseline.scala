package graft.operators

/**
 * REAL baseline-JPEG pixel decode, pure JVM — the last media stage that
 * was honestly stubbed. The container has no codec library, but ITU
 * T.81 baseline sequential needs none: the entropy stage is canonical
 * Huffman over (run,size) symbols and the transform is a fixed 8x8
 * DCT-III, both implementable exactly from the public spec. This
 * closes the "JPEG entropy decode needs a codec" gap the same way
 * `java.util.zip.Inflater` closed PNG's.
 *
 * Scope (and honest refusals, mirroring decodePngPixels' contract):
 *  - SOF0/SOF1 (baseline / extended sequential), 8-bit precision,
 *    1 or 3 components, any Hi/Vi sampling (4:4:4, 4:2:2, 4:2:0, ...),
 *    DRI/RSTn restart intervals, 0xFF00 byte stuffing, multi-table
 *    DQT/DHT segments, fill bytes before markers (T.81 B.1.1.2).
 *  - Progressive (SOF2, T.81 Annex G): full spectral selection AND
 *    successive approximation — DC first/refine scans (interleaved or
 *    single-component), AC first scans with EOB runs, AC refinement
 *    with correction bits (G.1.2.3), restart intervals inside any
 *    scan. Coefficients accumulate across scans and dequantize+IDCT
 *    once at EOI; a progressive stream truncated before EOI returns
 *    None (the honest-refusal contract — no partial renders).
 *  - 12-bit precision (P=12 on SOF1/SOF2, T.81 Table B.2): full
 *    decode at the wider range — level shift 2048, clamp 4095, DC
 *    categories to 15 / AC sizes to 14 (Tables F.1/F.2), 16-bit DQT —
 *    emitting the top 8 bits (>> 4, the standard display mapping) so
 *    the byte-sample output schema is precision-independent.
 *  - Hierarchical (T.81 Annex J): DHP sequence header, a
 *    non-differential first frame (SOF0/SOF1, possibly reduced
 *    resolution), EXP 1:2 reference expansion with the J.1.1.2
 *    (a+b+1)>>1 interpolation (edge-replicated), and differential
 *    sequential frames (SOF5 — DC coded without prediction per
 *    F.1.1.5.2, difference IDCT without level shift, clamped add
 *    onto the reference). Every frame must carry the DHP's component
 *    set; the sequence must end at the DHP dims. Differential
 *    PROGRESSIVE frames (SOF6) and lossless (SOF3/7/11/15) refuse.
 *  - Arithmetic coding (SOF9/SOF10/SOF13/SOF14) and anything
 *    truncated or desynced returns None — callers fall back to
 *    compressed-blob features exactly as before. Arithmetic stays a
 *    refusal DELIBERATELY: the QM-coder needs the 113-row Qe state
 *    table of T.81 Table D.3 verbatim, no copy exists in this
 *    container, and a from-memory reconstruction validated only
 *    against this file's own encoder would be self-consistent yet
 *    non-conformant — the honest-refusal contract beats that.
 *
 * The IDCT is the separable double-precision form of the T.81 A.3.3
 * formula; Java FP is strict (IEEE 754) since JDK 17, so results are
 * bit-deterministic across executors. Chroma planes are upsampled
 * nearest-neighbor and converted with the JFIF YCbCr matrix; grayscale
 * streams skip both. A `maxPixels` cap refuses crafted SOF dimensions
 * before allocating (the decodePngPixels inflate-cap lesson).
 *
 * The companion encoder exists for fixture synthesis only (the
 * encodePngGray counterpart): arbitrary quantized coefficient blocks
 * for grayscale, flat DC-only color MCUs for the sampling paths. Flat
 * 8x8 blocks survive the quantized round-trip EXACTLY when the DC
 * quant is 8 (DC coefficient of a flat block v is 8*(v-128)), which is
 * what makes planted-JPEG pixel stats SQL-predictable for the driver
 * oracle despite JPEG being lossy in general.
 */
object JpegBaseline {

  final case class Decoded(samples: Array[Byte], width: Int, height: Int, channels: Int)

  // zigzag index -> natural (row-major) index, T.81 Figure A.6
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ct(x)(u) = C(u)/2 * cos((2x+1) u pi / 16) — the separable half of
  // the T.81 A.3.3 IDCT basis
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private object Bail extends Exception { override def fillInStackTrace(): Throwable = this }

  /** Canonical Huffman table (T.81 C.2): codes assigned in increasing
    * length then listing order. Decode walks lengths with the standard
    * min/max-code algorithm — at most 16 steps per symbol. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
      if (k != vals.length) throw Bail
    }
    def value(idx: Int): Int = vals(idx)
  }

  /** Bit reader over the entropy-coded segment: 0xFF00 unstuffs to a
    * literal 0xFF; any other marker mid-block is corruption (RSTn are
    * consumed explicitly at restart boundaries, never here). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0

    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) throw Bail
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) throw Bail
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1          // stuffed literal 0xFF
          else throw Bail                      // marker inside a block
          byte = 0xff
        }
        acc = byte
        cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeHuff(h: Huff): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.value(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      throw Bail // no code of length <= 16 matched — desynced stream
    }

    /** Next unread byte offset — scan end for the marker loop (any
      * partially-consumed byte was already advanced past on load). */
    def alignedPos: Int = pos

    /** Byte-align and consume an expected RSTn marker (T.81 E.2.4). */
    def restart(expected: Int): Unit = {
      cnt = 0
      if (pos + 1 >= b.length) throw Bail
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != expected) throw Bail
      pos += 2
    }
  }

  // T.81 F.2.2.1 EXTEND: map a received magnitude to its signed value
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var td = 0; var ta = 0
    var plane: Array[Int] = null
    var planeW = 0; var planeH = 0
    var pred = 0
    // progressive state: the frame-wide coefficient accumulator, one
    // 64-int block (ZIGZAG order) per block of the padded MCU grid
    var coefs: Array[Int] = null
    var fullBw = 0; var fullBh = 0 // padded (interleaved) block grid
    var bw = 0; var bh = 0         // ceil(comp dims / 8): the non-interleaved grid
  }

  def decodePixels(jpeg: Array[Byte], maxPixels: Int = 1 << 26): Option[Decoded] =
    try decodeOrBail(jpeg, maxPixels) catch { case Bail => None }

  private def decodeOrBail(b: Array[Byte], maxPixels: Int): Option[Decoded] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def u16(o: Int): Int = {
      if (o + 1 >= b.length) throw Bail
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var dri = 0
    var progressive = false
    var sawScan = false
    var precision = 8
    // hierarchical (T.81 Annex J) sequence state: DHP pins the full
    // dims + component set; per-component reference planes at TRUE
    // component resolution accumulate across frames
    var hier = false
    var hierW = 0; var hierH = 0
    var hierIds: Array[Int] = null
    var hierHv: Array[Int] = null
    var refs: Array[Array[Int]] = null
    var refCw: Array[Int] = null
    var refCh: Array[Int] = null
    var pendingExp = -1 // (Eh<<4)|Ev from an EXP marker, -1 = none
    var differential = false
    var pos = 2
    while (pos + 1 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None // desynced marker stream
      if ((b(pos + 1) & 0xff) == 0xff) { pos += 1 } // fill bytes (B.1.1.2)
      else {
        val marker = b(pos + 1) & 0xff
        pos += 2
        marker match {
          case 0xd8 | 0x01 => // SOI / TEM: no payload
          case 0xd9 => // EOI: progressive and hierarchical frames finish here
            if (hier) {
              // the sequence must have reached the DHP's full dims
              if (!sawScan || refs == null || refs.exists(_ == null)) return None
              if (width != hierW || height != hierH) return None
              val hmax = comps.map(_.h).max
              val vmax = comps.map(_.v).max
              var i = 0
              while (i < comps.length) {
                comps(i).plane = refs(i)
                comps(i).planeW = refCw(i)
                comps(i).planeH = refCh(i)
                i += 1
              }
              return assemble(comps, hierW, hierH, hmax, vmax, precision)
            }
            return if (progressive && sawScan)
              finishProgressive(comps, width, height, quant, quantSeen, precision)
            else None // EOI before any SOS
          case 0xdb => // DQT: one or more tables
            val end = pos + u16(pos)
            if (end > b.length) throw Bail
            var p = pos + 2
            while (p < end) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (tq > 3 || pq > 1) throw Bail
              p += 1
              var i = 0
              while (i < 64) {
                if (pq == 1) { quant(tq)(i) = u16(p); p += 2 }
                else { if (p >= end) throw Bail; quant(tq)(i) = b(p) & 0xff; p += 1 }
                i += 1
              }
              quantSeen(tq) = true
            }
            pos = end
          case 0xc4 => // DHT: one or more tables
            val end = pos + u16(pos)
            if (end > b.length) throw Bail
            var p = pos + 2
            while (p < end) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3) throw Bail
              p += 1
              if (p + 16 > end) throw Bail
              val bits = Array.tabulate(16)(i => b(p + i) & 0xff)
              p += 16
              val n = bits.sum
              if (p + n > end) throw Bail
              val vals = Array.tabulate(n)(i => b(p + i) & 0xff)
              p += n
              val h = new Huff(bits, vals)
              if (tc == 0) dcTab(th) = h else acTab(th) = h
            }
            pos = end
          case 0xdd => // DRI
            if (u16(pos) != 4) throw Bail
            dri = u16(pos + 2)
            pos += 4
          case 0xde => // DHP: hierarchical sequence header (Annex J)
            if (comps != null || hier) throw Bail // one DHP, before any frame
            val len = u16(pos)
            if (pos + len > b.length || len < 8 || pos + 8 > b.length) throw Bail
            precision = b(pos + 2) & 0xff
            if (precision != 8 && precision != 12) return None
            hierH = u16(pos + 3)
            hierW = u16(pos + 5)
            val nc = b(pos + 7) & 0xff
            if (hierW <= 0 || hierH <= 0 || (nc != 1 && nc != 3)) return None
            if (hierW.toLong * hierH * nc > maxPixels) return None
            hierIds = new Array[Int](nc)
            hierHv = new Array[Int](nc)
            var i = 0
            while (i < nc) {
              val o = pos + 8 + 3 * i
              if (o + 2 >= pos + len) throw Bail
              hierIds(i) = b(o) & 0xff
              hierHv(i) = b(o + 1) & 0xff // Tq byte is unspecified in DHP
              i += 1
            }
            hier = true
            refs = new Array[Array[Int]](nc)
            refCw = new Array[Int](nc)
            refCh = new Array[Int](nc)
            pos += len
          case 0xdf => // EXP: expand reference 1:2 before the next frame
            if (!hier || refs == null || refs(0) == null) throw Bail
            if (u16(pos) != 3 || pos + 2 >= b.length) throw Bail
            val ehv = b(pos + 2) & 0xff
            val eh = ehv >> 4; val ev = ehv & 0x0f
            if (eh > 1 || ev > 1 || (eh == 0 && ev == 0)) throw Bail
            pendingExp = ehv
            pos += 3
          case 0xc0 | 0xc1 | 0xc2 | 0xc5 => // SOF0/1, SOF2 (progressive), SOF5 (diff seq)
            progressive = marker == 0xc2
            differential = marker == 0xc5
            if (differential && !hier) return None // diff frame needs a DHP sequence
            if (hier && progressive) return None   // prog-in-hier: out of scope
            val len = u16(pos)
            if (pos + len > b.length || len < 8 || pos + 8 > b.length) throw Bail
            val framePrec = b(pos + 2) & 0xff
            // T.81 Table B.2: SOF0 is 8-bit only; extended sequential
            // (SOF1) and progressive (SOF2) also allow 12-bit
            if (framePrec != 8 && !(framePrec == 12 && marker != 0xc0)) return None
            if (hier && framePrec != precision) throw Bail // J: frames match DHP precision
            precision = framePrec
            height = u16(pos + 3)
            width = u16(pos + 5)
            val nc = b(pos + 7) & 0xff
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
            if (width.toLong * height * nc > maxPixels) return None
            // progressive pins a 64-int coefficient grid per component
            // (~4 bytes per SAMPLE of padded plane) for the whole frame
            // — hold it to the same budget as the output samples
            if (progressive && width.toLong * height * nc * 4 > maxPixels) return None
            comps = Array.tabulate(nc) { i =>
              val o = pos + 8 + 3 * i
              if (o + 2 >= pos + len) throw Bail
              val hv = b(o + 1) & 0xff
              val c = new Component(b(o) & 0xff, hv >> 4, hv & 0x0f, b(o + 2) & 0x0f)
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) throw Bail
              c
            }
            if (hier) {
              // every frame carries the DHP's component set, same order
              if (nc != hierIds.length) throw Bail
              var i = 0
              while (i < nc) {
                if (comps(i).id != hierIds(i) ||
                    ((comps(i).h << 4) | comps(i).v) != hierHv(i)) throw Bail
                i += 1
              }
              if (width > hierW || height > hierH) throw Bail
            }
            pos += len
          case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            return None // arithmetic / lossless / differential-progressive frames
          case 0xda => // SOS: scan header then entropy data
            if (comps == null) throw Bail
            val len = u16(pos)
            if (pos + 2 >= b.length) throw Bail
            val ns = b(pos + 2) & 0xff
            if (!progressive && ns != comps.length)
              return None // baseline partial scans: out of scope
            if (ns < 1 || ns > comps.length) throw Bail
            val scanComps = new Array[Component](ns)
            var p = pos + 3
            var i = 0
            while (i < ns) {
              if (p + 1 >= b.length) throw Bail // truncated scan header
              val cs = b(p) & 0xff
              val c = comps.find(_.id == cs).getOrElse(throw Bail)
              c.td = (b(p + 1) & 0xff) >> 4
              c.ta = b(p + 1) & 0x0f
              // table ids are 4-bit nibbles but only 0-3 exist (T.81
              // B.2.3) — unvalidated they index past the 4-slot arrays
              if (c.td > 3 || c.ta > 3) throw Bail
              scanComps(i) = c
              p += 2
              i += 1
            }
            if (hier) {
              // decode this frame's planes, then fold into the
              // per-component references (expand first if EXP pended)
              pos = decodeScanPlanes(b, pos + len, comps, width, height, quant,
                quantSeen, dcTab, acTab, dri, precision, differential)
              val hmax = comps.map(_.h).max
              val vmax = comps.map(_.v).max
              val maxVal = (1 << precision) - 1
              var i = 0
              while (i < comps.length) {
                val c = comps(i)
                val cw = (width * c.h + hmax - 1) / hmax
                val ch = (height * c.v + vmax - 1) / vmax
                if (pendingExp >= 0) {
                  val (ep, ew, eh2) = expandPlane(refs(i), refCw(i), refCh(i),
                    pendingExp >> 4, pendingExp & 0x0f)
                  // the expanded reference may overshoot an odd frame
                  // dim by one; crop to the frame's component size
                  if (ew < cw || eh2 < ch || ew > cw + 1 || eh2 > ch + 1) throw Bail
                  refs(i) = cropPlane(ep, ew, cw, ch)
                  refCw(i) = cw; refCh(i) = ch
                }
                if (differential) {
                  if (refs(i) == null || refCw(i) != cw || refCh(i) != ch) throw Bail
                  val r = refs(i)
                  var y = 0
                  while (y < ch) {
                    var x = 0
                    val ro = y * cw
                    val po = y * c.planeW
                    while (x < cw) {
                      val s = r(ro + x) + c.plane(po + x)
                      r(ro + x) = if (s < 0) 0 else if (s > maxVal) maxVal else s
                      x += 1
                    }
                    y += 1
                  }
                } else {
                  if (refs(i) != null) throw Bail // second full frame: corrupt
                  refs(i) = cropPlane(c.plane, c.planeW, cw, ch)
                  refCw(i) = cw; refCh(i) = ch
                }
                i += 1
              }
              pendingExp = -1
              sawScan = true
            } else if (!progressive) {
              return decodeScan(b, pos + len, comps, width, height, quant, quantSeen,
                dcTab, acTab, dri, precision)
            } else {
              // progressive: Ss/Se/AhAl select the band and bit plane
              if (p + 2 >= b.length) throw Bail
              val ss = b(p) & 0xff
              val se = b(p + 1) & 0xff
              val ah = (b(p + 2) & 0xff) >> 4
              val al = b(p + 2) & 0x0f
              if (ss > 63 || se > 63 || se < ss || ah > 13 || al > 13) throw Bail
              if (ss == 0 && se != 0) throw Bail          // DC scans are DC-only
              if (ss > 0 && ns != 1) throw Bail           // AC scans: one component
              sawScan = true
              pos = decodeProgressiveScan(b, pos + len, comps, scanComps,
                width, height, ss, se, ah, al, dcTab, acTab, dri)
            }
          case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside a scan
            throw Bail
          case _ => // APPn, COM, everything else: skip by length
            pos += u16(pos)
        }
      }
    }
    None // ran out of markers without a scan
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, comps: Array[Component],
                         width: Int, height: Int, quant: Array[Array[Int]],
                         quantSeen: Array[Boolean], dcTab: Array[Huff],
                         acTab: Array[Huff], dri: Int,
                         precision: Int = 8): Option[Decoded] = {
    decodeScanPlanes(b, scanStart, comps, width, height, quant, quantSeen,
      dcTab, acTab, dri, precision, differential = false)
    assemble(comps, width, height, comps.map(_.h).max, comps.map(_.v).max, precision)
  }

  /** The sequential-scan entropy core: fills every component's plane
    * (samples for non-differential frames, signed sample DIFFERENCES
    * for a hierarchical differential frame — T.81 J.1, coded without
    * DC prediction and without level shift) and returns the byte
    * position just past the scan's entropy data, so a hierarchical
    * marker loop can keep parsing the next frame. */
  private def decodeScanPlanes(b: Array[Byte], scanStart: Int, comps: Array[Component],
                               width: Int, height: Int, quant: Array[Array[Int]],
                               quantSeen: Array[Boolean], dcTab: Array[Huff],
                               acTab: Array[Huff], dri: Int,
                               precision: Int, differential: Boolean): Int = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      if (!quantSeen(c.tq) || dcTab(c.td) == null || acTab(c.ta) == null) throw Bail
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
    }
    val r = new BitReader(b, scanStart)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          r.restart(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // entropy-decode one block (T.81 F.2.2)
              java.util.Arrays.fill(coef, 0)
              val t = r.decodeHuff(dcTab(c.td))
              // DC diff categories (T.81 Table F.1): 0..11 at 8-bit,
              // 0..15 at 12-bit; differential frames span 2x the
              // sample range so each precision allows one more (12 /
              // 16 — the 12-bit differential row goes to SSSS=16).
              // SSSS=16 codes the single value 32768 with NO appended
              // bits (F.1.2.1.1, same convention as the lossless H.2
              // DECODE special case) — it is not a receive/extend pair
              val dcCap =
                if (precision == 12) { if (differential) 16 else 15 }
                else { if (differential) 12 else 11 }
              if (t > dcCap) throw Bail
              val dcv = if (t == 16) 32768 else extend(r.receive(t), t)
              // differential frames code each block's DC directly,
              // without prediction (F.1.1.5.2: PRED is zero)
              if (differential) c.pred = dcv else c.pred += dcv
              coef(0) = c.pred * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = r.decodeHuff(acTab(c.ta))
                val run = rs >> 4
                val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true        // EOB
                } else {
                  k += run
                  if (k > 63) throw Bail
                  // both the coefficient stream and the DQT payload are
                  // in zigzag order: quant index is k, plane index Zigzag(k)
                  coef(Zigzag(k)) = extend(r.receive(size), size) * q(k)
                  k += 1
                }
              }
              idct(coef, tmp, block, precision, differential)
              // place into the component plane
              val px0 = (mx * c.h + bx) * 8
              val py0 = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                val rowOff = (py0 + yy) * c.planeW + px0
                while (xx < 8) {
                  c.plane(rowOff + xx) = block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    r.alignedPos
  }

  /** Gray passthrough, or nearest-neighbor upsample + JFIF YCbCr->RGB —
    * shared by the baseline and progressive finish paths. 12-bit
    * frames transform at full precision (chroma offset 2048, clamp to
    * 4095) and emit the TOP 8 BITS (>> 4) — the standard display
    * mapping — so `Decoded`'s byte-sample schema is precision-
    * independent and downstream feature stages see one contract. */
  private def assemble(comps: Array[Component], width: Int, height: Int,
                       hmax: Int, vmax: Int, precision: Int = 8): Option[Decoded] = {
    val shift = precision - 8
    val half = 1 << (precision - 1)
    val maxVal = (1 << precision) - 1
    def clampP(v: Int): Int = if (v < 0) 0 else if (v > maxVal) maxVal else v
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = (c.plane(y * c.planeW + x) >> shift).toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(out, width, height, 1))
    } else {
      val out = new Array[Byte](width * height * 3)
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = cy.plane((y * cy.v / vmax) * cy.planeW + (x * cy.h / hmax))
          val bv = cb.plane((y * cb.v / vmax) * cb.planeW + (x * cb.h / hmax)) - half
          val rv = cr.plane((y * cr.v / vmax) * cr.planeW + (x * cr.h / hmax)) - half
          val o = (y * width + x) * 3
          out(o) = (clampP(math.round(yv + 1.402 * rv).toInt) >> shift).toByte
          out(o + 1) = (clampP(math.round(yv - 0.344136 * bv - 0.714136 * rv).toInt) >> shift).toByte
          out(o + 2) = (clampP(math.round(yv + 1.772 * bv).toInt) >> shift).toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(out, width, height, 3))
    }
  }

  /**
   * One progressive scan (T.81 G.1.2): entropy-decode into the
   * per-component zigzag coefficient accumulators and return the
   * position just past the scan's entropy data. Four scan kinds by
   * (Ss, Ah): DC first / DC refine (interleaved over the scan's
   * components or single-component), AC first with EOB runs / AC
   * refine with correction bits. Restart markers reset DC predictors
   * AND the EOB run.
   */
  private def decodeProgressiveScan(b: Array[Byte], scanStart: Int,
                                    comps: Array[Component], scanComps: Array[Component],
                                    width: Int, height: Int, ss: Int, se: Int,
                                    ah: Int, al: Int, dcTab: Array[Huff],
                                    acTab: Array[Huff], dri: Int): Int = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      if (c.coefs == null) {
        c.fullBw = mcusX * c.h
        c.fullBh = mcusY * c.v
        val cw = (width * c.h + hmax - 1) / hmax
        val ch = (height * c.v + vmax - 1) / vmax
        c.bw = (cw + 7) / 8
        c.bh = (ch + 7) / 8
        c.coefs = new Array[Int](c.fullBw * c.fullBh * 64)
      }
      c.pred = 0
    }
    scanComps.foreach { c =>
      if (ss == 0 && ah == 0 && dcTab(c.td) == null) throw Bail
      if (ss > 0 && acTab(c.ta) == null) throw Bail
    }
    val r = new BitReader(b, scanStart)
    var eobrun = 0
    var rstN = 0

    // ---- per-block decoders over the zigzag accumulator ----
    def dcFirst(c: Component, base: Int): Unit = {
      val t = r.decodeHuff(dcTab(c.td))
      if (t > 11) throw Bail
      c.pred += extend(r.receive(t), t)
      c.coefs(base) = c.pred << al
    }
    def dcRefine(c: Component, base: Int): Unit =
      c.coefs(base) |= r.nextBit() << al

    def acFirst(c: Component, base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = r.decodeHuff(acTab(c.ta))
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else { eobrun = (1 << run) - 1 + r.receive(run); return } // EOBn
        } else {
          k += run
          if (k > se) throw Bail
          c.coefs(base + k) = extend(r.receive(size), size) << al
          k += 1
        }
      }
    }

    // G.1.2.3: correction bit for an already-nonzero coefficient —
    // move |coef| up one step at bit `al` if the bit says so
    def correct(c: Component, idx: Int): Unit = {
      val bit = 1 << al
      if (r.nextBit() == 1 && (c.coefs(idx) & bit) == 0)
        c.coefs(idx) += (if (c.coefs(idx) >= 0) bit else -bit)
    }
    def acRefine(c: Component, base: Int): Unit = {
      val bit = 1 << al
      var k = ss
      if (eobrun > 0) {
        // EOB-covered block: only correction bits for nonzero history
        eobrun -= 1
        while (k <= se) { if (c.coefs(base + k) != 0) correct(c, base + k); k += 1 }
        return
      }
      while (k <= se) {
        val rs = r.decodeHuff(acTab(c.ta))
        val run = rs >> 4
        val size = rs & 0x0f
        var newVal = 0
        var zerosToPass = run
        if (size == 0) {
          if (run < 15) { // EOBn: refine the rest, run covers more blocks
            eobrun = (1 << run) - 1 + r.receive(run)
            while (k <= se) { if (c.coefs(base + k) != 0) correct(c, base + k); k += 1 }
            return
          }
          // ZRL: pass 16 zero-history positions, refining en route
        } else {
          if (size != 1) throw Bail // refinement can only create ±1<<al
          newVal = if (r.nextBit() == 1) bit else -bit
        }
        // advance: refine nonzero-history coefs, count down zero-history
        // ones; place the new value at the (run+1)-th zero position
        var placed = false
        while (k <= se && !placed) {
          val idx = base + k
          if (c.coefs(idx) != 0) correct(c, idx)
          else {
            if (zerosToPass == 0) {
              if (newVal != 0) c.coefs(idx) = newVal
              placed = true
            } else zerosToPass -= 1
          }
          k += 1
        }
        if (!placed && newVal != 0) throw Bail // ran past Se with a pending value
      }
    }

    def decodeBlock(c: Component, base: Int): Unit =
      if (ss == 0) { if (ah == 0) dcFirst(c, base) else dcRefine(c, base) }
      else { if (ah == 0) acFirst(c, base) else acRefine(c, base) }

    def atRestart(unit: Int): Unit =
      if (dri > 0 && unit > 0 && unit % dri == 0) {
        r.restart(0xd0 + rstN)
        rstN = (rstN + 1) % 8
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan: frame MCU order, h x v blocks per comp
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          atRestart(mcu)
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(c, ((my * c.v + by) * c.fullBw + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan: the component's own (bw x bh) block grid
      val c = scanComps(0)
      var unit = 0
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          atRestart(unit)
          decodeBlock(c, (by * c.fullBw + bx) * 64)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    r.alignedPos
  }

  /** Dequantize + IDCT every accumulated block, then assemble planes —
    * the progressive finish at EOI. */
  private def finishProgressive(comps: Array[Component], width: Int, height: Int,
                                quant: Array[Array[Int]],
                                quantSeen: Array[Boolean],
                                precision: Int = 8): Option[Decoded] = {
    if (comps == null || comps.exists(_.coefs == null)) return None
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val block = new Array[Int](64)
    comps.foreach { c =>
      if (!quantSeen(c.tq)) throw Bail
      val q = quant(c.tq)
      c.planeW = c.fullBw * 8
      c.planeH = c.fullBh * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var by = 0
      while (by < c.fullBh) {
        var bx = 0
        while (bx < c.fullBw) {
          val base = (by * c.fullBw + bx) * 64
          var k = 0
          while (k < 64) { coef(Zigzag(k)) = c.coefs(base + k) * q(k); k += 1 }
          idct(coef, tmp, block, precision)
          val px0 = bx * 8
          val py0 = by * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            val rowOff = (py0 + yy) * c.planeW + px0
            while (xx < 8) { c.plane(rowOff + xx) = block(yy * 8 + xx); xx += 1 }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    assemble(comps, width, height, hmax, vmax, precision)
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Crop a padded (MCU-grid) plane to the component's true size. */
  private def cropPlane(plane: Array[Int], planeW: Int, cw: Int, ch: Int): Array[Int] = {
    val out = new Array[Int](cw * ch)
    var y = 0
    while (y < ch) {
      System.arraycopy(plane, y * planeW, out, y * cw, cw)
      y += 1
    }
    out
  }

  /** 1:2 reference expansion, T.81 J.1.1.2: even outputs copy the
    * input, odd outputs interpolate (a + b + 1) >> 1 with the trailing
    * edge replicated — horizontal then vertical when both are set. */
  private def expandPlane(p: Array[Int], w: Int, h: Int,
                          eh: Int, ev: Int): (Array[Int], Int, Int) = {
    var cur = p; var cw = w; var ch = h
    if (eh == 1) {
      val out = new Array[Int](2 * cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        val in0 = y * cw
        val o0 = y * 2 * cw
        while (x < cw) {
          val a = cur(in0 + x)
          val b = if (x + 1 < cw) cur(in0 + x + 1) else a
          out(o0 + 2 * x) = a
          out(o0 + 2 * x + 1) = (a + b + 1) >> 1
          x += 1
        }
        y += 1
      }
      cur = out; cw *= 2
    }
    if (ev == 1) {
      val out = new Array[Int](cw * 2 * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        val in0 = y * cw
        val in1 = if (y + 1 < ch) (y + 1) * cw else y * cw
        val o0 = 2 * y * cw
        val o1 = (2 * y + 1) * cw
        while (x < cw) {
          val a = cur(in0 + x)
          out(o0 + x) = a
          out(o1 + x) = (a + cur(in1 + x) + 1) >> 1
          x += 1
        }
        y += 1
      }
      cur = out; ch *= 2
    }
    (cur, cw, ch)
  }

  /** Separable IDCT + level shift + clamp: rows then columns through
    * the cosine basis, matching the direct T.81 A.3.3 double sum.
    * The level shift and clamp range follow the frame's sample
    * precision (A.3.1: 2^(P−1) and [0, 2^P − 1]). Differential
    * (hierarchical) blocks code DIFFERENCES: no level shift, clamped
    * symmetric to ±(2^P − 1) before adding to the reference. */
  private def idct(coef: Array[Int], tmp: Array[Double], out: Array[Int],
                   precision: Int = 8, differential: Boolean = false): Unit = {
    // rows: G(x, v) = sum_u ct(x)(u) F(u, v)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cos(x)(u) * coef(u * 8 + v); u += 1 }
        tmp(x * 8 + v) = s
        x += 1
      }
      v += 1
    }
    // cols: P(x, y) = sum_v ct(y)(v) G(x, v), then +2^(P-1) and clamp
    val half = if (differential) 0.0 else (1 << (precision - 1)).toDouble
    val maxVal = (1 << precision) - 1
    val minVal = if (differential) -maxVal else 0
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += Cos(y)(vv) * tmp(x * 8 + vv); vv += 1 }
        val p = math.round(s + half).toInt
        out(x * 8 + y) = if (p < minVal) minVal else if (p > maxVal) maxVal else p
        y += 1
      }
      x += 1
    }
  }

  // ------------------------------------------------------------------
  // fixture encoder (the encodePngGray counterpart)
  // ------------------------------------------------------------------

  // encoder Huffman tables: 12 DC categories at 4 bits, the 162
  // standard AC (run,size) symbols at 8 bits — canonical, valid (the
  // all-ones code stays unused in both), trivially derivable
  private val EncDcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcVals = Array.tabulate(12)(identity)
  private val EncAcBits = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAcVals: Array[Int] =
    Array(0x00, 0xf0) ++ (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)

  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.toMap
  }
  private val EncDcCodes = canonicalCodes(EncDcBits, EncDcVals)
  private val EncAcCodes = canonicalCodes(EncAcBits, EncAcVals)

  // 12-bit variants (T.81 Table F.1/F.2 extended ranges): DC categories
  // 0..15 as 16 codes at 5 bits, AC (run,size) for sizes 1..14 plus
  // EOB/ZRL as 226 codes at 8 bits — canonical, all-ones unused in both
  private val EncDc12Bits = Array(0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDc12Vals = Array.tabulate(16)(identity)
  private val EncAc12Bits = Array(0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAc12Vals: Array[Int] =
    Array(0x00, 0xf0) ++ (for (run <- 0 to 15; size <- 1 to 14) yield (run << 4) | size)
  private val EncDc12Codes = canonicalCodes(EncDc12Bits, EncDc12Vals)
  private val EncAc12Codes = canonicalCodes(EncAc12Bits, EncAc12Vals)

  // 12-bit DIFFERENTIAL DC table: categories 0..16 (Table F.1's
  // doubled differential range — SSSS=16 is the no-appended-bits
  // DIFF=32768 special case) as 17 codes at 5 bits
  private val EncDcHierBits = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcHierVals = Array.tabulate(17)(identity)
  private val EncDcHierCodes = canonicalCodes(EncDcHierBits, EncDcHierVals)

  // progressive AC table: the baseline symbols PLUS the EOBn run-length
  // symbols 0x10..0xE0 (r<<4, size 0) Annex G scans use — 176 codes,
  // still all at 8 bits (canonical, all-ones unused)
  private val ProgAcBits = Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ProgAcVals: Array[Int] =
    Array(0x00, 0xf0) ++ (1 to 14).map(_ << 4) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)
  private val ProgAcCodes = canonicalCodes(ProgAcBits, ProgAcVals)

  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00) // byte stuffing
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { put(0xff, 8 - cnt); () } // pad with 1s
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  private def putCoded(w: BitWriter, codes: Map[Int, (Int, Int)], sym: Int, v: Int, size: Int): Unit = {
    val (code, len) = codes(sym)
    w.put(code, len)
    if (size > 0) w.put(if (v < 0) v + (1 << size) - 1 else v, size)
  }

  private def writeBlock(w: BitWriter, zz: Array[Int], pred: Int,
                         dcCodes: Map[Int, (Int, Int)] = EncDcCodes,
                         acCodes: Map[Int, (Int, Int)] = EncAcCodes,
                         maxAcSize: Int = 10): Int = {
    val diff = zz(0) - pred
    // DIFF=32768 (12-bit differential only) is SSSS=16 with no
    // appended bits (F.1.2.1.1); category() maps it to 16 naturally
    val t = category(diff)
    if (t == 16) putCoded(w, dcCodes, 16, 0, 0)
    else putCoded(w, dcCodes, t, diff, t)
    var run = 0
    var k = 1
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { putCoded(w, acCodes, 0xf0, 0, 0); run -= 16 }
        val size = category(zz(k))
        require(size <= maxAcSize, s"encoder AC table covers sizes 1..$maxAcSize")
        putCoded(w, acCodes, (run << 4) | size, zz(k), size)
        run = 0
      }
      k += 1
    }
    if (run > 0) putCoded(w, acCodes, 0x00, 0, 0) // EOB
    zz(0)
  }

  private def writeSegments(bos: java.io.ByteArrayOutputStream, quantZz: Array[Int],
                            width: Int, height: Int,
                            comps: Seq[(Int, Int, Int)], dri: Int = 0,
                            sofMarker: Int = 0xc0, precision: Int = 8): Unit = {
    def seg(marker: Int, payload: Array[Int]): Unit = {
      bos.write(0xff); bos.write(marker)
      val len = payload.length + 2
      bos.write((len >> 8) & 0xff); bos.write(len & 0xff)
      payload.foreach(bos.write)
    }
    bos.write(0xff); bos.write(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ quantZz) // DQT table 0, 8-bit
    seg(sofMarker, Array(precision, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, comps.length) ++
      comps.flatMap { case (id, h, v) => Seq(id, (h << 4) | v, 0) })
    if (precision == 12)
      seg(0xc4, Array(0x00) ++ EncDc12Bits ++ EncDc12Vals ++
        Array(0x10) ++ EncAc12Bits ++ EncAc12Vals)
    else
      seg(0xc4, Array(0x00) ++ EncDcBits ++ EncDcVals ++
        Array(0x10) ++ EncAcBits ++ EncAcVals)
    if (dri > 0) seg(0xdd, Array((dri >> 8) & 0xff, dri & 0xff))
    seg(0xda, Array(comps.length) ++ comps.flatMap { case (id, _, _) => Seq(id, 0x00) } ++
      Array(0, 63, 0))
  }

  /**
   * Grayscale baseline encoder over QUANTIZED coefficient blocks in
   * zigzag order (raster block order, `blocksW * blocksH` of them, 64
   * coefficients each). One quant table (zigzag too) serves the single
   * component. The driver fixture passes DC-only blocks; tests pass
   * arbitrary AC patterns to pin the decoder against the reference
   * IDCT.
   */
  private[graft] def encodeGrayBlocks(blocks: Array[Array[Int]], blocksW: Int, blocksH: Int,
                                      quantZz: Array[Int], dri: Int = 0): Array[Byte] = {
    require(blocks.length == blocksW * blocksH && blocks.forall(_.length == 64))
    require(quantZz.length == 64 && quantZz.forall(q => q >= 1 && q <= 255))
    val bos = new java.io.ByteArrayOutputStream()
    writeSegments(bos, quantZz, blocksW * 8, blocksH * 8, Seq((1, 1, 1)), dri)
    val w = new BitWriter(bos)
    var pred = 0
    var rstN = 0
    var i = 0
    while (i < blocks.length) {
      if (dri > 0 && i > 0 && i % dri == 0) { // gray 1x1: one block per MCU
        w.flush()
        bos.write(0xff); bos.write(0xd0 + rstN)
        rstN = (rstN + 1) % 8
        pred = 0
      }
      pred = writeBlock(w, blocks(i), pred)
      i += 1
    }
    w.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /**
   * 12-bit grayscale EXTENDED SEQUENTIAL encoder (SOF1, P=12) over
   * quantized zigzag blocks — the [[encodeGrayBlocks]] counterpart for
   * the 12-bit decode path. Same flat-block exactness contract at the
   * wider range: a flat block of sample v has DC coefficient
   * 8·(v−2048), so DC quant 8 round-trips v exactly and the decoder
   * emits v >> 4 (the top-8-bits display mapping `assemble` documents).
   */
  private[graft] def encodeGray12Blocks(blocks: Array[Array[Int]], blocksW: Int,
                                        blocksH: Int, quantZz: Array[Int],
                                        dri: Int = 0): Array[Byte] = {
    require(blocks.length == blocksW * blocksH && blocks.forall(_.length == 64))
    require(quantZz.length == 64 && quantZz.forall(q => q >= 1 && q <= 255))
    val bos = new java.io.ByteArrayOutputStream()
    writeSegments(bos, quantZz, blocksW * 8, blocksH * 8, Seq((1, 1, 1)), dri,
      sofMarker = 0xc1, precision = 12)
    val w = new BitWriter(bos)
    var pred = 0
    var rstN = 0
    var i = 0
    while (i < blocks.length) {
      if (dri > 0 && i > 0 && i % dri == 0) {
        w.flush()
        bos.write(0xff); bos.write(0xd0 + rstN)
        rstN = (rstN + 1) % 8
        pred = 0
      }
      pred = writeBlock(w, blocks(i), pred, EncDc12Codes, EncAc12Codes, maxAcSize = 14)
      i += 1
    }
    w.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /**
   * Grayscale HIERARCHICAL encoder (Annex J) for fixture synthesis:
   * DHP at full resolution, a half-resolution non-differential SOF0
   * frame over `loBlocks` (loBw x loBh quantized zigzag blocks), EXP
   * (1:2 both axes), then a full-resolution SOF5 DIFFERENTIAL frame
   * over `diffBlocks` (2loBw x 2loBh blocks coding the quantized DCT
   * of target − upsampled reference; DC without prediction, no level
   * shift). Flat-block exactness carries over: with DC quant 8, a flat
   * lo block v1 and flat diff block d decode to exactly v1 + d.
   */
  private[graft] def encodeGrayHier(loBlocks: Array[Array[Int]], loBw: Int, loBh: Int,
                                    diffBlocks: Array[Array[Int]],
                                    quantZz: Array[Int],
                                    precision: Int = 8): Array[Byte] = {
    require(loBlocks.length == loBw * loBh && loBlocks.forall(_.length == 64))
    require(diffBlocks.length == 4 * loBw * loBh && diffBlocks.forall(_.length == 64))
    require(quantZz.length == 64 && quantZz.forall(q => q >= 1 && q <= 255))
    require(precision == 8 || precision == 12)
    val bos = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      bos.write(0xff); bos.write(marker)
      val len = payload.length + 2
      bos.write((len >> 8) & 0xff); bos.write(len & 0xff)
      payload.foreach(bos.write)
    }
    val loW = loBw * 8; val loH = loBh * 8
    val fullW = 2 * loW; val fullH = 2 * loH
    // at 12-bit the non-differential frame must be SOF1 (Table B.2:
    // SOF0 is 8-bit only) and the DC table spans categories 0..16
    // (the differential frame's doubled range, incl. the SSSS=16
    // DIFF=32768 no-appended-bits code)
    val p12 = precision == 12
    val dcT = if (p12) EncDcHierCodes else EncDcCodes
    val acT = if (p12) EncAc12Codes else EncAcCodes
    val maxAc = if (p12) 14 else 10
    bos.write(0xff); bos.write(0xd8) // SOI
    seg(0xde, Array(precision, (fullH >> 8) & 0xff, fullH & 0xff, // DHP: full dims
      (fullW >> 8) & 0xff, fullW & 0xff, 1, 1, 0x11, 0))
    seg(0xdb, Array(0x00) ++ quantZz)
    if (p12)
      seg(0xc4, Array(0x00) ++ EncDcHierBits ++ EncDcHierVals ++
        Array(0x10) ++ EncAc12Bits ++ EncAc12Vals)
    else
      seg(0xc4, Array(0x00) ++ EncDcBits ++ EncDcVals ++
        Array(0x10) ++ EncAcBits ++ EncAcVals)
    // frame 1: non-differential half-resolution SOF0 (SOF1 at 12-bit)
    seg(if (p12) 0xc1 else 0xc0, Array(precision, (loH >> 8) & 0xff, loH & 0xff,
      (loW >> 8) & 0xff, loW & 0xff, 1, 1, 0x11, 0))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val w1 = new BitWriter(bos)
    var pred = 0
    loBlocks.foreach { zz => pred = writeBlock(w1, zz, pred, dcT, acT, maxAc) }
    w1.flush()
    // EXP 1:2 both axes, then frame 2: differential full-resolution SOF5
    seg(0xdf, Array(0x11))
    seg(0xc5, Array(precision, (fullH >> 8) & 0xff, fullH & 0xff,
      (fullW >> 8) & 0xff, fullW & 0xff, 1, 1, 0x11, 0))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val w2 = new BitWriter(bos)
    diffBlocks.foreach { zz => writeBlock(w2, zz, 0, dcT, acT, maxAc) } // DC coded without prediction
    w2.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /**
   * Grayscale PROGRESSIVE encoder over the same quantized zigzag
   * blocks as [[encodeGrayBlocks]] — six scans exercising every
   * progressive decode path: DC first at Al=`al`, two AC-first bands
   * split at `split` (with packed EOB runs), then DC refinement and
   * two AC refinement bands down to Al=0 (correction bits, newly
   * significant ±1 symbols, refinement ZRL). `al` must be 1 (one
   * refinement level) — enough to cover G.1.2.3 while keeping the
   * stream round-trip EXACT: after all scans every coefficient equals
   * its input, so decoded pixels match the baseline encoding of the
   * same blocks bit-for-bit (the spec pins that equivalence).
   */
  private[graft] def encodeGrayProgressive(blocks: Array[Array[Int]], blocksW: Int,
                                           blocksH: Int, quantZz: Array[Int],
                                           split: Int = 5): Array[Byte] = {
    require(blocks.length == blocksW * blocksH && blocks.forall(_.length == 64))
    require(quantZz.length == 64 && quantZz.forall(q => q >= 1 && q <= 255))
    require(split >= 1 && split <= 62)
    val al = 1
    val bos = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      bos.write(0xff); bos.write(marker)
      val len = payload.length + 2
      bos.write((len >> 8) & 0xff); bos.write(len & 0xff)
      payload.foreach(bos.write)
    }
    bos.write(0xff); bos.write(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ quantZz)
    seg(0xc2, Array(8, ((blocksH * 8) >> 8) & 0xff, (blocksH * 8) & 0xff,
      ((blocksW * 8) >> 8) & 0xff, (blocksW * 8) & 0xff, 1, 1, 0x11, 0))
    seg(0xc4, Array(0x00) ++ EncDcBits ++ EncDcVals ++
      Array(0x10) ++ ProgAcBits ++ ProgAcVals)
    def sos(ss: Int, se: Int, ah: Int, a: Int): Unit =
      seg(0xda, Array(1, 1, 0x00, ss, se, (ah << 4) | a))

    // scan 1: DC first at Al=al — diffs of the point-transformed DC
    sos(0, 0, 0, al)
    locally {
      val w = new BitWriter(bos)
      var pred = 0
      blocks.foreach { zz =>
        val v = zz(0) >> al // arithmetic shift: the DC point transform
        val diff = v - pred
        pred = v
        val t = category(diff)
        putCoded(w, EncDcCodes, t, diff, t)
      }
      w.flush()
    }

    // AC first scans: sign-magnitude point transform, packed EOB runs
    def acFirstScan(ss: Int, se: Int): Unit = {
      sos(ss, se, 0, al)
      val w = new BitWriter(bos)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var rbits = 0
        while ((2 << rbits) <= eobrun) rbits += 1 // largest r with 2^r <= eobrun
        putCoded(w, ProgAcCodes, rbits << 4, 0, 0)
        if (rbits > 0) w.put(eobrun - (1 << rbits), rbits)
        eobrun = 0
      }
      blocks.foreach { zz =>
        val vals = (ss to se).map(k => {
          val m = math.abs(zz(k)) >> al
          if (zz(k) < 0) -m else m
        })
        if (vals.forall(_ == 0)) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          var run = 0
          var lastNonzero = ss - 1
          (ss to se).foreach(k => if (vals(k - ss) != 0) lastNonzero = k)
          var k = ss
          while (k <= lastNonzero) {
            val v = vals(k - ss)
            if (v == 0) run += 1
            else {
              while (run > 15) { putCoded(w, ProgAcCodes, 0xf0, 0, 0); run -= 16 }
              val size = category(v)
              require(size <= 10)
              putCoded(w, ProgAcCodes, (run << 4) | size, v, size)
              run = 0
            }
            k += 1
          }
          if (lastNonzero < se) eobrun = 1 // tail of zeros: starts an EOB run
        }
      }
      flushEob()
      w.flush()
    }
    acFirstScan(1, split)
    acFirstScan(split + 1, 63)

    // scan 4: DC refinement — bit `al-1` of every DC, frame block order
    sos(0, 0, al, al - 1)
    locally {
      val w = new BitWriter(bos)
      blocks.foreach(zz => w.put((zz(0) >> (al - 1)) & 1, 1))
      w.flush()
    }

    // AC refinement scans (G.1.2.3 inverse): correction bits for
    // history coefficients, (run,1)+sign for newly significant ones
    def acRefineScan(ss: Int, se: Int): Unit = {
      sos(ss, se, al, al - 1)
      val w = new BitWriter(bos)
      val albit = al - 1
      var eobrun = 0
      val eobPending = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = if (eobrun > 0) {
        var rbits = 0
        while ((2 << rbits) <= eobrun) rbits += 1
        putCoded(w, ProgAcCodes, rbits << 4, 0, 0)
        if (rbits > 0) w.put(eobrun - (1 << rbits), rbits)
        eobPending.foreach(bit => w.put(bit, 1))
        eobPending.clear()
        eobrun = 0
      }
      blocks.foreach { zz =>
        def history(k: Int) = (math.abs(zz(k)) >> al) != 0
        def newlySig(k: Int) = !history(k) && ((math.abs(zz(k)) >> albit) & 1) == 1
        val anyNew = (ss to se).exists(newlySig)
        def corrBit(k: Int): Int = (math.abs(zz(k)) >> albit) & 1
        if (!anyNew) {
          // whole block rides the EOB run; its history correction bits
          // queue up behind the (single) EOBn symbol that ends the run
          eobrun += 1
          (ss to se).foreach(k => if (history(k)) eobPending += corrBit(k))
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          // mirror the decoder's advance EXACTLY: after each symbol it
          // walks positions in order, reading a correction bit at every
          // nonzero-history coefficient it passes and counting down
          // zero-history ones — so bits must interleave by POSITION,
          // bounded by each symbol's reach, not batch per gap
          var k = ss
          val newPositions = (ss to se).filter(newlySig)
          newPositions.foreach { p =>
            var zeros = (k until p).count(j => !history(j))
            while (zeros > 15) {
              putCoded(w, ProgAcCodes, 0xf0, 0, 0) // refinement ZRL
              var z = 0
              while (z < 16) { // decoder passes exactly 16 zero-history slots
                if (history(k)) w.put(corrBit(k), 1) else z += 1
                k += 1
              }
              zeros -= 16
            }
            putCoded(w, ProgAcCodes, (zeros << 4) | 1, 0, 0)
            w.put(if (zz(p) > 0) 1 else 0, 1)
            while (k < p) { if (history(k)) w.put(corrBit(k), 1); k += 1 }
            k = p + 1 // the new value lands at p; decoder advances past it
          }
          // tail after the last new value: remaining history bits ride
          // the next EOBn symbol (read in THIS block's loop)
          if (k <= se) {
            eobrun = 1
            (k to se).foreach(j => if (history(j)) eobPending += corrBit(j))
          }
        }
      }
      flushEob()
      w.flush()
    }
    acRefineScan(1, split)
    acRefineScan(split + 1, 63)

    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /**
   * Flat-color 3-component baseline encoder: every block of every
   * component is DC-only at the component's flat value, with Y sampled
   * `(h, v)` against 1x1 chroma — (1,1) = 4:4:4, (2,2) = 4:2:0, (2,1)
   * = 4:2:2. With the all-8s quant table the flat round-trip is exact,
   * so YCbCr->RGB expectations are hand-computable constants.
   */
  private[graft] def encodeFlatColor(yVal: Int, cbVal: Int, crVal: Int,
                                     mcusX: Int, mcusY: Int,
                                     h: Int, v: Int): Array[Byte] = {
    val quant = Array.fill(64)(8)
    val bos = new java.io.ByteArrayOutputStream()
    writeSegments(bos, quant, mcusX * 8 * h, mcusY * 8 * v,
      Seq((1, h, v), (2, 1, 1), (3, 1, 1)))
    val w = new BitWriter(bos)
    val dc = Array(yVal - 128, cbVal - 128, crVal - 128) // quant 8 divides 8*(v-128)
    val pred = Array(0, 0, 0)
    val zz = new Array[Int](64)
    var m = 0
    while (m < mcusX * mcusY) {
      var ci = 0
      while (ci < 3) {
        val nBlocks = if (ci == 0) h * v else 1
        var bIdx = 0
        while (bIdx < nBlocks) {
          java.util.Arrays.fill(zz, 0)
          zz(0) = dc(ci)
          pred(ci) = writeBlock(w, zz, pred(ci))
          bIdx += 1
        }
        ci += 1
      }
      m += 1
    }
    w.flush()
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }
}

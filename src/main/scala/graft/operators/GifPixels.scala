package graft.operators

/**
 * REAL GIF pixel decode, pure JVM — the fourth container format whose
 * pixel stage needs no codec library: GIF's image data is LZW
 * (GIF87a/89a Appendix F), a dictionary coder implementable exactly
 * from the public spec, and it is LOSSLESS — so like PNG (and unlike
 * JPEG's flat-block-only exactness) ANY planted index stream is
 * SQL-predictable for the driver oracle.
 *
 * Scope mirrors the sibling decoders' honest-fallback contract:
 * first frame (or all frames) of a GIF87a/GIF89a stream, any palette
 * size, local or global color table, extension blocks skipped by
 * sub-block walking, and — since round 8 — INTERLACED frames
 * (Appendix E four-pass row interleave: rows 0,8,16…; 4,12…; 2,6…;
 * 1,3…), de-interleaved after LZW by one row-permutation copy, the
 * same structure as PNG's Adam7 support in the sibling decoder.
 * Returns the frame's PALETTE INDEX bytes — the same treatment
 * [[MultimodalOps.decodePngPixels]] gives color-type-3 PNGs ("palette
 * images return their index bytes; the per-byte featurizer treats
 * them as the sample stream"). Truncated sub-blocks, LZW desync (a
 * code beyond the next free slot), or frame dims past `maxPixels`
 * refuse with None.
 *
 * The LZW decoder implements the deferred-code-size rule (grow AFTER
 * the slot that fills the current width, cap at 12 bits, stop growing
 * on a full table until CLEAR) and the KwKwK case (code == next free
 * slot -> prev + first(prev)). The fixture encoder is a real greedy
 * LZW compressor sharing only the spec with the decoder, so
 * property-style round-trips exercise genuine dictionary growth, not
 * an identity path.
 */
object GifPixels {

  private object Bail extends Exception { override def fillInStackTrace(): Throwable = this }

  private def u16le(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  /** First frame's index stream (the [[MultimodalOps.pixelFeatures]]
    * path; parsing stops at the first image, trailing bytes untouched). */
  def decodeGifPixels(b: Array[Byte], maxPixels: Int = 1 << 26): Option[Array[Byte]] =
    try walk(b, maxPixels, maxFrames = 1).map(_.head) catch { case Bail => None }

  /** EVERY frame's index stream — GIF89a allows any number of image
    * descriptors (animations), each independently LZW-coded, so the
    * [[MultimodalOps.videoFrameFeatures]] chain walks them like AVI
    * movi chunks. Frames are returned as their OWN index streams (a
    * frame may cover a sub-region of the logical screen; per-frame
    * stats need no composition, and disposal/transparency composition
    * is deliberately out of scope). */
  def decodeGifFrames(b: Array[Byte], maxPixels: Int = 1 << 26,
                      maxFrames: Int = 4096): Option[Array[Array[Byte]]] =
    try walk(b, maxPixels, maxFrames) catch { case Bail => None }

  private def walk(b: Array[Byte], maxPixels: Int, maxFrames: Int): Option[Array[Array[Byte]]] = {
    if (b == null || b.length < 13) return None
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
    val gctFlag = (b(10) & 0x80) != 0
    val gctSize = 3 * (1 << ((b(10) & 0x07) + 1))
    var pos = 13
    if (gctFlag) pos += gctSize // palette bytes — indices are the output
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var total = 0L
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => // trailer
          return if (frames.isEmpty) None else Some(frames.toArray)
        case 0x21 => // extension: label then sub-blocks
          pos += 2
          pos = skipSubBlocks(b, pos)
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) throw Bail
          val w = u16le(b, pos + 5)
          val h = u16le(b, pos + 7)
          val packed = b(pos + 9) & 0xff
          val interlaced = (packed & 0x40) != 0
          total += w.toLong * h
          if (w <= 0 || h <= 0 || total > maxPixels) return None
          pos += 10
          if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 0x07) + 1)) // LCT
          if (pos >= b.length) throw Bail
          val minCode = b(pos) & 0xff
          if (minCode < 1 || minCode > 11) throw Bail
          pos += 1
          // gather the LZW payload from the length-prefixed sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= b.length) throw Bail
            val len = b(pos) & 0xff
            pos += 1
            if (len == 0) done = true
            else {
              if (pos + len > b.length) throw Bail
              data.write(b, pos, len)
              pos += len
            }
          }
          lzwDecode(data.toByteArray, minCode, w * h) match {
            case Some(px0) =>
              val px = if (interlaced) deinterlace(px0, w, h) else px0
              if (frames.length >= maxFrames) return None // refuse, never truncate silently
              frames += px
              // single-frame callers (decodeGifPixels) stop at the
              // first image without validating the rest of the stream
              if (maxFrames == 1) return Some(frames.toArray)
            case None => return None
          }
        case _ => throw Bail // unknown block type: desynced
      }
    }
    None // ran off the end without a trailer
  }

  /** Appendix-E interlace order: the row at stream position k belongs
    * to target row rowsInPassOrder(k). Pure permutation copy. */
  private[graft] def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { rows(k) = r; k += 1; r += step }
    }
    rows
  }

  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val order = interlaceRows(h)
    val out = new Array[Byte](px.length)
    var k = 0
    while (k < h) {
      System.arraycopy(px, k * w, out, order(k) * w, w)
      k += 1
    }
    out
  }

  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var p = start
    while (true) {
      if (p >= b.length) throw Bail
      val len = b(p) & 0xff
      p += 1
      if (len == 0) return p
      if (p + len > b.length) throw Bail
      p += len
    }
    p
  }

  /** Appendix-F LZW over a packed little-endian bit stream. */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var nextSlot = end + 1
    var codeSize = minCode + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var bitPos = 0
    def nextCode(): Int = {
      if ((bitPos + codeSize + 7) / 8 > data.length) throw Bail
      var v = 0
      var i = 0
      while (i < codeSize) {
        val bit = (data((bitPos + i) >> 3) >> ((bitPos + i) & 7)) & 1
        v |= bit << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    def expand(code: Int): Int = { // writes the code's string, returns its first byte
      var c = code
      var len = 0
      while (c >= clear) { // walk to the root counting length
        len += 1
        c = prefix(c)
      }
      val first = c
      if (outPos + len + 1 > out.length) throw Bail // more pixels than the frame holds
      var w = outPos + len
      c = code
      while (c >= clear) {
        out(w) = append(c)
        w -= 1
        c = prefix(c)
      }
      out(w) = c.toByte
      outPos += len + 1
      first
    }
    var prev = -1
    var prevFirst = 0
    var finished = false
    while (!finished) {
      val code = nextCode()
      if (code == clear) {
        nextSlot = end + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == end) {
        finished = true
      } else if (prev < 0) {
        if (code >= clear) throw Bail // first code must be a root
        prevFirst = expand(code)
        prev = code
      } else {
        val first =
          if (code < nextSlot) { // clear/end already handled above
            expand(code)
          } else if (code == nextSlot) {
            // KwKwK: prev + first(prev), emitted before it exists
            if (outPos >= out.length) throw Bail
            val f = prevFirst
            // temporarily register so expand() can walk it
            prefix(nextSlot) = prev
            append(nextSlot) = f.toByte
            expand(code)
          } else throw Bail // beyond next slot: corrupt stream
        if (nextSlot < 4096) {
          prefix(nextSlot) = prev
          append(nextSlot) = first.toByte
          nextSlot += 1
          if (nextSlot == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        prevFirst = first
      }
      if (outPos == nPixels && !finished) {
        // spec requires an END code; tolerate its absence only at the
        // exact pixel count (some real encoders omit it)
        finished = true
      }
    }
    if (outPos != nPixels) throw Bail // short stream: corrupt
    Some(out)
  }

  // ------------------------------------------------------------------
  // fixture encoder
  // ------------------------------------------------------------------

  /** Real greedy LZW compressor (fixture synthesis): dictionary of
    * (prefix, byte) strings, CLEAR emitted at start and on a full
    * table, code width growing exactly where the decoder expects. */
  private[graft] def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val bos = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) {
        bos.write((acc & 0xff).toInt)
        acc >>= 8
        accBits -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer]() // (prefixCode << 8 | byte) -> code
    var nextSlot = end + 1
    put(clear)
    var cur = -1
    var i = 0
    while (i < indices.length) {
      val px = indices(i) & 0xff
      if (px >= clear) throw new IllegalArgumentException(s"index $px needs minCode > $minCode")
      if (cur < 0) cur = px
      else {
        val key = (cur.toLong << 8) | px
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          if (nextSlot < 4096) {
            dict.put(key, nextSlot)
            nextSlot += 1
            if (nextSlot == (1 << codeSize) + 1 && codeSize < 12) {
              // encoder grows one step EARLIER than a naive reading:
              // the decoder has already registered this slot when it
              // reads the next code, so the width must match its view
              codeSize += 1
            }
          } else {
            put(clear)
            dict.clear()
            nextSlot = end + 1
            codeSize = minCode + 1
          }
          cur = px
        }
      }
      i += 1
    }
    if (cur >= 0) put(cur)
    put(end)
    if (accBits > 0) bos.write((acc & 0xff).toInt)
    bos.toByteArray
  }

  /**
   * Minimal REAL GIF writer (the encodePngGray counterpart): GIF89a
   * header, a 256-entry grayscale global color table (palette(i) =
   * (i,i,i) so an index IS its luminance), one non-interlaced frame
   * LZW-compressed by [[lzwEncode]], sub-blocked at 255 bytes.
   */
  private[graft] def encodeGifGray(indices: Array[Byte], width: Int, height: Int): Array[Byte] =
    encodeGifGrayFrames(Array(indices), width, height)

  /** Interlaced single-frame variant: rows permuted into Appendix-E
    * stream order BEFORE LZW and the interlace bit set — the decoder
    * must undo exactly this permutation for the round-trip to hold. */
  private[graft] def encodeGifGrayInterlaced(indices: Array[Byte],
                                             width: Int, height: Int): Array[Byte] =
    encodeGifGrayFrames(Array(indices), width, height, interlaced = true)

  /** Multi-frame (animated) variant: one image descriptor + LZW stream
    * per frame, all full-screen, shared gray GCT. */
  private[graft] def encodeGifGrayFrames(frames: Array[Array[Byte]],
                                         width: Int, height: Int,
                                         interlaced: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height),
      "each frame must be width*height indices")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    bos.write(0xf7) // GCT present, 8 bits/pixel, 256 entries
    bos.write(0); bos.write(0) // background, aspect
    var i = 0
    while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 } // gray GCT
    frames.foreach { indices0 =>
      val indices =
        if (!interlaced) indices0
        else {
          val order = interlaceRows(height)
          val permuted = new Array[Byte](indices0.length)
          var k = 0
          while (k < height) {
            System.arraycopy(indices0, order(k) * width, permuted, k * width, width)
            k += 1
          }
          permuted
        }
      bos.write(0x2c) // image descriptor
      le16(0); le16(0); le16(width); le16(height)
      bos.write(if (interlaced) 0x40 else 0x00) // no LCT; interlace bit
      bos.write(8)    // LZW min code size
      val lzw = lzwEncode(indices, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        bos.write(n)
        bos.write(lzw, off, n)
        off += n
      }
      bos.write(0) // sub-block terminator
    }
    bos.write(0x3b) // trailer
    bos.toByteArray
  }
}

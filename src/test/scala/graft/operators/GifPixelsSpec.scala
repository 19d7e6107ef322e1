package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the GIF/LZW pixel decoder against the real greedy LZW
 * compressor — decoder and encoder share only the Appendix-F spec, so
 * round-trips exercise genuine dictionary growth, code-width
 * boundaries, the KwKwK case and the full-table reset, not an
 * identity path.
 */
class GifPixelsSpec extends AnyFunSuite {

  test("round-trips across dictionary growth boundaries") {
    // 16x16: ~255 dict adds crosses the 512-slot 9->10 bit boundary
    val px = Array.tabulate(256)(i => ((i * i * 13 + 7) % 256).toByte)
    val gif = GifPixels.encodeGifGray(px, 16, 16)
    assert(GifPixels.decodeGifPixels(gif).exists(_.sameElements(px)))
    // 80x80 = 6400 pixels: enough adds to fill the 4096-slot table and
    // force the encoder's CLEAR/reset path mid-stream
    val big = Array.tabulate(6400)(i => ((i * 31 + (i * i) % 97) % 256).toByte)
    val gifBig = GifPixels.encodeGifGray(big, 80, 80)
    assert(GifPixels.decodeGifPixels(gifBig).exists(_.sameElements(big)))
    // and the header parser reads the logical screen
    assert(MultimodalOps.parseHeader(gifBig)
      .contains(MultimodalOps.MediaHeader("gif", 80, 80, 1, 0)))
  }

  test("KwKwK: constant runs emit the just-created code") {
    // 'aaaa...' makes the encoder emit code == decoder's next free slot
    val px = Array.fill(100)(7.toByte)
    val gif = GifPixels.encodeGifGray(px, 10, 10)
    assert(GifPixels.decodeGifPixels(gif).exists(_.sameElements(px)))
    // run structure with repeats of longer strings too
    val runs = Array.tabulate(400)(i => (if ((i / 7) % 3 == 0) 5 else i % 4).toByte)
    val gif2 = GifPixels.encodeGifGray(runs, 20, 20)
    assert(GifPixels.decodeGifPixels(gif2).exists(_.sameElements(runs)))
  }

  test("extension blocks are skipped; deterministic pseudo-random round-trips") {
    val px = Array.tabulate(64)(i => ((i * 187 + 13) % 256).toByte)
    val plain = GifPixels.encodeGifGray(px, 8, 8)
    // splice a GCE extension (0x21 0xF9, 4-byte block, terminator)
    // between the GCT and the image descriptor
    val descAt = plain.indexOf(0x2c.toByte, 13 + 768)
    val spliced = plain.take(descAt) ++
      Array[Byte](0x21.toByte, 0xf9.toByte, 4, 0, 0, 0, 0, 0) ++ plain.drop(descAt)
    assert(GifPixels.decodeGifPixels(spliced).exists(_.sameElements(px)))
    for (seed <- 1 to 5) {
      val p = Array.tabulate(144)(i => ((i * seed * 53 + seed) % 256).toByte)
      assert(GifPixels.decodeGifPixels(GifPixels.encodeGifGray(p, 12, 12))
        .exists(_.sameElements(p)), s"seed $seed")
    }
  }

  test("animated GIFs: every frame decodes as its own LZW stream") {
    val frames = Array.tabulate(3)(j =>
      Array.tabulate(64)(i => ((j * 19 + i * i * 13) % 256).toByte))
    val gif = GifPixels.encodeGifGrayFrames(frames, 8, 8)
    val got = GifPixels.decodeGifFrames(gif)
    assert(got.exists(fs => fs.length == 3 &&
      fs.zip(frames).forall { case (a, b) => a.sameElements(b) }))
    // decodeGifPixels keeps its first-frame contract on animations
    assert(GifPixels.decodeGifPixels(gif).exists(_.sameElements(frames(0))))
    // the frame cap refuses rather than silently truncating
    assert(GifPixels.decodeGifFrames(gif, maxFrames = 2) === None)
    // multi-frame mode requires the trailer (single-frame mode stops early)
    assert(GifPixels.decodeGifFrames(gif.take(gif.length - 1)) === None)
  }

  test("interlaced frames round-trip to the SEQUENTIAL pixel order") {
    // Appendix-E four passes at h=16: stream rows 0,8 | 4,12 |
    // 2,6,10,14 | 1,3,...,15 — an asymmetric pattern (row r = const r)
    // catches any wrong permutation
    val px = Array.tabulate(256)(i => (i / 16).toByte) // row index as value
    val gif = GifPixels.encodeGifGrayInterlaced(px, 16, 16)
    // the container really is interlaced (bit set on the descriptor)
    val descAt = gif.indexOf(0x2c.toByte, 13 + 768)
    assert((gif(descAt + 9) & 0x40) != 0)
    // and the LZW payload is NOT in sequential order (pass 1 starts
    // with row 0 then row 8), yet the decode returns sequential pixels
    assert(GifPixels.decodeGifPixels(gif).exists(_.sameElements(px)))
    // arbitrary content, odd height (passes of uneven length)
    val px2 = Array.tabulate(16 * 11)(i => ((i * 37 + 5) % 256).toByte)
    val gif2 = GifPixels.encodeGifGrayInterlaced(px2, 16, 11)
    assert(GifPixels.decodeGifPixels(gif2).exists(_.sameElements(px2)))
    // container invariance: interlaced and sequential encodings of the
    // same pixels decode identically (the m_media_gif_interlaced pin)
    val seq = GifPixels.decodeGifPixels(GifPixels.encodeGifGray(px2, 16, 11))
    assert(seq.isDefined &&
      GifPixels.decodeGifPixels(gif2).exists(_.sameElements(seq.get)))
    // the permutation itself: every row appears exactly once
    for (h <- Seq(1, 2, 3, 8, 11, 16, 33))
      assert(GifPixels.interlaceRows(h).sorted.sameElements(0 until h), s"h=$h")
  }

  test("hostile and corrupt streams refuse") {
    val px = Array.tabulate(64)(i => (i * 3).toByte)
    val good = GifPixels.encodeGifGray(px, 8, 8)
    assert(GifPixels.decodeGifPixels(good).isDefined)
    // truncated mid-data
    assert(GifPixels.decodeGifPixels(good.take(good.length - 6)) === None)
    // flipping the interlace flag on a SEQUENTIAL stream is well-formed
    // GIF — the decoder must de-interleave it (producing the row
    // permutation of the original), not refuse and not return the
    // stream order unchanged
    val descAt = good.indexOf(0x2c.toByte, 13 + 768)
    val inter = good.clone(); inter(descAt + 9) = 0x40.toByte
    val permuted = {
      val order = GifPixels.interlaceRows(8)
      val out = new Array[Byte](64)
      for (k <- 0 until 8) System.arraycopy(px, k * 8, out, order(k) * 8, 8)
      out
    }
    assert(GifPixels.decodeGifPixels(inter).exists(_.sameElements(permuted)))
    // dimension bomb: 65535x65535 logical frame must refuse on the cap
    val bomb = good.clone()
    bomb(descAt + 5) = 0xff.toByte; bomb(descAt + 6) = 0xff.toByte
    bomb(descAt + 7) = 0xff.toByte; bomb(descAt + 8) = 0xff.toByte
    assert(GifPixels.decodeGifPixels(bomb) === None)
    // LZW desync: all-ones data reads a code far beyond the next slot
    val lzwAt = descAt + 10 + 1 // past descriptor + min-code byte
    val junkLzw = good.clone()
    for (i <- lzwAt + 1 until math.min(junkLzw.length, lzwAt + 8))
      junkLzw(i) = 0xff.toByte
    assert(GifPixels.decodeGifPixels(junkLzw) === None)
    // trailer with no image, unknown block, junk, null
    val noImage = good.take(13 + 768) ++ Array[Byte](0x3b.toByte)
    assert(GifPixels.decodeGifPixels(noImage) === None)
    val badBlock = good.clone(); badBlock(descAt) = 0x55
    assert(GifPixels.decodeGifPixels(badBlock) === None)
    assert(GifPixels.decodeGifPixels("GIF8 nope".getBytes("US-ASCII")) === None)
    assert(GifPixels.decodeGifPixels(null) === None)
  }
}

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

  test("hostile and corrupt streams refuse") {
    val px = Array.tabulate(64)(i => (i * 3).toByte)
    val good = GifPixels.encodeGifGray(px, 8, 8)
    assert(GifPixels.decodeGifPixels(good).isDefined)
    // truncated mid-data
    assert(GifPixels.decodeGifPixels(good.take(good.length - 6)) === None)
    // interlace flag on the image descriptor
    val descAt = good.indexOf(0x2c.toByte, 13 + 768)
    val inter = good.clone(); inter(descAt + 9) = 0x40.toByte
    assert(GifPixels.decodeGifPixels(inter) === None)
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

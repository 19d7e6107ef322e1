package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Mutation-safety: the media decoders run inside executor tasks over
 * untrusted blobs, so beyond the targeted hostile cases in each
 * format's spec, EVERY decode of a corrupted stream must return (Some
 * or None) — never throw, never hang, never allocate unboundedly.
 * Deterministic single-byte and truncation mutations over valid
 * fixtures of all four formats; any escape of the decoders' internal
 * Bail discipline fails the suite as an uncaught exception.
 */
class MediaFuzzSpec extends AnyFunSuite {

  private def fixtures: Seq[(String, Array[Byte])] = {
    val png = MultimodalOps.encodePngGray(
      Array.tabulate(64)(i => (i * 5).toByte), 8, 8, r => r % 5)
    val pngAdam7 = MultimodalOps.encodePngGray(
      Array.tabulate(77)(i => (i * 5).toByte), 11, 7, r => r % 5, interlace = true)
    val zz = Array.tabulate(6) { b =>
      val a = new Array[Int](64)
      a(0) = b * 40 - 100
      for (k <- 1 until 64 if (k + b) % 7 == 0) a(k) = (k % 11) - 5
      a
    }
    val jpeg = JpegBaseline.encodeGrayBlocks(zz, 3, 2, Array.tabulate(64)(k => 1 + k % 17), dri = 2)
    val jpegProg = JpegBaseline.encodeGrayProgressive(zz, 3, 2, Array.tabulate(64)(k => 1 + k % 17))
    val zz12 = zz.map { a => val b = a.clone(); b(0) = b(0) * 16 - 2048; b(5) = 6000; b }
    val jpeg12 = JpegBaseline.encodeGray12Blocks(zz12, 3, 2, Array.tabulate(64)(k => 1 + k % 17), dri = 2)
    val jpegHier = JpegBaseline.encodeGrayHier(Array(zz(0)), 1, 1,
      Array.tabulate(4) { i => val a = new Array[Int](64); a(0) = i * 9 - 13; a(7) = 3; a },
      Array.tabulate(64)(k => 1 + k % 17))
    val gif = GifPixels.encodeGifGray(Array.tabulate(100)(i => ((i * i * 7) % 256).toByte), 10, 10)
    val gifInterlaced = GifPixels.encodeGifGrayInterlaced(
      Array.tabulate(176)(i => ((i * i * 7 + 3) % 256).toByte), 16, 11)
    val wav = MultimodalOps.encodeWavPcm(Array.tabulate(40)(i => i * 1337 % 30000 - 15000), 16, 2, 16000)
    val wav24 = MultimodalOps.encodeWavPcm(Array.tabulate(30)(i => i * 524287 % 8000000 - 4000000), 24, 2, 48000)
    val wavF = MultimodalOps.encodeWavFloat(Array.tabulate(32)(i => (i * 7 % 19 - 9) / 10.0f), 2, 16000)
    val avi = MultimodalOps.encodeAviMjpeg(Array(jpeg, "not a jpeg".getBytes("US-ASCII")), 24, 16)
    val bmp = MultimodalOps.encodeBmp24(
      Array.tabulate(10 * 7 * 3)(i => (i * 11).toByte), 10, 7)
    val bmpTd = MultimodalOps.encodeBmp24(
      Array.tabulate(5 * 6 * 3)(i => (i * 29 + 3).toByte), 5, 6, topDown = true)
    val png4 = MultimodalOps.encodePngGrayDepth(
      Array.tabulate(77)(i => (i * 3) % 16), 11, 7, 4, r => r % 5)
    val png1Adam = MultimodalOps.encodePngGrayDepth(
      Array.tabulate(77)(i => i % 2), 11, 7, 1, r => r % 5, interlace = true)
    val png16 = MultimodalOps.encodePngGrayDepth(
      Array.tabulate(64)(i => (i * 997) % 65536), 8, 8, 16, r => (r + 2) % 5)
    val tiff = MultimodalOps.encodeTiff(
      Array.tabulate(10 * 7)(i => (i * 11).toByte), 10, 7, 1, rowsPerStrip = 3)
    val tiffPbBe = MultimodalOps.encodeTiff(
      Array.tabulate(6 * 5 * 3)(i => (i * 29 + 3).toByte), 6, 5, 3,
      bigEndian = true, packBits = true, rowsPerStrip = 2)
    Seq(("png", png), ("png-adam7", pngAdam7), ("png-4bit", png4),
      ("png-1bit-adam7", png1Adam), ("png-16bit", png16),
      ("jpeg", jpeg), ("jpeg-prog", jpegProg),
      ("jpeg-12bit", jpeg12), ("jpeg-hier", jpegHier), ("gif", gif),
      ("gif-interlaced", gifInterlaced), ("wav", wav), ("wav-24", wav24),
      ("wav-float", wavF), ("avi", avi), ("bmp", bmp), ("bmp-topdown", bmpTd),
      ("tiff-strips", tiff), ("tiff-packbits-be-rgb", tiffPbBe),
      ("wav-adpcm", MultimodalOps.encodeWavAdpcm(
        Array((1200, 33, Array.tabulate(6)(i => (i * 41 + 7).toByte)),
          (-900, 70, Array.tabulate(6)(i => (i * 13).toByte))), 8000)),
      ("jpeg-exif", MultimodalOps.withExifOrientation(jpeg, 6, bigEndian = true)),
      ("ico", MultimodalOps.encodeIco24(
        Array.tabulate(9 * 5 * 3)(i => (i * 23 + 1).toByte), 9, 5)),
      ("tga", MultimodalOps.encodeTga24(
        Array.tabulate(9 * 5 * 3)(i => (i * 17 + 2).toByte), 9, 5)),
      ("tga-rle-topdown", MultimodalOps.encodeTga24(
        Array.tabulate(8 * 6 * 3)(i => ((i / 9) * 31).toByte), 8, 6,
        rle = true, topDown = true)),
      ("pnm-p6", MultimodalOps.encodePnm(
        Array.tabulate(7 * 4 * 3)(i => (i * 19 + 5).toByte), 7, 4, 3)),
      ("pnm-p5", MultimodalOps.encodePnm(
        Array.tabulate(9 * 6)(i => (i * 37).toByte), 9, 6, 1)),
      ("wav-mulaw", MultimodalOps.encodeWavG711(
        Array.tabulate(31)(i => (i * 29 + 3).toByte), 7, 8000)),
      ("wav-alaw", MultimodalOps.encodeWavG711(
        Array.tabulate(30)(i => (i * 53).toByte), 6, 8000)),
      ("qoi", MultimodalOps.encodeQoi(
        Array.tabulate(8 * 5 * 3)(i => (((i / 9) * 5 + (i % 3) * 7) % 256).toByte), 8, 5)),
      ("qoi-rgba", MultimodalOps.encodeQoi(
        Array.tabulate(6 * 4 * 4)(i => (i * 31 % 256).toByte), 6, 4, channels = 4)),
      ("pcx", MultimodalOps.encodePcx(
        Array.tabulate(9 * 5 * 3)(i => (((i / 6) * 11 + 180) % 256).toByte), 9, 5)),
      ("pcx-gray", MultimodalOps.encodePcx(
        Array.tabulate(7 * 4)(i => ((i / 3) * 13).toByte), 7, 4, planes = 1)),
      ("ras-rle", MultimodalOps.encodeRas(
        Array.tabulate(9 * 5 * 3)(i => (((i / 6) * 11 + 120) % 256).toByte), 9, 5,
        rle = true)),
      ("ras-gray", MultimodalOps.encodeRas(
        Array.tabulate(7 * 4)(i => ((i / 3) * 13).toByte), 7, 4, channels = 1)),
      ("hdr", MultimodalOps.encodeHdr(
        Array.tabulate(9 * 4 * 4)(i => (((i / 8) * 11 + (i % 4) * 5) % 256).toByte), 9, 4)),
      ("hdr-old", MultimodalOps.encodeHdrOld(
        Array.tabulate(9 * 4 * 4)(i => (((i / 16) * 11 + (i % 4) * 5) % 256).toByte), 9, 4)))
  }

  private def decodeAll(b: Array[Byte]): Unit = {
    MultimodalOps.decodePngPixels(b)
    JpegBaseline.decodePixels(b)
    GifPixels.decodeGifPixels(b)
    GifPixels.decodeGifFrames(b)
    MultimodalOps.decodeWavSamples(b)
    MultimodalOps.parseAviFrames(b)
    MultimodalOps.decodeBmpPixels(b)
    MultimodalOps.decodeTiffPixels(b)
    MultimodalOps.decodeIcoPixels(b)
    MultimodalOps.decodeTgaPixels(b)
    MultimodalOps.decodePnmPixels(b)
    MultimodalOps.decodeQoiPixels(b)
    MultimodalOps.decodePcxPixels(b)
    MultimodalOps.decodeRasPixels(b)
    MultimodalOps.decodeHdrPixels(b)
    MultimodalOps.exifOrientation(b)
    MultimodalOps.parseHeader(b)
    ()
  }

  test("single-byte mutations never escape as exceptions") {
    for ((name, fix) <- fixtures) {
      // flip every byte position once through a deterministic xor; for
      // longer fixtures stride so the suite stays fast but every region
      // (magic, headers, tables, entropy data, trailers) is hit
      val stride = math.max(1, fix.length / 192)
      var pos = 0
      while (pos < fix.length) {
        for (x <- Seq(0xff, 0x01, 0x80)) {
          val mut = fix.clone()
          mut(pos) = (mut(pos) ^ x).toByte
          decodeAll(mut) // must not throw
        }
        pos += stride
      }
      // and the unmutated fixture still decodes (guards the guard)
      decodeAll(fix)
      assert(true, s"$name survived")
    }
  }

  test("truncations at every boundary never escape as exceptions") {
    for ((_, fix) <- fixtures) {
      val stride = math.max(1, fix.length / 128)
      var n = 0
      while (n < fix.length) {
        decodeAll(fix.take(n)) // must not throw
        n += stride
      }
    }
  }

  test("double mutations over the entropy-coded regions") {
    for ((_, fix) <- fixtures) {
      val third = fix.length / 3
      for (s <- 0 until 64) {
        val mut = fix.clone()
        val p1 = third + (s * 31) % math.max(1, fix.length - third)
        val p2 = third + (s * 57 + 11) % math.max(1, fix.length - third)
        mut(p1) = (mut(p1) ^ 0xa5).toByte
        mut(p2) = (mut(p2) + 1).toByte
        decodeAll(mut)
      }
    }
  }
}

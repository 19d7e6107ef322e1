package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Header-parser goldens (PNG IHDR / JPEG SOFn / WAV fmt, hand-built
  * per the public specs) and the decodeMedia mixed-table pass with its
  * stub fallback. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-multimodal")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 640x480 truecolor PNG header (depth 8, color type 2), filler CRC
  private val png = hx("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 02 00 00 00 DEADBEEF")
  // JPEG with an APP0/JFIF segment BEFORE the SOF0 — the marker walk
  // must skip it by length; SOF0: precision 8, height 0x0100=256,
  // width 0x0180=384, 3 components
  private val jpeg = hx("FFD8" +
    "FFE00010 4A46494600 0101 00 0001 0001 00 00" + // APP0 len 16
    "FFC00011 08 0100 0180 03 011100 021101 031101" +
    "FFD9")
  // WAV with a 3-byte JUNK chunk before fmt — the chunk walk must
  // word-align (3 -> 4) to land on fmt: stereo, 44100 Hz
  private val wav = hx("52494646 24000000 57415645" +
    "4A554E4B 03000000 AABBCC 00" +
    "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
    "64617461 00000000")

  test("parseHeader reads PNG/JPEG/WAV goldens byte-exactly") {
    assert(MultimodalOps.parseHeader(png)
      .contains(MultimodalOps.MediaHeader("png", 640, 480, 3, 0)))
    assert(MultimodalOps.parseHeader(jpeg)
      .contains(MultimodalOps.MediaHeader("jpeg", 384, 256, 3, 0)))
    assert(MultimodalOps.parseHeader(wav)
      .contains(MultimodalOps.MediaHeader("wav", 0, 0, 2, 44100)))
  }

  test("parseHeader channel mapping follows the PNG color types") {
    for ((colorType, chans) <- Seq(0 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 2L, 6 -> 4L)) {
      val p = png.clone(); p(25) = colorType.toByte
      assert(MultimodalOps.parseHeader(p).map(_.channels).contains(chans),
        s"color type $colorType")
    }
    // an undefined color type is a refusal, not a guess
    val bad = png.clone(); bad(25) = 7.toByte
    assert(MultimodalOps.parseHeader(bad).isEmpty)
  }

  test("parseHeader handles progressive JPEG, EXIF APP1, and extended WAV fmt") {
    // progressive JPEG: SOF2 (0xC2) is a frame header like SOF0
    val sof2 = hx("FFD8 FFC20011 08 0040 0080 03 011100 021101 031101 FFD9")
    assert(MultimodalOps.parseHeader(sof2)
      .contains(MultimodalOps.MediaHeader("jpeg", 128, 64, 3, 0)))
    // EXIF APP1 (odd length) before the SOF — skipped by length like APP0
    val exif = hx("FFD8" +
      "FFE1000B 457869660000 AABB CD" + // APP1 len 11
      "FFC00011 08 0010 0020 01 011100 021101 031101" +
      "FFD9")
    assert(MultimodalOps.parseHeader(exif)
      .contains(MultimodalOps.MediaHeader("jpeg", 32, 16, 1, 0)))
    // DHT (0xC4) is NOT a frame header and must be skipped, not parsed
    val dht = hx("FFD8 FFC40007 00 AABBCCDD" +
      "FFC00011 08 0008 0009 03 011100 021101 031101 FFD9")
    assert(MultimodalOps.parseHeader(dht)
      .contains(MultimodalOps.MediaHeader("jpeg", 9, 8, 3, 0)))
    // WAVE_FORMAT_EXTENSIBLE-style fmt with cbSize (chunk len 18): the
    // channel/rate offsets are unchanged, the walk skips the extension
    val wavExt = hx("52494646 2A000000 57415645" +
      "666D7420 12000000 FFFE 0600 80BB0000 00DC0500 0C00 1800 0000" +
      "64617461 00000000")
    assert(MultimodalOps.parseHeader(wavExt)
      .contains(MultimodalOps.MediaHeader("wav", 0, 0, 6, 48000)))
  }

  test("parseHeader refuses truncated and junk input") {
    assert(MultimodalOps.parseHeader(null) === None)
    assert(MultimodalOps.parseHeader(Array.emptyByteArray) === None)
    assert(MultimodalOps.parseHeader(png.take(20)) === None)   // cut inside IHDR
    assert(MultimodalOps.parseHeader(jpeg.take(6)) === None)   // SOI + half a marker
    assert(MultimodalOps.parseHeader(wav.take(16)) === None)   // RIFF, no fmt
    assert(MultimodalOps.parseHeader(hx("00112233445566778899")) === None)
    // SOI followed by a desynced (non-FF) byte stream
    assert(MultimodalOps.parseHeader(hx("FFD8 00 01 02 03 04 05 06 07 08 09")) === None)
    // hostile RIFF: a chunk size of 0xFFFFFFFF overflows toInt negative
    // — must refuse, not walk backward forever
    assert(MultimodalOps.parseHeader(hx(
      "52494646 24000000 57415645 4A554E4B FFFFFFFF 00" * 1)) === None)
    // and a size that merely overruns the blob is refused too
    assert(MultimodalOps.parseHeader(hx(
      "52494646 24000000 57415645 4A554E4B 40000000 0000")) === None)
  }

  test("decodeMedia parses a mixed table in one pass, stub for unknown") {
    val ss = spark; import ss.implicits._
    val junk = hx("00AABBCCDD")
    val df = Seq((1L, png), (2L, jpeg), (3L, wav), (4L, junk))
      .toDF("id", "blob")
    val media = MultimodalOps.toMediaFrame(df, "id", "blob", "mixed")
    val out = MultimodalOps.decodeMedia(media, batchSize = 2)
      .orderBy("media_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out(0) == ((1L, "png", 640L, 480L, 3L, 0L)))
    assert(out(1) == ((2L, "jpeg", 384L, 256L, 3L, 0L)))
    assert(out(2) == ((3L, "wav", 0L, 0L, 2L, 44100L)))
    // the junk row falls back to the md5-stub dims — same derivation as
    // decodeImageBatched, cross-checked here against the columnar stub
    val stub = MultimodalOps.decodeImageStub(media.filter(col("media_id") === 4))
      .collect().head
    assert(out(3) == ((4L, "unknown", stub.getLong(2), stub.getLong(3), stub.getLong(4), 0L)))
  }

  test("resizePlan box math over parsed dims") {
    val ss = spark; import ss.implicits._
    val media = MultimodalOps.toMediaFrame(
      Seq((1L, png), (2L, jpeg)).toDF("id", "blob"), "id", "blob", "mixed")
    val out = MultimodalOps.resizePlan(MultimodalOps.decodeMedia(media), box = 64)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // 640x480 -> landscape: out_w=64, out_h=floor(480*64/640)=48
    assert(out(0) == ((1L, 64L, 48L)))
    // 384x256 -> out_w=64, out_h=floor(256*64/384)=42
    assert(out(1) == ((2L, 64L, 42L)))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: images/audio/video travel as opaque
 * `binary` columns next to a typed metadata struct. The Spark-side
 * machinery — schema, batched per-partition processing, deterministic
 * partitioning by content hash — is real, and so is the header decode:
 * [[decodeMedia]] parses PNG (IHDR), JPEG (SOFn) and WAV (fmt) headers
 * in pure JVM code, no codec library — and so is the pixel/sample
 * stage for every format where the spec permits it without one: PNG
 * pixels (inflate + filter reversal), baseline JPEG pixels
 * ([[JpegBaseline]]: Huffman + IDCT), and WAV PCM samples (none
 * needed). Only blobs that sniff as none of the formats, or use
 * features out of decoder scope (progressive JPEG, float WAV), fall
 * back to deterministic md5-derived dimensions / compressed-byte
 * stats, clearly marked via `decoded=false`.
 */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("byte_len", LongType),
      StructField("sha", StringType)
    )))
  ))

  /** Wrap raw binary content rows into the canonical media frame. */
  def toMediaFrame(df: DataFrame, idCol: String, binCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("content"),
      struct(
        lit(mime).as("mime"),
        length(col(binCol)).cast("long").as("byte_len"),
        sha2(col(binCol), 256).as("sha")
      ).as("meta"))

  /**
   * STUB DECODER — kept as the deterministic fallback surface (width/
   * height derived from the content md5 so tests and oracles are
   * stable) and as the plumbing-shape baseline the batched variant
   * shares an oracle with. REAL decoding lives in [[decodeMedia]]
   * (headers), [[pixelFeatures]] (PNG/JPEG/GIF pixels),
   * [[sampleFeatures]] (WAV PCM) and [[videoFrameFeatures]]
   * (AVI/animated-GIF frames).
   */
  def decodeImageStub(media: DataFrame): DataFrame =
    media
      .withColumn("_hx", md5(hex(col("content"))))
      .select(
        col("media_id"),
        col("meta"),
        conv(substring(col("_hx"), 1, 2), 16, 10).cast("long").as("width"),
        conv(substring(col("_hx"), 3, 2), 16, 10).cast("long").as("height"),
        (conv(substring(col("_hx"), 5, 2), 16, 10).cast("long") % 3).as("channels_mod"))

  /**
   * Resize planning over decoded dimensions: fit into a `box` square
   * preserving aspect ratio with integer arithmetic (engine-portable —
   * no floating rounding). The pixel resample itself would live in the
   * batched decode pass; the dimension math is the part every
   * downstream consumer (batching, packing, layout) depends on.
   */
  def resizePlan(decoded: DataFrame, box: Int): DataFrame = {
    // degenerate 0-dimension media clamp to 1 for the aspect ratio
    val w = greatest(col("width"), lit(1L))
    val h = greatest(col("height"), lit(1L))
    decoded.select(
      col("media_id"), col("width"), col("height"),
      when(w >= h, lit(box.toLong))
        .otherwise(greatest(lit(1L), floor(w * box / h).cast("long")))
        .as("out_w"),
      when(w >= h, greatest(lit(1L), floor(h * box / w).cast("long")))
        .otherwise(lit(box.toLong))
        .as("out_h"))
  }

  /**
   * REAL pixel resampling — [[resizePlan]]'s dimension math applied to
   * actually-decoded pixels: each decodable blob (PNG / baseline or
   * progressive JPEG / GIF) is nearest-neighbor resampled into the
   * `box` fit (same integer aspect formula as resizePlan, src index =
   * `(dst · srcDim) div outDim` per axis, per channel), and the output
   * row carries the resized dims plus the stats of the RESAMPLED
   * samples — the thumbnail/feature-extraction stage of a multimodal
   * pipeline, with the stats making it oracle-checkable. Undecodable
   * blobs fall back to compressed-byte stats with decoded=false and
   * zero dims, the [[pixelFeatures]] contract. Same batched
   * mapPartitions shape; the resample is O(out pixels), so a box-fit
   * thumbnail costs box² work per blob no matter the source size.
   */
  def resampledStats(media: DataFrame, box: Int, batchSize: Int = 64): DataFrame = {
    require(box >= 1 && box <= 4096, s"box in [1,4096], got $box")
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("decoded", BooleanType),
      StructField("out_w", LongType),
      StructField("out_h", LongType),
      StructField("n_vals", LongType),
      StructField("mean_milli", LongType),
      StructField("distinct_vals", LongType),
      StructField("max_val", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        def stats(bytes: Array[Byte]): (Long, Long, Long, Long) = {
          if (bytes.isEmpty) return (0L, 0L, 0L, 0L)
          var sum = 0L; var max = 0L; var distinct = 0L
          val seen = new Array[Boolean](256)
          var i = 0
          while (i < bytes.length) {
            val v = bytes(i) & 0xff
            sum += v
            if (v > max) max = v
            if (!seen(v)) { seen(v) = true; distinct += 1 }
            i += 1
          }
          (bytes.length.toLong, sum * 1000L / bytes.length, distinct, max)
        }
        def fit(w: Int, h: Int): (Int, Int) = {
          val ww = math.max(w, 1); val hh = math.max(h, 1)
          if (ww >= hh) (box, math.max(1, hh * box / ww))
          else (math.max(1, ww * box / hh), box)
        }
        def resample(px: Array[Byte], w: Int, h: Int, ch: Int): (Array[Byte], Int, Int) = {
          val (ow, oh) = fit(w, h)
          val out = new Array[Byte](ow * oh * ch)
          var y = 0
          while (y < oh) {
            val sy = y * h / oh
            var x = 0
            while (x < ow) {
              val sx = x * w / ow
              var c = 0
              while (c < ch) {
                out((y * ow + x) * ch + c) = px((sy * w + sx) * ch + c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          (out, ow, oh)
        }
        rows.grouped(batchSize).flatMap(_.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val hdr = parseHeader(content)
          val fmt = hdr.map(_.format).getOrElse("unknown")
          // dims from the real header; samples from the real decoders;
          // a dims/samples mismatch is corruption -> honest fallback
          val decoded: Option[(String, Array[Byte], Int, Int, Int)] =
            decodePngPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "png" && px.length == m.width * m.height * math.max(m.channels, 1) =>
                ("png", px, m.width.toInt, m.height.toInt, math.max(m.channels, 1).toInt)
            })
            .orElse(JpegBaseline.decodePixels(content)
              .map(d => ("jpeg", d.samples, d.width, d.height, d.channels)))
            .orElse(GifPixels.decodeGifPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "gif" && px.length == m.width * m.height =>
                ("gif", px, m.width.toInt, m.height.toInt, 1)
            }))
            .orElse(decodeBmpPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "bmp" && px.length == m.width * m.height * 3 =>
                ("bmp", px, m.width.toInt, m.height.toInt, 3)
            }))
            .orElse(decodeTiffPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "tiff" && px.length == m.width * m.height * m.channels =>
                ("tiff", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeIcoPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "ico" && px.length == m.width * m.height * 3 =>
                ("ico", px, m.width.toInt, m.height.toInt, 3)
            }))
            .orElse(decodeTgaPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "tga" && px.length == m.width * m.height * 3 =>
                ("tga", px, m.width.toInt, m.height.toInt, 3)
            }))
            .orElse(decodePnmPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "pnm" && px.length == m.width * m.height * m.channels =>
                ("pnm", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeQoiPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "qoi" && px.length == m.width * m.height * m.channels =>
                ("qoi", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodePcxPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "pcx" && px.length == m.width * m.height * m.channels =>
                ("pcx", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeFarbfeldPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "farbfeld" && px.length == m.width * m.height * 4 =>
                ("farbfeld", px, m.width.toInt, m.height.toInt, 4)
            }))
            .orElse(decodeRasPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "ras" && px.length == m.width * m.height * m.channels =>
                ("ras", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeHdrPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "hdr" && px.length == m.width * m.height * 4 =>
                ("hdr", px, m.width.toInt, m.height.toInt, 4)
            }))
          decoded match {
            case Some((f, px, w, h, ch)) =>
              val (out, ow, oh) = resample(px, w, h, ch)
              val (n, mean, d, mx) = stats(out)
              Row(r.getAs[Long]("media_id"), f, true, ow.toLong, oh.toLong, n, mean, d, mx)
            case None =>
              val (n, mean, d, mx) = stats(if (content == null) Array.emptyByteArray else content)
              Row(r.getAs[Long]("media_id"), fmt, false, 0L, 0L, n, mean, d, mx)
          }
        })
      }(enc)
  }

  /**
   * Perceptual hash (aHash) over DECODED pixels — the image-dedup key:
   * nearest-neighbor resample to 8x8 (the [[resampledStats]] kernel at
   * box 8, channel 0 of multi-channel sources), integer mean
   * (sum div 64), bit j set iff pixel j > mean; visually identical
   * images hash equal regardless of container/encoding, and
   * near-identical ones land within a small Hamming distance — feed
   * the hash to the simhash pigeonhole machinery for banded near-dup
   * joins at corpus scale. Every step is integer arithmetic over
   * decoded bytes, so the hash replays exactly in SQL (unlike DCT
   * pHash, whose float basis would drift across engines — aHash
   * trades a little robustness for a checkable contract). The 64 bits
   * ship as two unsigned 32-bit halves (hi = bits 32..63) so no engine
   * has to represent bit 63 in a signed LONG. Undecodable blobs report
   * decoded=false, zero halves.
   * Output: (media_id, format, decoded, phash_hi, phash_lo).
   */
  def perceptualHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("decoded", BooleanType),
      StructField("phash_hi", LongType),
      StructField("phash_lo", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val hdr = parseHeader(content)
          val fmt = hdr.map(_.format).getOrElse("unknown")
          val decoded: Option[(String, Array[Byte], Int, Int, Int)] =
            decodePngPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "png" && px.length == m.width * m.height * math.max(m.channels, 1) =>
                ("png", px, m.width.toInt, m.height.toInt, math.max(m.channels, 1).toInt)
            })
            .orElse(JpegBaseline.decodePixels(content)
              .map(d => ("jpeg", d.samples, d.width, d.height, d.channels)))
            .orElse(GifPixels.decodeGifPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "gif" && px.length == m.width * m.height =>
                ("gif", px, m.width.toInt, m.height.toInt, 1)
            }))
            .orElse(decodeBmpPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "bmp" && px.length == m.width * m.height * 3 =>
                ("bmp", px, m.width.toInt, m.height.toInt, 3)
            }))
            .orElse(decodeTiffPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "tiff" && px.length == m.width * m.height * m.channels =>
                ("tiff", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeIcoPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "ico" && px.length == m.width * m.height * 3 =>
                ("ico", px, m.width.toInt, m.height.toInt, 3)
            }))
            .orElse(decodeTgaPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "tga" && px.length == m.width * m.height * 3 =>
                ("tga", px, m.width.toInt, m.height.toInt, 3)
            }))
            .orElse(decodePnmPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "pnm" && px.length == m.width * m.height * m.channels =>
                ("pnm", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeQoiPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "qoi" && px.length == m.width * m.height * m.channels =>
                ("qoi", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodePcxPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "pcx" && px.length == m.width * m.height * m.channels =>
                ("pcx", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeFarbfeldPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "farbfeld" && px.length == m.width * m.height * 4 =>
                ("farbfeld", px, m.width.toInt, m.height.toInt, 4)
            }))
            .orElse(decodeRasPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "ras" && px.length == m.width * m.height * m.channels =>
                ("ras", px, m.width.toInt, m.height.toInt, m.channels.toInt)
            }))
            .orElse(decodeHdrPixels(content).flatMap(px => hdr.collect {
              case m if m.format == "hdr" && px.length == m.width * m.height * 4 =>
                ("hdr", px, m.width.toInt, m.height.toInt, 4)
            }))
          decoded match {
            case Some((f, px, w, h, ch)) =>
              // 8x8 grid, channel 0, src = (dst * srcDim) div 8
              val g = new Array[Int](64)
              var sum = 0L
              var j = 0
              while (j < 64) {
                val sy = (j / 8) * h / 8
                val sx = (j % 8) * w / 8
                g(j) = px((sy * w + sx) * ch) & 0xff
                sum += g(j)
                j += 1
              }
              val mean = sum / 64L
              var hi = 0L; var lo = 0L
              j = 0
              while (j < 64) {
                if (g(j) > mean) {
                  if (j < 32) lo |= (1L << j) else hi |= (1L << (j - 32))
                }
                j += 1
              }
              Row(r.getAs[Long]("media_id"), f, true, hi, lo)
            case None =>
              Row(r.getAs[Long]("media_id"), fmt, false, 0L, 0L)
          }
        })
      }(enc)
  }

  /**
   * REAL feature extraction over the binary content (not a stub): the
   * byte-value distribution of the blob — mean (milli), distinct count,
   * max — as codegen'd column expressions over the hex expansion. The
   * pattern generalizes to any per-byte featurizer.
   */
  def byteFeatures(media: DataFrame): DataFrame = {
    val bytes = transform(
      sequence(lit(0), (col("meta.byte_len") - 1).cast("int")),
      i => conv(substring(hex(col("content")), i * 2 + 1, lit(2)), 16, 10).cast("long"))
    media.select(
      col("media_id"),
      col("meta.byte_len").as("byte_len"),
      floor(aggregate(bytes, lit(0L), (acc, x) => acc + x) * 1000L / col("meta.byte_len"))
        .cast("long").as("byte_mean_milli"),
      size(array_distinct(bytes)).cast("long").as("distinct_bytes"),
      array_max(bytes).as("max_byte"))
  }

  /**
   * Partition-batched decode — the REAL plumbing shape for a heavy
   * decoder or model: one iterator-to-iterator `mapPartitions` pass,
   * with a per-partition "model handle" opened once and rows processed
   * in bounded batches (what a Pandas-UDF / mapInPandas pipeline does
   * in the Python stack). The decode body here stays the deterministic
   * md5 stub so results are bit-identical to [[decodeImageStub]] and
   * share its oracle — the REAL decode stages live in [[decodeMedia]],
   * [[pixelFeatures]], [[sampleFeatures]] and [[videoFrameFeatures]],
   * which reuse this same batching shape.
   */
  def decodeImageBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("byte_len", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("channels_mod", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"), col("meta.byte_len").as("byte_len"))
      .mapPartitions { rows =>
        // per-partition init: a real decoder/model loads ONCE here
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        rows.grouped(batchSize).flatMap { batch =>
          // a real implementation hands the whole batch to the decoder;
          // the stub derives dimensions from the content hash per row
          batch.map { r =>
            val content = r.getAs[Array[Byte]]("content")
            md.reset()
            val h = hex(md.digest(hex(content).toUpperCase.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            Row(
              r.getAs[Long]("media_id"),
              r.getAs[Long]("byte_len"),
              java.lang.Long.parseLong(h.substring(0, 2), 16),
              java.lang.Long.parseLong(h.substring(2, 4), 16),
              java.lang.Long.parseLong(h.substring(4, 6), 16) % 3)
          }
        }
      }(enc)
  }

  /**
   * Parsed header fields of a media blob. `format` is sniffed from the
   * content magic, never trusted from metadata. Dimensions apply to
   * images, channels to images AND audio (color components / audio
   * channels), sampleRate to audio only (0 elsewhere).
   */
  private[graft] final case class MediaHeader(
    format: String, width: Long, height: Long, channels: Long, sampleRate: Long)

  private def u16be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 8) | (b(o + 1) & 0xffL)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u16le(b: Array[Byte], o: Int): Long =
    ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /**
   * REAL header parse — pure-JVM readers of the public container
   * formats, no codec library:
   *
   *  - PNG (RFC 2083 / W3C): 8-byte signature, then the IHDR chunk is
   *    required first — width/height are the two big-endian u32s at
   *    offsets 16/20, color type at 25 maps to the channel count
   *    (0 gray=1, 2 truecolor=3, 3 palette=1, 4 gray+alpha=2, 6 rgba=4).
   *    Chunk CRCs are NOT validated — this is a header reader, not a
   *    format checker.
   *  - JPEG (ITU T.81): SOI marker, then a marker-segment walk to the
   *    first frame header SOFn (0xC0-0xCF minus DHT 0xC4 / JPG 0xC8 /
   *    DAC 0xCC): height/width are big-endian u16s at segment offsets
   *    3/5, component count at 7.
   *  - WAV (RIFF): "RIFF....WAVE", then a chunk walk to "fmt " —
   *    channels is the little-endian u16 at fmt+2, sample rate the
   *    little-endian u32 at fmt+4.
   *
   * Anything that doesn't sniff as one of the three (or is truncated
   * mid-header) returns None and the caller falls back to the md5 stub
   * fields — unknown mimes keep flowing instead of failing the batch.
   */
  private[graft] def parseHeader(b: Array[Byte]): Option[MediaHeader] = {
    if (b == null) return None
    // PNG: signature + IHDR (spec-required first chunk at offset 8)
    if (b.length >= 29 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val channels = (b(25) & 0xff) match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case _ => return None
      }
      return Some(MediaHeader("png", u32be(b, 16), u32be(b, 20), channels, 0L))
    }
    // JPEG: SOI then marker walk to the first SOFn
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var pos = 2
      while (pos + 9 < b.length) {
        if ((b(pos) & 0xff) != 0xff) return None // desynced marker stream
        // T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        // marker code — consume them one at a time, or the second 0xFF
        // would be read as a marker with a bogus length (round-5 ADVICE)
        if ((b(pos + 1) & 0xff) == 0xff) { pos += 1 }
        else {
          val marker = b(pos + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some(MediaHeader("jpeg", u16be(b, pos + 7), u16be(b, pos + 5), b(pos + 9) & 0xffL, 0L))
          if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) pos += 2
          else pos += 2 + u16be(b, pos + 2).toInt
        }
      }
      return None
    }
    // GIF (87a/89a): logical-screen dims from the header; palette
    // images are index streams, so channels = 1 (the color-type-3 PNG
    // convention)
    if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Some(MediaHeader("gif", u16le(b, 6), u16le(b, 8), 1L, 0L))
    // BMP: "BM" + a 40-byte BITMAPINFOHEADER; biHeight's SIGN encodes
    // row order (negative = top-down), dims report the magnitude
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M' && u32le(b, 14) == 40L) {
      val w = u32le(b, 18).toInt
      val hRaw = u32le(b, 22).toInt
      if (w > 0 && hRaw != 0 && hRaw != Int.MinValue)
        return Some(MediaHeader("bmp", w.toLong, math.abs(hRaw).toLong,
          if (u16le(b, 28) == 24L) 3L else 1L, 0L))
    }
    // QOI: "qoif" magic, big-endian dims, 3/4 channels, srgb/linear
    if (b.length >= 14 && b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f') {
      val ch = b(12) & 0xff
      if ((ch == 3 || ch == 4) && (b(13) & 0xff) <= 1) {
        val w = u32be(b, 4); val h = u32be(b, 8)
        if (w > 0L && h > 0L) return Some(MediaHeader("qoi", w, h, ch.toLong, 0L))
      }
      return None
    }
    // farbfeld: 8-byte ASCII magic, u32be dims, 16-bit RGBA (suckless)
    if (b.length >= 16 && b(0) == 'f' && b(1) == 'a' && b(2) == 'r' && b(3) == 'b' &&
        b(4) == 'f' && b(5) == 'e' && b(6) == 'l' && b(7) == 'd') {
      val w = u32be(b, 8); val h = u32be(b, 12)
      if (w > 0L && h > 0L) return Some(MediaHeader("farbfeld", w, h, 4L, 0L))
      return None
    }
    // Radiance HDR: "#?RADIANCE"/"#?RGBE" ASCII magic; dims from the
    // "-Y h +X w" resolution line after the blank header terminator
    if (b.length >= 2 && b(0) == '#' && b(1) == '?') {
      hdrInfo(b) match {
        case Some((w, h, _)) =>
          return Some(MediaHeader("hdr", w.toLong, h.toLong, 4L, 0L))
        case None => return None
      }
    }
    // Sun Raster: 0x59A66A95 magic, eight u32be header words; depth 8
    // (gray) or 24 (stored BGR), no colormap, raw (1) or byte-RLE (2)
    if (b.length >= 32 && u32be(b, 0) == 0x59a66a95L) {
      val w = u32be(b, 4); val h = u32be(b, 8)
      val depth = u32be(b, 12); val rtype = u32be(b, 20)
      if (w > 0L && h > 0L && (depth == 8L || depth == 24L) &&
          (rtype == 1L || rtype == 2L) && u32be(b, 24) == 0L && u32be(b, 28) == 0L)
        return Some(MediaHeader("ras", w, h, if (depth == 24L) 3L else 1L, 0L))
      return None
    }
    // ICO: 00 00 01 00 + count, dims from the first entry's DIB
    // (biHeight is DOUBLED — XOR + AND share one header)
    if (b.length >= 22 && u16le(b, 0) == 0L && u16le(b, 2) == 1L && u16le(b, 4) >= 1L) {
      val off = u32le(b, 18)
      if (off >= 6L && off + 40 <= b.length && u32le(b, off.toInt) == 40L) {
        val w = u32le(b, off.toInt + 4).toInt
        val h2 = u32le(b, off.toInt + 8).toInt
        if (w > 0 && h2 > 0 && (h2 & 1) == 0)
          return Some(MediaHeader("ico", w.toLong, (h2 / 2).toLong, 3L, 0L))
      }
      return None
    }
    // TIFF: II*\0 / MM\0* then the IFD walk — dims/channels from the
    // required tags; outside the baseline gray/RGB strip scope the
    // walk refuses and the blob stays "unknown"
    if (b.length >= 8 && ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))) {
      tiffInfo(b) match {
        case Some((w, h, ch, _, _, _, _, _)) =>
          return Some(MediaHeader("tiff", w, h, ch, 0L))
        case None => return None
      }
    }
    // PNM: binary netpbm magic (P5 gray / P6 RGB), dims from the
    // ASCII header walk (comments honored)
    if (b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')) {
      pnmInfo(b) match {
        case Some((w, h, ch, _)) =>
          return Some(MediaHeader("pnm", w.toLong, h.toLong, ch.toLong, 0L))
        case None => return None
      }
    }
    // WAV: RIFF/WAVE then chunk walk to "fmt "
    val wav = parseWav(b)
    if (wav.isDefined) return wav
    // PCX: one magic byte (0x0A) + header consistency — RLE encoding,
    // 8 bits/plane, 1 or 3 planes, even bytesPerLine covering width
    if (b.length >= 128 && (b(0) & 0xff) == 0x0a &&
        (b(2) & 0xff) == 1 && (b(3) & 0xff) == 8) {
      val w = (u16le(b, 8) - u16le(b, 4) + 1).toInt
      val h = (u16le(b, 10) - u16le(b, 6) + 1).toInt
      val planes = b(65) & 0xff
      val bpl = u16le(b, 66).toInt
      if (w > 0 && h > 0 && (planes == 1 || planes == 3) &&
          bpl >= w && (bpl & 1) == 0)
        return Some(MediaHeader("pcx", w.toLong, h.toLong, planes.toLong, 0L))
      return None
    }
    // TGA last — the format has NO magic, so admission is pure header
    // consistency: no color map, type 2/10, depth 24, descriptor
    // limited to the top-down bit, positive dims
    if (b.length >= 18 && (b(1) & 0xff) == 0 &&
        ((b(2) & 0xff) == 2 || (b(2) & 0xff) == 10) &&
        u16le(b, 3) == 0L && u16le(b, 5) == 0L && (b(7) & 0xff) == 0 &&
        (b(16) & 0xff) == 24 && ((b(17) & 0xdf) == 0)) {
      val w = u16le(b, 12); val h = u16le(b, 14)
      if (w > 0L && h > 0L)
        return Some(MediaHeader("tga", w, h, 3L, 0L))
    }
    None
  }

  private def parseWav(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length >= 20 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var pos = 12
      while (pos + 8 <= b.length) {
        val size = u32le(b, pos + 4)
        if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' && b(pos + 3) == ' ') {
          if (pos + 16 > b.length || size < 8) return None
          return Some(MediaHeader("wav", 0L, 0L, u16le(b, pos + 10), u32le(b, pos + 12)))
        }
        // a declared size past the blob is malformed — and unguarded,
        // a crafted u32 would overflow toInt negative and walk pos
        // BACKWARD (an infinite loop on hostile input)
        if (size > b.length) return None
        pos += 8 + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
      }
      return None
    }
    None
  }

  /** RFC 2083 §6.6 Paeth predictor — exact spec tie-breaking (a, then
    * b, then c), shared by filter reversal and the fixture encoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /**
   * REAL PNG pixel decode, pure JVM: PNG's pixel stream is plain zlib
   * deflate and `java.util.zip.Inflater` is in every JRE, so unlike
   * JPEG (entropy decode genuinely needs a codec library) the pixel
   * stage can be real. Concatenates IDAT chunks in order, inflates to
   * the IHDR-derived size, and reverses the five per-scanline filters
   * (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supports ALL legal
   * depth/color combinations (PNG 11.2.2): depths 1/2/4 for grayscale
   * and palette (MSB-first unpack; gray samples scale by 255/(2^d−1),
   * the standard visual mapping; palette images return their raw
   * index bytes — the per-byte featurizer treats them as the sample
   * stream), depth 8 everywhere, and depth 16 for everything but
   * palette (big-endian; the emitted byte is the high byte — the same
   * top-bits display mapping the 12-bit JPEG path uses, so the output
   * schema stays one byte per sample regardless of depth). Filtering
   * is byte-granular with the spec's bpp = max(1, bits/8) left
   * neighbor. Both interlace methods — Adam7 sub-images are
   * defiltered against their own neighbors and scattered to frame
   * positions. Returns None for anything else, for a truncated or
   * corrupt deflate stream, an undefined filter byte, or hostile chunk
   * lengths — callers fall back to compressed-blob features, the same
   * honest-fallback contract as unknown formats. `maxPixelBytes` caps
   * the inflate target so a crafted 2^31-pixel IHDR cannot allocate
   * the executor away (the WAV size-overflow lesson applied to
   * decompression).
   */
  private[graft] def decodePngPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 33 || !b.startsWith(PngSig)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val width = u32be(b, 16)
    val height = u32be(b, 20)
    val depth = b(24) & 0xff
    val color = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (interlace > 1) return None
    val samples = color match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // legal depth/color combos (PNG 11.2.2): sub-byte only for
    // grayscale and palette, 16-bit for everything but palette
    val okDepth = depth match {
      case 8 => true
      case 16 => color != 3
      case 1 | 2 | 4 => color == 0 || color == 3
      case _ => false
    }
    if (!okDepth) return None
    val bitsPerPixel = samples * depth
    // filtering is byte-granular: the "left" neighbor is bpp BYTES
    // back, bpp = max(1, bits/8) (RFC 2083 §6.2)
    val bpp = math.max(1, bitsPerPixel / 8)
    def rowBytes(wp: Int): Int = ((wp.toLong * bitsPerPixel + 7) / 8).toInt
    // gray sub-byte samples scale to the visual range; palette
    // indices pass through raw; 16-bit emits the high byte
    val subByteScale = depth match {
      case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
    }
    val scaleSubByte = color == 0
    if (width <= 0 || height <= 0) return None
    val stride = width * samples
    // pass geometry: Adam7's seven sub-images (RFC 2083 §2.6 —
    // entirely-empty passes contribute no bytes, not even filter
    // bytes), or one full-frame pass when not interlaced
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val dims = passes.map { case (x0, y0, dx, dy) =>
      val wp = if (width > x0) (((width - x0) + dx - 1) / dx).toInt else 0
      val hp = if (height > y0) (((height - y0) + dy - 1) / dy).toInt else 0
      (wp, hp)
    }
    val rawLen = dims.map { case (wp, hp) =>
      if (wp == 0 || hp == 0) 0L else hp.toLong * (1 + rowBytes(wp).toLong) }.sum
    if (rawLen <= 0 || rawLen > maxPixelBytes) return None
    // chunk walk: gather IDAT payloads (lengths guarded like the WAV walk)
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    while (pos + 12 <= b.length) {
      val len = u32be(b, pos)
      if (len > b.length || pos + 12 + len > b.length) return None
      val t0 = b(pos + 4); val t1 = b(pos + 5); val t2 = b(pos + 6); val t3 = b(pos + 7)
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T')
        idat.write(b, pos + 8, len.toInt)
      if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') pos = b.length
      else pos += 12 + len.toInt // length + type + data + crc
    }
    if (idat.size() == 0) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // reverse the per-scanline filters pass by pass (each pass filters
    // against ITS OWN neighbors, RFC 2083 §6.2), then scatter into
    // frame positions; the non-interlaced case is one full-frame pass
    // that arraycopies straight through
    val px = new Array[Byte](height.toInt * stride.toInt)
    val w = width.toInt
    var inOff = 0
    var p = 0
    while (p < passes.length) {
      val (x0, y0, dx, dy) = passes(p)
      val (wp, hp) = dims(p)
      if (wp > 0 && hp > 0) {
        val pst = rowBytes(wp)
        val pass = new Array[Byte](hp * pst)
        var r = 0
        while (r < hp) {
          val f = raw(inOff) & 0xff
          if (f > 4) return None // undefined filter byte — corrupt stream
          val rowOff = r * pst
          var c = 0
          while (c < pst) {
            val x = raw(inOff + 1 + c) & 0xff
            val a = if (c >= bpp) pass(rowOff + c - bpp) & 0xff else 0
            val up = if (r > 0) pass(rowOff - pst + c) & 0xff else 0
            val ul = if (r > 0 && c >= bpp) pass(rowOff - pst + c - bpp) & 0xff else 0
            val v = f match {
              case 0 => x
              case 1 => x + a
              case 2 => x + up
              case 3 => x + (a + up) / 2
              case 4 => x + paeth(a, up, ul)
            }
            pass(rowOff + c) = (v & 0xff).toByte
            c += 1
          }
          inOff += 1 + pst
          r += 1
        }
        // defiltered bytes -> ONE BYTE PER SAMPLE for this pass:
        // depth 8 passes through, 16 keeps the big-endian high byte,
        // sub-byte depths unpack MSB-first (left pixel in high bits)
        // and scale gray to the visual range (indices stay raw)
        val sst = wp * samples
        val ps = if (depth == 8) pass else {
          val out = new Array[Byte](hp * sst)
          var rr = 0
          while (rr < hp) {
            val rowOff = rr * pst
            var s = 0
            while (s < sst) {
              val v =
                if (depth == 16) pass(rowOff + s * 2) & 0xff
                else {
                  val bitPos = s * depth
                  val byteV = pass(rowOff + (bitPos >> 3)) & 0xff
                  val shift = 8 - depth - (bitPos & 7)
                  val rawV = (byteV >> shift) & ((1 << depth) - 1)
                  if (scaleSubByte) rawV * subByteScale else rawV
                }
              out(rr * sst + s) = (v & 0xff).toByte
              s += 1
            }
            rr += 1
          }
          out
        }
        val pSst = if (depth == 8) pst else sst
        if (dx == 1 && dy == 1 && x0 == 0 && y0 == 0) {
          System.arraycopy(ps, 0, px, 0, ps.length)
        } else {
          r = 0
          while (r < hp) {
            var cc = 0
            while (cc < wp) {
              var ch = 0
              while (ch < samples) {
                px(((y0 + r * dy) * w + (x0 + cc * dx)) * samples + ch) =
                  ps(r * pSst + cc * samples + ch)
                ch += 1
              }
              cc += 1
            }
            r += 1
          }
        }
      }
      p += 1
    }
    Some(px)
  }

  /**
   * Minimal REAL PNG encoder for 8-bit grayscale (fixture/test input
   * synthesis — the planted-input technique of the media queries, at
   * the pixel level): each scanline filtered per `filterOfRow` (0-4,
   * exercising every reversal path in [[decodePngPixels]]), deflated
   * with `java.util.zip.Deflater`, correct chunk CRCs. The decoder
   * must invert this byte-exactly; the driver oracle predicts the
   * PIXELS from the same arithmetic that generated them.
   */
  private[graft] def encodePngGray(pixels: Array[Byte], width: Int, height: Int,
                                   filterOfRow: Int => Int,
                                   interlace: Boolean = false): Array[Byte] = {
    require(pixels.length == width * height, "pixels must be width*height")
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val crc = new java.util.zip.CRC32()
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val tb = tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bos.write(be32(data.length.toLong), 0, 4)
      crc.reset(); crc.update(tb); crc.update(data)
      bos.write(tb, 0, 4); bos.write(data, 0, data.length)
      bos.write(be32(crc.getValue), 0, 4)
    }
    bos.write(PngSig, 0, PngSig.length)
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 0, 0, 0, if (interlace) 1 else 0)) // depth 8, gray
    // build the filtered raw stream pass by pass (one full-frame pass
    // when not interlaced; Adam7's seven sub-images otherwise, each
    // gathered then filtered against its own neighbors)
    val passes: Array[(Int, Int, Int, Int)] =
      if (!interlace) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val rawOut = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- passes) {
      val wp = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val hp = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val pp = new Array[Byte](hp * wp)
        var r = 0
        while (r < hp) {
          var c = 0
          while (c < wp) {
            pp(r * wp + c) = pixels((y0 + r * dy) * width + (x0 + c * dx))
            c += 1
          }
          r += 1
        }
        val raw = new Array[Byte](hp * (wp + 1))
        r = 0
        while (r < hp) {
          val f = filterOfRow(r) & 0xff
          require(f <= 4, s"filter $f undefined")
          raw(r * (wp + 1)) = f.toByte
          var c = 0
          while (c < wp) {
            val x = pp(r * wp + c) & 0xff
            val a = if (c > 0) pp(r * wp + c - 1) & 0xff else 0
            val up = if (r > 0) pp((r - 1) * wp + c) & 0xff else 0
            val ul = if (r > 0 && c > 0) pp((r - 1) * wp + c - 1) & 0xff else 0
            val v = f match {
              case 0 => x
              case 1 => x - a
              case 2 => x - up
              case 3 => x - (a + up) / 2
              case 4 => x - paeth(a, up, ul)
            }
            raw(r * (wp + 1) + 1 + c) = (v & 0xff).toByte
            c += 1
          }
          r += 1
        }
        rawOut.write(raw, 0, raw.length)
      }
    }
    val defl = new java.util.zip.Deflater()
    val zout = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(rawOut.toByteArray); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) {
        val n = defl.deflate(buf)
        zout.write(buf, 0, n)
      }
    } finally defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /**
   * Depth-generalized grayscale PNG fixture encoder: values in
   * [0, 2^depth − 1] pack MSB-first at depths 1/2/4, straight at 8,
   * big-endian at 16; filtering runs over the PACKED row bytes with
   * the spec's byte-granular bpp = max(1, depth/8) left neighbor —
   * exactly what [[decodePngPixels]] must invert, including under
   * Adam7 (each sub-image packs and filters its own rows, so pass
   * widths that don't fill a final byte exercise the padding path).
   */
  private[graft] def encodePngGrayDepth(values: Array[Int], width: Int, height: Int,
                                        depth: Int, filterOfRow: Int => Int,
                                        interlace: Boolean = false): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8 || depth == 16)
    require(values.length == width * height, "values must be width*height")
    val maxV = if (depth == 16) 65535 else (1 << depth) - 1
    require(values.forall(v => v >= 0 && v <= maxV), s"values must fit $depth bits")
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val crc = new java.util.zip.CRC32()
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val tb = tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bos.write(be32(data.length.toLong), 0, 4)
      crc.reset(); crc.update(tb); crc.update(data)
      bos.write(tb, 0, 4); bos.write(data, 0, data.length)
      bos.write(be32(crc.getValue), 0, 4)
    }
    bos.write(PngSig, 0, PngSig.length)
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](depth.toByte, 0, 0, 0, if (interlace) 1 else 0))
    val passes: Array[(Int, Int, Int, Int)] =
      if (!interlace) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val bpp = math.max(1, depth / 8)
    val rawOut = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- passes) {
      val wp = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val hp = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val pst = ((wp.toLong * depth + 7) / 8).toInt
        // pack the pass's values into unfiltered row bytes
        val pp = new Array[Byte](hp * pst)
        var r = 0
        while (r < hp) {
          var c = 0
          while (c < wp) {
            val v = values((y0 + r * dy) * width + (x0 + c * dx))
            if (depth == 16) {
              pp(r * pst + c * 2) = ((v >> 8) & 0xff).toByte
              pp(r * pst + c * 2 + 1) = (v & 0xff).toByte
            } else if (depth == 8) {
              pp(r * pst + c) = (v & 0xff).toByte
            } else {
              val bitPos = c * depth
              val shift = 8 - depth - (bitPos & 7)
              val idx = r * pst + (bitPos >> 3)
              pp(idx) = ((pp(idx) & 0xff) | (v << shift)).toByte
            }
            c += 1
          }
          r += 1
        }
        val raw = new Array[Byte](hp * (pst + 1))
        r = 0
        while (r < hp) {
          val f = filterOfRow(r) & 0xff
          require(f <= 4, s"filter $f undefined")
          raw(r * (pst + 1)) = f.toByte
          var c = 0
          while (c < pst) {
            val x = pp(r * pst + c) & 0xff
            val a = if (c >= bpp) pp(r * pst + c - bpp) & 0xff else 0
            val up = if (r > 0) pp((r - 1) * pst + c) & 0xff else 0
            val ul = if (r > 0 && c >= bpp) pp((r - 1) * pst + c - bpp) & 0xff else 0
            val v = f match {
              case 0 => x
              case 1 => x - a
              case 2 => x - up
              case 3 => x - (a + up) / 2
              case 4 => x - paeth(a, up, ul)
            }
            raw(r * (pst + 1) + 1 + c) = (v & 0xff).toByte
            c += 1
          }
          r += 1
        }
        rawOut.write(raw, 0, raw.length)
      }
    }
    val defl = new java.util.zip.Deflater()
    val zout = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(rawOut.toByteArray); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) {
        val n = defl.deflate(buf)
        zout.write(buf, 0, n)
      }
    } finally defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /**
   * REAL WAV sample decode, pure JVM: PCM audio needs no codec at all —
   * the data chunk IS the samples — so like the PNG pixel stage
   * (deflate) the sample stage can be genuinely real here. Walks the
   * RIFF chunks (same hostile-size guards as [[parseWav]]), accepts
   * integer PCM (format 1, or WAVE_FORMAT_EXTENSIBLE 0xFFFE whose
   * subformat code is 1) at 8, 16 or 24 bits, plus IEEE-float (format
   * 3) at 32 bits, and returns the interleaved sample stream as signed
   * ints: 8-bit WAV stores unsigned bytes (centered by convention at
   * 128 → sample = byte − 128), 16-bit signed little-endian, 24-bit
   * three-byte signed little-endian; float samples return quantized to
   * the 16-bit convention (round(f·32767), clamped ±32767 —
   * intBitsToFloat + round is bit-deterministic) so downstream stats
   * see one scale. Returns None — the honest-fallback contract — for
   * compressed formats, other bit depths, NaN float samples, a data
   * chunk whose declared size runs past the blob or isn't a whole
   * number of samples, or a missing fmt/data chunk. `maxSamples` caps
   * the allocation so a crafted RIFF size cannot allocate the executor
   * away (the same lesson as decodePngPixels' inflate cap).
   */
  private[graft] def decodeWavSamples(b: Array[Byte],
                                      maxSamples: Int = 1 << 24): Option[Array[Int]] = {
    if (b == null || b.length < 20) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var fmtCode = -1
    var bits = -1
    var channels = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var dataOff = -1
    var dataLen = -1
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = u32le(b, pos + 4)
      if (size > b.length || pos + 8 + size > b.length) return None
      if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' && b(pos + 3) == ' ') {
        if (size < 16) return None
        fmtCode = u16le(b, pos + 8).toInt
        channels = u16le(b, pos + 10).toInt
        blockAlign = u16le(b, pos + 20).toInt
        bits = u16le(b, pos + 22).toInt
        // IMA ADPCM (format 0x11): wSamplesPerBlock is the u16 right
        // after cbSize (fmt+18 within the chunk body)
        if (fmtCode == 0x11 && size >= 20)
          samplesPerBlock = u16le(b, pos + 8 + 18).toInt
        // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        // bytes of the 16-byte SubFormat GUID at fmt+24 (cbSize 22)
        if (fmtCode == 0xfffe) {
          if (size < 40) return None
          fmtCode = u16le(b, pos + 8 + 24).toInt
        }
      } else if (b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' && b(pos + 3) == 'a') {
        dataOff = pos + 8
        dataLen = size.toInt
      }
      pos += 8 + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
    }
    if (dataOff < 0) return None
    // WAVE_FORMAT_IEEE_FLOAT (3) at 32 bits: samples are [-1,1] floats;
    // they return quantized to the 16-bit signed convention the integer
    // paths use (round(f*32767), clamped) so downstream stats see ONE
    // scale. Float.intBitsToFloat + round is bit-deterministic.
    if (fmtCode == 3) {
      if (bits != 32 || (dataLen & 3) != 0) return None
      val n = dataLen / 4
      if (n > maxSamples) return None
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val o = dataOff + 4 * i
        val f = java.lang.Float.intBitsToFloat(
          (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | (b(o + 3) << 24))
        if (java.lang.Float.isNaN(f)) return None // NaN samples: corruption
        val v = math.round(f * 32767.0f)
        out(i) = if (v < -32767) -32767 else if (v > 32767) 32767 else v
        i += 1
      }
      return Some(out)
    }
    // IMA/DVI ADPCM (format 0x11), mono: block-aligned nibble streams.
    // Each block = 4-byte header (signed 16-bit initial predictor,
    // step-table index 0..88, reserved) + (blockAlign−4) nibble bytes,
    // LOW nibble first; the header predictor IS the block's first
    // sample, so samplesPerBlock must be (blockAlign−4)·2 + 1. The
    // recurrence is pure integer (step>>3 base delta + optional
    // step, step>>1, step>>2 terms; clamp; table-stepped index), so
    // decoded samples replay bit-for-bit in SQL — the oracle runs the
    // same 89-entry step table through a recursive CTE.
    if (fmtCode == 0x11) {
      if (channels != 1 || bits != 4 || blockAlign < 5) return None
      if (samplesPerBlock != (blockAlign - 4) * 2 + 1) return None
      if (dataLen % blockAlign != 0) return None
      val nBlocks = dataLen / blockAlign
      val total = nBlocks.toLong * samplesPerBlock
      if (total > maxSamples) return None
      val out = new Array[Int](total.toInt)
      var o = 0
      var blk = 0
      while (blk < nBlocks) {
        val base = dataOff + blk * blockAlign
        var pred = ((b(base) & 0xff) | (b(base + 1) << 8)).toShort.toInt
        var idx = b(base + 2) & 0xff
        if (idx > 88 || b(base + 3) != 0) return None
        out(o) = pred; o += 1
        var i = 0
        while (i < blockAlign - 4) {
          val byte = b(base + 4 + i) & 0xff
          var half = 0
          while (half < 2) {
            val nib = if (half == 0) byte & 0xf else byte >> 4
            val step = AdpcmStep(idx)
            var diff = step >> 3
            if ((nib & 1) != 0) diff += step >> 2
            if ((nib & 2) != 0) diff += step >> 1
            if ((nib & 4) != 0) diff += step
            pred = if ((nib & 8) != 0) pred - diff else pred + diff
            if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
            idx += AdpcmIndex(nib)
            if (idx < 0) idx = 0 else if (idx > 88) idx = 88
            out(o) = pred; o += 1
            half += 1
          }
          i += 1
        }
        blk += 1
      }
      return Some(out)
    }
    // G.711 companded telephony (format 6 = A-law, 7 = mu-law): one
    // byte per sample, ALGORITHMIC expansion to the shared 16-bit
    // convention (segment + mantissa arithmetic straight from the
    // ITU-T G.711 tables' generating formulas — no lookup table to
    // transcribe, so the oracle replays the same integer expression)
    if (fmtCode == 6 || fmtCode == 7) {
      if (bits != 8) return None
      if (dataLen > maxSamples) return None
      val out = new Array[Int](dataLen)
      var i = 0
      while (i < dataLen) {
        val v = b(dataOff + i) & 0xff
        out(i) = if (fmtCode == 7) mulawExpand(v) else alawExpand(v)
        i += 1
      }
      return Some(out)
    }
    if (fmtCode != 1) return None
    bits match {
      case 8 =>
        if (dataLen > maxSamples) return None
        val out = new Array[Int](dataLen)
        var i = 0
        while (i < dataLen) { out(i) = (b(dataOff + i) & 0xff) - 128; i += 1 }
        Some(out)
      case 16 =>
        if ((dataLen & 1) != 0) return None // half a sample is corruption
        val n = dataLen / 2
        if (n > maxSamples) return None
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((b(dataOff + 2 * i) & 0xff) | (b(dataOff + 2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        Some(out)
      case 24 =>
        // studio-masters PCM: 3-byte signed little-endian
        if (dataLen % 3 != 0) return None
        val n = dataLen / 3
        if (n > maxSamples) return None
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val o = dataOff + 3 * i
          out(i) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) << 16))
          i += 1
        }
        Some(out)
      case _ => None
    }
  }

  /**
   * Minimal REAL WAV/PCM encoder (fixture synthesis, the
   * [[encodePngGray]] counterpart for audio): canonical
   * RIFF/fmt/data layout, integer PCM at 8 or 16 bits. Samples are the
   * signed convention [[decodeWavSamples]] returns (8-bit inputs must
   * be −128..127 and are stored offset by +128; 16-bit are stored
   * signed little-endian), interleaved when `channels > 1`.
   */
  private[graft] def encodeWavPcm(samples: Array[Int], bits: Int,
                                  channels: Int, sampleRate: Int): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24, "integer PCM at 8/16/24 bits only")
    require(samples.length % channels == 0, "samples must be whole interleaved frames")
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + (dataLen & 1))
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bytesPer)      // byte rate
      .putShort((channels * bytesPer).toShort)       // block align
      .putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      if (bits == 8) buf.put((samples(i) + 128).toByte)
      else if (bits == 16) buf.putShort(samples(i).toShort)
      else { // 24-bit: 3 bytes little-endian
        val v = samples(i)
        buf.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte).put(((v >> 16) & 0xff).toByte)
      }
      i += 1
    }
    if ((dataLen & 1) != 0) buf.put(0.toByte) // RIFF word-alignment pad
    buf.array()
  }

  /**
   * G.711 mu-law byte -> linear 16-bit sample (ITU-T G.711 segment
   * arithmetic: complement, 3-bit segment exponent, 4-bit mantissa,
   * bias 0x84; peak ±32124). Pure integers — the oracle replays the
   * identical expression in SQL.
   */
  private[graft] def mulawExpand(v: Int): Int = {
    val u = ~v & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte -> linear 16-bit sample (XOR 0x55 toggle,
    * segment 0 special-cased, sign bit SET = positive; peak ±32256). */
  private[graft] def alawExpand(v: Int): Int = {
    val a = v ^ 0x55
    val exp = (a >> 4) & 0x07
    val mant = (a & 0x0f) << 4
    val t = if (exp == 0) mant + 8 else (mant + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** Single-channel G.711 WAV writer — the fixture counterpart of the
    * decoder's format-6/7 branch: `companded` is the raw byte stream. */
  private[graft] def encodeWavG711(companded: Array[Byte], fmtCode: Int,
                                   sampleRate: Int): Array[Byte] = {
    require(fmtCode == 6 || fmtCode == 7, "G.711 is format 6 (A-law) or 7 (mu-law)")
    val dataLen = companded.length
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + (dataLen & 1))
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode.toShort).putShort(1).putInt(sampleRate)
      .putInt(sampleRate).putShort(1).putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.put(companded)
    if ((dataLen & 1) != 0) buf.put(0.toByte)
    buf.array()
  }

  /** IMA ADPCM quantizer step table (IMA ADPCM specification, 89
    * entries) and index-adjust table — shared by the decoder and the
    * oracle's recursive-CTE replay. */
  private[graft] val AdpcmStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val AdpcmIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM WAV writer from RAW blocks — the fixture counterpart of
    * the format-0x11 decode path: each block is (initial predictor,
    * step index, nibble bytes); all blocks must share one length so
    * blockAlign/samplesPerBlock describe them all. Planting nibbles
    * directly (instead of encoding PCM) keeps the fixture exact — the
    * codec is lossy in the PCM→nibble direction but deterministic in
    * the direction under test. */
  private[graft] def encodeWavAdpcm(blocks: Array[(Int, Int, Array[Byte])],
                                    sampleRate: Int): Array[Byte] = {
    require(blocks.nonEmpty, "at least one block")
    val nData = blocks(0)._3.length
    require(blocks.forall(_._3.length == nData) && nData >= 1,
      "all blocks must carry the same nibble-byte count")
    val blockAlign = 4 + nData
    val samplesPerBlock = nData * 2 + 1
    val dataLen = blocks.length * blockAlign
    val buf = java.nio.ByteBuffer.allocate(48 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataLen + (dataLen & 1))
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // nominal byte rate
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(samplesPerBlock.toShort)     // cbSize, wSamplesPerBlock
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for ((pred, idx, nibbles) <- blocks) {
      require(pred >= -32768 && pred <= 32767 && idx >= 0 && idx <= 88, "block header range")
      buf.putShort(pred.toShort).put(idx.toByte).put(0.toByte).put(nibbles)
    }
    if ((dataLen & 1) != 0) buf.put(0.toByte)
    buf.array()
  }

  /** IEEE-float WAV encoder (format code 3, 32-bit) — the fixture
    * counterpart of [[decodeWavSamples]]' float path. */
  private[graft] def encodeWavFloat(samples: Array[Float],
                                    channels: Int, sampleRate: Int): Array[Byte] = {
    require(samples.length % channels == 0, "samples must be whole interleaved frames")
    val dataLen = samples.length * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(3).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 4)
      .putShort((channels * 4).toShort)
      .putShort(32)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putFloat)
    buf.array()
  }

  /**
   * REAL BMP decode — 24-bit uncompressed DIB (40-byte
   * BITMAPINFOHEADER, BI_RGB), the Windows bitmap still common in
   * scraped corpora precisely because no codec is involved. Handles
   * BOTH row orders the public format allows: biHeight > 0 stores
   * rows BOTTOM-UP (the common case), biHeight < 0 TOP-DOWN; output
   * is always the LOGICAL top-down row-major BGR stream (per-pixel
   * byte order as stored), so the two orientations of the same image
   * decode identically — the planted-query oracle pins this through
   * an order-sensitive resample stage. File rows are 4-byte aligned;
   * padding is skipped, never emitted. Honest-refusal scope (None →
   * compressed-blob fallback): bit depths other than 24, any
   * compression (RLE/bitfields), core/V4/V5 header sizes. All size
   * arithmetic in Long against crafted headers ([[decodePngPixels]]'
   * allocation-bomb lesson); `maxPixelBytes` caps the output buffer.
   */
  private[graft] def decodeBmpPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (u32le(b, 14) != 40L) return None
    val off = u32le(b, 10)
    val w = u32le(b, 18).toInt
    val hRaw = u32le(b, 22).toInt
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue) return None
    if (u16le(b, 26) != 1L || u16le(b, 28) != 24L || u32le(b, 30) != 0L) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val rowBytes = w.toLong * 3
    val stride = (rowBytes + 3) & ~3L
    if (rowBytes * h > maxPixelBytes) return None
    if (off < 54L || off + stride * h > b.length) return None
    val out = new Array[Byte]((rowBytes * h).toInt)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      System.arraycopy(b, (off + srcRow * stride).toInt, out, (y * rowBytes).toInt, rowBytes.toInt)
      y += 1
    }
    Some(out)
  }

  /**
   * REAL ICO decode — the Windows icon container favicons still ship
   * in: ICONDIR (reserved 0, type 1, count ≥ 1), the FIRST
   * ICONDIRENTRY's payload, which for the classic uncompressed form
   * is a BITMAPINFOHEADER whose biHeight is DOUBLED (XOR color rows +
   * AND monochrome mask rows share one header). Decodes the 24-bit
   * XOR image to the logical top-down BGR stream — [[decodeBmpPixels]]'
   * output convention, so the downstream stages treat icons exactly
   * like bitmaps; the AND mask is validated in-bounds and skipped
   * (callers of a pixel STATS stage have no alpha channel to carry).
   * Honest-refusal scope: PNG-compressed entries (favicon .ico with
   * embedded PNG — route those through [[decodePngPixels]] by
   * re-sniffing the payload), depths other than 24, multi-entry
   * selection beyond the first. Long-guarded header math throughout.
   */
  private[graft] def decodeIcoPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 22) return None
    if (u16le(b, 0) != 0L || u16le(b, 2) != 1L) return None
    val count = u16le(b, 4)
    if (count < 1L || 6 + count * 16 > b.length) return None
    val off = u32le(b, 18)
    val size = u32le(b, 14)
    if (off < 6L || size < 40L || off + size > b.length) return None
    val h0 = off.toInt
    if (u32le(b, h0) != 40L) return None
    val w = u32le(b, h0 + 4).toInt
    val h2 = u32le(b, h0 + 8).toInt // DOUBLED height (XOR + AND)
    if (w <= 0 || h2 <= 0 || (h2 & 1) != 0) return None
    val h = h2 / 2
    if (u16le(b, h0 + 12) != 1L || u16le(b, h0 + 14) != 24L || u32le(b, h0 + 16) != 0L) return None
    val rowBytes = w.toLong * 3
    val stride = (rowBytes + 3) & ~3L
    val maskStride = ((w.toLong + 31) / 32) * 4
    if (rowBytes * h > maxPixelBytes) return None
    val pixOff = h0 + 40L
    // XOR rows (bottom-up) then AND rows must BOTH fit the entry
    if (pixOff + stride * h + maskStride * h > off + size) return None
    val out = new Array[Byte]((rowBytes * h).toInt)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // ICO XOR images are always bottom-up
      System.arraycopy(b, (pixOff + srcRow * stride).toInt, out, (y * rowBytes).toInt, rowBytes.toInt)
      y += 1
    }
    Some(out)
  }

  /** Single-image 24-bit ICO writer — the fixture counterpart of
    * [[decodeIcoPixels]]: `px` is the logical top-down BGR stream;
    * the stored XOR rows are bottom-up with an all-zero AND mask. */
  private[graft] def encodeIco24(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h * 3, "px must be w*h*3 BGR bytes")
    require(w <= 256 && h <= 256, "ICONDIRENTRY dims are bytes (256 encodes as 0)")
    val rowBytes = w * 3
    val stride = (rowBytes + 3) & ~3
    val maskStride = ((w + 31) / 32) * 4
    val imgSize = 40 + stride * h + maskStride * h
    val buf = java.nio.ByteBuffer.allocate(6 + 16 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(0).putShort(1).putShort(1)
    buf.put((w % 256).toByte).put((h % 256).toByte).put(0.toByte).put(0.toByte)
      .putShort(1).putShort(24).putInt(imgSize).putInt(22)
    buf.putInt(40).putInt(w).putInt(h * 2)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h + maskStride * h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val arr = buf.array()
    val pixOff = 6 + 16 + 40
    var y = 0
    while (y < h) {
      val dstRow = h - 1 - y
      System.arraycopy(px, y * rowBytes, arr, pixOff + dstRow * stride, rowBytes)
      y += 1
    }
    arr // AND mask rows stay zero-filled
  }

  /**
   * REAL TGA decode — the Truevision format game-asset and
   * texture corpora still ship because, like BMP, no codec is
   * involved. 24-bit truecolor only, image types 2 (uncompressed)
   * and 10 (run-length encoded): RLE packets are a header byte —
   * high bit set = run of `(n&0x7f)+1` copies of ONE following
   * pixel, clear = `n+1` literal pixels — filling the raster
   * sequentially (packets may cross row boundaries; the count is
   * what matters). TGA has NO magic number, so admission is the
   * header-consistency sniff [[parseHeader]] uses: no color map,
   * depth 24, descriptor bits limited to top-down (0x20). The
   * identification field (`idLength`) is skipped per spec. Output is
   * the logical top-down row-major BGR stream ([[decodeBmpPixels]]'
   * convention): descriptor bit 5 set = rows stored top-down, clear
   * = bottom-up (the TGA default), both orientations decode to the
   * same logical stream. Honest-refusal scope: color-mapped images,
   * depths other than 24, right-to-left pixel order (descriptor bit
   * 4), types 1/3/9/11. Long-guarded math; `maxPixelBytes` caps the
   * output against dimension bombs.
   */
  private[graft] def decodeTgaPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 18) return None
    val idLen = b(0) & 0xff
    if ((b(1) & 0xff) != 0) return None // color-mapped: out of scope
    val imgType = b(2) & 0xff
    if (imgType != 2 && imgType != 10) return None
    // color-map spec must be all-zero when colorMapType is 0
    if (u16le(b, 3) != 0L || u16le(b, 5) != 0L || (b(7) & 0xff) != 0) return None
    val w = u16le(b, 12).toInt
    val h = u16le(b, 14).toInt
    if (w <= 0 || h <= 0) return None
    if ((b(16) & 0xff) != 24) return None
    val desc = b(17) & 0xff
    if ((desc & 0xdf) != 0) return None // only bit 5 (top-down) in scope
    val topDown = (desc & 0x20) != 0
    val rowBytes = w.toLong * 3
    if (rowBytes * h > maxPixelBytes) return None
    val total = (rowBytes * h).toInt
    val raster = new Array[Byte](total)
    var src = 18 + idLen
    if (imgType == 2) {
      if (src.toLong + total > b.length) return None
      System.arraycopy(b, src, raster, 0, total)
    } else {
      var out = 0
      while (out < total) {
        if (src >= b.length) return None
        val hdr = b(src) & 0xff; src += 1
        val n = (hdr & 0x7f) + 1
        if (n.toLong * 3 > total - out) return None // packet overruns raster
        if ((hdr & 0x80) != 0) {
          if (src + 3 > b.length) return None
          var i = 0
          while (i < n) {
            raster(out) = b(src); raster(out + 1) = b(src + 1); raster(out + 2) = b(src + 2)
            out += 3; i += 1
          }
          src += 3
        } else {
          if (src + n * 3 > b.length) return None
          System.arraycopy(b, src, raster, out, n * 3)
          out += n * 3; src += n * 3
        }
      }
    }
    if (topDown) return Some(raster)
    val outPx = new Array[Byte](total)
    var y = 0
    while (y < h) {
      System.arraycopy(raster, ((h - 1 - y) * rowBytes).toInt, outPx,
        (y * rowBytes).toInt, rowBytes.toInt)
      y += 1
    }
    Some(outPx)
  }

  /** 24-bit TGA encoder — the fixture counterpart of
    * [[decodeTgaPixels]]: `px` is the logical top-down BGR stream;
    * `rle` picks image type 10 with per-row run/literal packets
    * (runs capped at 128 per spec), `topDown` sets descriptor bit 5. */
  private[graft] def encodeTga24(px: Array[Byte], w: Int, h: Int,
                                 rle: Boolean = false,
                                 topDown: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h * 3, "px must be w*h*3 BGR bytes")
    require(w <= 0xffff && h <= 0xffff, "TGA dims are u16")
    val rowBytes = w * 3
    val header = new Array[Byte](18)
    header(2) = (if (rle) 10 else 2).toByte
    header(12) = (w & 0xff).toByte; header(13) = ((w >> 8) & 0xff).toByte
    header(14) = (h & 0xff).toByte; header(15) = ((h >> 8) & 0xff).toByte
    header(16) = 24.toByte
    header(17) = (if (topDown) 0x20 else 0x00).toByte
    val rows = (0 until h).map { y =>
      val sy = if (topDown) y else h - 1 - y
      px.slice(sy * rowBytes, sy * rowBytes + rowBytes)
    }
    if (!rle) return header ++ rows.flatten
    val outBuf = scala.collection.mutable.ArrayBuffer[Byte]()
    outBuf ++= header
    for (row <- rows) {
      var p = 0
      val nPix = w
      while (p < nPix) {
        def pixEq(i: Int, j: Int): Boolean =
          row(i * 3) == row(j * 3) && row(i * 3 + 1) == row(j * 3 + 1) &&
            row(i * 3 + 2) == row(j * 3 + 2)
        var run = 1
        while (p + run < nPix && run < 128 && pixEq(p + run, p)) run += 1
        if (run >= 2) {
          outBuf += (0x80 | (run - 1)).toByte
          outBuf += row(p * 3); outBuf += row(p * 3 + 1); outBuf += row(p * 3 + 2)
          p += run
        } else {
          var lit = 1
          while (p + lit < nPix && lit < 128 &&
            !(p + lit + 1 < nPix && pixEq(p + lit, p + lit + 1))) lit += 1
          outBuf += (lit - 1).toByte
          outBuf ++= row.slice(p * 3, (p + lit) * 3)
          p += lit
        }
      }
    }
    outBuf.toArray
  }

  /**
   * REAL PNM decode — binary netpbm (P5 grayscale / P6 RGB), the
   * zero-dependency interchange raster of CV tooling. Header is
   * ASCII: magic, then width, height, maxval as whitespace-separated
   * tokens with `#`-to-newline comments allowed between them, then
   * EXACTLY ONE whitespace byte before the raster (the spec's single
   * delimiter — consuming a run would mis-shift rasters whose first
   * sample is itself a whitespace byte value). Maxval must be 255
   * (8-bit); rasters are already top-down row-major, emitted as-is.
   * Honest-refusal scope: the ASCII formats P1–P3, bitmap P4, PAM
   * (P7), maxval ≠ 255, truncated or oversized payloads.
   */
  private[graft] def decodePnmPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    pnmInfo(b) match {
      case Some((w, h, ch, dataOff)) =>
        val total = w.toLong * h * ch
        if (total > maxPixelBytes) return None
        if (dataOff.toLong + total != b.length) return None // exact payload
        Some(java.util.Arrays.copyOfRange(b, dataOff, dataOff + total.toInt))
      case None => None
    }
  }

  /** Shared P5/P6 header walk: (width, height, channels, dataOffset). */
  private def pnmInfo(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b == null || b.length < 9 || b(0) != 'P' || (b(1) != '5' && b(1) != '6'))
      return None
    val ch = if (b(1) == '6') 3 else 1
    var pos = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def nextInt(): Long = {
      while (pos < b.length && (isWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      var v = -1L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9' && v < Int.MaxValue) {
        v = (if (v < 0) 0L else v) * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval != 255L) return None
    if (pos >= b.length || !isWs(b(pos))) return None
    Some((w.toInt, h.toInt, ch, pos + 1))
  }

  /** P5/P6 encoder — the fixture counterpart of [[decodePnmPixels]]:
    * `px` is the top-down raster (gray or interleaved RGB). */
  private[graft] def encodePnm(px: Array[Byte], w: Int, h: Int,
                               channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 3, "PNM is P5 (1ch) or P6 (3ch)")
    require(w > 0 && h > 0 && px.length == w * h * channels, "px must be w*h*ch")
    val magic = if (channels == 3) "P6" else "P5"
    s"$magic\n# graft fixture\n$w $h\n255\n".getBytes("US-ASCII") ++ px
  }

  /**
   * REAL QOI decode — the "Quite OK Image" format (qoiformat.org,
   * public single-page spec, 2022), the no-dependency lossless
   * format screenshot/texture corpora increasingly ship because it
   * en/decodes at memcpy-class speed. 14-byte header (magic "qoif",
   * big-endian dims, 3/4 channels, srgb/linear flag), then a byte
   * stream of six ops against DECODER STATE — a previous pixel and a
   * 64-slot recently-seen array keyed `(3r+5g+7b+11a) mod 64`:
   *
   *   0xFE r g b       QOI_OP_RGB    (alpha carried over)
   *   0xFF r g b a     QOI_OP_RGBA
   *   00iiiiii         QOI_OP_INDEX  (recently-seen slot i)
   *   01rrggbb         QOI_OP_DIFF   (per-channel −2..1, wrapping)
   *   10gggggg rrrrbbbb QOI_OP_LUMA  (dg −32..31; dr−dg, db−dg −8..7)
   *   11cccccc         QOI_OP_RUN    (1..62 repeats of previous pixel)
   *
   * and the 8-byte end marker 00×7 01. Every emitted pixel is written
   * into its index slot (runs too — idempotent). The stream must
   * produce EXACTLY w·h pixels and stop inside the marker — over- or
   * under-runs refuse (None → honest compressed-blob fallback), as do
   * bad magic/channels/colorspace and dimension bombs past
   * `maxPixelBytes`. Output is the natural row-major RGB(A) stream.
   */
  private[graft] def decodeQoiPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 14 + 8) return None
    if (!(b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f')) return None
    val w = u32be(b, 4)
    val h = u32be(b, 8)
    val ch = b(12) & 0xff
    val cs = b(13) & 0xff
    if (w <= 0L || h <= 0L || (ch != 3 && ch != 4) || cs > 1) return None
    // bound each dimension BEFORE multiplying: w/h are raw u32be (up to
    // 2^32−1), so w·h·ch would wrap Long for hostile headers and a
    // wrapped total==0 would bypass the bomb cap AND the caller's
    // w·h·ch length check via the same wraparound
    if (w > maxPixelBytes || h > maxPixelBytes) return None
    val total = w * h * ch // overflow-free: both factors ≤ 2^26
    if (total > maxPixelBytes) return None
    // end marker is spec-mandatory: seven 0x00 then 0x01
    val end = b.length - 8
    var i = 0
    while (i < 7) { if (b(end + i) != 0) return None; i += 1 }
    if (b(end + 7) != 1) return None
    val out = new Array[Byte](total.toInt)
    val idx = new Array[Int](64) // packed rgba
    var r = 0; var g = 0; var bl = 0; var a = 255
    var p = 14
    var o = 0
    val n = total.toInt
    while (o < n) {
      if (p >= end) return None
      val b0 = b(p) & 0xff; p += 1
      var run = 1
      if (b0 == 0xfe) {
        if (p + 3 > end) return None
        r = b(p) & 0xff; g = b(p + 1) & 0xff; bl = b(p + 2) & 0xff; p += 3
      } else if (b0 == 0xff) {
        if (p + 4 > end) return None
        r = b(p) & 0xff; g = b(p + 1) & 0xff; bl = b(p + 2) & 0xff; a = b(p + 3) & 0xff; p += 4
      } else (b0 >> 6) match {
        case 0 =>
          val v = idx(b0 & 0x3f)
          r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff; bl = (v >>> 8) & 0xff; a = v & 0xff
        case 1 =>
          r = (r + ((b0 >> 4) & 3) - 2) & 0xff
          g = (g + ((b0 >> 2) & 3) - 2) & 0xff
          bl = (bl + (b0 & 3) - 2) & 0xff
        case 2 =>
          if (p + 1 > end) return None
          val b1 = b(p) & 0xff; p += 1
          val dg = (b0 & 0x3f) - 32
          r = (r + dg - 8 + ((b1 >> 4) & 0xf)) & 0xff
          g = (g + dg) & 0xff
          bl = (bl + dg - 8 + (b1 & 0xf)) & 0xff
        case _ =>
          run = (b0 & 0x3f) + 1 // 1..62 (63/62 tags are RGB/RGBA above)
      }
      if (o + run * ch > n) return None
      var k = 0
      while (k < run) {
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bl.toByte
        if (ch == 4) out(o + 3) = a.toByte
        o += ch
        k += 1
      }
      idx((r * 3 + g * 5 + bl * 7 + a * 11) % 64) =
        (r << 24) | (g << 16) | (bl << 8) | a
    }
    if (p != end) return None // trailing garbage before the marker
    Some(out)
  }

  /** Real QOI encoder — the fixture counterpart of
    * [[decodeQoiPixels]], implementing the reference encode policy:
    * RUN for repeats (flushed at 62), INDEX on a seen-array hit, then
    * DIFF / LUMA on wrapping deltas, RGB(A) as the fallback. `px` is
    * the row-major RGB(A) stream. */
  /**
   * farbfeld decode — suckless.org's deliberately trivial lossless
   * format (tools.suckless.org/farbfeld): 8-byte magic "farbfeld",
   * u32be width/height, then w·h RGBA pixels of four u16be components
   * each. The repo's first 16-bit-depth source: components downscale
   * to 8 bits by taking the HIGH byte (the exact inverse of the
   * standard v·257 8→16 expansion, so 8-bit-origin images round-trip
   * bit-exactly). The stream length must be EXACTLY 16 + w·h·8 bytes
   * — trailing garbage or truncation refuses (None → honest
   * compressed-blob fallback), as do dimension bombs (each dim bounds
   * BEFORE the w·h multiply — the QOI overflow lesson).
   */
  private[graft] def decodeFarbfeldPixels(b: Array[Byte],
                                          maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 16) return None
    if (!(b(0) == 'f' && b(1) == 'a' && b(2) == 'r' && b(3) == 'b' &&
        b(4) == 'f' && b(5) == 'e' && b(6) == 'l' && b(7) == 'd')) return None
    val w = u32be(b, 8)
    val h = u32be(b, 12)
    if (w <= 0L || h <= 0L) return None
    if (w > maxPixelBytes || h > maxPixelBytes) return None
    val total = w * h * 4L // overflow-free: both factors bounded above
    if (total > maxPixelBytes) return None
    if (b.length.toLong != 16L + total * 2L) return None
    val n = total.toInt
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = b(16 + i * 2) // high byte of the u16be component
      i += 1
    }
    Some(out)
  }

  /** Fixture encoder for [[decodeFarbfeldPixels]]: 8-bit RGBA expands
    * to 16 bits as v·257 (hi = lo = v, the reference expansion). */
  private[graft] def encodeFarbfeld(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h * 4, "px must be w*h*4 RGBA")
    val out = new Array[Byte](16 + px.length * 2)
    val magic = "farbfeld".getBytes("US-ASCII")
    System.arraycopy(magic, 0, out, 0, 8)
    def be32(o: Int, v: Int): Unit = {
      out(o) = ((v >>> 24) & 0xff).toByte; out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte; out(o + 3) = (v & 0xff).toByte
    }
    be32(8, w); be32(12, h)
    var i = 0
    while (i < px.length) {
      out(16 + i * 2) = px(i)
      out(16 + i * 2 + 1) = px(i)
      i += 1
    }
    out
  }

  private[graft] def encodeQoi(px: Array[Byte], w: Int, h: Int,
                               channels: Int = 3): Array[Byte] = {
    require(channels == 3 || channels == 4, "QOI is 3 or 4 channels")
    require(w > 0 && h > 0 && px.length == w * h * channels, "px must be w*h*ch")
    val out = new java.io.ByteArrayOutputStream(14 + px.length + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h); out.write(channels); out.write(0)
    val idx = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var o = 0
    while (o < px.length) {
      val r = px(o) & 0xff; val g = px(o + 1) & 0xff; val bl = px(o + 2) & 0xff
      val a = if (channels == 4) px(o + 3) & 0xff else pa
      if (r == pr && g == pg && bl == pb && a == pa) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hash = (r * 3 + g * 5 + bl * 7 + a * 11) % 64
        val packed = (r << 24) | (g << 16) | (bl << 8) | a
        if (idx(hash) == packed) out.write(hash)
        else {
          idx(hash) = packed
          if (a == pa) {
            val dr = ((r - pr).toByte).toInt
            val dg = ((g - pg).toByte).toInt
            val db = ((bl - pb).toByte).toInt
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 &&
                     dr - dg >= -8 && dr - dg <= 7 && db - dg >= -8 && db - dg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((dr - dg + 8) << 4) | (db - dg + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(bl)
            }
          } else {
            out.write(0xff); out.write(r); out.write(g); out.write(bl); out.write(a)
          }
        }
        pr = r; pg = g; pb = bl; pa = a
      }
      o += channels
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    var z = 0
    while (z < 7) { out.write(0); z += 1 }
    out.write(1)
    out.toByteArray
  }

  /**
   * REAL PCX decode — ZSoft Paintbrush (the format retro-game and
   * scanned-archive corpora carry), 8-bit-per-plane RLE. 128-byte
   * header (manufacturer 0x0A, encoding 1, bpp 8, inclusive dims,
   * plane count, EVEN bytes-per-line); pixel data is run-length
   * encoded PER SCAN LINE with the two-high-bits scheme: a byte
   * ≥ 0xC0 is a run header (count = low 6 bits, next byte is the
   * value — which is why literal values ≥ 0xC0 MUST be written as
   * 1-runs), anything else is a literal. Within one row the planes
   * are stored SEPARATED (all R bytes, then G, then B), each padded
   * to bytesPerLine; runs may cross plane boundaries inside a row
   * (the spec's "scan line" is the full plane group) but never cross
   * rows — a run that would is corruption and refuses. Output is
   * interleaved row-major RGB (3 planes) or gray (1 plane), the
   * padding columns dropped.
   *
   * Honest-refusal scope: bpp ≠ 8, planes ∉ {1, 3}, encoding ≠ 1,
   * bytesPerLine < width or odd, VGA-palette images (1-plane files
   * here are grayscale); `maxPixelBytes` caps dimension bombs.
   */
  private[graft] def decodePcxPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 129) return None
    if ((b(0) & 0xff) != 0x0a) return None
    if ((b(2) & 0xff) != 1) return None // encoding: RLE only
    if ((b(3) & 0xff) != 8) return None // 8 bits per plane
    val xmin = u16le(b, 4); val ymin = u16le(b, 6)
    val xmax = u16le(b, 8); val ymax = u16le(b, 10)
    val w = (xmax - xmin + 1).toInt
    val h = (ymax - ymin + 1).toInt
    if (w <= 0 || h <= 0) return None
    val planes = b(65) & 0xff
    if (planes != 1 && planes != 3) return None
    val bpl = u16le(b, 66).toInt
    if (bpl < w || (bpl & 1) != 0) return None
    val total = w.toLong * h * planes
    if (total > maxPixelBytes) return None
    val rowLen = bpl * planes
    val out = new Array[Byte](total.toInt)
    val row = new Array[Byte](rowLen)
    var p = 128
    var y = 0
    while (y < h) {
      var filled = 0
      while (filled < rowLen) {
        if (p >= b.length) return None
        val v = b(p) & 0xff; p += 1
        if (v >= 0xc0) {
          val run = v & 0x3f
          if (p >= b.length) return None
          val value = b(p); p += 1
          if (run == 0 || filled + run > rowLen) return None // cross-row run
          var k = 0
          while (k < run) { row(filled) = value; filled += 1; k += 1 }
        } else {
          row(filled) = v.toByte; filled += 1
        }
      }
      // de-plane: row holds [R0..R_bpl | G.. | B..]; keep w columns
      var x = 0
      while (x < w) {
        var c = 0
        while (c < planes) {
          out((y.toLong * w + x).toInt * planes + c) = row(c * bpl + x)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /**
   * REAL Sun Raster decode — the SunOS-era `.ras`/`.sun` format
   * scanned-archive corpora still carry: a 32-byte big-endian header
   * (magic 0x59A66A95, width, height, depth, length, type, maptype,
   * maplength), then raw (type 1) or Sun byte-RLE (type 2) image
   * data. Depth 8 is grayscale; depth 24 is stored BGR and converts
   * to the logical RGB stream; every stored row pads to an EVEN byte
   * count. The type-2 RLE is the Sun escape scheme: `0x80 n v` emits
   * n+1 copies of v, `0x80 0x00` is a literal 0x80, anything else is
   * a literal — and unlike PCX, runs MAY cross row boundaries (the
   * compressed stream covers the whole padded raster as one
   * sequence).
   *
   * Honest-refusal scope: colormapped files (maptype ≠ 0), depths
   * other than 8/24, types other than 1/2 (old type 0 has no
   * reliable length contract); `maxPixelBytes` caps dimension bombs.
   */
  private[graft] def decodeRasPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 32) return None
    if (u32be(b, 0) != 0x59a66a95L) return None
    val w = u32be(b, 4).toInt; val h = u32be(b, 8).toInt
    val depth = u32be(b, 12).toInt; val rtype = u32be(b, 20).toInt
    if (w <= 0 || h <= 0) return None
    if (depth != 8 && depth != 24) return None
    if (rtype != 1 && rtype != 2) return None
    if (u32be(b, 24) != 0L || u32be(b, 28) != 0L) return None
    val ch = if (depth == 24) 3 else 1
    val total = w.toLong * h * ch
    if (total > maxPixelBytes) return None
    val rowBytes = w * ch
    val bpr = if ((rowBytes & 1) == 1) rowBytes + 1 else rowBytes
    val need = bpr * h
    val rows = new Array[Byte](need)
    if (rtype == 1) {
      if (b.length - 32 < need) return None
      System.arraycopy(b, 32, rows, 0, need)
    } else {
      var p = 32
      var o = 0
      while (o < need) {
        if (p >= b.length) return None
        val v = b(p) & 0xff; p += 1
        if (v == 0x80) {
          if (p >= b.length) return None
          val n = b(p) & 0xff; p += 1
          if (n == 0) { rows(o) = 0x80.toByte; o += 1 }
          else {
            if (p >= b.length) return None
            val value = b(p); p += 1
            if (o + n + 1 > need) return None // over-run past the raster
            var k = 0
            while (k <= n) { rows(o) = value; o += 1; k += 1 }
          }
        } else { rows(o) = v.toByte; o += 1 }
      }
    }
    val out = new Array[Byte](total.toInt)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (ch == 3) {
          val s = y * bpr + x * 3
          val d = (y * w + x) * 3
          out(d) = rows(s + 2); out(d + 1) = rows(s + 1); out(d + 2) = rows(s)
        } else out(y * w + x) = rows(y * bpr + x)
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Radiance header walk: ASCII lines to the blank terminator (must
    * include FORMAT=32-bit_rle_rgbe), then the standard-orientation
    * resolution line "-Y h +X w". Returns (w, h, pixel data offset). */
  private def hdrInfo(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 2 || b(0) != '#' || b(1) != '?') return None
    var p = 0
    var sawFormat = false
    var line = new StringBuilder
    var resLine: String = null
    while (p < b.length && resLine == null) {
      val c = b(p) & 0xff; p += 1
      if (c == '\n') {
        val l = line.toString; line = new StringBuilder
        if (l == "FORMAT=32-bit_rle_rgbe") sawFormat = true
        else if (l.isEmpty) {
          // blank terminator: the NEXT line is the resolution
          val q = b.indexOf('\n'.toByte, p)
          if (q < 0) return None
          resLine = new String(b, p, q - p, java.nio.charset.StandardCharsets.US_ASCII)
          p = q + 1
        }
      } else if (c > 127 || line.length > 255) return None // binary junk in the header
      else line += c.toChar
    }
    if (resLine == null || !sawFormat) return None
    resLine.split(" ") match {
      case Array("-Y", hs, "+X", ws) =>
        try {
          val w = ws.toInt; val h = hs.toInt
          if (w > 0 && h > 0) Some((w, h, p)) else None
        } catch { case _: NumberFormatException => None }
      case _ => None // flipped/rotated orientations out of scope
    }
  }

  /**
   * REAL Radiance RGBE decode (Ward's .hdr/.pic format — the standard
   * interchange for HDR photography and IBL environment maps): ASCII
   * header (magic `#?…`, `FORMAT=32-bit_rle_rgbe`, blank line,
   * `-Y h +X w` resolution), then BOTH scanline generations with the
   * reference reader's per-row dispatch: NEW-STYLE RLE — marker
   * 0x02 0x02 + the 16-bit BE width, followed by FOUR separated
   * component streams (R, G, B, E) each run-length coded: a count
   * byte > 128 repeats the next byte (count−128) times, ≤ 128 copies
   * that many literal bytes — and OLD-STYLE rows (pre-1994 writers,
   * plus every writer's fallback for widths outside [8, 0x8000)):
   * flat 4-byte RGBE pixels where (1,1,1,n) repeats the previous
   * pixel n·2^rshift times, consecutive markers accumulating the
   * count base-256. Output is the raw 4-channel RGBE byte stream
   * (R, G, B, shared-exponent E per pixel) — the exposure-preserving
   * byte planes, deliberately NOT resolved to floats
   * (mantissa·2^(E−136) would put engine-varying doubles in an
   * integer-exact pipeline; consumers that need radiance apply the
   * shared exponent themselves).
   *
   * Honest-refusal scope: flipped/rotated resolution orientations; a
   * leading run marker (nothing to repeat) and count overflows;
   * `maxPixelBytes` caps dimension bombs.
   */
  private[graft] def decodeHdrPixels(b: Array[Byte],
                                     maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null) return None
    val info = hdrInfo(b)
    if (info.isEmpty) return None
    val (w, h, start) = info.get
    val total = 4L * w * h
    if (total > maxPixelBytes) return None
    val out = new Array[Byte](total.toInt)
    var p = start
    var y = 0
    while (y < h) {
      if (p + 4 > b.length) return None
      // per-scanline style dispatch, exactly the reference reader's
      // (ray/src/common/color.c freadcolrs): a row starting 0x02 0x02
      // with the high bit of byte 3 clear is a new-style header — and
      // only widths in [8, 0x8000) may BE new-style, so out-of-range
      // widths always take the old-style path (fwritecolrs makes the
      // same fallback when writing)
      val newStyle = w >= 8 && w < 32768 &&
        (b(p) & 0xff) == 2 && (b(p + 1) & 0xff) == 2 && (b(p + 2) & 0x80) == 0
      if (newStyle) {
        if (((b(p + 2) & 0xff) << 8 | (b(p + 3) & 0xff)) != w) return None
        p += 4
        var c = 0
        while (c < 4) {
          var x = 0
          while (x < w) {
            if (p >= b.length) return None
            val n = b(p) & 0xff; p += 1
            if (n > 128) {
              val run = n - 128
              if (p >= b.length || x + run > w) return None
              val v = b(p); p += 1
              var k = 0
              while (k < run) { out((y * w + x + k) * 4 + c) = v; k += 1 }
              x += run
            } else {
              if (n == 0 || p + n > b.length || x + n > w) return None
              var k = 0
              while (k < n) { out((y * w + x + k) * 4 + c) = b(p + k); k += 1 }
              p += n; x += n
            }
          }
          c += 1
        }
      } else {
        // OLD-STYLE scanline (pre-1994 writers, and the fallback every
        // writer still takes for widths outside [8, 0x8000)): flat
        // 4-byte RGBE pixels, with (1,1,1,n) repeating the PREVIOUS
        // pixel n·2^rshift times — consecutive markers accumulate the
        // count base-256, rshift += 8 per marker (oldreadcolrs)
        var x = 0
        var rshift = 0
        while (x < w) {
          if (p + 4 > b.length) return None
          val r = b(p) & 0xff; val g = b(p + 1) & 0xff
          val bl = b(p + 2) & 0xff; val e = b(p + 3)
          p += 4
          if (r == 1 && g == 1 && bl == 1) {
            if (x == 0 || rshift > 24) return None // nothing to repeat / count overflow
            val cnt = (e & 0xff).toLong << rshift
            if (x + cnt > w) return None
            val base = (y * w + x - 1) * 4
            var k = 0
            while (k < cnt) {
              val d = (y * w + x + k) * 4
              out(d) = out(base); out(d + 1) = out(base + 1)
              out(d + 2) = out(base + 2); out(d + 3) = out(base + 3)
              k += 1
            }
            x += cnt.toInt
            rshift += 8
          } else {
            val d = (y * w + x) * 4
            out(d) = r.toByte; out(d + 1) = g.toByte
            out(d + 2) = bl.toByte; out(d + 3) = e
            x += 1
            rshift = 0
          }
        }
      }
      y += 1
    }
    Some(out)
  }

  /** Radiance encoder — the fixture counterpart of [[decodeHdrPixels]]:
    * new-style RLE scanlines (runs ≥ 3 as run packets, literals
    * chunked ≤ 128, both capped at 127/128 per packet). `px` is the
    * interleaved 4-channel RGBE stream. */
  private[graft] def encodeHdr(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w >= 8 && w < 32768 && h > 0 && px.length == w * h * 4,
      "px must be w*h*4 RGBE bytes with 8 <= w < 32768")
    val out = new java.io.ByteArrayOutputStream(64 + px.length)
    out.write("#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    out.write(s"-Y $h +X $w\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val comp = new Array[Byte](w)
    var y = 0
    while (y < h) {
      out.write(2); out.write(2); out.write((w >> 8) & 0xff); out.write(w & 0xff)
      var c = 0
      while (c < 4) {
        var x = 0
        while (x < w) { comp(x) = px((y * w + x) * 4 + c); x += 1 }
        var i = 0
        while (i < w) {
          var run = 1
          while (i + run < w && comp(i + run) == comp(i) && run < 127) run += 1
          if (run >= 3) { out.write(128 + run); out.write(comp(i) & 0xff); i += run }
          else {
            var lit = 0
            // literal chunk up to the next run of >= 3 (or 128 bytes)
            while (i + lit < w && lit < 128 &&
              !(i + lit + 2 < w && comp(i + lit) == comp(i + lit + 1) &&
                comp(i + lit) == comp(i + lit + 2))) lit += 1
            if (lit == 0) lit = 1
            out.write(lit)
            var k = 0
            while (k < lit) { out.write(comp(i + k) & 0xff); k += 1 }
            i += lit
          }
        }
        c += 1
      }
      y += 1
    }
    out.toByteArray
  }

  /** Old-style Radiance encoder — the pre-1994 fixture counterpart of
    * [[encodeHdr]]: flat 4-byte RGBE pixels with pixel runs ≥ 2
    * collapsed to (1,1,1,n) markers after the first literal pixel;
    * run lengths > 255 emit consecutive markers carrying base-256
    * digits (the rshift convention). `w` may sit OUTSIDE the
    * new-style [8, 32768) envelope — that is the case real writers
    * still produce today. */
  private[graft] def encodeHdrOld(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h > 0 && px.length == w * h * 4,
      "px must be w*h*4 RGBE bytes")
    val out = new java.io.ByteArrayOutputStream(64 + px.length)
    out.write("#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    out.write(s"-Y $h +X $w\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 4
        out.write(px(s) & 0xff); out.write(px(s + 1) & 0xff)
        out.write(px(s + 2) & 0xff); out.write(px(s + 3) & 0xff)
        var run = 0L
        while (x + 1 + run < w && {
          val t = (y * w + x + 1 + run.toInt) * 4
          px(t) == px(s) && px(t + 1) == px(s + 1) &&
            px(t + 2) == px(s + 2) && px(t + 3) == px(s + 3)
        }) run += 1
        if (run >= 2) {
          // base-256 digits, low first — each marker's count is read
          // as digit << rshift with rshift advancing 8 per marker
          var rest = run
          do {
            out.write(1); out.write(1); out.write(1)
            out.write((rest & 0xff).toInt)
            rest >>= 8
          } while (rest > 0)
          x += 1 + run.toInt
        } else x += 1
      }
      y += 1
    }
    out.toByteArray
  }

  /** Sun Raster encoder — the fixture counterpart of
    * [[decodeRasPixels]]: logical RGB/gray rows to stored BGR with
    * even row padding; type 2 emits the Sun byte-RLE (`0x80 n v` for
    * runs ≥ 3 — or ≥ 2 when the value is the 0x80 escape itself —
    * and `0x80 0x00` for a lone literal 0x80), runs free to cross
    * row boundaries like the real format's. */
  private[graft] def encodeRas(px: Array[Byte], w: Int, h: Int,
                               channels: Int = 3, rle: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 3, "RAS here is gray (1) or RGB (3)")
    require(w > 0 && h > 0 && px.length == w * h * channels, "px must be w*h*channels")
    val rowBytes = w * channels
    val bpr = if ((rowBytes & 1) == 1) rowBytes + 1 else rowBytes
    val rows = new Array[Byte](bpr * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (channels == 3) {
          val s = (y * w + x) * 3; val d = y * bpr + x * 3
          rows(d) = px(s + 2); rows(d + 1) = px(s + 1); rows(d + 2) = px(s)
        } else rows(y * bpr + x) = px(y * w + x)
        x += 1
      }
      y += 1
    }
    val body: Array[Byte] =
      if (!rle) rows
      else {
        val out = new java.io.ByteArrayOutputStream(rows.length)
        var i = 0
        while (i < rows.length) {
          val v = rows(i) & 0xff
          var run = 1
          while (i + run < rows.length && (rows(i + run) & 0xff) == v && run < 256) run += 1
          if (run >= 3 || (run >= 2 && v == 0x80)) {
            out.write(0x80); out.write(run - 1); out.write(v); i += run
          } else if (v == 0x80) { out.write(0x80); out.write(0); i += 1 }
          else { out.write(v); i += 1 }
        }
        out.toByteArray
      }
    val hdr = new Array[Byte](32)
    def p32(off: Int, v: Long): Unit = {
      hdr(off) = ((v >> 24) & 0xff).toByte; hdr(off + 1) = ((v >> 16) & 0xff).toByte
      hdr(off + 2) = ((v >> 8) & 0xff).toByte; hdr(off + 3) = (v & 0xff).toByte
    }
    p32(0, 0x59a66a95L); p32(4, w); p32(8, h); p32(12, channels * 8L)
    p32(16, body.length); p32(20, if (rle) 2L else 1L); p32(24, 0L); p32(28, 0L)
    hdr ++ body
  }

  /** PCX encoder — the fixture counterpart of [[decodePcxPixels]]:
    * row-by-row RLE over plane-separated scan lines (literals ≥ 0xC0
    * forced into 1-runs, runs capped at 63 and never crossing rows),
    * even bytes-per-line padding. `px` is interleaved RGB or gray. */
  private[graft] def encodePcx(px: Array[Byte], w: Int, h: Int,
                               planes: Int = 3): Array[Byte] = {
    require(planes == 1 || planes == 3, "PCX here is gray (1) or RGB (3)")
    require(w > 0 && h > 0 && px.length == w * h * planes, "px must be w*h*planes")
    val bpl = (w + 1) & ~1 // even padding
    val hdr = new Array[Byte](128)
    hdr(0) = 0x0a.toByte; hdr(1) = 5; hdr(2) = 1; hdr(3) = 8
    def p16(off: Int, v: Int): Unit = {
      hdr(off) = (v & 0xff).toByte; hdr(off + 1) = ((v >> 8) & 0xff).toByte
    }
    p16(4, 0); p16(6, 0); p16(8, w - 1); p16(10, h - 1)
    p16(12, 72); p16(14, 72) // dpi, cosmetic
    hdr(65) = planes.toByte
    p16(66, bpl)
    p16(68, 1) // palette info: color
    val out = new java.io.ByteArrayOutputStream(128 + px.length)
    out.write(hdr)
    val row = new Array[Byte](bpl * planes)
    var y = 0
    while (y < h) {
      var c = 0
      while (c < planes) {
        var x = 0
        while (x < bpl) {
          row(c * bpl + x) =
            if (x < w) px((y * w + x) * planes + c) else 0
          x += 1
        }
        c += 1
      }
      var i = 0
      while (i < row.length) {
        val v = row(i) & 0xff
        var run = 1
        while (i + run < row.length && (row(i + run) & 0xff) == v && run < 63) run += 1
        if (run > 1 || v >= 0xc0) { out.write(0xc0 | run); out.write(v) }
        else out.write(v)
        i += run
      }
      y += 1
    }
    out.toByteArray
  }

  /** 24-bit BI_RGB BMP encoder — the fixture counterpart of
    * [[decodeBmpPixels]]: `px` is the logical top-down row-major BGR
    * stream; `topDown` picks the stored row order (negative biHeight). */
  private[graft] def encodeBmp24(px: Array[Byte], w: Int, h: Int,
                                 topDown: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h * 3, "px must be w*h*3 BGR bytes")
    val rowBytes = w * 3
    val stride = (rowBytes + 3) & ~3
    val dataSize = stride * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val arr = buf.array()
    var y = 0
    while (y < h) {
      val dstRow = if (topDown) y else h - 1 - y
      System.arraycopy(px, y * rowBytes, arr, 54 + dstRow * stride, rowBytes)
      y += 1
    }
    arr
  }

  /**
   * REAL TIFF decode — baseline TIFF 6.0, the strip-organized raster
   * both scanned-document corpora and satellite tiles still arrive in.
   * Pure JVM IFD walk honoring BOTH byte orders (`II` little-endian,
   * `MM` big-endian — the same raster must decode identically from
   * either container, like BMP's two row orders), multiple strips
   * (`RowsPerStrip` < height exercises the strip reassembly), and the
   * two baseline compressions: 1 = none and 32773 = PackBits (TIFF
   * §9: n∈[0,127] copy n+1 literals, n∈[−127,−1] repeat next byte
   * 1−n times, −128 no-op). Grayscale honors BOTH photometric
   * interpretations — 1 = BlackIsZero raw, 0 = WhiteIsZero inverted
   * to the logical black-is-zero stream (real decode semantics, not a
   * pass-through; the spec pins 0 ↔ 255 inversion). RGB (photometric
   * 2) emits interleaved row-major RGB.
   *
   * Honest-refusal scope (None → compressed-blob fallback): bits per
   * sample other than 8, palette/planar/tiled organizations, LZW /
   * CCITT / JPEG-in-TIFF compressions, missing required tags. All
   * offset arithmetic in Long against crafted headers
   * ([[decodePngPixels]]' allocation-bomb lesson); `maxPixelBytes`
   * caps the output buffer.
   */
  private[graft] def decodeTiffPixels(b: Array[Byte],
                                      maxPixelBytes: Int = 1 << 26): Option[Array[Byte]] = {
    val info = tiffInfo(b).getOrElse(return None)
    val (w, h, ch, comp, photometric, stripOffs, stripCounts, rowsPerStrip) = info
    val rowBytes = w * ch
    val total = rowBytes * h
    if (total > maxPixelBytes) return None
    val out = new Array[Byte](total.toInt)
    var produced = 0
    var s = 0
    while (s < stripOffs.length) {
      val off = stripOffs(s)
      val len = stripCounts(s)
      if (off < 0 || len < 0 || off + len > b.length) return None
      // rows in this strip: RowsPerStrip except a short final strip
      val stripRows = math.min(rowsPerStrip, h - s.toLong * rowsPerStrip)
      if (stripRows <= 0) return None
      val want = (stripRows * rowBytes).toInt
      if (comp == 1L) {
        if (len != want) return None
        System.arraycopy(b, off.toInt, out, produced, want)
      } else { // PackBits
        var i = off.toInt
        val end = (off + len).toInt
        var o = produced
        val stop = produced + want
        while (i < end && o < stop) {
          val n = b(i); i += 1
          if (n >= 0) {
            val cnt = n + 1
            if (i + cnt > end || o + cnt > stop) return None
            System.arraycopy(b, i, out, o, cnt)
            i += cnt; o += cnt
          } else if (n != -128) {
            val cnt = 1 - n
            if (i >= end || o + cnt > stop) return None
            java.util.Arrays.fill(out, o, o + cnt, b(i))
            i += 1; o += cnt
          }
        }
        if (o != stop) return None
      }
      produced += want
      s += 1
    }
    if (produced != total) return None
    if (photometric == 0L) { // WhiteIsZero -> logical black-is-zero
      var i = 0
      while (i < out.length) { out(i) = (255 - (out(i) & 0xff)).toByte; i += 1 }
    }
    Some(out)
  }

  /** IFD walk shared by [[decodeTiffPixels]] and the header sniffer:
    * (w, h, channels, compression, photometric, stripOffsets,
    * stripByteCounts, rowsPerStrip), or None outside the baseline
    * gray/RGB 8-bit strip scope. */
  private def tiffInfo(b: Array[Byte]): Option[(Long, Long, Long, Long, Long,
      Array[Long], Array[Long], Long)] = {
    if (b == null || b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val be = b(0) == 'M' && b(1) == 'M'
    if (!le && !be) return None
    def u16(o: Int): Long =
      if (o + 2 > b.length) -1L else if (le) u16le(b, o) else u16be(b, o)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L else if (le) u32le(b, o) else u32be(b, o)
    if (u16(2) != 42L) return None
    val ifd = u32(4)
    if (ifd < 8L || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (n <= 0L || ifd + 2 + n * 12 > b.length) return None
    var w = -1L; var h = -1L; var ch = 1L; var comp = 1L; var photo = 1L
    var rps = -1L; var bits: Array[Long] = Array(8L)
    var offs: Array[Long] = null; var cnts: Array[Long] = null
    var planar = 1L
    // one entry's value array: SHORT(3) or LONG(4), inline when it fits
    def values(entryOff: Int): Array[Long] = {
      val typ = u16(entryOff + 2)
      val cnt = u32(entryOff + 4)
      val width = typ match { case 3L => 2L; case 4L => 4L; case _ => return null }
      if (cnt <= 0L || cnt > 65536L) return null
      val at = if (width * cnt <= 4L) entryOff + 8L else u32(entryOff + 8)
      if (at < 0L || at + width * cnt > b.length) return null
      Array.tabulate(cnt.toInt)(i =>
        if (width == 2L) u16((at + i * 2).toInt) else u32((at + i * 4).toInt))
    }
    var e = 0
    while (e < n) {
      val eo = (ifd + 2 + e * 12).toInt
      val tag = u16(eo)
      tag match {
        case 256L => val v = values(eo); if (v == null) return None; w = v(0)
        case 257L => val v = values(eo); if (v == null) return None; h = v(0)
        case 258L => val v = values(eo); if (v == null) return None; bits = v
        case 259L => val v = values(eo); if (v == null) return None; comp = v(0)
        case 262L => val v = values(eo); if (v == null) return None; photo = v(0)
        case 273L => val v = values(eo); if (v == null) return None; offs = v
        case 277L => val v = values(eo); if (v == null) return None; ch = v(0)
        case 278L => val v = values(eo); if (v == null) return None; rps = v(0)
        case 279L => val v = values(eo); if (v == null) return None; cnts = v
        case 284L => val v = values(eo); if (v == null) return None; planar = v(0)
        case _ => // unknown tags are legal; skip
      }
      e += 1
    }
    if (w <= 0L || h <= 0L || offs == null || cnts == null) return None
    if (offs.length != cnts.length) return None
    if (comp != 1L && comp != 32773L) return None
    if (planar != 1L) return None
    if (!(ch == 1L || ch == 3L)) return None
    if (bits.length != ch || bits.exists(_ != 8L)) return None
    if (ch == 1L && photo != 0L && photo != 1L) return None
    if (ch == 3L && photo != 2L) return None
    val rowsPerStrip = if (rps <= 0L) h else rps
    val strips = (h + rowsPerStrip - 1) / rowsPerStrip
    if (strips != offs.length) return None
    Some((w, h, ch, comp, photo, offs, cnts, rowsPerStrip))
  }

  /**
   * EXIF orientation from a JPEG's APP1 segment — the metadata the
   * image pipeline MUST read before any pixel stage (a phone photo
   * stored rotated decodes "sideways" to every orientation-blind
   * consumer; training on it bakes the rotation in). Pure-JVM: SOI,
   * marker walk to APP1 with the `Exif\0\0` prefix, then a TIFF IFD0
   * walk (both byte orders — EXIF embeds a real TIFF header) for tag
   * 274 (Orientation, SHORT 1..8). None when there is no APP1/EXIF,
   * the TIFF walk desyncs, or the value is out of the spec's range —
   * callers treat that as "unknown, assume 1" like real pipelines.
   */
  private[graft] def exifOrientation(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      if ((b(pos + 1) & 0xff) == 0xff) { pos += 1 }
      else {
        val marker = b(pos + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI / entropy data: no APP1 found
        val len = u16be(b, pos + 2).toInt
        if (len < 2 || pos + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 10 &&
            b(pos + 4) == 'E' && b(pos + 5) == 'x' && b(pos + 6) == 'i' &&
            b(pos + 7) == 'f' && b(pos + 8) == 0 && b(pos + 9) == 0) {
          // TIFF header at APP1 payload + 6
          val t = pos + 10
          val end = pos + 2 + len
          if (t + 8 > end) return None
          val le = b(t) == 'I' && b(t + 1) == 'I'
          val be = b(t) == 'M' && b(t + 1) == 'M'
          if (!le && !be) return None
          def u16(o: Int): Long =
            if (o + 2 > end) -1L else if (le) u16le(b, o) else u16be(b, o)
          def u32(o: Int): Long =
            if (o + 4 > end) -1L else if (le) u32le(b, o) else u32be(b, o)
          if (u16(t + 2) != 42L) return None
          val ifd = u32(t + 4)
          if (ifd < 8L || t + ifd + 2 > end) return None
          val n = u16((t + ifd).toInt)
          if (n <= 0L || t + ifd + 2 + n * 12 > end) return None
          var e = 0
          while (e < n) {
            val eo = (t + ifd + 2 + e * 12).toInt
            if (u16(eo) == 274L && u16(eo + 2) == 3L && u32(eo + 4) == 1L) {
              val v = u16(eo + 8)
              return if (v >= 1L && v <= 8L) Some(v) else None
            }
            e += 1
          }
          return None // APP1 present, no orientation tag
        }
        pos += 2 + len
      }
    }
    None
  }

  /** Insert a minimal EXIF APP1 (TIFF header + one-entry IFD0 with
    * Orientation) right after an existing JPEG's SOI — the fixture
    * counterpart of [[exifOrientation]]. */
  private[graft] def withExifOrientation(jpeg: Array[Byte], orientation: Int,
                                         bigEndian: Boolean = false): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "EXIF orientation is 1..8")
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "need a JPEG starting with SOI")
    // TIFF: 8-byte header + count(2) + 12 + next(4) = 26 bytes
    val tiff = java.nio.ByteBuffer.allocate(26).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put((if (bigEndian) 'M' else 'I').toByte).put((if (bigEndian) 'M' else 'I').toByte)
      .putShort(42).putInt(8)
      .putShort(1)
      .putShort(274).putShort(3).putInt(1).putShort(orientation.toShort).putShort(0)
      .putInt(0)
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff.array()
    val segLen = payload.length + 2
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    out.write(0xff); out.write(0xe1)
    out.write((segLen >> 8) & 0xff); out.write(segLen & 0xff)
    out.write(payload)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /**
   * Per-blob EXIF audit — [[exifOrientation]] as a table stage next
   * to the header sniff: (media_id, format, has_exif, orientation)
   * with orientation 0 when absent/unreadable (the "assume upright,
   * but KNOW you assumed" signal a dedup-by-phash or training-crop
   * pipeline reads before trusting pixel geometry).
   */
  def exifAudit(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("has_exif", BooleanType),
      StructField("orientation", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val fmt = parseHeader(content).map(_.format).getOrElse("unknown")
          exifOrientation(content) match {
            case Some(o) => Row(r.getAs[Long]("media_id"), fmt, true, o)
            case None    => Row(r.getAs[Long]("media_id"), fmt, false, 0L)
          }
        })
      }(enc)
  }

  /** Baseline TIFF encoder — the fixture counterpart of
    * [[decodeTiffPixels]]: `px` is the logical top-down row-major
    * sample stream (gray `ch`=1 or RGB `ch`=3, black-is-zero);
    * `bigEndian` picks the container byte order, `packBits` the
    * compression, `rowsPerStrip` the strip layout, and `whiteIsZero`
    * (gray only) stores the INVERTED samples under photometric 0 —
    * every axis the decoder must normalize away. */
  private[graft] def encodeTiff(px: Array[Byte], w: Int, h: Int, ch: Int,
                                bigEndian: Boolean = false, packBits: Boolean = false,
                                rowsPerStrip: Int = 0, whiteIsZero: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && (ch == 1 || ch == 3) && px.length == w * h * ch,
      "px must be w*h*ch samples")
    require(!(whiteIsZero && ch == 3), "whiteIsZero is a grayscale photometric")
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val nStrips = (h + rps - 1) / rps
    val rowBytes = w * ch
    val stored =
      if (!whiteIsZero) px
      else px.map(v => (255 - (v & 0xff)).toByte)
    // per-strip payloads
    val strips = Array.tabulate(nStrips) { s =>
      val rows = math.min(rps, h - s * rps)
      val raw = java.util.Arrays.copyOfRange(stored, s * rps * rowBytes,
        s * rps * rowBytes + rows * rowBytes)
      if (packBits) packBitsEncode(raw) else raw
    }
    val photometric = if (ch == 3) 2 else if (whiteIsZero) 0 else 1
    val nTags = 9
    // layout: 8 header | ifd (2 + 12n + 4) | bits array (ch=3 only) |
    // strip offset/count arrays (if nStrips > 1) | strip data
    val ifdOff = 8
    val ifdSize = 2 + nTags * 12 + 4
    var extra = ifdOff + ifdSize
    val bitsOff = extra
    if (ch == 3) extra += 6
    val offsOff = extra
    val cntsOff = if (nStrips > 1) offsOff + 4 * nStrips else offsOff
    if (nStrips > 1) extra = cntsOff + 4 * nStrips
    val dataOff = extra
    val total = dataOff + strips.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(total).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put((if (bigEndian) 'M' else 'I').toByte).put((if (bigEndian) 'M' else 'I').toByte)
    buf.putShort(42).putInt(ifdOff)
    val stripDataOffs = new Array[Int](nStrips)
    var acc = dataOff
    for (s <- 0 until nStrips) { stripDataOffs(s) = acc; acc += strips(s).length }
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3 && cnt == 1) { buf.putShort(value.toShort).putShort(0) }
      else buf.putInt(value)
    }
    buf.putShort(nTags.toShort)
    entry(256, 3, 1, w)
    entry(257, 3, 1, h)
    if (ch == 3) entry(258, 3, 3, bitsOff) else entry(258, 3, 1, 8)
    entry(259, 3, 1, if (packBits) 32773 else 1)
    entry(262, 3, 1, photometric)
    if (nStrips > 1) entry(273, 4, nStrips, offsOff)
    else entry(273, 4, 1, stripDataOffs(0))
    entry(277, 3, 1, ch)
    entry(278, 3, 1, rps)
    if (nStrips > 1) entry(279, 4, nStrips, cntsOff)
    else entry(279, 4, 1, strips(0).length)
    buf.putInt(0) // no next IFD
    if (ch == 3) { buf.putShort(8).putShort(8).putShort(8) }
    if (nStrips > 1) {
      for (s <- 0 until nStrips) buf.putInt(stripDataOffs(s))
      for (s <- 0 until nStrips) buf.putInt(strips(s).length)
    }
    strips.foreach(buf.put)
    buf.array()
  }

  /** TIFF §9 PackBits — literal runs and ≥3-byte replicate runs (the
    * break-even choice the spec itself recommends), 128-byte bounded. */
  private def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = raw.length
    while (i < n) {
      // measure the replicate run at i
      var run = 1
      while (i + run < n && raw(i + run) == raw(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(raw(i)); i += run
      } else {
        // literal run: until a ≥3 replicate starts or 128 bytes
        var j = i
        var lit = 0
        var break = false
        while (j < n && lit < 128 && !break) {
          var r = 1
          while (j + r < n && raw(j + r) == raw(j) && r < 3) r += 1
          if (r >= 3) break = true
          else { j += 1; lit += 1 }
        }
        out.write(lit - 1)
        out.write(raw, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /**
   * Pixel-level features where the pixel stage is genuinely decodable
   * — PNGs via [[decodePngPixels]] (inflate + filter reversal) and
   * baseline OR progressive JPEGs via [[JpegBaseline.decodePixels]]
   * (pure-JVM Huffman + IDCT, Annex G scan accumulation) get their
   * stats over DECODED pixel samples (decoded=true); everything else
   * (arithmetic-coded JPEG, unknown formats, corrupt streams) falls
   * back to the compressed-blob byte distribution with decoded=false,
   * format still honestly sniffed from the header. Same mapPartitions shape as
   * [[decodeImageBatched]]: iterator-to-iterator, bounded batches, the
   * per-partition init slot where a heavy codec would load once.
   * Output: (media_id, format, decoded, n_vals, mean_milli,
   * distinct_vals, max_val) — stats over pixels when decoded, over
   * blob bytes otherwise.
   */
  def pixelFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("decoded", BooleanType),
      StructField("n_vals", LongType),
      StructField("mean_milli", LongType),
      StructField("distinct_vals", LongType),
      StructField("max_val", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        def stats(bytes: Array[Byte]): (Long, Long, Long, Long) = {
          if (bytes.length == 0) return (0L, 0L, 0L, 0L)
          var sum = 0L
          var max = 0L
          val seen = new Array[Boolean](256)
          var distinct = 0L
          var i = 0
          while (i < bytes.length) {
            val v = bytes(i) & 0xff
            sum += v
            if (v > max) max = v
            if (!seen(v)) { seen(v) = true; distinct += 1 }
            i += 1
          }
          (bytes.length.toLong, sum * 1000L / bytes.length, distinct, max)
        }
        rows.grouped(batchSize).flatMap(_.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val fmt = parseHeader(content).map(_.format).getOrElse("unknown")
          // PNG via inflate+filter reversal; baseline JPEG via the
          // pure-JVM Huffman+IDCT decoder; GIF via the LZW decoder
          // (index stream, like palette PNGs) — all REAL pixel stages
          val decoded: Option[(String, Array[Byte])] =
            decodePngPixels(content).map(("png", _))
              .orElse(JpegBaseline.decodePixels(content).map(d => ("jpeg", d.samples)))
              .orElse(GifPixels.decodeGifPixels(content).map(("gif", _)))
              .orElse(decodeBmpPixels(content).map(("bmp", _)))
              .orElse(decodeTiffPixels(content).map(("tiff", _)))
              .orElse(decodeIcoPixels(content).map(("ico", _)))
              .orElse(decodeTgaPixels(content).map(("tga", _)))
              .orElse(decodePnmPixels(content).map(("pnm", _)))
          decoded match {
            case Some((f, px)) =>
              val (n, mean, d, mx) = stats(px)
              Row(r.getAs[Long]("media_id"), f, true, n, mean, d, mx)
            case None =>
              val (n, mean, d, mx) = stats(if (content == null) Array.emptyByteArray else content)
              Row(r.getAs[Long]("media_id"), fmt, false, n, mean, d, mx)
          }
        })
      }(enc)
  }

  /**
   * Sample-level audio features — the [[pixelFeatures]] counterpart for
   * the WAV path, where the sample stage is genuinely decodable
   * ([[decodeWavSamples]]: PCM needs no codec). Decoded blobs get their
   * stats over the SIGNED interleaved sample stream (decoded=true):
   * floor-mean in millis, peak = max |sample|, and zero crossings
   * (sign flips between consecutive samples, negative vs non-negative —
   * the classic cheap audio-activity signal). Everything else falls
   * back to the compressed-blob unsigned byte distribution with
   * decoded=false (bytes are never negative, so zero_crossings is 0 by
   * construction), format still honestly sniffed from the header. Same
   * mapPartitions shape as [[pixelFeatures]].
   * Output: (media_id, format, decoded, n_samples, mean_milli, peak,
   * zero_crossings).
   */
  def sampleFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("decoded", BooleanType),
      StructField("n_samples", LongType),
      StructField("mean_milli", LongType),
      StructField("peak", LongType),
      StructField("zero_crossings", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        def stats(s: Array[Int]): (Long, Long, Long, Long) = {
          if (s.length == 0) return (0L, 0L, 0L, 0L)
          var sum = 0L
          var peak = 0L
          var crossings = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            sum += v
            val a = math.abs(v.toLong)
            if (a > peak) peak = a
            if (i > 0 && ((s(i - 1) < 0) != (v < 0))) crossings += 1
            i += 1
          }
          // floor over a double: exact for |sum*1000| < 2^53, and the
          // same operation DuckDB's floor() performs — floorDiv-style
          // integer paths differ between engines on negative numerators
          (s.length.toLong, math.floor(sum * 1000.0 / s.length).toLong, peak, crossings)
        }
        rows.grouped(batchSize).flatMap(_.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val fmt = parseHeader(content).map(_.format).getOrElse("unknown")
          decodeWavSamples(content) match {
            case Some(s) =>
              val (n, mean, p, zc) = stats(s)
              Row(r.getAs[Long]("media_id"), "wav", true, n, mean, p, zc)
            case None =>
              val bytes = if (content == null) Array.emptyByteArray else content
              val (n, mean, p, _) = stats(bytes.map(_ & 0xff))
              Row(r.getAs[Long]("media_id"), fmt, false, n, mean, p, 0L)
          }
        })
      }(enc)
  }

  /**
   * Integer Goertzel tone detector over decoded PCM — the classic
   * single-bin DFT (Goertzel 1958; the DTMF-detection workhorse) with
   * the filter coefficient QUANTIZED to milli units, making the whole
   * recurrence exact LONG arithmetic: per bin with coefficient c =
   * ⌊2·cos(2πk/N)·1000⌉ (callers pass the integer; nothing here
   * computes a cosine),
   * `s0 = x + (c·s1) div 1000 − s2`, energy = `s1² + s2² −
   * (c·s1·s2) div 1000`. The CONTRACT is the quantized filter — both
   * engines replay it bit-for-bit (`div` truncates toward zero on
   * Spark, Scala and DuckDB alike; the oracle walks the same
   * recurrence through a recursive CTE), while the response still
   * peaks at the bin frequency like the float filter (the milli
   * quantization detunes the resonator by < 0.1% — spec-pinned
   * physically: an on-bin square wave dominates off bins).
   *
   * LONG envelope: |s| grows ≤ N·max|x|·O(N) on resonance, so keep
   * N·max|x| under ~3·10⁹ and every product stays in 2⁶³ (stated, not
   * checked — the planted queries use 48-sample windows).
   * Output: (media_id, format, decoded, bin, coef_milli, energy) per
   * bin; undecodable blobs emit ONE (bin −1, energy 0) fallback row.
   */
  def goertzelTones(media: DataFrame, coefsMilli: Seq[Long],
                    batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    require(coefsMilli.nonEmpty, "at least one bin coefficient")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("decoded", BooleanType),
      StructField("bin", LongType),
      StructField("coef_milli", LongType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val coefs = coefsMilli.toArray
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val content = r.getAs[Array[Byte]]("content")
          val fmt = parseHeader(content).map(_.format).getOrElse("unknown")
          decodeWavSamples(content) match {
            case Some(s) =>
              coefs.zipWithIndex.map { case (c, b) =>
                var s1 = 0L; var s2 = 0L
                var i = 0
                while (i < s.length) {
                  val s0 = s(i) + (c * s1) / 1000L - s2
                  s2 = s1; s1 = s0; i += 1
                }
                Row(r.getAs[Long]("media_id"), "wav", true, b.toLong, c,
                  s1 * s1 + s2 * s2 - (c * s1 * s2) / 1000L)
              }.toSeq
            case None =>
              Seq(Row(r.getAs[Long]("media_id"), fmt, false, -1L, 0L, 0L))
          }
        })
      }(enc)
  }

  /**
   * Windowed audio features over decoded PCM — the frame dimension a
   * wav2vec-style pipeline consumes: per `frameSize`-sample window,
   * exact integer energy (Σs², a LONG — 16-bit samples square to
   * ≤ 2³⁰, so a billion-sample file stays inside), RMS in floor'd
   * milli units (the one double op, `floor(sqrt(sumsq/n)·1000)`,
   * identical IEEE chain on any engine), absolute peak and
   * frame-LOCAL zero crossings (no cross-frame state, so frames are
   * embarrassingly parallel). The tail frame may be partial
   * (`n_samples < frameSize`). Undecodable blobs fall back to ONE
   * frame_no=0 row of unsigned byte stats with `decoded = false` —
   * the mixed-table contract every decode stage here shares.
   */
  def audioFrameFeatures(media: DataFrame, frameSize: Int,
                         batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    require(frameSize >= 1, s"frameSize >= 1, got $frameSize")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", LongType),
      StructField("decoded", BooleanType),
      StructField("n_samples", LongType),
      StructField("sumsq", LongType),
      StructField("rms_milli", LongType),
      StructField("peak", LongType),
      StructField("zero_crossings", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        def frameStats(s: Array[Int], from: Int, until: Int): (Long, Long, Long, Long, Long) = {
          var sumsq = 0L
          var peak = 0L
          var zc = 0L
          var i = from
          while (i < until) {
            val v = s(i).toLong
            sumsq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            if (i > from && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
            i += 1
          }
          val n = (until - from).toLong
          val rms = if (n == 0) 0L else math.floor(math.sqrt(sumsq.toDouble / n) * 1000.0).toLong
          (n, sumsq, rms, peak, zc)
        }
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val content = r.getAs[Array[Byte]]("content")
          decodeWavSamples(content) match {
            case Some(s) =>
              (0 until math.max(1, (s.length + frameSize - 1) / frameSize)).map { f =>
                val from = f * frameSize
                val (n, sumsq, rms, peak, zc) =
                  frameStats(s, from, math.min(from + frameSize, s.length))
                Row(id, f.toLong, true, n, sumsq, rms, peak, zc)
              }
            case None =>
              val bytes = if (content == null) Array.emptyByteArray else content
              val u = bytes.map(_ & 0xff)
              val (n, sumsq, rms, peak, zc) = frameStats(u, 0, u.length)
              Seq(Row(id, 0L, false, n, sumsq, rms, peak, zc))
          }
        })
      }(enc)
  }

  /**
   * Partition-batched REAL decode: [[parseHeader]] over every blob with
   * the [[decodeImageBatched]] plumbing shape (iterator-to-iterator,
   * bounded batches, per-partition init — where a heavy decoder or
   * model would load once). Blobs that sniff as none of the formats get
   * `format = "unknown"` with the deterministic md5-stub dimensions, so
   * a mixed-media table decodes in one pass without failing rows.
   * Output: (media_id, byte_len, format, width, height, channels,
   * sample_rate).
   */
  def decodeMedia(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("byte_len", LongType),
      StructField("format", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("channels", LongType),
      StructField("sample_rate", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"), col("meta.byte_len").as("byte_len"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hexs(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val content = r.getAs[Array[Byte]]("content")
            val hdr = parseHeader(content).getOrElse {
              // md5-stub fallback, bit-identical to decodeImageBatched
              md.reset()
              val h = hexs(md.digest(hexs(content).toUpperCase
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
              MediaHeader("unknown",
                java.lang.Long.parseLong(h.substring(0, 2), 16),
                java.lang.Long.parseLong(h.substring(2, 4), 16),
                java.lang.Long.parseLong(h.substring(4, 6), 16) % 3, 0L)
            }
            Row(r.getAs[Long]("media_id"), r.getAs[Long]("byte_len"),
              hdr.format, hdr.width, hdr.height, hdr.channels, hdr.sampleRate)
          }
        }
      }(enc)
  }

  /**
   * Frame-sampling plumbing: emit every nth "frame" of a media blob as a
   * (media_id, frame_no, frame_bytes) row. The slicing is real (byte
   * ranges via substring on binary); frame boundaries are stubbed as
   * fixed-size chunks in place of a container parser.
   */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyNth: Int): DataFrame = {
    val nChunks = ceil(col("meta.byte_len") / lit(chunkBytes.toDouble)).cast("int")
    media
      .select(col("media_id"), col("content"), explode(sequence(lit(0), greatest(nChunks - 1, lit(0)))).as("chunk"))
      .filter(col("chunk") % everyNth === 0)
      .select(
        col("media_id"),
        col("chunk").cast("long").as("frame_no"),
        expr(s"substring(content, chunk * $chunkBytes + 1, $chunkBytes)").as("frame_bytes"))
  }

  /**
   * REAL video-container frame walk — the container parser the
   * [[sampleFrames]] scaladoc names as the stubbed piece, now real for
   * AVI: the format is RIFF (the WAV machinery one level up), so the
   * same guarded chunk walk finds `LIST('movi')` and yields its video
   * subchunks (`##dc`/`##db` — compressed/uncompressed frame data for
   * stream ##) in stream order. Returns None for non-AVI blobs, a
   * missing movi LIST, hostile sizes (the WAV overflow lesson), or
   * more than `maxFrames` frames (a crafted chunk list cannot OOM the
   * executor).
   */
  private[graft] def parseAviFrames(b: Array[Byte],
                                    maxFrames: Int = 4096): Option[Array[Array[Byte]]] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = u32le(b, pos + 4)
      if (size > b.length || pos + 8 + size > b.length) return None
      if (b(pos) == 'L' && b(pos + 1) == 'I' && b(pos + 2) == 'S' && b(pos + 3) == 'T' &&
          size >= 4 &&
          b(pos + 8) == 'm' && b(pos + 9) == 'o' && b(pos + 10) == 'v' && b(pos + 11) == 'i') {
        // walk the movi payload: video frames are '##dc' / '##db'
        var p = pos + 12
        val end = pos + 8 + size.toInt
        while (p + 8 <= end) {
          val fsize = u32le(b, p + 4)
          if (fsize > b.length || p + 8 + fsize > end) return None
          val isDigits = b(p) >= '0' && b(p) <= '9' && b(p + 1) >= '0' && b(p + 1) <= '9'
          val isVideo = isDigits && ((b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b')))
          if (isVideo) {
            if (frames.length >= maxFrames) return None
            frames += java.util.Arrays.copyOfRange(b, p + 8, p + 8 + fsize.toInt)
          }
          p += 8 + fsize.toInt + (fsize.toInt & 1) // RIFF word alignment
        }
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    if (frames.isEmpty) None else Some(frames.toArray)
  }

  /**
   * Minimal REAL AVI/MJPEG writer (fixture synthesis — the
   * [[encodeWavPcm]] counterpart for video): canonical
   * RIFF('AVI ') { LIST(hdrl){ avih, LIST(strl){ strh('vids'/'MJPG'),
   * strf(BITMAPINFOHEADER) } }, LIST(movi){ '00dc' frames } } layout.
   * Each frame payload is an opaque byte blob — the planted fixtures
   * pass [[JpegBaseline]] streams so the full container->frame->pixel
   * chain is real.
   */
  private[graft] def encodeAviMjpeg(frames: Array[Array[Byte]], width: Int, height: Int,
                                    fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // strf: BITMAPINFOHEADER (40 bytes)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ fcc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    // strh: 56 bytes — fccType 'vids', handler 'MJPG', flags/prio+lang/
    // initialFrames, scale/rate = 1/fps, start/length, suggested
    // buffer/quality/sampleSize, rcFrame
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(0) ++ le32(0) ++ le32(0) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(payload.length) ++ payload ++
        (if ((payload.length & 1) != 0) Array[Byte](0) else Array.emptyByteArray)
    def list(tpe: String, payload: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(4 + payload.length) ++ fcc(tpe) ++ payload
    // avih: 56 bytes — frame period us, dims, total frames
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)))
    val payload = fcc("AVI ") ++ hdrl ++ movi
    bos.write(fcc("RIFF"), 0, 4)
    bos.write(le32(payload.length), 0, 4)
    bos.write(payload, 0, payload.length)
    bos.toByteArray
  }

  /**
   * Per-frame pixel features over a video column: [[parseAviFrames]]
   * walks AVI containers ([[JpegBaseline.decodePixels]] decoding each
   * MJPEG frame) and [[GifPixels.decodeGifFrames]] walks animated GIFs
   * (each frame an independent LZW stream) — the full video -> frames
   * -> pixels chain with no codec library, in the [[pixelFeatures]]
   * mapPartitions shape. Multi-frame blobs yield one row per frame
   * with stats over DECODED pixels (decoded=true; an AVI frame that
   * fails pixel decode falls back to its compressed bytes,
   * decoded=false). Everything else yields a single frame_no=0 row
   * over the blob bytes, format honestly sniffed.
   * Output: (media_id, frame_no, format, decoded, n_vals, mean_milli,
   * max_val).
   */
  def videoFrameFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", LongType),
      StructField("format", StringType),
      StructField("decoded", BooleanType),
      StructField("n_vals", LongType),
      StructField("mean_milli", LongType),
      StructField("max_val", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        def stats(bytes: Array[Byte]): (Long, Long, Long) = {
          if (bytes.length == 0) return (0L, 0L, 0L)
          var sum = 0L
          var max = 0L
          var i = 0
          while (i < bytes.length) {
            val v = bytes(i) & 0xff
            sum += v
            if (v > max) max = v
            i += 1
          }
          (bytes.length.toLong, sum * 1000L / bytes.length, max)
        }
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val content = r.getAs[Array[Byte]]("content")
          parseAviFrames(content) match {
            case Some(frames) =>
              frames.iterator.zipWithIndex.map { case (f, i) =>
                JpegBaseline.decodePixels(f) match {
                  case Some(d) =>
                    val (n, mean, mx) = stats(d.samples)
                    Row(id, i.toLong, "mjpeg", true, n, mean, mx)
                  case None =>
                    val (n, mean, mx) = stats(f)
                    Row(id, i.toLong, "avi", false, n, mean, mx)
                }
              }.toSeq
            case None => GifPixels.decodeGifFrames(content) match {
              // animated GIFs are the other multi-frame container: one
              // row per frame over its decoded index stream
              case Some(frames) =>
                frames.iterator.zipWithIndex.map { case (px, i) =>
                  val (n, mean, mx) = stats(px)
                  Row(id, i.toLong, "gif", true, n, mean, mx)
                }.toSeq
              case None =>
                val bytes = if (content == null) Array.emptyByteArray else content
                val fmt = parseHeader(bytes).map(_.format).getOrElse("unknown")
                val (n, mean, mx) = stats(bytes)
                Seq(Row(id, 0L, fmt, false, n, mean, mx))
            }
          }
        })
      }(enc)
  }
}

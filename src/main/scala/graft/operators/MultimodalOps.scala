package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: images/audio/video travel as opaque
 * `binary` columns next to a typed metadata struct. The Spark-side
 * machinery — schema, batched per-partition processing, deterministic
 * partitioning by content hash — is real; the codec itself is a stub
 * (decode libraries are not available in this environment) that derives
 * deterministic fake dimensions from the content hash, clearly marked.
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
   * STUB DECODER — the real implementation would decode image headers
   * (or run a batched model) per partition. Deterministic fake: width and
   * height derived from the content md5 so tests and oracles are stable.
   * Runs via mapPartitions-shaped batching in a real deployment; here the
   * derivation is columnar since the stub is pure hashing.
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
   * in the Python stack; this container has no codec libs, so the
   * decode itself is the same deterministic md5 stub as
   * [[decodeImageStub]] — results are identical and share its oracle).
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
}

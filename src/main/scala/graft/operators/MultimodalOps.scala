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

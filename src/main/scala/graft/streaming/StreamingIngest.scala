package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.core.{Blacklist, Dates}
import graft.operators.GraphiteOps

/**
 * Structured Streaming ingest job: spool dir -> points / points_reverse /
 * index / tagged tables, one micro-batch per spool-visible chunk set.
 *
 * Architecture mirrors the reference end-to-end (SURVEY §3.1) with Spark
 * constructs replacing its hand-built stages:
 *   spool chunks            = writer/writer.go chunk files
 *   micro-batch trigger     = 1 s chunk rotation cadence
 *   foreachBatch fan-out    = symlink fan-out to N uploaders
 *   anti-join vs index      = cross-chunk exists-cache (cached.go)
 *   checkpoint dir          = done-marker / LinkAll crash recovery
 *
 * Delivery is at-least-once with duplicate absorption at read time
 * (last-write-wins / rollup views) — the same contract the reference
 * offers via ReplacingMergeTree, and the reason plain parquet appends
 * suffice without a transactional table format.
 */
final class StreamingIngest(
    spark: SparkSession,
    spoolDir: String,
    tablesDir: String,
    checkpointDir: String,
    blacklist: Option[Blacklist] = None,
    disableDailyIndex: Boolean = false,
    utcDate: Boolean = true,
    maxFilesPerTrigger: Option[Int] = None
) {

  private val spoolSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("value", DoubleType),
    StructField("time", LongType),
    StructField("version", LongType)))

  private def pointsPath = s"$tablesDir/points"
  private def pointsReversePath = s"$tablesDir/points_reverse"
  private def indexPath = s"$tablesDir/index"
  private def taggedPath = s"$tablesDir/tagged"

  /** The streaming source: completed spool chunks as a CSV stream. */
  private def source(): DataFrame = {
    val r = spark.readStream
      .schema(spoolSchema)
      .option("sep", "\t")
      .option("pathGlobFilter", "*.tsv") // never read in-flight .tmp chunks
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.csv(spoolDir)
  }

  private def appendMonthPartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("month", date_format(col("date"), "yyyyMM"))
      .sortWithinPartitions("path", "time") // (Path, Time) clustering for row-group skipping
      .write.mode("append").partitionBy("month").parquet(path)

  private def appendPlain(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  private def tableOrEmpty(path: String, schema: StructType): DataFrame = {
    // explicit existence probe: first batch has no table yet, and letting
    // the reader throw fills the log with caught-but-printed stack traces
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private val indexSchema = StructType(Seq(
    StructField("date", DateType), StructField("level", LongType),
    StructField("path", StringType), StructField("version", LongType)))

  private val taggedSchema = StructType(Seq(
    StructField("date", DateType), StructField("tag1", StringType),
    StructField("path", StringType), StructField("tags", ArrayType(StringType)),
    StructField("version", LongType)))

  /** One micro-batch: fan the canonical points out to all four tables. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val pts = GraphiteOps.withDate(batch, utcDate).cache()
    try {
      appendMonthPartitioned(
        GraphiteOps.points(pts, blacklist, reverse = false, zeroTimestamp = true), pointsPath)
      appendMonthPartitioned(
        GraphiteOps.points(pts, blacklist, reverse = true, zeroTimestamp = true), pointsReversePath)

      val version = pts.agg(max("version")).first() match {
        case r if r.isNullAt(0) => 0L
        case r                  => r.getLong(0)
      }

      // exists-cache semantics: only rows whose (date,level?,path) key is not
      // already in the accumulated table survive the anti-join. Committed
      // only after a successful append (cached.go:108-110) because a failed
      // batch simply never writes — the next attempt re-expands.
      val newIndex = GraphiteOps.indexExpand(pts, disableDailyIndex = disableDailyIndex)
        .withColumn("version", lit(version))
      val existingIndex = tableOrEmpty(indexPath, indexSchema).select("date", "level", "path")
      appendPlain(
        newIndex.join(existingIndex, Seq("date", "level", "path"), "left_anti"), indexPath)

      val newTagged = GraphiteOps.taggedExpand(pts).withColumn("version", lit(version))
      val existingTagged = tableOrEmpty(taggedPath, taggedSchema).select("date", "tag1", "path")
      appendPlain(
        newTagged.join(existingTagged, Seq("date", "tag1", "path"), "left_anti"), taggedPath)
    } finally pts.unpersist()
  }

  /** Start the continuous job (1 s trigger = reference chunk cadence). */
  def start(triggerMs: Long = 1000): StreamingQuery =
    source().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()

  /** Drain everything currently in the spool, then stop (for tests/backfill). */
  def runAvailableNow(): Unit = {
    val q = source().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
    q.awaitTermination()
  }

  // ---- read-side views (the ClickHouse table semantics) ----

  def pointsTable(): DataFrame = spark.read.parquet(pointsPath)
  def pointsReverseTable(): DataFrame = spark.read.parquet(pointsReversePath)
  def indexTable(): DataFrame = tableOrEmpty(indexPath, indexSchema)
  def taggedTable(): DataFrame = tableOrEmpty(taggedPath, taggedSchema)

  /** ReplacingMergeTree(Version)-equivalent read view of the index. */
  def indexLatest(): DataFrame =
    GraphiteOps.lwwLatest(indexTable(), Seq("date", "level", "path"), "version", Nil)
}

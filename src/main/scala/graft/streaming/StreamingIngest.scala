package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.core.Blacklist
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
 *   TTL-bounded anti-join   = cross-chunk exists-cache (uploader/cmap.go)
 *   clearExistsCache()      = SIGUSR1 cache clear (carbon-clickhouse.go:146)
 *   checkpoint dir          = done-marker / LinkAll crash recovery
 *
 * Table layout: every micro-batch writes into its own
 * `batch=b<batchId>` subdirectory (a partition column under the table
 * root), so a batch REPLAYED after a partial failure overwrites exactly
 * its own output — the four per-table appends become idempotent without
 * a transactional format. Readers see the batch dirs as one partitioned
 * table.
 *
 * Exists-cache scale design: index/tagged rows are partitioned by
 * `udate` (receive-time day). The per-batch anti-join reads ONLY
 * partitions with `udate >= today - cacheTtlDays` (statically pruned),
 * so its cost tracks series churn within the TTL window, not total
 * index history. A series silent for longer than the TTL is re-emitted
 * with a newer version — exactly the reference's cache-ttl semantics
 * (uploader/cmap.go:97-141) — and absorbed by the last-write-wins read
 * views.
 */
final class StreamingIngest(
    spark: SparkSession,
    spoolDir: String,
    tablesDir: String,
    checkpointDir: String,
    blacklist: Option[Blacklist] = None,
    disableDailyIndex: Boolean = false,
    utcDate: Boolean = true,
    maxFilesPerTrigger: Option[Int] = None,
    cacheTtlDays: Int = 1,
    ignoredTaggedMetrics: Set[String] = Set.empty,
    legacyTables: Set[String] = Set.empty, // of: tree, series, series-reverse
    hashCacheKeys: Boolean = false,
    cleanSpool: Boolean = true,
    compactEveryBatches: Option[Int] = None, // online fold cadence; None = off
    treeDate: Option[java.sql.Date] = None // tree-row date; None = day 42
) {
  require(legacyTables.subsetOf(Set("tree", "series", "series-reverse")),
    s"unknown legacy table types: ${legacyTables -- Set("tree", "series", "series-reverse")}")

  private val spoolSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("value", DoubleType),
    StructField("time", LongType),
    StructField("version", LongType)))

  private def pointsPath = s"$tablesDir/points"
  private def pointsReversePath = s"$tablesDir/points_reverse"
  private def indexPath = s"$tablesDir/index"
  private def taggedPath = s"$tablesDir/tagged"
  private def legacyPath(typ: String) = s"$tablesDir/${typ.replace('-', '_')}"

  /** SIGUSR1 equivalent: the next micro-batch skips the exists-cache
    * anti-join and re-emits every series it sees (duplicates are
    * harmless under the LWW read views — same contract as the
    * reference's cache clear). */
  @volatile private var cacheClearRequested = false
  def clearExistsCache(): Unit = cacheClearRequested = true

  /** The streaming source: completed spool chunks as a CSV stream.
    * cleanSource=delete removes consumed chunks (the reference's
    * uploaders delete handled chunks, writer/cleanup.go) — without it
    * the spool grows forever and the auto-interval backpressure signal
    * (SpoolWriter.unhandledChunks) never drains. */
  private def source(): DataFrame = {
    val r = spark.readStream
      .schema(spoolSchema)
      .option("sep", "\t")
      .option("pathGlobFilter", "*.{tsv,tsv.gz,tsv.lz4}") // never read in-flight .tmp chunks; .gz/.lz4 decompress by extension
    if (cleanSpool) r.option("cleanSource", "delete")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.csv(spoolDir)
  }

  private def udateCol = date_from_unix_date((col("version") / 86400L).cast("int"))

  /** Write one batch's slice of a table into its own batch=b<id> dir;
    * mode=overwrite makes a replayed batch idempotent. */
  private def writeBatch(df: DataFrame, tableRoot: String, batchId: Long,
                         partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*) else df
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(s"$tableRoot/batch=b$batchId")
  }

  private def tableExists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  private def readOrEmpty(path: String, canonical: StructType): DataFrame =
    if (!tableExists(path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], canonical)
    else
      try spark.read.parquet(path).select(canonical.fieldNames.map(col).toSeq: _*)
      catch {
        // all batch dirs empty (e.g. every row anti-joined away) -> no
        // footers to infer from; semantically an empty table
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], canonical)
      }

  private val indexSchema = StructType(Seq(
    StructField("date", DateType), StructField("level", LongType),
    StructField("path", StringType), StructField("version", LongType)))

  private val taggedSchema = StructType(Seq(
    StructField("date", DateType), StructField("tag1", StringType),
    StructField("path", StringType), StructField("tags", ArrayType(StringType)),
    StructField("version", LongType)))

  private val pointsSchema = StructType(Seq(
    StructField("path", StringType), StructField("value", DoubleType),
    StructField("time", LongType), StructField("date", DateType),
    StructField("timestamp", LongType)))

  private def ttlCutoff: java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.now(java.time.ZoneOffset.UTC).minusDays(cacheTtlDays.toLong))

  /** Exists-cache view: the key columns of rows uploaded within the TTL
    * window. The literal udate filter prunes table partitions at plan
    * time — this scan must NOT grow with total index history.
    *
    * `excludeBatch` removes the CURRENT batch's own (possibly partial)
    * previous output from the cache view: a replayed batch overwrites
    * its own dir, so anti-joining against it would both suppress rows
    * it is about to rewrite and trust keys from a half-written failure.
    */
  private[streaming] def existingKeysWithinTtl(path: String, keys: StructType,
                                               excludeBatch: Option[Long] = None): DataFrame =
    if (!tableExists(path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], keys)
    else
      try {
        val base = spark.read.parquet(path).filter(col("udate") >= lit(ttlCutoff))
        val scoped = excludeBatch.fold(base)(id => base.filter(col("batch") =!= lit(s"b$id")))
        scoped.select(keys.fieldNames.map(col).toSeq: _*)
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], keys)
      }

  private def keysOf(s: StructType, names: String*): StructType =
    StructType(names.map(n => s(n)))

  /**
   * Exists-cache anti-join for one expansion table. With
   * `hashCacheKeys` (the reference's `hash = "city64"` option,
   * uploader/hash.go:9-25) both sides join on the 8-byte xxhash64 of
   * the composite key instead of the full strings — a smaller shuffle
   * at the same accepted risk: a hash collision suppresses a genuinely
   * new series row.
   */
  private def dedupAgainstExisting(rows: DataFrame, tablePath: String, keys: StructType,
                                   batchId: Long, clearCache: Boolean): DataFrame =
    if (clearCache) rows
    else {
      val keyNames = keys.fieldNames.toSeq
      val existing = existingKeysWithinTtl(tablePath, keys, Some(batchId))
      if (!hashCacheKeys) rows.join(existing, keyNames, "left_anti")
      else {
        def hashed(df: DataFrame) =
          df.withColumn("_k", xxhash64(concat_ws("\u0000", keyNames.map(col): _*)))
        hashed(rows).join(hashed(existing).select("_k"), Seq("_k"), "left_anti").drop("_k")
      }
    }

  /**
   * One micro-batch: fan the canonical points out to all tables.
   *
   * The single driver action per batch is one stats aggregate over the
   * cached batch (materializing the cache in the process); it gates
   * empty batches and lets the tagged/legacy writes be skipped when
   * the batch carries no rows for them. The per-table writes then run
   * CONCURRENTLY — the reference uploads tables from parallel
   * per-uploader threads (uploader/base.go:65-214), and the jobs are
   * independent appends over the shared cached batch. A failure in any
   * write fails the batch; the replay overwrites the same batch dirs.
   */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val pts = GraphiteOps.withDate(batch, utcDate).cache()
    try {
      val stats = pts.agg(
        count(lit(1)).as("n"),
        sum(when(GraphiteOps.isTagged(col("path")), 1L).otherwise(0L)).as("tagged")).first()
      val n = stats.getLong(0)
      if (n == 0) return
      val nTagged = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      val nPlain = n - nTagged

      val clearCache = cacheClearRequested
      if (clearCache) cacheClearRequested = false

      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = StreamingIngest.writePool

      val tasks = Seq.newBuilder[Future[Unit]]
      tasks += Future(writeBatch(
        GraphiteOps.points(pts, blacklist, reverse = false, zeroTimestamp = true)
          .withColumn("month", date_format(col("date"), "yyyyMM")),
        pointsPath, batchId, Seq("month"), sortCols = Seq("path", "time")))
      tasks += Future(writeBatch(
        GraphiteOps.points(pts, blacklist, reverse = true, zeroTimestamp = true)
          .withColumn("month", date_format(col("date"), "yyyyMM")),
        pointsReversePath, batchId, Seq("month"), sortCols = Seq("path", "time")))

      // Exists-cache semantics: only rows whose key is not already in the
      // TTL window of the accumulated table survive the anti-join.
      // Committed only after a successful write (cached.go:108-110).
      if (nPlain > 0) tasks += Future {
        val newIndex = GraphiteOps
          .indexExpandVersioned(pts,
            treeDate = treeDate.getOrElse(graft.core.Dates.daysToDate(graft.core.Dates.DefaultTreeDate)),
            disableDailyIndex = disableDailyIndex)
          .withColumn("udate", udateCol)
        writeBatch(
          dedupAgainstExisting(newIndex, indexPath,
            keysOf(indexSchema, "date", "level", "path"), batchId, clearCache),
          indexPath, batchId, Seq("udate"))
      }

      if (nTagged > 0) tasks += Future {
        val newTagged = GraphiteOps
          .taggedExpandVersioned(pts, ignoredTaggedMetrics)
          .withColumn("udate", udateCol)
        writeBatch(
          dedupAgainstExisting(newTagged, taggedPath,
            keysOf(taggedSchema, "date", "tag1", "path"), batchId, clearCache),
          taggedPath, batchId, Seq("udate"))
      }

      // legacy graphite-web table types (uploader/uploader.go:47-64),
      // same exists-cache + per-batch-dir machinery as the modern index
      if (nPlain > 0) for (typ <- legacyTables) tasks += Future {
        val rows = (typ match {
          case "tree"           => GraphiteOps.treeExpandVersioned(pts,
            treeDate.getOrElse(graft.core.Dates.daysToDate(graft.core.Dates.DefaultTreeDate)))
          case "series"         => GraphiteOps.seriesExpandVersioned(pts, reverse = false)
          case "series-reverse" => GraphiteOps.seriesExpandVersioned(pts, reverse = true)
        }).withColumn("udate", udateCol)
        writeBatch(
          dedupAgainstExisting(rows, legacyPath(typ),
            keysOf(indexSchema, "date", "level", "path"), batchId, clearCache),
          legacyPath(typ), batchId, Seq("udate"))
      }

      // drain EVERY write before surfacing a failure: rethrowing while a
      // sibling job is still writing would let the batch retry overwrite
      // a dir a zombie task is concurrently appending to
      val results = tasks.result().map(f =>
        Await.ready(f, Duration.Inf).value.get)
      results.collectFirst { case scala.util.Failure(e) => throw e }

      // Online compaction (ClickHouse background-merge analogue): every
      // N batches, fold the batch dirs STRICTLY OLDER than this batch —
      // they are checkpoint-committed and immutable (this stream is the
      // only writer and writes only b<batchId>), so no quiesce is
      // needed. Runs on the stream thread, so the next batch's
      // exists-cache scan never races a dir rename. Keeps dir count —
      // and with it per-batch file-listing cost — bounded under
      // continuous 1 s ingest.
      if (compactEveryBatches.exists(n => n > 0 && batchId > 0 && batchId % n == 0))
        try TableCompactor.onlineCompact(spark, tablesDir, fence = batchId, legacyTables)
        catch {
          // a failed fold must not kill ingest (the reference's merges
          // fail independently of writes): every fold is crash-safe at
          // any interruption point — new-dir-first for LWW tables,
          // trash-first for points — so log and retry next cycle
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"online compaction failed at batch $batchId (will retry next cycle)", e)
        }
    } finally pts.unpersist()
  }

  /** Start the continuous job (1 s trigger = reference chunk cadence). */
  def start(triggerMs: Long = 1000): StreamingQuery =
    source().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()

  /**
   * Live pre-aggregation stream: watermarked event-time windows over
   * the same spool, appending FINALIZED buckets (path, bucket start,
   * avg/sum/min/max/count) to a `points_<precision>s` table — the
   * Structured Streaming-native half of the rollup story (the batch
   * rollup views recompute; this materializes closed windows once).
   * Late points beyond the watermark are dropped from the live table
   * only — the raw points table still has them (§2.8: late data is
   * accepted on the append-only path).
   *
   * Runs as its own query with its own checkpoint so it can lag or
   * restart independently of the table fan-out, like a separate
   * uploader in the reference.
   */
  def startLiveRollup(precisionSec: Int, watermarkDelaySec: Int,
                      triggerMs: Long = 1000,
                      availableNow: Boolean = false): StreamingQuery = {
    // two independent consumers of one spool dir cannot compose with
    // chunk deletion: whichever deletes first starves the other
    require(!cleanSpool,
      "startLiveRollup shares the spool with the table fan-out: construct StreamingIngest with cleanSpool = false")
    val out = s"$tablesDir/points_${precisionSec}s"
    val q = source()
      .withColumn("ets", timestamp_seconds(col("time")))
      .withWatermark("ets", s"$watermarkDelaySec seconds")
      .groupBy(window(col("ets"), s"$precisionSec seconds"), col("path"))
      .agg(
        avg(col("value")).as("avg_value"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("points"))
      .select(
        col("path"),
        col("window.start").cast("long").as("bucket"),
        col("avg_value"), col("sum_value"), col("min_value"), col("max_value"), col("points"))
      .writeStream
      .outputMode("append") // only watermark-finalized windows are written
      .option("checkpointLocation", s"$checkpointDir-live$precisionSec")
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(triggerMs))
      .format("parquet")
      .option("path", out)
    q.start()
  }

  /** Read view of a live-rollup table. */
  def liveRollupTable(precisionSec: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType), StructField("bucket", LongType),
      StructField("avg_value", DoubleType), StructField("sum_value", DoubleType),
      StructField("min_value", DoubleType), StructField("max_value", DoubleType),
      StructField("points", LongType)))
    readOrEmpty(s"$tablesDir/points_${precisionSec}s", schema)
  }

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

  def pointsTable(): DataFrame = readOrEmpty(pointsPath, pointsSchema)
  def pointsReverseTable(): DataFrame = readOrEmpty(pointsReversePath, pointsSchema)

  /** Rollup-weighted points view: raw rows read with weight 1,
    * physically rolled rows (TableCompactor.rollupPoints) carry their
    * persisted `points` sample count — GraphiteOps.rollup() over this
    * view computes the TRUE mean for a bucket mixing rolled and late
    * raw rows instead of an average of averages. mergeSchema unifies
    * the 5-column raw dirs with the 6-column rolled dirs. */
  def pointsTableWeighted(): DataFrame = {
    val weightedSchema = StructType(pointsSchema.fields :+ StructField("points", LongType))
    if (!tableExists(pointsPath))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], weightedSchema)
    else
      try {
        val df = spark.read.option("mergeSchema", "true").parquet(pointsPath)
        val withW =
          if (df.columns.contains("points")) df.withColumn("points", coalesce(col("points"), lit(1L)))
          else df.withColumn("points", lit(1L))
        withW.select(weightedSchema.fieldNames.map(col).toSeq: _*)
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], weightedSchema)
      }
  }
  def indexTable(): DataFrame = readOrEmpty(indexPath, indexSchema)
  def taggedTable(): DataFrame = readOrEmpty(taggedPath, taggedSchema)

  /** ReplacingMergeTree(Version)-equivalent read view of the index. */
  def indexLatest(): DataFrame =
    GraphiteOps.lwwLatest(indexTable(), Seq("date", "level", "path"), "version", Nil)

  /** ReplacingMergeTree(Version)-equivalent read view of the tagged table. */
  def taggedLatest(): DataFrame =
    GraphiteOps.lwwLatest(taggedTable(), Seq("date", "tag1", "path"), "version", Seq("tags"))

  /** Legacy table read view ("tree", "series", "series-reverse"). */
  def legacyTable(typ: String): DataFrame = readOrEmpty(legacyPath(typ), indexSchema)
}

object StreamingIngest {
  /** Shared pool for the concurrent per-table batch writes (the
    * reference's per-uploader threads). Daemon threads; sized for the
    * table fan-out, not the cluster — each task is a Spark job whose
    * parallelism comes from the executors. */
  private[streaming] lazy val writePool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(4, r => {
        val t = new Thread(r, "graft-table-writer")
        t.setDaemon(true)
        t
      }))
}

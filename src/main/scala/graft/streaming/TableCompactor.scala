package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphiteOps

/**
 * Maintenance compaction for the streaming tables: per-batch micro-dirs
 * (`batch=b<id>`, one per 1 s trigger) accumulate forever otherwise,
 * degrading both the read views and the TTL anti-join with tiny-file
 * overhead. ClickHouse does this as background merges; here it is an
 * explicit job over the plain-parquet layout.
 *
 * Run quiesced (or accept the documented windows): compaction is a
 * maintenance job like ClickHouse's merges; a batch dir written WHILE
 * a fold runs is simply not included and survives to the next fold.
 *
 * Crash-safety contract (plain FS, no transactions — the production
 * path for this would be a transactional table format):
 *  - LWW tables (index/tagged): the compacted dir is renamed IN before
 *    the source dirs are removed. A crash in between leaves duplicate
 *    rows, which the LWW read views absorb — never wrong reads.
 *  - points: duplicates are semantically meaningful (rollup counts
 *    them), so the source dirs are moved to a hidden `.trash-*` dir
 *    before the compacted dir is renamed in. A crash in between leaves
 *    the data recoverable in `.trash-*` (operator restores by renaming
 *    back); readers see a gap until then, never double-counts.
 */
object TableCompactor {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def batchDirs(spark: SparkSession, root: String): Seq[Path] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) Nil
    else f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
  }

  /**
   * LWW-compact an index/tagged-shaped table: fold every batch dir into
   * one, keeping the max-version row per key. Returns the number of
   * batch dirs folded (0 = nothing to do).
   */
  /** Batch dirs with no data files at all (a batch whose every row
    * anti-joined away) can simply be removed. Returns true if the table
    * had no data to compact. */
  private def dropIfAllEmpty(spark: SparkSession, tableRoot: String, dirs: Seq[Path]): Boolean = {
    val readable =
      try { spark.read.parquet(tableRoot); false }
      catch { case _: org.apache.spark.sql.AnalysisException => true }
    if (readable) dirs.foreach(d => fs(spark, tableRoot).delete(d, true))
    readable
  }

  def compactLww(spark: SparkSession, tableRoot: String,
                 keys: Seq[String], payloadCols: Seq[String]): Int = {
    val dirs = batchDirs(spark, tableRoot)
    if (dirs.length <= 1) return 0
    if (dropIfAllEmpty(spark, tableRoot, dirs)) return dirs.length
    val f = fs(spark, tableRoot)

    // read EXACTLY the listed dirs: a batch dir committed after the
    // listing must not be folded into the output (it would then be both
    // compacted AND left in place — the delete set below only covers the
    // listed snapshot)
    val compacted = GraphiteOps
      .lwwLatest(
        spark.read.option("basePath", tableRoot).parquet(dirs.map(_.toString): _*),
        keys, "version", payloadCols)
      .withColumn("udate", date_from_unix_date((col("version") / 86400L).cast("int")))
    val stamp = System.currentTimeMillis()
    val tmp = new Path(tableRoot, s".compact-$stamp")
    compacted.write.mode("overwrite").partitionBy("udate").parquet(tmp.toString)

    // new dir visible first, then sources removed: a crash in between
    // leaves duplicates that the LWW read views absorb
    require(f.rename(tmp, new Path(tableRoot, s"batch=c$stamp")), s"rename failed for $tmp")
    dirs.foreach(d => f.delete(d, true))
    dirs.length
  }

  /**
   * Fold a points-shaped table's batch dirs into one, re-clustered by
   * (path, time) within monthly partitions. No dedup — duplicate points
   * are data. Returns the number of batch dirs folded.
   */
  def compactPoints(spark: SparkSession, tableRoot: String): Int = {
    val dirs = batchDirs(spark, tableRoot)
    if (dirs.length <= 1) return 0
    if (dropIfAllEmpty(spark, tableRoot, dirs)) return dirs.length
    val f = fs(spark, tableRoot)

    val stamp = System.currentTimeMillis()
    val tmp = new Path(tableRoot, s".compact-$stamp")
    // snapshot read of exactly the listed dirs (see compactLww): a dir
    // committed between the listing and this job would otherwise be
    // folded AND survive in place — double-counted by rollup
    spark.read.option("basePath", tableRoot).parquet(dirs.map(_.toString): _*)
      .select("path", "value", "time", "date", "timestamp")
      .withColumn("month", date_format(col("date"), "yyyyMM"))
      .repartition(col("month"))
      .sortWithinPartitions(col("path"), col("time"))
      .write.mode("overwrite").partitionBy("month").parquet(tmp.toString)

    // sources out of sight first (recoverable in .trash), THEN the
    // compacted dir in — readers can never double-count points
    val trash = new Path(tableRoot, s".trash-$stamp")
    f.mkdirs(trash)
    dirs.foreach(d => require(f.rename(d, new Path(trash, d.getName)), s"trash move failed for $d"))
    require(f.rename(tmp, new Path(tableRoot, s"batch=c$stamp")), s"rename failed for $tmp")
    f.delete(trash, true)
    dirs.length
  }

  /**
   * Physical rollup of aged points — what GraphiteMergeTree does during
   * background merges (tests/clickhouse/rollup/rollup.xml): every month
   * partition wholly older than `olderThanSec` is rewritten with the
   * rollup aggregation applied (pattern -> fn, age -> precision), so
   * storage shrinks to one row per (path, precision bucket). Readers
   * keep using the same rollup read view: rollup() over already-rolled
   * rows is idempotent for sum/min/max; for avg the view must read the
   * rolled value as a pre-aggregated point (the reference has the same
   * semantics — once ClickHouse merges, the raw samples are gone).
   *
   * Uses the points-compaction crash contract: sources move to a
   * hidden .trash dir before the rewritten partition renames in.
   * Returns the number of month partitions rolled up.
   */
  def rollupPoints(spark: SparkSession, tableRoot: String,
                   config: graft.core.Rollup.Config, nowSec: Long,
                   olderThanSec: Long): Int = {
    val f = fs(spark, tableRoot)
    if (!f.exists(new Path(tableRoot))) return 0
    val cutoffMonth = {
      val d = java.time.LocalDate.ofEpochDay((nowSec - olderThanSec) / 86400)
      d.getYear * 100 + d.getMonthValue
    }
    // month partitions live under every batch dir; batch=r* dirs are
    // already-rolled output and must not be re-rolled (late-arriving
    // aged batches simply produce an additional r-dir for the month,
    // which the rollup read view re-aggregates)
    val months = batchDirs(spark, tableRoot)
      .filterNot(_.getName.startsWith("batch=r"))
      .flatMap(b => f.listStatus(b).toSeq.filter(_.isDirectory).map(_.getPath))
      .filter(_.getName.startsWith("month="))
      .groupBy(_.getName.stripPrefix("month=").toInt)
      .filter { case (m, _) => m < cutoffMonth }
    if (months.isEmpty) return 0

    val stamp = System.currentTimeMillis()
    for ((month, dirs) <- months) {
      val rows = spark.read.parquet(dirs.map(_.toString): _*)
      val rolled = GraphiteOps.rollup(rows.select("path", "time", "value"), config, nowSec)
        .select(
          col("path"), col("value"), col("time"),
          date_from_unix_date((col("time") / 86400L).cast("int")).as("date"),
          lit(0L).as("timestamp"))
        .repartition(1)
        .sortWithinPartitions(col("path"), col("time"))
      val tmp = new Path(tableRoot, s".rollup-$stamp-$month")
      rolled.write.mode("overwrite").parquet(tmp.toString)
      val trash = new Path(tableRoot, s".trash-rollup-$stamp-$month")
      f.mkdirs(trash)
      dirs.zipWithIndex.foreach { case (d, i) =>
        require(f.rename(d, new Path(trash, s"$i-${d.getName}")), s"trash move failed for $d")
      }
      val dest = new Path(tableRoot, s"batch=r$stamp-$month/month=$month")
      f.mkdirs(dest.getParent)
      require(f.rename(tmp, dest), s"rename failed for $tmp")
      f.delete(trash, true)
    }
    months.size
  }

  /** Compact all four tables of a [[StreamingIngest]] layout. */
  def compactAll(spark: SparkSession, tablesDir: String): Map[String, Int] = Map(
    "points" -> compactPoints(spark, s"$tablesDir/points"),
    "points_reverse" -> compactPoints(spark, s"$tablesDir/points_reverse"),
    "index" -> compactLww(spark, s"$tablesDir/index", Seq("date", "level", "path"), Nil),
    "tagged" -> compactLww(spark, s"$tablesDir/tagged", Seq("date", "tag1", "path"), Seq("tags")))
}

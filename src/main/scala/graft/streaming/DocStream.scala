package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{DedupOps, TextOps}

/**
 * Streaming corpus ingestion — the training-data counterpart of
 * [[StreamingIngest]]: documents arrive as JSONL files in a drop
 * directory, and each micro-batch is
 *
 *  0. (when `dedupLinesMaxDf` is set) line-scrubbed against the
 *     ACCUMULATED line-frequency table plus the batch's own counts —
 *     the streaming form of CCNet boilerplate removal. Each batch
 *     appends its per-line document frequencies to `_linedf/batch=b<id>`
 *     (idempotent, compacted alongside the corpus; `_`-prefixed dirs
 *     are invisible to the corpus reader), so a line becomes hot the
 *     moment its lifetime df crosses the cap and every LATER document
 *     arrives clean. Dfs count distinct CONTENT (the `_rawfps`
 *     table), never copies of one doc. Already-admitted docs are not
 *     rewritten by the stream — the deliberate forward-only divergence
 *     from two-pass batch CCNet; [[retroScrubLines]] is the
 *     compaction-style retroactive pass that closes the gap on demand.
 *
 *  1. fingerprinted ([[TextOps.fingerprint]]) and deduplicated WITHIN
 *     the batch (min-id per fingerprint, one window shuffle) — on the
 *     CLEAN text, so boilerplate can't make distinct docs collide or
 *     keep near-identical docs apart,
 *  2. anti-joined against the accepted corpus's fingerprints — the
 *     document exists-cache, the same per-batch anti-join scheme the
 *     metrics tables use (nothing already accepted is rescanned or
 *     re-admitted, even across restarts). With `bloomExpectedItems`
 *     set the check is BLOOM-ROUTED (the LSM shape): a filter over the
 *     compacted history lets bloom-miss docs — no false negatives —
 *     check only the small post-fence b-dir tail, and only true dups
 *     plus the fpp share pay the full-history scan; the filter
 *     rebuilds on cadence and with every compaction fold, and the
 *     admitted set is identical with or without it,
 *  3. gated on quality ([[TextOps.qualityScore]] >= minQuality), on
 *     language when `langs` is non-empty ([[TextOps.langGuess]]), on
 *     repetition when `maxTopWordFrac` is set
 *     ([[TextOps.topWordFrac]] — the Gopher-style "one word dominates
 *     the doc" reject), and on the full published rule sets when
 *     `requireGopher`/`requireC4` are on ([[TextOps.gopherPass]] /
 *     [[TextOps.c4Pass]] — the SAME expressions as the batch audits,
 *     so a doc admitted by the stream is exactly a doc the batch
 *     pipeline would keep),
 *  4. appended to the corpus as an idempotent `batch=b<id>` dir —
 *     a replayed batch overwrites its own dir, never duplicates.
 *     As with [[StreamingIngest]]'s tables, the corpus dir belongs to
 *     ONE checkpoint lineage: batch ids are the idempotence fence, so
 *     pointing a fresh checkpoint at an existing corpus would reuse
 *     ids and overwrite foreign batch dirs.
 *
 * Rejected docs are counted per reason into [[lastBatchStats]] so an
 * operator can watch admission rates (the dropped-ring analogue).
 *
 * At scale: the anti-join shuffles only the new batch against the
 * fingerprint column of the accepted table (pruned to `fp` by column
 * projection); the within-batch window is batch-sized. No operation
 * here scales with corpus history except the fingerprint column scan,
 * which is the same trade the reference's exists-cache makes — and
 * compaction keeps the dir count bounded via [[TableCompactor]].
 */
class DocStream(spark: SparkSession, dropDir: String, corpusDir: String,
                checkpointDir: String, minQuality: Long = 0L,
                langs: Seq[String] = Nil,
                maxFilesPerTrigger: Option[Int] = None,
                // online compaction cadence, the StreamingIngest scheme:
                // committed b-dirs fold every N batches so dir count —
                // and the exists-anti-join's file listing — stays
                // bounded under continuous triggers
                compactEveryBatches: Option[Int] = None,
                // reject docs whose most frequent word exceeds this share
                maxTopWordFrac: Option[Double] = None,
                // scrub lines whose lifetime document frequency exceeds this
                dedupLinesMaxDf: Option[Long] = None,
                // Bloom-route the exists-check (expected corpus fp count):
                // most batch docs skip the corpus-history fp scan entirely
                bloomExpectedItems: Option[Long] = None,
                // rebuild cadence in batches (also rebuilds with every
                // compaction — folds move history out of the b-dir tail)
                bloomRebuildEvery: Int = 16,
                // admit only docs passing the Gopher rule conjunction
                // (TextOps.gopherPass — identical to the batch audit)
                requireGopher: Boolean = false,
                // admit only docs passing the C4 page decision
                // (TextOps.c4Pass — identical to the batch audit)
                requireC4: Boolean = false,
                // crawl-frontier URL-identity gate: docs whose
                // CANONICAL url (TextOps.canonicalUrl — scheme/www/
                // fragment/utm/trailing-slash invariant) was already
                // seen are dropped BEFORE content fingerprinting — the
                // "same resource re-fetched" reject that content
                // hashing misses when the page body changed. Seen
                // urls persist as xxhash64 fps in `_urlfps/batch=b<id>`
                // (idempotent, compacted with the corpus); a url is
                // "seen" once it survives the within-batch gate, even
                // if its doc is later rejected on quality — frontier
                // semantics: the fetch decision, not the admit
                // decision. Docs with a null/empty url bypass.
                dedupUrls: Boolean = false,
                // quality-drift monitor: per batch, the ADMITTED docs'
                // per-language quality stats — three LONGs per language,
                // (n, Σq, Σq²), the mergeable moment state — append to
                // `_qstats/batch=b<id>`, and the batch's per-language
                // mean is compared against the accumulated corpus mean;
                // languages whose |Δmean| ≥ this many millis flag into
                // [[lastDriftStats]] — the operational-alarm form of the
                // p_mixture_drift / p_ks_drift release audits (a
                // refreshed crawl whose English quality sagged shows up
                // on the FIRST bad batch, not at release review). State
                // is languages × 3 LONGs; the report collect is
                // language-cardinality (model-sized by contract).
                driftTolMilli: Option[Long] = None,
                // chunk-level exists-cache: reject docs whose
                // content-defined chunks (the Shingles.cdcChunks
                // kernel, window 8 / maskMod 64 — the cdcChunkStats
                // geometry, on the same lower/space-normalized text)
                // share at least this many DISTINCT fps with the
                // ADMITTED corpus — the re-crawled page whose
                // BOILERPLATE changed, which the whole-doc fingerprint
                // misses because the bytes differ. Admitted docs'
                // distinct chunk fps persist to `_chunkfps/batch=b<id>`
                // (idempotent, compacted with the corpus); the check is
                // one fp-keyed semi join + a per-doc count, scale shape
                // identical to the document exists-cache. Within-batch
                // docs do NOT chunk-gate each other (exact dedup
                // already catches identical docs; near-dups inside one
                // batch admit together — the forward-only contract the
                // line scrub also makes).
                dedupChunksMinShared: Option[Int] = None,
                // persist per-batch latency DELTAS (one row per active
                // stage per batch: stage, le_ms bucket, count) to
                // `_latency/batch=b<id>` — the durable twin of the
                // in-memory histograms. Deltas are mergeable by plain
                // concatenation (the _qstats convention), so compaction
                // folds and restarts compose: the persisted history is
                // the sum over dirs however the session epochs fell.
                // Timing data, not correctness data — a replayed batch
                // overwrites its dir with the REPLAY's timings.
                exportLatency: Boolean = false,
                // per-REASON admission-rate alarm: persist each batch's
                // rejection breakdown (n_in, dup_within, dup_existing,
                // low_quality, gate_rejects, admitted — the counts
                // [[lastBatchStats]] already computes, no extra jobs)
                // to `_astats/batch=b<id>`, and flag any reason whose
                // batch rate departs from the accumulated history rate
                // by ≥ this many ppm — the gate-level twin of the
                // quality-drift monitor (a crawler suddenly feeding 60%
                // duplicates shows on the FIRST bad batch, not at
                // release review). Flags persist to `_alarms` with
                // kind="admission". First batch has no history and
                // stays silent, the monitor family's convention.
                admitTolPpm: Option[Long] = None) {

  private val inputSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("url", StringType)))

  /** (batchId, accepted, dupInBatch, dupExisting, lowQuality,
    * otherRejected — wrong lang, repetition, or gopher/c4 rule gate) */
  @volatile var lastBatchStats: (Long, Long, Long, Long, Long, Long) = (-1L, 0L, 0L, 0L, 0L, 0L)

  /** (batchId, linesTotal, linesScrubbed) of the last batch (line scrub on). */
  @volatile var lastScrubStats: (Long, Long, Long) = (-1L, 0L, 0L)

  /** (batchId, urlDupInBatch, urlDupExisting) of the last batch (url gate on). */
  @volatile var lastUrlStats: (Long, Long, Long) = (-1L, 0L, 0L)

  /** (batchId, docs rejected as chunk-level duplicates of the admitted
    * corpus) of the last batch (chunk gate on). These docs also count
    * in [[lastBatchStats]]' dupExisting — this is the breakdown. */
  @volatile var lastChunkStats: (Long, Long) = (-1L, 0L)

  /** (batchId, admitted ppm of the post-gate batch, max |Δmean_milli|
    * across languages vs the accumulated corpus, languages flagged at
    * driftTolMilli) of the last batch (drift monitor on). First batch
    * has no history: deltas are undefined, nothing flags. */
  @volatile var lastDriftStats: (Long, Long, Long, Long) = (-1L, 0L, 0L, 0L)

  /**
   * Per-stage batch-latency histograms — the ops-side twin of the
   * quality-drift monitor: every batch records one wall-clock sample
   * per ACTIVE pipeline stage ("ingest" the source count, "url" the
   * frontier gate, "scrub" the line scrub, "chunk" the exists +
   * chunk-level dedup when that gate is on, "admit" the dedup/quality
   * pipeline through the corpus write, "monitor" the drift stats,
   * "maintain" compaction + bloom rebuild) into FIXED log₂ buckets —
   * upper bounds 1, 2, 4 … 2¹⁴ ms plus one overflow bucket. State is
   * stages × 16 LONGs however long the stream runs (the bounded-state
   * contract every monitor here makes); a stage's span covers the
   * ACTIONS it triggers, so lazy frames bill to the stage that
   * executes them.
   */
  private val latencyBuckets = 16
  private val latency =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** The current batch's latency deltas ((stage, bucket) -> count),
    * reset per batch and flushed to `_latency/batch=b<id>` when
    * `exportLatency` is on. Accumulating COUNTS (not a last-bucket
    * overwrite) keeps the persisted history ≡ the session histogram
    * even if a stage is ever timed more than once per batch.
    * processBatch is serial (foreachBatch), so plain instance state
    * suffices. */
  private val batchLatency =
    scala.collection.mutable.Map.empty[(String, Int), Long]

  private def recordLatency(stage: String, ms: Long): Unit = {
    val h = latency.computeIfAbsent(stage, _ => new Array[Long](latencyBuckets))
    // smallest i with ms <= 2^i (0 for ms <= 1), capped at the overflow
    val b =
      if (ms <= 1L) 0
      else math.min(latencyBuckets - 1, 64 - java.lang.Long.numberOfLeadingZeros(ms - 1))
    h.synchronized { h(b) += 1L }
    batchLatency.synchronized {
      batchLatency((stage, b)) = batchLatency.getOrElse((stage, b), 0L) + 1L
    }
  }

  /** Batch ids this session flushed — [[latencyAlarm]] excludes them
    * from its history side so a session never drifts against itself.
    * Best-effort by design: once a compaction fold moves them into
    * c-dirs they join history like any earlier epoch (by then the
    * session IS history — the forward-only convention). */
  private val flushedBatches = scala.collection.mutable.Set.empty[Long]

  /** Flush this batch's per-stage samples as an idempotent delta dir. */
  private def flushLatency(batchId: Long): Unit = {
    if (!exportLatency) { batchLatency.clear(); return }
    val rows = batchLatency.synchronized {
      val r = batchLatency.toSeq; batchLatency.clear(); r
    }
    if (rows.isEmpty) return
    import spark.implicits._
    rows.map { case ((stage, b), c) =>
      (stage, if (b == latencyBuckets - 1) -1L else 1L << b, c)
    }.toDF("stage", "le_ms", "count")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$corpusDir/_latency/batch=b$batchId")
    flushedBatches.synchronized { flushedBatches += batchId }
  }

  /** The persisted latency history: per (stage, le_ms bucket) total
    * counts summed over every delta dir — restart- and fold-invariant
    * by the concatenation-merge contract. */
  def latencyHistogramPersisted(): DataFrame =
    latencyHistogramPersistedRaw()
      .groupBy("stage", "le_ms").agg(sum(col("count")).as("count"))

  /** The raw delta rows with their `batch` dir column (so the alarm
    * can exclude this session's own epochs before summing). */
  private def latencyHistogramPersistedRaw(): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("stage", StringType), StructField("le_ms", LongType),
        StructField("count", LongType), StructField("batch", StringType))))
    if (!tableExists(s"$corpusDir/_latency")) empty
    else
      try spark.read.parquet(s"$corpusDir/_latency")
        .select("stage", "le_ms", "count", "batch")
      catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  private def timed[T](stage: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally recordLatency(stage, (System.nanoTime() - t0) / 1000000L)
  }

  /** The histogram as a frame: (stage, le_ms, count) with le_ms the
    * bucket's inclusive upper bound in ms (-1 = the overflow bucket).
    * Only non-empty buckets emit; the frame is stages × ≤16 rows. */
  def latencyHistogram(): DataFrame = {
    import scala.jdk.CollectionConverters._
    val ss = spark
    import ss.implicits._
    latency.asScala.toSeq.flatMap { case (stage, arr) =>
      arr.toSeq.zipWithIndex.collect { case (c, i) if c > 0 =>
        (stage, if (i == latencyBuckets - 1) -1L else 1L << i, c)
      }
    }.toDF("stage", "le_ms", "count")
  }

  /** Conservative percentile read: the upper bound (ms) of the bucket
    * where the cumulative count reaches pct% of the stage's samples;
    * -1 when the stage has no samples or the percentile lands in the
    * overflow bucket. */
  def latencyPercentile(stage: String, pct: Int): Long = {
    require(pct >= 1 && pct <= 100, s"latencyPercentile pct=$pct")
    val arr = latency.get(stage)
    if (arr == null) return -1L
    val snap = arr.synchronized(arr.clone())
    val total = snap.sum
    if (total == 0L) return -1L
    val target = (total * pct + 99L) / 100L
    var cum = 0L
    var i = 0
    while (i < latencyBuckets) {
      cum += snap(i)
      if (cum >= target)
        return if (i == latencyBuckets - 1) -1L else 1L << i
      i += 1
    }
    -1L
  }

  /**
   * The ops-side latency ALARM — the drift-monitor pattern applied to
   * the latency export: per stage, the CURRENT session's p99 bucket
   * against the PERSISTED history's p99 bucket, with this session's
   * own flushed epochs EXCLUDED from the history side (a session
   * never drifts against itself — the drift monitor's own-batch
   * exclusion; best-effort once a fold absorbs them); a stage
   * whose conservative p99 bound rose at least `minSteps` log₂ steps
   * flags. A stage with no history never flags (first-session
   * convention, like the drift monitor's first batch); a session p99
   * in the overflow bucket flags against ANY finite history. The
   * collect is stages × ≤16 rows — model-sized by contract.
   * Returns (stage, hist_p99_ms, session_p99_ms, flagged), one row
   * per stage active this session.
   */
  def latencyAlarm(minSteps: Int = 2): Seq[(String, Long, Long, Boolean)] = {
    require(minSteps >= 1, s"latencyAlarm minSteps=$minSteps")
    val own = flushedBatches.synchronized(flushedBatches.toSeq).map(id => s"b$id")
    val histDf = {
      val all = latencyHistogramPersistedRaw()
      if (own.isEmpty) all else all.filter(!col("batch").isin(own: _*))
    }.groupBy("stage", "le_ms").agg(sum(col("count")).as("count"))
    val hist = histDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    def p99(rows: Seq[(String, Long, Long)]): Long = {
      val total = rows.map(_._3).sum
      val target = (total * 99L + 99L) / 100L
      // overflow (-1) sorts after every finite bound
      val ordered = rows.sortBy { case (_, le, _) => if (le < 0) Long.MaxValue else le }
      var cum = 0L
      ordered.foreach { case (_, le, c) =>
        cum += c
        if (cum >= target) return le
      }
      -1L
    }
    import scala.jdk.CollectionConverters._
    latency.keys.asScala.toSeq.sorted.map { stage =>
      val sess = latencyPercentile(stage, 99)
      val h = hist.get(stage).map(rows => p99(rows.toSeq))
      val flagged = h match {
        case None => false // no history: nothing to drift from
        case Some(-1L) => false // history already in overflow
        case Some(hp) =>
          sess == -1L || (sess >= 0L && hp > 0L && sess >= (hp << minSteps))
      }
      (stage, h.getOrElse(-1L), sess, flagged)
    }
  }

  /** The current batch's quality-drift alarm rows (kind, stage,
    * hist_val, cur_val), buffered by the monitor and flushed with the
    * batch's latency alarms. processBatch is serial, so plain
    * instance state suffices. */
  private val batchQualityAlarms =
    scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]

  /**
   * Durable alarm log — the answer to "what fired last week" a
   * restarted session cannot reconstruct from in-memory flags: every
   * batch (when either monitor is on) writes its FLAGGED events to
   * `_alarms/batch=b<id>` as delta rows (kind ∈ latency|quality,
   * stage = pipeline stage or language, hist_val / cur_val = the
   * compared pair: history p99 ms vs session p99 ms, or prior corpus
   * mean milli vs batch mean milli) — mergeable by plain
   * concatenation like `_latency`, so compaction folds and restarts
   * compose, and a silent batch's (empty) dir overwrites any stale
   * replay rows idempotently. Latency flags are evaluated AFTER the
   * batch's own `_latency` flush, so the alarm's own-epoch exclusion
   * applies and the persisted rows equal [[latencyAlarm]]'s flagged
   * set at that moment.
   */
  private def flushAlarms(batchId: Long): Unit = {
    if (!exportLatency && driftTolMilli.isEmpty && admitTolPpm.isEmpty) { batchQualityAlarms.clear(); return }
    val qRows = { val r = batchQualityAlarms.toList; batchQualityAlarms.clear(); r }
    val lRows =
      if (exportLatency)
        latencyAlarm().collect { case (stage, hp, sp, true) => ("latency", stage, hp, sp) }
      else Seq.empty
    import spark.implicits._
    // the firing batch id travels as a DATA column: compaction folds
    // rewrite the partition dir name, so only an in-row id keeps
    // "which batch fired" answerable after a fold
    (qRows ++ lRows).map { case (k, st, hv, cv) => (k, st, hv, cv, batchId) }
      .toDF("kind", "stage", "hist_val", "cur_val", "at_batch")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$corpusDir/_alarms/batch=b$batchId")
  }

  /** The persisted alarm events: (kind, stage, hist_val, cur_val,
    * at_batch) — every flag any session of this corpus ever raised,
    * restart- and fold-invariant by the concatenation-merge contract
    * (at_batch is an in-row column, so folds preserve it). */
  def alarmsPersisted(): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("kind", StringType), StructField("stage", StringType),
        StructField("hist_val", LongType), StructField("cur_val", LongType),
        StructField("at_batch", LongType))))
    if (!tableExists(s"$corpusDir/_alarms")) empty
    else
      try spark.read.parquet(s"$corpusDir/_alarms")
        .select("kind", "stage", "hist_val", "cur_val", "at_batch")
      catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  private def source(): DataFrame = {
    val r = spark.readStream
      .schema(inputSchema)
      .option("pathGlobFilter", "*.{jsonl,json}")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(dropDir)
  }

  private def tableExists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  private def emptyFps: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("fp", StringType))))

  /** Accepted fingerprints, excluding a replayed batch's own dir. The
    * AnalysisException catch covers exactly one case — a corpus whose
    * dirs hold no data file yet (all-rejected batches), where there is
    * nothing to dedup against; it never gates a destructive action. */
  private def acceptedFps(excludeBatch: Long): DataFrame =
    if (!tableExists(corpusDir)) emptyFps
    else
      try spark.read.parquet(corpusDir)
        .filter(col("batch") =!= lit(s"b$excludeBatch"))
        .select("fp")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyFps }

  private def emptyLineDf: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("kh", LongType), StructField("df", LongType))))

  /** Accumulated per-line document frequencies (possibly several rows
    * per key across batch dirs — summed at read), excluding a replayed
    * batch's own dir. */
  private def lineDfHistory(excludeBatch: Long): DataFrame = {
    val path = s"$corpusDir/_linedf"
    if (!tableExists(path)) emptyLineDf
    else
      try spark.read.parquet(path)
        .filter(col("batch") =!= lit(s"b$excludeBatch"))
        .select("kh", "df")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyLineDf }
  }

  /** (next uncovered batch id, filter): the filter covers every fp
    * admitted in batches BELOW the fence, whatever dir (b or folded c)
    * it lives in now. In-memory only — a restart rebuilds on cadence;
    * until then the plain full anti-join runs, so correctness never
    * depends on this state. */
  @volatile private var bloomState:
    Option[(Long, org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])] = None

  /** Ids of the live (unfolded) batch dirs. */
  private def bDirIds(): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=b"))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch=b").toLong).toOption)
  }

  /** Fingerprints admitted since the bloom fence — the exact-join tail
    * for bloom-miss docs. Always b-dirs: compaction only folds history
    * the CURRENT bloom already covers (rebuild accompanies every fold). */
  private def tailFps(fromBatch: Long, excludeBatch: Long): DataFrame = {
    val ids = bDirIds().filter(id => id >= fromBatch && id != excludeBatch)
    if (ids.isEmpty) emptyFps
    else
      try spark.read.parquet(ids.map(id => s"$corpusDir/batch=b$id"): _*).select("fp")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyFps }
  }

  /**
   * The document exists-check, optionally Bloom-routed (the LSM shape):
   * a filter over the compacted history splits the batch — bloom-miss
   * docs are DEFINITELY absent from history (no false negatives) and
   * only check the small post-fence tail; bloom-hit docs (true dups +
   * the fpp share) pay the full-history anti-join. Without the filter
   * (disabled, or first batches after a restart) every doc pays the
   * full scan — the sketch only routes, so the admitted set is
   * IDENTICAL either way (DocStreamSpec equivalence).
   */
  private def freshAgainstCorpus(candidates: DataFrame, batchId: Long): DataFrame =
    bloomState match {
      case Some((fence, bloomB)) if bloomExpectedItems.isDefined =>
        val mc = udf((fp: String) => fp != null && bloomB.value.mightContainString(fp))
        candidates.filter(mc(col("fp")))
          .join(acceptedFps(batchId), Seq("fp"), "left_anti")
          .unionByName(candidates.filter(!mc(col("fp")))
            .join(tailFps(fence, batchId), Seq("fp"), "left_anti"))
      case _ => candidates.join(acceptedFps(batchId), Seq("fp"), "left_anti")
    }

  /** Drop the routing filter (and its broadcast): the stream falls back
    * to the plain full anti-join — always correct — until the next
    * successful rebuild. Called whenever the in-memory fence can no
    * longer be trusted against the on-disk layout: stream (re)start,
    * a rebuild failure after a fold attempt, and a retroactive scrub
    * (all three are ways admitted fps move where the old fence's
    * routing would miss them — the no-false-negative invariant). */
  private def resetBloomState(): Unit = {
    val old = bloomState.map(_._2)
    bloomState = None
    old.foreach(_.unpersist(blocking = false))
  }

  /** Rebuild the routing filter over the WHOLE corpus as it exists now
    * (including the batch just written — stale replay content only adds
    * false positives, which route to the exact join and change
    * nothing). Due on cadence, after any compaction attempt (folds move
    * b-dirs out of the tail), and on first build.
    *
    * A rebuild FAILURE clears the state instead of keeping the old
    * filter: a fold this same batch may already have moved tail b-dirs
    * the old fence relied on into c-dirs, and routing bloom-miss docs
    * to a tail that no longer holds those fps would re-admit
    * duplicates. No filter = full anti-join = correct, just slower
    * until a later rebuild succeeds. */
  private def maybeRebuildBloom(batchId: Long, compactedThisBatch: Boolean): Unit =
    bloomExpectedItems.foreach { items =>
      val due = bloomState.isEmpty || compactedThisBatch ||
        batchId + 1 - bloomState.get._1 >= bloomRebuildEvery
      if (due)
        try {
          val all =
            if (!tableExists(corpusDir)) emptyFps
            else
              try spark.read.parquet(corpusDir).select("fp")
              catch { case _: org.apache.spark.sql.AnalysisException => emptyFps }
          // ONE broadcast handle per filter generation, not per batch —
          // the old generation is released once its last batch finished
          // (unpersist, not destroy: a rebuild mid-batch on another
          // thread cannot exist — foreachBatch is serial — but cheap
          // safety costs nothing); a corpus-sized filter is exactly what
          // torrent broadcast is for, unlike the closure-captured
          // kilobyte codebooks (KMeansOps.cellsUdf rationale)
          val next = spark.sparkContext.broadcast(
            all.stat.bloomFilter(col("fp"), items, 0.01))
          val old = bloomState.map(_._2)
          bloomState = Some((batchId + 1, next))
          old.foreach(_.unpersist(blocking = false))
        } catch {
          case scala.util.control.NonFatal(e) =>
            resetBloomState()
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"bloom rebuild failed at batch $batchId; routing " +
                "disabled (full anti-join) until the next rebuild", e)
        }
    }

  private def emptyRawFps: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("fp_raw", StringType))))

  /** Raw-content fingerprints already line-df-counted by earlier
    * batches, excluding a replayed batch's own dir. */
  private def rawFpHistory(excludeBatch: Long): DataFrame = {
    val path = s"$corpusDir/_rawfps"
    if (!tableExists(path)) emptyRawFps
    else
      try spark.read.parquet(path)
        .filter(col("batch") =!= lit(s"b$excludeBatch"))
        .select("fp_raw")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyRawFps }
  }

  /** Streaming CCNet scrub (step 0 of the pipeline doc): persist this
    * batch's line dfs, then remove lines hot across history + batch.
    *
    * Line dfs count distinct CONTENT, not copies: an exact-duplicate
    * document must not push its own lines over the cap (the copies
    * would all scrub to empty BEFORE fingerprint dedup could keep one
    * — the round-4 ADVICE interaction). Within the batch one
    * representative per raw fingerprint counts; across batches the
    * `_rawfps` table (accumulated like `_linedf`, idempotent per batch
    * dir) skips content counted by any earlier batch. The SCRUB still
    * applies to every copy, so whichever copy survives dedup is clean. */
  private def scrubBatch(batch: DataFrame, batchId: Long, maxDf: Long): DataFrame = {
    val withRaw = batch.withColumn("fp_raw", TextOps.fingerprint(col("text")))
    val repWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp_raw")).orderBy(col("doc_id"))
    val reps = withRaw.withColumn("rn", row_number().over(repWin))
      .filter(col("rn") === 1)
      .join(rawFpHistory(batchId), Seq("fp_raw"), "left_anti")
    reps.select("fp_raw").write.mode("overwrite")
      .parquet(s"$corpusDir/_rawfps/batch=b$batchId")
    TextOps.lineKeys(reps, "doc_id", "text")
      .groupBy("kh").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$corpusDir/_linedf/batch=b$batchId")
    // the batch's own counts read back from the dir just written — one
    // source-parse job instead of two, and the scrub provably sees the
    // exact rows later batches will
    val batchDf = spark.read.parquet(s"$corpusDir/_linedf/batch=b$batchId")
      .select("kh", "df")
    val hot = batchDf.union(lineDfHistory(batchId))
      .groupBy("kh").agg(sum(col("df")).as("df"))
      .filter(col("df") > maxDf)
      .select("kh")
    val scrubbed = TextOps.scrubLines(batch, "doc_id", "text", hot)
    val st = scrubbed.agg(sum(col("n_lines")), sum(col("n_lines") - col("kept_lines"))).first()
    lastScrubStats = (batchId,
      if (st.isNullAt(0)) 0L else st.getLong(0),
      if (st.isNullAt(1)) 0L else st.getLong(1))
    scrubbed.select(col("id").as("doc_id"), col("clean_text").as("text"))
  }

  private def emptyUrlFps: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("ufp", LongType))))

  /** Seen canonical-url fingerprints, excluding a replayed batch's own dir. */
  private def urlFpHistory(excludeBatch: Long): DataFrame =
    if (!tableExists(s"$corpusDir/_urlfps")) emptyUrlFps
    else
      try spark.read.parquet(s"$corpusDir/_urlfps")
        .filter(col("batch") =!= lit(s"b$excludeBatch"))
        .select("ufp")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyUrlFps }

  /** The crawl-frontier gate: within-batch min-doc_id per canonical
    * url, anti-join against the seen-url history, fresh urls recorded
    * idempotently. Null/empty urls bypass untouched. */
  private def urlGate(batch: DataFrame, batchId: Long): DataFrame = {
    // canonicalUrl maps non-URL strings (no scheme/host) to "" — those
    // bypass like null urls rather than colliding into one group
    val withUfp = batch.withColumn("curl", TextOps.canonicalUrl(col("url")))
      .withColumn("ufp", xxhash64(col("curl")))
    val hasUrl = col("url").isNotNull && col("curl").isNotNull && col("curl") =!= ""
    val noUrl = withUfp.filter(!coalesce(hasUrl, lit(false))).drop("curl", "ufp")
    val withUrl = withUfp.filter(hasUrl).drop("curl")
    val uwin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ufp")).orderBy(col("doc_id"))
    val firstPerUrl = withUrl.withColumn("urn", row_number().over(uwin))
      .filter(col("urn") === 1).drop("urn")
    val freshUrl = firstPerUrl
      .join(urlFpHistory(batchId), Seq("ufp"), "left_anti")
      .cache()
    try {
      // record BEFORE the downstream quality gates: the frontier marks
      // a url seen at fetch time, not at admit time
      freshUrl.select("ufp").distinct()
        .write.mode("overwrite").parquet(s"$corpusDir/_urlfps/batch=b$batchId")
      val nWithUrl = withUrl.count()
      val nFirst = firstPerUrl.count()
      val nFresh = freshUrl.count()
      lastUrlStats = (batchId, nWithUrl - nFirst, nFirst - nFresh)
      freshUrl.drop("ufp").unionByName(noUrl).localCheckpoint()
    } finally freshUrl.unpersist()
  }

  private def emptyChunkFps: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("cfp", LongType))))

  /** Distinct content-defined chunk fps per doc — the cdcChunkStats
    * chunking (fused kernel, window 8 / maskMod 64) on the same
    * normalized text, distinct per doc so a page repeating its own
    * boilerplate counts each chunk once. */
  private def chunkFps(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.operators.CdcChunks(
          trim(regexp_replace(lower(col("text")), "\\s+", " ")), 8, 64)).as("c"))
      .select(col("doc_id"), col("c.fp").as("cfp"))
      .distinct()

  /** Chunk fps of the admitted corpus, excluding a replayed batch's own
    * dir. May repeat across dirs; consumers semi-join, so repeats are
    * harmless. */
  private def chunkFpHistory(excludeBatch: Long): DataFrame =
    if (!tableExists(s"$corpusDir/_chunkfps")) emptyChunkFps
    else
      try spark.read.parquet(s"$corpusDir/_chunkfps")
        .filter(col("batch") =!= lit(s"b$excludeBatch"))
        .select("cfp")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyChunkFps }

  /** The chunk-level exists-check: docs whose distinct chunk fps hit
    * the admitted history at least `minShared` times leave the batch.
    * The semi join dedups the history side per (doc, fp), so the count
    * is "distinct chunks of THIS doc seen anywhere before" — exactly
    * cdcContainmentPairs' containment currency against the corpus. */
  private def chunkGate(candidates: DataFrame, batchId: Long,
                        minShared: Int): DataFrame = {
    val dupIds = chunkFps(candidates)
      .join(chunkFpHistory(batchId), Seq("cfp"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("_shared"))
      .filter(col("_shared") >= minShared.toLong)
      .select("doc_id")
      .localCheckpoint()
    lastChunkStats = (batchId, dupIds.count())
    candidates.join(dupIds, Seq("doc_id"), "left_anti")
  }

  private def emptyQStats: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("lang", StringType), StructField("n", LongType),
        StructField("sum_q", LongType), StructField("sum_q2", LongType))))

  /** Accumulated (n, Σq, Σq²) per language, excluding a replayed
    * batch's own dir — plain sums, so dir concatenation (compaction)
    * and any batch split produce the identical state. */
  private def qStatsHistory(excludeBatch: Long): DataFrame = {
    val raw =
      if (!tableExists(s"$corpusDir/_qstats")) emptyQStats
      else
        try spark.read.parquet(s"$corpusDir/_qstats")
          .filter(col("batch") =!= lit(s"b$excludeBatch"))
          .select("lang", "n", "sum_q", "sum_q2")
        catch { case _: org.apache.spark.sql.AnalysisException => emptyQStats }
    raw.groupBy("lang").agg(sum(col("n")).as("n"),
      sum(col("sum_q")).as("sum_q"), sum(col("sum_q2")).as("sum_q2"))
  }

  /** The accumulated corpus quality state (per language, three LONGs)
    * — what the monitor compares each batch against; exposed so the
    * stream ≡ batch identity is testable. */
  def qualityStats(): DataFrame = qStatsHistory(excludeBatch = -1L)

  /** The drift monitor: persist the batch's admitted per-language
    * moment rows idempotently, then flag languages whose batch mean
    * departs from the PRIOR corpus mean by ≥ tol millis. */
  private def qualityDriftMonitor(admitted: DataFrame, batchId: Long,
                                  nPostGate: Long, nAdmitted: Long,
                                  tol: Long): Unit = {
    val stats = admitted.groupBy(col("lang_guess").as("lang"))
      .agg(count(lit(1)).as("n"), sum(col("quality")).as("sum_q"),
        sum(col("quality") * col("quality")).as("sum_q2"))
    stats.write.mode("overwrite").parquet(s"$corpusDir/_qstats/batch=b$batchId")
    // language-cardinality rows: the collect is model-sized by contract
    val hist = qStatsHistory(excludeBatch = batchId)
      .select(col("lang"), col("n").as("n_h"), col("sum_q").as("sq_h"))
    // exact |Δmean| in millis as ONE cross-multiplied comparison —
    // subtracting two independently floored means can mis-state |Δ| by
    // up to ~2 milli right at the tolerance boundary, making flags at
    // exactly driftTolMilli order-dependent across compactions. Decimal
    // cross products keep the arithmetic exact at corpus scale (Σq·10³·n_h
    // overflows LONG once n·n_h passes ~9·10¹²); |x| ≥ tol ⟺ ⌊|x|⌋ ≥ tol
    // for integral tol, so the floored report and the flag agree exactly.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cross = abs(dec(col("sum_q")) * lit(1000L) * dec(col("n_h")) -
      dec(col("sq_h")) * lit(1000L) * dec(col("n")))
    val deltas = stats.join(hist, Seq("lang"), "left")
      .filter(col("n_h").isNotNull && col("n_h") > 0L && col("n") > 0L)
      .select(col("lang"),
        graft.operators.IntDiv(cross, dec(col("n")) * dec(col("n_h")))
          .cast("long").as("abs_delta_milli"),
        graft.operators.IntDiv(col("sq_h") * lit(1000L), col("n_h"))
          .cast("long").as("hist_mean_milli"),
        graft.operators.IntDiv(col("sum_q") * lit(1000L), col("n"))
          .cast("long").as("batch_mean_milli"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxAbs = if (deltas.isEmpty) 0L else deltas.map(_._2).max
    val flagged = deltas.count(_._2 >= tol).toLong
    // flagged languages join the batch's durable alarm rows with the
    // compared mean pair, the latency-alarm convention
    batchQualityAlarms ++= deltas.collect {
      case (lang, d, hm, bm) if d >= tol => ("quality", lang, hm, bm)
    }
    val ppm = if (nPostGate == 0) 0L else nAdmitted * 1000000L / nPostGate
    lastDriftStats = (batchId, ppm, maxAbs, flagged)
  }

  /** The per-reason admission-rate monitor: persist this batch's
    * rejection breakdown (read from [[lastBatchStats]] — the counts
    * the admit stage already paid for) as `_astats/batch=b<id>`, then
    * flag any reason whose batch ppm departs from the accumulated
    * history ppm by ≥ tol. Rates are exact integral ppm on both
    * sides; history excludes this batch's own dir so replays compare
    * against the same baseline (the `_qstats` convention). */
  private def admissionRateMonitor(batchId: Long, tol: Long): Unit = {
    val (_, admitted, dupW, dupE, lowQ, gates) = lastBatchStats
    val nIn = admitted + dupW + dupE + lowQ + gates
    import spark.implicits._
    Seq((nIn, dupW, dupE, lowQ, gates, admitted))
      .toDF("n_in", "dup_within", "dup_existing", "low_quality",
        "gate_rejects", "admitted")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$corpusDir/_astats/batch=b$batchId")
    if (nIn == 0) return
    val hist = admissionStatsRaw(excludeBatch = batchId).collect()
    if (hist.isEmpty || hist(0).isNullAt(0)) return
    val hn = hist(0).getLong(0)
    if (hn == 0) return
    val hvals = (1 to 5).map(hist(0).getLong)
    val bvals = Seq(dupW, dupE, lowQ, gates, admitted)
    val names = Seq("dup_within", "dup_existing", "low_quality",
      "gate_rejects", "admitted")
    (names, bvals, hvals).zipped.foreach { (reason, b, h) =>
      val bp = b * 1000000L / nIn
      val hp = h * 1000000L / hn
      if (math.abs(bp - hp) >= tol)
        batchQualityAlarms += (("admission", reason, hp, bp))
    }
  }

  /** Accumulated admission breakdown sums, excluding a replayed
    * batch's own dir — one row of six LONGs, or empty pre-history. */
  private def admissionStatsRaw(excludeBatch: Long): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("n_in", "dup_within", "dup_existing", "low_quality",
        "gate_rejects", "admitted").map(StructField(_, LongType))))
    val raw =
      if (!tableExists(s"$corpusDir/_astats")) empty
      else
        try spark.read.parquet(s"$corpusDir/_astats")
          .filter(col("batch") =!= lit(s"b$excludeBatch"))
          .select("n_in", "dup_within", "dup_existing", "low_quality",
            "gate_rejects", "admitted")
        catch { case _: org.apache.spark.sql.AnalysisException => empty }
    raw.agg(sum(col("n_in")).as("n_in"), sum(col("dup_within")).as("dup_within"),
      sum(col("dup_existing")).as("dup_existing"),
      sum(col("low_quality")).as("low_quality"),
      sum(col("gate_rejects")).as("gate_rejects"),
      sum(col("admitted")).as("admitted"))
  }

  /** The accumulated admission breakdown (one six-LONG row) — exposed
    * so the stream ≡ batch identity is testable. */
  def admissionStats(): DataFrame = admissionStatsRaw(excludeBatch = -1L)

  private[streaming] def processBatch(batch0: DataFrame, batchId: Long): Unit =
    try processBatchInner(batch0, batchId)
    finally {
      // latency first: the alarm evaluation then excludes this batch's
      // own epoch from its history side
      flushLatency(batchId)
      flushAlarms(batchId)
    }

  private def processBatchInner(batch0: DataFrame, batchId: Long): Unit = {
    val n0 = timed("ingest")(batch0.count())
    if (n0 == 0) return
    // downstream rejection counters key off the post-url-gate count, so
    // the stats identity (accepted + rejects = n) still holds per stage
    val (urlGated, n) =
      if (dedupUrls) timed("url") {
        val g = urlGate(batch0, batchId)
        (g, g.count())
      }
      else (batch0, n0)
    if (n == 0) return
    val batch = dedupLinesMaxDf
      .map(m => timed("scrub")(scrubBatch(urlGated, batchId, m)))
      .getOrElse(urlGated)
    // the corpus schema stays (doc_id, text, fp, …) — the url column is
    // gate input only (drop is a no-op for direct-call frames without it)
    val withFp = batch.drop("url").withColumn("fp", TextOps.fingerprint(col("text")))
    // within-batch dedup: min doc_id per fingerprint (one window shuffle)
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val firstPerFp = withFp.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1).drop("rn")
    // document exists-cache: anti-join accepted fingerprints (Bloom-
    // routed around the history scan when enabled), then the optional
    // chunk-level exists-check (the batch materializes once so the
    // chunking pass and the kept side don't re-run the history join)
    val freshBase = dedupChunksMinShared match {
      case Some(minShared) => timed("chunk") {
        chunkGate(freshAgainstCorpus(firstPerFp, batchId).localCheckpoint(),
          batchId, minShared)
      }
      case None => freshAgainstCorpus(firstPerFp, batchId)
    }
    val fresh = freshBase
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .withColumn("lang_guess", TextOps.langGuess(col("text")))
      .cache()
    try {
      val langOk = if (langs.isEmpty) lit(true) else col("lang_guess").isin(langs: _*)
      val repOk = maxTopWordFrac.map(m => TextOps.topWordFrac(col("text")) <= m)
        .getOrElse(lit(true))
      val gopherOk = if (requireGopher) TextOps.gopherPass(col("text")) else lit(true)
      val c4Ok = if (requireC4) TextOps.c4Pass(col("text")) else lit(true)
      val admitted = fresh.filter(col("quality") >= minQuality && langOk && repOk &&
        gopherOk && c4Ok)
      // stats ride the cached `fresh` (no re-read of the written dir —
      // an all-rejected batch writes an empty dir that can't be read)
      val nAdmitted = timed("admit") {
        val na = admitted.count()
        admitted.write.mode("overwrite").parquet(s"$corpusDir/batch=b$batchId")

        val nFresh = fresh.count()
        val nLowQ = fresh.filter(col("quality") < minQuality).count()
        val nFirst = firstPerFp.count()
        // chunk-level rejects count in dupExisting (they ARE existing-
        // content duplicates); lastChunkStats carries the breakdown
        lastBatchStats = (batchId, na, n - nFirst, nFirst - nFresh,
          nLowQ, nFresh - nLowQ - na)

        // the admitted docs' chunk fps become tomorrow's chunk history —
        // written BEFORE compaction so the fold sees this batch's dir
        dedupChunksMinShared.foreach { _ =>
          chunkFps(admitted).select("cfp").distinct().write.mode("overwrite")
            .parquet(s"$corpusDir/_chunkfps/batch=b$batchId")
        }
        na
      }

      // drift monitor BEFORE compaction: the history it reads excludes
      // this batch's dir, so replays compare against the same baseline
      driftTolMilli.foreach(t =>
        timed("monitor")(qualityDriftMonitor(admitted, batchId, n, nAdmitted, t)))
      admitTolPpm.foreach(t =>
        timed("monitor")(admissionRateMonitor(batchId, t)))

      // dirs below the current batch id are checkpoint-committed and
      // immutable — quiesce-free fold, failure tolerated (retried next
      // cycle; every fold is crash-safe at any interruption point)
      val compacting = compactEveryBatches.exists(m => m > 0 && batchId > 0 && batchId % m == 0)
      timed("maintain") {
        if (compacting)
          try {
            TableCompactor.onlineCompactAppend(spark, corpusDir, fence = batchId,
              sortCols = Seq("fp"))
            // the line-df table folds on the same fence; its read path
            // sums rows per key, so concatenation is the correct merge
            if (dedupLinesMaxDf.isDefined && tableExists(s"$corpusDir/_linedf"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_linedf",
                fence = batchId, sortCols = Seq("kh"))
            // _rawfps reads via anti-join, so concatenation merges it too
            if (dedupLinesMaxDf.isDefined && tableExists(s"$corpusDir/_rawfps"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_rawfps",
                fence = batchId, sortCols = Seq("fp_raw"))
            // seen-url fps read via anti-join too — same fold
            if (dedupUrls && tableExists(s"$corpusDir/_urlfps"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_urlfps",
                fence = batchId, sortCols = Seq("ufp"))
            // quality moments read via per-lang sums — concatenation merges
            if (driftTolMilli.isDefined && tableExists(s"$corpusDir/_qstats"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_qstats",
                fence = batchId, sortCols = Seq("lang"))
            // chunk fps read via semi-join — concatenation merges
            if (dedupChunksMinShared.isDefined && tableExists(s"$corpusDir/_chunkfps"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_chunkfps",
                fence = batchId, sortCols = Seq("cfp"))
            // latency deltas read via per-bucket sums — concatenation merges
            if (exportLatency && tableExists(s"$corpusDir/_latency"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_latency",
                fence = batchId, sortCols = Seq("stage"))
            // admission breakdowns read via column sums — concatenation merges
            if (admitTolPpm.isDefined && tableExists(s"$corpusDir/_astats"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_astats",
                fence = batchId, sortCols = Seq("n_in"))
            // alarm events are plain rows — concatenation merges
            if ((exportLatency || driftTolMilli.isDefined || admitTolPpm.isDefined) &&
                tableExists(s"$corpusDir/_alarms"))
              TableCompactor.onlineCompactAppend(spark, s"$corpusDir/_alarms",
                fence = batchId, sortCols = Seq("kind", "stage"))
          } catch {
            case scala.util.control.NonFatal(e) =>
              org.slf4j.LoggerFactory.getLogger(getClass)
                .warn(s"corpus compaction failed at batch $batchId (will retry)", e)
          }
        // rebuild AFTER any fold attempt: the new filter reads whatever
        // layout exists now, so the tail invariant holds either way
        maybeRebuildBloom(batchId, compacting)
      }
    } finally fresh.unpersist()
  }

  def start(triggerMs: Long = 1000): StreamingQuery = {
    // a filter built in a previous run can be stale relative to what
    // happened to the dirs since (external scrub, crashed rebuild) —
    // restart from the always-correct full anti-join and rebuild on
    // cadence (the ADVICE staleness case)
    resetBloomState()
    source().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
  }

  /** Drain everything currently in the drop dir, then stop. */
  def runAvailableNow(): Unit = {
    resetBloomState()
    val q = source().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
    q.awaitTermination()
  }

  /**
   * Retroactive corpus-wide line scrub — [[TextOps.dedupLines]]'s rule
   * applied to the ADMITTED corpus, closing the streaming scrub's
   * forward-only gap: a line that crossed the df cap at batch k was
   * scrubbed from batch k+1 onward, but the docs admitted BEFORE k
   * still carry it; this compaction-style pass rewrites them clean.
   *
   * Mechanics: the hot set is the stream's LIFETIME `_linedf` when
   * present — the same df definition the forward scrub gates on. (The
   * admitted corpus alone cannot identify late-hot lines: once the
   * stream starts scrubbing a line, later admitted docs don't carry
   * it, so an admitted-corpus recount would see df back under the cap
   * exactly for the lines this pass exists to remove.) A corpus with
   * no line-scrub state falls back to recomputing dfs from the
   * admitted docs — there the pass IS batch [[TextOps.dedupLines]].
   * Then a read-only pass over the corpus finds the
   * batch dirs that actually contain a scrubbed doc (nothing
   * materialized — only one stat row per dirty dir reaches the
   * driver), and ONE dynamic-partition-overwrite write re-reads just
   * those dirs (partition-pruned), re-scrubs them against the
   * checkpointed hot set, and replaces exactly those `batch=`
   * partitions. Each dir is still overwritten whole — the same per-dir
   * idempotent-replay contract the stream's own writes use (a crash
   * mid-rewrite is repaired by rerunning the pass) — but there is no
   * corpus-sized materialization and no per-dir driver loop: at 100 TB
   * the rewrite cost is sized by the DIRTY dirs, executed as one
   * distributed job. `fp`/`quality`/`lang_guess` recompute on the
   * clean text so the stored invariants (fp = fingerprint(text)) hold
   * for future exists-cache joins.
   *
   * Idempotent: after a pass no admitted doc carries a hot line, so a
   * second pass (same hot set from `_linedf`, or nothing above the cap
   * in the recount fallback) scrubs zero lines and rewrites nothing.
   * Safe against a LIVE stream: only dirs visible at read time are
   * rewritten and the stream never revisits a committed dir (it would
   * only overwrite a dir on replay of that same batch — whose content
   * this pass preserves doc-for-doc, minus hot lines).
   *
   * Returns (docsRewritten, linesScrubbed).
   */
  def retroScrubLines(maxDf: Long): (Long, Long) = {
    if (!tableExists(corpusDir)) return (0L, 0L)
    val corpus =
      try spark.read.parquet(corpusDir)
      catch { case _: org.apache.spark.sql.AnalysisException => return (0L, 0L) }
    val dfs =
      if (tableExists(s"$corpusDir/_linedf"))
        lineDfHistory(excludeBatch = -1L) // lifetime counts, no exclusion
          .groupBy("kh").agg(sum(col("df")).as("df"))
      else
        TextOps.lineKeys(corpus, "doc_id", "text")
          .groupBy("kh").agg(count_distinct(col("id")).as("df"))
    val hot = dfs.filter(col("df") > maxDf)
      .select("kh")
      .localCheckpoint() // reused by both scrub passes; sized by the hot set
    if (hot.isEmpty) return (0L, 0L)
    // pass 1, read-only: which dirs hold a doc carrying a hot line, and
    // the rewrite stats — one row PER DIRTY DIR reaches the driver,
    // nothing corpus-sized is checkpointed or collected
    val scrub = TextOps.scrubLines(corpus, "doc_id", "text", hot)
      .withColumn("cut", col("n_lines") - col("kept_lines"))
    val dirStats = scrub.filter(col("cut") > 0)
      .join(corpus.select(col("doc_id").as("id"), col("batch")), "id")
      .groupBy("batch")
      .agg(count(lit(1)).as("docs"), sum(col("cut")).as("cut"))
      .collect()
    if (dirStats.isEmpty) return (0L, 0L)
    val dirs = dirStats.map(_.getString(0)).toSeq
    // pass 2, the write: re-read ONLY the dirty dirs (partition-pruned
    // scan), re-scrub against the small checkpointed hot set, and
    // replace exactly those batch= partitions in one dynamic-partition
    // overwrite — clean dirs and the `_`-prefixed side tables are not
    // touched, and a live stream's foreign batch dirs are invisible to
    // the write (its partition set is the dirty set)
    val dirtyCorpus = spark.read.parquet(corpusDir).filter(col("batch").isin(dirs: _*))
    val cleaned = TextOps.scrubLines(dirtyCorpus, "doc_id", "text", hot)
      .select(col("id").as("doc_id"), col("clean_text"))
    dirtyCorpus.select("doc_id", "batch").join(cleaned, "doc_id")
      .select(col("doc_id"), col("clean_text").as("text"),
        TextOps.fingerprint(col("clean_text")).as("fp"),
        TextOps.qualityScore(col("clean_text")).as("quality"),
        TextOps.langGuess(col("clean_text")).as("lang_guess"),
        col("batch"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(corpusDir)
    // the rewrite changed stored fps; a live routing filter would call
    // cleaned-content duplicates "definitely absent" (the ADVICE
    // staleness case) — full anti-join until the next rebuild
    resetBloomState()
    (dirStats.map(_.getLong(1)).sum, dirStats.map(_.getLong(2)).sum)
  }

  private def emptyCorpus: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(inputSchema.fields ++ Seq(
        StructField("fp", StringType), StructField("quality", LongType),
        StructField("lang_guess", StringType))))

  /** The accepted corpus (doc_id, text, fp, quality, lang_guess). */
  def accepted(): DataFrame =
    if (!tableExists(corpusDir)) emptyCorpus
    else
      try spark.read.parquet(corpusDir).drop("batch")
      catch { case _: org.apache.spark.sql.AnalysisException => emptyCorpus }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Graphite-web-style series functions over the points stream
 * (`path, value, time, version`): `summarize`, `derivative` /
 * `perSecond`, `movingAverage`. The reference engine is ingest-only
 * (carbon-clickhouse feeds a separate render stack), but these are the
 * first functions any graphite-family reader runs over the tables this
 * engine writes, so they belong in the same library — re-expressed as
 * window/aggregate plans rather than the per-series in-memory loops
 * graphite-web uses.
 *
 * Determinism: within one series, points order by `(time, version)` —
 * the same total order the LWW read view uses — so every lag/frame
 * computation is replayable. Cross-engine float policy: group sums
 * round to 4 decimals (the accepted corpus pattern), rates to 6;
 * moving averages quantize values to 1e-6 integers and sum LONGS in
 * the frame so the windowed sum is exact and association-order-free
 * (DuckDB computes sliding frames with a segment tree, which reorders
 * a double sum's additions; an integer sum cannot drift).
 *
 * Scale: all three are one hash shuffle on `path` (or `(path,
 * bucket)`) followed by in-partition work. Series count bounds the
 * partition key cardinality; no self-joins, no per-series collects.
 * One hot series skews its partition — the shared caveat of every
 * per-key window here (salt upstream if one series dominates).
 */
object SeriesOps {

  private def seriesWindow =
    Window.partitionBy("path").orderBy(col("time").asc, col("version").asc)

  /**
   * graphite `summarize(series, interval, fn)`: tumbling time buckets
   * per path, aligned to multiples of `intervalSec` from the epoch
   * (graphite's default alignment). `fn`: sum | avg | min | max |
   * last | count — `last` is the LWW pick, max value by
   * `(time, version)`.
   */
  def summarize(points: DataFrame, intervalSec: Long, fn: String): DataFrame = {
    val agg = fn match {
      case "sum"   => round(sum("value"), 4)
      case "avg"   => round(avg("value"), 4)
      case "min"   => min("value")
      case "max"   => max("value")
      case "last"  => max_by(col("value"), struct(col("time"), col("version")))
      case "count" => count(lit(1)).cast("double")
      case other   => throw new IllegalArgumentException(s"summarize fn: $other")
    }
    points
      .groupBy(col("path"),
        (col("time") - (col("time") % intervalSec)).as("bucket_start"))
      .agg(count(lit(1)).as("n_points"), agg.as("value"))
      .select("path", "bucket_start", "n_points", "value")
  }

  /**
   * graphite `derivative(series)`: per-point delta to the previous
   * point of the same series (null for each series' first point —
   * graphite emits None there too).
   */
  def derivative(points: DataFrame): DataFrame =
    points.select(col("path"), col("time"), col("version"),
      round(col("value") - lag("value", 1).over(seriesWindow), 6).as("delta"))

  /**
   * graphite `nonNegativeDerivative(series)`: [[derivative]] with
   * counter resets (negative deltas) emitted as null instead of a
   * negative spike — the standard counter-metric rate prep.
   */
  def nonNegativeDerivative(points: DataFrame): DataFrame = {
    val delta = col("value") - lag("value", 1).over(seriesWindow)
    points.select(col("path"), col("time"), col("version"),
      round(when(delta >= 0, delta), 6).as("nn_delta"))
  }

  /**
   * graphite `integral(series)`: per-series running cumulative sum.
   * The running sum accumulates 1e-6-quantized LONGS (same policy as
   * [[movingAverage]]), so the prefix sums are exact integers in both
   * engines — a plain double cumsum would drift between Spark's
   * in-order frame evaluation and DuckDB's segment tree.
   */
  def integral(points: DataFrame): DataFrame = {
    val frame = seriesWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runQ = sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).over(frame)
    points.select(col("path"), col("time"), col("version"),
      round(runQ.cast("double") / lit(1.0e6), 6).as("running_total"))
  }

  /**
   * graphite `integralByInterval(series, interval)`: [[integral]]'s
   * running sum, RESET at each epoch-aligned interval boundary — the
   * daily-cumulative-counter view of a rate series ("how much so far
   * today", restarting at midnight). Same exact 1e-6-quantized LONG
   * frame sums as [[integral]], windowed per (path, bucket) instead
   * of per path, so the reset is the partition boundary itself — no
   * conditional, no extra pass; the bucket column is kept for
   * inspection.
   */
  def integralByInterval(points: DataFrame, intervalSec: Long): DataFrame = {
    require(intervalSec >= 1, s"intervalSec >= 1, got $intervalSec")
    val bucketed = points.withColumn("bucket_start",
      (col("time") - (col("time") % intervalSec)).cast("long"))
    val frame = Window.partitionBy("path", "bucket_start")
      .orderBy(col("time").asc, col("version").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runQ = sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).over(frame)
    bucketed.select(col("path"), col("bucket_start"), col("time"), col("version"),
      round(runQ.cast("double") / lit(1.0e6), 6).as("running_total"))
  }

  /**
   * graphite `timeShift(series, shift)` composed with its one real
   * use: comparing a series against itself `shiftSec` earlier (the
   * day-over-day render). Raw points are first consolidated onto a
   * `stepSec` grid with a last-write-wins pick per bucket (graphite
   * renders consolidated series; irregular raw instants would almost
   * never collide exactly `shiftSec` apart), then the shifted copy
   * equi-joins back on `(path, gtime)` — two same-key hash
   * exchanges, the second reusable, no range scan. Inner join:
   * buckets with no data `shiftSec` earlier drop, like a graphite
   * overlay only draws where both windows have data.
   */
  def timeShiftCompare(points: DataFrame, shiftSec: Long, stepSec: Long): DataFrame = {
    require(stepSec >= 1 && shiftSec % stepSec == 0,
      s"timeShift shift=$shiftSec must be a multiple of step=$stepSec")
    val lww = points
      .groupBy(col("path"), (col("time") - col("time") % stepSec).as("gtime"))
      .agg(max_by(col("value"), struct(col("time"), col("version"))).as("value"))
    val shifted = lww.select(col("path"),
      (col("gtime") + shiftSec).as("gtime"), col("value").as("value_shifted"))
    lww.join(shifted, Seq("path", "gtime"))
      .select(col("path"), col("gtime"), col("value"), col("value_shifted"),
        round(col("value") - col("value_shifted"), 6).as("shift_delta"))
  }

  /**
   * graphite `keepLastValue(series, limit)` over a consolidated
   * fixed-step grid: each series is resampled to `stepSec` buckets
   * (LWW pick within a bucket), the full per-series grid is
   * materialized (`sequence` + explode — grid size is span/step per
   * series, never corpus-sized), and empty buckets forward-fill from
   * the most recent real value at most `limit` buckets back — the
   * bounded-gap fill graphite uses so a dead series eventually shows
   * the hole. `filled` marks synthesized rows. One shuffle for the
   * bucket LWW; the span aggregate and grid join reuse its
   * partitioning.
   */
  def keepLastValue(points: DataFrame, stepSec: Long, limit: Int): DataFrame = {
    require(stepSec >= 1 && limit >= 0, s"keepLastValue step=$stepSec limit=$limit")
    val lww = points
      .groupBy(col("path"), (col("time") - col("time") % stepSec).as("gtime"))
      .agg(max_by(col("value"), struct(col("time"), col("version"))).as("value"))
    val grid = lww.groupBy("path")
      .agg(min("gtime").as("t0"), max("gtime").as("t1"))
      .select(col("path"),
        explode(sequence(col("t0"), col("t1"), lit(stepSec))).as("gtime"))
    val w = Window.partitionBy("path").orderBy("gtime")
      .rowsBetween(-limit.toLong, Window.currentRow)
    grid.join(lww, Seq("path", "gtime"), "left")
      .select(col("path"), col("gtime"),
        col("value").isNull.as("filled"),
        round(last(col("value"), ignoreNulls = true).over(w), 6).as("value_ff"))
  }

  /**
   * graphite `groupByNode(seriesList, node, fn)`: series whose dotted
   * path shares the `node`-th segment aggregate pointwise per
   * timestamp (after the same per-(path,time) LWW collapse as
   * [[timeShiftCompare]]). `sum`/`avg` run on 1e-6-quantized LONGS
   * (exact across engines); `min`/`max` are order statistics and need
   * no quantizer. Output is `(node_group, time)`-sized — the
   * cross-series rollup that turns per-host series into a service
   * view.
   */
  def groupByNode(points: DataFrame, node: Int, fn: String): DataFrame = {
    val lww = points.groupBy("path", "time")
      .agg(max_by(col("value"), col("version")).as("value"))
      .withColumn("node_group", split(col("path"), "\\.").getItem(node))
    val q = floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")
    val agg = fn match {
      case "sum" => round(sum(q).cast("double") / lit(1.0e6), 6)
      case "avg" => round(sum(q).cast("double") / lit(1.0e6) / count(lit(1)).cast("double"), 6)
      case "min" => min("value")
      case "max" => max("value")
      case other => throw new IllegalArgumentException(s"groupByNode fn: $other")
    }
    lww.groupBy("node_group", "time")
      .agg(count(lit(1)).as("n_series"), agg.as("value"))
  }

  /**
   * graphite `asPercent(seriesList)`: each series' share of the
   * pointwise all-series total (after the LWW collapse). Shares are
   * computed from 1e-6-quantized LONG sums, so both engines divide
   * the same exact integers — the one double division and round are
   * then bit-identical. Instants whose total is zero emit a null
   * share (graphite draws a gap rather than a division blowup).
   *
   * Scale: one shuffle for the LWW collapse, one time-keyed
   * aggregate (instant-count-sized), one same-key join back. The
   * per-time total is a single row per instant, never a broadcast of
   * the series set.
   */
  def asPercent(points: DataFrame): DataFrame = {
    val q = floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")
    val lww = points.groupBy("path", "time")
      .agg(max_by(col("value"), col("version")).as("value"))
      .withColumn("q", q)
    val totals = lww.groupBy("time").agg(sum("q").as("total_q"))
    lww.join(totals, "time")
      .select(col("path"), col("time"), col("value"),
        round(when(col("total_q") =!= 0L,
          col("q").cast("double") / col("total_q").cast("double") * 100.0), 6)
          .as("pct"))
  }

  /**
   * graphite `stdev(series, points)`: trailing n-point population
   * standard deviation per series. The frame accumulates the same
   * exact quantized LONG sums as [[outliers]] (values at 1e-6,
   * squares at 1e-3 — the coarser quantizer keeps a full frame of
   * squares inside a LONG), so μ and σ² come from identical integers
   * through an identical double chain on both engines; `sqrt` is
   * IEEE-correctly-rounded everywhere. Quantization can push a
   * near-constant frame's variance epsilon-negative — clamped to 0
   * rather than NaN.
   */
  def movingStdDev(points: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingStdDev needs n >= 1, got $n")
    val frame = seriesWindow.rowsBetween(-(n - 1L), Window.currentRow)
    val s1 = sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).over(frame)
    val s2 = sum(pow(floor(col("value") * lit(1.0e3) + lit(0.5)), 2).cast("long")).over(frame)
    val cnt = count(lit(1)).over(frame)
    val mean = s1.cast("double") / lit(1.0e6) / cnt.cast("double")
    val variance = s2.cast("double") / lit(1.0e6) / cnt.cast("double") - mean * mean
    points.select(col("path"), col("time"), col("version"),
      cnt.as("n_window"),
      round(sqrt(greatest(variance, lit(0.0))), 6).as("mstddev"))
  }

  /**
   * Time-of-day seasonal baseline: each series' mean per hour-of-day
   * slot (exact quantized sums), joined back so every point carries
   * its slot baseline and the residual — the "is tonight unusual for
   * 3am" signal that a plain global z-score ([[outliers]]) washes
   * out. Output is LWW-collapsed.
   *
   * Scale: the profile is 24 rows per series — aggregate-sized, and
   * the join back is same-key on `(path, hod)` so AQE reuses the
   * exchange; nothing is corpus-broadcast.
   */
  def seasonalBaseline(points: DataFrame): DataFrame = {
    val lww = points.groupBy("path", "time")
      .agg(max_by(col("value"), col("version")).as("value"))
      .withColumn("hod", floor((col("time") % 86400L) / 3600.0d).cast("long"))
    val profile = lww.groupBy("path", "hod").agg(
      count(lit(1)).as("n_slot"),
      sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).as("s1"))
      .withColumn("baseline",
        round(col("s1").cast("double") / lit(1.0e6) / col("n_slot").cast("double"), 6))
      .select("path", "hod", "baseline")
    lww.join(profile, Seq("path", "hod"))
      .select(col("path"), col("time"), col("hod"), col("value"),
        col("baseline"), round(col("value") - col("baseline"), 6).as("residual"))
  }

  /** Integer 1e-6 weights for [[exponentialMovingAverage]]: α(1−α)^k
    * for k = 0..window−1, α = 2/(n+1), floor-quantized so both engines
    * sum the same exact integers. Exposed so the oracle SQL is built
    * from the IDENTICAL constants. */
  def emaWeights(n: Int, window: Int): Seq[Long] = {
    val a = 2.0 / (n + 1)
    (0 until window).map(k => math.floor(a * math.pow(1 - a, k) * 1e6 + 0.5).toLong)
  }

  /**
   * graphite `exponentialMovingAverage(series, n)` in its truncated-
   * window form: a weighted trailing mean with weights α(1−α)^k,
   * α = 2/(n+1), cut at `window` points (the tail past that carries
   * < (1−α)^window of the mass). Graphite's own EMA seeds the
   * recursion at the first point; the truncated form is the
   * replayable variant — an unbounded recursion's double
   * accumulation order cannot be pinned across engines, whereas here
   * every term is an exact product of a 1e-6-quantized value and a
   * 1e-6-quantized integer weight ([[emaWeights]]), and the head of a
   * series renormalizes over the weights actually present (so the
   * first point is itself, like graphite's seed).
   */
  def exponentialMovingAverage(points: DataFrame, n: Int, window: Int = 8): DataFrame = {
    require(n >= 1 && window >= 1, s"ema n=$n window=$window")
    val wts = emaWeights(n, window)
    val terms = wts.zipWithIndex.map { case (wk, k) =>
      val v = lag(col("value"), k).over(seriesWindow)
      (when(v.isNotNull, floor(v * lit(1.0e6) + lit(0.5)).cast("long") * lit(wk)).otherwise(lit(0L)),
       when(v.isNotNull, lit(wk)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    points.select(col("path"), col("time"), col("version"),
      round(num.cast("double") / den.cast("double") / lit(1.0e6), 6).as("ema"))
  }

  /**
   * graphite `perSecond(series)`: delta divided by the time step,
   * null on a counter reset (negative delta), a zero step (two
   * versions at one timestamp), or the series head.
   */
  def perSecond(points: DataFrame): DataFrame = {
    val delta = col("value") - lag("value", 1).over(seriesWindow)
    val dt = col("time") - lag("time", 1).over(seriesWindow)
    points.select(col("path"), col("time"), col("version"),
      round(when(dt > 0 && delta >= 0, delta / dt.cast("double")), 6).as("rate"))
  }

  /**
   * graphite `movingMin(series, n)` + `movingMax(series, n)` in one
   * pass: trailing n-point envelope per series (head frames cover
   * what exists, graphite's behavior). Min/max are ORDER STATISTICS —
   * no arithmetic at all, so cross-engine identity needs no
   * quantization; both bounds share one window frame. The envelope
   * pair is the band alerting reads ("did the floor drop / ceiling
   * spike inside the last n points") and the cheap precursor to the
   * Bollinger/HW bands when a σ model is overkill.
   */
  def movingMinMax(points: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingMinMax needs n >= 1, got $n")
    val frame = seriesWindow.rowsBetween(-(n - 1L), Window.currentRow)
    points.select(col("path"), col("time"), col("version"), col("value"),
      min(col("value")).over(frame).as("mov_min"),
      max(col("value")).over(frame).as("mov_max"),
      count(lit(1)).over(frame).as("n_window"))
  }

  /**
   * graphite `movingAverage(series, n)`: trailing n-point mean per
   * series (the first points average over what exists — graphite's
   * behavior at the window head). The frame sums 1e-6-quantized LONGS,
   * so the result is bit-identical across engines and frame
   * implementations; `n_window` reports how many points the frame held.
   */
  def movingAverage(points: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingAverage needs n >= 1, got $n")
    val frame = seriesWindow.rowsBetween(-(n - 1L), Window.currentRow)
    val sumQ = sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).over(frame)
    val cnt = count(lit(1)).over(frame)
    points.select(col("path"), col("time"), col("version"),
      cnt.as("n_window"),
      round(sumQ.cast("double") / cnt.cast("double") / lit(1.0e6), 6).as("mavg"))
  }

  /**
   * Per-series z-score outliers: points with |value − μ| > z·σ against
   * their OWN series' population mean/stddev. Moments come from exact
   * quantized LONG sums (values at 1e-6, squares at 1e-3 — squares use
   * the coarser quantizer so a billion-point series of |v| ≤ ~3e6
   * stays inside a LONG; past that, shard the sum) so both engines
   * derive μ and σ² from identical integers through an identical
   * double chain. Constant series (σ² ≤ 0) emit nothing. One
   * aggregation + one same-key join (reused exchange under AQE).
   */
  def outliers(points: DataFrame, z: Double): DataFrame = {
    val stats = points.groupBy("path").agg(
      count(lit(1)).as("n"),
      sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).as("s1"),
      sum(pow(floor(col("value") * lit(1.0e3) + lit(0.5)), 2).cast("long")).as("s2"))
    val mean = col("s1").cast("double") / lit(1.0e6) / col("n").cast("double")
    val variance = col("s2").cast("double") / lit(1.0e6) / col("n").cast("double") -
      col("mean") * col("mean")
    points.join(
        stats.withColumn("mean", mean).withColumn("variance", variance)
          .filter(col("variance") > 0)
          .select(col("path"), col("mean"), col("variance")),
        "path")
      .withColumn("zscore",
        (col("value") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("zscore")) > z)
      .select(col("path"), col("time"), col("version"), col("value"),
        round(col("zscore"), 4).as("zscore"))
  }

  /**
   * graphite `highestAverage(seriesList, n)`: the `n` series with the
   * highest mean value, ties to the lexicographically smaller path.
   * Exact integer mean; WindowGroupLimit keeps n per partition before
   * the single-row rank exchange (the aggregate output is
   * series-count-sized, not point-count-sized).
   */
  def highestAverage(points: DataFrame, n: Int): DataFrame = {
    val w = Window.orderBy(col("avg_value").desc, col("path").asc)
    points.groupBy("path")
      .agg(count(lit(1)).as("n_points"),
        sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).as("s1"))
      .withColumn("avg_value",
        round(col("s1").cast("double") / lit(1.0e6) / col("n_points").cast("double"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("rank").cast("long").as("rank"), col("path"),
        col("n_points"), col("avg_value"))
  }

  /**
   * Gap detection: per series, every sampling hole longer than
   * `minGapSec` — (gap_start, gap_end) spans between consecutive
   * points in (time, version) order, with the hole length. The
   * missing-data monitor a metrics pipeline alerts on (a scrape that
   * stopped, a partition that never uploaded). One lag window per
   * series, output sized by the number of HOLES, not points.
   */
  def gaps(points: DataFrame, minGapSec: Long): DataFrame = {
    require(minGapSec >= 1, s"minGapSec >= 1, got $minGapSec")
    points
      .withColumn("prev_t", lag(col("time"), 1).over(seriesWindow))
      .filter(col("prev_t").isNotNull && col("time") - col("prev_t") > minGapSec)
      .select(col("path"), col("prev_t").as("gap_start"),
        col("time").as("gap_end"),
        (col("time") - col("prev_t")).as("gap_sec"))
  }

  /**
   * CUSUM change-point locator: for each series, the point where the
   * cumulative deviation from the series mean peaks — the classic
   * level-shift estimate (a series that jumps from baseline a to b
   * has |Σ(x−x̄)| maximal exactly at the shift). All integer: with
   * q = round(value·1e6) and prefix_i = Σ_{j≤i} q_j,
   *
   *   C_i = n·prefix_i − i·Σq     (deviation scaled by n to stay
   *                                rational-free)
   *
   * the emitted point maximizes |C_i| (ties → earliest (time,
   * version), via a single composite struct max). `shift_milli` =
   * C/(n·1000) normalizes back to value·points units. Overflow
   * envelope: n²·|value|·1e6 < 2⁶³ — a 30-day minutely series of
   * |v| ≤ 10⁴ is safe; shard longer histories by window first.
   *
   * Plan: one path-keyed window (running sum + row number) + one
   * hash aggregate — series-count-sized output.
   */
  def cusumChangePoint(points: DataFrame): DataFrame = {
    val q = floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")
    val w = seriesWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("path")
    val c = points
      .withColumn("q", q)
      .withColumn("prefix", sum(col("q")).over(w))
      .withColumn("i", row_number().over(seriesWindow).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sq", sum(col("q")).over(wAll))
      .withColumn("cnum", col("n") * col("prefix") - col("i") * col("sq"))
    c.groupBy("path")
      .agg(max(struct(abs(col("cnum")).as("a"), (-col("time")).as("nt"),
        (-col("version")).as("nv"), col("cnum").as("c"),
        col("time").as("t"), col("version").as("v"))).as("best"),
        first(col("n")).as("n_points"))
      .select(col("path"), col("n_points"),
        col("best.t").as("t_change"), col("best.v").as("version_change"),
        col("best.c").as("cusum_num"),
        round(col("best.c").cast("double") /
          (col("n_points").cast("double") * lit(1000.0)), 4).as("shift_milli"))
  }

  /**
   * M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
   * Series Data Aggregation", VLDB 2014): per (series, time bucket),
   * the first, last, min and max points — the four points that make a
   * pixel-width bucket render EXACTLY like the raw series on a line
   * chart, which is why it's the standard render-path reducer (a
   * 10⁹-point series becomes 4·width rows with zero visual error).
   *
   * Each representative is one composite `min`/`max` over a struct —
   * (time, version, value) for first/last, (value, time, version) for
   * the extremes — so tie-breaks ride the struct's lexicographic
   * order identically on any engine, and the whole operator is ONE
   * hash aggregate with map-side partials: no window, no sort, no
   * join. Output is bucket-count-sized.
   */
  def m4Downsample(points: DataFrame, bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, s"bucketSec >= 1, got $bucketSec")
    val byTime = struct(col("time"), col("version"), col("value"))
    val byValue = struct(col("value"), col("time"), col("version"))
    points
      .withColumn("bucket_start", (col("time") - col("time") % bucketSec))
      .groupBy("path", "bucket_start")
      .agg(count(lit(1)).as("n_points"),
        min(byTime).as("f"), max(byTime).as("l"),
        min(byValue).as("lo"), max(byValue).as("hi"))
      .select(col("path"), col("bucket_start"), col("n_points"),
        col("f.time").as("t_first"), col("f.value").as("v_first"),
        col("l.time").as("t_last"), col("l.value").as("v_last"),
        col("lo.time").as("t_min"), col("lo.value").as("v_min"),
        col("hi.time").as("t_max"), col("hi.value").as("v_max"))
  }

  /**
   * graphite `nPercentile(series, p)`: each series' exact interpolated
   * p-th percentile (type-7, the [[graft.operators.EventOps.groupPercentiles]]
   * contract) with its point count. One path-keyed aggregate; the
   * per-series sort happens inside its group's partition, never
   * globally.
   */
  def seriesPercentile(points: DataFrame, p: Double): DataFrame = {
    require(p > 0 && p < 100, s"percentile in (0,100), got $p")
    points.groupBy("path").agg(
      count(lit(1)).as("n_points"),
      round(percentile(col("value"), lit(p / 100.0)), 4).as("pval"))
  }

  /**
   * graphite `percentileOfSeries(seriesList, p)`: the p-th percentile
   * of the values ACROSS series at each timestamp — the cross-series
   * band [[seriesPercentile]]'s per-series order statistic can't see
   * (capacity planning reads p90-of-hosts per minute, not p90 of one
   * host over time). LWW-collapsed per (path, time) first — the same
   * winning points the read view serves, so a re-sent point can't
   * count twice in the band — then one time-keyed exact continuous
   * (type-7) percentile, 4-dp, with the contributing series count.
   *
   * Plan: one (path, time) aggregate then one time-keyed aggregate —
   * both map-side combinable, no window over the stream; cardinality
   * is bounded by distinct timestamps.
   */
  def percentileOfSeries(points: DataFrame, p: Double): DataFrame = {
    require(p > 0 && p < 100, s"percentile in (0,100), got $p")
    points.groupBy("path", "time")
      .agg(max_by(col("value"), col("version")).as("value"))
      .groupBy("time")
      .agg(count(lit(1)).as("n_series"),
        round(percentile(col("value"), lit(p / 100.0)), 4).as("pval"))
  }

  /**
   * graphite `removeAbovePercentile(series, p)`: drop every point
   * strictly above its OWN series' p-th percentile (graphite keeps
   * the boundary value). The aggregate band table joins back on the
   * same path key — one reusable exchange, no window over the stream.
   */
  def removeAbovePercentile(points: DataFrame, p: Double): DataFrame = {
    require(p > 0 && p < 100, s"percentile in (0,100), got $p")
    val bands = points.groupBy("path")
      .agg(percentile(col("value"), lit(p / 100.0)).as("cap"))
    points.join(bands, "path")
      .filter(col("value") <= col("cap"))
      .select("path", "time", "version", "value")
  }

  /**
   * graphite `filterSeries(series, fn, op, threshold)` — the family
   * behind averageAbove / maximumBelow / sumAbove / …: keep every
   * POINT of each series whose aggregate passes the test. `fn`:
   * sum | avg | min | max (sum/avg from exact 1e-6-quantized LONGs,
   * min/max are order statistics — no float arithmetic anywhere a
   * threshold comparison could drift on); `op`: "above" (strict) or
   * "below" (strict), graphite's semantics. Aggregate side is
   * series-count-sized; AQE broadcasts it back onto the stream.
   */
  def filterSeries(points: DataFrame, fn: String, op: String,
                   threshold: Double): DataFrame = {
    val sumQ = sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long"))
    val stat = fn match {
      case "sum" => sumQ.cast("double") / lit(1.0e6)
      case "avg" => sumQ.cast("double") / lit(1.0e6) / count(lit(1)).cast("double")
      case "min" => min(col("value"))
      case "max" => max(col("value"))
      case other => throw new IllegalArgumentException(s"filterSeries fn: $other")
    }
    val pass = op match {
      case "above" => col("stat") > threshold
      case "below" => col("stat") < threshold
      case other   => throw new IllegalArgumentException(s"filterSeries op: $other")
    }
    val keep = points.groupBy("path").agg(stat.as("stat")).filter(pass).select("path")
    points.join(keep, "path").select("path", "time", "version", "value")
  }

  /**
   * graphite `sortByTotal(series)` + `limit(n)`: the `n` series with
   * the largest integer-exact value sum, ties to the smaller path.
   * The [[highestAverage]] plan with sum in place of mean.
   */
  def sortByTotal(points: DataFrame, n: Int): DataFrame = {
    val w = Window.orderBy(col("total").desc, col("path").asc)
    points.groupBy("path")
      .agg(count(lit(1)).as("n_points"),
        sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).as("s1"))
      .withColumn("total", round(col("s1").cast("double") / lit(1.0e6), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("rank").cast("long").as("rank"), col("path"),
        col("n_points"), col("total"))
  }

  /**
   * graphite `linearRegression(series)`: per-series ordinary least
   * squares over (minutes-since-series-start, value), as RATIONAL
   * integer sums — `slope_num / slope_den` is the exact OLS slope in
   * milli-value units per minute, derivable bit-identically on any
   * engine because every sum is a LONG over quantized inputs:
   * x = (time − min time) / 60 (integer minutes), q = round(value·1e3).
   *
   *   slope_num = n·Σxq − Σx·Σq     slope_den = n·Σx² − (Σx)²
   *
   * Overflow audit (LONG max ~9.2e18): with a 30-day series span
   * (x ≤ 43 200) and |value| ≤ 1e3 (q ≤ 1e6), n·Σxq ≤ n²·4.3e10 —
   * safe to n ≈ 14 000 points/series; a year-long span is safe to
   * n ≈ 4 000. Beyond that, coarsen x to hours (same formula). The
   * doubles (`slope_per_min`, `intercept`) derive from the integer
   * sums through one fixed arithmetic chain, so they replay too.
   *
   * Single-minute or single-point series (slope_den = 0) emit NULL
   * slope/intercept. One hash aggregation on `path`; output is
   * series-count-sized. Scale: no window, no join, no sort — the
   * cheapest per-series shape there is.
   */
  def linearTrend(points: DataFrame): DataFrame = {
    val q = floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long")
    val agg = points
      .withColumn("tmin", min(col("time")).over(Window.partitionBy("path")))
      .withColumn("x", ((col("time") - col("tmin")) / lit(60L)).cast("long"))
      .withColumn("q", q)
      .groupBy("path")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("q")).as("sq"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("q")).as("sxq"))
    val num = col("n") * col("sxq") - col("sx") * col("sq")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = col("slope_num").cast("double") / col("slope_den").cast("double")
    val meanX = col("sx").cast("double") / col("n").cast("double")
    val meanQ = col("sq").cast("double") / col("n").cast("double")
    agg
      .withColumn("slope_num", num)
      .withColumn("slope_den", den)
      .select(col("path"), col("n"), col("slope_num"), col("slope_den"),
        when(col("slope_den") =!= 0L, round(slope / lit(1.0e3), 6))
          .as("slope_per_min"),
        when(col("slope_den") =!= 0L,
            round((meanQ - slope * meanX) / lit(1.0e3), 6))
          .as("intercept"))
  }

  /**
   * Robust per-series outliers by median / MAD (median absolute
   * deviation) — the z-score detector's heavy-tail-safe sibling:
   * one wild point inflates σ and hides itself, but barely moves the
   * median. Works on DOUBLED 1e-3-quantized integers (`q2 = 2·q`) so
   * every exact-interpolated median is a dyadic rational (int or
   * int + 0.5) that both engines represent exactly in a double —
   * the same type-7 `percentile` / `quantile_cont` contract the group
   * percentile operator pins. A point is an outlier when
   * |q2 − median(q2)| > k·MAD(q2) (the 0.6745 σ-consistency constant
   * is folded into the caller's k). Constant series (MAD = 0) emit
   * zero outliers rather than all-points-outlying.
   *
   * Plan: three path-keyed hash shuffles (median agg → deviation join
   * → MAD agg → count join), each over series-count-sized aggregate
   * frames on one side; no global sort — the per-series exact median
   * sorts only within its group's partition.
   */
  def madOutliers(points: DataFrame, k: Double): DataFrame = {
    val q2 = (floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long") * 2L)
      .cast("double")
    val med = points.groupBy("path").agg(
      count(lit(1)).as("n"),
      percentile(q2, lit(0.5)).as("med2"))
    val dev = points.join(med, "path")
      .withColumn("dev2", abs(q2 - col("med2")))
    val mad = dev.groupBy("path").agg(percentile(col("dev2"), lit(0.5)).as("mad2"))
    dev.join(mad, "path")
      .groupBy("path")
      .agg(first(col("n")).as("n"),
        first(col("med2")).as("med2"),
        first(col("mad2")).as("mad2"),
        sum(when(col("mad2") > 0 && col("dev2") > lit(k) * col("mad2"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("path"), col("n"),
        round(col("med2") / lit(2000.0), 4).as("median"),
        round(col("mad2") / lit(2000.0), 4).as("mad"),
        col("n_outliers"))
  }

  /**
   * graphite `movingMedian(series, n)`: trailing n-point EXACT median
   * per series — the robust smoother ops dashboards reach for when
   * one spike should not drag the [[movingAverage]] line. Values are
   * 1e-6-quantized to LONGS inside the frame, so the sort-and-pick is
   * over identical integers on both engines; an even-width frame
   * interpolates the two middle values, which is exact in doubles at
   * this magnitude. Head-of-series frames median over what exists
   * (graphite's window-head behavior, same as movingAverage).
   *
   * Scale: one hash shuffle on `path`, then in-partition frames. The
   * exact percentile is re-evaluated per sliding frame (O(n·w) per
   * series) — w is a smoothing constant (5..60), never data-sized, so
   * the term stays linear in points.
   */
  def movingMedian(points: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingMedian needs n >= 1, got $n")
    val frame = seriesWindow.rowsBetween(-(n - 1L), Window.currentRow)
    val q = floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")
    points.select(col("path"), col("time"), col("version"),
      count(lit(1)).over(frame).as("n_window"),
      round(percentile(q, lit(0.5)).over(frame) / lit(1.0e6), 6).as("mmedian"))
  }

  /**
   * Holt double exponential smoothing with milli-quantized gains —
   * graphite's `holtWintersForecast` family member for trending
   * series, in the engine-exact form: level and trend evolve as
   *   l' = (α·q + (1000−α)·(l + b)) div 1000
   *   b' = (β·(l' − l) + (1000−β)·b) div 1000
   * (α, β in milli units; truncation division identical on every
   * engine), initialized l = q₀, b = q₁ − q₀ — under which
   * processing q₁ is an EXACT no-op (the classic init property,
   * preserved by the quantization and spec-pinned). Forecast h steps
   * out is `l + h·b`. Everything is a LONG; the oracle replays the
   * per-series fold with a recursive CTE (the Goertzel/ADPCM
   * pattern).
   *
   * Series shorter than 2 points drop (no trend to initialize —
   * the linearTrend NULL-slope convention). Shape: one collect_list
   * per series folded by the `aggregate` HOF — the series-fits-a-
   * partition assumption every per-series window here already makes;
   * the fold is O(n) with constant state, the output one row per
   * series.
   */
  def holtForecast(points: DataFrame, alphaMilli: Long, betaMilli: Long,
                   horizon: Int = 3): DataFrame = {
    require(alphaMilli >= 0 && alphaMilli <= 1000, s"alphaMilli in [0,1000]: $alphaMilli")
    require(betaMilli >= 0 && betaMilli <= 1000, s"betaMilli in [0,1000]: $betaMilli")
    require(horizon >= 1, s"horizon >= 1: $horizon")
    val a = alphaMilli; val na = 1000L - alphaMilli
    val bb = betaMilli; val nb = 1000L - betaMilli
    val q = floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long")
    val lExpr = s"($a * e.q + $na * (acc.l + acc.b)) div 1000"
    val st = expr(
      s"""aggregate(
         |  slice(arr, 2, size(arr) - 1),
         |  named_struct('l', arr[0].q, 'b', arr[1].q - arr[0].q),
         |  (acc, e) -> named_struct(
         |    'l', $lExpr,
         |    'b', ($bb * (($lExpr) - acc.l) + $nb * acc.b) div 1000))""".stripMargin)
    val fcs = (1 to horizon).map(h =>
      (col("st.l") + lit(h.toLong) * col("st.b")).as(s"fc${h}_milli"))
    points
      .groupBy("path")
      .agg(sort_array(collect_list(struct(col("time"), col("version"), q.as("q"))))
        .as("arr"))
      .filter(size(col("arr")) >= 2)
      .withColumn("st", st)
      .select(Seq(col("path"), size(col("arr")).cast("long").as("n"),
        col("st.l").as("level_milli"), col("st.b").as("trend_milli")) ++ fcs: _*)
  }

  /**
   * Windowed Theil–Sen robust trend per series: the exact median of
   * pairwise slopes between each point and its next `maxLag` ROW
   * successors — the estimator whose breakdown point [[linearTrend]]
   * lacks (one spike drags an OLS slope arbitrarily; here it can
   * corrupt at most `maxLag` of the ~n·maxLag slopes, and the median
   * shrugs). The lag bound is what makes the classic O(n²) pair set
   * linear: full Theil–Sen over a million-point series would build
   * 5·10¹¹ pairs, the windowed form builds n·maxLag.
   *
   * Exactness: x in integer minutes, q = round(value·1e3) — each
   * slope is `((qk − q)·1000) div (xk − x)` micro-units per minute
   * (truncation division, identical on every engine), DOUBLED
   * **after** the division so every median input is even and the
   * even-count interpolation `(a+b)/2` is an exact INTEGER double
   * (the [[madOutliers]] idiom — doubling before the division leaves
   * arbitrary parity and the interpolated `…5` halfway then rounds
   * differently on decimal-vs-binary engines; this op hit exactly
   * that at sf0.001 before the reorder). The median ships as the
   * doubled-micro LONG itself — no float rounding anywhere in the
   * output. Same-minute pairs (Δx = 0) are dropped; series with no
   * surviving pair emit no row (degenerate, like linearTrend's NULL
   * slope).
   *
   * Shape: one per-series window builds the `maxLag` leads, the
   * explode is n·maxLag bounded, one hash aggregate folds the
   * median — no self-join anywhere.
   */
  def theilSenTrend(points: DataFrame, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, s"theilSenTrend needs maxLag >= 1, got $maxLag")
    val tmin = Window.partitionBy("path")
    val base = points
      .withColumn("x", ((col("time") - min(col("time")).over(tmin)) / lit(60L)).cast("long"))
      .withColumn("q", floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long"))
    val leads = (1 to maxLag).map(k =>
      struct(lead(col("x"), k).over(seriesWindow).as("xk"),
        lead(col("q"), k).over(seriesWindow).as("qk")))
    base
      // window expressions first, the generator in a SEPARATE
      // projection (a generator over window results in one operator
      // is UNSUPPORTED_EXPR_FOR_OPERATOR)
      .withColumn("nbrs", array(leads: _*))
      .withColumn("nbr", explode(col("nbrs")))
      .filter(col("nbr.xk").isNotNull && col("nbr.xk") > col("x"))
      .withColumn("slope2",
        IntDiv((col("nbr.qk") - col("q")) * 1000L, col("nbr.xk") - col("x")) * 2L)
      .groupBy("path")
      .agg(count(lit(1)).as("n_slopes"),
        percentile(col("slope2"), lit(0.5)).cast("long").as("slope2_micro"))
  }

  /**
   * graphite `weightedAverage(seriesListAvg, seriesListWeight, node)`:
   * pair each value series with its weight series by the path MINUS
   * the leaf node (the graphite node-matching convention), then roll
   * the pairs up per `groupNode` path component and time bucket as
   * Σ(value·weight) / Σ(weight) — the host-count-weighted service
   * mean a plain [[groupByNode]] avg gets wrong when hosts differ in
   * size. Irregular streams never share exact timestamps, so both
   * sides consolidate to `stepSec` buckets first with graphite's
   * "last" consolidation (after the LWW collapse, last-in-bucket is
   * max-by-time — versions are already folded). Values quantize at
   * 1e-6 and weights at 1e-3, so the Σ(v·w) accumulator is an exact
   * LONG sum (product ≤ ~1e15 per point) and both engines divide the
   * same integers. A zero/negative weight total emits a null
   * (graphite draws a gap).
   *
   * Scale: one LWW shuffle, two filters of that frame, a same-key
   * (pair_key, bucket) shuffle join of series-pair-sized frames, one
   * rollup. Nothing broadcasts; the pair key carries series
   * cardinality, not points.
   */
  def weightedAverage(points: DataFrame, valueLeaf: String, weightLeaf: String,
                      groupNode: Int, stepSec: Long): DataFrame = {
    require(stepSec >= 1, s"weightedAverage needs stepSec >= 1, got $stepSec")
    val lww = points.groupBy("path", "time")
      .agg(max_by(col("value"), col("version")).as("value"))
      .withColumn("leaf", element_at(split(col("path"), "\\."), -1))
      .withColumn("pair_key", regexp_replace(col("path"), "\\.[^.]*$", ""))
      .withColumn("bucket", col("time") - col("time") % stepSec)
      .groupBy("pair_key", "leaf", "bucket")
      .agg(max_by(col("value"), col("time")).as("value"))
    val v = lww.filter(col("leaf") === valueLeaf)
      .select(col("pair_key"), col("bucket"),
        floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long").as("vq"))
    val w = lww.filter(col("leaf") === weightLeaf)
      .select(col("pair_key"), col("bucket"),
        floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long").as("wq"))
    v.join(w, Seq("pair_key", "bucket"))
      .withColumn("grp", split(col("pair_key"), "\\.").getItem(groupNode))
      .groupBy("grp", "bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("vq") * col("wq")).as("vw"),
        sum(col("wq")).as("wsum"))
      .select(col("grp"), col("bucket"), col("n_pairs"),
        round(when(col("wsum") > 0L,
          col("vw").cast("double") / col("wsum").cast("double") / lit(1.0e6)), 6)
          .as("wavg"))
  }

  /**
   * Additive Holt–Winters TRIPLE smoothing (level + trend + a
   * 4-slot seasonal cycle) — graphite's `holtWintersForecast`
   * proper, where [[holtForecast]] is the trend-only double form.
   * All state is 1e-3-quantized LONGs folded per series with
   * milli-gains α/β/γ; every division is `div` — TRUNCATION toward
   * zero, which is exactly DuckDB's integer `//` (verified:
   * `(-7)//2 = -3` there; a floor-division formulation drifted one
   * unit on every negative seasonal deviation during bring-up and
   * was red-flagged by the oracle on first contact — truncation is
   * the shared semantic, same as g_holt). Init: level = trunc-mean
   * of the first 4 points, trend = 0, seasonals = first-cycle
   * deviations. Forecast h steps out re-uses the slot the h-th
   * future index lands on.
   *
   * Scale: [[holtForecast]]'s exact shape — one collect_list + one
   * O(n) HOF fold per series (series-fits-a-partition), output one
   * row per series. The 4-slot cycle keeps the fold state fixed-size
   * (struct of 7 LONGs), so nothing grows with history.
   */
  def holtWinters(points: DataFrame, alphaMilli: Long, betaMilli: Long,
                  gammaMilli: Long): DataFrame = {
    require(alphaMilli >= 0 && alphaMilli <= 1000, s"alphaMilli in [0,1000]: $alphaMilli")
    require(betaMilli >= 0 && betaMilli <= 1000, s"betaMilli in [0,1000]: $betaMilli")
    require(gammaMilli >= 0 && gammaMilli <= 1000, s"gammaMilli in [0,1000]: $gammaMilli")
    val a = alphaMilli; val na = 1000L - alphaMilli
    val bb = betaMilli; val nb = 1000L - betaMilli
    val g = gammaMilli; val ng = 1000L - gammaMilli
    def fdiv(x: String) = s"(($x) div 1000)"
    val q = floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long")
    val curS = "(CASE CAST(acc.i % 4 AS INT) WHEN 0 THEN acc.s0 WHEN 1 THEN acc.s1 " +
      "WHEN 2 THEN acc.s2 ELSE acc.s3 END)"
    val lNew = fdiv(s"$a * (e.q - $curS) + $na * (acc.l + acc.b)")
    val bNew = fdiv(s"$bb * ($lNew - acc.l) + $nb * acc.b")
    val sNew = fdiv(s"$g * (e.q - $lNew) + $ng * $curS")
    val st = expr(
      s"""aggregate(
         |  slice(arr, 5, size(arr) - 4),
         |  named_struct(
         |    'i', CAST(4 AS BIGINT), 'l', l0, 'b', CAST(0 AS BIGINT),
         |    's0', arr[0].q - l0, 's1', arr[1].q - l0,
         |    's2', arr[2].q - l0, 's3', arr[3].q - l0),
         |  (acc, e) -> named_struct(
         |    'i', acc.i + 1,
         |    'l', $lNew,
         |    'b', $bNew,
         |    's0', IF(acc.i % 4 = 0, $sNew, acc.s0),
         |    's1', IF(acc.i % 4 = 1, $sNew, acc.s1),
         |    's2', IF(acc.i % 4 = 2, $sNew, acc.s2),
         |    's3', IF(acc.i % 4 = 3, $sNew, acc.s3)))""".stripMargin)
    def slot(h: Int): Column = {
      val idx = (col("st.i") + lit(h.toLong - 1)) % 4
      when(idx === 0, col("st.s0")).when(idx === 1, col("st.s1"))
        .when(idx === 2, col("st.s2")).otherwise(col("st.s3"))
    }
    val fcs = (1 to 4).map(h =>
      (col("st.l") + lit(h.toLong) * col("st.b") + slot(h)).as(s"fc${h}_milli"))
    points
      .groupBy("path")
      .agg(sort_array(collect_list(struct(col("time"), col("version"), q.as("q"))))
        .as("arr"))
      .filter(size(col("arr")) >= 5)
      .withColumn("l0",
        expr("(arr[0].q + arr[1].q + arr[2].q + arr[3].q) div 4"))
      .withColumn("st", st)
      .select(Seq(col("path"), size(col("arr")).cast("long").as("n"),
        col("st.l").as("level_milli"), col("st.b").as("trend_milli"),
        col("st.s0").as("s0_milli"), col("st.s1").as("s1_milli"),
        col("st.s2").as("s2_milli"), col("st.s3").as("s3_milli")) ++ fcs: _*)
  }

  /**
   * graphite `holtWintersConfidenceBands` + `holtWintersAberration`
   * folded into [[holtWinters]]'s integer recurrence: alongside
   * level/trend/seasonals, the state carries a γ-smoothed absolute
   * one-step-ahead deviation d (graphite smooths the deviation series
   * with the same seasonal gain) and an aberration counter — points
   * whose |y − pred| exceeded k·d at THEIR step, judged against the
   * deviation BEFORE that point (a point never vouches for itself —
   * the StreamAnomaly rule) and only after a warm-up of two full
   * cycles (i ≥ 8; the init state's d = 0 would flag everything).
   * Output per series: the h=1 forecast, final deviation, the
   * ±k·d band around the forecast, and the aberrant-point count.
   * Same truncation-division milli arithmetic as [[holtWinters]], so
   * the recursive-CTE oracle replays it term for term.
   */
  def holtWintersBands(points: DataFrame, alphaMilli: Long, betaMilli: Long,
                       gammaMilli: Long, kBand: Long = 3L): DataFrame = {
    require(alphaMilli >= 0 && alphaMilli <= 1000, s"alphaMilli in [0,1000]: $alphaMilli")
    require(betaMilli >= 0 && betaMilli <= 1000, s"betaMilli in [0,1000]: $betaMilli")
    require(gammaMilli >= 0 && gammaMilli <= 1000, s"gammaMilli in [0,1000]: $gammaMilli")
    require(kBand >= 1, s"kBand >= 1: $kBand")
    val a = alphaMilli; val na = 1000L - alphaMilli
    val bb = betaMilli; val nb = 1000L - betaMilli
    val g = gammaMilli; val ng = 1000L - gammaMilli
    def fdiv(x: String) = s"(($x) div 1000)"
    val q = floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long")
    val curS = "(CASE CAST(acc.i % 4 AS INT) WHEN 0 THEN acc.s0 WHEN 1 THEN acc.s1 " +
      "WHEN 2 THEN acc.s2 ELSE acc.s3 END)"
    val pred = s"(acc.l + acc.b + $curS)"
    val lNew = fdiv(s"$a * (e.q - $curS) + $na * (acc.l + acc.b)")
    val bNew = fdiv(s"$bb * ($lNew - acc.l) + $nb * acc.b")
    val sNew = fdiv(s"$g * (e.q - $lNew) + $ng * $curS")
    val dNew = fdiv(s"$g * abs(e.q - $pred) + $ng * acc.d")
    val cNew = s"acc.c + IF(acc.i >= 8 AND abs(e.q - $pred) > $kBand * acc.d, 1, 0)"
    val st = expr(
      s"""aggregate(
         |  slice(arr, 5, size(arr) - 4),
         |  named_struct(
         |    'i', CAST(4 AS BIGINT), 'l', l0, 'b', CAST(0 AS BIGINT),
         |    's0', arr[0].q - l0, 's1', arr[1].q - l0,
         |    's2', arr[2].q - l0, 's3', arr[3].q - l0,
         |    'd', CAST(0 AS BIGINT), 'c', CAST(0 AS BIGINT)),
         |  (acc, e) -> named_struct(
         |    'i', acc.i + 1,
         |    'l', $lNew,
         |    'b', $bNew,
         |    's0', IF(acc.i % 4 = 0, $sNew, acc.s0),
         |    's1', IF(acc.i % 4 = 1, $sNew, acc.s1),
         |    's2', IF(acc.i % 4 = 2, $sNew, acc.s2),
         |    's3', IF(acc.i % 4 = 3, $sNew, acc.s3),
         |    'd', $dNew,
         |    'c', $cNew))""".stripMargin)
    val slot1 = {
      val idx = col("st.i") % 4
      when(idx === 0, col("st.s0")).when(idx === 1, col("st.s1"))
        .when(idx === 2, col("st.s2")).otherwise(col("st.s3"))
    }
    points
      .groupBy("path")
      .agg(sort_array(collect_list(struct(col("time"), col("version"), q.as("q"))))
        .as("arr"))
      .filter(size(col("arr")) >= 5)
      .withColumn("l0",
        expr("(arr[0].q + arr[1].q + arr[2].q + arr[3].q) div 4"))
      .withColumn("st", st)
      .withColumn("fc1_milli", col("st.l") + col("st.b") + slot1)
      .select(col("path"), size(col("arr")).cast("long").as("n"),
        col("fc1_milli"), col("st.d").as("dev_milli"),
        (col("fc1_milli") - lit(kBand) * col("st.d")).as("band_lo_milli"),
        (col("fc1_milli") + lit(kBand) * col("st.d")).as("band_hi_milli"),
        col("st.c").as("n_aberrant"))
  }

  /**
   * graphite `hitcount(series, interval)`: treat each value as a
   * per-second rate and integrate it over the gap to the NEXT point
   * of the same series, bucketing the area by the point's own time
   * (graphite's estimate of "total hits per bucket" for counters
   * rendered as rates). A series' last point has no forward gap and
   * contributes nothing — graphite pads with the retention step; a
   * raw stream has no step to pad with, so the honest answer is 0.
   *
   * Determinism: value quantizes to 1e-6 LONGs before the
   * `vq * gap` product, so the bucket sum is an integer sum —
   * association-order-free — and divides back once at the end.
   *
   * Scale: one window shuffle on `path` for the lead(), then a
   * `(path, bucket)` hash aggregate with map-side partials. No
   * self-join; the bucket count bounds output.
   */
  def hitcount(points: DataFrame, intervalSec: Long): DataFrame = {
    require(intervalSec >= 1, s"hitcount needs intervalSec >= 1, got $intervalSec")
    points
      .withColumn("gap", lead("time", 1).over(seriesWindow) - col("time"))
      .filter(col("gap").isNotNull && col("gap") > 0L)
      .withColumn("vq", floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long"))
      .groupBy(col("path"),
        (col("time") - (col("time") % intervalSec)).as("bucket_start"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("vq") * col("gap")).as("hq"))
      .select(col("path"), col("bucket_start"), col("n_points"),
        round(col("hq").cast("double") / lit(1.0e6), 4).as("hits"))
  }

  /**
   * Bollinger-style stddev bands: per point, the trailing-`n` frame's
   * mean ± `k`·stddev (population, over the frame), plus a breach
   * flag when the value leaves the band. The alerting primitive
   * graphite spells `stdev()` + `offset()` by hand.
   *
   * Determinism: the ENTIRE breach test is integer arithmetic on
   * 1e-6-quantized longs — `(n·q − S1)² > k²·(n·S2 − S1²)` is the
   * band inequality cleared of divisions and square roots, so no
   * float comparison can disagree across engines. The reported band
   * edges divide back to rounded doubles for display only.
   *
   * Scale: one window shuffle on `path`, two framed integer sums —
   * the movingAverage plan with one extra sum. Long headroom: q ≤
   * ~1e8 for |value| ≤ 100, so n·S2 ≤ n²·q² ≈ 25·1e16 « 2⁶³.
   */
  def stddevBands(points: DataFrame, n: Int, k: Int): DataFrame = {
    require(n >= 2 && k >= 1, s"stddevBands needs n >= 2, k >= 1, got n=$n k=$k")
    val frame = seriesWindow.rowsBetween(-(n - 1), Window.currentRow)
    points
      .withColumn("q", floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long"))
      .withColumn("nw", count(lit(1)).over(frame))
      .withColumn("s1", sum("q").over(frame))
      .withColumn("s2", sum(col("q") * col("q")).over(frame))
      .withColumn("dev2", (col("nw") * col("q") - col("s1")) *
        (col("nw") * col("q") - col("s1")))
      .withColumn("var_n2", col("nw") * col("s2") - col("s1") * col("s1"))
      .select(col("path"), col("time"), col("version"), col("nw").as("n_window"),
        round(col("s1").cast("double") / col("nw").cast("double") / lit(1.0e6), 6)
          .as("mid"),
        round(sqrt(col("var_n2").cast("double")) / col("nw").cast("double") / lit(1.0e6), 6)
          .as("band_sigma"),
        when(col("dev2") > lit(k.toLong * k) * col("var_n2"), 1L).otherwise(0L)
          .as("breach"))
  }

  /**
   * graphite `mostDeviant(series, n)`: the `n` series with the
   * largest value variance — the triage view that surfaces which
   * metrics are actually moving. Population variance compares as the
   * pure-integer key `cnt·Σq² − (Σq)²` over 1e-3-quantized longs
   * (milli, not micro: Σq² must clear 2⁶³ at per-series point counts
   * in the millions), tie-broken by path for a total order.
   *
   * Scale: one hash aggregate on `path` (map-side partials), then a
   * single top-n — rank the per-series rollup, never the points.
   */
  def mostDeviant(points: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"mostDeviant needs n >= 1, got $n")
    points
      .withColumn("q", floor(col("value") * lit(1.0e3) + lit(0.5)).cast("long"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_points"), sum("q").as("s1"),
        sum(col("q") * col("q")).as("s2"))
      .withColumn("var_key", col("n_points") * col("s2") - col("s1") * col("s1"))
      .orderBy(col("var_key").desc, col("path").asc)
      .limit(n)
      .select(col("path"), col("n_points"),
        col("var_key"),
        round(col("var_key").cast("double") /
          (col("n_points") * col("n_points")).cast("double") / lit(1.0e6), 6)
          .as("variance"))
  }

  /**
   * graphite `offsetToZero(series)`: subtract each series' minimum
   * from every point, re-basing the series at zero (the "show me the
   * shape, not the level" transform). A single IEEE subtraction of
   * two exact inputs — bit-deterministic with no quantization.
   *
   * Scale: one window shuffle on `path` with an unbounded min frame —
   * Spark computes it as a running aggregate after the partition
   * sort, no second pass.
   */
  def offsetToZero(points: DataFrame): DataFrame = {
    val whole = Window.partitionBy("path")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    points.select(col("path"), col("time"), col("version"),
      (col("value") - min("value").over(whole)).as("value"))
  }

  /**
   * graphite `changed(series)`: 1 where the value differs from the
   * previous point of the same series, else 0 (the first point is 0,
   * matching graphite). Doubles compare for EQUALITY only — both
   * engines read the same parquet bits, so `x <> lag(x)` cannot
   * disagree.
   *
   * Scale: one window shuffle on `path`, one lag.
   */
  def changed(points: DataFrame): DataFrame =
    points.select(col("path"), col("time"), col("version"),
      when(col("value") =!= lag("value", 1).over(seriesWindow), 1L)
        .otherwise(0L).as("changed"))

  /**
   * graphite `divideSeries(dividend, divisor)`: the ratio of two
   * sibling leaves of the same path prefix, aligned on tumbling
   * `stepSec` buckets (raw points rarely share exact timestamps
   * across series; graphite gets alignment for free from fixed-step
   * storage, a raw stream has to bucket). Per (prefix, bucket): each
   * leaf reduces to an integer-quantized bucket MEAN (exact LONG sum
   * ÷ count), then one IEEE division — deterministic end to end. A
   * zero divisor emits null (graphite draws a gap).
   *
   * Scale: leaf split is a filter of one `(prefix, leaf, bucket)`
   * aggregate — dividend and divisor co-partition by construction,
   * so the final join is a same-key zip, never a broadcast of points.
   */
  def divideSeries(points: DataFrame, dividendLeaf: String, divisorLeaf: String,
                   stepSec: Long): DataFrame = {
    require(stepSec >= 1, s"divideSeries needs stepSec >= 1, got $stepSec")
    val buckets = points
      .withColumn("leaf", element_at(split(col("path"), "\\."), -1))
      .filter(col("leaf").isin(dividendLeaf, divisorLeaf))
      .withColumn("prefix", regexp_replace(col("path"), "\\.[^.]*$", ""))
      .withColumn("bucket", col("time") - col("time") % stepSec)
      .groupBy("prefix", "leaf", "bucket")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * lit(1.0e6) + lit(0.5)).cast("long")).as("sq"))
    val num = buckets.filter(col("leaf") === dividendLeaf)
      .select(col("prefix"), col("bucket"), col("n").as("n_num"), col("sq").as("sq_num"))
    val den = buckets.filter(col("leaf") === divisorLeaf)
      .select(col("prefix"), col("bucket"), col("n").as("n_den"), col("sq").as("sq_den"))
    num.join(den, Seq("prefix", "bucket"))
      .select(col("prefix"), col("bucket"), col("n_num"), col("n_den"),
        round(when(col("sq_den") =!= 0L,
          (col("sq_num").cast("double") / col("n_num").cast("double")) /
            (col("sq_den").cast("double") / col("n_den").cast("double"))), 6)
          .as("ratio"))
  }
}

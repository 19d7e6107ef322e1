package graft.operators

import org.apache.spark.sql.DataFrame
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
}

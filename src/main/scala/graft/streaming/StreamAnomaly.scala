package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Online per-series z-score anomaly detection as a
 * `flatMapGroupsWithState` operator — the streaming sibling of
 * [[graft.operators.SeriesOps.outliers]]. The batch form scores every
 * point against the series' WHOLE-history moments; the streaming form
 * scores each point against the moments of everything BEFORE it (a
 * point cannot vouch for itself), then folds it in — the shape a live
 * alerting pipeline needs, with state that is three LONGs per series
 * forever.
 *
 * Moments use the repo-wide quantization policy (values at 1e-6 for
 * the sum, 1e-3 squares for the sum of squares), so the fold is pure
 * integer arithmetic and the state is bit-identical on any
 * partitioning; the only doubles are the final mean/variance/z chain,
 * computed exactly like the batch operator. Within each (series,
 * micro-batch) points fold in ascending (time, version) order — the
 * explicit-fold-order contract StreamTopK pins — so replays and
 * repartitionings emit the same anomalies.
 *
 * State-growth envelope (the price of exact integer moments on an
 * unbounded stream): `s2` accumulates round(|x|·1e3)² per point, so it
 * stays inside a signed 64-bit long for n ≤ 2^63 / (max|x|·1e3)² points
 * per series — ~9.2e6 points at |x| ≤ 1000, ~9.2e12 points at |x| ≤ 1.
 * Series that outlive the envelope need a windowed or decayed variant
 * (the cusum/linearTrend operators document the same bound); overflow
 * past it wraps silently, which is why the bound is stated here rather
 * than checked per point in the hot fold.
 *
 * `minPoints` gates scoring until the baseline has substance
 * (graphite's confidence-band warm-up); variance <= 0 (constant
 * series) emits nothing. Works unchanged on a batch frame (one
 * invocation per group, empty initial state) — the spec asserts the
 * streaming run over split batches equals the batch run only for
 * points whose PREFIX, not whole series, crosses the bar, which is
 * the semantic difference between the two operators, not a bug.
 */
object StreamAnomaly {

  // public, not private: janino refuses accessor calls on private
  // state case classes at codegen time (the StreamTopK lesson)
  case class MomentState(n: Long, s1: Long, s2: Long)

  case class AnomalyRow(path: String, time: Long, version: Long,
                        value: Double, zscore: Double)

  def zscoreAnomalies(points: DataFrame, z: Double,
                      minPoints: Int): Dataset[AnomalyRow] = {
    require(minPoints >= 2, s"minPoints >= 2, got $minPoints")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("path").cast("string").as("p"),
        col("time").cast("long").as("t"),
        col("version").cast("long").as("v"),
        col("value").cast("double").as("x"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MomentState, AnomalyRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (path: String, rows: Iterator[(String, Long, Long, Double)],
         state: GroupState[MomentState]) =>
          var st = if (state.exists) state.get else MomentState(0L, 0L, 0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyRow]
          rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, t, v, x) =>
            if (st.n >= minPoints) {
              val mean = st.s1.toDouble / 1.0e6 / st.n.toDouble
              val variance = st.s2.toDouble / 1.0e6 / st.n.toDouble - mean * mean
              if (variance > 0) {
                val zs = (x - mean) / math.sqrt(variance)
                // HALF_UP via BigDecimal — exactly Spark's round(zs, 4),
                // so a value at the 1e-4 midpoint rounds the same here
                // and in the batch sibling SeriesOps.outliers (rint's
                // half-even would differ there)
                if (math.abs(zs) > z)
                  out += AnomalyRow(path, t, v, x,
                    BigDecimal(zs).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
              }
            }
            val q6 = math.floor(x * 1.0e6 + 0.5).toLong
            val q3 = math.floor(x * 1.0e3 + 0.5).toLong
            st = MomentState(st.n + 1, st.s1 + q6, st.s2 + q3 * q3)
          }
          state.update(st)
          out.iterator
      }
  }
}

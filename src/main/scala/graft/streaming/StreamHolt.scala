package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Online Holt forecast-residual anomaly detection as a
 * `flatMapGroupsWithState` operator — the streaming sibling of
 * [[graft.operators.SeriesOps.holtForecast]] and the TREND-AWARE
 * complement of [[StreamAnomaly]]: a steadily climbing series never
 * z-flags (its mean climbs with it) but breaks the Holt forecast the
 * moment the climb bends, and a level shift flags exactly once before
 * the trend re-learns it. Each point is scored against the one-step
 * forecast `l + b` of everything strictly BEFORE it (the
 * a-point-never-vouches-for-itself contract), then folded into the
 * level/trend recurrence:
 *
 *   l' = (α·q + (1000−α)·(l + b)) div 1000
 *   b' = (β·(l' − l) + (1000−β)·b) div 1000
 *
 * — the identical milli-gain LONG arithmetic as the batch operator,
 * so the state is bit-identical on any partitioning and any
 * micro-batch split, and after the same points the streaming state
 * EQUALS the batch fold (spec-pinned against holtForecast's
 * level/trend columns). State is three LONGs per series forever.
 *
 * Warm-up: the first point seeds the level, the second initializes
 * the trend (the batch init l = q₀, b = q₁ − q₀, under which folding
 * q₁ is an exact no-op); scoring starts at the third point. A point
 * flags when |q − (l + b)| > `threshMilli` — an absolute residual
 * band in milli value units (the deterministic alternative to
 * residual z-scoring, which would need a second moment estimate;
 * callers wanting adaptive bands feed the emitted residuals to
 * [[StreamAnomaly]]). Within each (series, micro-batch) points fold
 * in ascending (time, version) order — the explicit-fold-order
 * contract StreamTopK pins.
 */
object StreamHolt {

  // public, not private: janino refuses accessor calls on private
  // state case classes at codegen time (the StreamTopK lesson)
  case class HoltState(n: Long, l: Long, b: Long)

  case class ResidualRow(path: String, time: Long, version: Long,
                         value: Double, forecast_milli: Long, err_milli: Long)

  def forecastResiduals(points: DataFrame, alphaMilli: Long, betaMilli: Long,
                        threshMilli: Long): Dataset[ResidualRow] = {
    require(alphaMilli >= 0 && alphaMilli <= 1000, s"alphaMilli in [0,1000]: $alphaMilli")
    require(betaMilli >= 0 && betaMilli <= 1000, s"betaMilli in [0,1000]: $betaMilli")
    require(threshMilli >= 0, s"threshMilli >= 0: $threshMilli")
    val spark = points.sparkSession
    import spark.implicits._
    val a = alphaMilli; val na = 1000L - alphaMilli
    val bb = betaMilli; val nb = 1000L - betaMilli
    points
      .select(col("path").cast("string").as("p"),
        col("time").cast("long").as("t"),
        col("version").cast("long").as("v"),
        col("value").cast("double").as("x"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HoltState, ResidualRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (path: String, rows: Iterator[(String, Long, Long, Double)],
         state: GroupState[HoltState]) =>
          var st = if (state.exists) state.get else HoltState(0L, 0L, 0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[ResidualRow]
          rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, t, v, x) =>
            val q = math.floor(x * 1.0e3 + 0.5).toLong
            if (st.n == 0L) {
              // first point seeds the level (the batch init's q0)
              st = HoltState(1L, q, 0L)
            } else if (st.n == 1L) {
              // second point initializes the trend; folding it is the
              // batch init's exact no-op, so set the state directly
              st = HoltState(2L, q, q - st.l)
            } else {
              val f = st.l + st.b
              val err = q - f
              if (math.abs(err) > threshMilli)
                out += ResidualRow(path, t, v, x, f, err)
              val l2 = (a * q + na * (st.l + st.b)) / 1000L
              val b2 = (bb * (l2 - st.l) + nb * st.b) / 1000L
              st = HoltState(st.n + 1, l2, b2)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

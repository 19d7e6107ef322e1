package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming per-key quantiles with BOUNDED state: the fixed-grid
 * histogram sketch (`SketchOps.gridCells`'s cell = ⌊v/grid⌋ rule) as
 * a `flatMapGroupsWithState` operator. A naive per-key
 * `approx_percentile` over an unbounded stream grows state with the
 * observed value SET; the grid holds at most `2·maxAbsCell + 1`
 * LONG counters per key forever, clamping the tails into saturating
 * end cells (the standard histogram clip — values beyond
 * `±maxAbsCell·grid` land in the end cell, biasing only quantiles
 * that fall INSIDE the clipped tail, which the `clipped` counter
 * makes observable). Emission per micro-batch: the current n and the
 * p50/p90/p99 LOWER cell edges, integer-exact and engine-portable —
 * the same `cum ≥ ceil(p·n)` walk `SketchOps.quantilesFromCells`
 * runs in batch, so batch ≡ stream is a spec assertion, not a hope.
 *
 * Determinism: the fold is ORDER-FREE (histogram increments commute),
 * so unlike StreamTopK no per-batch seq sort is needed — any shuffle
 * order yields the identical state.
 *
 * Scale: state is O(cells) per key; each micro-batch shuffles only
 * its own rows hashed on the key. The sketch is mergeable (sum
 * counters per cell), so cross-shard rollups stay one aggregate.
 */
object StreamQuantile {

  case class QRow(group: String, n: Long, clipped: Long,
                  p50_cell: Long, p90_cell: Long, p99_cell: Long)

  // public for the same janino-codegen reason as StreamTopK.SSState
  case class GridState(cells: Map[Long, Long], clipped: Long)

  private def quantCell(cells: Map[Long, Long], p: Double): Long = {
    val n = cells.valuesIterator.sum
    val need = math.ceil(p * n.toDouble).toLong
    var cum = 0L
    for ((cell, cnt) <- cells.toSeq.sortBy(_._1)) {
      cum += cnt
      if (cum >= need) return cell
    }
    cells.keys.max
  }

  /**
   * `events` must carry `groupCol` (string) and `valueCol` (numeric).
   * Returns per-batch (group, n, clipped, p50_cell, p90_cell,
   * p99_cell) — cell indices at the given `grid` width; multiply by
   * `grid` for the value-domain lower edge.
   */
  def gridQuantiles(events: DataFrame, groupCol: String, valueCol: String,
                    grid: Double, maxAbsCell: Long = 4096L): Dataset[QRow] = {
    require(grid > 0 && maxAbsCell >= 1, s"grid=$grid maxAbsCell=$maxAbsCell")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(groupCol).cast("string").as("g"),
        floor(col(valueCol) / lit(grid)).cast("long").as("cell"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GridState, QRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, Long)],
         state: GroupState[GridState]) =>
          val prev = if (state.exists) state.get
                     else GridState(Map.empty, 0L)
          var cells = prev.cells
          var clipped = prev.clipped
          rows.foreach { case (_, raw) =>
            val clamped =
              if (raw > maxAbsCell) { clipped += 1; maxAbsCell }
              else if (raw < -maxAbsCell) { clipped += 1; -maxAbsCell }
              else raw
            cells = cells.updated(clamped, cells.getOrElse(clamped, 0L) + 1L)
          }
          state.update(GridState(cells, clipped))
          val n = cells.valuesIterator.sum
          Iterator.single(QRow(group, n, clipped,
            quantCell(cells, 0.50), quantCell(cells, 0.90), quantCell(cells, 0.99)))
      }
  }
}

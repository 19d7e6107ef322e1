package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream–stream join surface: windowed attribution of one event
 * stream to another (purchase → the clicks that preceded it within
 * an attribution window, per user). This is the Structured Streaming
 * capability the rest of the streaming layer doesn't exercise — two
 * UNBOUNDED sides joined with a time-range condition, where the
 * WATERMARKS are what bound the state: Spark keeps click state only
 * until `clickTs + windowSec + watermark` can no longer match any
 * future purchase, then drops it. Without the range condition (or
 * with no watermark) the state would grow forever; this declaration
 * is the documented-safe shape from the Spark streaming guide.
 *
 * Works identically on batch frames (the same declaration, no
 * watermark needed) — the spec pins streamed ≡ batch on a split
 * feed. Event-time columns are TIMESTAMP (Spark requires real
 * timestamps for watermarks, not epoch longs).
 */
object StreamJoin {

  /**
   * `clicks`: (user_id long, click_id long, click_time timestamp);
   * `purchases`: (user_id long, purchase_id long, purchase_time
   * timestamp). Returns every (purchase, click) pair of the same
   * user with `purchase_time − windowSec ≤ click_time ≤
   * purchase_time` — the raw attribution pairs (dedupe/last-touch
   * downstream as policy dictates). `watermarkSec` bounds how late
   * either stream may arrive; it only matters for streaming inputs.
   */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame,
                       windowSec: Long, watermarkSec: Long = 0L): DataFrame = {
    val c0 = clicks.select(col("user_id"), col("click_id"),
      col("click_time").cast("timestamp").as("click_time"))
    val p0 = purchases.select(col("user_id"), col("purchase_id"),
      col("purchase_time").cast("timestamp").as("purchase_time"))
    val (c, p) =
      if (clicks.isStreaming || purchases.isStreaming)
        (c0.withWatermark("click_time", s"$watermarkSec seconds"),
          p0.withWatermark("purchase_time", s"$watermarkSec seconds"))
      else (c0, p0)
    p.join(c, Seq("user_id")) // equi key first: state is hash-partitioned by user
      .filter(col("click_time") >= col("purchase_time") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("click_time") <= col("purchase_time"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_time"), col("click_time"))
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Ownership convention for eagerly-pinned executor state.
 *
 * Several operators `localCheckpoint()` small intermediate relations
 * (LSH candidate sets, k-means assignments, broadcast-side query
 * frames) so the optimizer sees real statistics and iterative lineage
 * stays truncated. Those checkpoints pin RDD blocks in the block
 * manager for the life of the session — harmless for a single query,
 * but in a long-lived driver serving many queries the pinned set only
 * grows (observed: up to 3x wall-time inflation for late queries in a
 * 167-query single-session run, from block-manager pressure alone).
 *
 * The convention, stated once here and relied on everywhere:
 *
 *   - OPERATORS may pin (localCheckpoint / persist) freely while
 *     building their result, but must never require a pin to outlive
 *     the full materialization of the frame they return. Results are
 *     plain lazy DataFrames over source tables and (already
 *     materialized) checkpoint blocks.
 *   - CALLERS own release. After fully consuming a result (action,
 *     write, or oracle dump), call [[releaseAll]] to drop every pinned
 *     block before the next query. `Bench` and `Verify` do this
 *     between queries; a long-lived service should do it per request.
 *   - Broadcast variables follow the same split: operators that build
 *     one internally destroy it after the consuming action
 *     (`DedupOps.incrementalDeduplicateBloom`), and the `…With`
 *     variants accept a caller-owned handle instead.
 *
 * Releasing after full materialization is safe: a localCheckpointed
 * RDD is only re-read, never recomputed, and nothing re-reads it once
 * the consuming action has finished. Re-running the same operator
 * builds fresh checkpoints.
 */
object Blocks {

  /** Number of RDDs currently pinned (persisted or localCheckpointed). */
  def pinnedCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size

  /**
   * Unpersist every pinned RDD. `blocking=true` so callers (and tests)
   * observe a deterministic empty block set on return.
   */
  def releaseAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
}

package org.apache.spark

import org.apache.spark.storage.{BlockId, BroadcastBlockId}

/** Test-only probe for broadcast block accounting. Lives in
  * `org.apache.spark` because the block-manager master is
  * `private[spark]` — the probe reads storage status, nothing more. */
object BroadcastProbe {

  /** (distinct broadcast blocks, total bytes) currently stored across
    * all block managers (one in local mode). */
  def broadcastBlocks(sc: SparkContext): (Int, Long) = {
    val byId = blockSizes(sc)
    (byId.size, byId.values.sum)
  }

  /** Distinct broadcast blocks of at least `minBytes` — isolates
    * model-sized broadcasts (Bloom filters, codebooks) from the
    * kilobyte task-binary noise Spark creates per job. */
  def largeBroadcastCount(sc: SparkContext, minBytes: Long): Int =
    blockSizes(sc).count(_._2 >= minBytes)

  private def blockSizes(sc: SparkContext): Map[BlockId, Long] =
    sc.env.blockManager.master.getStorageStatus
      .flatMap(s => s.blocks.collect {
        case (id: BroadcastBlockId, st) => (id: BlockId, st.memSize + st.diskSize)
      })
      .groupBy(_._1)
      .map { case (id, xs) => (id, xs.map(_._2).max) }
}

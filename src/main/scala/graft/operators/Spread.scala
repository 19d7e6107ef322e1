package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Undersubscription guard for CPU-heavy per-row kernels (minhash /
 * simhash / shingle signatures): scan parallelism follows parquet ROW
 * GROUPS, so a small corpus written as one file runs a whole
 * signature pass on ONE core while 31 idle (measured: the sf0.1
 * char-gram MinhashSig pass 4.7 s on the native single-partition scan
 * vs 1.1 s after a repartition — including the shuffle it adds).
 *
 * `Spread(df)` repartitions up to the session's default parallelism
 * ONLY when the input has less than half that many partitions — at
 * real corpus scale (thousands of row groups) it is a no-op, so the
 * text-shuffle cost exists exactly where it buys wall-clock and never
 * where the scan is already parallel. Streaming frames pass through
 * untouched (`.rdd` is illegal on them; micro-batch inputs get their
 * parallelism from the source).
 *
 * CONSTRAINT — the partition probe plans the frame twice: `df.rdd`
 * below triggers a full physical planning of the upstream frame (the
 * RDD is materialized lazily, but the PLAN is built eagerly), and the
 * caller's later action plans it again. That is acceptable here
 * because every call site hands Spread a RAW SCAN (planning cost ~ms,
 * no shuffle re-derivation); do NOT call it on a frame downstream of
 * joins/aggregates — probe `df.inputFiles.length` there instead, or
 * pre-spread the scan before composing.
 */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}

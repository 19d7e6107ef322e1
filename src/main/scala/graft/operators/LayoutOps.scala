package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Physical-layout keys. A 100 TB table is only as fast as what its
 * scans can SKIP: sorting by one column clusters one predicate;
 * multi-dimensional predicates (user AND time, lat AND lon) need a
 * space-filling curve so that range blocks stay compact in every
 * dimension at once — the standard data-skipping layout trick
 * (Morton/Z-ordering, as used by Delta/Iceberg `OPTIMIZE ZORDER BY`).
 */
object LayoutOps {

  /**
   * Morton (Z-order) key over two non-negative integer columns,
   * interleaving the low `bits` bits of each (x in even positions,
   * y in odd). Pure integer projection — no shuffle; feed it to
   * `repartitionByRange(zkey)` + `sortWithinPartitions` to lay files
   * out so min/max stats prune BOTH dimensions. Values must fit in
   * `bits` bits (quantize/bucket first); bits ≤ 31 keeps the key in
   * a LONG with room for both.
   */
  def zorderKey2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftright(x.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }
}

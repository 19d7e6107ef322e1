package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/**
 * Integer division for the micro-unit ratio columns
 * (`floor(int·int / int)` patterns like `coef_micro`, `p_micro`,
 * curriculum buckets).
 *
 * Spark's `/` on LONG operands is DOUBLE division, so
 * `floor(a * 1000000 / b)` silently goes through a 53-bit mantissa:
 * once the numerator exceeds 2^53 (e.g. 2000000·T at hub-scale
 * triangle counts) the result can differ from the DuckDB oracle's
 * exact integer `//` by one unit. `a div b` (Catalyst IntegralDivide)
 * keeps the whole chain in LONG arithmetic — exact at any magnitude
 * and identical to `floor` for the non-negative operands these ratios
 * use.
 */
object IntDiv {
  /** `a div b` — LONG integral division, exact at any magnitude. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(new IntegralDivide(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

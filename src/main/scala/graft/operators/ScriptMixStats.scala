package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass script-mix kernel: all 7 [[TextOps.ScriptClasses]] counts
 * from a single UTF-8 decode walk. The regex formulation is
 * value-identical (equivalence spec in TrainingOpsSpec, scalacheck
 * property in KernelSpec) but pays one `regexp_replace` pass PER
 * CLASS — seven full scans, each allocating a stripped copy of the
 * text — where this kernel classifies each code point once with zero
 * per-row allocation beyond the 7-long result.
 *
 * Class semantics mirror the regex character classes EXACTLY
 * (BMP-only, mutually disjoint ranges): latin `A-Za-z` +
 * U+00C0–U+024F, cyrillic U+0400–U+04FF, greek U+0370–U+03FF, arabic
 * U+0600–U+06FF, hebrew U+0590–U+05FF, cjk U+4E00–U+9FFF +
 * U+3040–U+30FF + U+AC00–U+D7AF, digit `0-9`. Supplementary-plane
 * code points (4-byte UTF-8) match no class — exactly like the
 * BMP-only regexes, whose UTF-16 view sees them as surrogate pairs
 * outside every class.
 *
 * Output array<long>: [latin, cyrillic, greek, arabic, hebrew, cjk,
 * digit] — [[TextOps.ScriptClasses]] order.
 */
object ScriptMixStats {

  def counts(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Long](7)
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xff
      var cp = -1
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < n) {
        cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < n) {
        cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f); i += 3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < n) {
        i += 4 // supplementary plane: outside every BMP class
      } else i += 1 // malformed tail: skip a byte (valid input never hits this)
      if (cp >= 0) {
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xC0 && cp <= 0x24F)) out(0) += 1
        else if (cp >= 0x400 && cp <= 0x4FF) out(1) += 1
        else if (cp >= 0x370 && cp <= 0x3FF) out(2) += 1
        else if (cp >= 0x600 && cp <= 0x6FF) out(3) += 1
        else if (cp >= 0x590 && cp <= 0x5FF) out(4) += 1
        else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
          (cp >= 0xAC00 && cp <= 0xD7AF)) out(5) += 1
        else if (cp >= '0' && cp <= '9') out(6) += 1
      }
    }
    new GenericArrayData(out)
  }

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ScriptMixStatsExpr(GraftColumnBridge.expression(text)))
  }
}

/** See [[ScriptMixStats.counts]]. */
case class ScriptMixStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    ScriptMixStats.counts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.operators.ScriptMixStats.counts($c);")
  override protected def withNewChildInternal(c: Expression): ScriptMixStatsExpr = copy(child = c)
}

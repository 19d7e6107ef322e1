package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass repetition-statistics kernel: all six exact integers behind
 * the Gopher-family repetition fractions, from a single walk over the
 * text bytes. The higher-order-function formulation
 * (`TextOps.dupWordFrac` et al.) is value-identical (equivalence test
 * in TrainingOpsSpec) but runs interpreted — Spark's array HOFs are
 * CodegenFallback — and rebuilds the word array once per signal
 * column; this kernel is evaluated once per row (subexpression
 * elimination collapses the six field reads) and allocates only the
 * per-doc count maps. Measured 9.0 s -> sub-second on t_repetition at
 * sf0.1.
 *
 * Output array<long>:
 *   [0] n_words        — non-empty `\s+`-separated words of lower(text)
 *   [1] distinct_words
 *   [2] top_word       — the word mode's occurrence count
 *   [3] top_bigram     — the consecutive-word-pair mode's count
 *   [4] n_lines        — `\n` segments, trailing empties kept
 *   [5] distinct_lines — over RAW lines (not lowercased)
 */
object RepetitionStats {

  private val Space = UTF8String.fromString(" ")

  def stats(s: UTF8String): ArrayData = {
    // words + bigrams over the LOWERCASED text (matches words(lower(text)))
    val lowered = s.toLowerCase
    val lb = lowered.getBytes
    val ln = lb.length
    val wordCounts = new java.util.HashMap[UTF8String, Int]()
    val bigramCounts = new java.util.HashMap[UTF8String, Int]()
    var nWords = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < ln) {
      while (i < ln && isSpace(lb(i))) i += 1
      if (i < ln) {
        val start = i
        while (i < ln && !isSpace(lb(i))) i += 1
        val w = UTF8String.fromBytes(lb, start, i - start)
        nWords += 1
        wordCounts.merge(w, 1, (a, b) => a + b)
        if (prev != null)
          bigramCounts.merge(UTF8String.concat(prev, Space, w), 1, (a, b) => a + b)
        prev = w
      }
    }
    // lines over the RAW text: '\n' segments, trailing empties kept
    // (split(text, '\n') semantics — limit -1)
    val rb = s.getBytes
    val rn = rb.length
    val lines = new java.util.HashSet[UTF8String]()
    var nLines = 0L
    var segStart = 0
    var j = 0
    while (j <= rn) {
      if (j == rn || rb(j) == '\n') {
        lines.add(UTF8String.fromBytes(rb, segStart, j - segStart))
        nLines += 1
        segStart = j + 1
      }
      j += 1
    }
    var topWord = 0L
    val wit = wordCounts.values().iterator()
    while (wit.hasNext) { val c = wit.next(); if (c > topWord) topWord = c }
    var topBigram = 0L
    val bit = bigramCounts.values().iterator()
    while (bit.hasNext) { val c = bit.next(); if (c > topBigram) topBigram = c }
    new GenericArrayData(Array[Long](nWords, wordCounts.size().toLong, topWord,
      topBigram, nLines, lines.size().toLong))
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(RepetitionStatsExpr(GraftColumnBridge.expression(text)))
  }
}

/** See [[RepetitionStats.stats]]. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.operators.RepetitionStats.stats($c);")
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr = copy(child = c)
}

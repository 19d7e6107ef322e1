package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass text-statistics kernel: every exact integer behind
 * [[TextOps.qualityScore]] and [[TextOps.langGuess]] from a single walk
 * over the text bytes. The built-in-expression formulation is
 * value-identical (equivalence test in TrainingOpsSpec) but re-splits
 * the text per signal through interpreted array HOFs (CodegenFallback);
 * this kernel is evaluated once per row — subexpression elimination
 * collapses the field reads across qualityScore + langGuess in the
 * same projection — and measured 4.7 s -> ~1 s on t_quality at the
 * derived sf1 (EVIDENCE.md).
 *
 * Field semantics mirror the expression forms BYTE-EXACTLY:
 *  - words are the non-empty Java-`\s+`-separated segments of
 *    lower(text) (UTF8String.toLowerCase — the same lowering `lower()`
 *    applies; ASCII whitespace bytes never occur inside UTF-8
 *    multibyte sequences, so byte-level splitting is exact);
 *  - punct counts code points of the RAW text matching
 *    `[^A-Za-z0-9\s]` — every non-ASCII code point is in that class,
 *    so multibyte lead bytes count directly;
 *  - stopword / language-marker hits count word OCCURRENCES (like
 *    `size(filter(words, isin(...)))`), not distinct words.
 *
 * Output array<long>:
 *   [0] len      — length(text) (code points)
 *   [1] n_words
 *   [2] n_stops  — TextOps.Stopwords occurrences
 *   [3] n_punct
 *   [4] en_hits  — the/and/of/to/is
 *   [5] de_hits  — der/die/das/und/ist
 *   [6] es_hits  — el/la/los/de/es
 *   [7] n_subwords — the BPE-ish estimate: letter runs, digit runs,
 *       and every other code point one token each (the regex
 *       `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` counted by the same state
 *       walk: a non-ASCII code point both counts and breaks a run,
 *       exactly like the regex's third alternative)
 */
object TextStats {

  private def set(ws: String*): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    ws.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // TextOps.Stopwords, and the langGuess marker sets, frozen here; the
  // equivalence test fails if the two drift apart
  private val Stops = set("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")
  private val En = set("the", "and", "of", "to", "is")
  private val De = set("der", "die", "das", "und", "ist")
  private val Es = set("el", "la", "los", "de", "es")

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def stats(s: UTF8String): ArrayData = {
    // len + punct over the RAW text, per code point
    val rb = s.getBytes
    var len = 0L
    var nPunct = 0L
    var nSub = 0L
    var run = 0 // 0 none, 1 letter run, 2 digit run
    var j = 0
    while (j < rb.length) {
      val b = rb(j)
      if ((b & 0xc0) != 0x80) { // count lead bytes = code points
        len += 1
        if (b >= 0) { // ASCII
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
            if (run != 1) { nSub += 1; run = 1 }
          } else if (b >= '0' && b <= '9') {
            if (run != 2) { nSub += 1; run = 2 }
          } else if (isSpace(b)) run = 0
          else { nPunct += 1; nSub += 1; run = 0 }
        } else { // every non-ASCII code point matches [^A-Za-z0-9\s]
          nPunct += 1; nSub += 1; run = 0
        }
      }
      j += 1
    }
    // words over the LOWERCASED text (matches words(lower(text)))
    val lb = s.toLowerCase.getBytes
    val ln = lb.length
    var nWords = 0L
    var nStops = 0L
    var en = 0L
    var de = 0L
    var es = 0L
    var i = 0
    while (i < ln) {
      while (i < ln && isSpace(lb(i))) i += 1
      if (i < ln) {
        val start = i
        while (i < ln && !isSpace(lb(i))) i += 1
        nWords += 1
        // only short ASCII words can be stopwords/markers — skip the
        // UTF8String wrap for anything longer than the longest marker
        if (i - start <= 3) {
          val w = UTF8String.fromBytes(lb, start, i - start)
          if (Stops.contains(w)) nStops += 1
          if (En.contains(w)) en += 1
          if (De.contains(w)) de += 1
          if (Es.contains(w)) es += 1
        }
      }
    }
    new GenericArrayData(Array[Long](len, nWords, nStops, nPunct, en, de, es, nSub))
  }

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TextStatsExpr(GraftColumnBridge.expression(text)))
  }
}

/** See [[TextStats.stats]]. */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    TextStats.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.operators.TextStats.stats($c);")
  override protected def withNewChildInternal(c: Expression): TextStatsExpr = copy(child = c)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass Gopher-rule statistics kernel: every integer behind
 * [[TextOps.gopherRules]] from a single walk over the raw text bytes
 * (plus one lowered walk for the stop-word flags — the [[TextStats]]
 * structure). The regex formulation pays ~8 full regex scans per
 * document (`\S+` count, alpha-word count, `\s` strip, two multiline
 * line scans, two literal strips); it survives as
 * `TextOps.gopherFlagsReference` and equivalence is spec-pinned
 * row-for-row plus a scalacheck property.
 *
 * Field semantics mirror the documented operator contract ("lines as
 * \n-splits") and the regex forms:
 *  - words are maximal runs of non-`\s` bytes (the Java `\s` set —
 *    those ASCII bytes never occur inside UTF-8 multibyte sequences,
 *    so byte runs equal codepoint runs); alpha words are runs
 *    containing an ASCII letter (`\S*[A-Za-z]\S*` matches once per
 *    such run);
 *  - n_chars counts code points outside the `\s` set (the
 *    `regexp_replace(t, "\s", "")` length);
 *  - lines are `\n`-separated with the trailing empty kept
 *    (`split(t, "\n")` semantics: n_newlines + 1);
 *  - bullets counts lines whose first non-`[ \t]` character is `-`,
 *    `*`, or U+2022; ell_lines counts lines whose content ends in
 *    `...` or U+2026 (`\r` is line content, so a `...\r` line does
 *    NOT count). DELIBERATE divergence from the retired `(?m)` regex
 *    pair on exotic line terminators: Java MULTILINE also anchors at
 *    `\r`/U+0085/U+2028/U+2029, which contradicted the operator's own
 *    `split(t, "\n")` n_lines and the DuckDB oracle's
 *    `string_split(chr(10))` replay — the kernel makes all line
 *    counts agree on the documented \n-split semantics (pinned by a
 *    crafted `\r` spec case);
 *  - ells = non-overlapping left-to-right `...` occurrences (the
 *    `replace(t, "...", "")` length-diff over 3) plus U+2026 count;
 *  - stop_cnt counts DISTINCT presence of the 8 Gopher stop words
 *    over lowered words (`array_contains` sums, not occurrences).
 *
 * Output array<long>:
 *   [0] n_words  [1] n_chars  [2] alpha_words  [3] n_lines
 *   [4] bullets  [5] ell_lines  [6] hashes  [7] ells  [8] stop_cnt
 */
object GopherStats {

  // TextOps.gopherFlags' stop list, frozen here; the equivalence spec
  // fails if the two drift apart
  private val StopIndex: Array[UTF8String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(UTF8String.fromString)

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def stats(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var nWords = 0L
    var nChars = 0L
    var alphaWords = 0L
    var nLines = 1L
    var bullets = 0L
    var ellLines = 0L
    var hashes = 0L
    var triples = 0L
    var u2026 = 0L

    // one raw walk: words, chars, hashes, "..." (greedy non-overlap),
    // U+2026, line count
    var i = 0
    var inWord = false
    var wordHasAlpha = false
    while (i < n) {
      val c = b(i)
      if (isSpace(c)) {
        if (inWord) { nWords += 1; if (wordHasAlpha) alphaWords += 1 }
        inWord = false; wordHasAlpha = false
        if (c == '\n') nLines += 1
      } else {
        if ((c & 0xc0) != 0x80) nChars += 1 // lead byte = non-space code point
        inWord = true
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) wordHasAlpha = true
        if (c == '#') hashes += 1
        if (c == '.' && i + 2 < n && b(i + 1) == '.' && b(i + 2) == '.') {
          triples += 1
          nChars += 2 // the two skipped dots are non-space code points
          i += 2      // greedy non-overlap, left to right
        } else if ((c & 0xff) == 0xe2 && i + 2 < n &&
          (b(i + 1) & 0xff) == 0x80 && (b(i + 2) & 0xff) == 0xa6) {
          u2026 += 1
        }
      }
      i += 1
    }
    if (inWord) { nWords += 1; if (wordHasAlpha) alphaWords += 1 }

    // line-anchored scan: bullet starts + ellipsis ends per \n-line
    var lineStart = 0
    var done = false
    while (!done) {
      var lineEnd = lineStart
      while (lineEnd < n && b(lineEnd) != '\n') lineEnd += 1
      var p = lineStart
      while (p < lineEnd && (b(p) == ' ' || b(p) == '\t')) p += 1
      if (p < lineEnd) {
        val c = b(p)
        if (c == '-' || c == '*' ||
          ((c & 0xff) == 0xe2 && p + 2 < lineEnd &&
            (b(p + 1) & 0xff) == 0x80 && (b(p + 2) & 0xff) == 0xa2))
          bullets += 1
      }
      if (lineEnd - lineStart >= 3) {
        if (b(lineEnd - 1) == '.' && b(lineEnd - 2) == '.' && b(lineEnd - 3) == '.')
          ellLines += 1
        else if ((b(lineEnd - 3) & 0xff) == 0xe2 && (b(lineEnd - 2) & 0xff) == 0x80 &&
          (b(lineEnd - 1) & 0xff) == 0xa6)
          ellLines += 1
      }
      if (lineEnd >= n) done = true else lineStart = lineEnd + 1
    }

    // lowered walk: distinct stop-word presence (early exit at all 8)
    val lb = s.toLowerCase.getBytes
    val ln = lb.length
    var stopMask = 0
    var j = 0
    while (j < ln && stopMask != 0xff) {
      while (j < ln && isSpace(lb(j))) j += 1
      if (j < ln) {
        val start = j
        while (j < ln && !isSpace(lb(j))) j += 1
        if (j - start <= 4) {
          val w = UTF8String.fromBytes(lb, start, j - start)
          val ix = StopIndex.indexOf(w)
          if (ix >= 0) stopMask |= 1 << ix
        }
      }
    }

    new GenericArrayData(Array[Long](nWords, nChars, alphaWords, nLines,
      bullets, ellLines, hashes, triples + u2026,
      java.lang.Integer.bitCount(stopMask).toLong))
  }

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(GopherStatsExpr(GraftColumnBridge.expression(text)))
  }
}

/** See [[GopherStats.stats]]. */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    GopherStats.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.operators.GopherStats.stats($c);")
  override protected def withNewChildInternal(c: Expression): GopherStatsExpr = copy(child = c)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass 60-bit SimHash kernel: bit b of the hash is 1 iff the sum
 * over word OCCURRENCES of ±1 (by bit b of the word's top-60-bit md5,
 * [[FastMd5.md5Head60]]) is positive.
 *
 * Like [[MinhashSig]], a simhash is a pure per-document function: the
 * explode(words) + typed-Aggregator formulation shuffled one 60-long
 * buffer per (doc, partition) and required an integral id to group by;
 * this kernel walks the text bytes once per row — no shuffle, no word
 * strings, any id type. Word split is byte-level Java-regex-`\s`
 * (identical to `TextOps.words`); each word digests directly from its
 * span in the text bytes.
 */
object Simhash60 {

  private val tlMd = ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Sentinel for "no words" — the explode-based formulation emitted NO
    * signature row for a wordless doc, so the expression goes null
    * (real signatures are 60-bit non-negative, the sentinel is not). */
  val NoWords: Long = Long.MinValue

  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = tlMd.get()
    val counts = new Array[Int](60)
    var any = false
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        any = true
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // top 60 bits, exactly conv(substring(md5(w),1,15),16,10)
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        var b = 0
        while (b < 60) { counts(b) += (((h >>> b) & 1L).toInt * 2 - 1); b += 1 }
      }
    }
    if (!any) return NoWords
    var sig = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Simhash60Expr(GraftColumnBridge.expression(text)))
  }
}

/** See [[Simhash60.simhash]]. */
case class Simhash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val r = Simhash60.simhash(input.asInstanceOf[UTF8String])
    if (r == Simhash60.NoWords) null else java.lang.Long.valueOf(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.operators.Simhash60.simhash($c);
      if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): Simhash60Expr = copy(child = c)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * md5 with a THREAD-LOCAL MessageDigest. Spark's built-in `md5()`
 * routes through commons-codec `DigestUtils.md5Hex`, which calls
 * `MessageDigest.getInstance` on EVERY invocation — a provider lookup
 * plus allocation that costs as much as digesting the short inputs the
 * dedup operators feed it (a 3-word shingle is ~20 bytes, and minhash
 * digests each shingle 16 times). Output is bit-identical lowercase
 * hex, so the DuckDB oracles are unaffected.
 */
object FastMd5 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val hex = "0123456789abcdef".getBytes

  /** Lowercase-hex md5 of the UTF8 bytes, as UTF8String (codegen entry). */
  def md5HexUtf8(s: UTF8String): UTF8String = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hex((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** First 60 bits of the md5 digest as a non-negative long — exactly
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex chars = the top
    * 7.5 digest bytes (codegen entry for the simhash word hash). */
  def md5Head60(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** [[md5Head60]] over a byte range — the allocation-free entry the
    * fused gram kernels feed from their scratch buffers. */
  def md5Head60Bytes(b: Array[Byte], off: Int, len: Int): Long = {
    val md = tl.get()
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** `md5()` drop-in with the thread-local digest (see [[FastMd5]]). */
case class FastMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    FastMd5.md5HexUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.FastMd5.md5HexUtf8($c)")
  override protected def withNewChildInternal(c: Expression): FastMd5Expr = copy(c)
}

/** Fused `conv(substring(md5(s), 1, 15), 16, 10)::long` (see [[FastMd5]]). */
case class Md5Head60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(FastMd5.md5Head60(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.FastMd5.md5Head60($c)")
  override protected def withNewChildInternal(c: Expression): Md5Head60Expr = copy(c)
}

object FastHash {
  import org.apache.spark.sql.GraftColumnBridge
  def fastMd5(c: Column): Column =
    GraftColumnBridge.column(FastMd5Expr(GraftColumnBridge.expression(c)))
  def md5Head60(c: Column): Column =
    GraftColumnBridge.column(Md5Head60Expr(GraftColumnBridge.expression(c)))
}

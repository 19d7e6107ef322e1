package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused `xxhash64(explode(word-shingles(text)))` kernel.
 *
 * The column formulation (split regex -> filter -> transform/slice/
 * array_join -> array_distinct -> explode -> xxhash64) allocates a
 * string per shingle plus intermediate arrays per document — measured
 * 3.9 s of d_dedup_jaccard's 7 s at sf0.1 before any join starts. The
 * hashes only ever serve as EQUALITY keys (the DuckDB oracle groups by
 * the shingle strings themselves), so the whole chain fuses into one
 * pass over the text bytes with zero per-shingle allocations.
 *
 * Exact-equivalence contract with the column formulation, kept bit-for-
 * bit so an A/B of the two plans is value-identical:
 *  - words: maximal runs of non-whitespace bytes, where whitespace is
 *    Java regex `\s` = the six ASCII bytes [ \t\n\x0B\f\r] (multi-byte
 *    UTF-8 sequences never contain ASCII bytes, so byte-level splitting
 *    equals `split(text, "\\s+")` + drop-empty);
 *  - shingle = w consecutive words joined with a single 0x20, hashed
 *    with Spark's XXH64 seed 42 — the same function `xxhash64()` applies
 *    to the joined string;
 *  - fewer than w words -> ONE shingle of all words joined (empty text
 *    hashes the empty string), matching the `size(ws) < w` branch;
 *  - per-document distinct, like array_distinct before the explode.
 */
object Shingles {

  def shingleHashes(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    // word spans
    var nWords = 0
    var i = 0
    val n = bytes.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !isSpace(bytes(i))) i += 1
        ends.add(i)
        nWords += 1
      }
    }
    val nShingles = if (nWords < w) 1 else nWords - w + 1
    val width = if (nWords < w) math.max(nWords, 0) else w
    var scratch = new Array[Byte](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nShingles)
    var outLen = 0
    var p = 0
    while (p < nShingles) {
      // copy words p .. p+width-1 joined by ' ' into scratch
      var len = 0
      var k = 0
      while (k < width) {
        val ws = starts.get(p + k)
        val we = ends.get(p + k)
        val wl = we - ws
        val need = len + wl + 1
        if (need > scratch.length) {
          val bigger = new Array[Byte](math.max(scratch.length * 2, need))
          System.arraycopy(scratch, 0, bigger, 0, len)
          scratch = bigger
        }
        if (k > 0) { scratch(len) = ' '; len += 1 }
        System.arraycopy(bytes, ws, scratch, len, wl)
        len += wl
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      p += 1
    }
    new GenericArrayData(if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen))
  }

  /**
   * The ALL-OCCURRENCES n-gram sibling of [[shingleHashes]] for
   * counting kernels ([[TextOps.distinctNgrams]]): same word walk,
   * same space-joined gram bytes, same XXH64 seed 42 — but duplicates
   * are KEPT (totals need every occurrence) and a doc with fewer than
   * `n` words emits NO grams (a counting metric must not invent a
   * short-doc pseudo-gram the way the dedup blocking deliberately
   * does). Equivalence contract: value-identical to
   * `transform(sequence(1, size(ws)-n+1), i -> xxhash64(concat_ws(" ",
   * slice(ws, i, n))))` over the split word array (pinned in
   * KernelSpec).
   */
  def ngramHashes(s: UTF8String, w: Int): ArrayData =
    ngramWalk(s, w, md5 = false)

  /**
   * The md5Head60 sibling of [[ngramHashes]] for ORACLE-REPLAYABLE
   * sketch keys ([[TextOps.distinctNgramsSketch]]): same walk, same
   * space-joined gram bytes, but hashed with
   * [[FastMd5.md5Head60Bytes]] — bit-identical to
   * `conv(substring(md5(gram), 1, 15), 16, 10)` over the gram string,
   * which DuckDB replays (it has no xxhash64). Measured: replacing
   * the interpreted transform/slice/concat_ws gram builder with this
   * kernel took t_distinct_n_kmv 66.3 s → 2.2 s at sf1 (EVIDENCE.md).
   */
  def ngramMd5Heads(s: UTF8String, w: Int): ArrayData =
    ngramWalk(s, w, md5 = true)

  private def ngramWalk(s: UTF8String, w: Int, md5: Boolean): ArrayData = {
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !isSpace(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nWords = starts.size()
    if (nWords < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nWords - w + 1)
    var scratch = new Array[Byte](64)
    var p = 0
    while (p < out.length) {
      var len = 0
      var k = 0
      while (k < w) {
        val ws = starts.get(p + k)
        val we = ends.get(p + k)
        val wl = we - ws
        val need = len + wl + 1
        if (need > scratch.length) {
          val bigger = new Array[Byte](math.max(scratch.length * 2, need))
          System.arraycopy(scratch, 0, bigger, 0, len)
          scratch = bigger
        }
        if (k > 0) { scratch(len) = ' '; len += 1 }
        System.arraycopy(bytes, ws, scratch, len, wl)
        len += wl
        k += 1
      }
      out(p) =
        if (md5) FastMd5.md5Head60Bytes(scratch, 0, len)
        else XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      p += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Fused winnowing-fingerprint kernel for
   * [[TextOps.winnowFingerprints]]: char k-gram md5Head60s over the
   * (already whitespace-normalized) text, sliding `window` minima,
   * first-occurrence distinct — one pass over the UTF-8 bytes with
   * zero per-gram allocations. The column formulation (transform/
   * sequence/substring/md5/conv + slice/array_min + array_distinct)
   * allocates a char-substring STRING and a 32-hex STRING per text
   * position — measured 38.5 s of d_dedup_winnow at sf0.1 before any
   * shuffle starts.
   *
   * Exact-equivalence contract (pinned in OperatorSpec):
   *  - grams are CHARACTER substrings: UTF-8 char starts are walked
   *    explicitly, so a k-gram's digest covers the same bytes DuckDB's
   *    char-indexed `substr` feeds `md5`;
   *  - each gram hashes to `conv(substring(md5(g),1,15),16,10)` via
   *    [[FastMd5.md5Head60Bytes]] on the raw byte range;
   *  - fewer than k chars, or fewer than `window` grams → empty array
   *    (`explode` then drops the doc, like the callers' length guards);
   *  - window minima tie-resolve by VALUE (plain `min`, like
   *    `array_min`) and dedup preserves first occurrence, exactly
   *    `array_distinct`.
   */
  def winnowFps(s: UTF8String, k: Int, window: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // char start byte-offsets: UTF-8 continuation bytes are 10xxxxxx
    val charOff = new Array[Int](n + 1)
    var nChars = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { charOff(nChars) = i; nChars += 1 }
      i += 1
    }
    charOff(nChars) = n
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = nChars - k + 1
    if (nGrams < window) return new GenericArrayData(Array.emptyLongArray)
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = charOff(g)
      grams(g) = FastMd5.md5Head60Bytes(bytes, from, charOff(g + k) - from)
      g += 1
    }
    val nWin = nGrams - window + 1
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nWin)
    var outLen = 0
    var j = 0
    while (j < nWin) {
      var m = grams(j)
      var t = j + 1
      val end = j + window
      while (t < end) { if (grams(t) < m) m = grams(t); t += 1 }
      if (seen.add(m)) { out(outLen) = m; outLen += 1 }
      j += 1
    }
    new GenericArrayData(if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen))
  }

  /**
   * Fused content-defined-chunking kernel for
   * [[DedupOps.cdcChunkStats]]: one pass over the (already
   * whitespace-normalized) text emitting (chunk md5Head60, chunk
   * char length) structs. The column formulation (transform/filter
   * over positions with a per-element substr+md5) re-evaluated the
   * whole normalization subtree PER POSITION once CollapseProject
   * inlined it into the lambda — measured 582 s of d_dedup_cdc at
   * sf0.1 before this kernel (the winnowFps lesson, round 13's
   * instance of it).
   *
   * Exact-equivalence contract (pinned in OperatorSpec against
   * [[DedupOps.cdcChunksReference]]):
   *  - boundary AFTER char position p (1-based, p ≥ window) iff the
   *    trailing window-gram's md5Head60 ≡ 0 (mod maskMod) — grams are
   *    CHARACTER substrings via the UTF-8 char-offset walk, byte-
   *    identical to DuckDB's char-indexed substr feeding md5;
   *  - chunks are the spans between consecutive bounds (0 and len
   *    implicit); the empty final span (boundary AT len) drops;
   *  - fp = md5Head60 of the chunk's bytes, len = chunk CHAR count.
   */
  def cdcChunks(s: UTF8String, window: Int, maskMod: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val charOff = new Array[Int](n + 1)
    var nChars = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { charOff(nChars) = i; nChars += 1 }
      i += 1
    }
    charOff(nChars) = n
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any]()
    var start = 0
    var cpos = window
    while (cpos <= nChars) {
      val from = charOff(cpos - window)
      val h = FastMd5.md5Head60Bytes(bytes, from, charOff(cpos) - from)
      if (h % maskMod == 0) {
        val cf = charOff(start)
        out.add(org.apache.spark.sql.catalyst.InternalRow(
          FastMd5.md5Head60Bytes(bytes, cf, charOff(cpos) - cf),
          (cpos - start).toLong))
        start = cpos
      }
      cpos += 1
    }
    if (nChars > start) {
      val cf = charOff(start)
      out.add(org.apache.spark.sql.catalyst.InternalRow(
        FastMd5.md5Head60Bytes(bytes, cf, charOff(nChars) - cf),
        (nChars - start).toLong))
    }
    new GenericArrayData(out.toArray)
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
}

/** See [[Shingles.shingleHashes]]. */
case class ShingleHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Shingles.shingleHashes(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Shingles.shingleHashes($c, $w)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
}

object ShingleHashes {
  def apply(text: Column, w: Int = 3): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ShingleHashesExpr(GraftColumnBridge.expression(text), w))
  }
}

/** See [[Shingles.ngramHashes]]. */
case class NgramHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Shingles.ngramHashes(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Shingles.ngramHashes($c, $w)")
  override protected def withNewChildInternal(c: Expression): NgramHashesExpr = copy(child = c)
}

object NgramHashes {
  def apply(text: Column, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NgramHashesExpr(GraftColumnBridge.expression(text), w))
  }
}

/** See [[Shingles.ngramMd5Heads]]. */
case class NgramMd5HeadsExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Shingles.ngramMd5Heads(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Shingles.ngramMd5Heads($c, $w)")
  override protected def withNewChildInternal(c: Expression): NgramMd5HeadsExpr = copy(child = c)
}

object NgramMd5Heads {
  def apply(text: Column, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NgramMd5HeadsExpr(GraftColumnBridge.expression(text), w))
  }
}

/** See [[Shingles.cdcChunks]]. */
case class CdcChunksExpr(child: Expression, window: Int, maskMod: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("len", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Shingles.cdcChunks(input.asInstanceOf[UTF8String], window, maskMod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Shingles.cdcChunks($c, $window, $maskMod)")
  override protected def withNewChildInternal(c: Expression): CdcChunksExpr = copy(child = c)
}

object CdcChunks {
  def apply(text: Column, window: Int, maskMod: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CdcChunksExpr(GraftColumnBridge.expression(text), window, maskMod))
  }
}

/** See [[Shingles.winnowFps]]. */
case class WinnowFpsExpr(child: Expression, k: Int, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Shingles.winnowFps(input.asInstanceOf[UTF8String], k, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Shingles.winnowFps($c, $k, $window)")
  override protected def withNewChildInternal(c: Expression): WinnowFpsExpr = copy(child = c)
}

object WinnowFps {
  def apply(text: Column, k: Int, window: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WinnowFpsExpr(GraftColumnBridge.expression(text), k, window))
  }
}

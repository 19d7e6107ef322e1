package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distinct-count sketches for corpus-scale cardinality questions
 * ("how many distinct fingerprints / tokens / users per shard?") where
 * an exact `count(distinct)` would shuffle every distinct value.
 *
 * KMV (k-minimum-values): keep the k smallest distinct hash values of
 * a 60-bit uniform hash; if fewer than k were seen the count is exact,
 * otherwise estimate n ≈ (k-1) / (kth_min / 2^60) (Bar-Yossef et al.,
 * "Counting distinct elements in a data stream", RANDOM 2002). The
 * state is deterministic and ENGINE-PORTABLE — the DuckDB oracle
 * replays the identical min-set from the identical md5-derived hash
 * ([[FastHash.md5Head60]]) — and mergeable: the union of two min-sets
 * truncated to k is the min-set of the union.
 *
 * HLL ([[hllDistinct]]): the same determinism discipline applied to
 * HyperLogLog — registers derive from the md5 hash, so even this
 * "approximate" sketch replays bit-for-bit across engines. Library
 * HLLs (engine-native hash, float register math) never do; this one
 * is built for it.
 *
 * The aggregate is a [[TypedImperativeAggregate]]: per-group state is
 * a bounded k-entry tree (k·8 bytes), partial states combine map-side
 * and only k-sized buffers cross the shuffle — the same plan shape as
 * a built-in agg, with memory independent of group cardinality. That
 * is the 100 TB contract: a billion-distinct group costs the same
 * k·8 bytes as a hundred-distinct group.
 */
object SketchOps {

  import org.apache.spark.sql.GraftColumnBridge

  private val TwoPow60 = 1152921504606846976.0 // 2^60 as double

  /** KMV aggregate column over a LongType hash column: the sorted k
    * smallest distinct values, as array<long>. */
  def kmvSketch(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvSketchAgg(GraftColumnBridge.expression(hash), k).toAggregateExpression())

  /**
   * Per-group distinct estimate of `valueCol` via a k=`k` KMV sketch.
   * Output: group cols + `n_seen` (min(k, distinct)), `kth_hash`
   * (largest retained hash), `est_distinct` (exact when n_seen < k,
   * rounded 4). The oracle replays hash, min-set, and estimate.
   */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Int = 256): DataFrame = {
    val h = FastHash.md5Head60(col(valueCol).cast("string"))
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmvSketch(col("_h"), k).as("_mins"))
      .select(groupCols.map(col) ++ Seq(
        size(col("_mins")).cast("long").as("n_seen"),
        element_at(col("_mins"), -1).as("kth_hash"),
        round(
          when(size(col("_mins")) < k, size(col("_mins")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (element_at(col("_mins"), -1).cast("double") / lit(TwoPow60))),
          4).as("est_distinct")): _*)
  }

  /**
   * Per-group HyperLogLog distinct estimate (Flajolet et al., "HyperLogLog:
   * the analysis of a near-optimal cardinality estimation algorithm",
   * AofA 2007) with 2^p registers — THE cardinality sketch at corpus
   * scale: fixed 2^p bytes of state per group vs KMV's k·8, standard
   * error ≈ 1.04/√m (~6.5% at the default p=8; raise p for precision).
   *
   * Portability discipline: the hash is [[FastHash.md5Head60]] (60
   * uniform bits), register index = top p bits, rank = leading zeros
   * of the remaining B = 60−p bits + 1 computed via binary-string
   * length (`bin()` — identical on both engines, no float log2), so
   * the REGISTERS replay bit-for-bit in DuckDB. The estimate keeps the
   * harmonic sum exact too: Σ 2^(−r) is scaled to the integer
   * S = Σ 2^(Rmax−r_j) (Rmax = B+1; empty registers contribute
   * 2^Rmax), so the only floats are the final α·m²·2^Rmax·10³/S and
   * the small-range linear-counting branch m·ln(m/V) — both computed
   * from identical literals on both engines and floored to millis.
   *
   * Scale: one groupBy(group, idx) max-aggregate (map-side partial —
   * at most m register rows per group cross the shuffle), one
   * group-sized aggregate. Mergeable by construction (max per
   * register). Output: group cols + (m, v_empty, s_inv, est_milli).
   */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 8): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /**
   * The REGISTER stage of [[hllDistinct]] as a standalone single
   * aggregate — the streaming-safe half (max per (group, register) is
   * an ordinary streaming agg with at most m rows of state per group),
   * with [[hllFromRegisters]] as the batch finisher over the bounded
   * register table. Same split as [[gridCells]]/[[quantilesFromCells]].
   * Output: group cols + (_idx, _r).
   */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 16, s"hllDistinct p in [7,16], got $p") // single-alpha regime
    val b = 60 - p
    val rmax = b + 1
    val h = FastHash.md5Head60(col(valueCol).cast("string"))
    df.select(groupCols.map(col) ++ Seq(
        IntDiv(h, lit(1L << b)).cast("long").as("_idx"),
        (h % lit(1L << b)).as("_tail")): _*)
      .withColumn("_rank",
        when(col("_tail") === 0, lit(rmax.toLong))
          .otherwise(lit((b + 1).toLong) - length(bin(col("_tail")))))
      .groupBy((groupCols :+ "_idx").map(col): _*)
      .agg(max(col("_rank")).as("_r"))
  }

  /**
   * The small-range (linear-counting) estimate table: floor(m·10³·ln(m/v)
   * + 0.5) for v = 1..m, computed ONCE with `StrictMath.log` (fdlibm —
   * bit-identical on every JVM) and embedded as integer LITERALS in both
   * engines' plans. The branch used to evaluate `m·ln(m/v)` in floating
   * point on each engine independently; a last-ulp libm difference
   * (Spark's intrinsic `Math.log` vs DuckDB's libm `ln`) could flip the
   * `floor(x+0.5)` milli estimate at a half-integer boundary and break
   * the bit-for-bit replay the sketch promises. With the table, the only
   * `ln` ever taken lives here, and both engines compare integers.
   */
  private[graft] def linearCountMilli(p: Int): Array[Long] = {
    val m = 1 << p
    Array.tabulate(m)(i =>
      math.floor(m * 1000.0 * StrictMath.log(m.toDouble / (i + 1)) + 0.5).toLong)
  }

  /** Estimate finisher over a [[hllRegisters]] table (see
    * [[hllDistinct]] for the arithmetic contract). */
  def hllFromRegisters(regs: DataFrame, groupCols: Seq[String],
                       p: Int = 8): DataFrame = {
    require(p >= 7 && p <= 16, s"hllDistinct p in [7,16], got $p")
    val b = 60 - p
    val m = 1 << p
    val rmax = b + 1
    val alpha = 0.7213 / (1 + 1.079 / m)
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_present"),
        sum(expr(s"shiftleft(cast(1 as bigint), $rmax - _r)")).as("_sp"))
      .select(groupCols.map(col) ++ Seq(
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("_present")).as("v_empty"),
        (col("_sp") + (lit(m.toLong) - col("_present")) * lit(1L << rmax)).as("s_inv")): _*)
      .withColumn("_raw_milli",
        floor(lit(alpha * m * m) * lit(math.pow(2.0, rmax)) * lit(1000.0)
          / col("s_inv").cast("double") + lit(0.5)).cast("long"))
      .withColumn("est_milli",
        when(col("v_empty") > 0 && col("_raw_milli") <= lit(2500L * m),
          // small-range correction: linear counting over empty registers,
          // via the shared integer table (see linearCountMilli) — v_empty
          // is in [1, m] inside this branch, a valid 1-based index
          element_at(typedLit(linearCountMilli(p).toSeq),
            col("v_empty").cast("int")))
          .otherwise(col("_raw_milli")))
      .drop("_raw_milli")
  }

  /**
   * One-pass numeric profile: per listed column, row/null counts,
   * min/max, exact quantized mean (LONG micro sum / count), and the
   * KMV distinct estimate — the first query anyone runs against an
   * unfamiliar 100 TB table, shaped so it stays ONE scan: all
   * per-column aggregates evaluate in a single aggregate node, then
   * unpivot to (column, …) rows driver-side tooling can diff between
   * snapshots. Mean quantization at 1e-6 bounds |v|·rows < 2⁶³/10⁶
   * (per the repo-wide sum policy).
   */
  def numericProfile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"),
        sum(floor(col(c).cast("double") * lit(1.0e6) + lit(0.5)).cast("long")).as(s"${c}__sq"),
        kmvSketch(FastHash.md5Head60(col(c).cast("string")), k).as(s"${c}__mins"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val mins = col(s"${c}__mins")
      wide.select(
        lit(c).as("column"),
        col(s"${c}__nn").as("n_values"),
        col(s"${c}__nulls").as("n_nulls"),
        round(col(s"${c}__min"), 6).as("min_value"),
        round(col(s"${c}__max"), 6).as("max_value"),
        round(col(s"${c}__sq").cast("double") / lit(1.0e6) /
          col(s"${c}__nn").cast("double"), 6).as("mean_value"),
        round(
          when(size(mins) < k, size(mins).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (element_at(mins, -1).cast("double") / lit(TwoPow60))), 4)
          .as("est_distinct"))
    }
    rows.reduce(_.unionByName(_))
  }

  /**
   * Pre-join cardinality planning from two KMV sketches: distinct
   * estimates of both key sets, of their UNION (the merge of the two
   * min-sets truncated to k — the KMV mergeability property), and of
   * their INTERSECTION by inclusion–exclusion
   * (|A∩B| ≈ D(A) + D(B) − D(A∪B)). This answers "how big is this
   * join, and how selective is the key overlap?" from two k·8-byte
   * summaries, without running the join — the sketch-side tooling a
   * planner (or an engineer sizing a 100 TB join) reads first.
   * Estimates are exact whenever a set (or the union) has fewer than
   * k distinct keys. Output: one row
   * (est_a, est_b, est_union, est_intersect).
   *
   * Scale: each side is one map-side-combined aggregate to a single
   * k-entry array; the merge is array math on two rows.
   */
  def kmvOverlap(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                 k: Int = 256): DataFrame = {
    def sketch(df: DataFrame, c: String, name: String) =
      df.select(FastHash.md5Head60(col(c).cast("string")).as("_h"))
        .agg(kmvSketch(col("_h"), k).as(name))
    def est(mins: Column): Column =
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (element_at(mins, -1).cast("double") / lit(TwoPow60)))
    sketch(a, aCol, "ma").crossJoin(sketch(b, bCol, "mb"))
      .withColumn("mu", slice(array_sort(array_distinct(concat(col("ma"), col("mb")))), 1, k))
      .select(
        round(est(col("ma")), 4).as("est_a"),
        round(est(col("mb")), 4).as("est_b"),
        round(est(col("mu")), 4).as("est_union"),
        round(est(col("ma")) + est(col("mb")) - est(col("mu")), 4).as("est_intersect"))
  }

  /**
   * Count-min sketch point estimates (Cormode & Muthukrishnan, "An
   * improved data stream summary: the count-min sketch and its
   * applications", J. Algorithms 2005): `depth` hash rows ×
   * `width` buckets of occurrence counts; a key's estimate is the MIN
   * of its `depth` bucket counts — always ≥ the true count, within
   * εN with probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
   *
   * Like [[kmvSketch]], the hashes are md5-derived
   * ([[FastHash.md5Head60]] with a per-row salt), so the DuckDB
   * oracle replays the identical sketch — the determinism property no
   * library HLL/CMS offers. State is `depth × width` counters no
   * matter how many occurrences stream through: the fixed-memory
   * frequency table for corpora whose vocabulary would not fit.
   *
   * `items` is one row per occurrence; `probes` the candidate keys to
   * estimate (CMS answers point queries, not enumeration — pair with
   * [[graft.operators.TextOps.vocabulary]] when the keys are unknown).
   *
   * Scale: building the sketch is one map-side-combined aggregate
   * (`depth`·occurrences rows in, `depth`·`width` out); estimates
   * join probe buckets against those `depth`·`width` rows — AQE
   * broadcasts the sketch side. No occurrence-sized shuffle anywhere.
   */
  private def cmsBuckets(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { i =>
      pmod(FastHash.md5Head60(concat(lit(s"cms$i:"), key)), lit(width.toLong))
    }: _*)

  /** The COUNTER stage of [[cmsEstimates]] as a standalone aggregate —
    * the streaming-safe half (a count per (row, bucket) is an ordinary
    * streaming agg with at most depth×width rows of state EVER, and
    * cell tables merge by addition), with [[cmsFromCells]] as the
    * probe finisher. Same split as [[gridCells]]/[[quantilesFromCells]]
    * and [[hllRegisters]]/[[hllFromRegisters]]. */
  def cmsCells(items: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"cms depth=$depth width=$width")
    items
      .select(posexplode(cmsBuckets(col(keyCol).cast("string"), depth, width))
        .as(Seq("row_i", "bucket")))
      .groupBy("row_i", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate finisher over a [[cmsCells]] table: each probe key
    * reads its depth cells and takes the min (the CMS upper bound). */
  def cmsFromCells(cells: DataFrame, probes: DataFrame, keyCol: String,
                   depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"cms depth=$depth width=$width")
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(cmsBuckets(col(keyCol).cast("string"), depth, width))
        .as(Seq("row_i", "bucket")))
      .join(cells, Seq("row_i", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  def cmsEstimates(items: DataFrame, keyCol: String, probes: DataFrame,
                   depth: Int, width: Int): DataFrame =
    cmsFromCells(cmsCells(items, keyCol, depth, width), probes, keyCol, depth, width)

  /**
   * GLOBAL quantiles from a fixed-grid histogram — the 100 TB
   * percentile path [[graft.operators.EventOps.groupPercentiles]]'s
   * scaladoc points to. Exact interpolated percentiles sort a group in
   * one partition; a global sort of 100 TB is the plan that never
   * finishes. This instead bins every value to `floor(v / grid)`
   * (one map-side-combined aggregation, cell count bounded by
   * value-range/grid, NOT by corpus size), then walks the cumulative
   * histogram for each requested rank. The answer is exact to ±grid —
   * a DETERMINISTIC error bound, unlike sampling sketches
   * (t-digest/KLL), and the whole state is mergeable by cell-count
   * addition, so the DuckDB oracle replays it bit-for-bit (no
   * approximate sketch can offer that).
   *
   * Rank convention: quantile p is the value of the cell containing
   * the ceil(p·n)-th smallest point (lower cell edge reported) — the
   * inverted-CDF (type-1) definition, integer-exact on both engines.
   * The cumulative walk is a window over CELLS (range/grid rows, e.g.
   * 500k for a [0, 500) range at 1e-3), not over points.
   */
  def gridQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                    grid: Double): DataFrame =
    quantilesFromCells(gridCells(df, valueCol, grid), ps, grid)

  /**
   * The grid histogram alone: `(cell, cnt)` with cell = ⌊v/grid⌋.
   * This aggregate is STREAMING-SAFE (a plain groupBy count — run it
   * under complete/update mode with bounded state = value-range/grid
   * rows), and its output is mergeable across corpora by summing
   * counts per cell. [[quantilesFromCells]] is the batch finisher —
   * at stream read time, walk the tiny cells table, not the stream.
   */
  def gridCells(df: DataFrame, valueCol: String, grid: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / lit(grid)).cast("long").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Cumulative walk over a `(cell, cnt)` histogram: the quantile
    * read view. `n` derives from the cells themselves (Σcnt), so a
    * merged or streamed histogram needs no side channel. */
  def quantilesFromCells(cells: DataFrame, ps: Seq[Double],
                         grid: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum("cnt").over(w))
      .crossJoin(broadcast(cells.agg(sum(col("cnt")).as("n"))))
    ps.map { p =>
      cum.filter(col("cum") >= ceil(lit(p) * col("n").cast("double")).cast("long"))
        .orderBy("cell").limit(1)
        .select(lit(p).as("p"), col("cell"),
          round(col("cell").cast("double") * lit(grid), 6).as("value_lo"),
          col("cum"), col("n"))
    }.reduce(_.unionByName(_))
  }
}

/** Bounded KMV state: the k smallest distinct non-negative longs. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit =
    if (set.size < k) set.add(h)
    else if (h < set.last) { if (set.add(h)) set.pollLast() }
}

/**
 * The KMV k-minimum-values aggregate (see [[SketchOps]]). Input must
 * be LongType (hash upstream — keeps the hot update a primitive
 * compare); output is the ascending array of retained hashes, so the
 * estimate stays a plain column expression and the raw sketch remains
 * inspectable/mergeable downstream.
 */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    val it = o.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val out = new Array[Long](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuffer(k)
    var i = 0
    while (i < n) { b.set.add(bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Embedding covariance and PCA — the whitening / dimensionality
 * diagnostic stage of an embedding pipeline (and the preprocessing
 * some SemDeDup-style dedup variants run before clustering).
 *
 * Covariance is computed from EXACT integer sums so the DuckDB oracle
 * replays it bit-for-bit: per row, x_i quantizes to floor(x_i·1e7+0.5)
 * and each upper-triangle product to floor(x_i·x_j·1e9+0.5), both
 * summed as LONGS (partition- and engine-order independent); the final
 * cov_ij = E[xy] − E[x]E[y] is a fixed chain of double ops on those
 * exact longs, rounded to 8.
 *
 * Shape: one `mapPartitions` pass accumulates a dim·(dim+1)/2 LONG
 * triangle + a dim-vector per PARTITION (the one place imperative
 * per-partition logic beats any relational plan: the relational
 * formulation self-joins every row's components into n·dim²/2
 * intermediate rows, this emits dim²/2 rows per partition), then a
 * tiny groupBy(i,j) sums partials — output is model-sized, never
 * corpus-sized. The eigensolve runs driver-side on the dim×dim result
 * (cyclic Jacobi, fixed sweep order — deterministic), the same
 * "model rows only" budget as [[KMeansOps.train]].
 */
object PcaOps {

  private val Q1 = 1.0e7  // per-component quantizer
  private val Q2 = 1.0e9  // per-product quantizer

  /**
   * Exploded upper-triangle covariance: (i, j, n, cov) for i <= j,
   * 0-based component indices, cov rounded to 8.
   */
  def covariance(embeddings: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val partials = embeddings.select(col(vecCol)).rdd.mapPartitions { it =>
      val s1 = new Array[Long](dim)
      val s2 = new Array[Long](dim * (dim + 1) / 2)
      var n = 0L
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        n += 1
        var i = 0
        var t = 0
        while (i < dim) {
          val xi = v(i).toDouble
          s1(i) += math.floor(xi * Q1 + 0.5).toLong
          var j = i
          while (j < dim) {
            s2(t) += math.floor(xi * v(j).toDouble * Q2 + 0.5).toLong
            j += 1
            t += 1
          }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else {
        var t = -1
        Iterator.tabulate(dim * (dim + 1) / 2) { k =>
          t += 1
          // recover (i, j) from the packed triangle index
          var i = 0
          var base = 0
          while (base + (dim - i) <= t) { base += dim - i; i += 1 }
          Row(i, i + (t - base), n, s1(i), s1(i + (t - base)), s2(t))
        }
      }
    }
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("s1i", LongType, nullable = false),
      StructField("s1j", LongType, nullable = false),
      StructField("s2", LongType, nullable = false)))
    spark.createDataFrame(partials, schema)
      .groupBy("i", "j")
      .agg(sum("n").as("n"), sum("s1i").as("s1i"),
        sum("s1j").as("s1j"), sum("s2").as("s2"))
      .select(col("i"), col("j"), col("n"),
        round((col("s2").cast("double") / lit(Q2)) / col("n").cast("double")
          - (col("s1i").cast("double") / lit(Q1) / col("n").cast("double"))
          * (col("s1j").cast("double") / lit(Q1) / col("n").cast("double")),
          8).as("cov"))
  }

  /** Driver-side cyclic Jacobi eigensolver on a symmetric matrix —
    * fixed (p,q) sweep order, fixed sweep count: deterministic. Returns
    * (eigenvalues desc, row-major eigenvectors) with each vector's
    * first nonzero component made positive (sign canonicalization). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 24)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        // sign(0) must be +1 here: equal diagonal entries need the full
        // 45-degree rotation, not a no-op
        val sgn = if (theta >= 0.0) 1.0 else -1.0
        val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until n) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      val firstNz = col.indexWhere(x => math.abs(x) > 1e-12)
      if (firstNz >= 0 && col(firstNz) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /**
   * PCA projection onto the top `k` principal components. Trains on
   * [[covariance]] (collect is dim²/2 model rows), eigensolves
   * driver-side, then projects every row through a broadcast k×dim
   * matrix — a codegen'd per-row loop via one UDF over the vector (the
   * measured-win class: k·dim multiply-adds per row, no shuffle).
   * Output: (id, projection array<double> length k).
   */
  def project(embeddings: DataFrame, idCol: String, vecCol: String,
              dim: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= dim, s"k $k out of range 1..$dim")
    val covRows = covariance(embeddings, vecCol, dim).collect()
    val mat = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val c = r.getDouble(3)
      mat(i)(j) = c; mat(j)(i) = c
    }
    val (_, vecs) = jacobiEigen(mat)
    val top = vecs.take(k)
    val proj = udf { (v: Seq[Float]) =>
      Array.tabulate(k) { c =>
        var s = 0.0
        var d = 0
        while (d < dim) { s += top(c)(d) * v(d).toDouble; d += 1 }
        s
      }
    }
    embeddings.select(col(idCol), proj(col(vecCol)).as("projection"))
  }

  /** Explained-variance report of the top `k` components:
    * (component, eigenvalue, pct_of_total), driver-side from
    * [[covariance]]. */
  def explainedVariance(embeddings: DataFrame, vecCol: String,
                        dim: Int, k: Int): Seq[(Int, Double, Double)] = {
    val covRows = covariance(embeddings, vecCol, dim).collect()
    val mat = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val c = r.getDouble(3)
      mat(i)(j) = c; mat(j)(i) = c
    }
    val (vals, _) = jacobiEigen(mat)
    val total = vals.sum
    (0 until k).map(i => (i, vals(i), vals(i) / total))
  }
}

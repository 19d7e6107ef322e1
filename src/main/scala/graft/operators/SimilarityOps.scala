package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (array<float>).
 *
 * Brute-force cosine top-k is the exact baseline (broadcast the query
 * set, scan the corpus once — embarrassingly parallel, no shuffle until
 * the final per-query top-k). The LSH variant buckets by random
 * hyperplane signs so each query only scans its bucket — the 100 TB path
 * where a full scan per query set is no longer acceptable.
 */
object SimilarityOps {

  /** Elementwise dot product of two double arrays (codegen'd fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Cosine as a primitive-loop UDF, BIT-IDENTICAL to [[cosine]]: the
   * dot and both norms accumulate left-to-right exactly like the
   * `aggregate` folds, and the final expression is the same
   * dot/(sqrt*sqrt). For large candidate sets the higher-order array
   * expressions materialize a zipped array per pair; the loop doesn't
   * (measured ~2x on the 2M-pair near-dup verify at sf0.1).
   */
  private val cosineUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /**
   * [[cosineUdf]] over the RAW float arrays: `Array[Float]` parameters
   * deserialize via `ArrayData.toFloatArray` (a primitive copy — no
   * per-element boxing like `Seq[Double]`), and each element is cast to
   * double at use, which is bit-identical to transforming the array to
   * double first. Marked nondeterministic ON PURPOSE: it is pure, but
   * the marker stops Catalyst from (a) pushing the `sim >= min` filter
   * into the vector join condition and (b) collapsing projections —
   * both of which made the verify cosine evaluate TWICE per candidate
   * pair (measured 2x on the sf0.1 verify phase).
   */
  private val cosineFloatUdf = udf { (a: Array[Float], b: Array[Float]) =>
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }.asNondeterministic()

  /** [[cosineFloatUdf]] for sibling operators (KMeansOps's exact verify). */
  def cosineFloat(a: Column, b: Column): Column = cosineFloatUdf(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /**
   * Exact top-k cosine neighbors for each query vector.
   * queries/corpus: (id, embedding array<float/double>). The query side is
   * broadcast (small by construction); ranking uses a per-query window on
   * the rounded similarity with id tiebreak for full determinism.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val scored = broadcast(q).join(c,
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("sim"))
  }

  /**
   * Farthest-point sampling (Gonzalez's 2-approximate k-center greedy,
   * TCS 1985) — the DIVERSITY selector a training-data pipeline runs
   * where top-k similarity would pick near-duplicates: seed with the
   * smallest id, then `k−1` rounds of "take the point whose min
   * cosine-distance to everything chosen so far is LARGEST" (ties to
   * the smaller id). The classic coreset/dedup-complement primitive:
   * prompts for eval sets, centroids for curriculum buckets, probe
   * sets for embedding audits.
   *
   * Determinism: distances round to 6 dp at every step (the repo
   * cosine convention) BEFORE min/argmax, ties break on id, and the
   * chosen vectors enter the plan as literals — the DuckDB oracle
   * replays the full greedy unrolled.
   *
   * Scale shape: each round is ONE corpus scan (the running min-dist
   * column folds `least(dist, newDist)` against the latest centroid
   * only — no re-scan of earlier centroids), and only the k chosen
   * vectors ever reach the driver (model-sized, the codebook
   * convention). k scans of the corpus is the honest FPS cost; at
   * 100 TB run it over a pre-sampled pool (the standard two-stage
   * coreset recipe) — the operator itself stays scan-shaped either
   * way. `localCheckpoint` pins each round's dist frame (caller
   * releases via graft.core.Blocks).
   *
   * Output: (rank, vec_id, dist) — dist is the selection-time min
   * distance to the previously chosen set (0 for the seed).
   */
  def farthestPointSample(corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"farthestPointSample k=$k")
    val spark = corpus.sparkSession
    val c = corpus.select(col("id"), asDouble(col("embedding")).as("cv"))
      .localCheckpoint()
    val seed = c.orderBy(col("id").asc).limit(1).collect()
    require(seed.nonEmpty, "farthestPointSample: empty corpus")
    val seedId = seed(0).getLong(0)
    val seedVec = seed(0).getSeq[Double](1).toArray
    var chosen = Vector[(Long, Long, Double)]((1L, seedId, 0.0))
    var d = c.filter(col("id") =!= seedId)
      .withColumn("dist",
        round(lit(1.0) - cosine(col("cv"), typedLit(seedVec)), 6))
      .localCheckpoint()
    var r = 2
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = d.orderBy(col("dist").desc, col("id").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val tid = top(0).getLong(0)
        val tvec = top(0).getSeq[Double](1).toArray
        chosen :+= ((r.toLong, tid, top(0).getDouble(2)))
        d = d.filter(col("id") =!= tid)
          .withColumn("dist", least(col("dist"),
            round(lit(1.0) - cosine(col("cv"), typedLit(tvec)), 6)))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    chosen.toDF("rank", "vec_id", "dist")
  }

  /**
   * Two-stage CORESET farthest-point sampling — the documented 100 TB
   * path for [[farthestPointSample]] executed as a composed operator:
   * stage 1 takes a DETERMINISTIC pool of `poolSize` vectors (the
   * smallest (md5Head60(id), id) ranks — a seedless uniform sample
   * both engines derive from the ids alone, planned as a distributed
   * top-k, never a global sort); stage 2 runs the exact Gonzalez
   * greedy on the pool. The greedy's k corpus scans and k driver
   * round-trips now touch a pool-sized frame, so the driver
   * interaction is O(k·poolSize) REGARDLESS of corpus size — the only
   * corpus-scale work left is the one top-k pool selection.
   *
   * The standard coreset argument prices the trade: greedy on the
   * pool 2-approximates the k-center optimum OF THE POOL, and a
   * uniform pool's coverage radius adds the sampling slack — at
   * 100 TB you size poolSize (10⁴–10⁶) for the slack you can afford;
   * the operator's cost model is unchanged by the corpus behind it.
   * Output contract identical to [[farthestPointSample]]:
   * (rank, vec_id, dist), dist = selection-time min distance within
   * the pool.
   */
  def farthestPointSampleCoreset(corpus: DataFrame, k: Int,
                                 poolSize: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"farthestPointSampleCoreset k=$k")
    require(poolSize >= k && poolSize <= (1 << 20),
      s"farthestPointSampleCoreset poolSize=$poolSize")
    val pool = corpus.select(col("id"), col("embedding"))
      .orderBy(FastHash.md5Head60(col("id").cast("string")).asc, col("id").asc)
      .limit(poolSize)
    farthestPointSample(pool, k)
  }

  /**
   * Cosine RANGE search: every corpus neighbor whose similarity meets
   * the threshold, per query — the radius-retrieval mode next to
   * [[bruteForceTopK]]'s top-k (dedup and recall audits ask "everything
   * closer than θ", not "the k closest"). The threshold compares the
   * ROUNDED similarity (6 dp, same as every cosine emitter here) so
   * the boundary is cross-engine exact.
   *
   * Scale shape: NO window and no per-query sort — the predicate
   * filters at the broadcast probe, so the whole plan is one corpus
   * scan inside whole-stage codegen, and output is bounded by match
   * density instead of k·|queries|. For corpus-sized query sets route
   * through the LSH/IVF banding first (the [[knnClassify]] pattern)
   * and apply the same threshold at re-rank.
   */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, minSim: Double,
                  excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    broadcast(q).join(c,
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .filter(col("sim") >= minSim)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /**
   * ANN recall audit: per query, how much of the EXACT top-k an
   * approximate strategy recovered — the go/no-go evaluation every
   * ANN rollout runs before trusting banding parameters at scale
   * (sbt specs assert recall floors; this makes the same measurement
   * a first-class, oracle-checkable operator over any pair of this
   * library's ranked emitters). Inputs are two (query_id, …,
   * neighbor_id) result frames; output is (query_id, k_exact, hits,
   * recall_ppm) with integral-division ppm.
   *
   * Scale shape: one equi join on (query_id, neighbor_id) between two
   * k·|queries|-sized frames (result-sized, not corpus-sized — the
   * expensive part already happened producing them) + one
   * query-keyed fold. No corpus data enters.
   */
  def recallAudit(approx: DataFrame, exact: DataFrame): DataFrame = {
    // dedup both sides first: a repeated (query_id, neighbor_id) row in
    // either input would fan the left join out and double-count both
    // k_exact and hits. Both frames are result-sized, so this is cheap
    // insurance rather than a precondition the caller must remember.
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("hit", lit(1L))
    exact.select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("k_exact"), col("hits"),
        IntDiv(col("hits") * 1000000L, col("k_exact")).cast("long").as("recall_ppm"))
  }

  /**
   * Hard-negative mining for contrastive training: for each query
   * vector, the `k` corpus vectors MOST similar to it that carry a
   * DIFFERENT label — the near-misses a contrastive loss learns the
   * most from (an easy negative contributes ~zero gradient). Same
   * exact-cosine + windowed-rank shape as [[bruteForceTopK]] with the
   * label-inequality folded into the join condition, so mismatched
   * pairs are dropped at the broadcast probe, before any scoring.
   *
   * Scale: queries broadcast (a training batch, not the corpus); the
   * corpus side streams through one scan. For corpus-sized query sets,
   * route candidate generation through the ANN paths (lsh/ivf) first
   * and re-rank with the label filter — the knnClassify pattern.
   */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("label").as("query_label"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("label").as("neighbor_label"),
      asDouble(col("embedding")).as("cv"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    broadcast(q).join(c, col("query_label") =!= col("neighbor_label"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("neighbor_label").cast("long").as("neighbor_label"),
        col("sim"))
  }

  /**
   * Margin-based bitext/pair alignment (the ratio-margin criterion of
   * Artetxe & Schwenk, "Margin-based parallel corpus mining with
   * multilingual sentence embeddings", ACL 2019): for source set X and
   * target set Y, score every (x, y) with y among x's top-k cosine
   * neighbors by
   *   margin = cos(x, y) / mean(cos(x, NN_Y(x)) ∪ cos(y, NN_X(y)))
   * (the pooled mean over both directions' ACTUAL neighbor sets — each
   * has exactly k members on the exact path, possibly fewer on the ANN
   * paths when banding misses, so the denominator divides by the real
   * neighbor count, never a fixed 2k) and keep each x's argmax when it
   * clears `minMarginPpm`. The ratio
   * denominator is what makes this work where a raw cosine threshold
   * fails: hub vectors (high similarity to EVERYTHING) get a high
   * denominator and stop winning every pairing — the standard mining
   * step for parallel-corpus construction and cross-lingual dedup.
   *
   * Determinism: pair sims are the usual rounded-6dp doubles, then
   * EVERYTHING downstream is integer micro/ppm arithmetic (sums of
   * floor(sim·10⁶+0.5), integral division), so the oracle replays the
   * margins exactly. Pairs whose denominator is ≤ 0 (possible with
   * negative-similarity neighborhoods) are dropped — a margin against
   * an anti-correlated neighborhood is meaningless. Ties break to the
   * smaller target id.
   *
   * Scale: `strategy` routes both directions' neighbor search exactly
   * like [[knnClassify]] — "exact" ([[bruteForceTopK]], right when one
   * side is a mining batch) or the corpus-scale ANN paths "lsh" /
   * "ivf" / "ivf-trained" / "ivf-pq", where a full scan per probe is
   * no longer acceptable; the margin arithmetic downstream is
   * identical, only neighbor RECALL differs (pinned by the
   * approximate-vs-exact agreement spec). The ANN paths exclude
   * self-id matches — immaterial for the disjoint src/tgt sets mining
   * uses. Output: (src_id, tgt_id, sim, margin_ppm), one aligned row
   * per x that clears the margin.
   */
  def marginAlign(src: DataFrame, tgt: DataFrame, k: Int,
                  minMarginPpm: Long = 1000000L,
                  strategy: String = "exact"): DataFrame = {
    require(k >= 1, s"marginAlign k=$k")
    def topk(q: DataFrame, c: DataFrame): DataFrame = strategy match {
      case "exact"       => bruteForceTopK(q, c, k, excludeSelf = false)
      case "lsh"         => lshTopK(q, c, k)
      case "ivf"         => ivfTopK(q, c, k)
      case "ivf-trained" => KMeansOps.ivfTopKTrained(q, c, k)
      case "ivf-pq"      => PqOps.ivfPqTopK(q, c, k)
      case other => throw new IllegalArgumentException(
        s"marginAlign strategy must be exact|lsh|ivf|ivf-trained|ivf-pq, got: $other")
    }
    val micro = (c: Column) => floor(c * lit(1.0e6) + lit(0.5)).cast("long")
    val fwd = topk(src, tgt)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("sim"), micro(col("sim")).as("sim_micro"))
    val bwd = topk(tgt, src)
      .select(col("query_id").as("tgt_id"), micro(col("sim")).as("sim_micro"))
    val fwdMean = fwd.groupBy("src_id")
      .agg(sum(col("sim_micro")).as("fsum"), count(lit(1)).as("fcnt"))
    val bwdMean = bwd.groupBy("tgt_id")
      .agg(sum(col("sim_micro")).as("bsum"), count(lit(1)).as("bcnt"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_id"))
      .orderBy(col("margin_ppm").desc, col("tgt_id").asc)
    // NO broadcast hints here: fwdMean/bwdMean are PER-VECTOR aggregates
    // (one row per source / target id — corpus-sized, not model-sized), so
    // forcing a broadcast would ship the whole corpus's neighborhood means
    // to every executor and OOM at mining scale. The ids are already the
    // join keys; a shuffle join is the right plan, and Catalyst still
    // broadcasts on its own when stats prove a side is genuinely small.
    fwd
      .join(fwdMean, "src_id")
      .join(bwdMean, "tgt_id")
      // denom_micro = (Σfwd + Σbwd) / (|fwd| + |bwd|) — ACTUAL neighbor
      // counts, not fixed 2k: the ANN paths can return fewer than k
      // neighbors (banding misses), and dividing by 2k there would deflate
      // the denominator and silently inflate every margin
      .withColumn("denom",
        IntDiv(col("fsum") + col("bsum"), col("fcnt") + col("bcnt")).cast("long"))
      .filter(col("denom") > 0)
      .withColumn("margin_ppm",
        IntDiv(col("sim_micro") * 1000000L, col("denom")).cast("long"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") === 1 && col("margin_ppm") >= minMarginPpm)
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin_ppm"))
  }

  /**
   * k-NN label classification — the auto-labeling step of a training
   * pipeline: each query vector takes the majority label of its k
   * nearest corpus neighbors (exact cosine; ties break to the smaller
   * label, rank ties to the smaller neighbor id, so the result is
   * fully deterministic). `corpus` carries (id, embedding, label).
   * Output: (query_id, predicted_label, votes).
   *
   * `strategy` picks the neighbor search: "exact" ([[bruteForceTopK]],
   * the default — right for query-set-sized inputs), "lsh"
   * ([[lshTopK]]), "ivf" ([[ivfTopK]], fixed codebook) or
   * "ivf-trained" ([[KMeansOps.ivfTopKTrained]]) — the corpus-scale
   * paths, where a full scan per query is no longer acceptable. The
   * voting join+aggregate is identical for all four (labels join back
   * per 8-byte neighbor id); only neighbor RECALL differs, which is
   * what the approximate-vs-exact agreement tests pin.
   */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int,
                  strategy: String = "exact"): DataFrame = {
    val emb = corpus.select(col("id"), col("embedding"))
    val topk = strategy match {
      case "exact"       => bruteForceTopK(queries, emb, k)
      case "lsh"         => lshTopK(queries, emb, k)
      case "ivf"         => ivfTopK(queries, emb, k)
      case "ivf-trained" => KMeansOps.ivfTopKTrained(queries, emb, k)
      case "ivf-pq"      => PqOps.ivfPqTopK(queries, emb, k)
      case other => throw new IllegalArgumentException(
        s"knnClassify strategy must be exact|lsh|ivf|ivf-trained|ivf-pq, got: $other")
    }
    val labels = corpus.select(col("id").as("neighbor_id"), col("label"))
    val votes = topk.join(labels, "neighbor_id")
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("votes"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
  }

  /**
   * Embedding near-duplicate pairs: corpus vectors whose cosine
   * similarity meets `minCosine`, found via hyperplane LSH banding
   * (candidates = band collisions, exact cosine verifies) — the
   * embedding-space member of the dedup family. Output: (id_a < id_b,
   * sim), engine-portable like the rest (md5 planes).
   *
   * Banding is WIDER than [[lshTopK]]'s (6-bit bands, not 3): near-dup
   * targets high-similarity pairs, where wide bands keep recall (~0.87
   * at cos 0.9 with 4x6 bits) while admitting only ~6% of random pairs
   * as candidates — the knob that makes this all-pairs operator scale.
   */
  /**
   * The band width [[cosineNearDuplicatesAuto]] picks for a corpus of
   * `n` vectors: the smallest width whose expected bucket density
   * n / 2^bits stays <= `targetDensity` (floor 6 = the manual default,
   * cap 14 so 4 bands still fit one 64-bit signature). Same density
   * argument as [[graft.operators.DedupOps.simhashAutoSegments]]:
   * constant density holds candidate volume linear in corpus size
   * where fixed-width bands grow it quadratically (measured 21x per
   * 10x corpus step in EVIDENCE.md before this existed).
   *
   * The trade — unlike the simhash pigeonhole, which is EXACT for its
   * Hamming bound at any split — is probabilistic recall: a pair at
   * angle θ collides in one band with prob (1-θ/π)^bits, so wider
   * bands lower recall at the LOW end of similarity. Sized for the
   * near-duplicate regime: at cos 0.95 a 12-bit band still collides
   * ~73% of pairs across 4 bands (vs 94% at 6 bits); at cos 0.25 wide
   * bands see almost nothing, by design — that regime is a similarity
   * SEARCH, not dedup, and belongs to the top-k operators.
   */
  def autoBandBits(n: Long, targetDensity: Long = 128L): Int =
    (6 to 14).find(b => n <= targetDensity * (1L << b)).getOrElse(14)

  /**
   * [[cosineNearDuplicates]] with the band width priced from the
   * corpus count via [[autoBandBits]] (one count of the id column).
   * Deterministic in n — the DuckDB oracle replays the pick.
   */
  def cosineNearDuplicatesAuto(corpus: DataFrame, minCosine: Double,
                               targetDensity: Long = 128L, bands: Int = 4,
                               dim: Int = 64): DataFrame = {
    val bits = autoBandBits(corpus.count(), targetDensity)
    cosineNearDuplicates(corpus, minCosine, nbits = bands * bits, bands = bands, dim = dim)
  }

  /** Default (nbits not passed) routes through the corpus-priced band
    * width of [[autoBandBits]] — the scale-safe path is the one a
    * plain call reaches. Pass nbits explicitly (24 = the historical
    * fixed default) only when a fixed banding is contractual. */
  def cosineNearDuplicates(corpus: DataFrame, minCosine: Double,
                           nbits: Int = -1, bands: Int = 4, dim: Int = 64): DataFrame = {
    if (nbits < 0)
      return cosineNearDuplicatesAuto(corpus, minCosine, bands = bands, dim = dim)
    require(nbits % bands == 0)
    // planes captured by closure (nbits x dim doubles — kilobytes): the
    // task binary is torrent-broadcast and stage-scoped, so no Broadcast
    // handle leaks per call (KMeansOps.cellsUdf has the full rationale)
    val planes = lshPlanes(nbits, dim)
    val sigUdf = udf { (v: Seq[Float]) =>
      val p = planes
      var sig = 0L
      var b = 0
      while (b < p.length) {
        var s = 0.0
        var d = 0
        val pb = p(b)
        val n = math.min(pb.length, v.length)
        while (d < n) { s += pb(d) * v(d); d += 1 }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    val bandBits = nbits / bands
    val mask = (1L << bandBits) - 1
    // candidates carry ONLY the 8-byte id pair through the join+distinct;
    // vectors join back afterwards — dragging two 64-dim arrays through
    // the all-pairs shuffle was measured at 15x the cost at sf0.1
    // signatures materialized ONCE (16 bytes/vector): both self-join
    // sides would otherwise re-scan the corpus and re-run the plane UDF
    val sigs = corpus.select(col("id"), sigUdf(col("embedding")).as("sig"))
      .localCheckpoint()
    val banded = sigs
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .withColumn("bandval", expr(s"shiftright(sig, cast(band * $bandBits as int)) & $mask"))
      .drop("sig")
    // SELF-JOIN, deliberately not the minhash grouped-pairs plan: 6-bit
    // bands have only 64 bucket values, so buckets are dense and grouped
    // pairs would materialize bucket² arrays per group (the simhash
    // lesson, DedupOps.simhashPairs); the join streams the quadratic.
    val a = banded.select(col("band"), col("bandval"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bandval"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bandval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // raw float vectors join back (no asDouble transform — the float
    // UDF casts per element, bit-identically); nondeterministic UDF
    // keeps the verify cosine evaluated ONCE per pair (see its doc)
    val vecs = corpus.select(col("id"), col("embedding").as("v"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("sim", round(cosineFloatUdf(col("va"), col("vb")), 6))
      .filter(col("sim") >= minCosine)
      // no second rounding: round(round(x,6),4) lands on exact decimal
      // halves whose binary-double representation engines round apart
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /**
   * IVF-style ANN: corpus vectors are assigned to their nearest coarse
   * centroid (a FIXED, md5-derived codebook — no training pass, so any
   * engine reproduces the cells); each query probes its `nprobe`
   * nearest centroids and exact-cosine re-ranks only those cells. The
   * codebook-partitioned scan is the classic IVF scale shape: per-query
   * work is nprobe/ncells of the corpus.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              ncells: Int = 16, nprobe: Int = 6, dim: Int = 64): DataFrame = {
    // query side materialized once for real planner stats + branch
    // reuse — the lshTopK rationale, verbatim
    val q0 = queries.localCheckpoint()
    // centroids from the same deterministic generator as the planes;
    // closure-captured like KMeansOps.cellsUdf (no Broadcast leak)
    val centroids: Array[Array[Double]] = Array.tabulate(ncells, dim) { (c, d) =>
      md5Head32(s"centroid:$c:$d").toDouble / (1L << 31) - 1.0
    }
    def cellsUdf(n: Int) = udf { (v: Array[Float]) => nearestCells(centroids, v, n) }
    // candidates carry ONLY 8-byte ids through the cell join and the
    // distinct — same shape as cosineNearDuplicates (15x measured win):
    // vectors join back per-id AFTER dedup, so no array-typed shuffle
    // or distinct key exists anywhere in the plan
    val c = corpus.select(col("id").as("neighbor_id"),
      explode(cellsUdf(1)(col("embedding"))).as("cell"))
    val q = q0.select(col("id").as("query_id"),
      explode(cellsUdf(nprobe)(col("embedding"))).as("cell"))
    val cand = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = q0.select(col("id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val cv = corpus.select(col("id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    // no forced broadcast of qv: the planner/AQE picks broadcast when the
    // query set is actually small, and degrades to a shuffle join (instead
    // of a driver OOM) when a caller passes a large one
    cand
      .join(qv, "query_id")
      .join(cv, "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("sim"))
  }

  /**
   * The cell count [[ivfTopKAuto]] picks for a corpus of `n` vectors:
   * the smallest power-of-two ncells with n ≤ targetCell·ncells
   * (floor 16 = the manual default, cap 4096) — the IVF member of the
   * corpus-priced AUTO family. Fixed ncells = 16 grows per-cell
   * population — and therefore candidates PER QUERY
   * (nprobe·n/ncells) — linearly with the corpus; holding cell
   * density ≤ targetCell keeps the per-query scan constant, which is
   * the faiss √n-cells rule of thumb realized as an integer pick any
   * engine replays from the count alone. Centroids stay the
   * md5-derived codebook, so a wider pick changes NOTHING but the
   * generate range.
   */
  def autoCells(n: Long, targetCell: Long = 128L): Int =
    (4 to 12).map(e => 1 << e).find(c => n <= targetCell * c).getOrElse(1 << 12)

  /** [[ivfTopK]] with the cell count priced from the corpus count via
    * [[autoCells]] (one count of the id column) — deterministic in n,
    * oracle-replayable, identical to the fixed geometry while the
    * corpus fits 16 cells at the target density. */
  def ivfTopKAuto(queries: DataFrame, corpus: DataFrame, k: Int,
                  nprobe: Int = 6, dim: Int = 64,
                  targetCell: Long = 128L): DataFrame = {
    val ncells = autoCells(corpus.count(), targetCell)
    ivfTopK(queries, corpus, k, ncells = ncells, nprobe = nprobe, dim = dim)
  }

  /**
   * Top-`n` nearest centroid indices by (cosine DESC, index ASC) as a
   * primitive selection loop — value-identical to ranking every cell
   * with a tuple sort (same left-to-right accumulation, same zero-norm
   * guard, strict-> argmax keeps the earlier index on ties), but with
   * no per-cell tuple boxing and no full sort. The boxed form cost
   * ~2.4 s of the 20k-vector sf1 assignment once [[autoCells]] widened
   * the codebook to 256; this loop makes assignment cost m·d flops and
   * nothing else. The vector norm hoists out of the cell loop (same
   * accumulation order, same value).
   */
  private def nearestCells(cs: Array[Array[Double]], v: Array[Float], n: Int): Seq[Int] = {
    val m = cs.length
    var nv = 0.0
    var d0 = 0
    while (d0 < v.length) { nv += v(d0).toDouble * v(d0); d0 += 1 }
    val sims = new Array[Double](m)
    var ci = 0
    while (ci < m) {
      val c = cs(ci)
      var dot = 0.0; var nc = 0.0
      var d = 0
      val len = math.min(c.length, v.length)
      while (d < len) { dot += c(d) * v(d); nc += c(d) * c(d); d += 1 }
      // zero-norm guard — matches KMeansOps.cellsUdf (and the oracle's
      // NULL-last ordering) exactly
      val den = math.sqrt(nc) * math.sqrt(nv)
      sims(ci) = if (den == 0.0) -Double.MaxValue else dot / den
      ci += 1
    }
    val out = new Array[Int](math.min(n, m))
    val taken = new Array[Boolean](m)
    var k = 0
    while (k < out.length) {
      var best = -1
      var bs = 0.0
      var i = 0
      while (i < m) {
        if (!taken(i) && (best < 0 || sims(i) > bs)) { best = i; bs = sims(i) }
        i += 1
      }
      taken(best) = true
      out(k) = best
      k += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** First 8 md5 hex chars of `s` as an unsigned 32-bit value. */
  private def md5Head32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  /**
   * The deterministic pseudo-random plane matrix used by [[lshTopK]]:
   * nbits x dim values in [-1, 1), derived from md5("plane:b:d") so any
   * engine with an md5 function (the DuckDB oracle included) can
   * reproduce the exact signatures: (uint32(md5[0:4]) / 2^31) - 1.
   */
  def lshPlanes(nbits: Int, dim: Int, salt: String = "plane"): Array[Array[Double]] =
    Array.tabulate(nbits, dim) { (b, d) =>
      md5Head32(s"$salt:$b:$d").toDouble / (1L << 31) - 1.0
    }

  /**
   * Random-hyperplane LSH signatures: `nbits` sign bits from deterministic
   * pseudo-random planes (md5-derived via [[lshPlanes]] — reproducible, no
   * stored model). Vectors whose signatures share a band become join-key
   * candidates; exact cosine re-ranks within candidates.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nbits: Int = 24, bands: Int = 8, dim: Int = 64): DataFrame =
    lshRerank(queries, corpus, k, nbits, bands, dim, probeMode = ProbeNone)

  /**
   * MULTI-PROBE LSH top-k (Lv et al., "Multi-Probe LSH", VLDB 2007):
   * each query probes its own bucket PLUS every Hamming-distance-1
   * bucket within each band (`bandBits` extra probes per band) —
   * near-misses that flipped exactly one sign bit become candidates
   * without adding signature bits or re-bucketing the corpus, the
   * standard probes-for-memory trade when re-hashing 100 TB is the
   * expensive side. The corpus keeps its SINGLE bucket placement;
   * only the (small) query side fans out ×(1+bandBits), so the
   * candidate join stays id-only with [[lshTopK]]'s exact shape.
   * The candidate set is a strict SUPERSET of the single-probe set,
   * so recall@k is monotonically ≥ (spec-pinned).
   */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
                        nbits: Int = 24, bands: Int = 8, dim: Int = 64): DataFrame =
    lshRerank(queries, corpus, k, nbits, bands, dim, probeMode = ProbeHamming1)

  /**
   * QUERY-DIRECTED multi-probe LSH (Lv et al., "Multi-Probe LSH",
   * VLDB 2007 §4.2 — the paper's actual probing sequence, vs the
   * Hamming-1 blanket of [[lshTopKMultiProbe]]): each band probes its
   * home bucket plus the `bandBits` CHEAPEST perturbation subsets of
   * its sign bits, where a subset's cost is Σ margin² over the bits it
   * flips (margin = the hyperplane dot product — small |dot| means the
   * vector sits near that plane, so the flipped bucket holds mass).
   * Same probe budget per band as the blanket (1 + bandBits), but the
   * budget goes where the query says the neighbors are: a two-bit flip
   * across two razor-thin margins outranks a one-bit flip across a
   * fat one. Costs quantize to nothing — both engines compute the
   * identical left-associated double sums (the sig-bit convention),
   * and ties break on the perturbation mask, so the probe sequence is
   * oracle-replayable bit-for-bit.
   *
   * Scale shape identical to the blanket: the corpus keeps its single
   * bucket placement, only the (small) query side fans out
   * ×(1+bandBits), and candidates stay 8-byte id pairs through the
   * join+distinct. Subset enumeration is 2^bandBits−1 = 7 masks per
   * band at the default geometry — driver-free, per-row constant work.
   */
  def lshTopKQueryDirected(queries: DataFrame, corpus: DataFrame, k: Int,
                           nbits: Int = 24, bands: Int = 8, dim: Int = 64): DataFrame =
    lshRerank(queries, corpus, k, nbits, bands, dim, probeMode = ProbeQueryDirected)

  /**
   * GLOBALLY budgeted query-directed probing (Lv §4.4's probing-
   * sequence view): instead of [[lshTopKQueryDirected]]'s fixed
   * bandBits probes per band, rank EVERY (band, mask) perturbation by
   * Σ margin² across all bands and spend one global `budget` on the
   * cheapest — a query sitting razor-close to three hyperplanes of
   * one band gets all its probes THERE, instead of wasting thirds of
   * the budget on bands where the signature is confident. Home
   * buckets are always probed (candidates ⊇ single-probe,
   * structurally). Ties break (cost, band, mask) so both engines
   * replay the identical sequence. Same plan shape as every LSH
   * variant here: query-side fan-out only, id-only candidates.
   */
  def lshTopKQueryAdaptive(queries: DataFrame, corpus: DataFrame, k: Int,
                           nbits: Int = 24, bands: Int = 8, dim: Int = 64,
                           budget: Int = 24): DataFrame =
    lshRerank(queries, corpus, k, nbits, bands, dim,
      probeMode = ProbeQueryAdaptive, probeBudget = budget)

  /**
   * [[lshTopKQueryDirected]] with the band width priced from the
   * CORPUS COUNT via [[autoBandBits]] — the same composition
   * [[cosineNearDuplicatesAuto]] runs for dedup banding, applied to
   * the probing ANN family. The fixed 24-bit/8-band geometry keeps
   * only 2^3 = 8 bucket values per band, so every corpus decade
   * multiplies candidates PER PROBE by ~10 (the measured
   * 3.9×/decade of the fixed-band qd row, SCALING.md); pricing the
   * width as the smallest b with n ≤ targetDensity·2^b holds expected
   * bucket density — and therefore candidates per probe — constant,
   * so the probe budget buys recall instead of bucket spillage.
   *
   * Geometry: bits ∈ [6, 12] (the 12-bit cap is [[lshRerank]]'s
   * probing guard — mask enumeration is 2^bits per band per query
   * row), and bands = min(8, 64/bits) — as many independent chances
   * per true neighbor as the 64-bit signature affords, the recall
   * lever that costs no density. Probes per band stay the qd
   * contract (1 home + bits flips), so the TOTAL probe budget
   * bands·(1+bits) grows only with log n — probe count is query-side
   * fan-out (cheap); candidates PER PROBE is what 100 TB pays for,
   * and that is what the density pick pins. The pick is ONE count()
   * of the corpus and is deterministic in n, so the DuckDB oracle
   * replays the full geometry (planes, bands, probe sequence) from
   * its own count.
   *
   * Honest trade vs the fixed geometry: fixed 3-bit bands at any
   * realistic corpus are SATURATED — 32 probes × n/8 per bucket reads
   * nearly the whole corpus, so its recall is exhaustive-scan recall
   * at exhaustive-scan cost. The auto geometry reads
   * probes × n/2^bits ≈ bands·(1+bits)·targetDensity candidates
   * (scale-flat), and prices the recall it buys in its own
   * [[recallAudit]] row instead of hiding a full scan.
   */
  def lshTopKQueryDirectedAuto(queries: DataFrame, corpus: DataFrame, k: Int,
                               dim: Int = 64,
                               targetDensity: Long = 128L): DataFrame = {
    val bits = math.min(autoBandBits(corpus.count(), targetDensity), 12)
    val bands = math.min(8, 64 / bits)
    lshRerank(queries, corpus, k, nbits = bands * bits, bands = bands,
      dim = dim, probeMode = ProbeQueryDirected)
  }

  /** The global probe selection as a pure function (spec-pinned):
    * per band the home bucket, plus each band's selected flips from
    * the global (cost, band, mask) ranking truncated at `budget`. */
  private[graft] def queryDirectedProbesGlobal(planes: Array[Array[Double]],
                                               bands: Int, budget: Int)
                                              (v: Seq[Float]): Seq[Seq[Long]] = {
    val bandBits = planes.length / bands
    val dots = new Array[Double](planes.length)
    var b = 0
    while (b < planes.length) {
      var s = 0.0
      var d = 0
      val pb = planes(b)
      val n = math.min(pb.length, v.length)
      while (d < n) { s += pb(d) * v(d); d += 1 }
      dots(b) = s
      b += 1
    }
    val bandvals = new Array[Long](bands)
    val costs = Array.ofDim[Double](bands, bandBits)
    var band = 0
    while (band < bands) {
      var i = 0
      while (i < bandBits) {
        val dt = dots(band * bandBits + i)
        if (dt > 0) bandvals(band) |= (1L << i)
        costs(band)(i) = dt * dt
        i += 1
      }
      band += 1
    }
    val cands = for {
      bd <- 0 until bands
      m <- 1 until (1 << bandBits)
    } yield {
      var c = 0.0
      var j = 0
      while (j < bandBits) { c += (if ((m & (1 << j)) != 0) costs(bd)(j) else 0.0); j += 1 }
      (c, bd, m)
    }
    val chosen = cands.sortBy { case (c, bd, m) => (c, bd, m) }.take(budget)
    Seq.tabulate(bands) { bd =>
      bandvals(bd) +: chosen.collect { case (_, `bd`, m) => bandvals(bd) ^ m.toLong }
    }
  }

  private val ProbeNone = 0
  private val ProbeHamming1 = 1
  private val ProbeQueryDirected = 2
  private val ProbeQueryAdaptive = 3

  /**
   * The query-directed probe sequence (Lv §4.2) as a pure function so
   * the spec can pin the selection maths on hand-built planes: per
   * band, the home bucket followed by `bandBits` perturbed buckets —
   * the non-empty flip masks with the smallest Σ margin², ties broken
   * on the mask value. Cost sums run in ascending bit order adding
   * exact 0.0 identities for unset bits, matching the DuckDB
   * `list_sum(list_transform(...))` replay bit-for-bit.
   */
  private[graft] def queryDirectedProbes(planes: Array[Array[Double]],
                                         bands: Int)(v: Seq[Float]): Seq[Seq[Long]] = {
    val bandBits = planes.length / bands
    val dots = new Array[Double](planes.length)
    var b = 0
    while (b < planes.length) {
      var s = 0.0
      var d = 0
      val pb = planes(b)
      val n = math.min(pb.length, v.length)
      while (d < n) { s += pb(d) * v(d); d += 1 }
      dots(b) = s
      b += 1
    }
    Seq.tabulate(bands) { band =>
      var bandval = 0L
      val cost = new Array[Double](bandBits)
      var i = 0
      while (i < bandBits) {
        val dt = dots(band * bandBits + i)
        if (dt > 0) bandval |= (1L << i)
        cost(i) = dt * dt
        i += 1
      }
      val ranked = (1 until (1 << bandBits)).map { m =>
        var c = 0.0
        var j = 0
        while (j < bandBits) { c += (if ((m & (1 << j)) != 0) cost(j) else 0.0); j += 1 }
        (c, m)
      }.sortBy { case (c, m) => (c, m) }.take(bandBits).map(_._2)
      bandval +: ranked.map(m => bandval ^ m.toLong)
    }
  }

  private def lshRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                        nbits: Int, bands: Int, dim: Int,
                        probeMode: Int, probeBudget: Int = 0): DataFrame = {
    require(nbits % bands == 0)
    // the query-directed modes enumerate all 2^bandBits−1 perturbation
    // masks per query row; past ~12 bits that is thousands of masks per
    // band per row — refuse a geometry that would blow per-row CPU
    // (the Hamming-1 mode stays linear in bandBits and needs no cap)
    require(probeMode != ProbeQueryDirected && probeMode != ProbeQueryAdaptive ||
      nbits / bands <= 12,
      s"query-directed probing caps band width at 12 bits (2^bits masks " +
        s"per band per query row); got ${nbits / bands}")
    // the query side MATERIALIZES once: it feeds two plan branches
    // (band signatures + the qv re-rank join), and — the important
    // part — the checkpoint carries its REAL size as the stats the
    // planner sees. A filtered scan keeps the parent's size estimate
    // (no CBO), so a 5-row query set read as `parquet.filter(...)`
    // looked many-MB and took a shuffle join on the re-rank (the
    // round-4 +19% regression); with true stats a small set broadcasts
    // STATICALLY, and a big one still degrades to a shuffle join
    // instead of the driver OOM a forced broadcast() hint risks.
    val q0 = queries.localCheckpoint()
    // planes captured by closure — see cosineNearDuplicates / cellsUdf
    val planes: Array[Array[Double]] = lshPlanes(nbits, dim)
    val sigUdf = udf { (v: Seq[Float]) =>
      val p = planes
      var sig = 0L
      var b = 0
      while (b < p.length) {
        var s = 0.0
        var d = 0
        val pb = p(b)
        val n = math.min(pb.length, v.length)
        while (d < n) { s += pb(d) * v(d); d += 1 }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    val bandBits = nbits / bands
    val mask = (1L << bandBits) - 1
    // candidates carry ONLY 8-byte ids through the band join and the
    // distinct — the cosineNearDuplicates shape (15x measured at
    // sf0.1): vectors join back per-id AFTER dedup, so no array-typed
    // shuffle or distinct key exists anywhere in the plan
    def banded(df: DataFrame, idAs: String): DataFrame =
      df.select(col("id").as(idAs), sigUdf(col("embedding")).as("sig"))
        .select(col(idAs), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
        .withColumn("bandval", expr(s"shiftright(sig, cast(band * $bandBits as int)) & $mask"))
        .drop("sig")

    val qb = probeMode match {
      case ProbeQueryDirected =>
        val qdProbesUdf = udf(queryDirectedProbes(planes, bands) _)
        q0.select(col("id").as("query_id"),
            posexplode(qdProbesUdf(col("embedding"))).as(Seq("band", "pvals")))
          .select(col("query_id"), col("band"), explode(col("pvals")).as("bandval"))
      case ProbeQueryAdaptive =>
        val qaProbesUdf = udf(queryDirectedProbesGlobal(planes, bands, probeBudget) _)
        q0.select(col("id").as("query_id"),
            posexplode(qaProbesUdf(col("embedding"))).as(Seq("band", "pvals")))
          .select(col("query_id"), col("band"), explode(col("pvals")).as("bandval"))
      case ProbeHamming1 =>
        banded(q0, "query_id").select(col("query_id"), col("band"),
          explode(concat(array(col("bandval")),
            expr(s"transform(sequence(0, ${bandBits - 1}), " +
              "i -> bandval ^ shiftleft(cast(1 as bigint), cast(i as int)))")))
            .as("bandval"))
      case _ => banded(q0, "query_id")
    }
    val cand = qb.join(banded(corpus, "neighbor_id"), Seq("band", "bandval"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = q0.select(col("id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val cv = corpus.select(col("id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    // no forced broadcast of qv (see ivfTopK) — planner/AQE decides
    cand
      .join(qv, "query_id")
      .join(cv, "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("sim"))
  }

  /**
   * Per-dimension affine int8 quantization of an embedding column
   * (the standard min/max scalar quantization faiss calls SQ8 and
   * vector stores ship as "int8 compression"): each dimension is
   * mapped through code = floor((x - min_d) * 255 / (max_d - min_d)
   * + 0.5), clamped to [0, 255]; a constant dimension quantizes to 0.
   * Output is the exploded codes table `(id, pos, code)` — 8x smaller
   * per value than float32, the storage/IO win that makes 100 TB ANN
   * corpora fit hot storage.
   *
   * Two passes, both scale-flat: the stats pass is one map-side-
   * combined min/max aggregate down to `dim` rows (a model, broadcast
   * back regardless of corpus size); the codes pass is a pure
   * projection joined against that broadcast — no corpus-sized
   * shuffle anywhere. Quantization arithmetic is kept in the exact
   * left-associated double form `(x - mn) * 255.0 / (mx - mn) + 0.5`
   * with an integer-valued floor so any IEEE-754 engine reproduces the
   * codes bit-for-bit (the DuckDB oracle replays it verbatim).
   */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = emb.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("xf").cast("double").as("x"))
    val stats = ex.groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    ex.join(broadcast(stats), "pos")
      .withColumn("code", when(col("mx") > col("mn"),
          least(lit(255.0), floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn")) + lit(0.5)))
            .cast("long"))
        .otherwise(lit(0L)))
      .select(col("id"), col("pos"), col("code"))
  }

  /**
   * Johnson–Lindenstrauss SIGN random projection over the SQ8 codes
   * (Achlioptas 2003's ±1 database-friendly variant, composed on
   * [[quantizeInt8]]): out[j] = Σ_pos code(pos)·sign(pos, j), where
   * sign is ±1 from the md5-head parity of "pos_j" — a deterministic,
   * seedless projection matrix both engines derive from nothing but
   * the coordinates. Composing on the int8 CODES instead of the raw
   * floats makes every output an exact LONG (the JL distance-
   * preservation guarantee applies to the quantized vectors, which
   * are the ones a 100 TB store actually serves) — the
   * dimensionality-shrink primitive next to [[truncationAudit]]'s
   * MRL prefix story and PQ's codebook story.
   *
   * Shape: the sign table is (dim × outDims) rows — a model,
   * broadcast; the projection is one join + one (id, j)-keyed
   * map-side-combined sum, exchange bounded by n·outDims rows.
   * Output: (id, j, val) exploded relational surface.
   */
  def jlProject(emb: DataFrame, idCol: String, vecCol: String,
                outDims: Int): DataFrame = {
    require(outDims >= 2, s"outDims >= 2, got $outDims")
    val codes = quantizeInt8(emb, idCol, vecCol)
    val signs = codes.select(col("pos")).distinct()
      .select(col("pos"), explode(sequence(lit(0), lit(outDims - 1))).as("j"))
      .withColumn("sgn",
        when(FastHash.md5Head60(concat(col("pos"), lit("_"), col("j"))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
    codes.join(broadcast(signs), "pos")
      .groupBy("id", "j")
      .agg(sum(col("code") * col("sgn")).as("val"))
      .select(col("id"), col("j").cast("long").as("j"), col("val"))
  }

  /**
   * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
   * merge two rankings of the same query set by summing
   * `1/(k + rank)` per (query, candidate) — the standard hybrid-
   * retrieval combiner (dense + sparse, cheap index + exact scorer)
   * that needs NO score calibration because only ranks enter.
   * Contributions are floored micro-integers
   * (`⌊10⁶/(k+rank)⌋`, the repo's engine-exact policy), so the fused
   * ordering is bit-identical anywhere; ties break to candidates
   * present in more lists, then the smaller id. `n_lists` says
   * whether both rankers or one produced the candidate.
   *
   * Scale: input rankings are (query × topk)-sized — the fusion is a
   * union + one grouped sum + a WindowGroupLimit rank, never touching
   * the corpus.
   */
  /**
   * SEMANTIC train/test leakage audit — the embedding-space sibling of
   * [[graft.operators.DedupOps.splitLeakage]]: cosine near-duplicate
   * pairs (hyperplane-LSH candidates + exact verify) that straddle a
   * split boundary. Text dedup before splitting misses paraphrases and
   * translations; an eval item whose EMBEDDING has a near-twin in
   * train still leaks the answer, and this is the check for exactly
   * that. Output: (id_a, id_b, sim, split_a, split_b) — empty = clean.
   * Scale: the pair side is band-bounded ([[cosineNearDuplicates]]);
   * splits are two id-keyed (id, split) joins.
   */
  def splitLeakage(corpus: DataFrame, splits: DataFrame, splitIdCol: String,
                   splitCol: String, minCosine: Double, nbits: Int = -1,
                   bands: Int = 4, dim: Int = 64): DataFrame = {
    val pairs = cosineNearDuplicates(corpus, minCosine, nbits, bands, dim)
    val s = splits.select(col(splitIdCol).as("id"), col(splitCol).as("split"))
    pairs
      .join(s.select(col("id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(s.select(col("id").as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "sim", "split_a", "split_b")
  }

  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, topN: Int): DataFrame = {
    require(k >= 1 && topN >= 1, s"rrfFuse k=$k topN=$topN")
    val contrib = floor(lit(1.0e6) / (lit(k.toDouble) + col("rank").cast("double"))).cast("long")
    val cols = Seq("query_id", "rank", "neighbor_id")
    val scored = a.selectExpr(cols: _*).unionByName(b.selectExpr(cols: _*))
      .withColumn("contrib", contrib)
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("contrib")).as("rrf_micro"), count(lit(1)).as("n_lists"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("n_lists").desc, col("neighbor_id").asc)
    scored.withColumn("fused_rank", row_number().over(win))
      .filter(col("fused_rank") <= topN)
      .select(col("query_id"), col("fused_rank").cast("long").as("fused_rank"),
        col("neighbor_id"), col("rrf_micro"), col("n_lists"))
  }

  /**
   * Matryoshka-style truncation audit: per label, how much cosine
   * similarity survives keeping only the FIRST `keepDims` components
   * of each embedding. Because the truncated vector is a prefix of
   * the full one, cos(full, head) collapses to √(head-energy /
   * total-energy) — one left-to-right fold per row, no pairwise
   * work. `avg_cos` near 1 says the leading dims carry the signal
   * (truncate and pay 2× less everywhere downstream); `min_cos` is
   * the tail risk — the worst-served vector of the label. The go/no-go
   * audit before swapping a 64-dim index for a 32-dim one.
   *
   * Zero vectors are excluded (no direction to preserve). One
   * projection + one label-sized aggregate.
   */
  def truncationAudit(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, keepDims: Int): DataFrame = {
    require(keepDims >= 1, s"keepDims >= 1, got $keepDims")
    val v = asDouble(col(vecCol))
    val headE = aggregate(slice(v, 1, keepDims), lit(0.0), (a, e) => a + e * e)
    val totalE = aggregate(v, lit(0.0), (a, e) => a + e * e)
    emb.select(col(labelCol).as("label"),
        headE.as("he"), totalE.as("te"))
      .filter(col("te") > 0)
      .withColumn("cos", sqrt(col("he") / col("te")))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg(col("cos")), 4).as("avg_cos"),
        round(min(col("cos")), 4).as("min_cos"))
      .select(col("label").cast("long").as("label"), col("n"),
        col("avg_cos"), col("min_cos"))
  }

  /**
   * MIPS top-k — maximum INNER PRODUCT, not cosine: the retrieval
   * mode of recommender/reranker embeddings whose norms carry
   * popularity/confidence signal that cosine normalizes away. Scores
   * are the raw dot product rounded to 6 dp (the corpus float
   * policy), ranked per query with id tie-break.
   *
   * Scale shape: broadcast the query side, scan the corpus once
   * inside whole-stage codegen, per-query window top-k — exactly
   * [[bruteForceTopK]]'s plan. For corpus-sized query sets, MIPS
   * reduces to cosine by norm augmentation (append
   * `sqrt(M² − ‖x‖²)` to corpus rows and 0 to queries, M = max norm
   * — Bachrach et al., RecSys 2014), after which every cosine ANN
   * path here (LSH bands, IVF cells) prunes it; the reduction is one
   * extra column, the serve plan is unchanged.
   */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int,
               excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    broadcast(q).join(c,
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("score", round(dot(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("score"))
  }

  /**
   * Executable MIPS at scale: the norm-augmentation reduction
   * (Bachrach et al., RecSys 2014) turned into a serving plan rather
   * than a scaladoc note. Corpus vectors gain a 65th coordinate
   * `sqrt(M² − ‖x‖²)` (M² = the corpus max squared norm — ONE scalar
   * aggregate, broadcast back as a one-row frame), queries gain 0;
   * every augmented corpus vector then has the CONSTANT norm M, so
   * augmented cosine orders exactly by raw inner product and the
   * whole cosine-IVF machinery ([[ivfTopK]]'s md5-derived coarse
   * cells, nprobe probing, id-only candidate join) prunes MIPS with
   * no new physics. The re-rank scores the ORIGINAL 64-dim inner
   * product (equal to the augmented dot — the query's extra
   * coordinate is 0), so the output contract matches [[mipsTopK]]
   * and [[recallAudit]] prices the cell-pruning recall directly.
   *
   * Scale shape: identical to [[ivfTopK]] — per-query candidate work
   * is nprobe/ncells of the corpus, candidates carry only 8-byte ids
   * until after the distinct, vectors join back per-id. The extra
   * cost of the reduction is one corpus-wide scalar max and one
   * appended double per row.
   */
  def mipsIvfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  ncells: Int = 16, nprobe: Int = 6, dim: Int = 64): DataFrame = {
    val q0 = queries.localCheckpoint()
    val norm2 = aggregate(asDouble(col("embedding")), lit(0.0), (acc, x) => acc + x * x)
    val m2 = corpus.agg(max(norm2).as("m2"))
    // clamp at 0: the max-norm row lands on exactly m2 − ‖x‖² = 0, and
    // any float-order drift below zero would NaN the sqrt
    val caug = corpus.crossJoin(broadcast(m2))
      .select(col("id"), concat(asDouble(col("embedding")),
        array(sqrt(greatest(col("m2") - norm2, lit(0.0))))).as("av"))
    val qaug = q0.select(col("id"),
      concat(asDouble(col("embedding")), array(lit(0.0))).as("av"))
    // distinct salt from ivfTopK's: the augmented space needs its own
    // 65-dim codebook, still engine-reproducible from md5 alone
    val centroids: Array[Array[Double]] = Array.tabulate(ncells, dim + 1) { (c, d) =>
      md5Head32(s"mcentroid:$c:$d").toDouble / (1L << 31) - 1.0
    }
    def cellsUdf(n: Int) = udf { (v: Seq[Double]) =>
      val cs = centroids
      val sims = cs.indices.map { ci =>
        val c = cs(ci)
        var dot = 0.0; var nc = 0.0; var nv = 0.0
        var d = 0
        val len = math.min(c.length, v.length)
        while (d < len) { dot += c(d) * v(d); nc += c(d) * c(d); nv += v(d) * v(d); d += 1 }
        val den = math.sqrt(nc) * math.sqrt(nv)
        (ci, if (den == 0.0) -Double.MaxValue else dot / den)
      }
      sims.sortBy { case (ci, s) => (-s, ci) }.take(n).map(_._1)
    }
    val c = caug.select(col("id").as("neighbor_id"), explode(cellsUdf(1)(col("av"))).as("cell"))
    val q = qaug.select(col("id").as("query_id"), explode(cellsUdf(nprobe)(col("av"))).as("cell"))
    val cand = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = q0.select(col("id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val cv = corpus.select(col("id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand
      .join(qv, "query_id")
      .join(cv, "neighbor_id")
      .withColumn("score", round(dot(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("score"))
  }

  /**
   * Mutual-kNN graph: the undirected edges (a, b) where EACH vector
   * is in the other's exact cosine top-k — the noise-robust
   * neighborhood graph that seeds agglomerative/semantic-dedup
   * clustering (one-directional kNN edges hub badly; mutuality is
   * the standard prune). Emits each edge once (`src < dst`) with the
   * shared 6-dp similarity.
   *
   * Scale shape: the all-pairs scorer is the quadratic part — here
   * it is one broadcast probe + per-node window because the operator
   * contract is EXACT top-k (audit scale); at corpus scale swap the
   * scorer for the banded LSH/IVF candidate join ([[lshTopK]] /
   * [[ivfTopK]]) and keep everything from the rank window down —
   * mutuality is a self-join of the k·n ranked frame on the REVERSED
   * id pair, result-sized, never corpus-sized.
   */
  def mutualKnnEdges(emb: DataFrame, k: Int): DataFrame = {
    val ranked = bruteForceTopK(emb, emb, k)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"), col("sim"))
    val rev = ranked.select(col("dst").as("src"), col("src").as("dst"))
    ranked.join(rev, Seq("src", "dst"))
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"), col("sim"))
  }

  /**
   * Triplet mining for metric-learning data prep: per anchor, the
   * HARDEST positive (same label, LOWEST cosine — the pair the
   * current embedding separates worst) and the hardest negative
   * (different label, HIGHEST cosine — the imposter it confuses
   * most), plus the 6-dp margin `pos_sim − neg_sim` whose negative
   * values mark active triplets (FaceNet's semi-hard criterion reads
   * off this column). Ties break by neighbor id.
   *
   * Scale shape: one broadcast probe scores all pairs, then TWO
   * min/max-by aggregates per anchor — no window sort, no top-k
   * materialization. At corpus scale the positive side groups by
   * label (co-partitioned, label-sized), and the negative side is
   * the ANN candidate join — both sides keep the same max_by/min_by
   * reduction.
   */
  def tripletMining(emb: DataFrame): DataFrame = {
    val a = emb.select(col("id").as("anchor_id"), col("label").as("a_label"),
      asDouble(col("embedding")).as("qv"))
    val c = emb.select(col("id").as("other_id"), col("label").as("o_label"),
      asDouble(col("embedding")).as("cv"))
    // hardest positive: LOWEST sim (tie -> lowest id); hardest negative:
    // HIGHEST sim (tie -> lowest id). Both are min_by over a lexicographic
    // (key, id) struct of the 1e-6-quantized LONG similarity (floor+0.5,
    // the corpus quantizer — never round()*1e6-cast, whose truncation
    // direction differs across engines), negated for the max side.
    val scored = broadcast(a).join(c, col("anchor_id") =!= col("other_id"))
      .withColumn("simq",
        floor(cosine(col("qv"), col("cv")) * lit(1.0e6) + lit(0.5)).cast("long"))
    val posAgg = scored.filter(col("o_label") === col("a_label"))
      .groupBy(col("anchor_id"), col("a_label").as("label"))
      .agg(min_by(struct(col("simq").as("sq"), col("other_id").as("oid")),
        struct(col("simq"), col("other_id"))).as("p"))
      .select(col("anchor_id"), col("label"),
        col("p.oid").as("pos_id"), col("p.sq").as("pos_simq"))
    val negAgg = scored.filter(col("o_label") =!= col("a_label"))
      .groupBy(col("anchor_id"))
      .agg(min_by(struct(col("simq").as("sq"), col("other_id").as("oid")),
        struct(-col("simq"), col("other_id"))).as("n"))
      .select(col("anchor_id"),
        col("n.oid").as("neg_id"), col("n.sq").as("neg_simq"))
    posAgg.join(negAgg, Seq("anchor_id"))
      .select(col("anchor_id"), col("label"),
        col("pos_id"), (col("pos_simq").cast("double") / lit(1.0e6)).as("pos_sim"),
        col("neg_id"), (col("neg_simq").cast("double") / lit(1.0e6)).as("neg_sim"),
        (col("pos_simq") - col("neg_simq")).as("margin_micro"))
  }
}

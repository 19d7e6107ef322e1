package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Deterministic sampling / mixing / shuffling for training-data
 * pipelines — the selection layer between a deduplicated corpus and a
 * training run.
 *
 * Every operator keys its randomness off `md5(salt:id)`, not an RNG:
 * results are reproducible across engines (the DuckDB oracles recompute
 * the identical keys), across cluster sizes, and across partition
 * orders — rerunning a sample after adding executors yields the same
 * document set, which is what makes training data auditable.
 */
object SampleOps {

  /** 60-bit hash key as FIXED-WIDTH hex — order-portable across engines
    * (binary string comparison on both sides). */
  def hashKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 15)

  /** [[hashKey]] as a uniform double in [0, 1). */
  def keyFraction(id: Column, salt: String): Column =
    conv(hashKey(id, salt), 16, 10).cast("long").cast("double") / (1L << 60).toDouble

  /**
   * Deterministic Bernoulli sample: keep a doc iff its hash fraction is
   * below `rate`. A pure codegen'd filter — no shuffle, no state, scales
   * to any corpus size, and the kept set is stable under reruns and
   * corpus appends (a doc's fate depends only on its own id).
   */
  def bernoulliSample(docs: DataFrame, idCol: String, rate: Double,
                      salt: String = "sample"): DataFrame =
    docs.filter(keyFraction(col(idCol), salt) < rate)

  /**
   * Exact-fraction stratified sample: within each stratum keep the
   * `ceil(n * fraction)` docs with the smallest hash keys. One shuffle
   * partitioned by stratum.
   *
   * Scale note: each stratum ranks inside one task, so this is the
   * right tool for many medium strata (sources, shards, dates). For a
   * handful of billion-doc strata prefer [[bernoulliSample]] applied
   * per stratum — approximate counts, but no per-stratum sort.
   */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       fraction: Double, salt: String = "stratified"): DataFrame = {
    val byStratum = Window.partitionBy(col(stratumCol))
    val ord = byStratum.orderBy(hashKey(col(idCol), salt), col(idCol))
    docs
      .withColumn("rn", row_number().over(ord))
      .withColumn("nn", count(lit(1)).over(byStratum))
      .filter(col("rn") <= ceil(col("nn") * fraction))
      .drop("rn", "nn")
  }

  /**
   * Multiplicative-weights mixture reweighting — the data-mixing
   * OPTIMIZER next to [[tokenBudgetMixture]]'s executor (DoReMi-style
   * domain reweighting, linear-update variant). Per domain d with
   * reference loss L(d) (any per-doc score: LM loss, negated quality),
   * iterate: base_t = Σ w_t·L / Σ w_t, then w_{t+1}(d) = w_t(d) · (1 +
   * η·(L(d) − base_t)) — domains whose loss exceeds the CURRENT
   * mixture's weighted mean gain weight, and the moving baseline makes
   * the update genuinely iterative (a fixed baseline would collapse to
   * one closed-form step).
   *
   * Every quantity is SCALED-INTEGER arithmetic (losses in micro units
   * from exact quantized sums, weights in ppm, updates via integral
   * division), so the trajectory is bit-reproducible on any engine and
   * partitioning — the DuckDB oracle replays all `steps` as unrolled
   * CTEs, the same contract as the BPE and k-means oracles. Factors
   * clamp at 1 so a weight can shrink but never hit zero or flip sign.
   *
   * Scale: one groupBy(domain) with map-side partial integer sums; the
   * iteration runs on the driver over DOMAIN-count rows (a model
   * artifact, like centroids). Every multiply/add in the driver loop
   * goes through Math.multiplyExact/addExact, so an input outside the
   * envelope (losses ≳1e12 micro × extreme η over 8 steps) throws
   * ArithmeticException loudly instead of wrapping and silently
   * diverging from the oracle's HUGEINT trajectory.
   * Output: (domain, n_docs, mean_loss_micro, weight_ppm), weights
   * normalized to ~1e6 by integral division.
   */
  def mixtureReweight(docs: DataFrame, domainCol: String, loss: Column,
                      steps: Int, etaPpm: Long): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps in [1,8], got $steps")
    require(etaPpm > 0, s"etaPpm must be positive, got $etaPpm")
    val spark = docs.sparkSession
    val stats = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(floor(loss.cast("double") * lit(1.0e6) + lit(0.5)).cast("long")).as("lsum"))
      .select(col("domain").cast("string").as("domain"), col("n_docs"),
        IntDiv(col("lsum"), col("n_docs")).cast("long").as("mean_loss_micro"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // deterministic fold order
    val mean = stats.map(_._3)
    var w = Array.fill(stats.length)(1000000L)
    for (_ <- 1 to steps) {
      val wSum = w.sum
      // exact ops: overflow throws instead of wrapping (DuckDB's HUGEINT
      // never wraps, so a wrapped Long here would silently diverge)
      val base = w.indices
        .map(i => Math.multiplyExact(w(i), mean(i)))
        .reduce(Math.addExact(_, _)) / wSum // weighted mean, micro
      w = w.indices.map { i =>
        val factor = math.max(1L,
          Math.addExact(1000000L,
            Math.multiplyExact(etaPpm, Math.subtractExact(mean(i), base)) / 1000000L))
        Math.multiplyExact(w(i), factor) / 1000000L
      }.toArray
    }
    val wSum = w.sum
    import spark.implicits._
    stats.indices.map { i =>
      (stats(i)._1, stats(i)._2, stats(i)._3,
        Math.multiplyExact(w(i), 1000000L) / wSum)
    }.toDF("domain", "n_docs", "mean_loss_micro", "weight_ppm")
  }

  /**
   * Token-budget mixture ("data mixing"): per domain, take docs in hash
   * order until the domain's token budget is exhausted. The first doc
   * CROSSING the budget is kept (the filter admits a doc that STARTS
   * under budget), so every domain with a positive budget contributes at
   * least one doc and the overshoot is bounded by one document.
   * Domains absent from `budgets` are dropped. Output keeps the input
   * columns plus the running `cum_tokens`.
   */
  def tokenBudgetMixture(docs: DataFrame, idCol: String, domainCol: String,
                         tokensCol: String, budgets: Map[String, Long],
                         salt: String = "mixture"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = budgets.toSeq.toDF(domainCol, "budget")
    val win = Window.partitionBy(col(domainCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    docs
      .join(broadcast(b), domainCol)
      .withColumn("cum_tokens", sum(col(tokensCol)).over(win))
      .filter(col("cum_tokens") - col(tokensCol) < col("budget"))
      .drop("budget")
  }

  /**
   * Sequence packing: assign docs to fixed-token-budget training
   * sequences. Docs are sharded by hash (so no global sort exists —
   * each shard packs independently, the distributed-packing shape),
   * ordered deterministically within the shard, and cut greedily: a doc
   * belongs to the sequence its RUNNING token offset falls into, so
   * every sequence holds ~seqTokens tokens (the doc straddling a
   * boundary goes to the earlier sequence, the standard greedy pack).
   * Output: input columns + (shard, seq_no, seq_offset) where
   * seq_offset is the doc's token offset within its shard's stream.
   */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    seqTokens: Long, shards: Int,
                    salt: String = "pack"): DataFrame = {
    val shard = pmod(conv(hashKey(col(idCol), salt), 16, 10).cast("long"), lit(shards.toLong))
    val win = Window.partitionBy(col("shard"))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    docs
      .withColumn("shard", shard)
      .withColumn("seq_offset", sum(col(tokensCol)).over(win) - col(tokensCol))
      .withColumn("seq_no", floor(col("seq_offset") / seqTokens))
  }

  /**
   * PACKING-AWARE curriculum: [[packSequences]] composed with
   * [[curriculumBuckets]] so bin composition respects the schedule.
   * Plain packing shuffles difficulty into every sequence — a
   * curriculum that feeds "easiest first" is destroyed the moment
   * sequences mix buckets. Here the pack partition is
   * (bucket, shard): every training sequence is BUCKET-PURE, and
   * `sched_no` orders sequences bucket-major within each shard
   * (all of bucket 0's sequences precede bucket 1's — the feed
   * order IS the curriculum), computed as the per-bucket `seq_no`
   * plus the shard's cumulative sequence count over lower buckets.
   *
   * Determinism: buckets are [[curriculumBuckets]]' integer
   * retention math; within a (bucket, shard) the pack order is the
   * [[packSequences]] hash order; the schedule base is an exact
   * integer prefix sum over a k×shards frame. Engine-replayable end
   * to end.
   *
   * Scale shape: one id-keyed join against the bucket frame, the
   * packSequences running-sum window per (bucket, shard), and a
   * k×shards aggregate broadcast back — no new corpus-sized shuffle
   * beyond what packing already pays. Output: input columns +
   * (bucket, shard, seq_offset, seq_no, sched_no).
   */
  def packCurriculum(docs: DataFrame, idCol: String, tokensCol: String,
                     score: Column, groupCol: String, k: Int,
                     seqTokens: Long, shards: Int,
                     salt: String = "pack"): DataFrame = {
    require(seqTokens >= 1 && shards >= 1,
      s"packCurriculum seqTokens=$seqTokens shards=$shards")
    val buckets = curriculumBuckets(docs, idCol, score, groupCol, k)
      .select(col("id").as(idCol), col("bucket"))
    val shard = pmod(conv(hashKey(col(idCol), salt), 16, 10).cast("long"),
      lit(shards.toLong))
    val win = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    val packed = docs.join(buckets, idCol)
      .withColumn("shard", shard)
      .withColumn("seq_offset", sum(col(tokensCol)).over(win) - col(tokensCol))
      .withColumn("seq_no", IntDiv(col("seq_offset"), lit(seqTokens)).cast("long"))
    // schedule base: within a shard, bucket b's sequences start after
    // every lower bucket's — a k×shards frame, broadcast back
    val base = packed.groupBy("bucket", "shard")
      .agg((max(col("seq_no")) + 1L).as("_nseq"))
      .withColumn("_base",
        coalesce(sum(col("_nseq")).over(
          Window.partitionBy("shard").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("shard"), col("_base"))
    packed.join(broadcast(base), Seq("bucket", "shard"))
      .withColumn("sched_no", col("_base") + col("seq_no"))
      .drop("_base")
  }

  /**
   * Deterministic global shuffle: every doc gets a stable position
   * `1..N` in hash order — the "randomize example order" step before
   * sharding a training set, reproducible run-to-run.
   *
   * Scale shape: a range-partitioned sort (Spark samples split points,
   * every partition sorts in parallel) followed by zipWithIndex, which
   * computes per-partition offsets with one extra tiny job — there is no
   * single-task bottleneck and no driver materialization at any corpus
   * size. Output: (id, pos).
   */
  def deterministicShuffle(docs: DataFrame, idCol: String,
                           salt: String = "shuffle"): DataFrame = {
    val sorted = docs
      .select(col(idCol).as("id"))
      .withColumn("k", hashKey(col("id"), salt))
      .orderBy(col("k"), col("id"))
      .drop("k")
    val schema = StructType(sorted.schema.fields :+ StructField("pos", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row(r.get(0), i + 1L) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /**
   * Per-domain frequency cap: keep at most `cap` docs per domain, the
   * winners chosen by hash order — the CommonCrawl-style "no single
   * host dominates the mixture" quota. Hash ranking (not quality
   * ranking — [[graft.operators.DedupOps]] canonicalization handles
   * that) means the kept set is an unbiased fixed-size sample of each
   * domain and is stable under corpus *growth only at the margin*: a
   * new doc can displace at most one incumbent per domain. Output:
   * input columns + `domain_rank` (1-based hash rank within the
   * domain).
   *
   * Scale: one shuffle keyed by domain; ranking is in-partition.
   * WindowGroupLimit pushes the `<= cap` cut below the exchange, so
   * each map task forwards at most `cap` rows per domain it sees —
   * the reduce side never materializes a mega-domain's full list.
   */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String, cap: Int,
                salt: String = "domaincap"): DataFrame = {
    require(cap >= 1, s"domainCap needs cap >= 1, got $cap")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    docs
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= cap)
  }

  /**
   * Domain upsampling: repeat every doc of domain d `repeats(d)` times
   * (training-mixture epoch factors — rare domains see the model more
   * than once per pass). Domains absent from `repeats` stay at one
   * epoch. A pure broadcast-join + explode(sequence) projection — no
   * shuffle, scales like the scan. Output: input columns + `epoch`
   * (1-based).
   */
  def upsampleEpochs(docs: DataFrame, domainCol: String,
                     repeats: Map[String, Int]): DataFrame = {
    // a factor < 1 is a caller error, not a sampling request: Spark's
    // sequence(1, 0) counts DOWN ([1, 0] — two epochs!), so a zero would
    // silently DOUBLE the domain instead of dropping it
    require(repeats.values.forall(_ >= 1),
      s"epoch repeat factors must be >= 1 (use a sampler to downweight): $repeats")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = repeats.toSeq.toDF(domainCol, "repeats")
    docs
      .join(broadcast(r), Seq(domainCol), "left")
      // long-typed sequence: a generator cannot nest inside a cast
      .withColumn("epoch",
        explode(sequence(lit(1L), coalesce(col("repeats").cast("long"), lit(1L)))))
      .drop("repeats")
  }

  /**
   * Deterministic train/val/test assignment: every row lands in
   * exactly one named split by its id's hash bucket (md5 of
   * "split:<id>", mod 1000 — the same engine-portable generator as the
   * sampling family, so DuckDB replays assignments bit-exactly and any
   * rerun, on any engine, reproduces the identical split). `splits`
   * are (name, permille) in order; buckets assign by cumulative range
   * and must cover exactly 1000 so no row is silently dropped. A pure
   * projection — no shuffle, scales like the scan, and membership is a
   * function of the ID alone (adding documents later never moves an
   * existing doc between splits — the property that keeps eval sets
   * stable across corpus versions).
   */
  def splitAssign(docs: DataFrame, idCol: String,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"split weights must be positive permille: $splits")
    require(splits.map(_._2).sum == 1000,
      s"split permille must sum to 1000, got ${splits.map(_._2).sum}: $splits")
    val bucket = conv(substring(md5(concat(lit("split:"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000
    val assigned = splits.scanLeft(("", 0)) { case ((_, acc), (name, w)) => (name, acc + w) }
      .sliding(2).map { case Seq((_, lo), (name, hi)) => (name, lo, hi) }.toSeq
      .foldLeft(lit(null).cast("string")) { case (acc, (name, lo, hi)) =>
        when(bucket >= lo && bucket < hi, name).otherwise(acc)
      }
    docs.withColumn("split", assigned)
  }

  /**
   * Corpus composition report: per stratum (e.g. source x language),
   * document count, total whitespace tokens, total characters, and mean
   * quality score — the numbers a mixture design ([[tokenBudgetMixture]]
   * budgets) is derived from. One groupBy with map-side partial aggs;
   * every sum is an exact integer, and the mean divides two exact
   * integers, so the report is reproducible anywhere.
   */
  def corpusStats(docs: DataFrame, strataCols: Seq[String], textCol: String): DataFrame =
    docs.groupBy(strataCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol))).as("total_tokens"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        sum(TextOps.qualityScore(col(textCol))).as("q_sum"))
      .withColumn("avg_quality",
        round(col("q_sum").cast("double") / col("n_docs").cast("double"), 4))
      .drop("q_sum")

  /**
   * Deterministic weighted sampling without replacement (A-ES /
   * weighted reservoir, Efraimidis & Spirakis 2006): each doc draws a
   * hash-derived uniform u ∈ (0, 1] and the `n` docs per stratum with
   * the largest u^(1/w) win — equivalently, by ln(u)/w. A doc's key
   * depends only on its id and weight, so the picked set is stable
   * under reruns, partitioning, and corpus appends, exactly like
   * [[bernoulliSample]], with selection probability proportional to
   * `weightCol` (which must be > 0; non-positive weights are dropped).
   *
   * Cross-engine determinism: u = (hash60 + 1) / 2^60 converts the
   * identical 60-bit integer on both engines (one round-to-nearest
   * int→double, bit-identical); the ranking key `floor(1e12·ln(u)/w)`
   * is quantized to a LONG before the window so a last-ulp libm
   * difference in `ln` cannot reorder ranks — ties (astronomically
   * rare) resolve by id. Shape: codegen projection + one per-stratum
   * top-n window (`WindowGroupLimit` prunes to n per group map-side).
   */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: org.apache.spark.sql.Column,
                     stratumCol: String, n: Int,
                     salt: String = "wsample"): DataFrame = {
    // +1 in INTEGER space, then one int64->double round-to-nearest: the
    // same order DuckDB evaluates (h+1)/2^60, so u is bit-identical —
    // (double)h + 1.0 and (double)(h+1) can differ past 2^53
    val u = (conv(hashKey(col(idCol), salt), 16, 10).cast("long") + lit(1L))
      .cast("double") / lit((1L << 60).toDouble)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(col("wkey").desc, col(idCol).asc)
    docs
      .withColumn("weight", weightCol.cast("double"))
      .filter(col("weight") > 0)
      .withColumn("wkey", floor(log(u) / col("weight") * lit(1.0e12)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col(stratumCol), col("rank").cast("long").as("rank"),
        col(idCol), col("weight"), col("wkey"))
  }

  /**
   * Curriculum bucketing: per group, rank documents by `score`
   * (descending — "easiest first" when the score is quality) and cut
   * the ranking into `k` equal integer buckets,
   * `bucket = (rank−1)·k div n` ∈ [0, k). A curriculum schedule then
   * feeds bucket 0 before bucket 1 and so on. Pure integer retention
   * math (the [[graft.operators.TextOps.qualityTopFraction]] policy
   * generalized from one cut to k), deterministic under ties via the
   * id order. Same scale caveat as every per-group ranking window:
   * exact contract while a group fits a partition; corpus-sized
   * groups swap the window for fixed-grid quantile thresholds.
   */
  def curriculumBuckets(docs: DataFrame, idCol: String, score: Column,
                        groupCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k in [1,1000], got $k")
    docs.select(col(groupCol).as("grp"), col(idCol).as("id"), score.as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .select(col("grp"), col("id"), col("score"),
        IntDiv((col("rank") - 1) * lit(k.toLong), col("n")).cast("long").as("bucket"))
  }

  /**
   * Rendezvous (highest-random-weight) sharding: each document goes to
   * the shard with the maximal `md5("shard:" + s + ":" + id)` — the
   * sharding function whose STABILITY property a growing corpus
   * layout needs: adding shard N+1 moves exactly the documents whose
   * new hash wins (≈ 1/(N+1) of them, spec-pinned) and NOTHING else,
   * where `id % N` reshuffles almost everything. Engine-portable
   * (md5 strings compare lexicographically everywhere) and a pure
   * projection — no shuffle, no state, usable as a write-partition
   * key at any scale.
   */
  /**
   * Padding-waste audit for length-bucketed batching: every doc lands
   * in the SMALLEST bucket bound ≥ its token count (docs longer than
   * the largest bound are TRUNCATED to it — `trunc_tokens` reports the
   * loss; padding for them is 0 by construction). A training run that
   * pads each sequence to its bucket bound wastes `padding` tokens of
   * compute per bucket; `waste_ppm` = padding / (n_docs·bound) is the
   * fraction of the bucket's batch FLOPs spent on pad tokens — the
   * number that decides whether the bucket boundaries need re-tuning
   * (the audit BEFORE re-packing, where [[packSequences]] is the fix).
   *
   * One integer projection + one bucket-count aggregate; buckets must
   * be strictly increasing and positive. Docs with tokens ≤ 0 are
   * ignored (nothing to batch).
   * Output: (bucket, n_docs, sum_tokens, padding, trunc_tokens,
   * waste_ppm), one row per NON-EMPTY bucket.
   */
  def paddingWaste(docs: DataFrame, tokens: Column,
                   buckets: Seq[Long]): DataFrame = {
    require(buckets.nonEmpty && buckets.head > 0 &&
      buckets.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      s"buckets must be strictly increasing positive, got $buckets")
    val t = tokens.cast("long")
    // smallest bound >= t, else the largest (truncation bucket)
    val bucket = buckets.init.foldRight(lit(buckets.last): Column) {
      (b, rest) => when(t <= b, lit(b)).otherwise(rest)
    }
    docs.filter(t > 0)
      .select(bucket.as("bucket"), t.as("t"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("t"), col("bucket"))).as("sum_tokens"),
        sum(greatest(col("bucket") - col("t"), lit(0L))).as("padding"),
        sum(greatest(col("t") - col("bucket"), lit(0L))).as("trunc_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        col("padding"), col("trunc_tokens"),
        IntDiv(col("padding") * 1000000L, col("n_docs") * col("bucket"))
          .cast("long").as("waste_ppm"))
  }

  /**
   * Mixture drift between two corpus snapshots: per domain, the ppm
   * share of each snapshot and the signed delta — the release gate on
   * a refreshed crawl ("did the language/domain mix silently move?")
   * and the input to rebalancing ([[upsampleEpochs]] fixes what this
   * measures). All integral division: shares replay exactly on any
   * engine. Domains absent from one side report 0 there — appearing
   * and disappearing domains are exactly what the audit must surface.
   *
   * Scale: two domain-count aggregates (map-side partial) + one
   * domain-sized full-outer join; the corpus shuffles nothing but its
   * domain column. Output: (domain, n_a, n_b, share_a_ppm,
   * share_b_ppm, delta_ppm).
   */
  def mixtureDrift(a: DataFrame, b: DataFrame, domainCol: String): DataFrame = {
    def shares(df: DataFrame, n: String, share: String): DataFrame = {
      val counts = df.groupBy(col(domainCol).cast("string").as("domain"))
        .agg(count(lit(1)).as(n))
      counts.crossJoin(broadcast(counts.agg(sum(col(n)).as("total"))))
        .select(col("domain"), col(n),
          IntDiv(col(n) * 1000000L, col("total")).cast("long").as(share))
    }
    shares(a, "n_a", "share_a_ppm")
      .join(shares(b, "n_b", "share_b_ppm"), Seq("domain"), "full_outer")
      .select(col("domain"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("share_a_ppm"), lit(0L)).as("share_a_ppm"),
        coalesce(col("share_b_ppm"), lit(0L)).as("share_b_ppm"),
        (coalesce(col("share_b_ppm"), lit(0L)) -
          coalesce(col("share_a_ppm"), lit(0L))).as("delta_ppm"))
  }

  /**
   * Temperature-scaled sampling weights at α = 1/2 — the standard
   * multilingual rebalancing rule (mT5 / XLM-R style: sample group i
   * with probability ∝ p_i^α, flattening the head so low-resource
   * groups are seen more than their raw share). The α=1/2 point is
   * computed INTEGER-EXACTLY: the scaled mass is floor(sqrt(n_i)) —
   * IEEE sqrt is correctly rounded and n_i < 2^53 is exact in a
   * double, so floor(sqrt) replays bit-identically on any engine —
   * and every share/boost is integral ppm/milli division from those
   * integers (no cross-engine float sums of powered terms, which is
   * why α is fixed rather than a knob: non-half α would reintroduce
   * libm pow into the contract). boost_milli = temp share / raw share
   * is the upsampling factor feeding [[upsampleEpochs]].
   *
   * Scale: one group-count aggregate (map-side partial) + a broadcast
   * 1-row total — the corpus shuffles only its group column. Output:
   * (domain, n_docs, share_ppm, temp_ppm, boost_milli).
   */
  def temperatureShares(docs: DataFrame, domainCol: String): DataFrame = {
    val counts = docs.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("isq", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    counts.crossJoin(broadcast(
        counts.agg(sum(col("n_docs")).as("total"), sum(col("isq")).as("isq_total"))))
      .select(col("domain"), col("n_docs"),
        IntDiv(col("n_docs") * 1000000L, col("total")).cast("long").as("share_ppm"),
        IntDiv(col("isq") * 1000000L, col("isq_total")).cast("long").as("temp_ppm"))
      .withColumn("boost_milli",
        when(col("share_ppm") === 0L, 0L)
          .otherwise(IntDiv(col("temp_ppm") * 1000L, col("share_ppm")).cast("long")))
  }

  /**
   * UniMax language-budget allocation (Chung, Garcia, Ruder et al.,
   * "UniMax: Fairer and More Effective Language Sampling for
   * Large-Scale Multilingual Pretraining", ICLR 2023): spend a total
   * character budget as UNIFORMLY across languages as possible while
   * capping every language at `epochCap` repeats of its corpus — the
   * waterfilling alternative to [[temperatureShares]]' power-law
   * compromise, and the mixture schedule multilingual pretraining
   * stacks actually ship: no head language starves the tail, no tail
   * language over-epochs into memorization.
   *
   * Deterministic integer contract: languages process in ASCENDING
   * capacity order (capacity = n_chars·epochCap; ties by language
   * code); each takes min(capacity, R div k) with R the unspent
   * budget and k the languages remaining. The last language's k = 1
   * makes R div 1 absorb every division remainder (the family's
   * remainder-to-last convention), so Σ alloc = min(budget,
   * Σ capacity) EXACTLY — spec-pinned. The oracle replays the
   * recurrence as a recursive CTE over the ordered language list.
   *
   * Scale shape: ONE language-sized aggregate (map-side combined);
   * the waterfill runs driver-side on language-cardinality rows (the
   * model-sized contract [[temperatureShares]] makes). Output:
   * (lang, n_chars, capacity, alloc, epochs_milli = alloc·10³ div
   * n_chars — the per-language repeat factor the scheduler reads).
   */
  def unimaxAllocation(docs: DataFrame, langCol: String, textCol: String,
                       budget: Long, epochCap: Long): DataFrame = {
    require(budget >= 0L, s"unimaxAllocation budget=$budget")
    require(epochCap >= 1L, s"unimaxAllocation epochCap=$epochCap")
    val spark = docs.sparkSession
    val counts = docs.groupBy(col(langCol).cast("string").as("lang"))
      .agg(sum(length(col(textCol))).as("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ordered = counts.map { case (l, n) => (l, n, n * epochCap) }
      .sortBy { case (l, _, cap) => (cap, l) }
    var r = budget
    var k = ordered.length
    val rows = ordered.map { case (l, n, cap) =>
      val alloc = math.min(cap, r / k)
      r -= alloc
      k -= 1
      (l, n, cap, alloc, if (n == 0L) 0L else alloc * 1000L / n)
    }
    import spark.implicits._
    rows.toSeq.toDF("lang", "n_chars", "capacity", "alloc", "epochs_milli")
  }

  /**
   * Exact two-sample Kolmogorov–Smirnov DRIFT GATE over an integer
   * column — the distribution-shape release check [[mixtureDrift]]'s
   * per-domain shares can't see: a refreshed crawl whose language MIX
   * is unchanged but whose DOCUMENT LENGTHS collapsed (truncation bug,
   * boilerplate change) moves the KS statistic and nothing else.
   * Reports D = max |cdf_A − cdf_B| in ppm, with the value where the
   * max is attained (smallest such value on ties).
   *
   * Arithmetic contract: both CDFs are ppm-quantized BEFORE the
   * difference (cum·10⁶ div n, integral division), so every
   * intermediate is a bounded long — no n_A·n_B cross product that
   * would overflow at corpus scale — and the statistic replays exactly
   * on any engine. Quantization changes D by < 2 ppm, stated here as
   * part of the contract rather than hidden in float rounding.
   *
   * Scale: one groupBy(value) count per side (map-side partial — the
   * shuffle carries one row per DISTINCT value), a value-sized
   * full-outer join, and ONE unpartitioned running-sum window over the
   * distinct values — aggregate-output-sized by construction (lengths,
   * scores, and other audit columns have bounded distinct ranges), the
   * same deliberate shape as the grid-quantile finisher. Output: one
   * row (n_a, n_b, ks_ppm, at_value).
   */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) =
      df.groupBy(col(valueCol).cast("long").as("v")).agg(count(lit(1)).as(n))
    val u = counts(a, "ca").join(counts(b, "cb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val win = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val winAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // totals come from the cumulative sums' maxima over the SAME frame
    // (a cross join against a separate u.agg() would re-derive the
    // whole per-side aggregate — one extra corpus scan per side)
    val cdf = u
      .withColumn("cuma", sum(col("ca")).over(win))
      .withColumn("cumb", sum(col("cb")).over(win))
      .withColumn("na", max(col("cuma")).over(winAll))
      .withColumn("nb", max(col("cumb")).over(winAll))
      .withColumn("dppm",
        abs(IntDiv(col("cuma") * 1000000L, col("na")) -
            IntDiv(col("cumb") * 1000000L, col("nb"))).cast("long"))
    cdf.withColumn("maxd", max(col("dppm")).over(winAll))
      // na/nb/maxd are frame-constant, so first() is deterministic here
      .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
        first(col("maxd")).as("ks_ppm"),
        min(when(col("dppm") === col("maxd"), col("v"))).as("at_value"))
  }

  /** The highest-random-weight winner for one id — the expression
    * [[rendezvousShard]] projects, reusable inside other scans. */
  def rendezvousKey(id: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 4096, s"shards in [1,4096], got $shards")
    val candidates = array((0 until shards).map { s =>
      struct(md5(concat(lit(s"shard:$s:"), id.cast("string"))).as("h"),
        lit(s.toLong).as("s"))
    }: _*)
    array_max(candidates).getField("s")
  }

  def rendezvousShard(docs: DataFrame, idCol: String, shards: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      rendezvousKey(col(idCol), shards).as("shard"))

  /**
   * Shard-layout skew audit: docs + characters per rendezvous shard
   * and each shard's load relative to the perfectly-balanced mean in
   * ppm (1e6 = exactly fair, integer division on exact counts) — the
   * check a layout change runs before a skewed shard becomes the
   * straggler that sets every job's wall clock. One groupBy on the
   * shard key (shard-count-sized output); the mean comes from a
   * window over that aggregate frame, not a second scan.
   */
  def shardSkew(docs: DataFrame, idCol: String, textCol: String,
                shards: Int): DataFrame = {
    val total = Window.partitionBy()
    docs.select(rendezvousKey(col(idCol), shards).as("shard"),
        length(col(textCol)).cast("long").as("nc"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"))
      .withColumn("doc_load_ppm",
        IntDiv(col("n_docs") * lit(shards.toLong) * 1000000L, sum(col("n_docs")).over(total)))
      .withColumn("char_load_ppm",
        IntDiv(col("n_chars") * lit(shards.toLong) * 1000000L, sum(col("n_chars")).over(total)))
  }

  /**
   * Spearman rank correlation between two per-row signals — the
   * signal-redundancy check a selection pipeline runs before paying
   * for two quality scores that rank the corpus the same way. Ranks
   * are ORDINAL with the id as tie-break (not average-of-ties): both
   * engines then assign identical integer ranks, Σd² is an exact
   * LONG, and ρ = 1 − 6Σd²/(n(n²−1)) is one double chain over exact
   * integers (n(n²−1) is exact in a double to n ≈ 2×10⁵ and
   * 1-ulp-accurate far beyond; Σd² stays inside a LONG to n ≈ 3×10⁶).
   *
   * Scale: the two rank windows are GLOBAL sorts — this is an
   * audit-frame operator by design. At corpus scale, feed it a
   * deterministic hash sample ([[bernoulliSample]]) or per-group
   * frames; the correlation is a statistical summary, and a bounded
   * sample is the honest 100 TB path (documented over silently
   * sorting a corpus twice).
   */
  def rankCorrelation(rows: DataFrame, x: Column, y: Column, id: Column): DataFrame = {
    val base = rows.select(x.as("x"), y.as("y"), id.as("id"))
    val rx = Window.orderBy(col("x").asc, col("id").asc)
    val ry = Window.orderBy(col("y").asc, col("id").asc)
    base
      .withColumn("r1", row_number().over(rx).cast("long"))
      .withColumn("r2", row_number().over(ry).cast("long"))
      .agg(count(lit(1)).as("n"),
        sum((col("r1") - col("r2")) * (col("r1") - col("r2"))).as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        round(when(col("n") >= 2L,
          lit(1.0) - lit(6.0) * col("sum_d2").cast("double")
            / (col("n").cast("double") * (col("n").cast("double") * col("n").cast("double") - lit(1.0)))), 6)
          .as("spearman"))
  }

  /**
   * Label-balance audit: one row summarizing how evenly a labeled set
   * (classifier training data, eval splits) covers its classes —
   * label count, total rows, min/max class share in ppm, and the Gini
   * impurity in ppm. The go/no-go a fine-tuning pipeline runs before
   * training on a sampled subset: a Gini far below the uniform bound
   * means some class collapsed in sampling.
   *
   * Integer-exact by construction: shares are ppm integer divisions
   * of exact counts, and Gini = 1e6 − Σ(share²)/1e6 runs entirely in
   * LONG arithmetic (Σ share² ≤ labels·1e12 — no float, no
   * aggregation-order sensitivity). One map-side-combined groupBy on
   * the label (aggregate-sized exchange), then a single-row fold.
   */
  def labelBalance(rows: DataFrame, labelCol: String): DataFrame = {
    val perLabel = rows.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("cnt"))
    val total = Window.partitionBy()
    perLabel
      .withColumn("share_ppm",
        IntDiv(col("cnt") * 1000000L, sum(col("cnt")).over(total)))
      .agg(count(lit(1)).as("n_labels"),
        sum(col("cnt")).as("total"),
        min(col("share_ppm")).as("min_share_ppm"),
        max(col("share_ppm")).as("max_share_ppm"),
        (lit(1000000L) - IntDiv(sum(col("share_ppm") * col("share_ppm")), lit(1000000L)))
          .as("gini_ppm"))
  }

  /**
   * Pareto frontier of (maximize `scoreCol`, minimize `costCol`) —
   * the skyline of quality-vs-length trade-offs a budgeted selection
   * reads instead of a single weighted threshold: a row survives iff
   * no other row is at least as good on BOTH axes and strictly
   * better on one. Two running-max windows over the cost order
   * decide dominance in one pass — `max(score)` over strictly
   * cheaper rows (dominates if ≥ mine: they're strictly cheaper) and
   * over cheaper-or-equal rows (dominates if > mine) — no pairwise
   * join anywhere.
   *
   * Scale: ONE global sort by cost (the skyline's inherent order).
   * That is the documented audit-frame shape ([[rankCorrelation]]'s
   * caveat); at corpus scale, grid-partition by cost decade and run
   * the same windows per decade with the per-decade frontier merged
   * — or feed a [[bernoulliSample]] like the sampled Spearman.
   */
  def paretoFrontier(rows: DataFrame, id: Column, scoreCol: Column,
                     costCol: Column): DataFrame = {
    val base = rows.select(id.as("id"), scoreCol.as("score"), costCol.as("cost"))
    val ltWin = Window.orderBy(col("cost").asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val leWin = Window.orderBy(col("cost").asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("max_lt", max("score").over(ltWin))
      .withColumn("max_le", max("score").over(leWin))
      .filter((col("max_lt").isNull || col("max_lt") < col("score")) &&
        col("max_le") <= col("score"))
      .select(col("id"), col("score"), col("cost"))
  }

  /**
   * Class-rebalancing weights from exact label counts — the loss
   * weights / sampling multipliers a skewed-label fine-tune applies.
   * Two integer schemes per label: inverse-frequency ppm
   * (`total·1e6 // (cnt·k)` — exactly 1e6 for a perfectly balanced
   * set, >1e6 for rare classes) and the gentler inverse-sqrt in
   * milli (`floor(sqrt(total·1e6 // cnt))` — IEEE-exact sqrt of an
   * exact integer, the corpus pattern), which keeps rare-class
   * upweighting sublinear the way sampling-temperature mixing does.
   *
   * Scale: one label-keyed count with map-side combine + a one-row
   * broadcast. Output is label-table-sized.
   */
  /**
   * Deterministic k-fold assignment + stratification audit: every doc
   * lands in fold `md5(salt:id) mod k` — stable under reruns, corpus
   * appends and repartitioning (a doc's fold depends only on its own
   * id, the [[bernoulliSample]] contract extended to k buckets) — and
   * the output is the per-(fold, stratum) census a cross-validation
   * harness checks BEFORE training: fold sizes and within-fold
   * stratum shares in exact ppm. A fold whose stratum share drifts
   * from the corpus share is the leakage/imbalance smell.
   *
   * Scale: one codegen'd hash projection + one (fold, stratum)
   * aggregate with map-side combine; nothing user-visible sorts the
   * corpus. Output is k·strata-sized.
   */
  def kfoldAudit(docs: DataFrame, idCol: String, stratumCol: String,
                 k: Int, salt: String = "fold"): DataFrame = {
    require(k >= 2, s"kfoldAudit needs k >= 2, got $k")
    val fold = (conv(hashKey(col(idCol), salt), 16, 10).cast("long") % k).as("fold")
    val perCell = docs.select(fold, col(stratumCol).as("stratum"))
      .groupBy("fold", "stratum").agg(count(lit(1)).as("n_docs"))
    val perFold = perCell.groupBy("fold").agg(sum("n_docs").as("fold_total"))
    perCell.join(perFold, "fold")
      .select(col("fold"), col("stratum"), col("n_docs"), col("fold_total"),
        IntDiv(col("n_docs") * 1000000L, col("fold_total")).cast("long")
          .as("share_ppm"))
  }

  def classWeights(rows: DataFrame, labelCol: String): DataFrame = {
    val perLabel = rows.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("cnt"))
    val tot = perLabel.agg(sum("cnt").as("total"), count(lit(1)).as("k"))
    perLabel.crossJoin(broadcast(tot))
      .select(col("label"), col("cnt"), col("total"), col("k"),
        IntDiv(col("total") * 1000000L, col("cnt") * col("k")).cast("long")
          .as("inv_weight_ppm"),
        floor(sqrt(IntDiv(col("total") * 1000000L, col("cnt")).cast("double")))
          .cast("long").as("sqrt_weight_milli"))
  }
}

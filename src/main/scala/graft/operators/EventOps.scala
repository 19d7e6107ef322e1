package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time operators over the `events` stream table: gap-based
 * sessionization and the scale-safe as-of join. Neither exists in the
 * reference (carbon-clickhouse is ingest-only); both are table-stakes
 * for the training-data / behavioral-analytics layer a 100 TB event
 * corpus feeds.
 */
object EventOps {

  /**
   * Gap-based sessionization: consecutive events of one key belong to
   * the same session while the gap to the previous event is <= `gapSec`
   * (the boundary is INCLUSIVE — per-event windows [t, t+gap] that
   * touch at a point merge); a strictly greater gap starts a new
   * session. The spec pins this boundary because the oracle's
   * gaps-and-islands replay must break on `>`, not `>=`.
   *
   * Spark-first: `session_window` in a plain `groupBy` — the SAME
   * declaration works under Structured Streaming, where Spark merges
   * session state incrementally instead of re-scanning history; batch
   * and stream share one semantics (EventOpsSpec runs this exact
   * method over a MemoryStream and asserts the closed sessions equal
   * the batch output). The plan is a single hash shuffle on the key +
   * in-partition merge; no self-join, no window-function sort pass
   * over the full corpus.
   *
   * `watermarkDelaySec` (streaming only): bounds session state — a
   * session is finalized and emitted once the event-time watermark
   * passes its end, and events later than the delay are dropped. Leave
   * None for batch (a watermark is a no-op there anyway).
   *
   * Output: one row per (key, session) with start/end epoch seconds,
   * duration, event count, and value sum (rounded 4 for the
   * cross-engine compare).
   */
  def sessionize(events: DataFrame, keyCol: String, tsecCol: String,
                 gapSec: Long, valueCol: String,
                 watermarkDelaySec: Option[Long] = None): DataFrame = {
    val withTs = events.withColumn("_swts", timestamp_seconds(col(tsecCol)))
    val src = watermarkDelaySec.fold(withTs)(d =>
      withTs.withWatermark("_swts", s"$d seconds"))
    src
      .groupBy(col(keyCol),
        session_window(col("_swts"), s"$gapSec seconds").as("w"))
      .agg(
        min(col(tsecCol)).as("session_start"),
        max(col(tsecCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        (col("session_end") - col("session_start")).as("duration_s"),
        col("n_events"), col("sum_value"))
  }

  /**
   * As-of join: for each left row, the single latest right row of the
   * same `key` whose time is <= the left row's time (inclusive; ties
   * on time resolve to the largest `rightTie`). Left rows with no
   * earlier right row keep nulls.
   *
   * Shape: the naive formulation is a range join (`l.key = r.key AND
   * r.t <= l.t` + a per-left argmax) — per-key quadratic, and the
   * single shape that melts down first on a dense 100 TB event table.
   * This implementation is the union trick: tag both sides, union,
   * and run ONE running `last(_, ignoreNulls)` window ordered by
   * `(time, side, tie)` per key — one hash shuffle + one in-partition
   * sort, linear in rows, no candidate explosion. Right rows sort
   * before left rows at equal time, which is exactly the inclusive
   * "at or before" bound. The running frame (UnboundedPreceding →
   * CurrentRow) is Spark's streaming-frame fast path, so the window
   * pass is a single forward scan. Hot keys skew the per-key sort;
   * that is the documented caveat shared with every per-key window in
   * this library (salt the key upstream if one key dominates).
   *
   * `rightPayload` names the right columns carried onto matches;
   * output = all left columns + payload columns (null when unmatched).
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], leftTie: String,
               rightTie: String): DataFrame = {
    val lcols = left.columns.toSeq
    val l = left.select(
      col(key).as("_k"), col(leftTime).cast("long").as("_t"),
      lit(1).as("_side"), col(leftTie).cast("long").as("_tie"),
      struct(lcols.map(col): _*).as("_l"))
    val r = right.select(
      col(key).as("_k"), col(rightTime).cast("long").as("_t"),
      lit(0).as("_side"), col(rightTie).cast("long").as("_tie"),
      struct(rightPayload.map(col): _*).as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lcols.map(c => col(s"_l.$c").as(c)) ++
        rightPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /**
   * Ordered funnel: for each key, the earliest time it reached each
   * stage IN ORDER — stage i+1 counts only at or after the key's
   * stage-i time (inclusive: the same event time may satisfy two
   * stages, the common instant-conversion convention). Output: one row
   * per key with a nullable `t_<stage>` column per stage; a null means
   * the funnel stopped before that stage.
   *
   * Shape: one `min` aggregation per stage plus one left join per
   * stage, ALL keyed on `keyCol` — Spark plans them into reused
   * exchanges, nothing shuffles twice, and no per-key event list is
   * ever collected (the collect_list formulation caps at driver/state
   * memory on hot keys; this one never materializes a key's history).
   * Stage count is the plan depth — fine for the 3-10 stages real
   * funnels have.
   */
  def funnel(events: DataFrame, keyCol: String, timeCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var acc = events.select(col(keyCol)).distinct()
    var prev: Option[String] = None
    for (s <- stages) {
      val tcol = s"t_$s"
      val stageEv = events.filter(col(typeCol) === s)
        .select(col(keyCol), col(timeCol).cast("long").as("_t"))
      val reached = prev match {
        case None =>
          stageEv.groupBy(keyCol).agg(min("_t").as(tcol))
        case Some(p) =>
          stageEv.join(acc.select(col(keyCol), col(p)), keyCol)
            .filter(col("_t") >= col(p))
            .groupBy(keyCol).agg(min("_t").as(tcol))
      }
      acc = acc.join(reached, Seq(keyCol), "left")
      prev = Some(tcol)
    }
    acc
  }

  /**
   * Exact interpolated percentiles of `valueCol` per group — Spark's
   * `percentile` and DuckDB's `quantile_cont` share the same
   * definition (linear interpolation at rank p·(n-1), R type 7), so
   * the result is oracle-replayable where an approx sketch (t-digest,
   * KLL) never is. Exact percentiles sort each group in its partition:
   * right for group-wise analytics (types, shards, dates); for a
   * global percentile over 100 TB reach for a sketch and accept the
   * error bound instead.
   */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[Double]): DataFrame = {
    val pct = percentile(col(valueCol), array(ps.map(lit): _*))
    val named = ps.zipWithIndex.map { case (p, i) =>
      round(element_at(col("_pct"), i + 1), 4)
        .as("p" + formatP(p))
    }
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), pct.as("_pct"))
      .select(col(groupCol) +: col("n") +: named: _*)
  }

  private def formatP(p: Double): String =
    (BigDecimal.valueOf(p) * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")

  /**
   * Benford first-digit audit: the digit histogram of a value column
   * against Benford's law P(d) = log₁₀(1 + 1/d), with per-digit χ²
   * contributions — the classic fabricated-data / broken-instrument
   * screen (organic multiplicative quantities follow the law; a
   * uniform or spiked first-digit histogram is a red flag worth a
   * look even when, as with bounded uniform metrics, the law isn't
   * expected to hold exactly). The first digit comes from the
   * INTEGER string of the 1e-3-quantized value — integer formatting
   * is engine-identical where float formatting is not. Values
   * quantizing to 0 are excluded (no leading digit).
   *
   * One 9-row aggregate; the χ² chain is the only float math and
   * both engines run it on the same integers.
   */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val q = floor(abs(col(valueCol)) * lit(1.0e3) + lit(0.5)).cast("long")
    val digits = df.select(q.as("q")).filter(col("q") >= 1)
      .select(substring(col("q").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("cnt"))
    val tot = digits.agg(sum(col("cnt")).as("n"))
    val expected = col("n").cast("double") *
      log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    digits.crossJoin(broadcast(tot))
      .withColumn("exp", expected)
      .select(col("digit"), col("cnt"),
        round(col("exp"), 4).as("expected"),
        round((col("cnt").cast("double") - col("exp")) *
          (col("cnt").cast("double") - col("exp")) / col("exp"), 4).as("chi2_term"))
  }

  /**
   * Per-group winsorization: clip each value into its group's
   * `[pLo, pHi]` exact interpolated percentile band — the outlier
   * treatment that keeps the row (unlike a filter) while bounding its
   * leverage, standard before any mean-based normalization of reward /
   * engagement / latency features. The clip picks one of {value, lo,
   * hi} so no new float arithmetic enters; the band itself rides the
   * same type-7 percentile contract the group-percentile operator pins
   * against DuckDB.
   *
   * Plan: one group aggregate (group-count-sized) joined back to the
   * stream — AQE broadcasts the band table; the data side is a single
   * scan, no window over the full stream.
   */
  def winsorize(df: DataFrame, idCol: String, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val bands = df.groupBy(groupCol).agg(
      percentile(col(valueCol), lit(pLo)).as("lo"),
      percentile(col(valueCol), lit(pHi)).as("hi"))
    df.join(bands, groupCol)
      .select(col(idCol), col(groupCol),
        round(col("lo"), 4).as("lo"), round(col("hi"), 4).as("hi"),
        round(least(greatest(col(valueCol), col("lo")), col("hi")), 4).as("value_w"))
  }

  /**
   * Trailing time-window features: for every event, the count and
   * value-sum of the same key's events in `[t - windowSec, t]` — a
   * RANGE frame, so simultaneous events all see each other regardless
   * of row order (no tie ambiguity to pin). The frame sums
   * 1e-6-quantized LONGS ([[SeriesOps.movingAverage]]'s policy) so
   * segment-tree and in-order frame evaluation agree bit-exactly.
   *
   * One hash shuffle on the key + an in-partition range scan; state is
   * the frame, not the key's history. The standard behavioral-feature
   * primitive ("events in the last hour") for both fraud-style scoring
   * and rate-limit analysis over an event corpus.
   */
  def rollingCounts(events: DataFrame, keyCol: String, timeCol: String,
                    valueCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).cast("long"))
      .rangeBetween(-windowSec, Window.currentRow)
    events
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        round(sum(floor(col(valueCol) * lit(1.0e6) + lit(0.5)).cast("long")).over(w)
          .cast("double") / lit(1.0e6), 6))
  }

  /**
   * Fixed-width histogram of `valueCol` per group: bin i covers
   * `[i·width, (i+1)·width)`. Empty bins are absent (sparse output —
   * at corpus scale a dense bin spine would be a cross join). One
   * aggregation, map-side partial.
   */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                width: Double): DataFrame =
    df.groupBy(col(groupCol),
        floor(col(valueCol) / lit(width)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bin"),
        (col("bin").cast("double") * lit(width)).as("bin_lo"), col("n"))

  /**
   * Classic cohort retention matrix: users are grouped by their first
   * active period (integer `tsec div periodSec`), and each cell
   * `(cohort, offset)` counts the cohort's users active `offset`
   * periods later, with the retained fraction against the cohort's
   * size. The standard product-analytics read on an event stream.
   *
   * Shape at scale: events are scanned ONCE — the map-side-combined
   * distinct to (user, period) is the only shuffle touching event
   * volume; the cohort label is a per-user window min over the
   * already-tiny active set (a join-based formulation read the raw
   * events three times, once per aggregate branch — measured in the
   * plan, not guessed; a self-join for sizes still re-scanned, because
   * the pushed offset-0 filter broke exchange reuse); cells aggregate
   * map-side, and the cohort size is the cells' own offset-0 count
   * read back by a window over the cohort-x-offset aggregate — rows
   * bounded by the calendar, never by users or events. No dense
   * cohort x offset spine.
   * Period arithmetic is pure integer division, so any engine replays
   * cohort labels exactly; the retained fraction is a single
   * int/int->double division rounded for display.
   */
  def retention(events: DataFrame, userCol: String, tsecCol: String,
                periodSec: Long): DataFrame = {
    val active = events
      .select(col(userCol).as("user_id"),
        expr(s"$tsecCol div $periodSec").as("period"))
      .distinct()
    active
      .withColumn("cohort", min(col("period")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("cohort_size",
        max(when(col("offset") === 0, col("n_users")))
          .over(Window.partitionBy(col("cohort"))))
      .select(col("cohort"), col("offset"), col("n_users"), col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size").cast("double"), 4)
          .as("retained"))
  }

  /**
   * Interval (time-range) join by bucket expansion: for every window
   * row count the events of the same key whose time falls inside
   * `[lo, hi)`. The textbook formulation is a theta join
   * (`e.tsec BETWEEN w.lo AND w.hi`), which Spark can only execute as
   * a BroadcastNestedLoopJoin — an O(windows x events) scan per key
   * that dies the moment neither side broadcasts. This operator turns
   * it into an EQUI join: windows explode onto the fixed time buckets
   * they overlap (`lo div bucketSec .. (hi-1) div bucketSec`), events
   * map onto their single containing bucket, the join runs on
   * `(key, bucket)`, and the exact `[lo, hi)` containment is a cheap
   * residual filter after the hash match.
   *
   * Requiring `bucketSec >= max(hi - lo)` caps the explode at 2 rows
   * per window, so the shuffled volume is <= 2|W| + |E| regardless of
   * corpus size — and because each EVENT carries exactly one bucket, a
   * window spanning two buckets can never double-count a match (the
   * event only exists in one of them). That asymmetry is the point:
   * replicate the small, bounded side (windows), never the events.
   *
   * Windows with no match survive via the final left join against the
   * window spine with a coalesce-to-0 count. `excludeSelf` drops the
   * event whose id equals the window id — the "count the neighbors of
   * a spike, not the spike" contract.
   *
   * Contract: `windows` has (win_id, key, lo, hi) with `hi > lo` and
   * `hi - lo <= bucketSec`; `events` has (id, key, tsec); epoch values
   * are non-negative (the bucket arithmetic uses integer `div`).
   * Output: (win_id, key, n_in_window), window-sized.
   */
  def intervalJoinCount(windows: DataFrame, events: DataFrame,
                        bucketSec: Long, excludeSelf: Boolean = true): DataFrame = {
    require(bucketSec > 0, s"intervalJoinCount bucketSec=$bucketSec")
    val w = windows
      .filter(col("hi") > col("lo"))
      .withColumn("bucket", explode(sequence(
        expr(s"lo div $bucketSec"), expr(s"(hi - 1) div $bucketSec"))))
    val e = events.withColumn("bucket", expr(s"tsec div $bucketSec"))
    val matched = w.join(e, Seq("key", "bucket"))
      .filter(col("tsec") >= col("lo") && col("tsec") < col("hi") &&
        (if (excludeSelf) col("id") =!= col("win_id") else lit(true)))
      .groupBy("win_id").agg(count(lit(1)).as("n"))
    windows.select("win_id", "key")
      .join(matched, Seq("win_id"), "left")
      .select(col("win_id"), col("key"),
        coalesce(col("n"), lit(0L)).as("n_in_window"))
  }

  /**
   * RFM segmentation — the classic user-value triage (recency /
   * frequency / monetary) as exact integer quintiles: per user,
   * days since last activity (against the corpus max, so the score
   * is reproducible from the data alone), event count, and the
   * 1e-3-quantized value sum; each axis ranks into quintiles by
   * `((rank−1)·5) div n + 1` over a (metric, user_id) total order —
   * ntile's arithmetic with an explicit tie-break, so no engine's
   * ntile boundary convention is trusted. Recency ranks ASC on
   * days-since (most recent = rank 1 = score 5 after the flip);
   * frequency/monetary rank DESC. `rfm = 100r + 10f + m`.
   *
   * Scale: one user-keyed aggregate, then three global rank windows
   * over the USER table (aggregate-sized, not event-sized) — the
   * audit-frame caveat; at billions of users swap each rank for the
   * fixed-grid quantile sketch thresholds like qualityTopFraction's
   * scale form.
   */
  def rfmSegments(events: DataFrame, userCol: String, tsecCol: String,
                  valueCol: String): DataFrame = {
    val perUser = events
      .groupBy(col(userCol).as("user_id"))
      .agg(max(expr(s"$tsecCol div 86400")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col(valueCol) * lit(1.0e3) + lit(0.5)).cast("long"))
          .as("monetary_milli"))
      .withColumn("recency_days",
        max("last_day").over(Window.partitionBy()) - col("last_day"))
    def quintile(ord: Column*): Column = {
      val w = Window.orderBy(ord: _*)
      // LONG integral division — Spark's `/` would go through a double
      (graft.operators.IntDiv(
        (row_number().over(w).cast("long") - 1L) * 5L,
        count(lit(1)).over(Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))) + 1L)
        .cast("long")
    }
    perUser
      .withColumn("r_score",
        lit(6L) - quintile(col("recency_days").asc, col("user_id").asc))
      .withColumn("f_score",
        lit(6L) - quintile(col("frequency").desc, col("user_id").asc))
      .withColumn("m_score",
        lit(6L) - quintile(col("monetary_milli").desc, col("user_id").asc))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_milli"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score")).as("rfm"))
  }

  /**
   * First-order Markov transition matrix over per-user event
   * sequences: counts of consecutive (from → to) event types (ordered
   * by time with the event id as the LWW-style tie-break) and the
   * per-source transition share in ppm — the behavioral fingerprint
   * session-based recommenders and bot detectors read. Integer
   * division keeps the shares engine-exact.
   *
   * Scale: one window shuffle on the user key for the lag, one
   * (from, to)-keyed aggregate (type²-bounded output), one from-keyed
   * total — all map-side combined. No cross join, no driver state.
   */
  def markovTransitions(events: DataFrame, userCol: String, tsecCol: String,
                        typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsecCol).asc, col(idCol).asc)
    val trans = events
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("from_type").agg(sum("n").as("n_from"))
    trans.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        graft.operators.IntDiv(col("n") * 1000000L, col("n_from")).cast("long")
          .as("share_ppm"))
  }

  /**
   * Conversion HAZARD table (the discrete-time life-table form of
   * survival analysis): subjects are users with a `from` event;
   * conversion time is their first `to` event at or after their first
   * `from`; delays bucket by `bucketSec`. Per bucket: n_risk (subjects
   * not yet converted entering the bucket), n_conv, the discrete
   * hazard d/n_risk in ppm, and cumulative conversion in ppm — the
   * "when do signups purchase" curve a funnel count can't show.
   * Never-converters stay at risk in every bucket (no censoring time
   * is modeled — the conservative life-table reading; a study-window
   * cutoff would join an end-of-observation column the same way).
   * All integer arithmetic, oracle-replayable.
   *
   * Scale shape: two filtered scans fold to per-user firsts (map-side
   * combined), one user-keyed left join, a bucket-sized aggregate,
   * then ONE unpartitioned window over bucket-cardinality rows (the
   * ksDrift convention: aggregate-output-sized by construction) and a
   * one-row total broadcast. Nothing user-quadratic anywhere.
   *
   * Output: (bucket, n_risk, n_conv, hazard_ppm, cum_conv_ppm).
   */
  def conversionHazard(events: DataFrame, userCol: String, tsecCol: String,
                       typeCol: String, from: String, to: String,
                       bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec >= 1L, s"conversionHazard bucketSec=$bucketSec")
    val f = events.filter(col(typeCol) === from)
      .groupBy(col(userCol).as("u")).agg(min(col(tsecCol)).as("t0"))
    val c = events.filter(col(typeCol) === to)
      .select(col(userCol).as("u"), col(tsecCol).as("tc"))
    val subj = f.join(c, Seq("u"), "left")
      .groupBy("u")
      .agg(min(col("t0")).as("t0"),
        min(when(col("tc") >= col("t0"), col("tc"))).as("tc"))
      .select(col("u"),
        when(col("tc").isNotNull,
          graft.operators.IntDiv(col("tc") - col("t0"), lit(bucketSec)))
          .cast("long").as("bucket"))
      .localCheckpoint() // feeds the total AND the bucket counts
    val total = subj.agg(count(lit(1)).as("n_total"))
    val d = subj.filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n_conv"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("prior", coalesce(sum(col("n_conv")).over(w), lit(0L)))
      .crossJoin(total) // one-row broadcast
      .select(col("bucket"),
        (col("n_total") - col("prior")).as("n_risk"),
        col("n_conv"),
        graft.operators.IntDiv(col("n_conv") * 1000000L,
          col("n_total") - col("prior")).cast("long").as("hazard_ppm"),
        graft.operators.IntDiv((col("prior") + col("n_conv")) * 1000000L,
          col("n_total")).cast("long").as("cum_conv_ppm"))
  }

  /**
   * RIGHT-CENSORED life table — [[conversionHazard]] with the
   * Kaplan–Meier risk-set semantics: never-converters are censored at
   * the study end (the corpus's max timestamp — the snapshot horizon),
   * so they leave the risk set after their censor bucket instead of
   * holding n_risk up forever. Convention: a subject censored in
   * bucket b counts at risk THROUGH b and leaves after it (the
   * whole-bucket actuarial reading; the n − c/2 variant is a constant
   * substitution). Per bucket: n_risk, conversions, censors, the
   * discrete hazard d/n_risk in ppm, and cumulative conversion over
   * all subjects. Integer arithmetic throughout; replayable.
   *
   * Scale shape: [[conversionHazard]]'s plan plus one corpus max (a
   * one-row broadcast) — per-user firsts, one left join, a
   * bucket-sized aggregate, one bucket-cardinality window.
   *
   * Output: (bucket, n_risk, n_conv, n_cens, hazard_ppm,
   * cum_conv_ppm).
   */
  def conversionHazardCensored(events: DataFrame, userCol: String, tsecCol: String,
                               typeCol: String, from: String, to: String,
                               bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec >= 1L, s"conversionHazardCensored bucketSec=$bucketSec")
    val f = events.filter(col(typeCol) === from)
      .groupBy(col(userCol).as("u")).agg(min(col(tsecCol)).as("t0"))
    val c = events.filter(col(typeCol) === to)
      .select(col(userCol).as("u"), col(tsecCol).as("tc"))
    val tEnd = events.agg(max(col(tsecCol)).as("t_end"))
    val subj = f.join(c, Seq("u"), "left")
      .groupBy("u")
      .agg(min(col("t0")).as("t0"),
        min(when(col("tc") >= col("t0"), col("tc"))).as("tc"))
      .crossJoin(tEnd) // one-row broadcast
      .select(
        coalesce(
          graft.operators.IntDiv(col("tc") - col("t0"), lit(bucketSec)),
          graft.operators.IntDiv(col("t_end") - col("t0"), lit(bucketSec)))
          .cast("long").as("bucket"),
        col("tc").isNotNull.as("is_conv"))
      .localCheckpoint()
    val total = subj.agg(count(lit(1)).as("n_total"))
    val d = subj.groupBy("bucket")
      .agg(sum(when(col("is_conv"), 1L).otherwise(0L)).as("n_conv"),
        sum(when(!col("is_conv"), 1L).otherwise(0L)).as("n_cens"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("prior_out",
        coalesce(sum(col("n_conv") + col("n_cens")).over(w), lit(0L)))
      .withColumn("prior_conv", coalesce(sum(col("n_conv")).over(w), lit(0L)))
      .crossJoin(total)
      .select(col("bucket"),
        (col("n_total") - col("prior_out")).as("n_risk"),
        col("n_conv"), col("n_cens"),
        graft.operators.IntDiv(col("n_conv") * 1000000L,
          col("n_total") - col("prior_out")).cast("long").as("hazard_ppm"),
        graft.operators.IntDiv((col("prior_conv") + col("n_conv")) * 1000000L,
          col("n_total")).cast("long").as("cum_conv_ppm"))
  }

  /**
   * Multi-touch attribution — the conversion-credit report every
   * behavioral pipeline ships next to the funnel: each touch event
   * attributes to the SAME user's NEXT conversion (type `convType`)
   * when that conversion lands within `lookbackSec` strictly after
   * the touch, and three classic models split each conversion's
   * 10⁶ ppm of credit across its touches:
   *
   *  - first-touch: the earliest touch (ties to the smaller event id)
   *    takes all of it;
   *  - last-touch: the latest touch (ties to the larger id) does;
   *  - linear: every touch takes 10⁶ div n, with the integral-division
   *    remainder assigned to the LAST touch — so credit sums to
   *    EXACTLY 10⁶ per conversion under all three models (the
   *    conservation property the spec pins).
   *
   * Scale shape: NO range join — touches and conversions union into
   * one frame and a single per-user window scanned in DESCENDING time
   * order carries the nearest following conversion to every touch
   * (the asofJoin trick mirrored forward; a conversion at the SAME
   * timestamp sorts after the touch, so attribution is strictly
   * forward). Credit assignment is one per-conversion window over the
   * attributed touches; the report is one channel-sized aggregate.
   *
   * Output: (event_type, n_touches, conversions_touched, first_ppm,
   * last_ppm, linear_ppm) summed per touch channel.
   */
  def attribution(events: DataFrame, userCol: String, tsecCol: String,
                  typeCol: String, idCol: String, convType: String,
                  lookbackSec: Long): DataFrame = {
    val attributed = attributedTouches(events, userCol, tsecCol, typeCol,
      idCol, convType, lookbackSec)
    val convW = Window.partitionBy(col("user"), col("nc.c_id"))
    val linearBase = IntDiv(lit(1000000L), col("n"))
    val credited = attributed
      .withColumn("n", count(lit(1)).over(convW))
      .withColumn("tkey", struct(col("ts"), col("eid")))
      .withColumn("is_first", col("tkey") === min(col("tkey")).over(convW))
      .withColumn("is_last", col("tkey") === max(col("tkey")).over(convW))
      .select(col("etype"), col("user"), col("nc.c_id").as("c_id"),
        when(col("is_first"), 1000000L).otherwise(0L).as("first_ppm"),
        when(col("is_last"), 1000000L).otherwise(0L).as("last_ppm"),
        (linearBase + when(col("is_last"),
          lit(1000000L) - linearBase * col("n")).otherwise(0L)).as("linear_ppm"))
    credited.groupBy(col("etype").as("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        // distinct (user, conversion) PAIRS: event ids only need to be
        // unique per user — a cross-user c_id collision must not
        // collapse two different users' conversions into one
        count_distinct(col("user"), col("c_id")).as("conversions_touched"),
        sum(col("first_ppm")).as("first_ppm"),
        sum(col("last_ppm")).as("last_ppm"),
        sum(col("linear_ppm")).as("linear_ppm"))
  }

  /** The shared touch→next-conversion assignment of the attribution
    * family: touches and conversions union into one frame; a single
    * per-user window scanned in DESCENDING time order carries the
    * nearest following conversion to every touch. Nulls-first on c_id
    * keeps same-ts touches BEFORE conversions (strictly-forward
    * attribution); descending c_id among same-ts conversions leaves
    * the SMALLEST id as the final state — the deterministic pick the
    * oracles replay. Output: touch rows with `nc = (c_ts, c_id)`. */
  private def attributedTouches(events: DataFrame, userCol: String,
                                tsecCol: String, typeCol: String,
                                idCol: String, convType: String,
                                lookbackSec: Long): DataFrame = {
    require(lookbackSec >= 1, s"attribution lookbackSec=$lookbackSec")
    val e = events.select(col(userCol).as("user"), col(tsecCol).as("ts"),
      col(typeCol).as("etype"), col(idCol).as("eid"))
    val touch = e.filter(col("etype") =!= convType)
      .select(col("user"), col("ts"), col("etype"), col("eid"),
        lit(null).cast("long").as("c_ts"), lit(null).cast("long").as("c_id"))
    val conv = e.filter(col("etype") === convType)
      .select(col("user"), col("ts"),
        lit(null).cast("string").as("etype"), lit(null).cast("long").as("eid"),
        col("ts").as("c_ts"), col("eid").as("c_id"))
    val scanW = Window.partitionBy("user")
      .orderBy(col("ts").desc, col("c_id").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touch.unionByName(conv)
      .withColumn("nc", last(
          when(col("c_id").isNotNull, struct(col("c_ts"), col("c_id"))),
          ignoreNulls = true).over(scanW))
      .filter(col("eid").isNotNull && col("nc").isNotNull &&
        col("nc.c_ts") - col("ts") <= lookbackSec)
  }

  /**
   * POSITION-BASED (U-shaped, 40/20/40) attribution — the fifth
   * classic model: the FIRST touch (discovery) and the LAST touch
   * (closer) each take 40% of the conversion's 10⁶ ppm and the
   * middles share the remaining 20% evenly — the schedule marketing
   * stacks ship as "position-based". Degenerate counts follow the
   * standard convention, kept exactly conservative: one touch takes
   * everything; two touches split 50/50; at n ≥ 3 the middles take
   * 2·10⁵ div (n−2) each and the integral-division remainder goes to
   * the LAST touch (the family's remainder rule), so credit sums to
   * EXACTLY 10⁶ per conversion. Ties on the first/last designation
   * break by (ts, event id) like the other models.
   *
   * Same scale shape as [[attribution]]. Output: (event_type,
   * n_touches, position_ppm).
   */
  def attributionPosition(events: DataFrame, userCol: String, tsecCol: String,
                          typeCol: String, idCol: String, convType: String,
                          lookbackSec: Long): DataFrame = {
    val attributed = attributedTouches(events, userCol, tsecCol, typeCol,
      idCol, convType, lookbackSec)
    val convW = Window.partitionBy(col("user"), col("nc.c_id"))
    val mid = IntDiv(lit(200000L), col("n") - 2L)
    val credited = attributed
      .withColumn("n", count(lit(1)).over(convW))
      .withColumn("tkey", struct(col("ts"), col("eid")))
      .withColumn("is_first", col("tkey") === min(col("tkey")).over(convW))
      .withColumn("is_last", col("tkey") === max(col("tkey")).over(convW))
      .withColumn("position_ppm",
        when(col("n") === 1L, 1000000L)
          .when(col("n") === 2L, 500000L)
          .otherwise(
            when(col("is_first"), 400000L)
              .when(col("is_last"),
                lit(400000L) + lit(200000L) - mid * (col("n") - 2L))
              .otherwise(mid)))
    credited.groupBy(col("etype").as("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("position_ppm")).as("position_ppm"))
  }

  /**
   * TIME-DECAY attribution — the fourth classic model next to
   * [[attribution]]'s first/last/linear: a touch's share of its
   * conversion's 10⁶ ppm decays exponentially with its age at
   * conversion time, quantized to HALVING BUCKETS so the model is
   * integer-exact on any engine (no libm pow in the contract — the
   * p_temperature floor-sqrt convention applied to 2^−x): weight
   * w = max(10⁶ >> min(age div halfLifeSec, 62), 1), credit =
   * w·10⁶ div Σw per conversion, with the integral-division remainder
   * assigned to the LAST touch — credit sums to EXACTLY 10⁶ per
   * conversion, the same conservation rule the linear model makes.
   * The floor at 1 matters: 10⁶ < 2²⁰, so a touch ≥ 20 half-lives old
   * would otherwise shift to weight 0, and a conversion whose touches
   * are ALL that old (reachable whenever lookbackSec ≥
   * 20·halfLifeSec) would divide by Σw = 0 — NULL credit, silently
   * breaking conservation. Floored, such a conversion degrades to the
   * linear split, which is the right asymptotic answer anyway.
   *
   * Same scale shape as [[attribution]]: the shared descending-time
   * assignment window, one per-conversion weight window, one
   * channel-sized aggregate. Output: (event_type, n_touches,
   * decay_ppm).
   */
  def attributionDecay(events: DataFrame, userCol: String, tsecCol: String,
                       typeCol: String, idCol: String, convType: String,
                       lookbackSec: Long, halfLifeSec: Long): DataFrame = {
    require(halfLifeSec >= 1, s"attributionDecay halfLifeSec=$halfLifeSec")
    val attributed = attributedTouches(events, userCol, tsecCol, typeCol,
      idCol, convType, lookbackSec)
    val convW = Window.partitionBy(col("user"), col("nc.c_id"))
    val credited = attributed
      .withColumn("w", expr(
        "greatest(shiftright(cast(1000000 as bigint), " +
          s"cast(least((nc.c_ts - ts) div $halfLifeSec, 62) as int)), " +
          "cast(1 as bigint))"))
      .withColumn("sw", sum(col("w")).over(convW))
      .withColumn("base", IntDiv(col("w") * 1000000L, col("sw")))
      .withColumn("tkey", struct(col("ts"), col("eid")))
      .withColumn("decay_ppm",
        col("base") + when(col("tkey") === max(col("tkey")).over(convW),
          lit(1000000L) - sum(col("base")).over(convW)).otherwise(0L))
    credited.groupBy(col("etype").as("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("decay_ppm")).as("decay_ppm"))
  }
}

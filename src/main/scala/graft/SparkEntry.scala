package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2 (plus the training-data-pipeline extensions), each with an
 * equivalent DuckDB oracle over the same parquet tables.
 *
 * The graphite operators run over a metric stream synthesized
 * deterministically from the `events` table (path/value/time/version
 * derived per-row with engine-portable expressions), so the oracle can
 * state the expected result in plain SQL while the Spark side exercises
 * the real pipeline (parse -> normalize -> expand -> dedup -> rollup).
 */
object SparkEntry {

  // fixed "now" for deterministic receive-time/drop-window semantics
  private val NowSec = 1706745600L // 2024-02-01T00:00:00Z

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * events with an epoch-seconds `time` column, robust to how the session
   * surfaces the parquet timestamp column: long nanos (TIMESTAMP(NANOS)
   * under spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP_NTZ (micros,
   * which ANSI mode refuses to cast straight to long — route through
   * TIMESTAMP; the session timezone is UTC so the instant is unchanged),
   * or plain TIMESTAMP.
   */
  private def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val ev = table(s, dir, "events")
    val t = ev.schema("ts").dataType match {
      case LongType         => expr("ts div 1000000000")
      case TimestampNTZType => col("ts").cast("timestamp").cast("long")
      case _                => col("ts").cast("long")
    }
    ev.withColumn("tsec", t)
  }

  /**
   * Synthesized metric stream: one point per event.
   * path = evt.<event_type>.u<user_id%10>.<sum|min|max|value>,
   * time = epoch seconds, version = event_id.
   */
  private def metricStream(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      concat(
        lit("evt."), col("event_type"), lit(".u"), col("user_id") % 10, lit("."),
        when(col("user_id") % 4 === 0, "sum")
          .when(col("user_id") % 4 === 1, "min")
          .when(col("user_id") % 4 === 2, "max")
          .otherwise("value")).as("path"),
      col("value"),
      col("tsec").as("time"),
      col("event_id").as("version"))

  /** The same stream rendered as plaintext protocol lines. */
  private def metricLines(s: SparkSession, dir: String): DataFrame =
    metricStream(s, dir).select(
      concat_ws(" ", col("path"), col("value").cast("string"), col("time").cast("string")).as("line"))

  /** Shared oracle CTE matching metricStream. */
  private val OracleM =
    """WITH m AS (
      |  SELECT 'evt.' || event_type || '.u' || (user_id % 10) || '.' ||
      |         CASE user_id % 4 WHEN 0 THEN 'sum' WHEN 1 THEN 'min'
      |                          WHEN 2 THEN 'max' ELSE 'value' END AS path,
      |         value,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS "time",
      |         event_id AS version
      |  FROM events)""".stripMargin

  private def withDate(df: DataFrame): DataFrame = GraphiteOps.withDate(df)

  // ======================= flagship =======================

  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ======================= queries =======================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- graphite: ingest pipeline (SURVEY §2.2/§2.3/§2.6) ----

    "g_points" -> ((s, dir) => {
      // full receive path: plaintext line -> parse -> normalize -> points
      val pts = GraphiteOps.parseLines(metricLines(s, dir), "line", NowSec)
      GraphiteOps.points(pts, zeroTimestamp = true)
        .orderBy("path", "time", "value")
    }),

    "g_points_reverse" -> ((s, dir) => {
      val pts = GraphiteOps.parseLines(metricLines(s, dir), "line", NowSec)
      GraphiteOps.points(pts, reverse = true, zeroTimestamp = true)
        .orderBy("path", "time", "value")
    }),

    "g_drop_filters" -> ((s, dir) => {
      val pts = withDate(metricStream(s, dir))
      GraphiteOps.dropFilters(pts, NowSec,
          dropFutureSec = Some(7L * 86400), dropPastSec = Some(7L * 86400),
          maxNameLen = Some(20))
        .select("path", "time", "value")
        .orderBy("path", "time", "value")
    }),

    "g_blacklist" -> ((s, dir) => {
      val bl = new Blacklist(Seq("evt.error.*.*", "*.*.u0.*"))
      val pts = withDate(metricStream(s, dir))
      GraphiteOps.points(pts, blacklist = Some(bl), zeroTimestamp = true)
        .select("path").distinct().orderBy("path")
    }),

    // ---- graphite: expansions (SURVEY §2.5) ----

    "g_index" -> ((s, dir) => {
      val pts = withDate(metricStream(s, dir))
      GraphiteOps.indexExpand(pts).orderBy("date", "level", "path")
    }),

    "g_tagged" -> ((s, dir) => {
      val tagged = events(s, dir).select(
        concat(lit("evt."), col("event_type"), lit("?env=prod&zone=u"), col("user_id") % 10).as("path"),
        col("tsec").as("time"))
      GraphiteOps.taggedExpand(withDate(tagged))
        .select(col("date"), col("tag1"), col("path"), array_join(col("tags"), ",").as("tags_csv"))
        .orderBy("date", "tag1", "path")
    }),

    "g_tree" -> ((s, dir) => {
      // legacy graphite-web tree table type (uploader/tree.go)
      val pts = withDate(metricStream(s, dir))
      GraphiteOps.treeExpand(pts).orderBy("date", "level", "path")
    }),

    "g_series" -> ((s, dir) => {
      // legacy series passthrough type (uploader/series.go)
      val pts = withDate(metricStream(s, dir))
      GraphiteOps.seriesExpand(pts).orderBy("date", "level", "path")
    }),

    "g_series_reverse" -> ((s, dir) => {
      val pts = withDate(metricStream(s, dir))
      GraphiteOps.seriesExpand(pts, reverse = true).orderBy("date", "level", "path")
    }),

    "g_tagged_ignored" -> ((s, dir) => {
      // ignored-tagged-metrics: listed names emit ONLY the __name__ row
      // (README.md:172-183, uploader/tagged.go:145-147)
      val tagged = events(s, dir).select(
        concat(lit("evt."), col("event_type"), lit("?env=prod&zone=u"), col("user_id") % 10).as("path"),
        col("tsec").as("time"))
      GraphiteOps.taggedExpand(withDate(tagged), ignoredMetrics = Set("evt.purchase"))
        .select(col("date"), col("tag1"), col("path"), array_join(col("tags"), ",").as("tags_csv"))
        .orderBy("date", "tag1", "path")
    }),

    // ---- graphite: query-side semantics (SURVEY §2.4) ----

    "g_lww" -> ((s, dir) => {
      // ReplacingMergeTree(Version) read view: last write wins per series-hour
      val pts = metricStream(s, dir)
        .withColumn("bucket", col("time") - col("time") % 3600)
      GraphiteOps.lwwLatest(pts, Seq("path", "bucket"), "version", Seq("value"))
        .select(col("path"), col("bucket"), round(col("value"), 4).as("value"), col("version"))
        .orderBy("path", "bucket")
    }),

    "g_rollup" -> ((s, dir) => {
      val cfg = Rollup.Config(
        rules = Seq(
          Rollup.Rule("""\.sum$""".r, Rollup.Sum, Seq(Rollup.Retention(0, 3600))),
          Rollup.Rule("""\.min$""".r, Rollup.Min, Seq(Rollup.Retention(0, 3600))),
          Rollup.Rule("""\.max$""".r, Rollup.Max, Seq(Rollup.Retention(0, 3600)))),
        default = Rollup.Rule("""^""".r, Rollup.Avg, Seq(Rollup.Retention(0, 3600))))
      GraphiteOps.rollup(metricStream(s, dir), cfg, NowSec)
        .select(col("path"), col("time"), round(col("value"), 4).as("value"), col("points"))
        .orderBy("path", "time")
    }),

    "g_rollup_multi" -> ((s, dir) => {
      // multi-retention rollup: age >= 3 days -> 1 h precision, else 1 min
      // (rollup.xml age->precision buckets)
      val rets = Seq(Rollup.Retention(0, 60), Rollup.Retention(259200, 3600))
      val cfg = Rollup.Config(
        rules = Seq(
          Rollup.Rule("""\.sum$""".r, Rollup.Sum, rets),
          Rollup.Rule("""\.min$""".r, Rollup.Min, rets),
          Rollup.Rule("""\.max$""".r, Rollup.Max, rets)),
        default = Rollup.Rule("""^""".r, Rollup.Avg, rets))
      GraphiteOps.rollup(metricStream(s, dir), cfg, NowSec)
        .select(col("path"), col("time"), round(col("value"), 4).as("value"), col("points"))
        .orderBy("path", "time")
    }),

    // ---- graphite: find/lookup API (index scans) ----

    "g_find_prefix" -> ((s, dir) => {
      val idx = GraphiteOps.indexExpand(withDate(metricStream(s, dir)))
        .filter(col("level") < 10000) // daily direct rows
      GraphiteOps.findPrefix(idx, "evt.purchase.")
        .orderBy("date", "level", "path")
    }),

    "g_find_suffix" -> ((s, dir) => {
      // suffix query routed through the reverse index (prefix-prunable scan)
      val revIdx = withDate(metricStream(s, dir))
        .select(GraphiteOps.pathReverse(col("path")).as("path")).distinct()
      GraphiteOps.findSuffix(revIdx, ".sum").select("path").orderBy("path")
    }),

    "g_find_glob" -> ((s, dir) => {
      // graphite-web style glob find: literal head prefix-prunes, the
      // glob regex filters survivors
      val idx = GraphiteOps.indexExpand(withDate(metricStream(s, dir)))
        .filter(col("level") < 10000) // daily direct rows
      // u{2,4}: even user buckets, so the sum/max suffixes actually
      // occur (u3 would be vacuous — odd user_id can't hit %4 in {0,2})
      GraphiteOps.findGlob(idx, "evt.*.u{2,4}.{sum,max}")
        .orderBy("date", "level", "path")
    }),

    "g_find_tag" -> ((s, dir) => {
      val tagged = events(s, dir).select(
        concat(lit("evt."), col("event_type"), lit("?env=prod&zone=u"), col("user_id") % 10).as("path"),
        col("tsec").as("time"))
      GraphiteOps.findByTag(GraphiteOps.taggedExpand(withDate(tagged)), "zone", "u3")
        .select("path").distinct().orderBy("path")
    }),

    "g_find_multitag" -> ((s, dir) => {
      // seriesByTag('env=prod','zone=u3') AND semantics: env varies by
      // event_id parity, zone by user bucket, so the intersection is a
      // real subset of either matcher alone
      val tagged = events(s, dir).select(
        concat(lit("evt."), col("event_type"),
          lit("?env="), when(col("event_id") % 2 === 0, "prod").otherwise("staging"),
          lit("&zone=u"), col("user_id") % 10).as("path"),
        col("tsec").as("time"))
      GraphiteOps.findByTags(GraphiteOps.taggedExpand(withDate(tagged)),
          Seq("env" -> "prod", "zone" -> "u3"))
        .select("path").distinct().orderBy("path")
    }),

    "g_find_tagspecs" -> ((s, dir) => {
      // full matcher grammar: = routes, =~ admits u3|u4, != prunes u4
      val tagged = events(s, dir).select(
        concat(lit("evt."), col("event_type"),
          lit("?env="), when(col("event_id") % 2 === 0, "prod").otherwise("staging"),
          lit("&zone=u"), col("user_id") % 10).as("path"),
        col("tsec").as("time"))
      GraphiteOps.findByTagSpecs(GraphiteOps.taggedExpand(withDate(tagged)),
          Seq("env=prod", "zone=~u[34]", "zone!=u4"))
        .select("path").distinct().orderBy("path")
    }),

    // ---- graphite: scalar kernels as columns ----

    "g_path_kernels" -> ((s, dir) => {
      val raw = table(s, dir, "events")
        .select(concat(lit("evt.."), col("event_type"), lit("..u"), col("user_id") % 10).as("raw"))
        .distinct()
      raw.select(
          col("raw"),
          GraphiteOps.removeDoubleDot(col("raw")).as("clean"),
          GraphiteOps.pathReverse(GraphiteOps.removeDoubleDot(col("raw"))).as("rev"),
          GraphiteOps.pathLevel(GraphiteOps.removeDoubleDot(col("raw"))).as("level"))
        .orderBy("raw")
    }),

    "g_json_fields" -> ((s, dir) => {
      // telegraf-style JSON field extraction from the props column
      table(s, dir, "events")
        .filter(col("props").rlike("\"k\": (\\d+)"))
        .select(col("event_id"), regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .filter(col("k") % 7 === 0)
        .orderBy("event_id")
    }),

    // ---- relational core ----

    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q25_salted_join" -> ((s, dir) => {
      // explicit skew salting: lineitem spread over 8 sub-keys of
      // l_partkey, part replicated 8x — row-identical to the plain
      // join, but no reducer ever owns a hot part alone
      val li = table(s, dir, "lineitem").withColumnRenamed("l_partkey", "pk")
      val pt = table(s, dir, "part").withColumnRenamed("p_partkey", "pk")
      JoinOps.saltedJoin(li, pt, "pk", col("l_orderkey"), salt = 8)
        .groupBy("p_brand")
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_cents"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    "q32_profile" -> ((s, dir) =>
      // one-scan numeric profile of lineitem's measure columns:
      // counts, min/max, exact quantized mean, KMV distinct estimate
      SketchOps.numericProfile(table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("column")),

    "q26_kmv_overlap" -> ((s, dir) =>
      // pre-join cardinality planning: KMV sketches of o_custkey and
      // c_custkey, union by min-set merge, intersection by
      // inclusion-exclusion — join sizing without the join
      SketchOps.kmvOverlap(table(s, dir, "orders"), "o_custkey",
        table(s, dir, "customer"), "c_custkey", k = 256)),

    "q33_no_orders" -> ((s, dir) =>
      // LEFT ANTI coverage: churn — customers with no order since
      // 2000; the anti side is pre-filtered so the NOT EXISTS probe
      // carries only recent keys
      table(s, dir, "customer")
        .join(table(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
        .orderBy("c_custkey")),

    "q36_late_ship" -> ((s, dir) =>
      // LEFT SEMI with a correlated residual (the TPC-H Q4 shape):
      // orders in the 1995 window having ANY lineitem shipped more
      // than 90 days after the order date, counted by priority. The
      // date window pushes to the orders scan; the semi join carries
      // only (orderkey, two dates) and keeps each order once however
      // many lineitems are late
      table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .join(table(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    "g_gaps" -> ((s, dir) =>
      // per-series gap detection: sampling holes longer than 1h —
      // the missing-data monitor every metrics pipeline needs
      SeriesOps.gaps(metricStream(s, dir), minGapSec = 3600L)
        .orderBy("path", "gap_start")),

    "q31_shipping_priority" -> ((s, dir) => {
      // the TPC-H Q3 shape: selective filters on both join sides,
      // three-way join, revenue agg, global top-10 — the classic
      // join-order + TakeOrderedAndProject exercise
      val c = table(s, dir, "customer").filter(col("c_nationkey") < 5)
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q34_local_supplier" -> ((s, dir) => {
      // the TPC-H Q5 shape: six-table star with REGION->NATION pruning
      // the dims before they broadcast, the customer=supplier
      // same-nation constraint as a post-join filter, one-year window,
      // integer-cents revenue — the join-order stress next to Q3's
      val asia = table(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = table(s, dir, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val c = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name").asc)
    }),

    "q35_market_share" -> ((s, dir) => {
      // the TPC-H Q8 shape: per-year national market share inside a
      // region for one part type — a selective dim (PROMO parts)
      // pruning the fact scan, every dim broadcast, then a year-window
      // share over the year-count aggregate (integer ppm)
      val europe = table(s, dir, "region").filter(col("r_name") === "EUROPE")
      val n = table(s, dir, "nation")
        .join(broadcast(europe), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val p = table(s, dir, "part").filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val o = table(s, dir, "orders").select("o_orderkey", "o_orderdate")
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      val byNation = li
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          col("n_name").as("nation"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("revenue_cents"))
      val win = org.apache.spark.sql.expressions.Window.partitionBy("o_year")
      byNation
        .withColumn("share_ppm",
          IntDiv(col("revenue_cents") * 1000000L,
            sum(col("revenue_cents")).over(win)).cast("long"))
        .orderBy("o_year", "nation")
    }),

    "t_fertility" -> ((s, dir) =>
      // tokenizer-fairness audit: chars and BPE-ish subwords per
      // whitespace word, by language, in exact ppm
      TextOps.fertilityAudit(table(s, dir, "documents"), "lang", "text")
        .orderBy("group")),

    "q2_join_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("n_name")
    }),

    "q3_window_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rnk")
    }),

    "q4_sort_limit" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    }),

    "q5_setop" -> ((s, dir) => {
      val withOrders = table(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val nearby = table(s, dir, "customer").filter(col("c_nationkey") < 5)
        .select(col("c_custkey").as("custkey"))
      withOrders.intersect(nearby).orderBy("custkey")
    }),

    "q6_grouping" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q7_events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy((col("tsec") - col("tsec") % 3600).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
        .orderBy("hour_ts", "event_type")
    }),

    "q8_new_series" -> ((s, dir) => {
      // exists-cache semantics: how many series are first seen each day
      // (what the cross-chunk exists-cache admits per day). One scan, two
      // shuffles: per-path min(date), then per-day count. (The previous
      // "paths new on the newest day" phrasing was vacuously empty on
      // this corpus — every path spans every day — so its oracle checked
      // nothing.)
      val perPath = withDate(metricStream(s, dir))
        .groupBy("path")
        .agg(min("date").as("first_date"))
      perPath.groupBy("first_date")
        .agg(count(lit(1)).as("new_series"))
        .orderBy("first_date")
    }),

    "q15_quantile_grid" -> ((s, dir) =>
      // global p50/p90/p99/p999 from a 1e-3-grid histogram: the
      // no-global-sort percentile path, exact to ±grid, mergeable
      SketchOps.gridQuantiles(events(s, dir), "value",
          Seq(0.5, 0.9, 0.99, 0.999), grid = 0.001)
        .orderBy("p")),

    "q16_retention" -> ((s, dir) =>
      // daily cohort retention matrix: first-active-day cohorts x
      // day offsets, retained fraction vs cohort size — one distinct
      // over (user, day), everything after is user-sized
      EventOps.retention(events(s, dir), "user_id", "tsec", periodSec = 86400L)
        .orderBy("cohort", "offset")),

    "q17_pagerank" -> ((s, dir) => {
      // 3-round integer-quantized PageRank on the undirected
      // user <-> event_type bipartite graph
      val fwd = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("e"), col("event_type")).as("dst"))
        .distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.pageRank(edges, iterations = 3).orderBy("node")
    }),

    "q19_hits" -> ((s, dir) => {
      // HITS on the DIRECTED user -> event_type graph, 2 rounds:
      // which activity types does important usage point at
      val fwd = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("e"), col("event_type")).as("dst"))
        .distinct()
      GraphOps.hits(fwd, iterations = 2).orderBy("side", "node")
    }),

    "q18_ppr" -> ((s, dir) => {
      // personalized PageRank seeded on the event-type nodes: user
      // affinity to the activity vocabulary, zero for the unreachable
      val fwd = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("e"), col("event_type")).as("dst"))
        .distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("node"))
        .filter(col("node").startsWith("e")).distinct()
      GraphOps.personalizedPageRank(edges, seeds, iterations = 3).orderBy("node")
    }),

    "q20_interval_join" -> ((s, dir) => {
      // spike-neighborhood counts: for each high-value event, how many
      // same-type events landed within +/-30 min — a theta join
      // executed as a bucket-expansion EQUI join (thresholds pick 172
      // windows incl. 9 empty ones, so the left-join zero path is
      // driver-checked)
      val e = events(s, dir)
      val windows = e.filter(col("value") >= 200)
        .select(col("event_id").as("win_id"), col("event_type").as("key"),
          (col("tsec") - 1800L).as("lo"), (col("tsec") + 1800L).as("hi"))
      val base = e.select(col("event_id").as("id"),
        col("event_type").as("key"), col("tsec"))
      EventOps.intervalJoinCount(windows, base, bucketSec = 3600L)
        .orderBy("win_id")
    }),

    "q21_lpa" -> ((s, dir) => {
      // 3-round deterministic label propagation on the undirected
      // user <-> event_type bipartite graph: plurality label,
      // min-label tie-break — the community detector of the
      // iterate-until-k family
      val fwd = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("e"), col("event_type")).as("dst"))
        .distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.labelPropagation(edges, iterations = 3).orderBy("node")
    }),

    "q22_triangles" -> ((s, dir) =>
      // degree-oriented exact triangle counts on the banded
      // (user % 997) <-> (user + k) % 997 graph from event props
      GraphOps.triangleParticipation(events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst")))
        .orderBy("node")),

    "q37_link_pred" -> ((s, dir) => {
      // structural link prediction on the sparse banded co-occurrence
      // graph: every NON-edge sharing >= 10 neighbors scored with the
      // exact common-neighbor / Jaccard-ppm / preferential-attachment
      // triple; hub cap 500 is the scale guard (no wedge center opens
      // more than 500² pairs — the stop-hub rule)
      val e = events(s, dir).select(
          (col("user_id") % 9973).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 9973)
            .as("dst"))
      GraphOps.linkPrediction(e, minCommon = 10L, maxHubDeg = 500L)
        .orderBy("node_a", "node_b")
    }),

    "q38_kcore" -> ((s, dir) => {
      // 4 fixed rounds of 50-core peeling on the banded graph: the
      // dense-interaction backbone (at sf0.01 the peel cascades every
      // round — deleting a node lowers its neighbors' degrees — which
      // is exactly what the fixed-round contract pins on both engines)
      val e = events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst"))
      GraphOps.kCore(e, k = 50L, rounds = 4).orderBy("node")
    }),

    "q42_modularity" -> ((s, dir) => {
      // the community-quality gauge composed on q21's partition: run
      // the same 3-round deterministic LPA on the bipartite graph,
      // then score it — exact rational Q over 4m², floored q_milli.
      // Reading Q is how you decide the labels are worth trusting
      val fwd = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("e"), col("event_type")).as("dst"))
        .distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      val labels = GraphOps.labelPropagation(edges, iterations = 3)
      GraphOps.modularity(edges, labels)
    }),

    "q44_rfm" -> ((s, dir) =>
      // RFM quintile segmentation: exact integer ntile arithmetic
      // with explicit user-id tie-breaks on all three axes
      EventOps.rfmSegments(events(s, dir), "user_id", "tsec", "value")
        .orderBy("user_id")),

    "q45_markov" -> ((s, dir) =>
      // first-order event-type transition matrix with ppm shares —
      // per-user sequences ordered by (tsec, event_id)
      EventOps.markovTransitions(events(s, dir), "user_id", "tsec",
          "event_type", "event_id")
        .orderBy("from_type", "to_type")),

    "q43_components" -> ((s, dir) => {
      // hash-min connected components on a 7-sharded bipartite graph
      // (event-type nodes split by user_id % 7, so the graph genuinely
      // decomposes); 4 propagation rounds, oracle replays the same
      // unrolled rounds
      val fwd = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("e"), col("event_type"), lit("_"), col("user_id") % 7).as("dst"))
        .distinct()
      GraphOps.connectedComponents(fwd, rounds = 4).orderBy("node")
    }),

    "q49_dwell" -> ((s, dir) => {
      // dwell-time analytics: the gap to each user's NEXT event is the
      // time spent in the CURRENT event's state; per event type, gap
      // count, integer milli mean, and a 10s/60s/600s histogram — the
      // engagement profile funnels and retention read from
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        col("tsec"), col("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("tsec").asc, col("event_id").asc)
      val gaps = e.withColumn("nxt", lead(col("tsec"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("gap", col("nxt") - col("tsec"))
      gaps.groupBy("event_type").agg(
          count(lit(1)).as("n_gaps"),
          IntDiv(sum(col("gap")) * 1000L, count(lit(1))).cast("long").as("mean_gap_milli"),
          sum(when(col("gap") < 10, 1L).otherwise(0L)).as("lt_10s"),
          sum(when(col("gap") >= 10 && col("gap") < 60, 1L).otherwise(0L)).as("s10_60"),
          sum(when(col("gap") >= 60 && col("gap") < 600, 1L).otherwise(0L)).as("s60_600"),
          sum(when(col("gap") >= 600, 1L).otherwise(0L)).as("ge_600s"))
        .orderBy("event_type")
    }),

    "q51_degree_hist" -> ((s, dir) => {
      // the CCDF curve under q48's exponent: one row per occurring
      // degree with exact ppm P(D >= deg) — never trust an alpha
      // without the curve it summarizes (CSN's own rule)
      val e = events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst"))
      GraphOps.degreeHistogram(e).orderBy("deg")
    }),

    "q50_richclub" -> ((s, dir) => {
      // rich-club curve phi(k) over the banded graph: do the hubs
      // interconnect (phi rises with k) or stay spokes — read next to
      // q48's exponent before trusting any hub-cap plan
      val e = events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst"))
      GraphOps.richClub(e, Seq(2L, 4L, 8L, 16L)).orderBy("k")
    }),

    "q48_powerlaw" -> ((s, dir) => {
      // Clauset-style power-law MLE over the banded graph's degree
      // distribution: one row, alpha in milli from micro-quantized
      // logs (integer sum — partitioning-order-free); the topology
      // fingerprint read before trusting hub caps
      val e = events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst"))
      GraphOps.powerLawFit(e, dMin = 2L)
    }),

    "q52_hyperball" -> ((s, dir) => {
      // HyperBall harmonic centrality over the SAME skip-chain graph
      // as q47 — the unbounded-radius HLL-neighborhood form: per-node
      // state is <= 2^p registers regardless of degree, each round is
      // one edge x register shuffle; ball estimates and the harmonic
      // delta fold replay register-for-register in the oracle
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallHarmonic(e1.union(e2), rounds = 3).orderBy("node")
    }),

    "q66_betweenness" -> ((s, dir) => {
      // pivot-sampled Brandes betweenness over the SAME skip-chain
      // graph as q47/q52: exact BFS + integer dependency accumulation
      // from the 16 md5-ranked pivot sources, distance-bounded at 3 —
      // bridge users (the +16 skip landing points) carry the mass,
      // chain interiors read low, leaves read zero
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.betweennessPivots(e1.union(e2), radius = 3, pivots = 16)
        .orderBy("node")
    }),

    "q54_ktruss" -> ((s, dir) => {
      // 4-truss peeling over the banded graph: drop edges in < 2
      // triangles of the current subgraph, 3 rounds — the community
      // core that survives where k-core still keeps link-farm stars;
      // support recomputed on the final subgraph (0 rows are visible
      // non-convergence, never silent)
      val e = events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst"))
      GraphOps.kTruss(e, k = 4, rounds = 3).orderBy("a", "b")
    }),

    "q60_attribution" -> ((s, dir) =>
      // multi-touch attribution: each touch credits the user's NEXT
      // purchase within a 1-hour lookback; first/last/linear models
      // split each conversion's 1e6 ppm exactly (remainder to the
      // last touch). One descending-time window, no range join.
      EventOps.attribution(events(s, dir), "user_id", "tsec",
          "event_type", "event_id", convType = "purchase",
          lookbackSec = 3600L)
        .orderBy("event_type")),

    "q63_attribution_position" -> ((s, dir) =>
      // U-shaped 40/20/40 attribution: discovery and closer take 40%
      // each, middles share 20%; one touch takes all, two split 50/50,
      // middle remainder to the last touch (exact conservation)
      EventOps.attributionPosition(events(s, dir), "user_id", "tsec",
          "event_type", "event_id", convType = "purchase",
          lookbackSec = 3600L)
        .orderBy("event_type")),

    "q62_attribution_decay" -> ((s, dir) =>
      // time-decay attribution: weights halve per 15-minute half-life
      // bucket (integer 2^-x — no libm pow), credit w*1e6 div sum(w)
      // per conversion, remainder to the last touch
      EventOps.attributionDecay(events(s, dir), "user_id", "tsec",
          "event_type", "event_id", convType = "purchase",
          lookbackSec = 3600L, halfLifeSec = 900L)
        .orderBy("event_type")),

    "q58_reach_out" -> ((s, dir) => {
      // DIRECTED HyperBall on the skip-chain graph, out-balls: per
      // node, how much of the graph it REACHES within 3 hops and the
      // harmonic fold over directed distances — the same register
      // machinery as q52 with the symmetrizing union dropped. Chain
      // heads reach far (big ball), chain tails reach nothing but
      // themselves — the asymmetry the undirected rows can't see.
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallHarmonicDirected(e1.union(e2), rounds = 3,
          direction = "out")
        .orderBy("node")
    }),

    "q59_reach_in" -> ((s, dir) => {
      // the transpose: per node, how much of the graph REACHES it in
      // <= 3 hops — the centrality orientation (Boldi-Vigna run
      // harmonic on incoming paths); same recurrence on the reversed
      // edge set, so out/in together price both sides of every chain
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallHarmonicDirected(e1.union(e2), rounds = 3,
          direction = "in")
        .orderBy("node")
    }),

    "q64_reach_profile" -> ((s, dir) => {
      // directed ball profile (out): per node, the 3-hop reach, the
      // median forward distance, and the total-distance mass — the
      // per-node "how far does my reach extend" numbers the q58
      // neighborhood summary aggregates away
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallProfileDirected(e1.union(e2), rounds = 3,
          direction = "out")
        .orderBy("node")
    }),

    "q65_lin_in" -> ((s, dir) => {
      // directed Lin's index, IN orientation: reach-weighted closeness
      // over who-can-get-here distances — the authority reading next
      // to q61's undirected form; chain tails score high (big
      // audience), chain heads fall to the isolated convention
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallLinDirected(e1.union(e2), rounds = 3,
          direction = "in")
        .orderBy("node")
    }),

    "q61_lin_closeness" -> ((s, dir) => {
      // Lin's index over the skip-chain graph: |B|^2/sum-dist from the
      // q56 register state — the closeness that rewards REACH (classic
      // 1/sum-dist lets a 2-node island beat the giant component's
      // center); sum_dist=0 nodes take Lin's defined value 1
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallLin(e1.union(e2), rounds = 3).orderBy("node")
    }),

    "q56_ball_profile" -> ((s, dir) => {
      // per-node distance profile from the HyperBall state: final
      // ball, median distance (smallest t holding half the final
      // mass), and the closeness denominator sum t*delta — one extra
      // window finisher over the q52 register recurrence
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallProfile(e1.union(e2), rounds = 3).orderBy("node")
    }),

    "q53_neighborhood" -> ((s, dir) => {
      // the neighborhood function N(t) over the q47 skip-chain graph
      // via the HyperBall registers: rounds+1 rows of reachable-pair
      // mass, cumulative ppm, and the >=90% flag whose first true row
      // is the effective diameter — the sizing read before unrolling
      // any fixed-round graph plan
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.hyperBallNeighborhood(e1.union(e2), rounds = 4).orderBy("t")
    }),

    "q47_harmonic" -> ((s, dir) => {
      // radius-3 harmonic centrality over a bounded-degree skip-chain
      // graph (u->u+1 within 64-blocks, u->u+16 skips): exact integer
      // milli sum of 1000/d at true min distance; the small-radius
      // auditable form of HyperBall-style neighborhood centrality
      val users = events(s, dir).select(col("user_id")).distinct()
      val uDst = users.select(col("user_id").as("dst"))
      val e1 = users.filter(col("user_id") % 64 =!= 63)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(uDst, Seq("dst"))
      val e2 = users.filter(col("user_id") % 64 < 48)
        .select(col("user_id").as("src"), (col("user_id") + 16).as("dst"))
        .join(uDst, Seq("dst"))
      GraphOps.harmonicCentrality(e1.union(e2), radius = 3).orderBy("node")
    }),

    "q46_components_stars" -> ((s, dir) => {
      // components by ALTERNATING star contraction on a long-chain
      // graph (consecutive user ids within 32-blocks): diameter 31,
      // where q43's hash-min would need 31 rounds — stars converge in
      // ~log₂ rounds to the EXACT fixpoint, so the oracle is true
      // min-label components (recursive CTE), not a round replay
      val users = events(s, dir).select(col("user_id")).distinct()
      val edges = users
        .filter(col("user_id") % 32 =!= 31)
        .select(col("user_id").as("src"), (col("user_id") + 1).as("dst"))
        .join(users.select(col("user_id").as("dst")), Seq("dst"))
      GraphOps.componentsStars(edges).orderBy("node")
    }),

    "q41_cocitation_rank" -> ((s, dir) => {
      // the full link-graph pipeline in one query: planted URLs ->
      // host edges -> bipartite projection (host co-citation with
      // shared-doc WEIGHTS, stop-hub capped) -> weighted integer
      // PageRank. Authority now follows citation VOLUME: a host
      // co-cited by many docs outranks a once-cited one even at
      // equal degree — the step q39's unweighted walk cannot see
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" https://h"), col("doc_id") % 23,
          lit(".example.net/p http://h"), expr("doc_id div 3") % 23,
          lit(".example.net/q")).as("text"))
      val he = TextOps.hostEdges(planted, "doc_id", "text")
        .select(col("doc_id").as("left"), col("host").as("right"))
      val co = GraphOps.bipartiteProject(he, maxLeftDeg = 100L)
      val edges = co.select(col("node_a").as("src"), col("node_b").as("dst"), col("w"))
        .union(co.select(col("node_b").as("src"), col("node_a").as("dst"), col("w")))
      GraphOps.weightedPageRank(edges, iterations = 3).orderBy("node")
    }),

    "q40_assortativity" -> ((s, dir) => {
      // degree assortativity of the banded graph: exact rational
      // Pearson over both edge orientations (the symmetric convention
      // collapses the square root), one LONG row + floored r_milli
      val e = events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst"))
      GraphOps.assortativity(e)
    }),

    "s_jl_project" -> ((s, dir) =>
      // Johnson-Lindenstrauss sign projection composed on the SQ8
      // codes: 64 -> 16 dims, every output an exact LONG; the sign
      // matrix is md5-parity of the coordinates — seedless, shared
      // with the oracle
      SimilarityOps.jlProject(table(s, dir, "embeddings"), "vec_id", "embedding",
          outDims = 16)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "j")),

    "q27_zorder" -> ((s, dir) =>
      // Morton layout key over (user bucket, time bucket): the
      // two-dimensional data-skipping sort key
      events(s, dir).select(col("event_id"),
          (col("user_id") % 1024).as("xb"),
          (col("tsec") % 1024).as("yb"))
        .withColumn("zkey", LayoutOps.zorderKey2(col("xb"), col("yb"), bits = 10))
        .orderBy("event_id")),

    "s_mrl_audit" -> ((s, dir) =>
      // Matryoshka truncation audit: cosine survival of the first 32
      // of 64 dims, per label — the index-shrink go/no-go
      SimilarityOps.truncationAudit(table(s, dir, "embeddings"), "vec_id",
          "embedding", "label", keepDims = 32)
        .orderBy("label")),

    "q28_pivot" -> ((s, dir) =>
      // relational pivot: event counts per (hour-of-day x event_type)
      // with an explicit column list so the shape is static
      events(s, dir)
        .select((floor(col("tsec") / 3600) % 24).cast("long").as("hour"),
          col("event_type"))
        .groupBy("hour")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("hour")),

    "q29_transitions" -> ((s, dir) => {
      // first-order Markov transitions between consecutive events per
      // user ((time, event_id)-ordered); integer micro probabilities
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("tsec").asc, col("event_id").asc)
      val pairs = events(s, dir)
        .select(col("user_id"), col("tsec"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
      val totals = pairs.groupBy("from_type").agg(sum(col("cnt")).as("row_total"))
      pairs.join(totals, "from_type")
        .select(col("from_type"), col("to_type"), col("cnt"),
          graft.operators.IntDiv(col("cnt") * lit(1000000L), col("row_total"))
            .cast("long").as("p_micro"))
        .orderBy("from_type", "to_type")
    }),

    "q23_clustering" -> ((s, dir) =>
      // local clustering coefficient (integer micro units) on the same
      // graph: community density vs hub spray at equal connectivity
      GraphOps.clusteringCoefficient(events(s, dir).select(
          (col("user_id") % 997).as("src"),
          ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997)
            .as("dst")))
        .orderBy("node")),

    "q24_winsorize" -> ((s, dir) =>
      // per-type [p5, p95] winsorization of event values — exact
      // interpolated band, clip keeps the row and bounds its leverage
      EventOps.winsorize(events(s, dir), "event_id", "event_type", "value",
          pLo = 0.05, pHi = 0.95)
        .orderBy("event_id")),

    "p_distinct_kmv" -> ((s, dir) =>
      // KMV distinct sketch per lang; k=72 straddles the group sizes so
      // BOTH branches are driver-checked: de(70)/fr(64) take the exact
      // n_seen<k path, en/es/zh the (k-1)/(kth/2^60) estimate path
      SketchOps.distinctSketch(table(s, dir, "documents"),
          Seq("lang"), "text", k = 72)
        .orderBy("lang")),

    "p_freq_cms" -> ((s, dir) => {
      // count-min sketch (3x16 — deliberately narrower than the 31-token
      // vocabulary so collisions are real and the min-of-rows path is
      // exercised) point estimates for the probe docs' tokens, alongside
      // exact counts — est_n >= exact_n always, and the driver check
      // replays the identical salted-md5 sketch
      val docs = table(s, dir, "documents")
      val occ = docs.select(explode(TextOps.words(lower(col("text")))).as("token"))
      val probes = docs.filter(col("doc_id") % 100 === 0)
        .select(explode(TextOps.words(lower(col("text")))).as("token"))
      val est = SketchOps.cmsEstimates(occ, "token", probes, depth = 3, width = 16)
      val exact = occ.groupBy("token").agg(count(lit(1)).as("exact_n"))
      est.join(exact, "token")
        .select(col("token"), col("exact_n"), col("est_n"),
          (col("est_n") - col("exact_n")).as("overcount"))
        .orderBy("token")
    }),

    "q9_sessions" -> ((s, dir) =>
      // gap-based sessionization (30 min): session_window in a plain
      // groupBy — same declaration runs under Structured Streaming
      EventOps.sessionize(events(s, dir), "user_id", "tsec", gapSec = 1800L, "value")
        .orderBy("user_id", "session_start")),

    "q55_survival" -> ((s, dir) =>
      // discrete-time conversion hazard (life-table form): first
      // signup -> first at-or-after purchase, 1 h buckets; per bucket
      // n_risk / n_conv / hazard ppm / cumulative conversion ppm —
      // never-converters hold n_risk up (no censoring time modeled)
      EventOps.conversionHazard(events(s, dir), "user_id", "tsec",
          "event_type", from = "signup", to = "purchase", bucketSec = 3600L)
        .orderBy("bucket")),

    "q57_survival_censored" -> ((s, dir) =>
      // Kaplan-Meier risk sets: never-converters censor at the corpus
      // max timestamp and LEAVE n_risk after their bucket — q55's
      // life table with honest study-window semantics
      EventOps.conversionHazardCensored(events(s, dir), "user_id", "tsec",
          "event_type", from = "signup", to = "purchase", bucketSec = 3600L)
        .orderBy("bucket")),

    "q10_asof" -> ((s, dir) => {
      // attribution as-of join: each purchase matched to the latest
      // at-or-before view by the same user — union + one running
      // window, not a per-key-quadratic range join
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tsec"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("tsec").as("vtsec"))
      EventOps.asofJoin(purchases, views, key = "user_id",
          leftTime = "tsec", rightTime = "vtsec",
          rightPayload = Seq("view_id", "vtsec"),
          leftTie = "event_id", rightTie = "view_id")
        .select(col("event_id"), col("user_id"), col("tsec"),
          col("view_id"), col("vtsec").as("view_tsec"),
          (col("tsec") - col("vtsec")).as("lag_s"))
        .orderBy("event_id")
    }),

    "q11_percentiles" -> ((s, dir) =>
      // exact interpolated p50/p90/p99 per event type — Spark
      // percentile and DuckDB quantile_cont share the type-7 definition
      EventOps.groupPercentiles(events(s, dir), "event_type", "value",
          Seq(0.5, 0.9, 0.99))
        .orderBy("event_type")),

    "q12_funnel" -> ((s, dir) =>
      // ordered view -> click -> purchase funnel: per-user earliest
      // stage times, each stage at-or-after the previous stage's time
      EventOps.funnel(events(s, dir), "user_id", "tsec", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("user_id")),

    "g_summarize" -> ((s, dir) =>
      // graphite summarize(1h, sum): tumbling epoch-aligned buckets
      SeriesOps.summarize(metricStream(s, dir), 3600L, "sum")
        .orderBy("path", "bucket_start")),

    "g_per_second" -> ((s, dir) =>
      // graphite perSecond: per-series rate with counter-reset nulls
      SeriesOps.perSecond(metricStream(s, dir))
        .orderBy("path", "time", "version")),

    "g_moving_avg" -> ((s, dir) =>
      // graphite movingAverage(5): integer-exact framed sums
      SeriesOps.movingAverage(metricStream(s, dir), 5)
        .orderBy("path", "time", "version")),

    "g_moving_median" -> ((s, dir) =>
      // graphite movingMedian(5): exact percentile over quantized
      // longs in the frame — the spike-robust smoother
      SeriesOps.movingMedian(metricStream(s, dir), 5)
        .orderBy("path", "time", "version")),

    "g_weighted_avg" -> ((s, dir) =>
      // graphite weightedAverage(value-series, min-series, node 1):
      // hourly "last" consolidation, pair on path-minus-leaf, roll up
      // per event type
      SeriesOps.weightedAverage(metricStream(s, dir), "value", "min",
          groupNode = 1, stepSec = 3600L)
        .orderBy("grp", "bucket")),

    "g_outliers" -> ((s, dir) =>
      // per-series z-score anomalies (|z| > 3), exact integer moments
      SeriesOps.outliers(metricStream(s, dir), z = 3.0)
        .orderBy("path", "time", "version")),

    "g_highest" -> ((s, dir) =>
      // graphite highestAverage(10): exact integer means
      SeriesOps.highestAverage(metricStream(s, dir), 10)
        .orderBy("rank")),

    "g_cusum" -> ((s, dir) =>
      // CUSUM change-point locator: per series, the point of maximal
      // integer cumulative deviation from the series mean
      SeriesOps.cusumChangePoint(metricStream(s, dir))
        .orderBy("path")),

    "q30_benford" -> ((s, dir) =>
      // Benford first-digit audit of event values: digit histogram
      // + per-digit chi-square contributions
      EventOps.benfordAudit(events(s, dir), "value")
        .orderBy("digit")),

    "g_m4" -> ((s, dir) =>
      // M4 render downsampling: first/last/min/max per (series, 1h
      // bucket) — one composite-struct hash aggregate, zero windows
      SeriesOps.m4Downsample(metricStream(s, dir), bucketSec = 3600L)
        .orderBy("path", "bucket_start")),

    "g_npercentile" -> ((s, dir) =>
      // graphite nPercentile(90): per-series exact type-7 percentile
      SeriesOps.seriesPercentile(metricStream(s, dir), p = 90)
        .orderBy("path")),

    "g_remove_above_p" -> ((s, dir) =>
      // graphite removeAbovePercentile(95): boundary value kept
      SeriesOps.removeAbovePercentile(metricStream(s, dir), p = 95)
        .orderBy("path", "time", "version")),

    "g_percentile_series" -> ((s, dir) =>
      // graphite percentileOfSeries(90): per-TIMESTAMP p90 across all
      // series (LWW-collapsed) — the fleet band, not the series one
      SeriesOps.percentileOfSeries(metricStream(s, dir), p = 90)
        .orderBy("time")),

    "g_integral_by_interval" -> ((s, dir) =>
      // graphite integralByInterval(1h): running total resetting at
      // each hour boundary — the "how much so far this hour" view
      SeriesOps.integralByInterval(metricStream(s, dir), intervalSec = 3600L)
        .orderBy("path", "time", "version")),

    "g_filter_avg_above" -> ((s, dir) =>
      // graphite averageAbove(49.5): whole-series retention by exact
      // integer mean, strict comparison
      SeriesOps.filterSeries(metricStream(s, dir), "avg", "above", 49.5)
        .orderBy("path", "time", "version")),

    "g_sort_by_total" -> ((s, dir) =>
      // graphite sortByTotal + limit(10): integer-exact sums
      SeriesOps.sortByTotal(metricStream(s, dir), 10)
        .orderBy("rank")),

    "g_linreg" -> ((s, dir) =>
      // graphite linearRegression: per-series OLS as rational integer
      // sums (milli-value per minute), NULL for degenerate series
      SeriesOps.linearTrend(metricStream(s, dir))
        .orderBy("path")),

    "g_theil_sen" -> ((s, dir) =>
      // windowed Theil-Sen robust trend: exact median of lag<=5
      // pairwise slopes, shipped as the doubled-micro LONG itself
      // (no float rounding) — the spike-proof sibling of g_linreg
      SeriesOps.theilSenTrend(metricStream(s, dir), maxLag = 5)
        .orderBy("path")),

    "g_holt" -> ((s, dir) =>
      // Holt double smoothing, alpha=0.3 beta=0.1 in milli gains:
      // per-series level/trend fold + 3-step-out forecasts, all
      // LONGs — graphite's holtWintersForecast for trends
      SeriesOps.holtForecast(metricStream(s, dir),
          alphaMilli = 300L, betaMilli = 100L, horizon = 3)
        .orderBy("path")),

    "g_mad" -> ((s, dir) =>
      // robust per-series outlier summary: exact dyadic median / MAD
      // on doubled 1e-3-quantized integers, k = 3.5
      SeriesOps.madOutliers(metricStream(s, dir), k = 3.5)
        .orderBy("path")),

    "g_hitcount" -> ((s, dir) =>
      // graphite hitcount(1h): rate x forward-gap integrated per
      // bucket, integer-quantized area sums
      SeriesOps.hitcount(metricStream(s, dir), 3600L)
        .orderBy("path", "bucket_start")),

    "g_holt_winters" -> ((s, dir) =>
      // triple smoothing (alpha=.3 beta=.1 gamma=.2, 4-slot season):
      // per-series LONG fold; div == DuckDB's integer // (both
      // truncate toward zero — verified on negative seasonals)
      SeriesOps.holtWinters(metricStream(s, dir),
          alphaMilli = 300L, betaMilli = 100L, gammaMilli = 200L)
        .orderBy("path")),

    "g_moving_minmax" -> ((s, dir) =>
      // graphite movingMin+movingMax: the trailing-8 envelope pair in
      // one window frame — pure order statistics, no quantization
      SeriesOps.movingMinMax(metricStream(s, dir), n = 8)
        .orderBy("path", "time", "version")),

    "g_hw_bands" -> ((s, dir) =>
      // holtWintersConfidenceBands + Aberration: gamma-smoothed |y -
      // pred| deviation in the same LONG fold, +-3d band around the
      // h=1 forecast, aberrant points judged against the deviation
      // BEFORE them (warm-up 2 cycles)
      SeriesOps.holtWintersBands(metricStream(s, dir),
          alphaMilli = 300L, betaMilli = 100L, gammaMilli = 200L, kBand = 3L)
        .orderBy("path")),

    "g_bands" -> ((s, dir) =>
      // Bollinger bands over a 5-point frame, k=2: breach test is
      // pure integer arithmetic ((nq-S1)^2 > k^2(nS2-S1^2))
      SeriesOps.stddevBands(metricStream(s, dir), n = 5, k = 2)
        .orderBy("path", "time", "version")),

    "g_most_deviant" -> ((s, dir) =>
      // graphite mostDeviant(10): top series by integer variance key
      SeriesOps.mostDeviant(metricStream(s, dir), 10)
        .orderBy(col("var_key").desc, col("path"))),

    "g_offset_to_zero" -> ((s, dir) =>
      // graphite offsetToZero: re-base each series at its min —
      // one exact IEEE subtraction, no quantization needed
      SeriesOps.offsetToZero(metricStream(s, dir))
        .orderBy("path", "time", "version")),

    "g_changed" -> ((s, dir) =>
      // graphite changed(): 1 where the value moved vs the previous
      // point of the series
      SeriesOps.changed(metricStream(s, dir))
        .orderBy("path", "time", "version")),

    "g_divide_series" -> ((s, dir) =>
      // graphite divideSeries(.value, .min) on 1h-bucket means of
      // sibling leaves — exact LONG bucket sums, one IEEE division
      SeriesOps.divideSeries(metricStream(s, dir), "value", "min", 3600L)
        .orderBy("prefix", "bucket")),

    "g_derivative" -> ((s, dir) =>
      // graphite derivative: per-series point-to-point delta
      SeriesOps.derivative(metricStream(s, dir))
        .orderBy("path", "time", "version")),

    "g_nn_derivative" -> ((s, dir) =>
      // graphite nonNegativeDerivative: counter resets nulled
      SeriesOps.nonNegativeDerivative(metricStream(s, dir))
        .orderBy("path", "time", "version")),

    "g_integral" -> ((s, dir) =>
      // graphite integral: exact quantized-LONG running sum per series
      SeriesOps.integral(metricStream(s, dir))
        .orderBy("path", "time", "version")),

    "g_time_shift" -> ((s, dir) =>
      // timeShift(1h) overlay: 600s-consolidated series joined to
      // itself one hour (6 buckets) earlier on (path, gtime)
      SeriesOps.timeShiftCompare(metricStream(s, dir), shiftSec = 3600L, stepSec = 600L)
        .orderBy("path", "gtime")),

    "g_keep_last" -> ((s, dir) =>
      // keepLastValue over a 600s consolidated grid, gaps filled from
      // at most 3 buckets back
      SeriesOps.keepLastValue(metricStream(s, dir), stepSec = 600L, limit = 3)
        .orderBy("path", "gtime")),

    "g_group_by_node" -> ((s, dir) =>
      // groupByNode(1, sum): pointwise cross-series rollup on the
      // second path segment (the event type)
      SeriesOps.groupByNode(metricStream(s, dir), node = 1, fn = "sum")
        .orderBy("node_group", "time")),

    "g_as_percent" -> ((s, dir) =>
      // asPercent: each series' share of the pointwise all-series total
      SeriesOps.asPercent(metricStream(s, dir))
        .orderBy("path", "time")),

    "g_ema" -> ((s, dir) =>
      // exponentialMovingAverage(8), truncated-window replayable form
      SeriesOps.exponentialMovingAverage(metricStream(s, dir), n = 8, window = 8)
        .orderBy("path", "time", "version")),

    "g_moving_stddev" -> ((s, dir) =>
      // stdev(series, 5): trailing 5-point population stddev
      SeriesOps.movingStdDev(metricStream(s, dir), 5)
        .orderBy("path", "time", "version")),

    "g_seasonal" -> ((s, dir) =>
      // hour-of-day baseline + residual per point
      SeriesOps.seasonalBaseline(metricStream(s, dir))
        .orderBy("path", "time")),

    "q13_rolling" -> ((s, dir) =>
      // trailing-1h per-user event count + value sum (RANGE frame:
      // simultaneous events all see each other, no tie ambiguity)
      EventOps.rollingCounts(
          events(s, dir).select(col("event_id"), col("user_id"),
            col("tsec"), col("value")),
          "user_id", "tsec", "value", windowSec = 3600L)
        .orderBy("event_id")),

    "q14_histogram" -> ((s, dir) =>
      // sparse fixed-width (50) value histogram per event type
      EventOps.histogram(events(s, dir), "event_type", "value", width = 50.0)
        .orderBy("event_type", "bin")),

    // ---- training-data pipeline: dedup ----

    "d_dedup_url" -> ((s, dir) => {
      // URL-identity dedup: four planted variants of each resource
      // (scheme case, www, trailing slash, utm params, fragment)
      // must collapse to ONE canonical key per doc_id%40 resource
      val k = col("doc_id") % 40
      val planted = table(s, dir, "documents").withColumn("text",
        concat(col("text"), lit(" "),
          when(col("doc_id") % 4 === 0,
            concat(lit("https://h"), k, lit(".example.com/p"), k))
          .when(col("doc_id") % 4 === 1,
            concat(lit("http://h"), k, lit(".example.com/p"), k, lit("/")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("https://www.h"), k, lit(".example.com/p"), k, lit("?utm_source=feed")))
          .otherwise(
            concat(lit("HTTPS://WWW.H"), k, lit(".EXAMPLE.COM/p"), k, lit("#frag")))))
      DedupOps.urlDuplicates(planted, "doc_id", "text").orderBy("canonical_url")
    }),

    "d_dedup_soft" -> ((s, dir) =>
      // keep every copy, weight 1e6//cluster ppm — the soft-dedup
      // mixture alternative to hard removal; canonical flag preserved
      DedupOps.softDedup(table(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "d_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDuplicates(table(s, dir, "documents"), "doc_id", "text").orderBy("fp")),

    "d_dedup_minhash" -> ((s, dir) =>
      DedupOps.minhashCandidates(table(s, dir, "documents"), "doc_id", "text", k = 16, bands = 4, w = 3)
        .orderBy("id_a", "id_b")),

    "d_dedup_simhash" -> ((s, dir) =>
      DedupOps.simhashPairs(table(s, dir, "documents"), "doc_id", "text", maxDist = 9)
        .orderBy("id_a", "id_b")),

    "d_dedup_simhash_auto" -> ((s, dir) =>
      // corpus-priced pigeonhole split: the segment count comes from the
      // signature count (density target 128/bucket), so candidate volume
      // stays linear in corpus size; the oracle replays the same pick
      // from the same count
      DedupOps.simhashPairsAuto(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "d_dedup_jaccard" -> ((s, dir) =>
      DedupOps.jaccardPairs(table(s, dir, "documents"), "doc_id", "text", minJaccard = 0.8, w = 3)
        .orderBy("id_a", "id_b")),

    "d_dedup_neardup" -> ((s, dir) =>
      // the scale path: LSH candidates, exact-jaccard verify on candidates only
      DedupOps.nearDuplicates(table(s, dir, "documents"), "doc_id", "text", minJaccard = 0.8)
        .orderBy("id_a", "id_b")),

    "d_split_leakage" -> ((s, dir) => {
      // leakage audit: near-dup pairs straddling the 900/50/50 hash
      // split — the check that dedup ran BEFORE splitting; the oracle
      // composes the near-dup replay with the split bucket arithmetic
      val docs = table(s, dir, "documents")
      DedupOps.splitLeakage(docs, "doc_id", "text",
          SampleOps.splitAssign(docs, "doc_id",
            Seq("train" -> 900, "val" -> 50, "test" -> 50)),
          "doc_id", "split", minJaccard = 0.8)
        .orderBy("id_a", "id_b")
    }),

    "s_split_leakage" -> ((s, dir) => {
      // semantic leakage: cosine near-dup pairs (corpus-priced AUTO
      // band width — the same autoBandBits default the cosine dedup
      // family uses; the oracle replays the pick from count(*)),
      // exact verify at 0.4, crossing the 900/50/50 hash split —
      // catches the paraphrase/translation twins text dedup misses
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.splitLeakage(e,
          SampleOps.splitAssign(e, "id", Seq("train" -> 900, "val" -> 50, "test" -> 50)),
          "id", "split", minCosine = 0.4)
        .orderBy("id_a", "id_b")
    }),

    "p_mixture_reweight" -> ((s, dir) =>
      // DoReMi-style mixture optimizer: 4 multiplicative-weight steps
      // over per-lang mean quality (the loss proxy), all in scaled
      // integers — the oracle replays every step as an unrolled CTE
      SampleOps.mixtureReweight(table(s, dir, "documents"), "lang",
          TextOps.qualityScore(col("text")), steps = 4, etaPpm = 2000L)
        .orderBy("domain")),

    "p_dedup_savings" -> ((s, dir) => {
      // capacity report over a replayed-ingest corpus: every 5th doc
      // re-sent whitespace-mangled under a new id, every 11th re-sent
      // verbatim — per dup group, copies and characters reclaimed by
      // keeping the min-id canonical
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val mangled = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(lit("  "), col("text"), lit("\n")).as("text"))
      val verbatim = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"))
      DedupOps.dedupSavings(docs.union(mangled).union(verbatim), "doc_id", "text")
        .orderBy("fp")
    }),

    "t_pii_audit" -> ((s, dir) => {
      // PII counting over a corpus with PLANTED pii (emails on %3,
      // dotted-quad hosts on %5, phone runs on %7 — plus whatever the
      // raw text accidentally matches, which both engines see
      // identically). Counts replay redact()'s sequential semantics.
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" host 10.0."), col("doc_id") % 256, lit(".7"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" call +1 (555) 123-45"), col("doc_id") % 10, col("doc_id") % 10)).otherwise(lit("")))
          .as("text"))
      TextOps.piiAudit(planted, "doc_id", "text").orderBy("id")
    }),

    "t_zipf" -> ((s, dir) =>
      // corpus Zipf-shape audit: decade count ratios in exact ppm
      // (integer-division replayable, unlike a log-log slope)
      TextOps.zipfDecades(table(s, dir, "documents"), "text")),

    "t_scripts" -> ((s, dir) => {
      // Unicode script-mix audit over a corpus with PLANTED non-Latin
      // segments (the synthetic corpus is ASCII; planting exercises
      // every script class on both engines identically)
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 1, lit(" Привет мир")).otherwise(lit("")),
          when(col("doc_id") % 5 === 2, lit(" λόγος 你好 こんにちは")).otherwise(lit("")),
          when(col("doc_id") % 5 === 3, lit(" مرحبا שלום")).otherwise(lit("")))
          .as("text"))
      TextOps.scriptMix(planted, "doc_id", "text").orderBy("doc_id")
    }),

    "t_distinct_n" -> ((s, dir) =>
      // corpus distinct-1/2/3 diversity: the template/replica detector
      // that fires long before whole-document dedup sees a duplicate
      TextOps.distinctNgrams(table(s, dir, "documents"), "text").orderBy("n")),

    "t_readability" -> ((s, dir) =>
      // Flesch reading-ease in exact millis: the curriculum signal
      // and the OCR-garbage detector (mangled text goes deeply negative)
      TextOps.readability(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_code_detect" -> ((s, dir) => {
      // code-likeness routing audit, with code PLANTED on doc_id%7==2
      // (the synthetic corpus is pure prose; planting exercises every
      // signal — braces, operators, keywords, indents — on both engines)
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 2,
            lit("\ndef check(x):\n    if x == 2 && x != 0:\n        return x + 1\nclass Foo {\n    int y = 0;\n}\n"))
            .otherwise(lit(""))).as("text"))
      TextOps.codeSignals(planted, "doc_id", "text").orderBy("doc_id")
    }),

    "t_urls" -> ((s, dir) => {
      // URL/domain audit with URLs PLANTED on doc_id%4 in {1,2} (the
      // corpus carries none): counts, distinct hosts, URL char ppm
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 1,
            lit(" see https://example.com/a/b and http://docs.example.org/x?q=1 plus https://example.com/c"))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 2,
            concat(lit(" asset at https://cdn"), col("doc_id") % 3,
              lit(".example-media.net/img.png"))).otherwise(lit("")))
          .as("text"))
      TextOps.urlAudit(planted, "doc_id", "text").orderBy("doc_id")
    }),

    "t_skipgram" -> ((s, dir) =>
      // corpus-wide skip-gram collocations: unordered word pairs
      // within a 3-word span, top 30 — the word2vec/phrase-mining table
      TextOps.skipgramPairs(table(s, dir, "documents"), "text", window = 3, topN = 30)),

    "t_ttr" -> ((s, dir) =>
      // per-doc lexical diversity: type-token + hapax ratios in ppm —
      // the template-spam detector
      TextOps.typeTokenRatio(table(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "t_rake" -> ((s, dir) =>
      // RAKE keyphrases: stopword-delimited candidate runs scored by
      // integer deg/freq milli-sums, corpus top 20
      TextOps.rakeKeywords(table(s, dir, "documents"), "doc_id", "text",
        stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for"),
        topN = 20)),

    "t_kn_continuation" -> ((s, dir) =>
      // Kneser-Ney continuation counts: distinct-left-context top 50
      // — the smoothing statistic raw frequency can't substitute
      TextOps.knContinuation(table(s, dir, "documents"), "text", topN = 50)),

    "t_burstiness" -> ((s, dir) =>
      // Church-Gale term burstiness: Fano factor of per-doc counts
      // (zeros included) for the top-50 corpus terms — Poisson glue
      // vs bursting content words, exact rational milli
      TextOps.burstiness(table(s, dir, "documents"), "doc_id", "text", topN = 50)
        .orderBy("rank")),

    "t_yule_k" -> ((s, dir) =>
      // Yule's K repetitiveness: length-invariant where TTR decays,
      // exact integer spectrum sums, K in milli units
      TextOps.yuleK(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_kn_score" -> ((s, dir) =>
      // interpolated Kneser-Ney bigram NLL (D=0.75): discounted MLE
      // plus continuation back-off — the proper-smoothing quality
      // scorer t_perplexity2's raw MLE approximates
      TextOps.knBigramNll(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_nb_langid" -> ((s, dir) =>
      // naive-Bayes langid trained on the id%5!=0 split, scored on
      // the rest: integer micro-log weights, argmax by (score, lang)
      TextOps.nbLangid(table(s, dir, "documents"), "doc_id", "text", "lang")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "t_bm25" -> ((s, dir) =>
      // BM25 top-25 retrieval for a fixed 4-term query over the
      // corpus — per-term floor(1e6·idf·tfpart) micro scores from
      // exact (tf, df, dl, N, Σdl) integers, LONG-summed per doc
      TextOps.bm25Top(table(s, dir, "documents"), "doc_id", "text",
        terms = Seq("spark", "vector", "customer", "stream"), n = 25)),

    "t_hash_embed" -> ((s, dir) =>
      // hashing-trick featurizer (Weinberger 2009): 64-dim signed
      // word-hash counts, exploded relational surface — all LONGs
      TextOps.hashedFeatures(table(s, dir, "documents"), "doc_id", "text", dims = 64)
        .orderBy("doc_id", "dim")),

    "t_anchors" -> ((s, dir) => {
      // anchor-text term table over planted links: every %3!=0 doc
      // links host h(doc%7) with a 3-word anchor drawn from its own
      // text — what the web SAYS about each host, host-keyed counts
      val docs0 = table(s, dir, "documents")
      val planted = docs0.select(col("doc_id"),
        when(col("doc_id") % 3 =!= 0,
          concat(col("text"), lit(" <a href=\"https://h"), col("doc_id") % 7,
            lit(".example.net/p\">"),
            substring(col("text"), 1, 20), lit("</a>")))
          .otherwise(col("text")).as("text"))
      TextOps.anchorTerms(planted, "doc_id", "text")
        .orderBy("host", "term")
    }),

    "q39_host_rank" -> ((s, dir) => {
      // domain authority end-to-end: plant two URLs per doc (hosts
      // h(doc%23) / h(doc div 3 %23)), extract the doc->host edges
      // with the one-pass URL kernel, then 3 rounds of integer
      // PageRank on the undirected bipartite graph; report the host
      // side — the CommonCrawl-style "rank domains before sampling"
      // composition as one oracle-checked query
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" https://h"), col("doc_id") % 23,
          lit(".example.net/p http://h"), expr("doc_id div 3") % 23,
          lit(".example.net/q")).as("text"))
      val he = TextOps.hostEdges(planted, "doc_id", "text")
      val fwd = he.select(concat(lit("d"), col("doc_id")).as("src"),
          concat(lit("h"), col("host")).as("dst")).distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.pageRank(edges, iterations = 3)
        .filter(col("node").startsWith("hh")).orderBy("node")
    }),

    "t_html_strip" -> ((s, dir) => {
      // markup-strip audit with an HTML page fragment PLANTED on
      // doc_id%6==3 — tag counts, stripped length, markup ppm,
      // nav/footer boilerplate flag
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 3,
            lit(" <html><body><nav>menu</nav><p class=\"x\">hello</p><footer>(c) 2024</footer></body></html>"))
            .otherwise(lit(""))).as("text"))
      TextOps.htmlStrip(planted, "doc_id", "text").orderBy("doc_id")
    }),

    "d_minhash_estimate" -> ((s, dir) =>
      // sketch-accuracy calibration: signature-agreement estimate vs
      // exact Jaccard per LSH candidate pair, signed error in ppm
      DedupOps.minhashEstimateAudit(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "s_centroid_drift" -> ((s, dir) => {
      // embedding-drift release gate: per-label centroid cosine
      // between the full snapshot and a refresh that dropped
      // vec_id%5==0 — counts on both sides, null drift = class gone
      val e = table(s, dir, "embeddings")
      KMeansOps.centroidDrift(e, e.filter(col("vec_id") % 5 =!= 0),
          "label", "embedding")
        .orderBy("label")
    }),

    "p_signal_corr" -> ((s, dir) =>
      // signal-redundancy audit: Spearman between the quality score
      // and n_chars over ordinal ranks (id tie-break) — one exact row
      SampleOps.rankCorrelation(table(s, dir, "documents"),
        TextOps.qualityScore(col("text")), col("n_chars"), col("doc_id"))),

    "p_signal_corr_sampled" -> ((s, dir) =>
      // the 100 TB form of the same audit: a deterministic Bernoulli
      // sample (hash rate 0.25) bounds the frame BEFORE the global
      // rank sort — executable scale path, not an advisory caveat
      SampleOps.rankCorrelation(
        SampleOps.bernoulliSample(table(s, dir, "documents"), "doc_id", 0.25, "corr"),
        TextOps.qualityScore(col("text")), col("n_chars"), col("doc_id"))),

    "p_quality_frontier" -> ((s, dir) =>
      // Pareto skyline of (quality up, length down): two running-max
      // windows over the cost order decide dominance, no pairwise join
      SampleOps.paretoFrontier(table(s, dir, "documents"), col("doc_id"),
          TextOps.qualityScore(col("text")), col("n_chars"))
        .withColumnRenamed("id", "doc_id")
        .withColumnRenamed("score", "quality")
        .withColumnRenamed("cost", "n_chars")
        .orderBy("n_chars", "doc_id")),

    "p_class_weights" -> ((s, dir) =>
      // class-rebalancing weights from exact label counts: inverse-
      // frequency ppm + inverse-sqrt milli, all integer
      SampleOps.classWeights(table(s, dir, "embeddings"), "label")
        .orderBy("label")),

    "p_kfold" -> ((s, dir) =>
      // deterministic md5 k-fold assignment + per-(fold, lang)
      // stratification census with exact ppm shares
      SampleOps.kfoldAudit(table(s, dir, "documents"), "doc_id", "lang",
          k = 5, salt = "fold")
        .orderBy("fold", "stratum")),

    "p_ks_drift" -> ((s, dir) => {
      // exact two-sample KS gate on document lengths between snapshot
      // A and a filtered snapshot B — the distribution-shape release
      // check per-domain shares can't see
      val a = table(s, dir, "documents")
      val b = a.filter(!(col("lang") === "en" && col("doc_id") % 3 === 0))
      SampleOps.ksDrift(a, b, "n_chars")
    }),

    "p_padding_waste" -> ((s, dir) =>
      // length-bucketed batching audit: padding + truncation cost per
      // power-of-two bucket over whitespace token counts
      SampleOps.paddingWaste(table(s, dir, "documents"),
          TextOps.tokenCount(col("text")), Seq(64L, 128L, 256L, 512L))
        .orderBy("bucket")),

    "p_mixture_drift" -> ((s, dir) => {
      // release-gate drift report: snapshot B drops a third of English
      // (the failure a refreshed crawl actually produces) — per-domain
      // ppm shares of both snapshots and the signed delta
      val a = table(s, dir, "documents")
      val b = a.filter(!(col("lang") === "en" && col("doc_id") % 3 === 0))
      SampleOps.mixtureDrift(a, b, "lang").orderBy("domain")
    }),

    "p_unimax" -> ((s, dir) => {
      // UniMax waterfill at a 3-total-epoch budget, 4-epoch cap: the
      // four tail languages hit their caps, English absorbs the rest
      // (and every division remainder — k=1 last). Budget is
      // corpus-priced (3x total chars), so the branch structure holds
      // across scale factors.
      val d = table(s, dir, "documents")
      val total = d.agg(sum(length(col("text")))).first().getLong(0)
      SampleOps.unimaxAllocation(d, "lang", "text",
          budget = 3L * total, epochCap = 4L)
        .orderBy("lang")
    }),

    "p_temperature" -> ((s, dir) =>
      // alpha=1/2 temperature sampling weights per language — raw vs
      // flattened ppm shares and the upsampling boost, integer-exact
      SampleOps.temperatureShares(table(s, dir, "documents"), "lang")
        .orderBy("domain")),

    "p_hll_shard_merge" -> ((s, dir) => {
      // HLL MERGEABILITY executed: per-shard register tables max-merge
      // into the direct single-pass registers (max is associative), so
      // the estimate is reduction-topology-invariant — the property
      // that makes the sketch shippable as 1000 per-executor summaries
      // folded on the driver instead of one corpus-wide shuffle
      val e = events(s, dir).select((col("event_id") % 8).as("shard"), col("user_id"))
      val merged = SketchOps.hllFromRegisters(
          SketchOps.hllRegisters(e, Seq("shard"), "user_id")
            .groupBy("_idx").agg(max(col("_r")).as("_r")), Nil)
        .select(col("est_milli").as("merged_est_milli"))
      val direct = SketchOps.hllDistinct(e, Nil, "user_id")
        .select(col("est_milli").as("direct_est_milli"))
      val exact = e.agg(countDistinct(col("user_id")).as("exact_distinct"))
      merged.crossJoin(direct).crossJoin(exact)
        .select(col("merged_est_milli"), col("direct_est_milli"),
          (col("merged_est_milli") === col("direct_est_milli")).as("merge_exact"),
          col("exact_distinct"))
    }),

    "p_distinct_hll" -> ((s, dir) => {
      // HLL distinct users per event type, registers and harmonic sum
      // fully replayed by the oracle (md5 hash, bin()-length ranks,
      // integer S); exact distinct joined on for the error audit
      val ev = events(s, dir).select(col("event_type"), col("user_id"))
      SketchOps.hllDistinct(ev, Seq("event_type"), "user_id")
        .join(ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact")), "event_type")
        .orderBy("event_type")
    }),

    "d_dedup_prefix" -> ((s, dir) =>
      // EXACT similarity join (prefix filtering, recall 1): must equal
      // the brute-force oracle row-for-row — the subquadratic plan that
      // pays no LSH recall trade
      DedupOps.prefixJaccardPairs(table(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.8)
        .orderBy("id_a", "id_b")),

    "d_decontaminate_substr" -> ((s, dir) => {
      // literal-inclusion decontamination: 60-char slices of the first
      // 50 docs as the benchmark side; every slice must at least find
      // its own source doc, plus any verbatim duplicates of it
      val docs = table(s, dir, "documents")
      val ref = docs.filter(col("doc_id") < 50)
        .select(col("doc_id"), substring(col("text"), 20, 60).as("rt"))
      DedupOps.substringContamination(docs, "doc_id", "text", ref, "doc_id", "rt")
        .orderBy("corpus_id", "ref_id")
    }),

    "d_dedup_editdist" -> ((s, dir) =>
      // LSH blocking + bounded-Levenshtein verify: the dense-small-edit
      // near-dup case word-shingle Jaccard is blind to
      DedupOps.editDistancePairs(table(s, dir, "documents"), "doc_id", "text",
          maxDist = 80)
        .orderBy("id_a", "id_b")),

    "d_dedup_clusters" -> ((s, dir) =>
      // pairs -> per-document keep/drop decisions: connected components
      // over the LSH-verified near-dup graph, canonical = min doc id
      DedupOps.duplicateClusters(table(s, dir, "documents"), "doc_id", "text", minJaccard = 0.8)
        .orderBy("id")),

    "d_canonical" -> ((s, dir) =>
      // the retention policy on top: per cluster keep the HIGHEST-
      // QUALITY member (tie -> smaller id), one row per cluster
      DedupOps.canonicalPerCluster(table(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.8)
        .orderBy("cluster_id")),

    "d_dedup_priority" -> ((s, dir) =>
      // cross-corpus merge rule: within a near-dup cluster the member
      // from the best source TIER survives (src suffix % 3 plays the
      // curated/web/crawl tiers), quality/id break remaining ties
      DedupOps.priorityCanonical(table(s, dir, "documents"), "doc_id", "text",
          priority = substring(col("source"), 4, 10).cast("long") % 3,
          minJaccard = 0.8)
        .orderBy("cluster_id")),

    "d_dedup_winnow" -> ((s, dir) =>
      // MOSS winnowing detector: pairs sharing >= 5 winnow
      // fingerprints (k=12 char grams, window 8 — any shared
      // normalized substring of >= 19 chars GUARANTEES a shared
      // fingerprint, unlike minhash's probabilistic coverage).
      // maxFpDf=100 drops stop-fingerprints: a boilerplate/template
      // fingerprint shared by hundreds of docs is non-discriminative
      // (MOSS's own high-df drop rule) and its group would fan out
      // df² pair rows — at the 10× corpus hot template fps reached
      // df≈730, Σdf² ≈ 2e9 pair rows, an un-runnable plan
      TextOps.winnowPairs(table(s, dir, "documents"), "doc_id", "text",
          k = 12, window = 8, minShared = 5, maxFpDf = 100L)
        .orderBy("id_a", "id_b")),

    "d_dedup_homoglyph" -> ((s, dir) => {
      // homoglyph spoof detection: docs %10==3 carry a Cyrillic-
      // confusable copy of their predecessor's text (renders
      // identically, fresh md5 — invisible to exact dedup); the
      // normalized fingerprint folds TR39 confusables back and
      // reports every group with >= 2 raw variants
      val docs0 = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val nbr = docs0.select((col("doc_id") + 1).as("doc_id"),
        translate(col("text"), "aeopcyx", "аеорсух").as("spoof"))
      val planted = docs0.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 3 && col("spoof").isNotNull, col("spoof"))
            .otherwise(col("text")).as("text"))
      TextOps.homoglyphGroups(planted, "doc_id", "text").orderBy("min_id")
    }),

    "d_dedup_incremental" -> ((s, dir) => {
      // new-batch dedup against the already-accepted corpus: docs
      // 0..249 are "accepted", 250+ arrive as the new batch; survivors
      // are new docs whose fingerprint is unseen, min-id within batch
      val docs = table(s, dir, "documents")
      val known = docs.filter(col("doc_id") < 250)
        .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
      DedupOps.incrementalDeduplicate(docs.filter(col("doc_id") >= 250), "doc_id", "text", known)
        .orderBy("id")
    }),

    "d_dedup_incremental_bloom" -> ((s, dir) => {
      // the Bloom-routed form: sketch splits the batch, exact anti-join
      // only for mightContain=true docs — result BIT-IDENTICAL to
      // d_dedup_incremental (same oracle SQL), which is the point
      val docs = table(s, dir, "documents")
      val known = docs.filter(col("doc_id") < 250)
        .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
      DedupOps.incrementalDeduplicateBloom(docs.filter(col("doc_id") >= 250), "doc_id", "text",
          known, expectedItems = 1000L)
        .orderBy("id")
    }),

    "p_split" -> ((s, dir) =>
      // deterministic 900/50/50 train/val/test assignment by id hash —
      // membership is a pure function of doc_id, stable across corpus
      // versions; the oracle replays the md5 bucket arithmetic
      SampleOps.splitAssign(table(s, dir, "documents"), "doc_id",
          Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")),

    "d_corpus_diff" -> ((s, dir) => {
      // snapshot audit: v2 drops doc_id%7==0, rewrites %5==0 (' v2'
      // suffix), adds +10000 clones of %11==0 — classify every id
      val docs = table(s, dir, "documents")
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .union(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      DedupOps.corpusDiff(docs, v2, "doc_id", "text").orderBy("id")
    }),

    "d_dedup_containment" -> ((s, dir) => {
      // quote-inclusion dedup: the corpus plus synthetic two-doc
      // digests (every 50th doc concatenated with its successor) —
      // the sources sit INSIDE the digests with containment ~1.0
      // where their Jaccard is ~0.5, the case this operator exists for
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val digests = docs.as("a").filter(col("a.doc_id") % 50 === 0)
        .join(docs.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
        .select((col("a.doc_id") + 20000).as("doc_id"),
          concat(col("a.text"), lit(" "), col("b.text")).as("text"))
      DedupOps.containmentPairs(docs.union(digests), "doc_id", "text",
          minContainment = 0.9)
        .orderBy("src_id", "dst_id")
    }),

    "d_dedup_spans" -> ((s, dir) =>
      // duplicated-substring spans: per-doc merged word-position
      // intervals covered by 13-grams appearing in >= 2 docs — the
      // distributed re-expression of suffix-array substring dedup
      DedupOps.duplicatedSpans(table(s, dir, "documents"), "doc_id", "text",
          n = 13, minDocs = 2)
        .orderBy("doc_id", "span_start")),

    "d_decontaminate" -> ((s, dir) => {
      // train/test decontamination: corpus docs sharing >= 0.5 n-gram
      // Jaccard with a reference (benchmark) set — here the first 50
      // docs stand in as the benchmark
      val docs = table(s, dir, "documents")
      DedupOps.contaminationPairs(
        docs.filter(col("doc_id") >= 50), "doc_id", "text",
        docs.filter(col("doc_id") < 50), "doc_id", "text",
        minJaccard = 0.5)
        .orderBy("corpus_id", "ref_id")
    }),

    "d_decontaminate_fuzzy" -> ((s, dir) => {
      // LSH-blocked fuzzy benchmark decontamination: band match against
      // the benchmark split, exact-Jaccard verify on candidates only
      val docs = table(s, dir, "documents")
      DedupOps.crossContamination(
        docs.filter(col("doc_id") >= 50), "doc_id", "text",
        docs.filter(col("doc_id") < 50), "doc_id", "text",
        minJaccard = 0.5)
        .orderBy("corpus_id", "ref_id")
    }),

    "d_decontaminate_ngram" -> ((s, dir) => {
      // GPT-3-appendix exact 13-gram collision decontamination: ANY
      // shared 13-gram with the benchmark set flags the doc (no
      // similarity threshold) — the other standard method next to
      // d_decontaminate's Jaccard form
      val docs = table(s, dir, "documents")
      DedupOps.ngramCollisions(
        docs.filter(col("doc_id") >= 50), "doc_id", "text",
        docs.filter(col("doc_id") < 50), "doc_id", "text")
        .orderBy("corpus_id")
    }),

    "d_dedup_cosine" -> ((s, dir) => {
      // embedding-space near-dup: hyperplane-banded candidates, exact
      // cosine verify — no cross join. nbits passed EXPLICITLY: this is
      // the fixed-band contractual row; a plain call now routes to the
      // corpus-priced auto (the d_dedup_cosine_auto row)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.cosineNearDuplicates(e, minCosine = 0.25, nbits = 24)
        .orderBy("id_a", "id_b")
    }),

    "d_dedup_cosine_auto" -> ((s, dir) => {
      // corpus-priced band width (density target 128/bucket): candidate
      // volume stays linear in corpus size; the oracle replays the pick
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.cosineNearDuplicatesAuto(e, minCosine = 0.25)
        .orderBy("id_a", "id_b")
    }),

    "d_dedup_semantic_auto" -> ((s, dir) => {
      // corpus-priced cell count (target cell size 256): within-cell
      // pair volume stays linear; oracle replays k AND the training loop
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      KMeansOps.semanticNearDuplicatesAuto(e, "id", "embedding", minCosine = 0.25)
        .orderBy("id_a", "id_b")
    }),

    "d_dedup_semantic_sharded" -> ((s, dir) => {
      // two-level: trained cells at a deliberately TINY cap (8) so the
      // cap binds at verify scale, then per-cell hyperplane subcells
      // sized from actual cell counts (target 32) — the composition
      // that holds pair volume flat past the one-level cap; the oracle
      // replays training, the count-priced split widths, and the
      // subplane sign bits
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      KMeansOps.semanticNearDuplicatesSharded(e, "id", "embedding", minCosine = 0.25,
          targetCellSize = 32L, maxCells = 8)
        .orderBy("id_a", "id_b")
    }),

    // ---- training-data pipeline: similarity search ----

    "s_ann_cosine" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.bruteForceTopK(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_range_cosine" -> ((s, dir) => {
      // radius retrieval: ALL neighbors at sim >= 0.25 — a filter at
      // the probe, no window/sort anywhere in the plan
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.rangeSearch(e.filter(col("id") < 5), e, minSim = 0.25)
        .orderBy("query_id", "neighbor_id")
    }),

    "s_mips" -> ((s, dir) => {
      // max-INNER-PRODUCT top-5: raw dot score, norms kept (the
      // recommender retrieval mode cosine normalizes away)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.mipsTopK(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_ann_lsh_mp" -> ((s, dir) => {
      // multi-probe LSH: each band also probes its Hamming-1 buckets
      // (query side only — corpus stays single-placed), recovering
      // one-flipped-bit near-misses without more signature bits
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.lshTopKMultiProbe(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_recall_lsh_mp" -> ((s, dir) => {
      // the audit row for the probes-for-memory trade: multi-probe
      // recall@5 vs brute truth (>= single-probe by superset)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.lshTopKMultiProbe(q, e, k = 5),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_ann_lsh_qd" -> ((s, dir) => {
      // QUERY-DIRECTED multi-probe (Lv VLDB-2007 §4.2): same probe
      // budget as s_ann_lsh_mp, but each band spends it on the
      // perturbation masks with the smallest Σ margin² instead of the
      // Hamming-1 blanket — the probes go where the query's hyperplane
      // margins say the neighbors are
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.lshTopKQueryDirected(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_recall_lsh_qd" -> ((s, dir) => {
      // the audit row: query-directed recall@5 vs brute truth — the
      // go/no-go comparison against s_recall_lsh_mp at the same budget
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.lshTopKQueryDirected(q, e, k = 5),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_ann_lsh_qa" -> ((s, dir) => {
      // GLOBALLY budgeted query-directed probing (Lv §4.4): the same
      // 24-probe budget as s_ann_lsh_qd, ranked across ALL bands —
      // a band with three razor-thin margins takes probes a confident
      // band would waste
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.lshTopKQueryAdaptive(e.filter(col("id") < 5), e, k = 5, budget = 24)
        .orderBy("query_id", "rank")
    }),

    "s_recall_lsh_qa" -> ((s, dir) => {
      // the audit row: globally-budgeted recall@5 vs brute truth at
      // the same total budget as the per-band qd variant
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.lshTopKQueryAdaptive(q, e, k = 5, budget = 24),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_ann_lsh_auto" -> ((s, dir) => {
      // corpus-priced AUTO banding for the probing family: band width
      // from autoBandBits(count) holds bucket density — and therefore
      // candidates per probe — constant as the corpus grows, the fix
      // for the fixed-band qd row's 3.9x/decade candidate growth
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.lshTopKQueryDirectedAuto(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_ann_ivf_auto" -> ((s, dir) => {
      // corpus-priced AUTO cells for IVF: fixed ncells=16 grows
      // candidates per query (nprobe*n/ncells) linearly with the
      // corpus; the smallest power-of-two ncells with n <= 128*ncells
      // holds cell density - the faiss sqrt-n rule as a replayable
      // integer pick, same family as s_ann_lsh_auto's banding
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.ivfTopKAuto(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_recall_ivf_auto" -> ((s, dir) => {
      // the audit row pricing the auto pick's recall vs brute truth
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.ivfTopKAuto(q, e, k = 5),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_recall_lsh_auto" -> ((s, dir) => {
      // the audit row pricing what the density pick trades: auto-banded
      // qd recall@5 vs brute truth (the fixed-band geometry reads ~the
      // whole corpus per query, so its recall is exhaustive-scan recall
      // at exhaustive-scan cost — this row is the honest number)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.lshTopKQueryDirectedAuto(q, e, k = 5),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_mips_ivf" -> ((s, dir) => {
      // MIPS through the IVF pruner: norm-augmented 65-dim vectors
      // (corpus gains sqrt(M^2-|x|^2), queries gain 0) make augmented
      // cosine order by raw inner product, so the md5-codebook cell
      // probe prunes MIPS exactly like s_ann_ivf prunes cosine
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.mipsIvfTopK(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_recall_mips" -> ((s, dir) => {
      // recall audit for the norm-augmented path: how much exact
      // inner-product top-5 the 6-of-16 cell probe recovers — the
      // go/no-go check before shipping the reduction at corpus scale
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.mipsIvfTopK(q, e, k = 5),
          SimilarityOps.mipsTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_knn_mutual" -> ((s, dir) => {
      // mutual-kNN graph edges over the first 200 vectors: both
      // endpoints in each other's exact top-5, emitted once (src<dst)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.mutualKnnEdges(e.filter(col("id") < 200), k = 5)
        .orderBy("src", "dst")
    }),

    "s_triplets" -> ((s, dir) => {
      // triplet mining over the first 200 vectors: hardest positive
      // (same label, min sim) + hardest negative (other label, max
      // sim) per anchor, margin in integer micros
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      SimilarityOps.tripletMining(e.filter(col("id") < 200))
        .orderBy("anchor_id")
    }),

    "s_rrf" -> ((s, dir) => {
      // hybrid retrieval: fuse the full-precision top-10 with the
      // 32-dim truncated-index top-10 by reciprocal rank (k=60)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val t = e.select(col("id"), slice(col("embedding"), 1, 32).as("embedding"))
      SimilarityOps.rrfFuse(
        SimilarityOps.bruteForceTopK(e.filter(col("id") < 5), e, k = 10),
        SimilarityOps.bruteForceTopK(t.filter(col("id") < 5), t, k = 10),
        k = 60, topN = 5)
        .orderBy("query_id", "fused_rank")
    }),

    "s_hard_negatives" -> ((s, dir) => {
      // contrastive hard negatives: nearest corpus vectors with a
      // DIFFERENT label, per query — the near-miss mining step
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      SimilarityOps.hardNegatives(e.filter(col("id") < 5), e, k = 10)
        .orderBy("query_id", "rank")
    }),

    "s_label_outliers" -> ((s, dir) =>
      // label-noise audit: per label, the 5 vectors farthest from
      // their own exact class centroid (mislabel candidates)
      KMeansOps.labelOutliers(table(s, dir, "embeddings"), "vec_id", "label",
          "embedding", topPerLabel = 5)
        .withColumnRenamed("id", "vec_id")
        .orderBy("label", "rank")),

    "s_ann_lsh" -> ((s, dir) => {
      // LSH-bucketed ANN (scale path). The md5-derived hyperplanes make the
      // signatures engine-portable, so the full pipeline (sign bits -> band
      // join -> exact cosine re-rank) has a DuckDB oracle; recall vs brute
      // force is additionally asserted in OperatorSpec.
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.lshTopK(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_ann_ivf" -> ((s, dir) => {
      // IVF ANN: fixed md5-derived codebook, nprobe cells per query
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.ivfTopK(e.filter(col("id") < 5), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    "s_recall_lsh" -> ((s, dir) => {
      // the ANN evaluation surface: per-query recall@5 of the LSH
      // strategy against exact brute force, in integral ppm — both
      // sides are this library's own emitters, join is result-sized
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.lshTopK(q, e, k = 5),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_recall_ivf" -> ((s, dir) => {
      // same audit for the IVF strategy — the nprobe go/no-go check
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          SimilarityOps.ivfTopK(q, e, k = 5),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_recall_pq" -> ((s, dir) => {
      // recall audit for the PQ/ADC path — closes the audit family
      // (brute = truth, lsh/ivf/pq each audited): how much exact
      // top-5 the 8x32 codes + 50-candidate re-rank recover
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          PqOps.pqTopK(q, e, topk = 5, m = 8, k = 32, iters = 1, cand = 50),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_recall_opq" -> ((s, dir) => {
      // recall audit for the rotated-PQ path at the same geometry as
      // s_recall_pq — the row that prices what the learned rotation
      // buys over raw sub-chunking (spec pins opq >= raw)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          PqOps.opqTopK(q, e, topk = 5, m = 8, k = 32, iters = 1,
            cand = 50, opqIters = 3),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    // ---- training-data pipeline: text analysis ----

    "t_tokens" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
          col("doc_id"),
          TextOps.tokenCount(col("text")).as("ws_tokens"),
          TextOps.subwordCount(col("text")).as("subword_tokens"),
          size(array_distinct(TextOps.words(col("text")))).cast("long").as("distinct_tokens"))
        .orderBy("doc_id")
    }),

    "t_quality" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "t_langid" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.langGuess(col("text")).as("lang_guess"), col("lang"))
        .orderBy("doc_id")),

    "t_gopher_rules" -> ((s, dir) =>
      // the published Gopher/MassiveText per-rule quality filter —
      // 0/1 flag per rule + the conjunction, pure codegen projection
      TextOps.gopherRules(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_c4_rules" -> ((s, dir) =>
      // the published C4 line-level cleaning rules — kept-line count,
      // surviving-sentence count, lorem/brace tells, page decision
      TextOps.c4Rules(table(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "t_ccnet_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail perplexity terciles per language over
      // the corpus-trained unigram NLL (same signal as t_perplexity)
      TextOps.ccnetBuckets(table(s, dir, "documents"), "doc_id", "text", "lang")
        .orderBy("doc_id")),

    "t_oov" -> ((s, dir) =>
      // closed-vocab coverage: instances outside the corpus top-100
      // vocabulary, per doc — the embedding-table commitment audit
      TextOps.oovStats(table(s, dir, "documents"), "doc_id", "text", topV = 100)
        .orderBy("doc_id")),

    "t_distinct_n_kmv" -> ((s, dir) =>
      // the bounded-exchange scale path for gram diversity: KMV min-set
      // per n (k*8 bytes cross the shuffle forever) instead of the
      // exact one-row-per-distinct-gram exchange
      TextOps.distinctNgramsSketch(table(s, dir, "documents"), "text", maxN = 3, k = 128)
        .orderBy("n")),

    "p_funnel" -> ((s, dir) =>
      // the composed selection funnel: gopher x c4 x exact-dedup
      // canonical, counted per (lang, source) with kept token volume
      TextOps.selectionFunnel(table(s, dir, "documents"), "doc_id", "text",
          "lang", "source")
        .orderBy("lang", "source")),

    "t_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    "t_chunks" -> ((s, dir) =>
      // context-window prep: 50-token chunks, 10-token overlap
      TextOps.chunkDocuments(table(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 50, overlap = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_no")),

    "t_redact" -> ((s, dir) => {
      // PII scrub: the corpus has no natural PII, so plant a per-doc
      // deterministic email + phone + IP and verify the scrubbed text
      val d = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          lit(" or +1 (415) 555-01"), col("doc_id"),
          lit(" node 10.0.0."), pmod(col("doc_id"), lit(256))).as("text"))
      d.select(col("doc_id"), TextOps.redact(col("text")).as("redacted"))
        .orderBy("doc_id")
    }),

    // ---- training-data pipeline: sampling / mixing / shuffling ----

    "p_sample" -> ((s, dir) =>
      // deterministic Bernoulli sample: pure filter, no shuffle
      SampleOps.bernoulliSample(table(s, dir, "documents"), "doc_id", rate = 0.25)
        .select(col("doc_id"))
        .orderBy("doc_id")),

    "p_sample_stratified" -> ((s, dir) =>
      // exact-fraction per-language sample (smallest hash keys win)
      SampleOps.stratifiedSample(table(s, dir, "documents"), "doc_id", "lang", fraction = 0.2)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),

    "p_mixture" -> ((s, dir) => {
      // data mixing: per-language token budgets, docs taken in hash order
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextOps.tokenCount(col("text")).as("tokens"))
      SampleOps.tokenBudgetMixture(d, "doc_id", "lang", "tokens",
          Map("en" -> 4000L, "de" -> 1500L, "es" -> 1500L, "fr" -> 1000L, "zh" -> 2000L))
        .select(col("doc_id"), col("lang"), col("tokens"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    "p_shuffle" -> ((s, dir) =>
      // deterministic global order randomization (sort + zipWithIndex)
      SampleOps.deterministicShuffle(table(s, dir, "documents"), "doc_id")
        .orderBy("pos")),

    "p_domain_cap" -> ((s, dir) =>
      // per-source frequency cap: at most 10 docs per source, hash-ranked
      SampleOps.domainCap(table(s, dir, "documents"), "doc_id", "source", cap = 10)
        .select(col("doc_id"), col("source"), col("domain_rank"))
        .orderBy("doc_id")),

    "p_corpus" -> ((s, dir) => {
      // end-to-end corpus construction: exact-dedup survivors, quality
      // floor, language filter — the composition a training-data build
      // actually runs, in ONE scan (window-by-fingerprint dedup, no
      // aggregate+join double scan)
      val docs = table(s, dir, "documents")
      DedupOps.dropExactDuplicates(docs, "doc_id", "text")
        .filter(TextOps.qualityScore(col("text")) >= 500 &&
          TextOps.langGuess(col("text")) === "en")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    "p_pack" -> ((s, dir) => {
      // sequence packing: docs -> 2048-token training sequences, 8
      // hash shards packing independently (no global sort anywhere)
      val d = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("tokens"))
      SampleOps.packSequences(d, "doc_id", "tokens", seqTokens = 2048L, shards = 8)
        .select(col("doc_id"), col("tokens"), col("shard"), col("seq_no"), col("seq_offset"))
        .orderBy("doc_id")
    }),

    // ---- training-data pipeline: multimodal columns ----

    "m_media_decode" -> ((s, dir) => {
      // REAL header decode over PLANTED binaries (the t_redact planted-
      // input technique): each doc becomes a genuine PNG/JPEG/WAV header
      // (by doc_id % 4) whose fields are arithmetic in doc_id, so the
      // oracle predicts what the byte-level parser must read back; the
      // %4==3 docs get magic-less junk (0x00-prefixed md5) and must fall
      // through to the documented md5-stub fields
      val docs = table(s, dir, "documents").withColumn("blob", unhex(mediaHex))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.decodeMedia(media)
        .orderBy("media_id")
    }),

    "m_media_batch" -> ((s, dir) => {
      // partition-batched decode (mapPartitions, per-partition init) —
      // the heavy-decoder plumbing shape; stub results match m_media_decode
      val docs = table(s, dir, "documents").withColumn("blob", unhex(md5(col("text"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "image/fake")
      MultimodalOps.decodeImageBatched(media)
        .orderBy("media_id")
    }),

    "m_media_resize" -> ((s, dir) => {
      // fit-into-64-box integer resize planning over REAL decoded dims:
      // even doc_ids plant a PNG header, odd ones a JPEG — the box math
      // runs on what the byte parser read, not on stub hashes
      val docs = table(s, dir, "documents").withColumn("blob",
        unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(jpegHex)))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resizePlan(MultimodalOps.decodeMedia(media), box = 64)
        .orderBy("media_id")
    }),

    "m_media_features" -> ((s, dir) => {
      // real per-byte feature extraction over the blob content
      val docs = table(s, dir, "documents").withColumn("blob", unhex(md5(col("text"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "image/fake")
      MultimodalOps.byteFeatures(media).orderBy("media_id")
    }),

    "m_media_frames" -> ((s, dir) => {
      // frame-sampling plumbing; rows-only check (binary slicing)
      val docs = table(s, dir, "documents").withColumn("blob", unhex(md5(col("text"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "video/fake")
      MultimodalOps.sampleFrames(media, chunkBytes = 4, everyNth = 2)
        .select(col("media_id"), col("frame_no"), length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy("media_id", "frame_no")
    }),

    "m_media_pixels" -> ((s, dir) => {
      // REAL pixel-stage decode over planted PNGs — the planted-input
      // technique one level deeper than m_media_decode: each %4!=3 doc
      // becomes a genuine deflate-compressed 16x16 gray-8 PNG whose
      // PIXELS are arithmetic in doc_id (pixel(i) = (doc_id*7+i*13)%256)
      // with the scanline filter cycling (r+doc_id)%5, so the oracle's
      // pixel-stat prediction only matches if inflate AND all five
      // filter reversals are byte-exact. Odd doc_ids additionally plant
      // the stream Adam7-INTERLACED — the deinterlaced pixels must be
      // identical, so the same oracle pins the seven-pass scatter too.
      // %4==3 docs get magic-less junk and must fall back to
      // compressed-blob stats, decoded=false.
      val buildPng = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h)(i => ((docId * 7 + i * 13) % 256).toByte)
        MultimodalOps.encodePngGray(px, w, h, r => ((r + docId) % 5).toInt,
          interlace = docId % 2 == 1)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex))
          .otherwise(buildPng(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.pixelFeatures(media).orderBy("media_id")
    }),
    "m_media_pixels_depth" -> ((s, dir) => {
      // the NON-8-bit PNG depths end-to-end: each doc_id%4 class
      // plants a genuine 16x16 grayscale PNG at depth 1/2/4/16 with
      // pixels arithmetic in doc_id, filters cycling (r+doc_id)%5 and
      // odd ids Adam7-interlaced — the oracle's stats only match if
      // the byte-granular filter reversal, the MSB-first sub-byte
      // unpack (with visual-range scaling) and the 16-bit high-byte
      // mapping are all exact
      val buildPng = udf { (docId: Long) =>
        val w = 16; val h = 16
        val m = (docId % 4).toInt
        val depth = m match { case 0 => 1; case 1 => 2; case 2 => 4; case _ => 16 }
        val mod = if (depth == 16) 65536 else 1 << depth
        val mult = m match { case 0 => 1L; case 1 => 3L; case 2 => 7L; case _ => 2654L }
        val add = m match { case 0 => 1L; case 1 => 5L; case 2 => 3L; case _ => 997L }
        val vals = Array.tabulate(w * h)(i => ((docId * mult + i * add) % mod).toInt)
        MultimodalOps.encodePngGrayDepth(vals, w, h, depth,
          r => ((r + docId) % 5).toInt, interlace = docId % 2 == 1)
      }
      val docs = table(s, dir, "documents")
        .withColumn("blob", buildPng(col("doc_id")))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.pixelFeatures(media).orderBy("media_id")
    }),

    "m_media_samples" -> ((s, dir) => {
      // REAL sample-stage decode over planted WAVs — the m_media_pixels
      // technique for audio (PCM needs no codec, so this stage is fully
      // real): %4==0 docs carry mono 16-bit PCM, %4==1 mono 8-bit,
      // %4==2 stereo 16-bit (same interleaved stream), all 48 samples
      // arithmetic in doc_id, so the oracle's signed-sample stats
      // (floor mean, |peak|, zero crossings) only match if the RIFF
      // walk, the fmt dispatch and both sample widths are byte-exact.
      // %4==3 docs get magic-less junk and must fall back to unsigned
      // compressed-byte stats, decoded=false.
      val buildWav = udf { (docId: Long) =>
        val m = docId % 4
        if (m == 1L) {
          val s8 = Array.tabulate(48)(i => (((docId * 31 + i * 17) % 256) - 128).toInt)
          MultimodalOps.encodeWavPcm(s8, bits = 8, channels = 1, sampleRate = 8000)
        } else {
          val s16 = Array.tabulate(48)(i => (((docId * 31 + i * 17) % 65536) - 32768).toInt)
          MultimodalOps.encodeWavPcm(s16, bits = 16,
            channels = if (m == 2L) 2 else 1, sampleRate = 16000)
        }
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildWav(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.sampleFeatures(media).orderBy("media_id")
    }),

    "m_audio_g711" -> ((s, dir) => {
      // G.711 telephony WAVs: even docs mu-law (format 7), odd docs
      // A-law (format 6) — planted companded bytes expanded by the
      // segment arithmetic, so the sample stats only match if the
      // expansion formulas are bit-right. %4==3 docs -> junk fallback.
      val buildWav = udf { (docId: Long) =>
        val bytes = Array.tabulate(48)(i => ((docId * 13 + i * 7) % 256).toByte)
        MultimodalOps.encodeWavG711(bytes,
          fmtCode = if (docId % 2 == 0) 7 else 6, sampleRate = 8000)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildWav(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.sampleFeatures(media).orderBy("media_id")
    }),

    "m_media_samples_deep" -> ((s, dir) => {
      // the deep-audio sample paths: %3==0 docs carry 24-bit PCM
      // (full-range 3-byte signed LE), %3==1 carry IEEE-float WAVs
      // whose samples are k/256 floats (exactly representable, no
      // .5-rounding boundaries) so the decoder's round(f*32767)
      // quantization replays as exact double arithmetic in the
      // oracle; %3==2 docs are magic-less junk -> compressed-byte
      // fallback, decoded=false
      val buildWav = udf { (docId: Long) =>
        if (docId % 3 == 0L) {
          val s24 = Array.tabulate(48)(i =>
            (((docId * 31 + i * 1717) % 16000000) - 8000000).toInt)
          MultimodalOps.encodeWavPcm(s24, bits = 24, channels = 1, sampleRate = 48000)
        } else {
          val fs = Array.tabulate(48)(i =>
            (((docId * 31 + i * 17) % 200) - 100).toFloat / 256.0f)
          MultimodalOps.encodeWavFloat(fs, channels = 1, sampleRate = 16000)
        }
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 3 === 2, unhex(unknownHex)).otherwise(buildWav(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.sampleFeatures(media).orderBy("media_id")
    }),

    "m_media_audio_frames" -> ((s, dir) => {
      // windowed audio features over the same planted WAVs: 3 frames
      // of 16 samples each — integer energy, floor'd milli RMS,
      // frame-local zero crossings; junk docs fall back to one
      // unsigned-byte frame, decoded=false
      val buildWav = udf { (docId: Long) =>
        val m = docId % 4
        if (m == 1L) {
          val s8 = Array.tabulate(48)(i => (((docId * 31 + i * 17) % 256) - 128).toInt)
          MultimodalOps.encodeWavPcm(s8, bits = 8, channels = 1, sampleRate = 8000)
        } else {
          val s16 = Array.tabulate(48)(i => (((docId * 31 + i * 17) % 65536) - 32768).toInt)
          MultimodalOps.encodeWavPcm(s16, bits = 16,
            channels = if (m == 2L) 2 else 1, sampleRate = 16000)
        }
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildWav(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.audioFrameFeatures(media, frameSize = 16)
        .orderBy("media_id", "frame_no")
    }),

    "m_media_pixels_jpeg" -> ((s, dir) => {
      // REAL baseline-JPEG pixel decode over planted JPEGs — the
      // m_media_pixels technique through the pure-JVM Huffman+IDCT
      // path: each %4!=3 doc becomes a genuine 16x16 grayscale baseline
      // JPEG of four flat 8x8 blocks whose values are arithmetic in
      // doc_id. Flat blocks survive JPEG's lossy round-trip EXACTLY
      // when the DC quant is 8 (coefficient = 8*(v-128)), so the
      // oracle can predict pixel stats despite JPEG being lossy in
      // general — the stats only match if the canonical-Huffman decode,
      // the dequant and the IDCT are all exact. %4==3 docs get
      // magic-less junk and must fall back, decoded=false.
      val buildJpeg = udf { (docId: Long) =>
        val blocks = Array.tabulate(4) { b =>
          val zz = new Array[Int](64)
          zz(0) = (((docId * 13 + b * 29) % 256) - 128).toInt
          zz
        }
        JpegBaseline.encodeGrayBlocks(blocks, 2, 2, Array.fill(64)(8))
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildJpeg(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.pixelFeatures(media).orderBy("media_id")
    }),

    "m_media_pixels_prog" -> ((s, dir) => {
      // REAL progressive-JPEG pixel decode: the m_media_pixels_jpeg
      // planting through the six-scan Annex G path — DC first at Al=1,
      // AC-first bands riding EOB runs, then DC/AC refinement down to
      // Al=0. Same flat blocks, so the stats match the SAME arithmetic
      // as the baseline row — but only if scan accumulation, the DC
      // point transform + refinement OR, the EOB-run bookkeeping and
      // the final dequant+IDCT are all exact. %4==3 docs get junk.
      val buildProg = udf { (docId: Long) =>
        val blocks = Array.tabulate(4) { b =>
          val zz = new Array[Int](64)
          zz(0) = (((docId * 13 + b * 29) % 256) - 128).toInt
          zz
        }
        JpegBaseline.encodeGrayProgressive(blocks, 2, 2, Array.fill(64)(8))
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildProg(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.pixelFeatures(media).orderBy("media_id")
    }),

    "m_media_video" -> ((s, dir) => {
      // REAL video -> frames -> pixels: each %4!=3 doc becomes a
      // genuine AVI container (RIFF hdrl/movi) holding three MJPEG
      // frames, each a 16x16 four-flat-block baseline JPEG arithmetic
      // in (doc_id, frame). The per-frame pixel stats only match the
      // oracle if the RIFF movi walk, the frame chunk extraction AND
      // the whole JPEG decode chain are byte-exact. %4==3 docs get
      // magic-less junk and must fall back to one frame_no=0 byte-stats
      // row, decoded=false.
      val buildAvi = udf { (docId: Long) =>
        val frames = Array.tabulate(3) { j =>
          val blocks = Array.tabulate(4) { b =>
            val zz = new Array[Int](64)
            zz(0) = (((docId * 13 + j * 37 + b * 29) % 256) - 128).toInt
            zz
          }
          JpegBaseline.encodeGrayBlocks(blocks, 2, 2, Array.fill(64)(8))
        }
        MultimodalOps.encodeAviMjpeg(frames, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildAvi(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.videoFrameFeatures(media).orderBy("media_id", "frame_no")
    }),

    "m_media_phash" -> ((s, dir) => {
      // perceptual hash over decoded pixels: 50 base image classes
      // (base = doc_id % 50) planted as lossless GIFs — docs of one
      // class are IDENTICAL images in different rows, so their aHash
      // must agree bit-for-bit; the oracle replays resample + mean +
      // threshold bits. Junk rows report decoded=false, zero halves.
      val buildGif = udf { (docId: Long) =>
        val base = docId % 50
        val px = Array.tabulate(256)(i => (((base * 11 + i.toLong * i * 13) % 256)).toByte)
        GifPixels.encodeGifGray(px, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildGif(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.perceptualHash(media).orderBy("media_id")
    }),

    "m_media_phash_dups" -> ((s, dir) => {
      // image dedup on the hash: per phash group of DECODED images,
      // canonical min id + copy count — exactDuplicates semantics in
      // pixel space (byte-identical containers not required)
      val buildGif = udf { (docId: Long) =>
        val base = docId % 50
        val px = Array.tabulate(256)(i => (((base * 11 + i.toLong * i * 13) % 256)).toByte)
        GifPixels.encodeGifGray(px, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildGif(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.perceptualHash(media)
        .filter(col("decoded"))
        .groupBy("phash_hi", "phash_lo")
        .agg(min(col("media_id")).as("canonical_id"), count(lit(1)).as("dup_count"))
        .filter(col("dup_count") >= 2)
        .orderBy("canonical_id")
    }),

    "m_media_resample" -> ((s, dir) => {
      // REAL nearest-neighbor resample over decoded pixels: the same
      // lossless planted GIFs as m_media_pixels_gif, fit into an 8-box
      // (16x16 -> 8x8, src index (dst*16) div 8 = 2*dst per axis), so
      // every RESAMPLED pixel — and its stats — replays in SQL; junk
      // rows fall back to byte stats with zero dims
      val buildGif = udf { (docId: Long) =>
        val px = Array.tabulate(256)(i => (((docId * 11 + i.toLong * i * 13) % 256)).toByte)
        GifPixels.encodeGifGray(px, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildGif(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_gif" -> ((s, dir) => {
      // REAL GIF/LZW pixel decode over planted GIFs — LZW is LOSSLESS,
      // so unlike the JPEG row (flat blocks only) ANY index pattern is
      // oracle-predictable: pixel(i) = (doc_id*11 + i*i*13) % 256
      // exercises non-trivial dictionary growth per blob, and the
      // stats only match if the sub-block walk, the code-width
      // schedule and every dictionary expansion are exact. %4==3 docs
      // get magic-less junk and must fall back, decoded=false.
      val buildGif = udf { (docId: Long) =>
        val px = Array.tabulate(256)(i => (((docId * 11 + i.toLong * i * 13) % 256)).toByte)
        GifPixels.encodeGifGray(px, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildGif(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.pixelFeatures(media).orderBy("media_id")
    }),

    "m_media_gif_interlaced" -> ((s, dir) => {
      // INTERLACED GIF decode (Appendix E four-pass row interleave),
      // pinned by an ORDER-SENSITIVE stage: resampledStats samples
      // source pixel (2y, 2x) of the de-interlaced image, so a decoder
      // that returned rows in stream order would produce wrong stats
      // for every odd doc (odd docs plant interlaced, even docs plant
      // sequential — SAME pixel formula, so one oracle covers both and
      // the query IS the container-invariance property at scale).
      val buildGif = udf { (docId: Long) =>
        val px = Array.tabulate(256)(i => (((docId * 11 + i.toLong * i * 13) % 256)).toByte)
        if (docId % 2 == 1) GifPixels.encodeGifGrayInterlaced(px, 16, 16)
        else GifPixels.encodeGifGray(px, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildGif(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_bmp" -> ((s, dir) => {
      // 24-bit BMP decode pinned by the ORDER-SENSITIVE resample
      // stage: resampledStats samples source pixel (2y, 2x) of the
      // LOGICAL top-down image; odd docs store the same pixels
      // TOP-DOWN (negative biHeight), even docs BOTTOM-UP — same
      // pixel formula, one oracle, so a decoder that forgot the row
      // flip fails every even doc. %4==3 docs get magic-less junk ->
      // compressed-byte fallback, decoded=false.
      val buildBmp = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h * 3)(i => ((docId * 7 + i * 13) % 256).toByte)
        MultimodalOps.encodeBmp24(px, w, h, topDown = docId % 2 == 1)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildBmp(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_ico" -> ((s, dir) => {
      // ICO favicon decode pinned by the ORDER-SENSITIVE resample
      // stage: the XOR image is stored bottom-up behind a doubled
      // biHeight and an AND mask — only exact ICONDIR + DIB walking,
      // the row flip and the mask skip reproduce the planted
      // top-down stream. %4==3 docs -> junk fallback.
      val buildIco = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h * 3)(i => ((docId * 9 + i * 19) % 256).toByte)
        MultimodalOps.encodeIco24(px, w, h)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildIco(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_pcx" -> ((s, dir) => {
      // PCX decode pinned through the resample stage: pixel PAIRS are
      // constant per channel, so each plane-separated scan line holds
      // genuine RLE runs; values >= 0xC0 occur and must round-trip the
      // forced-1-run rule; odd width would pad bytesPerLine even
      // (width 16 keeps the oracle's index math clean). %4==3 docs ->
      // junk fallback on the one-byte-magic consistency sniff.
      val buildPcx = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h * 3)(i =>
          ((docId * 17 + (i / 6) * 11 + (i % 3) * 3) % 256).toByte)
        MultimodalOps.encodePcx(px, w, h)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildPcx(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_ff" -> ((s, dir) => {
      // farbfeld decode through the resample stage: the first 16-bit
      // source — fixtures expand 8-bit RGBA as v*257, the decoder's
      // high-byte downscale must invert it exactly; the exact-length
      // contract and the per-dim bomb bound are spec-pinned. %4==3
      // docs -> magic-less junk fallback.
      val buildFf = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h * 4)(i =>
          ((docId * 11 + (i / 7) * 3 + (i % 4) * 5) % 256).toByte)
        MultimodalOps.encodeFarbfeld(px, w, h)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildFf(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_qoi" -> ((s, dir) => {
      // QOI decode pinned through the resample stage: 3-pixel constant
      // groups make the encoder emit genuine RUN packets, the +5 group
      // steps emit LUMA deltas, per-channel +7 offsets keep channels
      // distinct — the decoder must replay the op state machine
      // (previous pixel + 64-slot seen array) exactly. %4==3 docs ->
      // magic-less junk fallback.
      val buildQoi = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h * 3)(i =>
          ((docId * 13 + (i / 9) * 5 + (i % 3) * 7) % 256).toByte)
        MultimodalOps.encodeQoi(px, w, h)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildQoi(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_tga" -> ((s, dir) => {
      // TGA decode pinned by the ORDER-SENSITIVE resample stage: the
      // pixel formula repeats each value for a PIXEL PAIR, so %3==0
      // docs (RLE type 10) store genuine run packets the decoder must
      // expand, while odd docs flip row order via descriptor bit 5 —
      // one oracle covers raw/RLE x top-down/bottom-up. %4==3 docs ->
      // magic-less junk fallback (TGA's no-magic sniff must REFUSE
      // them on header inconsistency alone).
      val buildTga = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h * 3)(i =>
          ((docId * 21 + ((i / 6) * 3 + i % 3) * 29) % 256).toByte)
        MultimodalOps.encodeTga24(px, w, h,
          rle = docId % 3 == 0, topDown = docId % 2 == 1)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildTga(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_pnm" -> ((s, dir) => {
      // binary netpbm decode: %2==0 docs are P6 RGB, %2==1 docs P5
      // grayscale (different n_vals per parity pins the channel
      // count), headers carry a comment line the ASCII walk must
      // skip. %4==3 docs -> junk fallback.
      val buildPnm = udf { (docId: Long) =>
        val w = 16; val h = 16
        val ch = if (docId % 2 == 0) 3 else 1
        val px = Array.tabulate(w * h * ch)(i => ((docId * 5 + i * 31) % 256).toByte)
        MultimodalOps.encodePnm(px, w, h, ch)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildPnm(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_ras" -> ((s, dir) => {
      // Sun Raster decode: %2 parity picks RGB (stored BGR the decoder
      // must swap back) vs grayscale — different n_vals per parity pin
      // the channel count; %3==0 docs store Sun byte-RLE (pixel PAIRS
      // share values so the encoder emits genuine 0x80-escape runs,
      // free to cross row boundaries). %4==3 docs -> magic-less junk.
      val buildRas = udf { (docId: Long) =>
        val w = 16; val h = 16
        val ch = if (docId % 2 == 0) 3 else 1
        val px = Array.tabulate(w * h * ch)(i =>
          ((docId * 19 + (i / (2 * ch)) * 23 + (i % ch) * 7) % 256).toByte)
        MultimodalOps.encodeRas(px, w, h, ch, rle = docId % 3 == 0)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildRas(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_pixels_hdr" -> ((s, dir) => {
      // Radiance RGBE decode, BOTH scanline generations: even docs are
      // new-style RLE (four separated component streams per row; pixel
      // PAIRS share values along x so the encoder emits genuine run
      // packets); odd docs are OLD-STYLE rows (flat 4-byte RGBE with
      // the (1,1,1,n) previous-pixel repeat convention; pixel QUADS
      // share values so genuine run markers appear). Output = the raw
      // 4-channel RGBE byte planes (exposure-preserving — floats never
      // enter the integer contract). %4==3 docs -> magic-less junk.
      val buildHdr = udf { (docId: Long) =>
        val w = 16; val h = 16
        val group = if (docId % 2 == 1) 4 else 2
        val px = Array.tabulate(w * h * 4)(i =>
          ((docId * 23 + ((i / 4) / group) * 13 + (i % 4) * 5) % 256).toByte)
        if (docId % 2 == 1) MultimodalOps.encodeHdrOld(px, w, h)
        else MultimodalOps.encodeHdr(px, w, h)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildHdr(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_exif" -> ((s, dir) => {
      // EXIF orientation audit: each %4!=3 doc is a real baseline
      // JPEG with an APP1 EXIF segment planted right after SOI —
      // orientation (doc%8)+1 through BOTH TIFF byte orders
      // ((doc/8)%2 picks MM) — the rotation metadata an
      // orientation-blind pixel pipeline silently bakes into crops.
      // %4==3 docs get magic-less junk: has_exif=false, orientation 0.
      val buildJpeg = udf { (docId: Long) =>
        val blocks = Array.tabulate(4) { b =>
          val zz = new Array[Int](64)
          zz(0) = (((docId * 13 + b * 29) % 256) - 128).toInt
          zz
        }
        MultimodalOps.withExifOrientation(
          JpegBaseline.encodeGrayBlocks(blocks, 2, 2, Array.fill(64)(8)),
          orientation = (docId % 8).toInt + 1,
          bigEndian = (docId / 8) % 2 == 1)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildJpeg(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.exifAudit(media).orderBy("media_id")
    }),

    "m_media_goertzel" -> ((s, dir) => {
      // integer Goertzel over planted square waves: period-8 wave
      // (fundamental at fs/8) + small jitter, probed at coef 1414
      // (= round(2cos(2pi/8)*1000), the on-bin), 0 (fs/4 — even
      // harmonic, near-null for a square) and -1414 (3fs/8). The
      // oracle walks the same quantized recurrence per (doc, bin)
      // with a recursive CTE. %4==3 docs -> junk fallback row.
      val buildWav = udf { (docId: Long) =>
        val amp = 100 + (docId % 50).toInt
        val smp = Array.tabulate(48) { i =>
          val base = if ((i / 4) % 2 == 0) amp else -amp
          base + ((docId * 7 + i * 3) % 5).toInt - 2
        }
        MultimodalOps.encodeWavPcm(smp, bits = 16, channels = 1, sampleRate = 8000)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildWav(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.goertzelTones(media, coefsMilli = Seq(1414L, 0L, -1414L))
        .orderBy("media_id", "bin")
    }),

    "m_media_samples_adpcm" -> ((s, dir) => {
      // REAL IMA-ADPCM sample decode: each %4!=3 doc carries two
      // 8-nibble-byte blocks whose headers and nibbles are doc_id
      // arithmetic — the decoded stream is the nonlinear integer
      // recurrence (step table, ±diff, clamps), so the oracle replays
      // it with a recursive CTE over the SAME 89-entry table; only a
      // bit-exact decoder (low nibble first, header sample emitted,
      // clamped predictor walk) matches. %4==3 docs -> junk fallback.
      val buildAdpcm = udf { (docId: Long) =>
        val blocks = Array.tabulate(2) { blk =>
          val pred = ((docId * 97 + blk * 1013) % 4096 - 2048).toInt
          val idx = ((docId + blk * 7) % 89).toInt
          val nib = Array.tabulate(8)(i => ((docId * 3 + (blk * 8 + i) * 11) % 256).toByte)
          (pred, idx, nib)
        }
        MultimodalOps.encodeWavAdpcm(blocks, 8000)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildAdpcm(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.sampleFeatures(media).orderBy("media_id")
    }),

    "m_media_pixels_tiff" -> ((s, dir) => {
      // baseline TIFF decode pinned by the ORDER-SENSITIVE resample
      // stage: one pixel formula, but the STORED bytes differ per doc
      // across every container axis the decoder must normalize away —
      // endian (odd docs MM), PackBits ((id/2)%2), WhiteIsZero
      // inversion ((id/4)%2), and a 4-row strip layout everywhere.
      // Only exact strip reassembly + decompression + photometric
      // normalization can match the single oracle. %4==3 docs get
      // magic-less junk -> compressed-byte fallback, decoded=false.
      val buildTiff = udf { (docId: Long) =>
        val w = 16; val h = 16
        val px = Array.tabulate(w * h)(i => ((docId * 5 + i * 17) % 256).toByte)
        MultimodalOps.encodeTiff(px, w, h, 1,
          bigEndian = docId % 2 == 1, packBits = (docId / 2) % 2 == 1,
          rowsPerStrip = 4, whiteIsZero = (docId / 4) % 2 == 1)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildTiff(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.resampledStats(media, box = 8).orderBy("media_id")
    }),

    "m_media_video_gif" -> ((s, dir) => {
      // the OTHER multi-frame container: each %4!=3 doc becomes an
      // animated GIF of three full-screen 16x16 frames, every frame an
      // independent LZW stream over a (doc_id, frame)-arithmetic index
      // pattern — videoFrameFeatures walks them like AVI movi chunks.
      // LZW is lossless, so all three per-frame stat rows replay
      // exactly. %4==3 docs get magic-less junk -> one fallback row.
      val buildGifAnim = udf { (docId: Long) =>
        val frames = Array.tabulate(3) { j =>
          Array.tabulate(256)(i => (((docId * 7 + j * 19 + i.toLong * i * 13) % 256)).toByte)
        }
        GifPixels.encodeGifGrayFrames(frames, 16, 16)
      }
      val docs = table(s, dir, "documents").withColumn("blob",
        when(col("doc_id") % 4 === 3, unhex(unknownHex)).otherwise(buildGifAnim(col("doc_id"))))
      val media = MultimodalOps.toMediaFrame(docs, "doc_id", "blob", "mixed")
      MultimodalOps.videoFrameFeatures(media).orderBy("media_id", "frame_no")
    }),

    "d_dedup_lines" -> ((s, dir) => {
      // CCNet-style line dedup: the corpus is single-line word soup, so
      // lines are synthesized deterministically as 6-word windows (the
      // same planted-input trick as t_redact); a line in >1 documents
      // is boilerplate and is removed from every document
      TextOps.dedupLines(linedDocs(s, dir), "doc_id", "text", maxDocFreq = 1)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t_repetition" -> ((s, dir) => {
      // Gopher-family repetition signals over the lined corpus; the
      // corpus has no natural within-doc line repetition, so every 5th
      // doc gets its first line appended again (planted-input trick,
      // like t_redact's PII) — dup_line_frac is then a real signal
      val planted = linedDocs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit("\n"), element_at(split(col("text"), "\n"), 1)))
          .otherwise(col("text")).as("text"))
      TextOps.repetitionSignals(planted, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "p_vocab" -> ((s, dir) =>
      // corpus vocabulary: global token counts, the BPE-training first step
      TextOps.vocabulary(table(s, dir, "documents"), "text", topK = 100)
        .orderBy("rank")),

    "p_bpe" -> ((s, dir) =>
      // distributed BPE trainer: first 4 merges over the corpus
      // word-frequency table; corpus scanned once, steps on vocab
      TextOps.bpeMerges(table(s, dir, "documents"), "text", steps = 4)
        .orderBy("step")),

    "p_bpe_encode" -> ((s, dir) =>
      // apply the 4 trained merges back: per-doc word + BPE token
      // counts via one join to the vocab-sized token-count map
      TextOps.bpeEncodeCounts(table(s, dir, "documents"), "doc_id", "text",
          steps = 4)
        .orderBy("doc_id")),

    "p_subword_vocab" -> ((s, dir) =>
      // SentencePiece-style SEED vocabulary: all 2..4-char substrings
      // of corpus words weighted by word frequency, scored freq x len,
      // top 64 — the candidate set a unigram-LM trainer prunes
      TextOps.subwordVocab(table(s, dir, "documents"), "text",
          vocabSize = 64, maxLen = 4)
        .orderBy("rank")),

    "d_dedup_cdc" -> ((s, dir) =>
      // content-defined-chunking duplication audit (LBFS/FastCDC,
      // deterministic md5 form): boundaries where the trailing 8-gram
      // hashes 0 mod 64, chunk fps counted corpus-wide — per-doc
      // boilerplate-share numbers, chunking rides the scan, one fp
      // aggregate, no pair join anywhere
      DedupOps.cdcChunkStats(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "p_fps_diverse" -> ((s, dir) => {
      // farthest-point (k-center greedy) diversity sample over the
      // embedding corpus: 6 rounds of "take the point farthest from
      // everything chosen", running min-dist folded against the
      // latest centroid only — one scan per round, k vectors to the
      // driver, the coreset selector near-dup-heavy corpora need
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.farthestPointSample(e, k = 6).orderBy("rank")
    }),

    "p_fps_coreset" -> ((s, dir) => {
      // the 100 TB execution of p_fps_diverse: a deterministic
      // md5-ranked pool of 64 vectors (one distributed top-k — the
      // only corpus-scale work), then the exact Gonzalez greedy on
      // the pool, so the k driver round-trips touch a pool-sized
      // frame regardless of corpus size
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.farthestPointSampleCoreset(e, k = 6, poolSize = 64)
        .orderBy("rank")
    }),

    "d_dedup_cdc_pairs" -> ((s, dir) =>
      // chunk-level containment candidates: doc pairs sharing >= 2
      // content-defined chunks (df cap 100 drops boilerplate fps
      // before the pair join) — catches verbatim paragraph reuse that
      // whole-doc fps miss and winnow prices differently
      DedupOps.cdcContainmentPairs(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "p_unigram_lm" -> ((s, dir) =>
      // the full unigram-LM EM trainer over that seed (Kudo ACL-2018):
      // 2 rounds of deterministic Viterbi E-step (integer micro-nat
      // costs, min cost -> fewest tokens -> longest piece) + recount/
      // prune M-step; per round one pass over DISTINCT words, vocab
      // and costs stay model-sized
      TextOps.unigramLmVocab(table(s, dir, "documents"), "text",
          vocabSize = 64, maxLen = 4, emRounds = 2)
        .orderBy("rank")),

    "p_maxmatch_encode" -> ((s, dir) =>
      // WordPiece-style greedy longest-match encoding against the
      // seed vocab: per-doc word + subword counts (single-char
      // fallback), segmentation priced once per DISTINCT word
      TextOps.maxMatchCounts(table(s, dir, "documents"), "doc_id", "text",
          vocabSize = 64, maxLen = 4)
        .orderBy("doc_id")),

    "p_curriculum" -> ((s, dir) =>
      // per-lang quality deciles: integer (rank-1)*10 div n buckets,
      // easiest (highest-quality) docs in bucket 0
      SampleOps.curriculumBuckets(table(s, dir, "documents"), "doc_id",
          TextOps.qualityScore(col("text")), "lang", k = 10)
        .withColumnRenamed("grp", "lang").withColumnRenamed("id", "doc_id")
        .withColumnRenamed("score", "quality")
        .orderBy("doc_id")),

    "p_pack_curriculum" -> ((s, dir) =>
      // packing that RESPECTS the curriculum: every 2048-token
      // sequence is bucket-pure (pack partition = bucket x shard) and
      // sched_no feeds bucket 0's sequences before bucket 1's within
      // each shard — plain packing would shuffle difficulty into
      // every sequence and destroy the schedule
      SampleOps.packCurriculum(
          table(s, dir, "documents")
            .select(col("doc_id"), col("lang"), col("text"),
              TextOps.tokenCount(col("text")).as("tokens")),
          "doc_id", "tokens", TextOps.qualityScore(col("text")), "lang",
          k = 4, seqTokens = 2048L, shards = 4)
        .select(col("doc_id"), col("tokens"), col("bucket"), col("shard"),
          col("seq_no"), col("sched_no"), col("seq_offset"))
        .orderBy("doc_id")),

    "p_shard" -> ((s, dir) =>
      // rendezvous sharding into 16 shards: the stable layout key —
      // adding a shard moves only the docs the new shard wins
      SampleOps.rendezvousShard(table(s, dir, "documents"), "doc_id", shards = 16)
        .orderBy("doc_id")),

    "p_split_grouped" -> ((s, dir) =>
      // leakage-safe split: assignment keyed on the DOMAIN hash, so
      // same-source near-duplicates can never straddle train/test
      SampleOps.splitAssign(table(s, dir, "documents"), "source",
          Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id")),

    "p_stats" -> ((s, dir) =>
      // corpus composition per (source, lang) — the mixture-design input
      SampleOps.corpusStats(table(s, dir, "documents"), Seq("source", "lang"), "text")
        .orderBy("source", "lang")),

    "p_label_balance" -> ((s, dir) =>
      // class-balance go/no-go: one integer-exact row (shares + Gini
      // in ppm) over the labeled embedding set
      SampleOps.labelBalance(table(s, dir, "embeddings"), "label")),

    "p_neg_sampling" -> ((s, dir) =>
      // word2vec negative-sampling table: top-50 vocab, freq^(3/4)
      // weights via the fixed floor-sqrt chain, table shares in ppm
      TextOps.negativeSamplingTable(table(s, dir, "documents"), "text", topK = 50)),

    "p_shard_skew" -> ((s, dir) =>
      // layout skew audit over the 16-way rendezvous sharding: docs,
      // chars and load-vs-fair-mean ppm per shard
      SampleOps.shardSkew(table(s, dir, "documents"), "doc_id", "text", shards = 16)
        .orderBy("shard")),

    "s_centroids" -> ((s, dir) =>
      // per-label exact mean embedding (class centroids) in the
      // exploded (label, pos, mean, n) form — flat scalar columns the
      // columnar checker can sort/hash; labelCentroids assembles the
      // same rows into the array facade for API users
      KMeansOps.labelCentroidComponents(table(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "pos")),

    "s_silhouette" -> ((s, dir) =>
      // cluster-quality score per label: simplified silhouette against
      // the exact label centroids, micro-quantized per vector so the
      // per-label mean is integral division (no float-sum ordering)
      KMeansOps.labelSilhouette(table(s, dir, "embeddings"), "vec_id", "label", "embedding")
        .orderBy("label")),

    "s_bitext_margin" -> ((s, dir) => {
      // ratio-margin pair mining between two embedding sets (labels 0
      // and 1 as the two sides): each source aligns to its best-margin
      // target when the margin clears 1.0 — hubs are suppressed by the
      // neighborhood-mean denominator
      val e = table(s, dir, "embeddings")
      def side(l: Int) = e.filter(col("label") === l)
        .select(col("vec_id").as("id"), col("embedding"))
      SimilarityOps.marginAlign(side(0), side(1), k = 4, minMarginPpm = 1000000L)
        .orderBy("src_id")
    }),

    "d_dedup_semantic" -> ((s, dir) => {
      // SemDeDup: deterministic k-means (k=8, 2 Lloyd rounds), exact
      // cosine verify within each cell — the oracle replays the full
      // training loop thanks to quantized-integer centroid means
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      KMeansOps.semanticNearDuplicates(e, "id", "embedding", minCosine = 0.25, k = 8, iters = 2)
        .orderBy("id_a", "id_b")
    }),

    "s_ann_ivf_trained" -> ((s, dir) => {
      // IVF ANN with a TRAINED codebook (2 Lloyd rounds) — cells adapt
      // to the corpus, unlike s_ann_ivf's fixed md5 codebook
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      KMeansOps.ivfTopKTrained(e.filter(col("id") < 5), e, k = 5,
          ncells = 16, nprobe = 6, iters = 2)
        .orderBy("query_id", "rank")
    }),

    "s_ann_pq" -> ((s, dir) => {
      // product-quantized ANN: 8 subquantizers x 32 cells (one Lloyd
      // round each) rank the whole corpus from 8-int codes + a
      // per-query integer distance table; float vectors are only
      // touched for the 50-candidate exact-cosine re-rank
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      PqOps.pqTopK(e.filter(col("id") < 5), e, topk = 5,
          m = 8, k = 32, iters = 1, cand = 50)
        .orderBy("query_id", "rank")
    }),

    "s_ann_opq" -> ((s, dir) => {
      // OPQ (Ge et al. 2013, non-parametric): 3 alternations of
      // {fresh sub-codebooks on the rotated corpus, Procrustes
      // rotation re-solve} learn an orthonormal basis that
      // decorrelates the 8 subspaces before quantization; the ADC
      // scan runs on rotated codes (rotation preserves L2), the
      // exact-cosine re-rank on the ORIGINAL floats. Same geometry
      // as s_ann_pq (m=8, k=32, cand=50); measured recall@5 0.86 vs
      // raw PQ's 0.81 at that identical budget
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      PqOps.opqTopK(e.filter(col("id") < 5), e, topk = 5,
          m = 8, k = 32, iters = 1, cand = 50, opqIters = 3)
        .orderBy("query_id", "rank")
    }),

    "s_ann_ivf_pq" -> ((s, dir) => {
      // IVF+PQ (FAISS IndexIVFPQ shape): trained coarse cells prune
      // the scan to nprobe/ncells of the corpus, PQ codes shrink each
      // scanned candidate to 8 ints, exact cosine re-ranks the ADC
      // shortlist — both stages replayed end-to-end by the oracle
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      PqOps.ivfPqTopK(e.filter(col("id") < 5), e, topk = 5,
          ncells = 16, nprobe = 6, coarseIters = 2,
          m = 8, k = 32, pqIters = 1, cand = 50)
        .orderBy("query_id", "rank")
    }),

    "s_ann_ivf_opq" -> ((s, dir) => {
      // IVF+OPQ: the learned rotation applied to the CODE stage only —
      // coarse cosine cells are rotation-invariant in quality (an
      // orthonormal basis preserves angles), so they stay on original
      // vectors and replay byte-identical to s_ann_ivf_pq's, while the
      // sub-codebooks/codes/distance-tables decorrelate in rotated
      // space (where OPQ pays). Recall >= IVF+PQ at identical
      // geometry, spec-pinned.
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      PqOps.ivfOpqTopK(e.filter(col("id") < 5), e, topk = 5,
          ncells = 16, nprobe = 6, coarseIters = 2,
          m = 8, k = 32, pqIters = 1, cand = 50, opqIters = 3)
        .orderBy("query_id", "rank")
    }),

    "s_recall_ivf_opq" -> ((s, dir) => {
      // the audit row pricing what the rotation buys under IVF
      // pruning (the probe set caps the gain — measured +0.01 over
      // ivf+pq at 25/50 queries, never below)
      val e = table(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
      val q = e.filter(col("id") < 5)
      SimilarityOps.recallAudit(
          PqOps.ivfOpqTopK(q, e, topk = 5, ncells = 16, nprobe = 6,
            coarseIters = 2, m = 8, k = 32, pqIters = 1, cand = 50, opqIters = 3),
          SimilarityOps.bruteForceTopK(q, e, k = 5))
        .orderBy("query_id")
    }),

    "s_covariance" -> ((s, dir) =>
      // exact-integer embedding covariance (upper triangle, 0-based):
      // one mapPartitions pass -> dim²/2 LONG partials per partition
      PcaOps.covariance(table(s, dir, "embeddings"), "embedding", 64)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("n"), col("cov"))
        .orderBy("i", "j")),

    "s_quantize_int8" -> ((s, dir) =>
      // per-dimension min/max int8 codes (faiss SQ8): stats pass is a
      // dim-row model broadcast back; codes pass a pure projection
      SimilarityOps.quantizeInt8(table(s, dir, "embeddings"), "vec_id", "embedding")
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "pos")),

    "t_rarity" -> ((s, dir) =>
      // corpus-frequency rarity (the integer-exact perplexity stand-in):
      // rare = global occurrence count < 20 at sf0.01's ~31-token vocab
      TextOps.rarityStats(table(s, dir, "documents"), "doc_id", "text", rareBelow = 20L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t_perplexity" -> ((s, dir) =>
      // corpus-trained unigram-LM mean NLL (nats) per doc — the real
      // log-domain perplexity signal next to t_rarity's integer proxy
      TextOps.unigramNll(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_postings" -> ((s, dir) =>
      // inverted index: first 5 postings + df for tokens in >= 20 docs
      TextOps.invertedIndex(table(s, dir, "documents"), "doc_id", "text",
          minDf = 20L, perToken = 5)
        .orderBy("token", "rank")),

    "t_dsir" -> ((s, dir) => {
      // DSIR importance weights: raw docs scored by a target-domain
      // (benchmark split) unigram LM against the raw-corpus LM
      val docs = table(s, dir, "documents")
      TextOps.dsirWeights(docs.filter(col("doc_id") >= 50), "doc_id", "text",
          docs.filter(col("doc_id") < 50), "text")
        .orderBy("doc_id")
    }),

    "t_quality_rank" -> ((s, dir) =>
      // keep the top 10% per language by quality score — integer
      // rank-retention test, no percentile float anywhere
      TextOps.qualityTopFraction(table(s, dir, "documents"), "doc_id", "text",
          "lang", permille = 100)
        .withColumnRenamed("grp", "lang").withColumnRenamed("id", "doc_id")
        .orderBy("lang", "rank")),

    "t_perplexity2" -> ((s, dir) =>
      // corpus-trained bigram-LM mean NLL: the context-aware sibling
      // of t_perplexity; high-here + low-there = word salad
      TextOps.bigramNll(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_entropy" -> ((s, dir) =>
      // per-doc token-distribution entropy + length-normalized form:
      // the low-diversity (template/boilerplate) gate
      TextOps.tokenEntropy(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "t_novelty" -> ((s, dir) =>
      // fraction of each doc's distinct trigrams found in no other doc
      // — the memorization/boilerplate signal; inverted-df shape
      TextOps.noveltyStats(table(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "t_topterms" -> ((s, dir) =>
      // exact heavy hitters: 5 most frequent tokens per language,
      // WindowGroupLimit prunes to 5 per group before the shuffle
      TextOps.topTerms(table(s, dir, "documents"), "lang", "text", 5)
        .orderBy("lang", "rank")),

    "t_tfidf" -> ((s, dir) =>
      // top-3 tf-idf keywords per doc; 1e-6-quantized LONG scores
      TextOps.tfidfTop(table(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rank")),

    "t_pmi" -> ((s, dir) =>
      // top-20 bigram collocations by PMI, pairs seen >= 5 times
      TextOps.pmiBigrams(table(s, dir, "documents"), "text",
          minCount = 5L, n = 20)
        .orderBy("rank")),

    "p_sample_weighted" -> ((s, dir) =>
      // A-ES weighted sampling: 10 docs per lang, selection probability
      // proportional to length; integer-quantized ln(u)/w ranking keys
      SampleOps.weightedSample(table(s, dir, "documents"), "doc_id",
          greatest(length(col("text")), lit(1)), "lang", 10)
        .orderBy("lang", "rank")),

    "s_label_knn" -> ((s, dir) => {
      // k-NN auto-labeling: majority label of the 5 nearest neighbors
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      SimilarityOps.knnClassify(e.filter(col("id") < 25), e, k = 5)
        .orderBy("query_id")
    }),

    "s_label_knn_lsh" -> ((s, dir) => {
      // the strategy knob end-to-end: neighbors from LSH band collisions
      // (the s_ann_lsh candidate math) feeding the same voting aggregate
      // — the corpus-scale labeling path, oracle-checked like the exact one
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      SimilarityOps.knnClassify(e.filter(col("id") < 25), e, k = 5, strategy = "lsh")
        .orderBy("query_id")
    }),

    "s_label_knn_ivf_trained" -> ((s, dir) => {
      // strategy = trained-codebook IVF: the s_ann_ivf_trained probe math
      // (2 Lloyd rounds, quantized means) feeding the voting aggregate
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      SimilarityOps.knnClassify(e.filter(col("id") < 25), e, k = 5, strategy = "ivf-trained")
        .orderBy("query_id")
    }),

    "s_label_knn_ivf_pq" -> ((s, dir) => {
      // strategy = IVF+PQ: the billion-vector index shape feeding the
      // same voting aggregate — probe pruning + code-sized scan for
      // classification, not just retrieval
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding"), col("label"))
      SimilarityOps.knnClassify(e.filter(col("id") < 25), e, k = 5, strategy = "ivf-pq")
        .orderBy("query_id")
    }),

    "p_epochs" -> ((s, dir) =>
      // domain upsampling: rare languages repeat per-epoch factors
      SampleOps.upsampleEpochs(table(s, dir, "documents"), "lang",
          Map("zh" -> 3, "fr" -> 2))
        .select(col("doc_id"), col("lang"), col("epoch"))
        .orderBy("doc_id", "epoch"))
  )

  /** documents with text reflowed into 6-word `\n` lines — the corpus is
    * single-line word soup, so line-granularity operators synthesize
    * their lines deterministically (both engines build the identical
    * reflow). The reflow materializes once (localCheckpoint): it is
    * INPUT synthesis, not operator cost — a real corpus reads its lines
    * from parquet — and the interpreted HOF reflow would otherwise be
    * re-evaluated by every scan of the consuming operator's plan. */
  private def linedDocs(s: SparkSession, dir: String): DataFrame = {
    val w = TextOps.words(col("text"))
    table(s, dir, "documents").select(col("doc_id"),
      array_join(
        transform(sequence(lit(1), greatest(size(w), lit(1)), lit(6)),
          i => array_join(slice(w, i, lit(6)), " ")), "\n").as("text"))
      .localCheckpoint()
  }

  /** Planted-media hex builders: REAL container headers whose fields are
    * arithmetic in doc_id, so the DuckDB oracle predicts exactly what
    * the byte-level parser (MultimodalOps.parseHeader) must read back.
    * Dims/rates: width = doc_id%200+1, height = doc_id%100+1,
    * sample rate = 8000 + (doc_id%100)*10, channels = doc_id%2+1. */
  private def hex4(c: Column): Column = lpad(hex(c), 4, "0")
  private def hex8(c: Column): Column = lpad(hex(c), 8, "0")
  private def le16(c: Column): Column =
    concat(substring(hex4(c), 3, 2), substring(hex4(c), 1, 2))
  private def le32(c: Column): Column =
    concat(substring(hex8(c), 7, 2), substring(hex8(c), 5, 2),
      substring(hex8(c), 3, 2), substring(hex8(c), 1, 2))
  private def plantedW: Column = (col("doc_id") % 200 + 1).cast("long")
  private def plantedH: Column = (col("doc_id") % 100 + 1).cast("long")
  /** 33-byte PNG: signature, IHDR (w, h BE u32; depth 8, truecolor),
    * unvalidated CRC filler. */
  private def pngHex: Column = concat(
    lit("89504E470D0A1A0A0000000D49484452"), hex8(plantedW), hex8(plantedH),
    lit("0802000000DEADBEEF"))
  /** 23-byte JPEG: SOI, SOF0 (len 17: precision 8, h/w BE u16, 3
    * components), EOI. */
  private def jpegHex: Column = concat(
    lit("FFD8FFC0001108"), hex4(plantedH), hex4(plantedW),
    lit("03011100021101031101FFD9"))
  /** 44-byte WAV: RIFF/WAVE, fmt (PCM, channels LE u16, rate LE u32),
    * empty data chunk. */
  private def wavHex: Column = {
    val chan = (col("doc_id") % 2 + 1).cast("long")
    val rate = (col("doc_id") % 100 * 10 + 8000).cast("long")
    concat(
      lit("5249464624000000" + "57415645"),       // RIFF <size> WAVE
      lit("666D7420" + "10000000" + "0100"),      // "fmt " len=16 PCM
      le16(chan), le32(rate),
      le32(rate * chan * 2), le16(chan * 2),      // byte rate, block align
      lit("1000" + "64617461" + "00000000"))      // bits=16, empty data
  }
  /** Magic-less junk (0x00-prefixed md5 — cannot sniff as any format). */
  private def unknownHex: Column = concat(lit("00"), md5(col("text")))
  /** Mixed-format planting by doc_id % 4: png, jpeg, wav, unknown. */
  private def mediaHex: Column =
    when(col("doc_id") % 4 === 0, pngHex)
      .when(col("doc_id") % 4 === 1, jpegHex)
      .when(col("doc_id") % 4 === 2, wavHex)
      .otherwise(unknownHex)


  /** The d_dedup_semantic oracle body, parameterized by the leading
    * CTE block: the fixed variant hardcodes 8 init cells, the auto
    * variant prices k from the corpus count (KMeansOps.autoCells) —
    * both then replay the IDENTICAL md5-init + 2-round quantized-mean
    * training loop at that k, and the within-cell exact-cosine verify. */
  /** Per-column profile replay: the same aggregate chain plus the
    * p_distinct_kmv min-set pattern per column, unioned. */
  private def profileOracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column",
         |       count($c)::BIGINT AS n_values,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |       round(min($c::DOUBLE), 6) AS min_value,
         |       round(max($c::DOUBLE), 6) AS max_value,
         |       round(sum(CAST(floor($c::DOUBLE * 1000000.0 + 0.5) AS BIGINT))::DOUBLE
         |             / 1000000.0 / count($c)::DOUBLE, 6) AS mean_value,
         |       (SELECT round(CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
         |                          ELSE 255.0 / (max(h) / 1152921504606846976.0) END, 4)
         |        FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |              FROM (SELECT DISTINCT ('0x' || substr(md5($c::VARCHAR), 1, 15))::BIGINT AS h
         |                    FROM $table WHERE $c IS NOT NULL) hh) r
         |        WHERE rn <= 256) AS est_distinct
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY \"column\""

  private def semanticOracleSql(head: String): String =
    "WITH " + head + ",\n" + SemanticOracleBody.stripMargin

  /** Unrolled-CTE replay of [[graft.operators.TextOps.bpeMerges]]:
    * per step, pair counts from the ||-delimited sequences, argmax
    * with the same (freq DESC, t1, t2) tie-break, and the same
    * `|t1||t2|` → `|t1t2|` replace-merge. */
  /** Seed-subword-vocab trainer replay through the `vocab` CTE (top 64
    * substrings of length 2..4 by freq×len, ties by piece) — shared by
    * the p_subword_vocab oracle and the p_maxmatch_encode encoder
    * oracle that segments against it. */
  private val SubwordVocabCtes =
    """|w AS (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
       |    FROM documents) q GROUP BY 1),
       |pc AS (
       |  SELECT substr(word, s, l) AS piece, sum(cnt)::BIGINT AS freq
       |  FROM w,
       |       LATERAL unnest(generate_series(1, len(word))) u(s),
       |       LATERAL unnest(generate_series(2, 4)) v(l)
       |  WHERE s + l - 1 <= len(word)
       |  GROUP BY 1),
       |rk AS (
       |  SELECT piece, freq, (freq * len(piece))::BIGINT AS score,
       |         row_number() OVER (ORDER BY freq * len(piece) DESC, piece ASC) AS rn
       |  FROM pc),
       |vocab AS (SELECT rn::BIGINT AS rank, piece, freq, score FROM rk WHERE rn <= 64)"""

  private def bpeOracleSql(steps: Int, encode: Boolean = false): String = {
    val head =
      """WITH v AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
        |    FROM documents) q GROUP BY 1),
        |s0 AS (SELECT word, '||' || array_to_string(str_split(word, ''), '||') || '||' AS seq, cnt FROM v)""".stripMargin
    val stepCtes = (1 to steps).map { i =>
      val merge =
        if (i < steps || encode)
          s""",
             |s$i AS (SELECT word, replace(seq, '|' || t1 || '||' || t2 || '|',
             |                       '|' || t1 || t2 || '|') AS seq, cnt
             |        FROM s${i - 1}, b$i)""".stripMargin
        else ""
      s"""p$i AS (
         |  SELECT t[i] AS t1, t[i + 1] AS t2, sum(cnt) AS freq FROM (
         |    SELECT cnt, list_filter(str_split(seq, '||'), x -> x <> '') AS t
         |    FROM s${i - 1}) q,
         |    LATERAL unnest(generate_series(1, greatest(len(t) - 1, 0))) u(i)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT t1, t2, freq FROM p$i ORDER BY freq DESC, t1, t2 LIMIT 1)""".stripMargin + merge
    }
    val tail =
      if (encode)
        s"""
           |, tok AS (
           |  SELECT word, len(list_filter(str_split(seq, '||'), x -> x <> ''))::BIGINT AS n_tok
           |  FROM s$steps),
           |inst AS (
           |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS word
           |  FROM documents),
           |perdoc AS (
           |  SELECT doc_id, count(*) AS n_words, sum(n_tok) AS n_bpe
           |  FROM inst JOIN tok USING (word) GROUP BY 1)
           |SELECT d.doc_id, coalesce(n_words, 0)::BIGINT AS n_words,
           |       coalesce(n_bpe, 0)::BIGINT AS n_bpe_tokens
           |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin
      else (1 to steps)
        .map(i => s"SELECT ${i}::BIGINT AS step, t1, t2, freq::BIGINT AS freq FROM b$i")
        .mkString("\n", "\nUNION ALL ", "\nORDER BY step")
    (head +: stepCtes).mkString(",\n") + tail
  }

  /** Norm-augmented IVF-MIPS replay, through the candidate CTE `cand`:
    * M² = max corpus squared norm, corpus vectors gain a 65th coord
    * sqrt(M² − ‖x‖²) (queries gain 0), cells come from the 65-dim
    * md5 'mcentroid' codebook — shared by the s_mips_ivf serving
    * oracle and the s_recall_mips audit, which differ only in the
    * tail they hang off `cand`. */
  private val MipsIvfCtes =
    """|m AS (
       |  SELECT max(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS m2
       |  FROM embeddings),
       |aug AS (
       |  SELECT vec_id,
       |         list_append(list_transform(range(1, 65), i -> embedding[i]::DOUBLE),
       |           sqrt(greatest(m2 - list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)), 0.0))) AS av
       |  FROM embeddings, m),
       |qaug AS (
       |  SELECT vec_id, list_append(list_transform(range(1, 65), i -> embedding[i]::DOUBLE), 0.0) AS av
       |  FROM embeddings WHERE vec_id < 5),
       |cent AS (
       |  SELECT c, list_transform(generate_series(0, 64),
       |           d -> (('0x' || substr(md5('mcentroid:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
       |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
       |csim AS (
       |  SELECT vec_id, c,
       |         list_sum(list_transform(range(1, 66), i -> cv[i] * av[i])) /
       |         (sqrt(list_sum(list_transform(range(1, 66), i -> cv[i] * cv[i]))) *
       |          sqrt(list_sum(list_transform(range(1, 66), i -> av[i] * av[i])))) AS s
       |  FROM aug, cent),
       |assign AS (SELECT vec_id, c AS cell FROM (
       |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
       |    FROM csim) z WHERE rn = 1),
       |qsim AS (
       |  SELECT vec_id, c,
       |         list_sum(list_transform(range(1, 66), i -> cv[i] * av[i])) /
       |         (sqrt(list_sum(list_transform(range(1, 66), i -> cv[i] * cv[i]))) *
       |          sqrt(list_sum(list_transform(range(1, 66), i -> av[i] * av[i])))) AS s
       |  FROM qaug, cent),
       |probes AS (SELECT vec_id, c AS cell FROM (
       |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
       |    FROM qsim) z WHERE rn <= 6),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assign a ON p.cell = a.cell
       |  WHERE p.vec_id <> a.vec_id)"""

  /** The 2-round Lloyd training replay (init c0 comes from the head),
    * ending at the final assignment CTE `a2` — shared by the one-level
    * semantic oracles and the two-level sharded one, which differ only
    * in how pairs are generated from `a2`. */
  private val SemanticTrainCtes =
    """|dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |s0 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c0),
        |a0 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s0) z WHERE rn = 1),
        |m1 AS (
        |  SELECT a0.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a0, embeddings e, dims WHERE a0.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c1m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m1 GROUP BY 1),
        |c1 AS (SELECT c0.c, coalesce(c1m.cv, c0.cv) AS cv FROM c0 LEFT JOIN c1m USING (c)),
        |s1 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c1),
        |a1 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s1) z WHERE rn = 1),
        |m2 AS (
        |  SELECT a1.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a1, embeddings e, dims WHERE a1.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c2m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m2 GROUP BY 1),
        |c2 AS (SELECT c1.c, coalesce(c2m.cv, c1.cv) AS cv FROM c1 LEFT JOIN c2m USING (c)),
        |s2 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c2),
        |a2 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s2) z WHERE rn = 1)"""

  /** Pair generation + exact-cosine verify from a `p(id_a, id_b, cell)`
    * candidate CTE — the shared tail of the semantic oracles. */
  private val SemanticScoreTail =
    """|scored AS (
        |  SELECT id_a, id_b, cell,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * ae.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> be.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM p JOIN embeddings ae ON id_a = ae.vec_id
        |         JOIN embeddings be ON id_b = be.vec_id)
        |SELECT id_a, id_b, cell::BIGINT AS cell, sim
        |FROM scored WHERE sim >= 0.25 ORDER BY id_a, id_b"""

  private val SemanticOracleBody =
    SemanticTrainCtes + ",\n" + """|p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell
        |  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
""" + SemanticScoreTail

  /** Two-level pair generation: per-cell split width from the ACTUAL
    * cell count (smallest sb with cn <= target·2^sb, the
    * [[graft.operators.KMeansOps.semanticNearDuplicatesSharded]]
    * when-chain), 16 md5 "subplane" sign bits masked to each cell's
    * width, pairs joined on (cell, subcell). */
  private def semanticShardedTail(target: Long, maxSubBits: Int): String = {
    val bitsCase = (0 until maxSubBits)
      .map(b => s"WHEN cn <= ${target * (1L << b)} THEN $b")
      .mkString("CASE ", " ", s" ELSE $maxSubBits END")
    s"""|cs AS (SELECT cell, count(*) AS cn FROM a2 GROUP BY 1),
        |bits AS (SELECT cell, $bitsCase AS sb FROM cs),
        |splanes AS (
        |  SELECT pb, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('subplane:' || pb || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, ${maxSubBits - 1})) AS pb)),
        |ssig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65), i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << pb) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, splanes GROUP BY 1),
        |sub AS (
        |  SELECT a2.vec_id, a2.cell, ssig.sig & ((1::BIGINT << bits.sb) - 1) AS subcell
        |  FROM a2 JOIN ssig USING (vec_id) JOIN bits USING (cell)),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell
        |  FROM sub a JOIN sub b ON a.cell = b.cell AND a.subcell = b.subcell
        |                        AND a.vec_id < b.vec_id),
""" + SemanticScoreTail
  }

  // ======================= oracles =======================

  /** The IVF+PQ oracle pipeline (coarse 2-round Lloyd cells + probe
    * ranking, PQ Forgy/Lloyd sub-codebooks, codes, integer distance
    * tables, probe-set ADC shortlist, exact-cosine ranked) shared by
    * the retrieval and classification surfaces — only the query-set
    * predicate and the final projection differ. */
  /** The recall-audit finisher for the [[ivfPqOracle]] chain: the
    * ranked approximate top-5 id set LEFT-joined against the exact
    * cosine top-5 — the s_recall convention on the `ranked` CTE. */
  private val ivfAuditTail: String =
    """|, ap AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |scored_b AS (
       |  SELECT query_id, ce.vec_id AS neighbor_id,
       |         round(
       |           list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
       |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
       |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
       |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |    FROM scored_b) WHERE rank <= 5),
       |j AS (
       |  SELECT ex.query_id,
       |         (ap.neighbor_id IS NOT NULL)::INT AS hit
       |  FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id
       |                       AND ex.neighbor_id = ap.neighbor_id)
       |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
       |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
       |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin

  private def ivfPqOracle(maxQuery: Int, tail: String,
                          rotated: Boolean = false): String = {
    // rotated=true swaps the PQ stage onto the OPQ-rotated column:
    // the rotation CTEs (the s_ann_opq literals) are prepended and the
    // sub-codebook chain reads rvec.rv instead of embeddings.embedding
    // — the coarse chain stays on originals, exactly like
    // PqOps.ivfOpqTopK. pv() is the per-component accessor.
    val pqT = if (rotated) "rvec" else "embeddings"
    def pv(e: String) = if (rotated) s"rv[$e]" else s"embedding[$e]::DOUBLE"
    val rotCtes = if (!rotated) "" else
      s"""blist AS (SELECT unnest(range(0, 4096)) AS pos, unnest([$opqBasisSf001]) AS r),
         |b2 AS (SELECT (pos // 64)::INT AS i, (pos % 64)::INT AS j, r::BIGINT AS r FROM blist),
         |rq0 AS (
         |  SELECT e.vec_id, b2.i,
         |         sum(b2.r * floor(e.embedding[b2.j + 1]::DOUBLE * 10000000.0 + 0.5)::BIGINT)::BIGINT AS yq
         |  FROM embeddings e, b2 GROUP BY 1, 2),
         |rvec AS (SELECT vec_id, list(yq::DOUBLE / 100000000000000.0 ORDER BY i) AS rv FROM rq0 GROUP BY 1),
         |""".stripMargin
    s"""WITH ${rotCtes}c0 AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('kmeans:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |s0 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c0),
        |a0 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s0) z WHERE rn = 1),
        |m1 AS (
        |  SELECT a0.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a0, embeddings e, dims WHERE a0.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c1m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m1 GROUP BY 1),
        |c1 AS (SELECT c0.c, coalesce(c1m.cv, c0.cv) AS cv FROM c0 LEFT JOIN c1m USING (c)),
        |s1 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c1),
        |a1 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s1) z WHERE rn = 1),
        |m2 AS (
        |  SELECT a1.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a1, embeddings e, dims WHERE a1.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c2m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m2 GROUP BY 1),
        |c2 AS (SELECT c1.c, coalesce(c2m.cv, c1.cv) AS cv FROM c1 LEFT JOIN c2m USING (c)),
        |s2 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c2),
        |ranked_cells AS (
        |  SELECT vec_id, c,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS crank
        |  FROM s2),
        |assign AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank = 1),
        |probes AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank <= 6 AND vec_id < $maxQuery),
        |cand0 AS (
        |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE p.vec_id <> a.vec_id),
        |subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
        |sdims AS (SELECT unnest(generate_series(1, 8)) AS d),
        |seed AS (SELECT vec_id, ${if (rotated) "rv" else "embedding"} AS sv,
        |                row_number() OVER (ORDER BY vec_id) - 1 AS c
        |         FROM $pqT QUALIFY c < 32),
        |pc0 AS (
        |  SELECT sub, seed.c,
        |         list(${if (rotated) "seed.sv[sub*8 + d]" else "seed.sv[sub*8 + d]::DOUBLE"} ORDER BY d) AS cv
        |  FROM subs, seed, sdims GROUP BY 1, 2),
        |ps0 AS (
        |  SELECT vec_id, sub, c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (${pv("sub*8 + i")} - cv[i]) * (${pv("sub*8 + i")} - cv[i]))) AS dist
        |  FROM $pqT, pc0),
        |pa0 AS (SELECT vec_id, sub, c AS cell FROM (
        |         SELECT vec_id, sub, c,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
        |         FROM ps0) z WHERE rn = 1),
        |pm1 AS (
        |  SELECT pa0.sub, pa0.cell, sdims.d,
        |         sum(floor(${if (rotated) "e.rv[pa0.sub*8 + sdims.d]" else "e.embedding[pa0.sub*8 + sdims.d]::DOUBLE"} * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM pa0, $pqT e, sdims WHERE pa0.vec_id = e.vec_id
        |  GROUP BY 1, 2, 3),
        |pc1m AS (SELECT sub, cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY d) AS cv
        |        FROM pm1 GROUP BY 1, 2),
        |pc1 AS (SELECT pc0.sub, pc0.c, coalesce(pc1m.cv, pc0.cv) AS cv
        |       FROM pc0 LEFT JOIN pc1m ON pc0.sub = pc1m.sub AND pc0.c = pc1m.c),
        |ps1 AS (
        |  SELECT vec_id, sub, c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (${pv("sub*8 + i")} - cv[i]) * (${pv("sub*8 + i")} - cv[i]))) AS dist
        |  FROM $pqT, pc1),
        |codes AS (SELECT vec_id, sub, c AS cell FROM (
        |            SELECT vec_id, sub, c,
        |                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
        |            FROM ps1) z WHERE rn = 1),
        |qd AS (
        |  SELECT vec_id AS query_id, sub, c,
        |         floor(list_sum(list_transform(range(1, 9),
        |           i -> (${pv("sub*8 + i")} - cv[i]) * (${pv("sub*8 + i")} - cv[i])))
        |           * 1000000000.0 + 0.5)::BIGINT AS dq
        |  FROM $pqT, pc1 WHERE vec_id < $maxQuery),
        |adc AS (
        |  SELECT cd.query_id, cd.neighbor_id, sum(qd.dq)::BIGINT AS adist_q
        |  FROM cand0 cd JOIN codes x ON x.vec_id = cd.neighbor_id
        |                JOIN qd ON qd.query_id = cd.query_id
        |                       AND qd.sub = x.sub AND qd.c = x.cell
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY adist_q ASC, neighbor_id ASC) AS arn
        |    FROM adc) z WHERE arn <= 50),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM shortlist JOIN embeddings qe ON query_id = qe.vec_id
        |                 JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |$tail""".stripMargin
  }

  /**
   * Unrolled HyperBall register-recurrence replay for q52 (p = 8: idx
   * = top 8 bits of the md5Head60 hash, 52-bit tail, rmax = 53): each
   * round is one UNION ALL + max per (node, idx) — exactly
   * GraphOps.hyperBallHarmonic's merge — then the hllFromRegisters
   * arithmetic verbatim per round; harmonic_micro folds the clamped
   * ball-size deltas with integer division.
   */
  /**
   * Pivot-Brandes replay (q66_betweenness): the skip-chain graph,
   * the md5-ranked pivot pick (the coreset-pool convention), then the
   * exact machinery UNROLLED per level — forward σ sums with
   * LEFT-JOIN anti dedup against the seen set, backward per-edge
   * integer credits (σv·(10⁶+δw)) // σw — exactly the quantized
   * recursion GraphOps.betweennessPivots runs.
   */
  private def betweennessOracleSql(radius: Int, pivots: Int): String = {
    val fwd = (1 to radius).map { t =>
      val seen =
        if (t == 1) "l0"
        else s"(${(0 until t).map(i => s"SELECT s, node FROM l$i").mkString(" UNION ALL ")})"
      s"""x$t AS (
         |  SELECT l${t - 1}.s, adj.b AS node, sum(l${t - 1}.sigma)::BIGINT AS sigma
         |  FROM l${t - 1} JOIN adj ON adj.a = l${t - 1}.node GROUP BY 1, 2),
         |l$t AS (
         |  SELECT x$t.s, x$t.node, x$t.sigma FROM x$t
         |  LEFT JOIN $seen sn ON sn.s = x$t.s AND sn.node = x$t.node
         |  WHERE sn.node IS NULL)""".stripMargin
    }.mkString(",\n")
    val bwd = (radius to 1 by -1).map { t =>
      val dw = if (t == radius) "0" else s"coalesce(d$t.delta, 0)"
      val dJoin = if (t == radius) ""
        else s"\n|  LEFT JOIN d$t ON d$t.s = p.s AND d$t.node = adj.b"
      s"""up$t AS (
         |  SELECT p.s, p.node AS v,
         |         (p.sigma * (1000000 + $dw)) // w.sigma AS c
         |  FROM l${t - 1} p JOIN adj ON adj.a = p.node
         |  JOIN l$t w ON w.s = p.s AND w.node = adj.b$dJoin),
         |d${t - 1} AS (SELECT s, v AS node, sum(c)::BIGINT AS delta FROM up$t GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val contrib = (0 until radius)
      .map(t => s"SELECT s, node, delta FROM d$t WHERE node <> s")
      .mkString(" UNION ALL ")
    s"""WITH u AS (SELECT DISTINCT user_id AS id FROM events),
       |e AS (
       |  SELECT a.id AS src, a.id + 1 AS dst
       |  FROM u a JOIN u b ON b.id = a.id + 1 WHERE a.id % 64 <> 63
       |  UNION ALL
       |  SELECT a.id AS src, a.id + 16 AS dst
       |  FROM u a JOIN u b ON b.id = a.id + 16 WHERE a.id % 64 < 48),
       |adj AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst AS a, src AS b FROM e),
       |nodes AS (SELECT DISTINCT a AS node FROM adj),
       |piv AS (SELECT node AS s FROM (
       |          SELECT node, ('0x' || substr(md5(node::VARCHAR), 1, 15))::BIGINT AS h
       |          FROM nodes) z ORDER BY h, node LIMIT $pivots),
       |l0 AS (SELECT s, s AS node, 1::BIGINT AS sigma FROM piv),
       |$fwd,
       |$bwd,
       |contrib AS ($contrib),
       |bc AS (SELECT node, sum(delta)::BIGINT AS bc_ppm FROM contrib GROUP BY 1)
       |SELECT n.node, coalesce(bc.bc_ppm, 0)::BIGINT AS bc_ppm
       |FROM nodes n LEFT JOIN bc ON bc.node = n.node
       |ORDER BY n.node""".stripMargin
  }

  private def hyperballOracleSql(rounds: Int, mode: String = "und"): String = {
    val deltas = (1 to rounds).map(t =>
      s"(greatest(f$t.est - f${t - 1}.est, 0) * 1000) // $t").mkString(" + ")
    val joins = (0 until rounds).map(t => s"JOIN f$t USING (node)").mkString(" ")
    hyperballBodyCtes(rounds, mode) + "\n" +
      s"""|SELECT f$rounds.node, f$rounds.est::BIGINT AS ball_milli,
          |       ($deltas)::BIGINT AS harmonic_micro
          |FROM f$rounds $joins
          |ORDER BY node""".stripMargin
  }

  /** The q53 finisher over the same body: per-round Σ est (the
    * neighborhood function), cumulative ppm share, ≥90% flag. */
  private def neighborhoodOracleSql(rounds: Int): String = {
    val sums = (0 to rounds).map(t =>
      s"s$t AS (SELECT sum(est)::BIGINT AS np FROM f$t)").mkString(",\n")
    val unions = (0 to rounds).map(t =>
      s"SELECT $t::BIGINT AS t, np FROM s$t").mkString("\n  UNION ALL ")
    hyperballBodyCtes(rounds) + ",\n" +
      s"""|$sums
          |SELECT t, np::BIGINT AS npairs_milli,
          |       (CASE WHEN (SELECT np FROM s$rounds) > 0
          |             THEN np * 1000000 // (SELECT np FROM s$rounds) END)::BIGINT AS frac_ppm,
          |       ((CASE WHEN (SELECT np FROM s$rounds) > 0
          |              THEN np * 1000000 // (SELECT np FROM s$rounds) END) >= 900000) AS ge90
          |FROM ($unions) z ORDER BY t""".stripMargin
  }

  /**
   * Query-directed / globally-budgeted multi-probe LSH replay: the
   * shared margin machinery (dots → signatures → per-band costs →
   * perturbation pricing), with the CHOSEN probes ranked per band
   * (qd: 3 cheapest masks within each band) or globally (qa: the 24
   * cheapest (cost, band, mask) triples across all bands). `recall`
   * appends the brute-truth audit instead of the ranked top-k.
   */
  private def lshQdOracleSql(recall: Boolean, global: Boolean): String = {
    val chosen =
      if (global)
        """|chosen AS (
           |  SELECT vec_id, band, xor(bandval, m) AS bandval FROM (
           |    SELECT vec_id, band, bandval, m,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY cost ASC, band ASC, m ASC) AS rn
           |    FROM pert) WHERE rn <= 24),"""
      else
        """|chosen AS (
           |  SELECT vec_id, band, xor(bandval, m) AS bandval FROM (
           |    SELECT vec_id, band, bandval, m,
           |           row_number() OVER (PARTITION BY vec_id, band ORDER BY cost ASC, m ASC) AS rn
           |    FROM pert) WHERE rn <= 3),"""
    val prefix =
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |dots AS (
        |  SELECT vec_id, b,
        |         list_sum(list_transform(range(1, 65), i -> pl[i] * embedding[i]::DOUBLE)) AS dt
        |  FROM embeddings, planes),
        |sig AS (
        |  SELECT vec_id, sum(CASE WHEN dt > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM dots GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bb),
        |qband AS (
        |  SELECT vec_id, b // 3 AS band,
        |         sum(CASE WHEN dt > 0 THEN (1::BIGINT << (b % 3)) ELSE 0 END)::BIGINT AS bandval,
        |         list(dt * dt ORDER BY b) AS costs
        |  FROM dots WHERE vec_id < 5 GROUP BY 1, 2),
        |pert AS (
        |  SELECT vec_id, band, bandval, m,
        |         list_sum(list_transform(range(0, 3),
        |           j -> CASE WHEN ((m >> j) & 1) = 1 THEN costs[j + 1] ELSE 0.0 END)) AS cost
        |  FROM qband, (SELECT unnest(generate_series(1, 7)) AS m) mm),"""
    (prefix + "\n" + chosen + "\n" + lshProbeTailSql(recall)).stripMargin
  }

  /** The shared probe→candidate→re-rank (or recall-audit) tail of the
    * multi-probe LSH oracles: consumes `qband` (home buckets), `chosen`
    * (selected perturbations) and `banded` (corpus placements). */
  private def lshProbeTailSql(recall: Boolean): String = {
    val cand =
      """|qprobe AS (
         |  SELECT vec_id, band, bandval FROM qband
         |  UNION ALL SELECT vec_id, band, bandval FROM chosen),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM qprobe q JOIN banded c ON q.band = c.band AND q.bandval = c.bandval
         |  WHERE q.vec_id <> c.vec_id),"""
    cand + "\n" + rerankTailSql(recall)
  }

  /** The exact-cosine re-rank top-k (or the recall audit against brute
    * truth) over any `cand(query_id, neighbor_id)` candidate CTE —
    * shared by the probing-LSH and auto-IVF oracle generators. */

  /** The OPQ rotation for the sf0.01 oracle: flat row-major
    * 1e7-quantized longs, dumped by `graft.tools.OpqBasisDump`
    * (m=8, k=32, opqIters=3). [[graft.operators.PqOps.opqTrainRotation]]
    * is deterministic — exact-long sums, fixed-sweep Jacobi, no libm
    * transcendentals — so the driver's Verify run re-derives these
    * exact values; the oracle takes them as literals instead of
    * replaying the driver-side Procrustes float math (the PcaOps
    * precedent). */
  private val opqBasisSf001: String =
    """9073179,-237070,-220589,-421052,-275679,-389809,46168,345313,384558,407294,778588,4587,-11123,502325,-307379,-581514,
    |-195796,-401598,-183650,-766257,-416945,-1181714,174179,-337609,156890,-269929,506161,-815708,-267905,-776734,1099710,-473049,
    |-560712,-1254694,792514,-81327,380463,597888,524904,457734,58638,-383257,870742,-225835,-114035,-131797,45271,666169,
    |-47107,-313505,274369,379512,-182316,-1152227,1032782,-545865,557936,286966,-945774,153325,308561,-488940,-363635,-93340,
    |109500,8817774,-1380800,-551041,-456174,-1194054,1179838,-105926,-1071051,-359239,405814,381425,705044,-1084867,-204604,447232,
    |714133,-1038657,-800664,-202351,-918391,285797,339810,423222,334237,130022,378040,545299,-912212,52236,52406,936697,
    |-290565,19624,-876308,2081,452364,90919,-719924,325072,40768,141903,-350840,968670,-243095,-209205,447505,470788,
    |1110115,-341986,456901,832042,-239539,-749197,336813,22241,447098,619982,155650,326894,-11431,775933,290924,167628,
    |121021,1151457,8800533,-106703,636489,53438,204511,275362,-432053,86066,-5879,199590,-424031,670730,58284,667475,
    |-898928,-230876,114926,277022,377697,223782,1129631,457250,486668,-126884,1026183,54425,-229250,-174679,-123692,-1069968,
    |-6605,119678,182822,-390845,1009300,751306,864978,1437691,860221,615412,551920,1292675,-570232,-258356,1349897,-635521,
    |805802,20518,-289910,714222,-406605,386809,-1150227,-457270,251847,-380460,-43642,-190222,520425,425199,-81867,269156,
    |95251,389482,-27039,9128140,766317,-1004029,77631,-608537,-290230,-167133,519346,-149923,-164819,-571078,927348,311969,
    |-1078818,-318626,-3215,-1195836,145097,65466,400237,168975,-561433,-97426,-1184523,-195631,2656,57058,122860,-78170,
    |-618214,119453,204771,-381481,-108714,96932,409411,319042,-386160,-439129,100633,-739022,-15838,-898281,-490359,685222,
    |245467,370766,158395,1463752,-972224,9630,-161358,925,-112954,286225,-122736,-174344,354639,-129577,-1099100,107503,
    |145201,-468527,-377922,-1217731,8663252,90924,857359,-365810,-1843386,341208,691485,729465,-445529,-1298793,108852,-211376,
    |791643,69502,-236397,-1809924,34549,-591156,-47853,633369,-357746,11821,-773599,-152438,214761,-409734,727051,-121118,
    |-635831,749682,-1194834,332171,576056,379039,549112,-60874,-818161,-716519,-612039,245149,-236993,649683,-256385,193855,
    |722201,158596,-446799,90343,-6882,-109805,677268,-522607,-115987,-361605,391066,-1278326,-246167,719809,144906,-7665,
    |630110,962322,-284755,1057351,264104,8872818,-1221867,178476,24123,34263,204094,793403,-250525,-1090507,108045,890669,
    |196797,-97587,238743,295860,-634302,-200689,547762,-840612,-1126687,679230,501780,1105402,-728875,66839,-806702,154320,
    |-67005,292901,648020,-579068,196190,-118753,366611,-392044,315694,18387,494116,-123289,466156,291173,994147,155076,
    |230188,-1098135,-1039177,-38735,242516,-449380,253962,524354,-110248,791353,926529,46888,534108,228011,371209,-771404,
    |-235688,-1140575,276148,156566,-867009,827130,8419935,256220,180307,-401474,121712,586997,-445687,122191,-1141054,534003,
    |-120083,1709352,-377643,-365525,-1188114,-1210293,5111,181357,-500654,40977,-442503,-907458,-1176460,-294027,-999928,418386,
    |392294,720786,429692,-9573,-109614,545596,-51059,-575179,-663686,645430,-160183,52273,-104800,-165403,-724369,515016,
    |504178,-114459,-894733,272509,-134693,-1004062,-1118732,269415,1530463,1309351,33309,-15415,-328730,-1344901,1017017,-191033,
    |-175570,-246040,-588495,599069,791756,-407685,-199059,9028117,432627,-278099,-1056774,-397027,-229006,-1005972,-530807,177890,
    |-279399,267998,-565626,831756,-89684,696468,265234,-116067,251683,-542933,727194,854831,160134,-317206,312440,-635785,
    |741457,330505,151031,687053,-374480,316613,165552,8965,-25378,31815,-293849,485485,1444272,-804954,604608,170712,
    |1196090,496359,602236,427821,-226518,-694238,435243,666317,936500,-484198,421520,-256532,275320,-341314,-308778,238029,
    |-208736,979334,468039,-191263,1690757,35436,329073,-491722,8820607,-819364,921482,95495,-36860,-525046,-65778,-240256,
    |575641,27721,-29329,317502,961107,369885,20701,759353,1016346,-296647,-1165501,296709,229289,-460890,-72409,291399,
    |-520127,-60984,582572,-479017,-526393,-996890,146223,459839,-640390,-10534,-423188,-212300,632814,-93317,-305583,629482,
    |937061,-910385,-139905,-455990,787738,-632322,-395065,-1055798,-192895,141681,422466,755368,233506,303741,-1179894,644363,
    |-814976,539988,42221,-294909,-247270,236252,642577,603194,657796,9133517,839710,128403,-327292,403214,47573,-43710,
    |-1014992,-454927,35941,242237,142831,-178119,882366,461420,-414132,15903,-666179,-127636,-170117,204463,12479,-388891,
    |-1821,-1389896,307613,-510703,401724,-556456,-799452,-542499,-282926,-933224,439483,-200517,-192050,298273,-856271,1113819,
    |63855,511509,-305698,754746,310063,702844,735920,277114,182038,-573074,299010,165890,7336,-18668,-448896,473685,
    |-112495,-755571,599399,-240161,-763958,-221465,-91681,808028,-970874,-455604,8810884,-468997,114022,6131,101759,619744,
    |158675,-774640,-760027,706709,493019,679077,-666001,90284,-102611,88158,-196362,2124265,-133516,-311308,559059,279939,
    |1559123,519739,-601945,533287,-221897,284134,-77769,-219402,192806,301243,-1099023,-773254,-480593,-386887,-763512,-222819,
    |-334286,-608022,-25544,-332215,428182,-451291,2137,157236,-81914,995527,897956,-277252,-682995,-12821,-724959,-82202,
    |-7827,-359954,46035,142883,-211629,-950803,-1171086,202376,129450,-189282,59757,8914874,-1275139,389372,-16277,419560,
    |-434467,-486539,35630,290317,480328,494477,-866272,64554,-1268053,-539193,351022,20062,750792,49507,-474158,-67169,
    |278418,-259457,-749739,-524935,-370294,-553073,-469540,92524,-127342,-580592,76954,571186,-236992,-98284,-511516,2441,
    |154427,-1039984,311910,644926,614064,-805497,-525260,802567,1386607,385766,-583447,608096,-1103504,-937051,466846,-339859,
    |240598,-264162,506533,85366,653167,-101497,-138082,-22100,142740,353413,-540533,1099623,8844078,-382825,-365357,277371,
    |-672368,755783,925362,951485,936802,-1348354,-392922,921987,-487510,705057,-326072,327336,-375215,-305556,881000,1038817,
    |860794,464989,-125281,-293977,-475115,385678,165834,-396498,746616,357519,12284,223158,465150,-851425,-574304,-572314,
    |-730194,-72835,-544936,810710,562746,481146,263127,502283,1051349,349293,516965,-412003,682331,-516320,-547945,-629646,
    |-296317,927402,-849836,305801,1013030,1143063,203842,1066565,-260369,-600968,-56668,142323,284177,8930782,333100,-53744,
    |121075,-210619,-95178,79335,-459818,906338,83015,488217,-365554,1188630,-1544543,-227007,154732,-146369,918983,525112,
    |-359818,597924,30646,418968,-78254,-95082,220770,687912,265426,193453,781461,553076,-75693,325086,-747099,510921,
    |588095,59382,736715,-538541,704631,467398,-104921,-625156,155548,650469,246567,-607220,638682,315962,-853144,499788,
    |239290,-446766,-251290,-931292,-647206,-264281,757433,811158,94763,-49986,106485,120253,633865,-559850,9129143,-368609,
    |632537,214321,-231458,-600695,-481810,-225441,376922,-600668,-427543,566064,-840236,-139565,-405462,-1089631,-112010,-228408,
    |-684506,291764,-209178,-717184,154219,282046,-448794,1230147,120462,-171468,261068,566900,-14653,86060,283694,429042,
    |59428,-311347,-156005,370313,609813,-209374,-1417051,720601,-178359,-472833,880552,281528,154254,239816,722016,135238,
    |586918,-665712,-882808,-461297,-226540,-405918,-66546,-200322,237333,244520,-282199,-374727,34889,54512,-256259,8670737,
    |-567917,-265719,-542426,-666003,365815,-152062,244596,-479447,910178,355027,-229315,-529975,1195621,-121261,214266,-280575,
    |-890143,379486,-594682,804222,-115270,488575,-479998,107047,-766759,-268660,1222024,401485,566847,-1226908,-215572,-747768,
    |302736,-644679,442078,1225105,884296,444063,-821450,-1341260,-889792,-771230,1274275,288680,-582977,908479,807664,-438577,
    |96861,-966972,617461,1400929,-643085,-311213,-476238,191648,-437744,1297154,-129112,269209,285338,106245,-721891,335418,
    |8936862,549234,-705944,533559,-355289,-488096,-315881,237701,272163,-467262,-24071,152110,-314126,-541848,-163017,1167890,
    |-752524,-314348,685855,142905,-53359,95252,-512957,637440,460981,-528468,-118501,755117,-26679,-891697,799859,-489398,
    |485062,-513569,-774750,249944,518616,695483,-413228,-741644,952861,130590,-510561,-592488,-450061,471468,88003,695152,
    |814506,1132837,-212234,-6808,329660,-446502,-1584277,187815,-431682,519336,800920,205552,-617468,-63411,-36903,419405,
    |-530110,8847610,451941,460113,410896,331313,-137460,-536543,322952,306510,-108153,380804,-1098628,1042369,-1009234,92558,
    |-79953,1073080,397217,-64034,-848160,-555293,-247495,524760,230392,255678,-49230,-590542,-1174877,1218927,-426677,304340,
    |103560,-309287,635277,782216,248998,171823,-1022484,-749338,-150311,-192436,-586245,36364,482729,502058,-271259,369168,
    |-234359,592859,-56312,-362724,186609,-375701,362693,565940,227260,-113446,1034722,-27782,-501506,290456,298229,777028,
    |1109851,-328380,9214935,-3858,-617378,347707,582258,-1116433,-251014,-161541,471694,-1106239,-173554,442829,141570,-413907,
    |-779251,-316590,-528185,-131697,-913571,531957,3025,-133449,-493167,-33992,-191173,-731971,193644,-707413,240766,-319534,
    |-223607,313511,-142547,175344,-1160219,-408853,595408,309608,442870,471903,86970,-272809,4049,8830,-226125,50059,
    |1186481,212647,-36168,544045,1375161,-477565,697144,-1014124,-746051,-63918,-910194,-248177,-1329010,-350603,864565,835298,
    |-104744,-403163,65668,8935345,254448,-81110,-84492,-164744,-57743,57461,-712992,213829,68927,325352,744302,721482,
    |-94992,-36058,212518,-155144,-184942,-500000,259528,19692,-331228,158657,-570820,702910,187587,-287370,-1041325,829222,
    |-76002,756550,-511583,-519152,-121887,-681135,-80374,438307,-993861,-7896,426213,-918724,-12636,-327956,-167601,-865591,
    |199951,599523,-312827,-2942,-253580,863172,1248799,552511,-1151781,-428880,-250665,-460444,-328577,239158,177398,-181587,
    |593034,-648361,315979,-172472,9148074,291953,276267,-671647,606832,439607,403987,-550734,-666626,-761268,-258387,192618,
    |-59230,-69726,-178076,-597063,-737872,-537493,-90477,172860,-694084,-1183342,178097,-46109,-302338,906662,-146124,609444,
    |-529173,-86285,13752,291567,-193506,92045,112958,-548853,497733,159859,-512845,681447,67695,-237489,786371,743984,
    |1133170,-265419,-59907,272234,311083,-38015,1035707,-570011,-192735,474906,-486130,26530,1340850,-822397,-509639,-93028,
    |522466,76281,21999,-324694,-473733,8808344,419965,-933932,-466140,441026,-267571,-506344,-112773,-729282,1318990,67307,
    |596720,-552572,700609,30775,-423405,390738,723087,-487111,-82754,266429,-156015,-5382,-812196,835035,585389,236022,
    |407618,-75927,-584661,-281488,992239,321611,-980050,100797,-736096,-963954,652240,330137,-452258,-1174051,964739,-531850,
    |-166447,-626960,-729506,-442544,-109253,-379708,-483990,-424709,93068,-910761,561394,817029,181734,260895,-357203,98091,
    |990068,336573,-733443,274066,-195884,-372755,8999041,1399245,-224365,-336466,-106069,-425471,-677484,471849,772573,-271746,
    |1466738,390324,-787488,-479346,-152851,-65327,30063,-286184,-247301,-59092,72264,-544695,1084922,683676,134744,470067,
    |-736170,191157,279773,624114,-1285743,-196214,-152675,395658,-523082,-290459,210476,633008,65514,-648843,155310,65436,
    |1080773,84088,-405306,450377,-450674,682366,-271362,186796,-518842,205660,-328986,-593363,-677982,-99050,839546,337650,
    |-50703,500713,1299421,-167244,453873,770985,-904607,8913046,325201,-754129,528454,630195,475878,-153264,-390543,-479887,
    |-144500,-196958,65115,-109075,-104679,-781342,650892,-767640,-664632,673692,-388453,446568,-132741,-76871,-268917,-1059817,
    |-281293,-85855,428173,-1127042,20015,190206,-713959,172045,294397,356177,682730,294749,-686493,-165691,1730109,-237023,
    |-39360,-253861,-250574,483617,-107314,1185522,448723,60207,-327117,73849,427932,1715534,454281,268815,598508,-642139,
    |59984,-432234,118420,192732,-682499,338447,-148547,-74680,9012698,-612778,-260766,-514008,47461,803516,-41343,-180867,
    |-173777,869477,-27816,311396,534327,183729,-240484,-887798,10685,-174222,-127094,-665380,-685103,706884,-29007,-42476,
    |-319008,485375,58383,1411985,-93620,417105,768405,629894,-464467,-564562,-65170,-1098301,802199,-750854,503120,-197836,
    |-178552,-301921,-9154,59460,70877,-156872,-175941,238758,439980,-30206,116618,434410,-887045,-1219438,-451723,-53317,
    |504656,-185197,-96508,156542,-307967,-156826,-185470,989200,630558,9128939,-131870,-1017799,-49524,-399234,1038126,-993992,
    |818530,-396055,352245,-465462,-122761,157356,-1171160,343580,212655,725963,324962,114619,-592100,-387396,-182700,-707155,
    |-53047,128415,974832,7919,-1207472,-237648,193870,369726,409324,-15226,-944897,-144265,126236,-46339,-186229,438474,
    |-426156,-451752,-1206328,976202,1269194,-151490,949779,-581914,948355,816842,640915,-2332,503270,1039710,1060989,-412568,
    |9177,-207011,-519113,688981,-300726,118870,-118330,-136843,47412,343700,8843195,-413199,-169940,708741,294199,523182,
    |201502,536485,-694740,102701,-743988,-130441,510542,-323740,345024,463373,1027731,-271116,204560,-163483,156488,-369918,
    |493800,475462,267919,586631,363494,-13166,-954701,-1207877,-1055106,151068,-869289,518028,-144396,581978,-115728,205823,
    |657675,-452552,-589038,134238,-107262,-924806,1416366,-519847,-50088,66022,-1552859,143564,-220279,583166,24289,-27771,
    |185264,-1115,1171554,-997867,494194,-6314,766337,-597429,665915,1192489,248553,8398984,-101855,1269069,-334871,-1238732,
    |-210040,-590577,-349123,-1233323,958766,-169528,220767,183647,581601,51053,295281,970756,122752,-198069,-614576,-358124,
    |207852,-408127,-1236930,-102187,217020,-343701,224162,-854670,-958584,-1055396,-189741,-667977,-1069678,-889169,-961217,-793827,
    |218438,1026202,641814,304736,-285172,926542,931046,72736,-51403,256493,-130015,-332064,410260,-312865,172941,-415794,
    |699526,1025317,247907,-201649,32634,-343197,592376,-272980,-279412,-54061,402426,594762,8779452,-643409,827339,43752,
    |725494,1018330,-416024,709789,-273659,355885,-1662263,236345,-146392,-323108,-321881,-103643,-1124083,667374,207936,1417113,
    |-1405408,808004,241876,-590032,119500,-899978,-281990,-140607,-231463,458555,-732840,173990,515441,-786700,-10071,-140143,
    |389821,-114971,304510,-348632,61384,212243,637955,566811,-42104,-258137,669108,-12703,911583,-418480,722968,-142150,
    |771260,-641946,-758839,-216226,651050,672284,-412110,399858,-716299,190346,-904125,-1380957,912827,9115462,-328040,-538223,
    |-681585,-205313,525194,-162208,-235309,535828,115246,139268,444237,-680540,1060257,114904,326270,-234047,-206799,145365,
    |713563,-251275,252675,-943346,-639420,-789829,50457,-538297,108562,-279548,-128973,285038,74076,151225,-113812,-244904,
    |-1130094,431339,278378,120987,-1201466,756062,445562,-154914,295706,-255592,-113924,813393,-937734,-259086,218295,334279,
    |88678,1319966,-120670,-676610,267916,-1357737,-1144588,230279,-350925,-900899,154357,181991,-987785,584224,8908221,-327440,
    |-450734,-139646,328731,27975,-242820,-102639,530724,-358699,-11703,-207970,-442424,209394,32401,333331,669078,22119,
    |-99266,402231,-937190,-232565,-368115,-22779,694236,-198231,-610754,-1348646,438861,103255,14617,-833033,384868,589220,
    |410197,-508871,1116142,-404630,-197279,-381945,-156252,784878,-98059,175067,-830278,270158,-1228138,-348215,651506,766769,
    |-751615,-334362,386023,-1100514,-36582,230740,370831,588272,216211,1083511,49457,864619,-109903,793303,242728,8787377,
    |296994,-565659,-680,703121,782725,-431633,623838,-138108,-335607,-525295,-385907,-1976611,-148844,615415,458947,50160,
    |-589211,544239,-523197,-272606,-274775,-379504,-182910,-236087,437643,-151778,-29383,-227070,698193,220777,-1258539,-757505,
    |460639,672268,-491226,293618,563659,104034,-104046,-324744,447742,739272,-989610,-65450,-685438,209948,848553,874679,
    |902016,-571901,702960,-775720,-25267,-510472,-1251866,-347936,255310,-870046,-620898,-419216,-815978,639530,50207,-546436,
    |8612073,881320,726255,372999,67642,-385680,1310784,1220827,-702583,316158,-180407,1190184,-492927,-90121,-202736,-235704,
    |-1069053,110908,-97040,-103010,-613436,-121043,-694132,-987145,-485320,-197235,-1033942,227917,578291,453440,-413762,-1181536,
    |905304,-382454,344054,170682,-851561,-875697,-663373,12152,146371,1318822,-563801,15798,-355830,-496407,-434875,-522515,
    |-37540,-1185560,683855,-59570,-53631,98654,-69054,137407,-414098,503520,-487220,118577,-795750,-219359,134734,633542,
    |-529007,8685566,6838,-318298,-69389,272424,-318427,-656663,1340956,-884524,814405,409268,-169846,646389,-369061,96853,
    |1282799,-275969,-507904,-1033036,48507,-855200,956109,-897174,-917911,546214,640044,1288433,-445179,-360382,777713,519666,
    |-836567,533195,-404594,-686258,964091,-703561,-233161,-93028,-800415,-260864,597640,532185,86910,197424,525579,439457,
    |-430206,-515580,46812,-439935,285096,-168807,1007362,-197242,-58854,-459709,791208,373199,513706,-428144,50885,52936,
    |-803254,572561,9107744,-432113,26339,-475528,-917682,-799598,-566228,448908,-697846,-56147,-330788,-1094329,-642050,-818741,
    |-11029,-312266,186331,-55208,-642408,-208770,36026,-365354,332035,30655,-590231,-341603,410123,-19116,182400,-1029816,
    |191486,-279206,-32378,154328,-564888,431888,218284,-1081903,-47560,449642,-300420,925425,55932,-559993,508787,-1083089,
    |-489959,-27369,565415,-14980,789242,43100,864137,240944,-171561,559006,-271808,687017,-624510,118715,-264978,-567816,
    |-327985,-108440,513903,9114759,-567848,-378582,-136800,136152,411656,288453,-408975,1258450,604321,-937339,425637,326784,
    |773405,100687,-75474,292959,324694,-777072,-197710,-855333,-90505,-206408,422824,-332524,334749,510459,-542699,935101,
    |-186641,-175626,-538720,540974,-97716,-414774,166009,182322,600935,-433266,216153,114638,556760,398505,-197426,96906,
    |370583,913830,768802,611585,829146,288047,-461818,64822,-738212,60918,770758,-951492,-98950,108290,60465,-625166,
    |510834,171993,196712,726719,9052818,-445941,-1540004,-417521,-118046,-666042,57264,-929852,533175,672514,907418,47714,
    |-281193,-1075945,527601,-169395,-87484,-685819,-166051,574881,-630138,-294549,1040958,-214405,-252159,-282557,-67799,95209,
    |-840759,116793,-424750,-818,-172197,-102864,-508499,-203553,886785,277216,-579441,521765,-600938,243877,381255,-211789,
    |97180,703545,-337963,528376,826343,118792,-175976,829754,-141740,-294726,106013,238699,-47032,-527950,-302355,440616,
    |486187,-945643,531575,366685,193949,9027762,466396,-571040,489424,110298,305760,-300317,-613521,468598,-1090360,-65655,
    |103703,-1008136,-373531,256774,-1024120,-637485,1622783,-390267,-1062360,792619,488114,269207,-97052,463611,9528,-37966,
    |-912833,596715,-945987,-278112,-801713,-845171,329858,226985,-50543,682696,660792,711871,206788,-394234,-285728,7531,
    |541057,507880,-107924,130633,122642,-701191,261116,-487276,282932,1156019,-243138,-276557,1583149,-608865,-464539,-533219,
    |-1122589,113372,830980,339513,1028582,-646266,8751590,1032948,305932,-1087798,1293232,-242807,-198761,241985,567574,-313884,
    |-354963,69047,228645,-715913,-17331,-297249,84071,716274,-509034,786804,825329,49196,369797,43361,501050,-559960,
    |-408122,-627723,-1114147,-70102,-13721,524351,76305,-128849,-245140,210476,510524,125594,222216,-550210,-1467187,-293491,
    |-599229,-417510,516206,-79191,-165398,73645,-82479,828589,354762,-253038,545120,-52228,-447916,300664,76399,672128,
    |-732038,385465,908379,-159885,258906,893537,-1066031,8925640,-40432,364169,-497523,233316,760939,504290,-405597,846794,
    |-554777,1276573,-127323,459793,906391,153344,25159,511938,-688281,-355612,752479,412794,-308245,-1126569,903375,-90316,
    |-42480,3822,-910520,251121,865904,-499089,600329,114649,400683,-235685,99961,-321532,-1086890,-221726,-127796,716437,
    |-329135,-117291,475437,-295013,513595,-39976,199089,453907,243096,-365976,-227980,-892007,457344,-293221,211894,154045,
    |537854,-1154690,479572,-92119,-168162,-822625,-489636,-148941,9161668,-219254,-36924,408634,248261,998546,-432356,128614,
    |-529527,-349543,-1296481,558412,177337,93667,-472951,565435,442630,501955,492718,-210867,-27665,678314,313568,-881730,
    |31798,-301708,-664734,275674,-108864,-91494,-683807,358191,-56542,1058354,36125,438266,-106003,-396458,59115,-62069,
    |471022,-685116,104451,-399289,1150651,-341848,324998,-763557,-75409,-516599,-782095,-408457,501208,313194,344308,408957,
    |-906554,292685,-694886,-394373,1086876,-235323,823372,-239557,109745,9085357,114354,-4697,-431361,897139,-617782,281308,
    |668985,251327,-152326,150899,36573,-1164693,-451126,-1253244,307106,-29323,-436694,-552789,353685,349766,659593,-321220,
    |-777207,465172,-70626,65331,571919,-383371,284105,615841,-230934,-821418,1154533,187200,-218640,-849283,-373753,-1339460,
    |-118188,205381,420877,652001,-333073,-2199,-206721,511551,-16628,-539560,-1046845,250278,2707,-925352,174112,778707,
    |508727,-748377,368982,447550,-206685,-476881,-1336121,5151,-427074,150796,8799660,-242649,329663,-505785,33388,-324336,
    |-1065750,-283156,-1351462,-78571,431723,362774,141560,-1118465,-884837,-741676,-469792,-68314,435621,-146493,1278176,-10918,
    |-161982,-734210,-780892,532156,-227881,456193,-318803,-227014,436252,-73151,1511075,-687667,-218522,-399242,-380882,-449917,
    |-781092,690753,668218,-499306,29562,33458,559062,-445648,382870,-119863,227789,-963119,306753,-22181,-173315,2235291,
    |-673711,-199483,-130508,-810706,867241,475520,305898,-867108,-390217,-294251,165631,8803818,48122,78895,-376500,-102602,
    |-465888,-273574,1108085,-165274,-150664,186323,157060,616310,258764,-1229887,-682494,-199070,-210972,-844262,-534940,-27619,
    |228176,825384,975963,38342,101167,-212287,121435,-971962,-876931,567633,377274,175378,-425491,254622,580840,53306,
    |219203,957465,-232050,-426853,42994,796213,-1029535,-250672,589540,507032,-143999,-210397,825400,-347686,-238144,96429,
    |342444,202071,328904,-273604,-326423,307015,308783,-484526,-134907,594784,-392162,-173312,9120160,1158422,-654279,-732816,
    |-809296,-129406,-370875,-287926,-144680,-235510,701424,-41612,-148443,315165,-1063686,252387,-313520,-785744,-170903,717222,
    |-287518,-210156,445275,886074,-258175,-952317,-301692,481539,67741,-586901,274501,-296689,841329,-121975,-117158,1212801,
    |555729,-1279894,459028,420376,-995657,-1132458,-567301,223046,-486332,451097,450195,439514,-513340,41363,-462847,-813740,
    |-104774,-896838,1017628,904349,-955078,-216826,-323393,-461156,-1124708,-625021,442368,559678,-466963,8763974,217109,470395,
    |580159,-112795,-184797,455680,328926,-612590,-41800,-597901,1011082,-373741,846113,347868,656808,-394661,-49737,-700444,
    |82878,-669081,-1498530,136096,355280,-867879,593309,-725926,337122,527501,907564,271891,-233772,648559,-33148,-74212,
    |-1141557,79097,129856,965481,567813,-379656,-179700,559340,-276365,249860,-1135225,639448,380921,516862,-287433,173168,
    |431311,433484,464454,-735495,-509191,1053657,-347551,-189360,99436,508014,-383122,320741,571685,18792,8736977,-306903,
    |881903,577226,-150744,1308884,1096782,1060026,472188,-256432,143322,846672,-1216507,-167387,402210,148468,669610,-223597,
    |-688225,-641070,466765,-469693,-324617,-277047,-641623,-32075,-908655,-842338,259439,489495,621332,-18349,-324235,686243,
    |254377,75199,401407,-493949,-441429,-77563,-817406,1018011,619552,681427,526562,-22249,-773258,-449145,-571154,-395096,
    |39932,-334664,588365,-605302,128286,69414,487362,-938698,137775,81717,-13472,333564,755052,-1137925,734311,8822271,
    |-123501,565040,-920840,-862687,-452076,-298074,656,-1282808,-355813,-1060010,-745,1166836,-236169,1086220,-337418,-567549,
    |-155527,-620181,-477260,-139118,-933990,293521,-264210,-1063296,-983889,-384725,439592,-154820,271926,-375848,111108,-437219,
    |-420424,528406,759835,108674,478511,-615879,509908,213889,484928,-119815,-57943,-528728,1560094,-822816,218603,623799,
    |1709584,-1076994,-27130,-687474,332607,-184213,60531,508630,201744,-620039,510165,-453501,617331,-241870,-1038082,-157225,
    |8837191,-50728,-145239,-837371,299410,701390,436494,-54999,466154,-1237820,-151234,-13864,442385,-330677,-176676,-541388,
    |472012,357051,-67349,-164607,-184168,665221,-345785,-174291,954379,-660645,641931,954527,185231,-183205,239843,858366,
    |484430,206876,-221304,-357071,243735,231186,-116523,-181673,-534246,-104576,-448643,596757,-634653,-54564,-567923,-374484,
    |-63179,-31799,372066,-90755,1219527,797377,-56918,-1120634,442153,-475283,466954,276536,-33896,244131,-787865,-826773,
    |318124,9176194,-240431,-516811,444602,127834,-378373,32646,401772,497018,-668633,422455,-442105,716389,435754,767592,
    |-385502,-475033,706672,-221166,643216,932937,841197,-667440,-123208,233048,-352312,-160646,177590,-823801,214906,54376,
    |771381,-434441,487894,363073,-222674,-76657,-450619,-232234,-235530,-795868,-642131,1480922,-686823,-224216,660138,655206,
    |232104,-156590,330064,67887,-181475,190025,269786,-270547,1545274,204515,1085243,-881481,292400,202667,29948,1051757,
    |184436,108848,8863434,697962,180665,371692,173087,-573766,-142200,354899,-280317,931366,-719008,-1462697,322988,111811,
    |72167,-406655,23402,-1435082,-584887,499409,-243783,-11464,122381,-1003761,37367,-706828,-571366,313311,-375768,-1445396,
    |488638,-445569,201617,232235,-156459,301005,-1062090,908648,-1409187,369730,-535786,-21035,1118891,493046,-79997,386431,
    |202707,549103,383576,-323491,304057,-671447,951561,-756742,-400173,-176352,-307588,165525,256158,-184623,-1277247,396146,
    |535140,470103,-795024,8740269,-389468,234601,-99139,-387331,-1489943,-522527,739242,459849,-427052,57654,31249,354269,
    |-231013,435970,604449,546779,-211300,-436373,-128097,247790,-638542,-592553,-390293,-445700,-1106286,-674581,-170656,-549433,
    |34959,-209510,857249,-334684,36132,-767077,1206660,298319,-39199,821067,188586,-790706,-381546,812686,383810,-356977,
    |554244,-90031,320813,-435490,276379,868812,321760,-946095,-328935,-144695,-551050,-158200,93633,-568504,-1089489,379050,
    |-635243,-190944,167709,295131,9059308,-487570,790295,-165769,-23350,301349,-330863,-482272,1174275,-132761,-240569,-503555,
    |1249451,861202,-114106,147988,-22238,-28588,752367,995536,658124,-738951,299926,888091,-568130,-736430,259651,-206337,
    |-55269,-390283,352343,282963,-95145,-651904,277833,-397733,-692705,441878,193084,110586,483100,720817,-106135,143189,
    |-38005,684674,246924,959539,636260,536080,319558,-366079,-149456,956876,-597225,-200127,48365,689257,-1049591,777198,
    |-386268,-516742,-446878,-705418,41772,9098549,111565,-220411,-300844,122845,-97699,253784,-580396,-512492,309150,-125,
    |-388854,-619979,861362,178707,-429005,-164499,1107381,-384560,420701,-735253,-201571,369448,36557,65919,1358898,1354401,
    |339764,1059275,-630112,13379,-159349,1409621,158480,414927,-725908,-282404,814554,-63317,184312,-61951,-786099,-11802,
    |586415,-184632,-57498,59581,36990,-1943632,-35054,790026,178413,816163,98630,443391,-859260,74840,-123709,12807,
    |-269367,229792,53613,248339,-268714,145803,8833034,12311,291634,440280,94254,-289703,447525,1040821,159467,556450,
    |519711,374578,411781,-128775,873662,-637821,-305921,-1016138,972736,44964,40883,-928828,-600654,916115,-275365,1140122,
    |1131349,126311,-301432,-793813,895572,-287366,-669233,50582,-470003,-116739,755554,866634,-251835,585733,-143387,92492,
    |258730,1149407,296498,1133463,-726845,466020,-83413,-480661,-327119,1254958,1428067,-472401,-82098,-56168,96101,1265401,
    |469353,25660,-3849,369115,224162,26649,-9168,8531002,79485,-1668347,-569670,139267,893254,-775770,65367,-584725,
    |-461340,-159044,-567075,-230292,150430,68892,-1089306,-1438430,590060,26502,-150905,-1502040,-936023,-54926,501411,-224625,
    |-564859,79812,-330198,684273,-128604,1066932,354998,-341860,478719,-75295,624021,842004,337889,358659,1097809,-502553,
    |153707,1302321,-417581,313661,827314,857937,593695,531110,-420742,-428340,1060240,-346520,430762,-568414,-426571,684872,
    |-603588,-104656,-148167,1206955,-138899,487626,-36003,-762293,8598483,11092,450110,-627427,-663957,288954,586939,-1434158,
    |-298979,-828384,391300,-494872,373494,-745857,-1224546,8832,-70447,350510,-966285,-741571,-109892,-521677,273545,386790,
    |-104318,293174,-101610,-669872,103264,600304,220342,-386178,946885,-101537,174844,551783,-285085,624096,1509468,-48828,
    |127944,-837257,45780,243503,422314,-806055,-622406,173535,-886189,-53059,1006882,1326145,15004,141370,-469693,1239989,
    |1236328,-147274,-580269,478858,-222548,321877,-487374,1195396,-760859,8772227,54724,19672,-207784,-581389,144212,-396555,
    |943953,230960,293873,506442,231062,-842328,-77909,-635440,-319231,60840,-443560,472352,-731359,446037,-521938,-1379721,
    |373033,698986,-66386,-592712,483184,-923628,-221560,-997441,558734,603009,749308,-275228,643138,433821,-505310,372137,
    |1292606,-647687,690367,-745167,-1129754,-196459,-725629,-693653,-412524,958398,439066,538173,500279,-692899,1021832,-261632,
    |-212583,947391,556954,-614641,154115,151885,141500,202361,189974,-40577,8777623,413332,-764987,-158105,-107176,455653,
    |-136867,-424841,-2666,439557,1372014,96711,306216,239305,-1077048,-16557,44720,-382990,160059,452250,-4191,-251226,
    |88944,196132,300340,793989,-572145,-277306,4241,-431791,1187243,112325,-666917,518987,241407,47857,382810,170271,
    |-279262,-859714,79150,485544,660178,-169966,65487,-63398,-65152,621185,-351178,203875,-453312,-367164,-36441,-1327043,
    |-121403,-391648,-852351,-15103,519799,-56180,418306,409449,861116,-40357,-489676,9187121,-173878,968003,-415951,-72874,
    |-27163,-608162,-614162,-607648,-191190,-503010,354339,-499203,-274473,76269,332768,756190,-777499,-498676,-365672,324181,
    |543910,-342644,-184262,-40759,9337,838316,-559501,434191,-678052,-287877,319603,974227,-254208,-154812,-102593,-652074,
    |-643113,248253,-770559,-547493,350118,180510,-399838,-19926,180287,-312009,-319188,456441,518220,-694532,-494262,-123758,
    |-260634,250483,473364,81705,-955499,674105,-586100,-839966,342582,313347,1065168,650089,9185596,-664578,-260329,-146444,
    |661716,-1047839,-98054,360811,-995053,44071,1484336,83251,-95917,56539,-161470,938005,303916,-496595,-906415,-1174247,
    |-365249,-126031,488555,194582,115009,634309,404729,-102561,258222,-208530,-313827,855418,523768,-43848,1306120,59953,
    |41729,450975,250752,-709357,-14642,61973,-397089,482179,-737010,-324353,159237,447620,985395,918511,-545297,-161797,
    |-62861,-505749,1476233,-34808,138780,360378,-853404,1520589,-292509,215579,103099,-738925,391618,8756160,558702,-300606,
    |155520,73981,733985,1061541,629888,-668968,-1052403,243060,1127195,211471,514561,-595137,441531,1151953,-271350,-494656,
    |-320635,50650,199979,-5361,-486495,-877760,109462,-1380513,-213877,751920,-63630,1021358,-57606,600465,-252465,1064081,
    |607035,-1101277,-226415,491121,64990,-217260,-10622,-562742,-108615,-709367,-1552910,123849,208880,-511334,-729492,461427,
    |197334,-374357,-81917,-144976,-190968,-547941,286580,-300143,-323845,-307488,-245733,94635,724723,-131120,8852105,331763,
    |227666,-444553,-694976,-135484,350252,177735,-95477,-507864,-704830,-404875,-365553,-11347,264467,-635206,-4253,1053629,
    |-798031,-683398,422667,579996,-681044,204891,74533,47423,261020,-364831,68485,862064,497360,512682,-95005,472937,
    |1208758,-256973,1070844,-809817,309509,191275,870397,51658,417466,311489,306972,-59416,-635227,423543,-96390,650204,
    |8557,-907426,-521347,-130088,476505,-90351,-764745,650764,1311136,166938,-191460,-324155,340422,58283,-147989,9090290""".stripMargin.replace("\n", " ")

  /**
   * OPQ replay (s_ann_opq / s_recall_opq): the rotation arrives as
   * the 4096 pinned integer literals of [[opqBasisSf001]]; rotated
   * vectors are the exact LONG dot products of 1e7-quantized
   * components scaled by 1e-14 (bit-equal to PqOps.rotateUdf), and
   * the rest is the s_ann_pq sub-codebook replay verbatim on the
   * rotated column — Forgy seed, one quantized-Lloyd round, integer
   * ADC — with the exact-cosine re-rank reading the ORIGINAL float
   * embeddings, exactly as PqOps.opqTopK does.
   */
  private def opqOracleSql(recall: Boolean): String =
    s"""WITH blist AS (SELECT unnest(range(0, 4096)) AS pos, unnest([$opqBasisSf001]) AS r),
       |b2 AS (SELECT (pos // 64)::INT AS i, (pos % 64)::INT AS j, r::BIGINT AS r FROM blist),
       |rq AS (
       |  SELECT e.vec_id, b2.i,
       |         sum(b2.r * floor(e.embedding[b2.j + 1]::DOUBLE * 10000000.0 + 0.5)::BIGINT)::BIGINT AS yq
       |  FROM embeddings e, b2 GROUP BY 1, 2),
       |rvec AS (SELECT vec_id, list(yq::DOUBLE / 100000000000000.0 ORDER BY i) AS rv FROM rq GROUP BY 1),
       |subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
       |dims AS (SELECT unnest(generate_series(1, 8)) AS d),
       |seed AS (SELECT vec_id, rv, row_number() OVER (ORDER BY vec_id) - 1 AS c
       |         FROM rvec QUALIFY c < 32),
       |c0 AS (
       |  SELECT sub, seed.c, list(seed.rv[sub*8 + d] ORDER BY d) AS cv
       |  FROM subs, seed, dims GROUP BY 1, 2),
       |s0 AS (
       |  SELECT vec_id, sub, c,
       |         list_sum(list_transform(range(1, 9),
       |           i -> (rv[sub*8 + i] - cv[i]) * (rv[sub*8 + i] - cv[i]))) AS dist
       |  FROM rvec, c0),
       |a0 AS (SELECT vec_id, sub, c AS cell FROM (
       |         SELECT vec_id, sub, c,
       |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
       |         FROM s0) z WHERE rn = 1),
       |m1 AS (
       |  SELECT a0.sub, a0.cell, dims.d,
       |         sum(floor(e.rv[a0.sub*8 + dims.d] * 10000000.0 + 0.5))::BIGINT AS sq,
       |         count(*) AS n
       |  FROM a0, rvec e, dims WHERE a0.vec_id = e.vec_id
       |  GROUP BY 1, 2, 3),
       |c1m AS (SELECT sub, cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY d) AS cv
       |        FROM m1 GROUP BY 1, 2),
       |c1 AS (SELECT c0.sub, c0.c, coalesce(c1m.cv, c0.cv) AS cv
       |       FROM c0 LEFT JOIN c1m ON c0.sub = c1m.sub AND c0.c = c1m.c),
       |s1 AS (
       |  SELECT vec_id, sub, c,
       |         list_sum(list_transform(range(1, 9),
       |           i -> (rv[sub*8 + i] - cv[i]) * (rv[sub*8 + i] - cv[i]))) AS dist
       |  FROM rvec, c1),
       |codes AS (SELECT vec_id, sub, c AS cell FROM (
       |            SELECT vec_id, sub, c,
       |                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
       |            FROM s1) z WHERE rn = 1),
       |qd AS (
       |  SELECT vec_id AS query_id, sub, c,
       |         floor(list_sum(list_transform(range(1, 9),
       |           i -> (rv[sub*8 + i] - cv[i]) * (rv[sub*8 + i] - cv[i])))
       |           * 1000000000.0 + 0.5)::BIGINT AS dq
       |  FROM rvec, c1 WHERE vec_id < 5),
       |adc AS (
       |  SELECT qd.query_id, x.vec_id AS neighbor_id, sum(qd.dq)::BIGINT AS adist_q
       |  FROM codes x JOIN qd ON qd.sub = x.sub AND qd.c = x.cell
       |  WHERE x.vec_id <> qd.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY adist_q ASC, neighbor_id ASC) AS arn
       |    FROM adc) z WHERE arn <= 50),""".stripMargin + "\n" +
      rerankTailSql(recall).stripMargin
  private def rerankTailSql(recall: Boolean): String = {
    val topk =
      """|scored AS (
         |  SELECT query_id, neighbor_id,
         |         round(
         |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
         |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
         |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
         |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
         |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
    val audit =
      """|scored_i AS (
         |  SELECT query_id, neighbor_id,
         |         round(
         |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
         |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
         |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
         |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
         |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
         |ap AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM scored_i) WHERE rank <= 5),
         |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |scored_b AS (
         |  SELECT query_id, ce.vec_id AS neighbor_id,
         |         round(
         |           list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
         |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
         |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
         |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
         |ex AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM scored_b) WHERE rank <= 5),
         |j AS (
         |  SELECT ex.query_id,
         |         (ap.neighbor_id IS NOT NULL)::INT AS hit
         |  FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id
         |                       AND ex.neighbor_id = ap.neighbor_id)
         |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
         |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
         |FROM j GROUP BY 1 ORDER BY query_id"""
    if (recall) audit else topk
  }

  /**
   * Corpus-priced AUTO-cells IVF replay (s_ann_ivf_auto /
   * s_recall_ivf_auto): the `geo` CTE re-derives the cell count the
   * Spark side prices from the corpus count — the smallest
   * power-of-two ncells in [16, 4096] with n ≤ 128·ncells — then the
   * s_ann_ivf machinery verbatim with the centroid generate range
   * read from `geo`.
   */
  private def ivfAutoOracleSql(recall: Boolean): String = {
    val prefix =
      """WITH geo AS (
        |  SELECT (1::BIGINT << e) AS ncells
        |  FROM (SELECT unnest(generate_series(4, 12)) AS e) ee,
        |       (SELECT count(*) AS n FROM embeddings) cc
        |  WHERE n <= 128 * (1::BIGINT << e) OR e = 12
        |  ORDER BY e LIMIT 1),
        |cent AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('centroid:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, (SELECT ncells FROM geo) - 1)) AS c)),
        |cellsim AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS csim
        |  FROM embeddings, cent),
        |ranked_cells AS (
        |  SELECT vec_id, c,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c ASC) AS crank
        |  FROM cellsim),
        |assign AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank = 1),
        |probes AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank <= 6 AND vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE p.vec_id <> a.vec_id),"""
    (prefix + "\n" + rerankTailSql(recall)).stripMargin
  }

  /**
   * Auto-banded query-directed probing replay (s_ann_lsh_auto /
   * s_recall_lsh_auto): the `geo` CTE re-derives the geometry the
   * Spark side prices from the corpus count — the smallest band width
   * in [6, 12] with n ≤ 128·2^bits, bands = min(8, 64/bits) — then
   * the same dots → signatures → per-band costs → per-band cheapest
   * `bits` perturbations machinery as [[lshQdOracleSql]], all bounds
   * read from `geo` instead of hardcoded.
   */
  private def lshQdAutoOracleSql(recall: Boolean): String = {
    val prefix =
      """WITH geo AS (
        |  SELECT bits, least(8, 64 // bits) AS bands,
        |         least(8, 64 // bits) * bits AS nbits,
        |         (1::BIGINT << bits) - 1 AS mask
        |  FROM (SELECT unnest(generate_series(6, 12)) AS bits) bb,
        |       (SELECT count(*) AS n FROM embeddings) cc
        |  WHERE n <= 128 * (1::BIGINT << bits) OR bits = 12
        |  ORDER BY bits LIMIT 1),
        |planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, (SELECT nbits FROM geo) - 1)) AS b)),
        |dots AS (
        |  SELECT vec_id, b,
        |         list_sum(list_transform(range(1, 65), i -> pl[i] * embedding[i]::DOUBLE)) AS dt
        |  FROM embeddings, planes),
        |sig AS (
        |  SELECT vec_id, sum(CASE WHEN dt > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM dots GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * geo.bits)) & geo.mask AS bandval
        |  FROM sig, geo, (SELECT unnest(generate_series(0, (SELECT bands FROM geo) - 1)) AS band) bb),
        |qband AS (
        |  SELECT vec_id, b // bits AS band,
        |         sum(CASE WHEN dt > 0 THEN (1::BIGINT << (b % bits)) ELSE 0 END)::BIGINT AS bandval,
        |         list(dt * dt ORDER BY b) AS costs,
        |         any_value(bits) AS bits
        |  FROM dots, geo WHERE vec_id < 5 GROUP BY 1, 2),
        |pert AS (
        |  SELECT vec_id, band, bandval, m, bits,
        |         list_sum(list_transform(range(0, bits),
        |           j -> CASE WHEN ((m >> j) & 1) = 1 THEN costs[j + 1] ELSE 0.0 END)) AS cost
        |  FROM qband, (SELECT unnest(generate_series(1, (SELECT mask FROM geo))) AS m) mm),
        |chosen AS (
        |  SELECT vec_id, band, xor(bandval, m) AS bandval FROM (
        |    SELECT vec_id, band, bandval, m, bits,
        |           row_number() OVER (PARTITION BY vec_id, band ORDER BY cost ASC, m ASC) AS rn
        |    FROM pert) p WHERE rn <= bits),"""
    (prefix + "\n" + lshProbeTailSql(recall)).stripMargin
  }

  /** q56 finisher over the hyperball body: per-node union of the
    * round estimates, one lag window per node, the median-t and
    * Σ t·Δ aggregates. `lin` swaps the median column for Lin's index
    * (q61): ball² div (Σd·1000) in HUGEINT, 1000 when Σd = 0. */
  private def ballProfileOracleSql(rounds: Int, lin: Boolean = false,
                                   mode: String = "und"): String = {
    val unions = (0 to rounds).map(t =>
      s"SELECT node, $t::BIGINT AS t, est FROM f$t").mkString("\n  UNION ALL ")
    val finisher =
      if (lin)
        s""",
            |agg AS (
            |  SELECT node,
            |         max(CASE WHEN t = $rounds THEN est END)::BIGINT AS ball_milli,
            |         sum(delta * t)::BIGINT AS sum_dist_milli
            |  FROM dd GROUP BY 1)
            |SELECT node, ball_milli, sum_dist_milli,
            |       (CASE WHEN sum_dist_milli > 0
            |             THEN (ball_milli::HUGEINT * ball_milli) // sum_dist_milli::HUGEINT
            |             ELSE 1000 END)::BIGINT AS lin_milli
            |FROM agg ORDER BY node"""
      else
        s"""SELECT node,
            |       max(CASE WHEN t = $rounds THEN est END)::BIGINT AS ball_milli,
            |       min(CASE WHEN est * 2 >= fin THEN t END)::BIGINT AS t_median,
            |       sum(delta * t)::BIGINT AS sum_dist_milli
            |FROM dd GROUP BY 1 ORDER BY node"""
    hyperballBodyCtes(rounds, mode) + ",\n" +
      (s"""|ub AS ($unions),
          |fin AS (SELECT node, est AS fin FROM f$rounds),
          |dd AS (
          |  SELECT ub.node, ub.t, ub.est, fin.fin,
          |         CASE WHEN ub.t > 0
          |              THEN greatest(ub.est - lag(ub.est) OVER (PARTITION BY ub.node ORDER BY ub.t), 0)
          |              ELSE 0 END AS delta
          |  FROM ub JOIN fin USING (node))
          |""" + finisher).stripMargin
  }

  private def hyperballBodyCtes(rounds: Int, mode: String = "und"): String = {
    // the directed modes drop the symmetrizing UNION (out: registers
    // flow dst→src so reachability flows along the edge; in: the
    // transpose) and seed nodes from BOTH endpoints so a pure
    // sink/source still carries its singleton ball
    val adjSql = mode match {
      case "out" => "adj AS (SELECT src AS a, dst AS b FROM e)"
      case "in"  => "adj AS (SELECT dst AS a, src AS b FROM e)"
      case _ =>
        "adj AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst AS a, src AS b FROM e)"
    }
    val nSql =
      if (mode == "und") "n AS (SELECT DISTINCT a AS node FROM adj)"
      else "n AS (SELECT a AS node FROM adj UNION SELECT b AS node FROM adj)"
    val lcTable = operators.SketchOps.linearCountMilli(8).mkString("[", ",", "]")
    def estCte(t: Int): String =
      s"""g$t AS (
         |  SELECT node, count(*)::BIGINT AS present,
         |         sum(1::BIGINT << (53 - r))::BIGINT AS sp
         |  FROM r$t GROUP BY 1),
         |f$t AS (
         |  SELECT node,
         |         CASE WHEN (256 - present) > 0 AND raw <= 640000
         |              THEN list_extract($lcTable, (256 - present)::INT)
         |              ELSE raw END AS est
         |  FROM (SELECT node, present,
         |               CAST(floor((0.7213 / (1 + 1.079 / 256.0)) * 256 * 256 * ((1::BIGINT << 53)::DOUBLE) * 1000.0
         |                          / (sp + (256 - present) * (1::BIGINT << 53))::DOUBLE + 0.5) AS BIGINT) AS raw
         |        FROM g$t) z$t)"""
    val props = (1 to rounds).map { t =>
      s"""r$t AS (
         |  SELECT node, idx, max(r) AS r FROM (
         |    SELECT node, idx, r FROM r${t - 1}
         |    UNION ALL
         |    SELECT adj.a AS node, p$t.idx, p$t.r
         |    FROM adj JOIN r${t - 1} p$t ON adj.b = p$t.node) u$t
         |  GROUP BY 1, 2),
         |${estCte(t)}"""
    }
    s"""WITH u AS (SELECT DISTINCT user_id AS id FROM events),
       |e AS (
       |  SELECT a.id AS src, a.id + 1 AS dst
       |  FROM u a JOIN u b ON b.id = a.id + 1 WHERE a.id % 64 <> 63
       |  UNION ALL
       |  SELECT a.id AS src, a.id + 16 AS dst
       |  FROM u a JOIN u b ON b.id = a.id + 16 WHERE a.id % 64 < 48),
       |$adjSql,
       |$nSql,
       |h0 AS (SELECT node, ('0x' || substr(md5(node::VARCHAR), 1, 15))::BIGINT AS h FROM n),
       |r0 AS (
       |  SELECT node, h // (1::BIGINT << 52) AS idx,
       |         max(CASE WHEN h % (1::BIGINT << 52) = 0 THEN 53
       |                  ELSE 53 - length(bin(h % (1::BIGINT << 52))) END) AS r
       |  FROM h0 GROUP BY 1, 2),
       |${estCte(0)},
       |${props.mkString(",\n")}""".stripMargin
  }

  /**
   * Farthest-point-sampling replay for p_fps_diverse: the greedy
   * unrolls — per round one argmax (dist DESC, id ASC, LIMIT 1) and
   * one least-fold of the running min-dist against the new centroid.
   * Distances round to 6 dp at every step exactly like the Spark
   * fold; CTEs MATERIALIZED (each d/s is read twice downstream).
   */
  private def fpsOracleSql(k: Int, poolSize: Int = 0): String = {
    def cos(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, 65), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE)) /
         |               (sqrt(list_sum(list_transform(range(1, 65), i -> $a.embedding[i]::DOUBLE * $a.embedding[i]::DOUBLE))) *
         |                sqrt(list_sum(list_transform(range(1, 65), i -> $b.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE))))"""
        .stripMargin
    val rounds = (2 to k).map { r =>
      s"""s$r AS MATERIALIZED (SELECT id, embedding, dist FROM d${r - 1} ORDER BY dist DESC, id ASC LIMIT 1),
         |d$r AS MATERIALIZED (
         |  SELECT d.id, d.embedding,
         |         least(d.dist, round(1.0 - ${cos("d", "s")}, 6)) AS dist
         |  FROM d${r - 1} d, s$r s WHERE d.id <> s.id)"""
    }
    val finals = (s"SELECT 1::BIGINT AS rank, id AS vec_id, 0.0 AS dist FROM s1" +:
      (2 to k).map(r => s"SELECT $r::BIGINT, id, dist FROM s$r")).mkString("\nUNION ALL ")
    // poolSize > 0 = the two-stage coreset form: the greedy runs on a
    // deterministic md5-ranked pool instead of the whole corpus
    val cSql =
      if (poolSize > 0)
        s"""c AS MATERIALIZED (
           |  SELECT id, embedding FROM (
           |    SELECT vec_id AS id, embedding,
           |           ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
           |    FROM embeddings) z
           |  ORDER BY h, id LIMIT $poolSize),"""
      else "c AS MATERIALIZED (SELECT vec_id AS id, embedding FROM embeddings),"
    s"""WITH $cSql
       |s1 AS MATERIALIZED (SELECT id, embedding FROM c ORDER BY id LIMIT 1),
       |d1 AS MATERIALIZED (
       |  SELECT c.id, c.embedding,
       |         round(1.0 - ${cos("c", "s")}, 6) AS dist
       |  FROM c, s1 s WHERE c.id <> s.id),
       |${rounds.mkString(",\n")}
       |$finals
       |ORDER BY rank""".stripMargin
  }

  /**
   * k-truss replay for q54: per peel round, the degree-oriented
   * triangle enumeration (the triangleCore convention — (deg, id) row
   * comparisons mirror Spark's struct compares), support as the
   * 3-edges-per-triangle union aggregate, then the threshold join.
   * Every CTE is MATERIALIZED — each is referenced 2-3× downstream
   * and DuckDB's default inlining would re-expand the whole chain
   * multiplicatively per round (the p_unigram_lm lesson).
   */
  private def ktrussOracleSql(k: Int, rounds: Int): String = {
    val thr = k - 2
    def roundCtes(r: Int): String =
      s"""d$r AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
         |  SELECT a AS node FROM e$r UNION ALL SELECT b FROM e$r) z$r GROUP BY 1),
         |o$r AS MATERIALIZED (
         |  SELECT CASE WHEN (dx.deg, e.a) < (dy.deg, e.b) THEN e.a ELSE e.b END AS u,
         |         CASE WHEN (dx.deg, e.a) < (dy.deg, e.b) THEN e.b ELSE e.a END AS v,
         |         CASE WHEN (dx.deg, e.a) < (dy.deg, e.b) THEN dy.deg ELSE dx.deg END AS dv
         |  FROM e$r e JOIN d$r dx ON dx.node = e.a JOIN d$r dy ON dy.node = e.b),
         |t$r AS MATERIALIZED (
         |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
         |  FROM o$r e1 JOIN o$r e2 ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
         |  JOIN o$r e3 ON e3.u = e1.v AND e3.v = e2.v),
         |s$r AS MATERIALIZED (
         |  SELECT a, b, count(*)::BIGINT AS sup FROM (
         |    SELECT least(x, y) AS a, greatest(x, y) AS b FROM t$r
         |    UNION ALL SELECT least(x, z), greatest(x, z) FROM t$r
         |    UNION ALL SELECT least(y, z), greatest(y, z) FROM t$r) u$r
         |  GROUP BY 1, 2)"""
    val peels = (0 until rounds).map { r =>
      roundCtes(r) + ",\n" +
        s"e${r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e$r e JOIN s$r s USING (a, b) WHERE s.sup >= $thr)"
    }
    s"""WITH raw AS (
       |  SELECT user_id % 997 AS u,
       |         (user_id + json_extract_string(props, '$$.k')::BIGINT) % 997 AS v
       |  FROM events),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
       |${peels.mkString(",\n")},
       |${roundCtes(rounds)}
       |SELECT e.a, e.b, coalesce(s.sup, 0)::BIGINT AS support
       |FROM e$rounds e LEFT JOIN s$rounds s USING (a, b)
       |ORDER BY a, b""".stripMargin
  }

  /**
   * Unigram-LM EM replay for p_unigram_lm: per round, the Viterbi
   * suffix DP unrolls as maxWordLen distance-from-end CTEs (key =
   * cost·1024 + tokens, min per word), the per-position choice table
   * tie-breaks (key ASC, piece length DESC), a recursive CTE walks
   * each word's single optimal path forward (the p_maxmatch_encode
   * seg pattern generalized to min-cost), and the recount prunes —
   * exactly TextOps.unigramLmVocab's fold, micro-nat costs included.
   */
  private def unigramLmOracleSql(emRounds: Int, maxWordLen: Int = 24): String = {
    def costCtes(r: Int, src: String): String =
      s"""t$r AS MATERIALIZED (SELECT sum(freq)::BIGINT AS total FROM $src),
         |vc$r AS MATERIALIZED (
         |  SELECT piece,
         |         (CAST(floor(ln(total::DOUBLE) * 1000000.0) AS BIGINT)
         |          - CAST(floor(ln(freq::DOUBLE) * 1000000.0) AS BIGINT)) AS cost
         |  FROM $src, t$r),
         |cc$r AS MATERIALIZED (SELECT CAST(floor(ln(total::DOUBLE) * 1000000.0) AS BIGINT) AS cc FROM t$r)"""
    def dpCtes(r: Int): String = {
      val ds = (1 to maxWordLen).map { d =>
        val branches = Seq(
          s"""    SELECT w.word, 1 AS l, d1.k + (SELECT cc FROM cc$r) * 1024 + 1 AS k
             |    FROM wl w JOIN r${r}_dp${d - 1} d1 USING (word) WHERE w.len >= $d""") ++
          (2 to math.min(4, d)).map { l =>
            s"""    SELECT w.word, $l AS l, dl.k + vc.cost * 1024 + 1 AS k
               |    FROM wl w JOIN r${r}_dp${d - l} dl USING (word)
               |    JOIN vc$r vc ON vc.piece = substr(w.word, w.len + 1 - $d, $l)
               |    WHERE w.len >= $d"""
          }
        s"""r${r}_cd$d AS MATERIALIZED (
           |${branches.mkString("\n    UNION ALL\n")}),
           |r${r}_dp$d AS MATERIALIZED (SELECT word, min(k) AS k FROM r${r}_cd$d GROUP BY 1)"""
      }
      val cdUnion = (1 to maxWordLen)
        .map(d => s"SELECT word, $d AS d, l, k FROM r${r}_cd$d")
        .mkString("\n          UNION ALL ")
      s"""r${r}_dp0 AS MATERIALIZED (SELECT word, 0::BIGINT AS k FROM wl),
         |${ds.mkString(",\n")},
         |r${r}_ch AS MATERIALIZED (
         |  SELECT word, pos, l FROM (
         |    SELECT c.word, wl.len + 1 - c.d AS pos, c.l, c.k,
         |           row_number() OVER (PARTITION BY c.word, c.d ORDER BY c.k ASC, c.l DESC) AS rn
         |    FROM ($cdUnion) c JOIN wl USING (word)) z WHERE rn = 1),
         |r${r}_walk AS (
         |  SELECT word, 1 AS pos FROM wl
         |  UNION ALL
         |  SELECT s.word, s.pos + ch.l FROM r${r}_walk s
         |  JOIN r${r}_ch ch ON ch.word = s.word AND ch.pos = s.pos
         |  JOIN wl ON wl.word = s.word
         |  WHERE s.pos <= wl.len),
         |v$r AS MATERIALIZED (
         |  SELECT substr(wl.word, s.pos, ch.l) AS piece, sum(wl.cnt)::BIGINT AS freq
         |  FROM r${r}_walk s
         |  JOIN r${r}_ch ch ON ch.word = s.word AND ch.pos = s.pos
         |  JOIN wl ON wl.word = s.word
         |  WHERE s.pos <= wl.len AND ch.l >= 2
         |  GROUP BY 1)"""
    }
    val rounds = (1 to emRounds).map { r =>
      costCtes(r, if (r == 1) "vocab" else s"v${r - 1}") + ",\n" + dpCtes(r)
    }
    ("WITH RECURSIVE " + SubwordVocabCtes.stripMargin + ",\n" +
      s"""|wl AS MATERIALIZED (SELECT word, cnt, len(word) AS len FROM w WHERE len(word) <= $maxWordLen),
          |${rounds.mkString(",\n")},
          |tf AS (SELECT sum(freq)::BIGINT AS total FROM v$emRounds)
          |SELECT row_number() OVER (ORDER BY freq DESC, piece ASC)::BIGINT AS rank,
          |       piece, freq,
          |       (CAST(floor(ln(tf.total::DOUBLE) * 1000000.0) AS BIGINT)
          |        - CAST(floor(ln(freq::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS cost_micro
          |FROM v$emRounds, tf ORDER BY rank""").stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    // exact BFS + quantized dependency sweep from the md5-ranked
    // pivot set, unrolled per level (the k-core/LPA round precedent)
    "q66_betweenness" -> betweennessOracleSql(3, 16),

    "q52_hyperball" -> hyperballOracleSql(3),

    "q53_neighborhood" -> neighborhoodOracleSql(4),

    // the q60 assignment with the U-shaped 40/20/40 schedule
    "q63_attribution_position" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |c AS (SELECT event_id AS cid, user_id, tsec AS cts FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT event_id, user_id, event_type, tsec FROM e WHERE event_type <> 'purchase'),
        |nx AS (
        |  SELECT t.event_id, t.user_id, t.event_type, t.tsec, c.cid,
        |         row_number() OVER (PARTITION BY t.event_id
        |                            ORDER BY c.cts ASC, c.cid ASC) AS rn
        |  FROM t JOIN c ON c.user_id = t.user_id
        |                AND c.cts > t.tsec AND c.cts - t.tsec <= 3600),
        |a AS (SELECT * FROM nx WHERE rn = 1),
        |g AS (
        |  SELECT event_type, user_id, cid,
        |         count(*) OVER (PARTITION BY user_id, cid) AS n,
        |         row_number() OVER (PARTITION BY user_id, cid
        |                            ORDER BY tsec ASC, event_id ASC) AS rfirst,
        |         row_number() OVER (PARTITION BY user_id, cid
        |                            ORDER BY tsec DESC, event_id DESC) AS rlast
        |  FROM a),
        |cr AS (
        |  SELECT event_type,
        |         CASE WHEN n = 1 THEN 1000000
        |              WHEN n = 2 THEN 500000
        |              WHEN rfirst = 1 THEN 400000
        |              WHEN rlast = 1
        |                THEN 400000 + 200000 - (200000 // (n - 2)) * (n - 2)
        |              ELSE 200000 // (n - 2) END AS position_ppm
        |  FROM g)
        |SELECT event_type, count(*)::BIGINT AS n_touches,
        |       sum(position_ppm)::BIGINT AS position_ppm
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q60 assignment with halving-bucket decay weights:
    // w = max(1e6 >> (age div 900), 1) — floored so all-stale
    // conversions never hit sum(w)=0 — credit w*1e6 // sum(w),
    // remainder to the last touch
    "q62_attribution_decay" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |c AS (SELECT event_id AS cid, user_id, tsec AS cts FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT event_id, user_id, event_type, tsec FROM e WHERE event_type <> 'purchase'),
        |nx AS (
        |  SELECT t.event_id, t.user_id, t.event_type, t.tsec, c.cid, c.cts,
        |         row_number() OVER (PARTITION BY t.event_id
        |                            ORDER BY c.cts ASC, c.cid ASC) AS rn
        |  FROM t JOIN c ON c.user_id = t.user_id
        |                AND c.cts > t.tsec AND c.cts - t.tsec <= 3600),
        |a AS (SELECT * FROM nx WHERE rn = 1),
        |g AS (
        |  SELECT event_type, user_id, cid, tsec, event_id,
        |         greatest((1000000 >> least((cts - tsec) // 900, 62)), 1)::BIGINT AS w,
        |         row_number() OVER (PARTITION BY user_id, cid
        |                            ORDER BY tsec DESC, event_id DESC) AS rlast
        |  FROM a),
        |wsum AS (
        |  SELECT *, sum(w) OVER (PARTITION BY user_id, cid) AS sw,
        |         (w * 1000000) // sum(w) OVER (PARTITION BY user_id, cid) AS base
        |  FROM g),
        |cr AS (
        |  SELECT event_type,
        |         base + CASE WHEN rlast = 1
        |                THEN 1000000 - sum(base) OVER (PARTITION BY user_id, cid)
        |                ELSE 0 END AS decay_ppm
        |  FROM wsum)
        |SELECT event_type, count(*)::BIGINT AS n_touches,
        |       sum(decay_ppm)::BIGINT AS decay_ppm
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    // nearest following conversion within lookback per touch (the
    // window scan replayed as a rank-1 pick), then the three credit
    // models with the remainder-to-last conservation rule
    "q60_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |c AS (SELECT event_id AS cid, user_id, tsec AS cts FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT event_id, user_id, event_type, tsec FROM e WHERE event_type <> 'purchase'),
        |nx AS (
        |  SELECT t.event_id, t.user_id, t.event_type, t.tsec, c.cid,
        |         row_number() OVER (PARTITION BY t.event_id
        |                            ORDER BY c.cts ASC, c.cid ASC) AS rn
        |  FROM t JOIN c ON c.user_id = t.user_id
        |                AND c.cts > t.tsec AND c.cts - t.tsec <= 3600),
        |a AS (SELECT * FROM nx WHERE rn = 1),
        |g AS (
        |  SELECT event_type, user_id, cid,
        |         count(*) OVER (PARTITION BY user_id, cid) AS n,
        |         row_number() OVER (PARTITION BY user_id, cid
        |                            ORDER BY tsec ASC, event_id ASC) AS rfirst,
        |         row_number() OVER (PARTITION BY user_id, cid
        |                            ORDER BY tsec DESC, event_id DESC) AS rlast
        |  FROM a)
        |SELECT event_type, count(*)::BIGINT AS n_touches,
        |       count(DISTINCT (user_id, cid))::BIGINT AS conversions_touched,
        |       sum(CASE WHEN rfirst = 1 THEN 1000000 ELSE 0 END)::BIGINT AS first_ppm,
        |       sum(CASE WHEN rlast = 1 THEN 1000000 ELSE 0 END)::BIGINT AS last_ppm,
        |       sum((1000000 // n) + CASE WHEN rlast = 1
        |             THEN 1000000 - (1000000 // n) * n ELSE 0 END)::BIGINT AS linear_ppm
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // directed register recurrences: same body, symmetrizing union
    // dropped (out) / edge set transposed (in)
    "q58_reach_out" -> hyperballOracleSql(3, mode = "out"),

    "q59_reach_in" -> hyperballOracleSql(3, mode = "in"),

    "q56_ball_profile" -> ballProfileOracleSql(3),

    "q61_lin_closeness" -> ballProfileOracleSql(3, lin = true),

    "q64_reach_profile" -> ballProfileOracleSql(3, mode = "out"),

    "q65_lin_in" -> ballProfileOracleSql(3, lin = true, mode = "in"),

    // chunk-level containment replay: the d_dedup_cdc instance CTEs,
    // per-doc distinct fps, the [2, 100] df keep rule, the fp-keyed
    // pair join + HAVING (the winnow oracle shape)
    "d_dedup_cdc_pairs" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, t,
        |         list_concat(list_concat([0],
        |           CASE WHEN length(t) >= 8 THEN
        |             list_filter(list_transform(generate_series(8, length(t)),
        |               i -> CASE WHEN ('0x' || substr(md5(substr(t, i - 7, 8)), 1, 15))::BIGINT % 64 = 0
        |                         THEN i END),
        |               x -> x IS NOT NULL)
        |           ELSE [] END), [length(t)]) AS bounds
        |  FROM n),
        |c AS (
        |  SELECT doc_id, unnest(list_filter(
        |           list_transform(generate_series(1, len(bounds) - 1),
        |             j -> substr(t, bounds[j] + 1, bounds[j + 1] - bounds[j])),
        |           s -> length(s) > 0)) AS chunk
        |  FROM b),
        |di AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS fp,
        |         length(chunk)::BIGINT AS clen
        |  FROM c),
        |keep AS (SELECT fp FROM di GROUP BY fp HAVING count(*) BETWEEN 2 AND 100)
        |SELECT a.doc_id AS id_a, bb.doc_id AS id_b,
        |       count(*)::BIGINT AS shared_chunks, sum(a.clen)::BIGINT AS shared_chars
        |FROM di a JOIN keep k ON a.fp = k.fp
        |          JOIN di bb ON a.fp = bb.fp AND a.doc_id < bb.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY id_a, id_b""".stripMargin,

    "q54_ktruss" -> ktrussOracleSql(4, 3),

    "p_fps_diverse" -> fpsOracleSql(6),

    // the same greedy unroll over the md5-ranked 64-vector pool
    "p_fps_coreset" -> fpsOracleSql(6, poolSize = 64),

    // life-table replay: per-user firsts, at-or-after conversion,
    // bucket counts, one cumulative window, integer ppm ratios
    "q55_survival" ->
      """WITH f AS (
        |  SELECT user_id AS u, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (
        |  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS tc
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT f.u, min(f.t0) AS t0,
        |         min(CASE WHEN c.tc >= f.t0 THEN c.tc END) AS tc
        |  FROM f LEFT JOIN c ON c.u = f.u GROUP BY 1),
        |b AS (SELECT CASE WHEN tc IS NOT NULL THEN (tc - t0) // 3600 END AS bucket FROM s),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM b),
        |d AS (SELECT bucket, count(*)::BIGINT AS n_conv FROM b WHERE bucket IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT bucket, n_conv,
        |         coalesce(sum(n_conv) OVER (ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prior
        |  FROM d)
        |SELECT bucket::BIGINT AS bucket,
        |       (tot.n_total - prior)::BIGINT AS n_risk, n_conv,
        |       (n_conv * 1000000 // (tot.n_total - prior))::BIGINT AS hazard_ppm,
        |       ((prior + n_conv) * 1000000 // tot.n_total)::BIGINT AS cum_conv_ppm
        |FROM w, tot ORDER BY bucket""".stripMargin,

    // censored replay: censor bucket from the corpus max timestamp,
    // risk set drops BOTH prior conversions and prior censors
    "q57_survival_censored" ->
      """WITH f AS (
        |  SELECT user_id AS u, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (
        |  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS tc
        |  FROM events WHERE event_type = 'purchase'),
        |te AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS t_end FROM events),
        |s AS (
        |  SELECT f.u, min(f.t0) AS t0,
        |         min(CASE WHEN c.tc >= f.t0 THEN c.tc END) AS tc
        |  FROM f LEFT JOIN c ON c.u = f.u GROUP BY 1),
        |b AS (
        |  SELECT coalesce((tc - t0) // 3600, (te.t_end - t0) // 3600) AS bucket,
        |         (tc IS NOT NULL) AS is_conv
        |  FROM s, te),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM b),
        |d AS (
        |  SELECT bucket,
        |         sum(CASE WHEN is_conv THEN 1 ELSE 0 END)::BIGINT AS n_conv,
        |         sum(CASE WHEN is_conv THEN 0 ELSE 1 END)::BIGINT AS n_cens
        |  FROM b GROUP BY 1),
        |w AS (
        |  SELECT bucket, n_conv, n_cens,
        |         coalesce(sum(n_conv + n_cens) OVER (ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prior_out,
        |         coalesce(sum(n_conv) OVER (ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prior_conv
        |  FROM d)
        |SELECT bucket::BIGINT AS bucket,
        |       (tot.n_total - prior_out)::BIGINT AS n_risk, n_conv, n_cens,
        |       (n_conv * 1000000 // (tot.n_total - prior_out))::BIGINT AS hazard_ppm,
        |       ((prior_conv + n_conv) * 1000000 // tot.n_total)::BIGINT AS cum_conv_ppm
        |FROM w, tot ORDER BY bucket""".stripMargin,

    "p_unigram_lm" -> unigramLmOracleSql(2),

    // CDC replay: per-position trailing-gram md5 boundary test (the
    // d_dedup_winnow per-gram convention), list-built bounds, spans
    // between consecutive bounds, md5 chunk fps counted corpus-wide
    "d_dedup_cdc" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, t,
        |         list_concat(list_concat([0],
        |           CASE WHEN length(t) >= 8 THEN
        |             list_filter(list_transform(generate_series(8, length(t)),
        |               i -> CASE WHEN ('0x' || substr(md5(substr(t, i - 7, 8)), 1, 15))::BIGINT % 64 = 0
        |                         THEN i END),
        |               x -> x IS NOT NULL)
        |           ELSE [] END), [length(t)]) AS bounds
        |  FROM n),
        |c AS (
        |  SELECT doc_id, unnest(list_filter(
        |           list_transform(generate_series(1, len(bounds) - 1),
        |             j -> substr(t, bounds[j] + 1, bounds[j + 1] - bounds[j])),
        |           s -> length(s) > 0)) AS chunk
        |  FROM b),
        |i AS (
        |  SELECT doc_id, ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS fp,
        |         length(chunk)::BIGINT AS clen
        |  FROM c),
        |f AS (SELECT fp, count(*) AS n_fp FROM i GROUP BY 1),
        |p AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_chunks,
        |         sum(CASE WHEN n_fp >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
        |         sum(CASE WHEN n_fp >= 2 THEN clen ELSE 0 END)::BIGINT AS dup_chars
        |  FROM i JOIN f USING (fp) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_chunks, 0)::BIGINT AS n_chunks,
        |       coalesce(n_dup_chunks, 0)::BIGINT AS n_dup_chunks,
        |       coalesce(dup_chars, 0)::BIGINT AS dup_chars
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "g_points" ->
      s"""$OracleM
         |SELECT path, value, "time",
         |       DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date,
         |       0::BIGINT AS "timestamp"
         |FROM m ORDER BY path, "time", value""".stripMargin,

    "g_points_reverse" ->
      s"""$OracleM
         |SELECT array_to_string(list_reverse(string_split(path, '.')), '.') AS path,
         |       value, "time",
         |       DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date,
         |       0::BIGINT AS "timestamp"
         |FROM m ORDER BY path, "time", value""".stripMargin,

    "g_drop_filters" ->
      s"""$OracleM
         |SELECT path, "time", value FROM m
         |WHERE "time" <= ${NowSec + 7 * 86400} AND "time" >= ${NowSec - 7 * 86400}
         |  AND length(path) <= 20
         |ORDER BY path, "time", value""".stripMargin,

    "g_blacklist" ->
      s"""$OracleM
         |SELECT DISTINCT path FROM m
         |WHERE NOT (regexp_matches(path, '^evt\\.error\\.[^.]*\\.[^.]*$$')
         |        OR regexp_matches(path, '^[^.]*\\.[^.]*\\.u0\\.[^.]*$$'))
         |ORDER BY path""".stripMargin,

    "g_index" ->
      s"""$OracleM,
         |series AS (
         |  SELECT DISTINCT DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date, path FROM m),
         |parts AS (SELECT date, path, string_split(path, '.') AS p FROM series),
         |rows_all AS (
         |  SELECT DATE '1970-02-12' AS date, len(p) + 20000 AS level, path FROM parts
         |  UNION ALL
         |  SELECT DATE '1970-02-12', i + 20000, array_to_string(p[1:i], '.') || '.'
         |    FROM parts, unnest(generate_series(1, len(p) - 1)) AS t(i)
         |  UNION ALL
         |  SELECT DATE '1970-02-12', len(p) + 30000, array_to_string(list_reverse(p), '.') FROM parts
         |  UNION ALL
         |  SELECT date, len(p), path FROM parts
         |  UNION ALL
         |  SELECT date, len(p) + 10000, array_to_string(list_reverse(p), '.') FROM parts)
         |SELECT DISTINCT date, level, path FROM rows_all
         |ORDER BY date, level, path""".stripMargin,

    "g_tagged" ->
      """WITH tser AS (
        |  SELECT DISTINCT
        |    DATE '1970-01-01' + CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS INT) AS date,
        |    'evt.' || event_type || '?env=prod&zone=u' || (user_id % 10) AS path,
        |    'evt.' || event_type AS name,
        |    'u' || (user_id % 10) AS zone
        |  FROM events)
        |SELECT date, unnest(['__name__=' || name, 'env=prod', 'zone=' || zone]) AS tag1, path,
        |       '__name__=' || name || ',env=prod,zone=' || zone AS tags_csv
        |FROM tser
        |ORDER BY date, tag1, path""".stripMargin,

    "g_tree" ->
      s"""$OracleM,
         |parts AS (SELECT DISTINCT path, string_split(path, '.') AS p FROM m),
         |rows_all AS (
         |  SELECT len(p) AS level, path FROM parts
         |  UNION ALL
         |  SELECT i, array_to_string(p[1:i], '.') || '.'
         |    FROM parts, unnest(generate_series(1, len(p) - 1)) AS t(i))
         |SELECT DISTINCT DATE '1970-02-12' AS date, level, path FROM rows_all
         |ORDER BY date, level, path""".stripMargin,

    "g_series" ->
      s"""$OracleM
         |SELECT DISTINCT DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date,
         |       len(string_split(path, '.')) AS level, path
         |FROM m ORDER BY date, level, path""".stripMargin,

    "g_series_reverse" ->
      s"""$OracleM
         |SELECT DISTINCT DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date,
         |       len(string_split(path, '.')) AS level,
         |       array_to_string(list_reverse(string_split(path, '.')), '.') AS path
         |FROM m ORDER BY date, level, path""".stripMargin,

    "g_tagged_ignored" ->
      """WITH tser AS (
        |  SELECT DISTINCT
        |    DATE '1970-01-01' + CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS INT) AS date,
        |    'evt.' || event_type || '?env=prod&zone=u' || (user_id % 10) AS path,
        |    'evt.' || event_type AS name,
        |    'u' || (user_id % 10) AS zone
        |  FROM events)
        |SELECT date,
        |       unnest(CASE WHEN name = 'evt.purchase' THEN ['__name__=' || name]
        |                   ELSE ['__name__=' || name, 'env=prod', 'zone=' || zone] END) AS tag1,
        |       path,
        |       '__name__=' || name || ',env=prod,zone=' || zone AS tags_csv
        |FROM tser
        |ORDER BY date, tag1, path""".stripMargin,

    "g_lww" ->
      s"""$OracleM
         |SELECT path, ("time" - "time" % 3600) AS bucket,
         |       round(arg_max(value, version), 4) AS value, max(version) AS version
         |FROM m GROUP BY 1, 2 ORDER BY path, bucket""".stripMargin,

    "g_rollup" ->
      s"""$OracleM
         |SELECT path, ("time" - "time" % 3600) AS "time",
         |       round(CASE
         |         WHEN regexp_matches(path, '\\.sum$$') THEN sum(value)
         |         WHEN regexp_matches(path, '\\.min$$') THEN min(value)
         |         WHEN regexp_matches(path, '\\.max$$') THEN max(value)
         |         ELSE avg(value) END, 4) AS value,
         |       count(*) AS points
         |FROM m GROUP BY 1, 2 ORDER BY path, "time"""".stripMargin,

    "g_rollup_multi" ->
      s"""$OracleM
         |SELECT path,
         |       CASE WHEN $NowSec - "time" >= 259200
         |            THEN ("time" - "time" % 3600)
         |            ELSE ("time" - "time" % 60) END AS "time",
         |       round(CASE
         |         WHEN regexp_matches(path, '\\.sum$$') THEN sum(value)
         |         WHEN regexp_matches(path, '\\.min$$') THEN min(value)
         |         WHEN regexp_matches(path, '\\.max$$') THEN max(value)
         |         ELSE avg(value) END, 4) AS value,
         |       count(*) AS points
         |FROM m GROUP BY 1, 2 ORDER BY path, "time"""".stripMargin,

    "g_find_prefix" ->
      s"""$OracleM,
         |series AS (
         |  SELECT DISTINCT DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date, path FROM m)
         |SELECT date, len(string_split(path, '.')) AS level, path
         |FROM series WHERE path LIKE 'evt.purchase.%'
         |ORDER BY date, level, path""".stripMargin,

    "g_find_suffix" ->
      s"""$OracleM
         |SELECT DISTINCT path FROM m WHERE path LIKE '%.sum' ORDER BY path""".stripMargin,

    "g_find_glob" ->
      s"""$OracleM,
         |series AS (
         |  SELECT DISTINCT DATE '1970-01-01' + CAST("time" // 86400 AS INT) AS date, path FROM m)
         |SELECT date, len(string_split(path, '.')) AS level, path
         |FROM series
         |WHERE regexp_matches(path, '^evt\\.[^.]*\\.u(?:2|4)\\.(?:sum|max)$$')
         |ORDER BY date, level, path""".stripMargin,

    "g_find_tag" ->
      """SELECT DISTINCT 'evt.' || event_type || '?env=prod&zone=u' || (user_id % 10) AS path
        |FROM events WHERE user_id % 10 = 3 ORDER BY path""".stripMargin,

    "g_find_multitag" ->
      """SELECT DISTINCT 'evt.' || event_type || '?env=prod&zone=u' || (user_id % 10) AS path
        |FROM events WHERE event_id % 2 = 0 AND user_id % 10 = 3 ORDER BY path""".stripMargin,

    // env=prod AND zone =~ u[34] AND zone != u4  ==  prod, bucket 3
    "g_find_tagspecs" ->
      """SELECT DISTINCT 'evt.' || event_type || '?env=prod&zone=u' || (user_id % 10) AS path
        |FROM events WHERE event_id % 2 = 0 AND user_id % 10 = 3 ORDER BY path""".stripMargin,

    "g_path_kernels" ->
      """WITH raw AS (
        |  SELECT DISTINCT 'evt..' || event_type || '..u' || (user_id % 10) AS raw FROM events),
        |clean AS (SELECT raw, regexp_replace(raw, '\.{2,}', '.', 'g') AS clean FROM raw)
        |SELECT raw, clean,
        |       array_to_string(list_reverse(string_split(clean, '.')), '.') AS rev,
        |       len(string_split(clean, '.')) AS level
        |FROM clean ORDER BY raw""".stripMargin,

    "g_json_fields" ->
      """SELECT event_id, regexp_extract(props, '"k": (\d+)', 1)::BIGINT AS k
        |FROM events
        |WHERE regexp_matches(props, '"k": (\d+)')
        |  AND regexp_extract(props, '"k": (\d+)', 1)::BIGINT % 7 = 0
        |ORDER BY event_id""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_join_agg" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q3_window_topk" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "q4_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 10""".stripMargin,

    "q5_setop" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_nationkey < 5
        |ORDER BY custkey""".stripMargin,

    "q6_grouping" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q7_events_hourly" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type, value FROM events)
        |SELECT (tsec - tsec % 3600) AS hour_ts, event_type,
        |       count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q8_new_series" ->
      s"""$OracleM,
         |births AS (
         |  SELECT path, min(DATE '1970-01-01' + CAST("time" // 86400 AS INT)) AS first_date
         |  FROM m GROUP BY 1)
         |SELECT first_date, count(*)::BIGINT AS new_series
         |FROM births GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_quantile_grid" ->
      """WITH cells AS (
        |  SELECT CAST(floor(value / 0.001) AS BIGINT) AS cell, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT cell, cnt, sum(cnt) OVER (ORDER BY cell
        |           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
        |  FROM cells),
        |n AS (SELECT count(*)::BIGINT AS n FROM events),
        |-- ::DOUBLE: a bare decimal list infers DECIMAL(4,3) and the
        |-- driver's typed compare would see 0.500 vs Spark's 0.5
        |p AS (SELECT unnest([0.5, 0.9, 0.99, 0.999]::DOUBLE[]) AS p)
        |SELECT p.p, q.cell, round(q.cell::DOUBLE * 0.001, 6) AS value_lo,
        |       q.cum, n.n
        |FROM p, n,
        |LATERAL (SELECT cell, cum FROM cum
        |         WHERE cum >= CAST(ceil(p.p * n.n::DOUBLE) AS BIGINT)
        |         ORDER BY cell LIMIT 1) q
        |ORDER BY p.p""".stripMargin,

    "q16_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS period
        |  FROM events),
        |c AS (SELECT user_id, min(period) AS cohort FROM a GROUP BY 1),
        |sz AS (SELECT cohort, count(*) AS cohort_size FROM c GROUP BY 1),
        |cell AS (
        |  SELECT cohort, a.period - cohort AS "offset", count(*) AS n_users
        |  FROM a JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT cohort, "offset", n_users, cohort_size,
        |       round(n_users::DOUBLE / cohort_size::DOUBLE, 4) AS retained
        |FROM cell JOIN sz USING (cohort)
        |ORDER BY cohort, "offset"""".stripMargin,

    // quintile = ((rank-1)*5) // n + 1 over an explicit (metric, user)
    // total order — ntile's arithmetic without trusting any engine's
    // boundary convention; scores flip so 5 = best
    "q44_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_day,
        |         count(*)::BIGINT AS frequency,
        |         sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))::BIGINT AS monetary_milli
        |  FROM events GROUP BY 1),
        |r AS (SELECT *, max(last_day) OVER () - last_day AS recency_days FROM u),
        |q AS (
        |  SELECT *,
        |    6 - (((row_number() OVER (ORDER BY recency_days ASC, user_id ASC) - 1) * 5)
        |         // (count(*) OVER ()) + 1) AS r_score,
        |    6 - (((row_number() OVER (ORDER BY frequency DESC, user_id ASC) - 1) * 5)
        |         // (count(*) OVER ()) + 1) AS f_score,
        |    6 - (((row_number() OVER (ORDER BY monetary_milli DESC, user_id ASC) - 1) * 5)
        |         // (count(*) OVER ()) + 1) AS m_score
        |  FROM r)
        |SELECT user_id, recency_days, frequency, monetary_milli,
        |       r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
        |       m_score::BIGINT AS m_score,
        |       (r_score * 100 + f_score * 10 + m_score)::BIGINT AS rfm
        |FROM q ORDER BY user_id""".stripMargin,

    "q45_markov" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY tsec ASC, event_id ASC) AS next_type
        |  FROM e),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type, count(*)::BIGINT AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n)::BIGINT AS n_from FROM t GROUP BY 1)
        |SELECT from_type, to_type, n, n_from,
        |       (n * 1000000 // n_from)::BIGINT AS share_ppm
        |FROM t JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // unrolled integer-PageRank: every op is bigint (pr//deg, (17s)//20),
    // so three CTE rounds replay Spark's three joins bit-for-bit
    "q17_pagerank" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.node,
           |         (3 * (SELECT base FROM params)) // 20
           |         + (17 * coalesce(c.s, 0)) // 20 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
           |    FROM edges e JOIN $prev p ON p.node = e.src
           |                 JOIN deg d ON d.node = e.src
           |    GROUP BY 1) c ON c.node = n.node)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT 'u' || user_id AS src, 'e' || event_type AS dst
         |  FROM events),
         |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |params AS (SELECT 1000000000 // count(*) AS base FROM nodes),
         |it0 AS (SELECT node, (SELECT base FROM params) AS pr FROM nodes),
         |${round("it0", "it1")},
         |${round("it1", "it2")},
         |${round("it2", "it3")}
         |SELECT node, pr FROM it3 ORDER BY node""".stripMargin
    },

    "q19_hits" -> {
      // one HITS round: auth step from the previous hub frame, then
      // hub step from the NEW auth frame — same order as GraphOps.hits
      def step(edgeKey: String, prev: String, raw: String, norm: String) =
        s"""$raw AS (
           |  SELECT f.${if (edgeKey == "src") "dst" else "src"} AS node,
           |         CAST(sum(p.score) AS BIGINT) AS s
           |  FROM fwd f JOIN $prev p ON p.node = f.$edgeKey GROUP BY 1),
           |$norm AS (
           |  SELECT node, (s * 1000000000) // (SELECT CAST(sum(s) AS BIGINT) FROM $raw) AS score
           |  FROM $raw)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT 'u' || user_id AS src, 'e' || event_type AS dst
         |  FROM events),
         |hubs AS (SELECT DISTINCT src AS node FROM fwd),
         |h0 AS (SELECT node, 1000000000 // (SELECT count(*) FROM hubs) AS score
         |       FROM hubs),
         |${step("src", "h0", "a1r", "a1")},
         |${step("dst", "a1", "h1r", "h1")},
         |${step("src", "h1", "a2r", "a2")},
         |${step("dst", "a2", "h2r", "h2")}
         |SELECT node, 'hub' AS side, score FROM h2
         |UNION ALL
         |SELECT node, 'auth' AS side, score FROM a2
         |ORDER BY side, node""".stripMargin
    },

    "q18_ppr" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.node,
           |         CASE WHEN n.node IN (SELECT node FROM seeds)
           |              THEN (3 * (SELECT base FROM params)) // 20 ELSE 0 END
           |         + (17 * coalesce(c.s, 0)) // 20 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
           |    FROM edges e JOIN $prev p ON p.node = e.src
           |                 JOIN deg d ON d.node = e.src
           |    GROUP BY 1) c ON c.node = n.node)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT 'u' || user_id AS src, 'e' || event_type AS dst
         |  FROM events),
         |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |seeds AS (SELECT node FROM nodes WHERE node LIKE 'e%'),
         |params AS (SELECT 1000000000 // count(*) AS base FROM seeds),
         |it0 AS (
         |  SELECT node, CASE WHEN node IN (SELECT node FROM seeds)
         |                    THEN (SELECT base FROM params) ELSE 0 END AS pr
         |  FROM nodes),
         |${round("it0", "it1")},
         |${round("it1", "it2")},
         |${round("it2", "it3")}
         |SELECT node, pr FROM it3 ORDER BY node""".stripMargin
    },

    // the oracle runs the THETA form of the same join — the semantics
    // the bucket-expansion plan must reproduce exactly
    "q20_interval_join" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS tsec, value
        |  FROM events),
        |s AS (
        |  SELECT event_id AS win_id, event_type AS k,
        |         tsec - 1800 AS lo, tsec + 1800 AS hi
        |  FROM e WHERE value >= 200)
        |SELECT s.win_id, s.k AS "key", count(x.event_id) AS n_in_window
        |FROM s LEFT JOIN e x
        |  ON x.event_type = s.k AND x.tsec >= s.lo AND x.tsec < s.hi
        | AND x.event_id <> s.win_id
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // unrolled plurality/min-label LPA: window argmax after the
    // (dst, label) count replays Spark's row_number round exactly
    // the fuzzy decontamination oracle replays the shared band CTEs on
    // BOTH splits, joins bandvals across them, then verifies with the
    // same word-shingle jaccard the near-dup oracles use
    "d_decontaminate_fuzzy" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT c.doc_id AS corpus_id, r.doc_id AS ref_id
        |  FROM band c JOIN band r ON c.band = r.band AND c.bandval = r.bandval
        |  WHERE c.doc_id >= 50 AND r.doc_id < 50),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT corpus_id, ref_id, count(*) AS inter
        |  FROM cand JOIN sh a ON corpus_id = a.doc_id
        |            JOIN sh b ON ref_id = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2)
        |SELECT corpus_id, ref_id,
        |       round(inter::DOUBLE / (x.n + y.n - inter), 4) AS jaccard
        |FROM inter JOIN n x ON corpus_id = x.doc_id JOIN n y ON ref_id = y.doc_id
        |WHERE round(inter::DOUBLE / (x.n + y.n - inter), 4) >= 0.5
        |ORDER BY corpus_id, ref_id""".stripMargin,

    "q27_zorder" ->
      """SELECT event_id, user_id % 1024 AS xb,
        |       CAST(floor(epoch(ts)) AS BIGINT) % 1024 AS yb,
        |       CAST(list_sum(list_transform(generate_series(0, 9),
        |         b -> (((user_id % 1024) >> b) & 1) * (1::BIGINT << (2 * b))
        |            + (((CAST(floor(epoch(ts)) AS BIGINT) % 1024) >> b) & 1) * (1::BIGINT << (2 * b + 1))))
        |         AS BIGINT) AS zkey
        |FROM events ORDER BY event_id""".stripMargin,

    "s_mrl_audit" ->
      """WITH e AS (
        |  SELECT label,
        |         list_sum(list_transform(range(1, 33), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS he,
        |         list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS te
        |  FROM embeddings),
        |c AS (SELECT label, sqrt(he / te) AS cos FROM e WHERE te > 0)
        |SELECT label::BIGINT AS label, count(*) AS n,
        |       round(avg(cos), 4) AS avg_cos, round(min(cos), 4) AS min_cos
        |FROM c GROUP BY 1 ORDER BY label""".stripMargin,

    "q28_pivot" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hour,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,

    "q29_transitions" ->
      """WITH b AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events),
        |x AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY tsec, event_id) AS next_type
        |  FROM b),
        |p AS (
        |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS cnt
        |  FROM x WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total FROM p GROUP BY 1)
        |SELECT from_type, to_type, cnt, (cnt * 1000000) // row_total AS p_micro
        |FROM p JOIN t USING (from_type) ORDER BY 1, 2""".stripMargin,

    "q23_clustering" ->
      """WITH raw AS (
        |  SELECT user_id % 997 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 997 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |deg AS (
        |  SELECT node, count(*) AS deg
        |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) q GROUP BY 1),
        |t AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tri AS (
        |  SELECT node, count(*) AS n_triangles
        |  FROM (SELECT unnest([x, y, z]) AS node FROM t) q GROUP BY 1)
        |SELECT d.node, d.deg, coalesce(n_triangles, 0)::BIGINT AS n_triangles,
        |       CASE WHEN d.deg >= 2
        |            THEN 2000000 * coalesce(n_triangles, 0) // (d.deg * (d.deg - 1))
        |            ELSE 0 END::BIGINT AS coef_micro
        |FROM deg d LEFT JOIN tri USING (node) ORDER BY d.node""".stripMargin,

    "q24_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, round(lo, 4) AS lo, round(hi, 4) AS hi,
        |       round(least(greatest(value, lo), hi), 4) AS value_w
        |FROM events JOIN b USING (event_type) ORDER BY event_id""".stripMargin,

    "p_curriculum" ->
      """WITH w AS (
        |  SELECT doc_id, lang, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang, len, np,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w),
        |q AS (
        |  SELECT doc_id, lang,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM f),
        |r AS (
        |  SELECT lang, doc_id, quality,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY quality DESC, doc_id ASC) AS rank,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM q)
        |SELECT lang, doc_id, quality, ((rank - 1) * 10) // n AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    // the p_curriculum quality/rank CTEs at k=4 feeding the p_pack
    // window per (bucket, shard), plus the bucket-major schedule base
    "p_pack_curriculum" ->
      """WITH w AS (
        |  SELECT doc_id, lang, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang, len, np,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w),
        |q AS (
        |  SELECT doc_id, lang,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM f),
        |r AS (
        |  SELECT lang, doc_id, quality,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY quality DESC, doc_id ASC) AS rank,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM q),
        |bk AS (SELECT doc_id, ((rank - 1) * 4) // n AS bucket FROM r),
        |t AS (
        |  SELECT doc_id,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS tokens,
        |         substr(md5('pack:' || doc_id), 1, 15) AS k,
        |         (('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT % 4) AS shard
        |  FROM documents),
        |c AS (
        |  SELECT t.doc_id, tokens, bucket, shard,
        |         (sum(tokens) OVER (PARTITION BY bucket, shard ORDER BY k, t.doc_id
        |                            ROWS UNBOUNDED PRECEDING) - tokens)::BIGINT AS seq_offset
        |  FROM t JOIN bk ON t.doc_id = bk.doc_id),
        |s AS (
        |  SELECT doc_id, tokens, bucket, shard, seq_offset,
        |         (seq_offset // 2048)::BIGINT AS seq_no
        |  FROM c),
        |ns AS (SELECT bucket, shard, max(seq_no) + 1 AS nseq FROM s GROUP BY 1, 2),
        |b AS (
        |  SELECT bucket, shard,
        |         coalesce(sum(nseq) OVER (PARTITION BY shard ORDER BY bucket
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS base
        |  FROM ns)
        |SELECT s.doc_id, tokens, bucket::BIGINT AS bucket, shard::BIGINT AS shard,
        |       seq_no, (base + seq_no)::BIGINT AS sched_no, seq_offset
        |FROM s JOIN b USING (bucket, shard) ORDER BY doc_id""".stripMargin,

    "p_shard" ->
      """WITH h AS (
        |  SELECT doc_id, s, md5('shard:' || s || ':' || doc_id) AS h
        |  FROM documents, (SELECT unnest(generate_series(0, 15)) AS s) sh),
        |r AS (
        |  SELECT doc_id, s,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
        |  FROM h)
        |SELECT doc_id, s::BIGINT AS shard FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "p_split_grouped" ->
      """SELECT doc_id, source,
        |       CASE WHEN b < 900 THEN 'train'
        |            WHEN b < 950 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id, source,
        |             ('0x' || substr(md5('split:' || source), 1, 8))::BIGINT % 1000 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // same triangle SET as the degree-oriented Spark plan, enumerated
    // in canonical a<b<c order (orientation changes join sizes, never
    // the triangles)
    "q22_triangles" ->
      """WITH raw AS (
        |  SELECT user_id % 997 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 997 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |t AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT unnest([x, y, z]) AS node FROM t)
        |SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1 ORDER BY node""".stripMargin,

    // wedge-counted common neighbors, hub-capped centers, anti-joined
    // against the edge set — the scores are exact LONGs by the same
    // // arithmetic the Spark plan uses
    "q37_link_pred" ->
      """WITH raw AS (
        |  SELECT user_id % 9973 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 9973 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |d AS (SELECT node, count(*) AS deg
        |      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY 1),
        |adj AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b AS node, a AS nbr FROM e),
        |cap AS (SELECT adj.node, adj.nbr FROM adj JOIN d ON adj.node = d.node AND d.deg <= 500),
        |cn AS (SELECT x.nbr AS node_a, y.nbr AS node_b, count(*) AS common
        |       FROM cap x JOIN cap y ON x.node = y.node AND x.nbr < y.nbr
        |       GROUP BY 1, 2 HAVING count(*) >= 10),
        |ne AS (SELECT cn.* FROM cn
        |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.node_a AND e.b = cn.node_b))
        |SELECT node_a, node_b, common,
        |       CAST((common * 1000000) // (da.deg + db.deg - common) AS BIGINT) AS jaccard_ppm,
        |       CAST(da.deg * db.deg AS BIGINT) AS pref_attach
        |FROM ne JOIN d da ON ne.node_a = da.node JOIN d db ON ne.node_b = db.node
        |ORDER BY node_a, node_b""".stripMargin,

    // q21's unrolled LPA rounds feed the exact rational Q: intra
    // edges + degree sums per community over the canonical edge set
    "q42_modularity" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT dst AS node, label FROM (
           |    SELECT e.dst, p.label, count(*) AS c,
           |           row_number() OVER (
           |             PARTITION BY e.dst
           |             ORDER BY count(*) DESC, p.label) AS rn
           |    FROM edges e JOIN $prev p ON p.node = e.src
           |    GROUP BY e.dst, p.label)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT 'u' || user_id AS src, 'e' || event_type AS dst
         |  FROM events),
         |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |it0 AS (SELECT node, node AS label FROM nodes),
         |${round("it0", "it1")},
         |${round("it1", "it2")},
         |${round("it2", "it3")},
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM edges WHERE src <> dst),
         |m AS (SELECT count(*)::BIGINT AS m FROM und),
         |deg AS (SELECT node, count(*) AS deg
         |        FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
         |        GROUP BY 1),
         |intra AS (
         |  SELECT la.label, count(*)::BIGINT AS ec
         |  FROM und JOIN it3 la ON und.a = la.node
         |           JOIN it3 lb ON und.b = lb.node
         |  WHERE la.label = lb.label GROUP BY 1),
         |dsum AS (
         |  SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS dc
         |  FROM deg d JOIN it3 l ON d.node = l.node GROUP BY 1),
         |perc AS (
         |  SELECT dsum.label, coalesce(intra.ec, 0) AS ec, dsum.dc
         |  FROM dsum LEFT JOIN intra USING (label))
         |SELECT (SELECT m FROM m) AS m,
         |       count(*)::BIGINT AS n_communities,
         |       CAST(sum(4 * (SELECT m FROM m) * ec - dc * dc) AS BIGINT) AS q_num,
         |       CAST(4 * (SELECT m FROM m) * (SELECT m FROM m) AS BIGINT) AS q_den,
         |       CAST(floor(sum(4 * (SELECT m FROM m) * ec - dc * dc) * 1000.0
         |              / (4.0 * (SELECT m FROM m) * (SELECT m FROM m))) AS BIGINT) AS q_milli
         |FROM perc""".stripMargin
    },

    // hash-min rounds unrolled: each round = edge-join + node-min,
    // exactly the Spark loop body
    "q43_components" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT node, min(comp) AS comp FROM (
           |    SELECT adj.b AS node, p.comp FROM adj JOIN $prev p ON adj.a = p.node
           |    UNION ALL SELECT node, comp FROM $prev) q
           |  GROUP BY 1)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT 'u' || user_id AS src,
         |         'e' || event_type || '_' || (user_id % 7) AS dst
         |  FROM events),
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM fwd WHERE src <> dst),
         |adj AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
         |c0 AS (SELECT DISTINCT a AS node, a AS comp FROM adj),
         |${round("c0", "c1")},
         |${round("c1", "c2")},
         |${round("c2", "c3")},
         |${round("c3", "c4")}
         |SELECT node, comp FROM c4 ORDER BY node""".stripMargin
    },

    // suffix-sum CCDF over the degree HISTOGRAM rows (distinct-degree
    // sized), exact ppm
    "q51_degree_hist" ->
      """WITH raw AS (
        |  SELECT user_id % 997 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 997 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |d AS (SELECT node, count(*) AS deg
        |      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY 1),
        |h AS (SELECT deg, count(*)::BIGINT AS n_nodes FROM d GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS n_total FROM d),
        |x AS (
        |  SELECT deg, n_nodes,
        |         sum(n_nodes) OVER (ORDER BY deg DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge
        |  FROM h)
        |SELECT deg::BIGINT AS deg, n_nodes,
        |       ((n_ge * 1000000) // n_total)::BIGINT AS ccdf_ppm
        |FROM x, t ORDER BY deg""".stripMargin,

    // edge annotation by both endpoint degrees, then a |ks|-way
    // conditional count — E_k over EXISTING edges only
    "q50_richclub" ->
      """WITH raw AS (
        |  SELECT user_id % 997 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 997 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |d AS (SELECT node, count(*) AS deg
        |      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY 1),
        |ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
        |ann AS (SELECT da.deg AS da, db.deg AS db
        |        FROM e JOIN d da ON e.a = da.node JOIN d db ON e.b = db.node),
        |er AS (SELECT k, count(*)::BIGINT AS e_rich FROM ann, ks
        |       WHERE da > k AND db > k GROUP BY 1),
        |nr AS (SELECT k, count(*)::BIGINT AS n_rich FROM d, ks WHERE deg > k GROUP BY 1)
        |SELECT ks.k::BIGINT AS k,
        |       coalesce(n_rich, 0)::BIGINT AS n_rich,
        |       coalesce(e_rich, 0)::BIGINT AS e_rich,
        |       CASE WHEN coalesce(n_rich, 0) >= 2
        |            THEN (coalesce(e_rich, 0) * 2000000) // (n_rich * (n_rich - 1))
        |            ELSE 0 END::BIGINT AS phi_ppm
        |FROM ks LEFT JOIN nr USING (k) LEFT JOIN er USING (k) ORDER BY k""".stripMargin,

    // lead-window gap replay: the (tsec, event_id) order is total, so
    // every gap is engine-identical; milli mean by integer division
    "q49_dwell" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_id
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |         lead(tsec) OVER (PARTITION BY user_id ORDER BY tsec ASC, event_id ASC) - tsec AS gap
        |  FROM e),
        |f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL)
        |SELECT event_type, count(*)::BIGINT AS n_gaps,
        |       ((sum(gap) * 1000) // count(*))::BIGINT AS mean_gap_milli,
        |       sum(CASE WHEN gap < 10 THEN 1 ELSE 0 END)::BIGINT AS lt_10s,
        |       sum(CASE WHEN gap >= 10 AND gap < 60 THEN 1 ELSE 0 END)::BIGINT AS s10_60,
        |       sum(CASE WHEN gap >= 60 AND gap < 600 THEN 1 ELSE 0 END)::BIGINT AS s60_600,
        |       sum(CASE WHEN gap >= 600 THEN 1 ELSE 0 END)::BIGINT AS ge_600s
        |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin,

    // micro-quantized log sum replay: floor(1e6 ln 2d) − floor(1e6 ln 3)
    // per tail node, integer-summed — identical term set on both engines
    "q48_powerlaw" ->
      """WITH raw AS (
        |  SELECT user_id % 997 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 997 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |d AS (SELECT node, count(*) AS deg
        |      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY 1),
        |s AS (SELECT count(*) AS n_nodes, max(deg) AS d_max,
        |             sum(CASE WHEN deg >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_tail,
        |             sum(CASE WHEN deg >= 2
        |                 THEN CAST(floor(ln(2 * deg) * 1000000.0) AS BIGINT)
        |                      - CAST(floor(ln(3) * 1000000.0) AS BIGINT)
        |                 ELSE 0 END)::BIGINT AS s_micro
        |      FROM d)
        |SELECT n_nodes::BIGINT AS n_nodes, 2::BIGINT AS d_min, d_max::BIGINT AS d_max,
        |       n_tail,
        |       CASE WHEN n_tail > 0
        |            THEN (1000 + (n_tail * 1000000000) // s_micro)::BIGINT
        |            ELSE NULL END AS alpha_milli
        |FROM s""".stripMargin,

    // exact min-distance pairs within radius 3 via a depth-capped
    // recursive CTE (UNION dedupes states), then the integer milli sum
    "q47_harmonic" ->
      """WITH RECURSIVE u AS (SELECT DISTINCT user_id AS id FROM events),
        |e AS (
        |  SELECT a.id AS src, a.id + 1 AS dst
        |  FROM u a JOIN u b ON b.id = a.id + 1 WHERE a.id % 64 <> 63
        |  UNION ALL
        |  SELECT a.id AS src, a.id + 16 AS dst
        |  FROM u a JOIN u b ON b.id = a.id + 16 WHERE a.id % 64 < 48),
        |adj AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst AS a, src AS b FROM e),
        |r AS (
        |  SELECT a AS src, b AS node, 1 AS d FROM adj
        |  UNION
        |  SELECT r.src, adj.b AS node, r.d + 1
        |  FROM r JOIN adj ON adj.a = r.node
        |  WHERE r.d < 3 AND r.src <> adj.b),
        |md AS (SELECT src, node, min(d) AS d FROM r WHERE src <> node GROUP BY 1, 2)
        |SELECT src AS node, sum(1000 // d)::BIGINT AS h_milli, count(*)::BIGINT AS n_reach
        |FROM md GROUP BY 1 ORDER BY 1""".stripMargin,

    // star contraction converges to the TRUE fixpoint, so the oracle
    // is exact min-label reachability (recursive CTE) — no round
    // unrolling, unlike q43's bounded hash-min replay
    "q46_components_stars" ->
      """WITH RECURSIVE u AS (SELECT DISTINCT user_id AS id FROM events),
        |e AS (
        |  SELECT a.id AS src, a.id + 1 AS dst
        |  FROM u a JOIN u b ON b.id = a.id + 1
        |  WHERE a.id % 32 <> 31),
        |und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst AS a, src AS b FROM e),
        |r AS (
        |  SELECT a AS node, a AS lbl FROM und
        |  UNION
        |  SELECT und.b AS node, r.lbl FROM r JOIN und ON und.a = r.node)
        |SELECT node, min(lbl)::BIGINT AS comp FROM r GROUP BY node ORDER BY node""".stripMargin,

    // projection pairs from the capped incidence self-join, then the
    // weighted unrolled PR rounds — contribution (pr·w) // Σw(src)
    "q41_cocitation_rank" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.node,
           |         (3 * (SELECT base FROM params)) // 20
           |         + (17 * coalesce(c.s, 0)) // 20 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum((p.pr * e.w) // d.wdeg) AS BIGINT) AS s
           |    FROM edges e JOIN $prev p ON p.node = e.src
           |                 JOIN wdeg d ON d.src = e.src
           |    GROUP BY 1) c ON c.node = n.node)""".stripMargin
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         text || ' https://h' || (doc_id % 23) || '.example.net/p http://h'
         |              || ((doc_id // 3) % 23) || '.example.net/q' AS text
         |  FROM documents),
         |hosts AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |           regexp_extract_all(text, 'https?://[^\\s]+'),
         |           u -> regexp_extract(u, '^https?://([^/\\s:?#]+)', 1)))) AS host
         |  FROM planted),
         |inc AS (SELECT DISTINCT doc_id AS l, host AS r FROM hosts WHERE host <> ''),
         |ld AS (SELECT l, count(*) AS ld FROM inc GROUP BY 1),
         |cap AS (SELECT inc.l, inc.r FROM inc JOIN ld USING (l) WHERE ld.ld <= 100),
         |co AS (SELECT x.r AS a, y.r AS b, count(*) AS w
         |       FROM cap x JOIN cap y ON x.l = y.l AND x.r < y.r GROUP BY 1, 2),
         |edges AS (SELECT a AS src, b AS dst, w FROM co
         |          UNION ALL SELECT b AS src, a AS dst, w FROM co),
         |wdeg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |params AS (SELECT 1000000000 // count(*) AS base FROM nodes),
         |it0 AS (SELECT node, (SELECT base FROM params) AS pr FROM nodes),
         |${round("it0", "it1")},
         |${round("it1", "it2")},
         |${round("it2", "it3")}
         |SELECT node, pr FROM it3 ORDER BY node""".stripMargin
    },

    // both orientations' degree sums as exact (HUGEINT-safe) integers,
    // the rational r through one floored double chain
    "q40_assortativity" ->
      """WITH raw AS (
        |  SELECT user_id % 997 AS u,
        |         (user_id + json_extract_string(props, '$.k')::BIGINT) % 997 AS v
        |  FROM events),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
        |d AS (SELECT node, count(*) AS deg
        |      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY 1),
        |p AS (SELECT da.deg AS da, db.deg AS db
        |      FROM e JOIN d da ON e.a = da.node JOIN d db ON e.b = db.node),
        |s AS (SELECT 2 * count(*) AS m2, 2 * sum(da * db) AS sum_xy,
        |             sum(da + db) AS sum_x, sum(da * da + db * db) AS sum_x2
        |      FROM p)
        |SELECT m2::BIGINT AS m2, sum_xy::BIGINT AS sum_xy,
        |       sum_x::BIGINT AS sum_x, sum_x2::BIGINT AS sum_x2,
        |       CASE WHEN (m2 * sum_x2 - sum_x * sum_x) <> 0
        |            THEN CAST(floor((m2 * sum_xy - sum_x * sum_x) * 1000.0
        |                   / (m2 * sum_x2 - sum_x * sum_x)) AS BIGINT)
        |            ELSE 0 END AS r_milli
        |FROM s""".stripMargin,

    // the SQ8 code build verbatim, then the md5-parity sign table and
    // the (id, j) sums — all integers end to end
    "s_jl_project" ->
      """WITH e AS (
        |  SELECT vec_id, i AS pos, embedding[i + 1]::DOUBLE AS x
        |  FROM embeddings, unnest(generate_series(0, 63)) AS t(i)),
        |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
        |codes AS (
        |  SELECT vec_id, pos,
        |         CASE WHEN mx > mn
        |              THEN CAST(least(255.0, floor((x - mn) * 255.0 / (mx - mn) + 0.5)) AS BIGINT)
        |              ELSE 0 END AS code
        |  FROM e JOIN st USING (pos)),
        |signs AS (
        |  SELECT pos, j,
        |         CASE WHEN ('0x' || substr(md5(pos::VARCHAR || '_' || j::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |              THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT DISTINCT pos FROM codes),
        |       (SELECT unnest(generate_series(0, 15)) AS j))
        |SELECT vec_id, j::BIGINT AS j, sum(code * sgn)::BIGINT AS val
        |FROM codes JOIN signs USING (pos)
        |GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin,

    // four unrolled peel rounds — keep nodes with current degree >= 50,
    // keep edges whose both endpoints survive — then the surviving
    // subgraph's degrees
    "q38_kcore" -> {
      def round(prev: String, cur: String, curK: String) =
        s"""$curK AS (
           |  SELECT node FROM (SELECT a AS node FROM $prev UNION ALL SELECT b AS node FROM $prev)
           |  GROUP BY node HAVING count(*) >= 50),
           |$cur AS (
           |  SELECT a, b FROM $prev
           |  WHERE a IN (SELECT node FROM $curK) AND b IN (SELECT node FROM $curK))""".stripMargin
      s"""WITH raw AS (
         |  SELECT user_id % 997 AS u,
         |         (user_id + json_extract_string(props, '$$.k')::BIGINT) % 997 AS v
         |  FROM events),
         |e0 AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw WHERE u <> v),
         |${round("e0", "e1", "k1")},
         |${round("e1", "e2", "k2")},
         |${round("e2", "e3", "k3")},
         |${round("e3", "e4", "k4")}
         |SELECT node, count(*) AS deg
         |FROM (SELECT a AS node FROM e4 UNION ALL SELECT b AS node FROM e4)
         |GROUP BY node ORDER BY node""".stripMargin
    },

    "q21_lpa" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT dst AS node, label FROM (
           |    SELECT e.dst, p.label, count(*) AS c,
           |           row_number() OVER (
           |             PARTITION BY e.dst
           |             ORDER BY count(*) DESC, p.label) AS rn
           |    FROM edges e JOIN $prev p ON p.node = e.src
           |    GROUP BY e.dst, p.label)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT 'u' || user_id AS src, 'e' || event_type AS dst
         |  FROM events),
         |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |it0 AS (SELECT node, node AS label FROM nodes),
         |${round("it0", "it1")},
         |${round("it1", "it2")},
         |${round("it2", "it3")}
         |SELECT node, label FROM it3 ORDER BY node""".stripMargin
    },

    "q33_no_orders" ->
      """SELECT c_custkey, c_nationkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q36_late_ship" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_gaps" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time",
         |         lag("time") OVER (PARTITION BY path
         |                           ORDER BY "time", version) AS prev_t
         |  FROM m)
         |SELECT path, prev_t AS gap_start, "time" AS gap_end,
         |       "time" - prev_t AS gap_sec
         |FROM x WHERE prev_t IS NOT NULL AND "time" - prev_t > 3600
         |ORDER BY path, gap_start""".stripMargin,

    "q34_local_supplier" ->
      """SELECT n_name,
        |       CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "q35_market_share" ->
      """WITH byn AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name AS nation,
        |         CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT) AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        |  GROUP BY 1, 2)
        |SELECT o_year, nation, revenue_cents,
        |       CAST((revenue_cents * 1000000) // sum(revenue_cents) OVER (PARTITION BY o_year) AS BIGINT) AS share_ppm
        |FROM byn ORDER BY o_year, nation""".stripMargin,

    "q31_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey < 5
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,

    // the salted join is row-identical to the plain join by
    // construction; the oracle states the plain join
    "q25_salted_join" ->
      """SELECT p_brand,
        |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
        |       count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q32_profile" -> profileOracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),

    "q26_kmv_overlap" ->
      """WITH ha AS (SELECT DISTINCT ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT AS h FROM orders),
        |hb AS (SELECT DISTINCT ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT AS h FROM customer),
        |ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha),
        |rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb),
        |ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
        |       FROM (SELECT h FROM ha UNION SELECT h FROM hb) u),
        |ea AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
        |                   ELSE 255.0 / (max(h) / 1152921504606846976.0) END AS e
        |       FROM ra WHERE rn <= 256),
        |eb AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
        |                   ELSE 255.0 / (max(h) / 1152921504606846976.0) END AS e
        |       FROM rb WHERE rn <= 256),
        |eu AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
        |                   ELSE 255.0 / (max(h) / 1152921504606846976.0) END AS e
        |       FROM ru WHERE rn <= 256)
        |SELECT round((SELECT e FROM ea), 4) AS est_a,
        |       round((SELECT e FROM eb), 4) AS est_b,
        |       round((SELECT e FROM eu), 4) AS est_union,
        |       round((SELECT e FROM ea) + (SELECT e FROM eb) - (SELECT e FROM eu), 4) AS est_intersect""".stripMargin,

    "p_distinct_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT lang, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, h,
        |         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |  FROM h)
        |SELECT lang, count(*) AS n_seen, max(h) AS kth_hash,
        |       round(CASE WHEN count(*) < 72 THEN count(*)::DOUBLE
        |                  ELSE 71.0 / (max(h) / 1152921504606846976.0) END,
        |             4) AS est_distinct
        |FROM r WHERE rn <= 72 GROUP BY lang ORDER BY lang""".stripMargin,

    "p_freq_cms" ->
      """WITH occ AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |rows_i AS (SELECT unnest(generate_series(0, 2)) AS row_i),
        |sk AS (
        |  SELECT row_i,
        |         ('0x' || substr(md5('cms' || row_i || ':' || token), 1, 15))::BIGINT % 16 AS bucket,
        |         count(*) AS cnt
        |  FROM occ CROSS JOIN rows_i GROUP BY 1, 2),
        |probe AS (
        |  SELECT DISTINCT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents WHERE doc_id % 100 = 0),
        |pb AS (
        |  SELECT p.token, r.row_i,
        |         ('0x' || substr(md5('cms' || r.row_i || ':' || p.token), 1, 15))::BIGINT % 16 AS bucket
        |  FROM probe p CROSS JOIN rows_i r),
        |est AS (
        |  SELECT pb.token, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_n
        |  FROM pb LEFT JOIN sk USING (row_i, bucket) GROUP BY 1),
        |exact AS (SELECT token, count(*) AS exact_n FROM occ GROUP BY 1)
        |SELECT e.token, x.exact_n, e.est_n, e.est_n - x.exact_n AS overcount
        |FROM est e JOIN exact x USING (token) ORDER BY token""".stripMargin,

    "q9_sessions" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec, value FROM events),
        |x AS (
        |  SELECT user_id, tsec, value,
        |         CASE WHEN lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec) IS NULL
        |                OR tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec) > 1800
        |              THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (
        |  SELECT user_id, tsec, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY tsec
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, min(tsec) AS session_start, max(tsec) AS session_end,
        |       max(tsec) - min(tsec) AS duration_s,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q10_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |p AS (SELECT event_id, user_id, tsec FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, tsec AS vtsec FROM e WHERE event_type = 'view'),
        |j AS (
        |  SELECT p.event_id, p.user_id, p.tsec, v.view_id, v.vtsec,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.vtsec DESC, v.view_id DESC) AS rn
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.vtsec <= p.tsec)
        |SELECT event_id, user_id, tsec, view_id, vtsec AS view_tsec,
        |       tsec - vtsec AS lag_s
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q11_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q12_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |s1 AS (SELECT user_id, min(tsec) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.tsec) AS t_click FROM e
        |       JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.tsec >= s1.t_view GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.tsec) AS t_purchase FROM e
        |       JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.tsec >= s2.t_click GROUP BY 1)
        |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 USING (user_id)
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,

    "g_summarize" ->
      s"""$OracleM
         |SELECT path, "time" - ("time" % 3600) AS bucket_start,
         |       count(*) AS n_points, round(sum(value), 4) AS value
         |FROM m GROUP BY 1, 2 ORDER BY path, bucket_start""".stripMargin,

    "g_per_second" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version, value,
         |         lag(value) OVER w AS pv, lag("time") OVER w AS pt
         |  FROM m WINDOW w AS (PARTITION BY path ORDER BY "time", version))
         |SELECT path, "time", version,
         |       round(CASE WHEN pt IS NOT NULL AND "time" - pt > 0 AND value - pv >= 0
         |                  THEN (value - pv) / CAST("time" - pt AS DOUBLE) END, 6) AS rate
         |FROM x ORDER BY path, "time", version""".stripMargin,

    "g_moving_avg" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version,
         |         count(*) OVER w AS n_window,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS sq
         |  FROM m WINDOW w AS (PARTITION BY path ORDER BY "time", version
         |                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT path, "time", version, n_window,
         |       round(CAST(sq AS DOUBLE) / CAST(n_window AS DOUBLE) / 1000000.0, 6) AS mavg
         |FROM x ORDER BY path, "time", version""".stripMargin,

    // exact frame median over the SAME 1e-6-quantized longs the Spark
    // side feeds percentile(0.5): both engines sort identical integers
    // and interpolate the two middle values exactly in doubles
    "g_moving_median" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version,
         |         count(*) OVER w AS n_window,
         |         median(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS mq
         |  FROM m WINDOW w AS (PARTITION BY path ORDER BY "time", version
         |                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT path, "time", version, n_window,
         |       round(mq / 1000000.0, 6) AS mmedian
         |FROM x ORDER BY path, "time", version""".stripMargin,

    // pair value/min series on path-minus-leaf after hourly "last"
    // consolidation (LWW first, then max-by-time per bucket);
    // Σ(vq·wq)/Σ(wq) divides exact LONG sums (vq 1e-6, wq 1e-3)
    "g_weighted_avg" ->
      s"""$OracleM,
         |lww AS (
         |  SELECT path, "time", max_by(value, version) AS value
         |  FROM m GROUP BY 1, 2),
         |cons AS (
         |  SELECT regexp_replace(path, '\\.[^.]*$$', '') AS pair_key,
         |         string_split(path, '.')[-1] AS leaf,
         |         "time" - "time" % 3600 AS bucket,
         |         max_by(value, "time") AS value
         |  FROM lww GROUP BY 1, 2, 3),
         |v AS (SELECT pair_key, bucket,
         |             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vq
         |      FROM cons WHERE leaf = 'value'),
         |w AS (SELECT pair_key, bucket,
         |             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS wq
         |      FROM cons WHERE leaf = 'min'),
         |j AS (SELECT v.pair_key, v.bucket, vq, wq
         |      FROM v JOIN w ON v.pair_key = w.pair_key AND v.bucket = w.bucket)
         |SELECT split_part(pair_key, '.', 2) AS grp, bucket,
         |       count(*)::BIGINT AS n_pairs,
         |       round(CASE WHEN sum(wq) > 0
         |                  THEN sum(vq * wq)::DOUBLE / sum(wq)::DOUBLE / 1000000.0 END, 6) AS wavg
         |FROM j GROUP BY 1, 2 ORDER BY grp, bucket""".stripMargin,

    "g_outliers" ->
      s"""$OracleM,
         |st AS (
         |  SELECT path, count(*) AS n,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS s1,
         |         sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)
         |             * CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS s2
         |  FROM m GROUP BY 1),
         |sx AS (
         |  SELECT path, s1::DOUBLE / 1000000.0 / n::DOUBLE AS mean,
         |         s2::DOUBLE / 1000000.0 / n::DOUBLE
         |           - (s1::DOUBLE / 1000000.0 / n::DOUBLE)
         |           * (s1::DOUBLE / 1000000.0 / n::DOUBLE) AS variance
         |  FROM st)
         |SELECT m.path, m."time", m.version, m.value,
         |       round((m.value - sx.mean) / sqrt(sx.variance), 4) AS zscore
         |FROM m JOIN sx ON m.path = sx.path
         |WHERE sx.variance > 0 AND abs((m.value - sx.mean) / sqrt(sx.variance)) > 3.0
         |ORDER BY m.path, m."time", m.version""".stripMargin,

    "g_cusum" ->
      s"""$OracleM,
         |b AS (SELECT path, "time", version,
         |             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q FROM m),
         |x AS (
         |  SELECT path, "time", version, q,
         |         sum(q) OVER (PARTITION BY path ORDER BY "time", version
         |                      ROWS UNBOUNDED PRECEDING) AS prefix,
         |         row_number() OVER (PARTITION BY path ORDER BY "time", version) AS i,
         |         count(*) OVER (PARTITION BY path) AS n,
         |         sum(q) OVER (PARTITION BY path) AS sq
         |  FROM b),
         |c AS (SELECT path, "time", version, n,
         |             CAST(n * prefix - i * sq AS BIGINT) AS cnum FROM x),
         |r AS (
         |  SELECT path, "time", version, n, cnum,
         |         row_number() OVER (PARTITION BY path
         |                            ORDER BY abs(cnum) DESC, "time", version) AS rn
         |  FROM c)
         |SELECT path, n::BIGINT AS n_points, "time" AS t_change,
         |       version AS version_change, cnum AS cusum_num,
         |       round(cnum::DOUBLE / (n::DOUBLE * 1000.0), 4) AS shift_milli
         |FROM r WHERE rn = 1 ORDER BY path""".stripMargin,

    "q30_benford" ->
      """WITH q AS (
        |  SELECT CAST(floor(abs(value) * 1000.0 + 0.5) AS BIGINT) AS q
        |  FROM events),
        |d AS (
        |  SELECT CAST(substr(q::VARCHAR, 1, 1) AS BIGINT) AS digit, count(*) AS cnt
        |  FROM q WHERE q >= 1 GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM d)
        |SELECT digit, cnt,
        |       round(n::DOUBLE * ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0), 4) AS expected,
        |       round((cnt::DOUBLE - n::DOUBLE * ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0))
        |             * (cnt::DOUBLE - n::DOUBLE * ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0))
        |             / (n::DOUBLE * ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0)), 4) AS chi2_term
        |FROM d, t ORDER BY digit""".stripMargin,

    "g_m4" ->
      s"""$OracleM,
         |b AS (SELECT path, "time" - ("time" % 3600) AS bucket_start,
         |             "time", version, value FROM m),
         |a AS (
         |  SELECT path, bucket_start, count(*) AS n_points,
         |         min(struct_pack(t := "time", ver := version, v := value)) AS f,
         |         max(struct_pack(t := "time", ver := version, v := value)) AS l,
         |         min(struct_pack(v := value, t := "time", ver := version)) AS lo,
         |         max(struct_pack(v := value, t := "time", ver := version)) AS hi
         |  FROM b GROUP BY 1, 2)
         |SELECT path, bucket_start, n_points,
         |       f.t AS t_first, f.v AS v_first, l.t AS t_last, l.v AS v_last,
         |       lo.t AS t_min, lo.v AS v_min, hi.t AS t_max, hi.v AS v_max
         |FROM a ORDER BY path, bucket_start""".stripMargin,

    "g_npercentile" ->
      s"""$OracleM
         |SELECT path, count(*)::BIGINT AS n_points,
         |       round(quantile_cont(value, 0.9), 4) AS pval
         |FROM m GROUP BY 1 ORDER BY path""".stripMargin,

    "g_remove_above_p" ->
      s"""$OracleM,
         |b AS (SELECT path, quantile_cont(value, 0.95) AS cap FROM m GROUP BY 1)
         |SELECT m.path, m."time", m.version, m.value
         |FROM m JOIN b USING (path) WHERE m.value <= b.cap
         |ORDER BY m.path, m."time", m.version""".stripMargin,

    "g_filter_avg_above" ->
      s"""$OracleM,
         |st AS (
         |  SELECT path,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))::DOUBLE
         |           / 1000000.0 / count(*)::DOUBLE AS stat
         |  FROM m GROUP BY 1)
         |SELECT m.path, m."time", m.version, m.value
         |FROM m JOIN st USING (path) WHERE st.stat > 49.5
         |ORDER BY m.path, m."time", m.version""".stripMargin,

    "g_sort_by_total" ->
      s"""$OracleM,
         |st AS (
         |  SELECT path, count(*) AS n_points,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS s1
         |  FROM m GROUP BY 1),
         |r AS (
         |  SELECT path, n_points, round(s1::DOUBLE / 1000000.0, 4) AS total,
         |         row_number() OVER (ORDER BY round(s1::DOUBLE / 1000000.0, 4) DESC, path ASC) AS rank
         |  FROM st)
         |SELECT rank::BIGINT AS rank, path, n_points, total
         |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "g_linreg" ->
      s"""$OracleM,
         |b AS (
         |  SELECT path, "time",
         |         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS q
         |  FROM m),
         |x AS (
         |  SELECT path,
         |         ("time" - min("time") OVER (PARTITION BY path)) // 60 AS x, q
         |  FROM b),
         |a AS (
         |  SELECT path, count(*)::BIGINT AS n,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(q) AS BIGINT) AS sq,
         |         CAST(sum(x * x) AS BIGINT) AS sxx,
         |         CAST(sum(x * q) AS BIGINT) AS sxq
         |  FROM x GROUP BY 1),
         |r AS (
         |  SELECT path, n, n * sxq - sx * sq AS slope_num,
         |         n * sxx - sx * sx AS slope_den, sx, sq
         |  FROM a)
         |SELECT path, n, slope_num, slope_den,
         |       CASE WHEN slope_den <> 0
         |            THEN round(slope_num::DOUBLE / slope_den::DOUBLE / 1000.0, 6)
         |       END AS slope_per_min,
         |       CASE WHEN slope_den <> 0
         |            THEN round((sq::DOUBLE / n::DOUBLE
         |                        - slope_num::DOUBLE / slope_den::DOUBLE
         |                          * (sx::DOUBLE / n::DOUBLE)) / 1000.0, 6)
         |       END AS intercept
         |FROM r ORDER BY path""".stripMargin,

    // the Holt fold replayed per series: recursive CTE carries (l, b)
    // through the (time, version)-ordered values, k counts processed
    // points — init after q0 (k=1), each step consumes rn = k+1
    "g_holt" ->
      s"""WITH RECURSIVE m AS (
         |  SELECT 'evt.' || event_type || '.u' || (user_id % 10) || '.' ||
         |         CASE user_id % 4 WHEN 0 THEN 'sum' WHEN 1 THEN 'min'
         |                          WHEN 2 THEN 'max' ELSE 'value' END AS path,
         |         value,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS "time",
         |         event_id AS version
         |  FROM events),
         |x AS (
         |  SELECT path, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS q,
         |         row_number() OVER (PARTITION BY path ORDER BY "time" ASC, version ASC) AS rn
         |  FROM m),
         |cnt AS (SELECT path, count(*)::BIGINT AS n FROM x GROUP BY 1),
         |walk AS (
         |  SELECT x0.path, 1 AS k, x0.q AS l, x1.q - x0.q AS b
         |  FROM x x0 JOIN x x1 ON x0.path = x1.path AND x0.rn = 1 AND x1.rn = 2
         |  UNION ALL
         |  SELECT path, k, (300 * q + 700 * (l + b)) // 1000 AS l,
         |         (100 * (((300 * q + 700 * (l + b)) // 1000) - l) + 900 * b) // 1000 AS b
         |  FROM (
         |    SELECT w.path, w.k + 1 AS k, w.l, w.b, x.q
         |    FROM walk w JOIN x ON x.path = w.path AND x.rn = w.k + 1)),
         |fin AS (
         |  SELECT w.path, c.n, w.l, w.b
         |  FROM walk w JOIN cnt c ON w.path = c.path AND w.k = c.n)
         |SELECT path, n, l AS level_milli, b AS trend_milli,
         |       (l + b)::BIGINT AS fc1_milli, (l + 2 * b)::BIGINT AS fc2_milli,
         |       (l + 3 * b)::BIGINT AS fc3_milli
         |FROM fin ORDER BY path""".stripMargin,

    // five lead pairs per point, truncation-division slopes on the
    // same doubled-micro LONGs, dyadic median via quantile_cont
    "g_theil_sen" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path,
         |         ("time" - min("time") OVER (PARTITION BY path)) // 60 AS x,
         |         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS q,
         |         "time", version
         |  FROM m),
         |l AS (
         |  SELECT path, x, q,
         |         lead(x, 1) OVER w AS x1, lead(q, 1) OVER w AS q1,
         |         lead(x, 2) OVER w AS x2, lead(q, 2) OVER w AS q2,
         |         lead(x, 3) OVER w AS x3, lead(q, 3) OVER w AS q3,
         |         lead(x, 4) OVER w AS x4, lead(q, 4) OVER w AS q4,
         |         lead(x, 5) OVER w AS x5, lead(q, 5) OVER w AS q5
         |  FROM x WINDOW w AS (PARTITION BY path ORDER BY "time" ASC, version ASC)),
         |p AS (
         |  SELECT path, x, q, x1 AS xk, q1 AS qk FROM l UNION ALL
         |  SELECT path, x, q, x2, q2 FROM l UNION ALL
         |  SELECT path, x, q, x3, q3 FROM l UNION ALL
         |  SELECT path, x, q, x4, q4 FROM l UNION ALL
         |  SELECT path, x, q, x5, q5 FROM l),
         |s AS (
         |  SELECT path, (((qk - q) * 1000) // (xk - x)) * 2 AS slope2
         |  FROM p WHERE xk IS NOT NULL AND xk > x),
         |r AS (
         |  SELECT path, count(*)::BIGINT AS n_slopes,
         |         CAST(quantile_cont(slope2::DOUBLE, 0.5) AS BIGINT) AS slope2_micro
         |  FROM s GROUP BY 1)
         |SELECT path, n_slopes, slope2_micro
         |FROM r ORDER BY path""".stripMargin,

    "g_mad" ->
      s"""$OracleM,
         |b AS (
         |  SELECT path,
         |         (CAST(floor(value * 1000.0 + 0.5) AS BIGINT) * 2)::DOUBLE AS q2
         |  FROM m),
         |med AS (
         |  SELECT path, count(*)::BIGINT AS n, quantile_cont(q2, 0.5) AS med2
         |  FROM b GROUP BY 1),
         |dev AS (
         |  SELECT b.path, n, med2, abs(q2 - med2) AS dev2
         |  FROM b JOIN med USING (path)),
         |mad AS (SELECT path, quantile_cont(dev2, 0.5) AS mad2 FROM dev GROUP BY 1)
         |SELECT d.path, max(n)::BIGINT AS n,
         |       round(max(med2) / 2000.0, 4) AS median,
         |       round(max(mad2) / 2000.0, 4) AS mad,
         |       CAST(sum(CASE WHEN mad2 > 0 AND dev2 > 3.5 * mad2
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dev d JOIN mad USING (path)
         |GROUP BY 1 ORDER BY d.path""".stripMargin,

    // the triple-smoothing fold replayed point-by-point through a
    // recursive CTE; integer // truncates toward zero, matching
    // Spark's div on the negative seasonal deviations
    "g_holt_winters" ->
      s"""WITH RECURSIVE m AS (
         |  SELECT 'evt.' || event_type || '.u' || (user_id % 10) || '.' ||
         |         CASE user_id % 4 WHEN 0 THEN 'sum' WHEN 1 THEN 'min'
         |                          WHEN 2 THEN 'max' ELSE 'value' END AS path,
         |         value,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS "time",
         |         event_id AS version
         |  FROM events),
         |x AS (
         |  SELECT path, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS q,
         |         row_number() OVER (PARTITION BY path ORDER BY "time" ASC, version ASC) AS rn
         |  FROM m),
         |cnt AS (SELECT path, count(*)::BIGINT AS n FROM x GROUP BY 1 HAVING count(*) >= 5),
         |init AS (
         |  SELECT x1.path, (x1.q + x2.q + x3.q + x4.q) // 4 AS l0,
         |         x1.q AS q1, x2.q AS q2, x3.q AS q3, x4.q AS q4
         |  FROM x x1
         |  JOIN x x2 ON x1.path = x2.path AND x2.rn = 2
         |  JOIN x x3 ON x1.path = x3.path AND x3.rn = 3
         |  JOIN x x4 ON x1.path = x4.path AND x4.rn = 4
         |  WHERE x1.rn = 1),
         |walk AS (
         |  SELECT i.path, 4::BIGINT AS k, l0 AS l, 0::BIGINT AS b,
         |         q1 - l0 AS s0, q2 - l0 AS s1, q3 - l0 AS s2, q4 - l0 AS s3
         |  FROM init i JOIN cnt c ON i.path = c.path
         |  UNION ALL
         |  SELECT path, k + 1 AS k, lv AS l,
         |         (100 * (lv - l) + 900 * b) // 1000 AS b,
         |         CASE WHEN k % 4 = 0 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s0 END AS s0,
         |         CASE WHEN k % 4 = 1 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s1 END AS s1,
         |         CASE WHEN k % 4 = 2 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s2 END AS s2,
         |         CASE WHEN k % 4 = 3 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s3 END AS s3
         |  FROM (
         |    SELECT w.path, w.k, w.l, w.b, w.s0, w.s1, w.s2, w.s3, x.q,
         |           CASE CAST(w.k % 4 AS INT) WHEN 0 THEN w.s0 WHEN 1 THEN w.s1
         |                                     WHEN 2 THEN w.s2 ELSE w.s3 END AS cs,
         |           (300 * (x.q - CASE CAST(w.k % 4 AS INT) WHEN 0 THEN w.s0 WHEN 1 THEN w.s1
         |                                                   WHEN 2 THEN w.s2 ELSE w.s3 END)
         |            + 700 * (w.l + w.b)) // 1000 AS lv
         |    FROM walk w JOIN x ON x.path = w.path AND x.rn = w.k + 1) step),
         |fin AS (
         |  SELECT w.path, c.n, w.k, w.l, w.b, w.s0, w.s1, w.s2, w.s3
         |  FROM walk w JOIN cnt c ON w.path = c.path AND w.k = c.n)
         |SELECT path, n, l AS level_milli, b AS trend_milli,
         |       s0 AS s0_milli, s1 AS s1_milli, s2 AS s2_milli, s3 AS s3_milli,
         |       (l + 1 * b + CASE CAST((k + 0) % 4 AS INT) WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END)::BIGINT AS fc1_milli,
         |       (l + 2 * b + CASE CAST((k + 1) % 4 AS INT) WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END)::BIGINT AS fc2_milli,
         |       (l + 3 * b + CASE CAST((k + 2) % 4 AS INT) WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END)::BIGINT AS fc3_milli,
         |       (l + 4 * b + CASE CAST((k + 3) % 4 AS INT) WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END)::BIGINT AS fc4_milli
         |FROM fin ORDER BY path""".stripMargin,

    // shared trailing frame, order statistics only — no arithmetic
    "g_moving_minmax" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version, value,
         |         min(value) OVER w AS mov_min,
         |         max(value) OVER w AS mov_max,
         |         count(*) OVER w AS n_window
         |  FROM m
         |  WINDOW w AS (PARTITION BY path ORDER BY "time", version
         |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
         |SELECT path, "time", version, value, mov_min, mov_max,
         |       n_window::BIGINT AS n_window
         |FROM x ORDER BY path, "time", version""".stripMargin,

    // the g_holt_winters walk with two more recurrence columns:
    // d (gamma-smoothed |q - pred|, pred = l + b + cs BEFORE update)
    // and c (aberrations beyond 3d after the k >= 8 warm-up)
    "g_hw_bands" ->
      s"""WITH RECURSIVE m AS (
         |  SELECT 'evt.' || event_type || '.u' || (user_id % 10) || '.' ||
         |         CASE user_id % 4 WHEN 0 THEN 'sum' WHEN 1 THEN 'min'
         |                          WHEN 2 THEN 'max' ELSE 'value' END AS path,
         |         value,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS "time",
         |         event_id AS version
         |  FROM events),
         |x AS (
         |  SELECT path, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS q,
         |         row_number() OVER (PARTITION BY path ORDER BY "time" ASC, version ASC) AS rn
         |  FROM m),
         |cnt AS (SELECT path, count(*)::BIGINT AS n FROM x GROUP BY 1 HAVING count(*) >= 5),
         |init AS (
         |  SELECT x1.path, (x1.q + x2.q + x3.q + x4.q) // 4 AS l0,
         |         x1.q AS q1, x2.q AS q2, x3.q AS q3, x4.q AS q4
         |  FROM x x1
         |  JOIN x x2 ON x1.path = x2.path AND x2.rn = 2
         |  JOIN x x3 ON x1.path = x3.path AND x3.rn = 3
         |  JOIN x x4 ON x1.path = x4.path AND x4.rn = 4
         |  WHERE x1.rn = 1),
         |walk AS (
         |  SELECT i.path, 4::BIGINT AS k, l0 AS l, 0::BIGINT AS b,
         |         q1 - l0 AS s0, q2 - l0 AS s1, q3 - l0 AS s2, q4 - l0 AS s3,
         |         0::BIGINT AS d, 0::BIGINT AS c
         |  FROM init i JOIN cnt cn ON i.path = cn.path
         |  UNION ALL
         |  SELECT path, k + 1 AS k, lv AS l,
         |         (100 * (lv - l) + 900 * b) // 1000 AS b,
         |         CASE WHEN k % 4 = 0 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s0 END AS s0,
         |         CASE WHEN k % 4 = 1 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s1 END AS s1,
         |         CASE WHEN k % 4 = 2 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s2 END AS s2,
         |         CASE WHEN k % 4 = 3 THEN (200 * (q - lv) + 800 * cs) // 1000 ELSE s3 END AS s3,
         |         (200 * abs(q - pred) + 800 * d) // 1000 AS d,
         |         c + CASE WHEN k >= 8 AND abs(q - pred) > 3 * d THEN 1 ELSE 0 END AS c
         |  FROM (
         |    SELECT w.path, w.k, w.l, w.b, w.s0, w.s1, w.s2, w.s3, w.d, w.c, x.q,
         |           CASE CAST(w.k % 4 AS INT) WHEN 0 THEN w.s0 WHEN 1 THEN w.s1
         |                                     WHEN 2 THEN w.s2 ELSE w.s3 END AS cs,
         |           w.l + w.b + CASE CAST(w.k % 4 AS INT) WHEN 0 THEN w.s0 WHEN 1 THEN w.s1
         |                                                 WHEN 2 THEN w.s2 ELSE w.s3 END AS pred,
         |           (300 * (x.q - CASE CAST(w.k % 4 AS INT) WHEN 0 THEN w.s0 WHEN 1 THEN w.s1
         |                                                   WHEN 2 THEN w.s2 ELSE w.s3 END)
         |            + 700 * (w.l + w.b)) // 1000 AS lv
         |    FROM walk w JOIN x ON x.path = w.path AND x.rn = w.k + 1) step),
         |fin AS (
         |  SELECT w.path, cn.n, w.k, w.l, w.b, w.s0, w.s1, w.s2, w.s3, w.d, w.c
         |  FROM walk w JOIN cnt cn ON w.path = cn.path AND w.k = cn.n),
         |fc AS (
         |  SELECT path, n, d, c,
         |         (l + b + CASE CAST(k % 4 AS INT) WHEN 0 THEN s0 WHEN 1 THEN s1
         |                                          WHEN 2 THEN s2 ELSE s3 END)::BIGINT AS fc1_milli
         |  FROM fin)
         |SELECT path, n, fc1_milli, d::BIGINT AS dev_milli,
         |       (fc1_milli - 3 * d)::BIGINT AS band_lo_milli,
         |       (fc1_milli + 3 * d)::BIGINT AS band_hi_milli,
         |       c::BIGINT AS n_aberrant
         |FROM fc ORDER BY path""".stripMargin,

    // rate x forward-gap areas as 1e-6-quantized LONG sums: the
    // bucket total is an integer sum, association-order-free
    "g_hitcount" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time",
         |         lead("time") OVER (PARTITION BY path ORDER BY "time", version)
         |           - "time" AS gap,
         |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vq
         |  FROM m)
         |SELECT path, "time" - ("time" % 3600) AS bucket_start,
         |       count(*) AS n_points,
         |       round(CAST(sum(vq * gap) AS DOUBLE) / 1000000.0, 4) AS hits
         |FROM x WHERE gap IS NOT NULL AND gap > 0
         |GROUP BY 1, 2 ORDER BY path, bucket_start""".stripMargin,

    // the breach inequality is integer: (n*q - S1)^2 > k^2*(n*S2 - S1^2)
    "g_bands" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version,
         |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
         |  FROM m),
         |f AS (
         |  SELECT path, "time", version, q,
         |         count(*) OVER w AS nw, sum(q) OVER w AS s1,
         |         sum(q * q) OVER w AS s2
         |  FROM x WINDOW w AS (PARTITION BY path ORDER BY "time", version
         |                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT path, "time", version, nw AS n_window,
         |       round(CAST(s1 AS DOUBLE) / CAST(nw AS DOUBLE) / 1000000.0, 6) AS mid,
         |       round(sqrt(CAST(nw * s2 - s1 * s1 AS DOUBLE)) / CAST(nw AS DOUBLE)
         |             / 1000000.0, 6) AS band_sigma,
         |       CASE WHEN (nw * q - s1) * (nw * q - s1) > 4 * (nw * s2 - s1 * s1)
         |            THEN 1 ELSE 0 END::BIGINT AS breach
         |FROM f ORDER BY path, "time", version""".stripMargin,

    // per-series variance ranks by the pure-integer key n*S2 - S1^2
    // over milli-quantized values; path tie-break totalizes the order
    "g_most_deviant" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS q
         |  FROM m),
         |a AS (
         |  SELECT path, count(*)::BIGINT AS n_points,
         |         sum(q)::BIGINT AS s1, sum(q * q)::BIGINT AS s2
         |  FROM x GROUP BY 1)
         |SELECT path, n_points, n_points * s2 - s1 * s1 AS var_key,
         |       round(CAST(n_points * s2 - s1 * s1 AS DOUBLE)
         |             / CAST(n_points * n_points AS DOUBLE) / 1000000.0, 6) AS variance
         |FROM a ORDER BY var_key DESC, path LIMIT 10""".stripMargin,

    "g_offset_to_zero" ->
      s"""$OracleM
         |SELECT path, "time", version,
         |       value - min(value) OVER (PARTITION BY path) AS value
         |FROM m ORDER BY path, "time", version""".stripMargin,

    "g_changed" ->
      s"""$OracleM
         |SELECT path, "time", version,
         |       coalesce(CASE WHEN value <> lag(value) OVER
         |           (PARTITION BY path ORDER BY "time", version)
         |         THEN 1 END, 0)::BIGINT AS changed
         |FROM m ORDER BY path, "time", version""".stripMargin,

    // sibling-leaf ratio on 1h buckets: exact LONG bucket sums reduce
    // to means, then ONE IEEE division — same op order as Spark
    "g_divide_series" ->
      s"""$OracleM,
         |b AS (
         |  SELECT regexp_replace(path, '\\.[^.]*$$', '') AS prefix,
         |         regexp_extract(path, '([^.]*)$$', 1) AS leaf,
         |         "time" - ("time" % 3600) AS bucket,
         |         count(*) AS n,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS sq
         |  FROM m WHERE regexp_extract(path, '([^.]*)$$', 1) IN ('value', 'min')
         |  GROUP BY 1, 2, 3),
         |num AS (SELECT prefix, bucket, n AS n_num, sq AS sq_num FROM b WHERE leaf = 'value'),
         |den AS (SELECT prefix, bucket, n AS n_den, sq AS sq_den FROM b WHERE leaf = 'min')
         |SELECT prefix, bucket, n_num, n_den,
         |       round(CASE WHEN sq_den <> 0 THEN
         |           (CAST(sq_num AS DOUBLE) / CAST(n_num AS DOUBLE)) /
         |           (CAST(sq_den AS DOUBLE) / CAST(n_den AS DOUBLE)) END, 6) AS ratio
         |FROM num JOIN den USING (prefix, bucket)
         |ORDER BY prefix, bucket""".stripMargin,

    "g_highest" ->
      s"""$OracleM,
         |st AS (
         |  SELECT path, count(*) AS n_points,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS s1
         |  FROM m GROUP BY 1),
         |r AS (
         |  SELECT path, n_points,
         |         round(s1::DOUBLE / 1000000.0 / n_points::DOUBLE, 6) AS avg_value
         |  FROM st),
         |rk AS (SELECT *, row_number() OVER (ORDER BY avg_value DESC, path ASC) AS rank
         |       FROM r)
         |SELECT rank::BIGINT AS rank, path, n_points, avg_value
         |FROM rk WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "g_derivative" ->
      s"""$OracleM
         |SELECT path, "time", version,
         |       round(value - lag(value) OVER (PARTITION BY path
         |                                      ORDER BY "time", version), 6) AS delta
         |FROM m ORDER BY path, "time", version""".stripMargin,

    "g_nn_derivative" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version,
         |         value - lag(value) OVER (PARTITION BY path
         |                                  ORDER BY "time", version) AS d
         |  FROM m)
         |SELECT path, "time", version,
         |       round(CASE WHEN d >= 0 THEN d END, 6) AS nn_delta
         |FROM x ORDER BY path, "time", version""".stripMargin,

    "g_integral" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
         |           OVER (PARTITION BY path ORDER BY "time", version
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rq
         |  FROM m)
         |SELECT path, "time", version,
         |       round(rq::DOUBLE / 1000000.0, 6) AS running_total
         |FROM x ORDER BY path, "time", version""".stripMargin,

    "g_time_shift" ->
      s"""$OracleM,
         |lww AS (
         |  SELECT path, gtime, value FROM (
         |    SELECT path, "time" - ("time" % 600) AS gtime, value,
         |           row_number() OVER (PARTITION BY path, "time" - ("time" % 600)
         |                              ORDER BY "time" DESC, version DESC) AS rn
         |    FROM m) WHERE rn = 1),
         |sh AS (SELECT path, gtime + 3600 AS gtime, value AS value_shifted
         |       FROM lww)
         |SELECT lww.path, lww.gtime, lww.value, sh.value_shifted,
         |       round(lww.value - sh.value_shifted, 6) AS shift_delta
         |FROM lww JOIN sh ON lww.path = sh.path AND lww.gtime = sh.gtime
         |ORDER BY lww.path, lww.gtime""".stripMargin,

    "g_keep_last" ->
      s"""$OracleM,
         |lww AS (
         |  SELECT path, gtime, value FROM (
         |    SELECT path, "time" - ("time" % 600) AS gtime, value,
         |           row_number() OVER (PARTITION BY path, "time" - ("time" % 600)
         |                              ORDER BY "time" DESC, version DESC) AS rn
         |    FROM m) WHERE rn = 1),
         |sp AS (SELECT path, min(gtime) AS t0, max(gtime) AS t1
         |       FROM lww GROUP BY 1),
         |grid AS (SELECT path, unnest(generate_series(t0, t1, 600)) AS gtime
         |         FROM sp),
         |j AS (SELECT grid.path, grid.gtime, lww.value
         |      FROM grid LEFT JOIN lww
         |        ON grid.path = lww.path AND grid.gtime = lww.gtime)
         |SELECT path, gtime, value IS NULL AS filled,
         |       round(last_value(value IGNORE NULLS)
         |               OVER (PARTITION BY path ORDER BY gtime
         |                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS value_ff
         |FROM j ORDER BY path, gtime""".stripMargin,

    "g_group_by_node" ->
      s"""$OracleM,
         |lww AS (SELECT path, "time", max_by(value, version) AS value
         |        FROM m GROUP BY 1, 2),
         |k AS (SELECT str_split(path, '.')[2] AS node_group, "time",
         |             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
         |      FROM lww)
         |SELECT node_group, "time", count(*) AS n_series,
         |       round(sum(q)::DOUBLE / 1000000.0, 6) AS value
         |FROM k GROUP BY 1, 2 ORDER BY node_group, "time"""".stripMargin,

    // g_integral with the window re-keyed on (path, hour bucket):
    // the reset IS the partition boundary
    "g_integral_by_interval" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time" - ("time" % 3600) AS bucket_start, "time", version,
         |         sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
         |           OVER (PARTITION BY path, "time" - ("time" % 3600)
         |                 ORDER BY "time", version
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rq
         |  FROM m)
         |SELECT path, bucket_start::BIGINT AS bucket_start, "time", version,
         |       round(rq::DOUBLE / 1000000.0, 6) AS running_total
         |FROM x ORDER BY path, "time", version""".stripMargin,

    "g_percentile_series" ->
      s"""$OracleM,
         |lww AS (SELECT path, "time", max_by(value, version) AS value
         |        FROM m GROUP BY 1, 2)
         |SELECT "time", count(*)::BIGINT AS n_series,
         |       round(quantile_cont(value, 0.9), 4) AS pval
         |FROM lww GROUP BY 1 ORDER BY "time"""".stripMargin,

    "g_as_percent" ->
      s"""$OracleM,
         |lww AS (SELECT path, "time", max_by(value, version) AS value
         |        FROM m GROUP BY 1, 2),
         |q AS (SELECT path, "time", value,
         |             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
         |      FROM lww),
         |t AS (SELECT "time", CAST(sum(q) AS BIGINT) AS total_q
         |      FROM q GROUP BY 1)
         |SELECT q.path, q."time", q.value,
         |       round(CASE WHEN t.total_q <> 0
         |                  THEN q.q::DOUBLE / t.total_q::DOUBLE * 100.0 END, 6) AS pct
         |FROM q JOIN t USING ("time") ORDER BY path, "time"""".stripMargin,

    "g_ema" -> {
      // the oracle is BUILT from SeriesOps.emaWeights — the identical
      // quantized integer weights the Spark plan multiplies by
      val wts = graft.operators.SeriesOps.emaWeights(8, 8)
      val num = wts.zipWithIndex.map { case (w, k) =>
        s"coalesce(CAST(floor(lag(value, $k) OVER w * 1000000.0 + 0.5) AS BIGINT) * $w, 0)"
      }.mkString("\n           + ")
      val den = wts.zipWithIndex.map { case (w, k) =>
        s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN $w ELSE 0 END"
      }.mkString("\n           + ")
      s"""$OracleM
         |SELECT path, "time", version,
         |       round(($num)::DOUBLE
         |             / ($den)::DOUBLE / 1000000.0, 6) AS ema
         |FROM m
         |WINDOW w AS (PARTITION BY path ORDER BY "time", version)
         |ORDER BY path, "time", version""".stripMargin
    },

    "g_moving_stddev" ->
      s"""$OracleM,
         |x AS (
         |  SELECT path, "time", version,
         |         count(*) OVER w AS n_window,
         |         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS s1,
         |         CAST(sum(CAST(floor(value * 1000.0 + 0.5) * floor(value * 1000.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS s2
         |  FROM m
         |  WINDOW w AS (PARTITION BY path ORDER BY "time", version
         |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT path, "time", version, n_window,
         |       round(sqrt(greatest(
         |         s2::DOUBLE / 1000000.0 / n_window::DOUBLE
         |           - (s1::DOUBLE / 1000000.0 / n_window::DOUBLE)
         |             * (s1::DOUBLE / 1000000.0 / n_window::DOUBLE), 0.0)), 6) AS mstddev
         |FROM x ORDER BY path, "time", version""".stripMargin,

    "g_seasonal" ->
      s"""$OracleM,
         |lww AS (SELECT path, "time", max_by(value, version) AS value
         |        FROM m GROUP BY 1, 2),
         |h AS (SELECT path, "time", ("time" % 86400) // 3600 AS hod, value FROM lww),
         |p AS (SELECT path, hod, count(*) AS n_slot,
         |             CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1
         |      FROM h GROUP BY 1, 2),
         |b AS (SELECT path, hod,
         |             round(s1::DOUBLE / 1000000.0 / n_slot::DOUBLE, 6) AS baseline
         |      FROM p)
         |SELECT h.path, h."time", h.hod, h.value, b.baseline,
         |       round(h.value - b.baseline, 6) AS residual
         |FROM h JOIN b USING (path, hod) ORDER BY path, "time"""".stripMargin,

    "q13_rolling" ->
      """WITH e AS (SELECT event_id, user_id,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS tsec, value FROM events)
        |SELECT event_id, user_id, tsec, value,
        |       count(*) OVER w AS n_window,
        |       round(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w
        |             AS DOUBLE) / 1000000.0, 6) AS sum_window
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec
        |                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q14_histogram" ->
      """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
        |       CAST(floor(value / 50.0) AS BIGINT)::DOUBLE * 50.0 AS bin_lo,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "d_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       min(doc_id) AS canonical_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // the canonicalizer replays as the same anchored regexp chain;
    // char-class scheme match avoids (?i) dialect differences
    "d_dedup_url" ->
      """WITH planted AS (
        |  SELECT doc_id, text || ' ' || CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'https://h' || (doc_id % 40) || '.example.com/p' || (doc_id % 40)
        |    WHEN 1 THEN 'http://h' || (doc_id % 40) || '.example.com/p' || (doc_id % 40) || '/'
        |    WHEN 2 THEN 'https://www.h' || (doc_id % 40) || '.example.com/p' || (doc_id % 40) || '?utm_source=feed'
        |    ELSE 'HTTPS://WWW.H' || (doc_id % 40) || '.EXAMPLE.COM/p' || (doc_id % 40) || '#frag' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |         regexp_extract(text, '[hH][tT][tT][pP][sS]?://[^\s]+', 0) AS url
        |  FROM planted),
        |q AS (
        |  SELECT doc_id, url,
        |         regexp_replace(regexp_replace(
        |           regexp_extract(url, '\?([^#]*)', 1),
        |           '(^|&)utm_[^&]*', '', 'g'), '^&', '') AS q2
        |  FROM u WHERE url <> ''),
        |c AS (
        |  SELECT doc_id,
        |         regexp_replace(lower(regexp_extract(url, '^[hH][tT][tT][pP][sS]?://([^/?#]+)', 1)), '^www\.', '')
        |         || regexp_replace(regexp_extract(url, '^[hH][tT][tT][pP][sS]?://[^/?#]+([^?#]*)', 1), '/$', '')
        |         || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canonical_url
        |  FROM q)
        |SELECT canonical_url, min(doc_id) AS canonical_id, count(*) AS dup_count
        |FROM c WHERE canonical_url <> ''
        |GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    "d_dedup_soft" ->
      """WITH f AS (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |c AS (SELECT fp, count(*)::BIGINT AS dup_count, min(doc_id) AS canon
        |      FROM f GROUP BY 1)
        |SELECT doc_id, dup_count,
        |       (1000000 // dup_count)::BIGINT AS weight_ppm,
        |       (1000000 - dup_count * (1000000 // dup_count))::BIGINT AS cluster_residue_ppm,
        |       CASE WHEN doc_id = canon THEN 1 ELSE 0 END::BIGINT AS is_canonical
        |FROM f JOIN c USING (fp) ORDER BY doc_id""".stripMargin,

    "d_dedup_minhash" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                        AND a.doc_id < b.doc_id
        |ORDER BY 1, 2""".stripMargin,

    "d_dedup_editdist" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN length(text) < 8 THEN [text]
        |         ELSE list_transform(generate_series(1, length(text) - 7),
        |                             i -> substr(text, i, 8)) END)) AS sh
        |  FROM documents),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 2 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |bc AS (SELECT band, bandval, count(*) AS c FROM band GROUP BY 1, 2),
        |keep AS (SELECT band.* FROM band JOIN bc USING (band, bandval) WHERE c <= 64),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM keep a JOIN keep b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |v AS (
        |  SELECT id_a, id_b, levenshtein(ta.text, tb.text)::BIGINT AS dist,
        |         greatest(length(ta.text), length(tb.text), 1)::BIGINT AS maxlen
        |  FROM cand JOIN documents ta ON id_a = ta.doc_id
        |            JOIN documents tb ON id_b = tb.doc_id)
        |SELECT id_a, id_b, dist,
        |       round(1.0 - dist::DOUBLE / maxlen::DOUBLE, 4) AS sim
        |FROM v WHERE dist <= 80 ORDER BY id_a, id_b""".stripMargin,

    "d_dedup_neardup" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT id_a, id_b, count(*) AS inter
        |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       round(inter::DOUBLE / (x.n + y.n - inter), 4) AS jaccard
        |FROM inter JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |WHERE round(inter::DOUBLE / (x.n + y.n - inter), 4) >= 0.8
        |ORDER BY 1, 2""".stripMargin,

    "d_dedup_simhash" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS word
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w),
        |bits AS (
        |  SELECT doc_id, b,
        |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, (SELECT unnest(generate_series(0, 59)) AS b) bb
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS simhash
        |  FROM bits GROUP BY 1),
        |seg AS (
        |  SELECT doc_id, simhash, seg, (simhash >> (seg * 6)) & 63 AS segval
        |  FROM sh, (SELECT unnest(generate_series(0, 9)) AS seg) ss)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |FROM seg a JOIN seg b ON a.seg = b.seg AND a.segval = b.segval
        |                      AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 9
        |ORDER BY 1, 2""".stripMargin,

    // same simhash replay, but the segment split is PICKED from the
    // corpus count exactly like DedupOps.simhashAutoSegments: largest
    // s in (10,6,5,4,3) with n <= 128 * 2^(60/s), else 2 — n counts
    // docs surviving the wordless filter, the signature-relation count
    "d_dedup_simhash_auto" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS word
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w),
        |bits AS (
        |  SELECT doc_id, b,
        |         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, (SELECT unnest(generate_series(0, 59)) AS b) bb
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS simhash
        |  FROM bits GROUP BY 1),
        |pick AS (
        |  SELECT CASE WHEN n <= 128 * (1::BIGINT << 6)  THEN 10
        |              WHEN n <= 128 * (1::BIGINT << 10) THEN 6
        |              WHEN n <= 128 * (1::BIGINT << 12) THEN 5
        |              WHEN n <= 128 * (1::BIGINT << 15) THEN 4
        |              WHEN n <= 128 * (1::BIGINT << 20) THEN 3
        |              ELSE 2 END AS s
        |  FROM (SELECT count(*) AS n FROM sh)),
        |seg AS (
        |  SELECT doc_id, simhash, seg,
        |         (simhash >> (seg * (60 // p.s))) & ((1::BIGINT << (60 // p.s)) - 1) AS segval
        |  FROM sh, pick p, (SELECT unnest(generate_series(0, 9)) AS seg) ss
        |  WHERE seg < p.s)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |FROM seg a JOIN seg b ON a.seg = b.seg AND a.segval = b.segval
        |                      AND a.doc_id < b.doc_id, pick p
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= p.s - 1
        |ORDER BY 1, 2""".stripMargin,

    "d_dedup_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       round(inter::DOUBLE / (x.n + y.n - inter), 4) AS jaccard
        |FROM inter JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.8
        |ORDER BY 1, 2""".stripMargin,

    // the EXACT prefix-filtered join must equal the brute-force
    // co-shingle join bit-for-bit — same oracle as d_dedup_jaccard
    // (recall 1 is the contract; the prefix filter may only prune
    // candidates that cannot reach the threshold). Both filter on the
    // UNROUNDED similarity — round-then-filter would admit true J down
    // to t-5e-5, which exact-threshold pruning legitimately drops.
    "d_dedup_prefix" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       round(inter::DOUBLE / (x.n + y.n - inter), 4) AS jaccard
        |FROM inter JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.8
        |ORDER BY 1, 2""".stripMargin,

    "d_split_leakage" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT id_a, id_b, count(*) AS inter
        |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b, round(inter::DOUBLE / (x.n + y.n - inter), 4) AS jaccard
        |  FROM inter JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |  WHERE round(inter::DOUBLE / (x.n + y.n - inter), 4) >= 0.8),
        |sp AS (
        |  SELECT doc_id, CASE WHEN b < 900 THEN 'train'
        |                      WHEN b < 950 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |               ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 1000 AS b
        |        FROM documents))
        |SELECT id_a, id_b, jaccard, a.split AS split_a, b.split AS split_b
        |FROM pairs JOIN sp a ON id_a = a.doc_id JOIN sp b ON id_b = b.doc_id
        |WHERE a.split <> b.split
        |ORDER BY id_a, id_b""".stripMargin,

    "s_split_leakage" ->
      """WITH pick AS (
        |  SELECT CASE WHEN n <= 128 * (1::BIGINT << 6)  THEN 6
        |              WHEN n <= 128 * (1::BIGINT << 7)  THEN 7
        |              WHEN n <= 128 * (1::BIGINT << 8)  THEN 8
        |              WHEN n <= 128 * (1::BIGINT << 9)  THEN 9
        |              WHEN n <= 128 * (1::BIGINT << 10) THEN 10
        |              WHEN n <= 128 * (1::BIGINT << 11) THEN 11
        |              WHEN n <= 128 * (1::BIGINT << 12) THEN 12
        |              WHEN n <= 128 * (1::BIGINT << 13) THEN 13
        |              ELSE 14 END AS bits
        |  FROM (SELECT count(*) AS n FROM embeddings)),
        |planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM pick, (SELECT unnest(generate_series(0, 55)) AS b) bb WHERE b < 4 * bits),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * bits)) & ((1::BIGINT << bits) - 1) AS bandval
        |  FROM sig, pick, (SELECT unnest(generate_series(0, 3)) AS band) bb),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bandval = b.bandval
        |                              AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT id_a, id_b,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * ae.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> be.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings ae ON id_a = ae.vec_id
        |            JOIN embeddings be ON id_b = be.vec_id),
        |sp AS (
        |  SELECT vec_id, CASE WHEN b < 900 THEN 'train'
        |                      WHEN b < 950 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT vec_id,
        |               ('0x' || substr(md5('split:' || vec_id), 1, 8))::BIGINT % 1000 AS b
        |        FROM embeddings))
        |SELECT id_a, id_b, sim, a.split AS split_a, b.split AS split_b
        |FROM scored JOIN sp a ON id_a = a.vec_id JOIN sp b ON id_b = b.vec_id
        |WHERE sim >= 0.4 AND a.split <> b.split
        |ORDER BY id_a, id_b""".stripMargin,

    "p_mixture_reweight" ->
      """WITH w AS (
        |  SELECT doc_id, lang, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang, len, np,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w),
        |q AS (
        |  SELECT doc_id, lang,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM f),
        |dm AS (
        |  SELECT lang AS domain, count(*)::BIGINT AS n_docs,
        |         CAST((sum(quality) * 1000000) // count(*) AS BIGINT) AS m
        |  FROM q GROUP BY 1),
        |w0 AS (SELECT domain, n_docs, m, 1000000::BIGINT AS wt FROM dm),
        |b1 AS (SELECT sum(wt * m) // sum(wt) AS base FROM w0),
        |w1 AS (SELECT domain, n_docs, m,
        |              (wt * greatest(1, 1000000 + 2000 * (m - base) // 1000000)) // 1000000 AS wt
        |       FROM w0, b1),
        |b2 AS (SELECT sum(wt * m) // sum(wt) AS base FROM w1),
        |w2 AS (SELECT domain, n_docs, m,
        |              (wt * greatest(1, 1000000 + 2000 * (m - base) // 1000000)) // 1000000 AS wt
        |       FROM w1, b2),
        |b3 AS (SELECT sum(wt * m) // sum(wt) AS base FROM w2),
        |w3 AS (SELECT domain, n_docs, m,
        |              (wt * greatest(1, 1000000 + 2000 * (m - base) // 1000000)) // 1000000 AS wt
        |       FROM w2, b3),
        |b4 AS (SELECT sum(wt * m) // sum(wt) AS base FROM w3),
        |w4 AS (SELECT domain, n_docs, m,
        |              (wt * greatest(1, 1000000 + 2000 * (m - base) // 1000000)) // 1000000 AS wt
        |       FROM w3, b4)
        |SELECT domain, n_docs, m AS mean_loss_micro,
        |       CAST((wt * 1000000) // (SELECT sum(wt) FROM w4) AS BIGINT) AS weight_ppm
        |FROM w4 ORDER BY domain""".stripMargin,

    "p_dedup_savings" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, '  ' || text || chr(10) FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000, text FROM documents WHERE doc_id % 11 = 0)
        |SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       count(*) AS n_copies, min(doc_id) AS kept_id,
        |       sum(length(text))::BIGINT AS total_chars,
        |       (sum(length(text)) - arg_min(length(text), doc_id))::BIGINT AS saved_chars
        |FROM c GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY fp""".stripMargin,

    // replays redact()'s SEQUENTIAL counting semantics (emails on raw
    // text, IPs after email masking, phones after both); DuckDB
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all default
    "t_pii_audit" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text ||
        |         CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        |         CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || (doc_id % 256) || '.7' ELSE '' END ||
        |         CASE WHEN doc_id % 7 = 0 THEN ' call +1 (555) 123-45' || (doc_id % 10) || (doc_id % 10) ELSE '' END AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM p),
        |d AS (
        |  SELECT doc_id, n_emails,
        |    len(regexp_extract_all(t1, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}'))::BIGINT AS n_ips,
        |    regexp_replace(t1, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS t2
        |  FROM c),
        |e AS (
        |  SELECT doc_id, n_emails, n_ips,
        |    len(regexp_extract_all(t2, '\+?\d[\d\s().-]{7,}\d'))::BIGINT AS n_phones
        |  FROM d)
        |SELECT doc_id AS id, n_emails, n_ips, n_phones,
        |       (n_emails + n_ips + n_phones)::BIGINT AS n_pii
        |FROM e ORDER BY id""".stripMargin,

    "t_zipf" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS word
        |  FROM documents),
        |c AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY 1),
        |t AS (SELECT sum(c)::BIGINT AS n_words, count(*)::BIGINT AS n_distinct FROM c),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, word ASC) AS rank FROM c),
        |k AS (SELECT
        |  coalesce(max(CASE WHEN rank = 1 THEN c END), 0)::BIGINT AS c1,
        |  coalesce(max(CASE WHEN rank = 10 THEN c END), 0)::BIGINT AS c10,
        |  coalesce(max(CASE WHEN rank = 100 THEN c END), 0)::BIGINT AS c100
        |  FROM r WHERE rank <= 100)
        |SELECT n_words, n_distinct, c1, c10, c100,
        |  CASE WHEN c10 > 0 THEN CAST((c1 * 1000000) // c10 AS BIGINT) ELSE 0 END AS r1_10_ppm,
        |  CASE WHEN c100 > 0 THEN CAST((c10 * 1000000) // c100 AS BIGINT) ELSE 0 END AS r10_100_ppm
        |FROM t, k""".stripMargin,

    "p_padding_waste" ->
      """WITH f AS (
        |  SELECT len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS t
        |  FROM documents),
        |b AS (
        |  SELECT t, (CASE WHEN t <= 64 THEN 64 WHEN t <= 128 THEN 128
        |                  WHEN t <= 256 THEN 256 ELSE 512 END)::BIGINT AS bucket
        |  FROM f WHERE t > 0)
        |SELECT bucket, count(*)::BIGINT AS n_docs,
        |  sum(least(t, bucket))::BIGINT AS sum_tokens,
        |  sum(greatest(bucket - t, 0))::BIGINT AS padding,
        |  sum(greatest(t - bucket, 0))::BIGINT AS trunc_tokens,
        |  CAST((sum(greatest(bucket - t, 0)) * 1000000) // (count(*) * bucket) AS BIGINT) AS waste_ppm
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    // full register replay: md5-derived 60-bit hash, top-8-bit index,
    // rank via minimal-width bin() length (identical on both engines),
    // exact integer harmonic sum; the linear-counting branch reads the
    // SAME StrictMath-generated integer table as the Spark side
    // (SketchOps.linearCountMilli) so no engine ever takes a float ln
    // full register replay BOTH ways: per-shard max then cross-shard
    // max (merged) vs one global max (direct); max associativity makes
    // them equal registers, and the oracle proves it by computing both
    "p_hll_shard_merge" ->
      s"""WITH h AS (
        |  SELECT event_id % 8 AS shard,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (
        |  SELECT shard,
        |         h // (1::BIGINT << 52) AS idx,
        |         h % (1::BIGINT << 52) AS tail
        |  FROM h),
        |srk AS (
        |  SELECT shard, idx,
        |         max(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(bin(tail)) END) AS r
        |  FROM r GROUP BY 1, 2),
        |mrk AS (SELECT idx, max(r) AS r FROM srk GROUP BY 1),
        |drk AS (
        |  SELECT idx,
        |         max(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(bin(tail)) END) AS r
        |  FROM r GROUP BY 1),
        |gm AS (SELECT count(*)::BIGINT AS present, sum(1::BIGINT << (53 - r))::BIGINT AS sp FROM mrk),
        |gd AS (SELECT count(*)::BIGINT AS present, sum(1::BIGINT << (53 - r))::BIGINT AS sp FROM drk),
        |em AS (
        |  SELECT (256 - present)::BIGINT AS v_empty,
        |         CAST(floor((0.7213 / (1 + 1.079 / 256.0)) * 256 * 256 * ((1::BIGINT << 53)::DOUBLE) * 1000.0
        |                    / (sp + (256 - present) * (1::BIGINT << 53))::DOUBLE + 0.5) AS BIGINT) AS raw_milli
        |  FROM gm),
        |ed AS (
        |  SELECT (256 - present)::BIGINT AS v_empty,
        |         CAST(floor((0.7213 / (1 + 1.079 / 256.0)) * 256 * 256 * ((1::BIGINT << 53)::DOUBLE) * 1000.0
        |                    / (sp + (256 - present) * (1::BIGINT << 53))::DOUBLE + 0.5) AS BIGINT) AS raw_milli
        |  FROM gd),
        |fm AS (
        |  SELECT CASE WHEN v_empty > 0 AND raw_milli <= 2500 * 256
        |              THEN list_extract(${operators.SketchOps.linearCountMilli(8).mkString("[", ",", "]")}, v_empty)
        |              ELSE raw_milli END AS merged_est_milli
        |  FROM em),
        |fd AS (
        |  SELECT CASE WHEN v_empty > 0 AND raw_milli <= 2500 * 256
        |              THEN list_extract(${operators.SketchOps.linearCountMilli(8).mkString("[", ",", "]")}, v_empty)
        |              ELSE raw_milli END AS direct_est_milli
        |  FROM ed)
        |SELECT merged_est_milli, direct_est_milli,
        |       (merged_est_milli = direct_est_milli) AS merge_exact,
        |       (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS exact_distinct
        |FROM fm, fd""".stripMargin,

    "p_distinct_hll" ->
      s"""WITH h AS (
        |  SELECT event_type,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type,
        |         h // (1::BIGINT << 52) AS idx,
        |         h % (1::BIGINT << 52) AS tail
        |  FROM h),
        |rk AS (
        |  SELECT event_type, idx,
        |         max(CASE WHEN tail = 0 THEN 53 ELSE 53 - length(bin(tail)) END) AS r
        |  FROM r GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, count(*)::BIGINT AS present,
        |         sum(1::BIGINT << (53 - r))::BIGINT AS sp
        |  FROM rk GROUP BY 1),
        |e AS (
        |  SELECT event_type, 256::BIGINT AS m,
        |         (256 - present)::BIGINT AS v_empty,
        |         (sp + (256 - present) * (1::BIGINT << 53))::BIGINT AS s_inv
        |  FROM g),
        |est AS (
        |  SELECT event_type, m, v_empty, s_inv,
        |         CAST(floor((0.7213 / (1 + 1.079 / 256.0)) * 256 * 256 * ((1::BIGINT << 53)::DOUBLE) * 1000.0
        |                    / s_inv::DOUBLE + 0.5) AS BIGINT) AS raw_milli
        |  FROM e)
        |SELECT est.event_type, m, v_empty, s_inv,
        |       CASE WHEN v_empty > 0 AND raw_milli <= 2500 * 256
        |            THEN list_extract(${operators.SketchOps.linearCountMilli(8).mkString("[", ",", "]")}, v_empty)
        |            ELSE raw_milli END AS est_milli,
        |       x.n_exact
        |FROM est JOIN (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
        |               FROM events GROUP BY 1) x USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // script classes identical to TextOps.ScriptClasses (RE2 \x{} vs
    // Java \u escapes, same BMP ranges); counts are codepoint-exact on
    // both engines, dominance CASE chain mirrors the foldRight order
    "t_scripts" ->
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 5 = 1 THEN ' Привет мир' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 2 THEN ' λόγος 你好 こんにちは' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 3 THEN ' مرحبا שלום' ELSE '' END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    (length(text) - length(regexp_replace(text, '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')))::BIGINT AS latin,
        |    (length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')))::BIGINT AS cyrillic,
        |    (length(text) - length(regexp_replace(text, '[\x{0370}-\x{03FF}]', '', 'g')))::BIGINT AS greek,
        |    (length(text) - length(regexp_replace(text, '[\x{0600}-\x{06FF}]', '', 'g')))::BIGINT AS arabic,
        |    (length(text) - length(regexp_replace(text, '[\x{0590}-\x{05FF}]', '', 'g')))::BIGINT AS hebrew,
        |    (length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]', '', 'g')))::BIGINT AS cjk,
        |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS digit
        |  FROM planted)
        |SELECT doc_id, latin, cyrillic, greek, arabic, hebrew, cjk, digit,
        |  CASE WHEN latin > 0 AND latin = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'latin'
        |       WHEN cyrillic > 0 AND cyrillic = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'cyrillic'
        |       WHEN greek > 0 AND greek = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'greek'
        |       WHEN arabic > 0 AND arabic = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'arabic'
        |       WHEN hebrew > 0 AND hebrew = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'hebrew'
        |       WHEN cjk > 0 AND cjk = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'cjk'
        |       WHEN digit > 0 AND digit = greatest(latin, cyrillic, greek, arabic, hebrew, cjk, digit) THEN 'digit'
        |       ELSE 'none' END AS dominant
        |FROM c ORDER BY doc_id""".stripMargin,

    // the Spark side groups by the fused kernel's XXH64 gram hash; the
    // oracle groups by the gram STRINGS — identical while collision-
    // free (guaranteed at this scale; priced in the operator scaladoc)
    "t_distinct_n" ->
      """WITH a AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT t.n, array_to_string(a.ws[r.i : r.i + t.n - 1], ' ') AS gram
        |  FROM a, (VALUES (1),(2),(3)) t(n), UNNEST(range(1, greatest(len(a.ws) - t.n + 2, 1))) AS r(i)),
        |c AS (SELECT n, gram, count(*) AS f FROM g GROUP BY 1, 2)
        |SELECT n::BIGINT AS n, sum(f)::BIGINT AS total_grams, count(*)::BIGINT AS distinct_grams,
        |       CAST(count(*) * 1000000 // sum(f) AS BIGINT) AS distinct_ppm
        |FROM c GROUP BY 1 ORDER BY n""".stripMargin,

    // same gram construction as t_distinct_n; min-set/estimate replay
    // the p_distinct_kmv formulation per gram order n
    "t_distinct_n_kmv" ->
      """WITH a AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT t.n, array_to_string(a.ws[r.i : r.i + t.n - 1], ' ') AS gram
        |  FROM a, (VALUES (1),(2),(3)) t(n), UNNEST(range(1, greatest(len(a.ws) - t.n + 2, 1))) AS r(i)),
        |tot AS (SELECT n, count(*) AS total_grams FROM g GROUP BY 1),
        |dh AS (SELECT DISTINCT n, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h FROM g),
        |r AS (SELECT n, h, row_number() OVER (PARTITION BY n ORDER BY h) AS rn FROM dh),
        |s AS (
        |  SELECT n, count(*) AS n_seen, max(h) AS kth_hash,
        |         round(CASE WHEN count(*) < 128 THEN count(*)::DOUBLE
        |                    ELSE 127.0 / (max(h) / 1152921504606846976.0) END,
        |               4) AS est_distinct
        |  FROM r WHERE rn <= 128 GROUP BY n)
        |SELECT s.n::BIGINT AS n, tot.total_grams::BIGINT AS total_grams,
        |       s.n_seen::BIGINT AS n_seen, s.kth_hash, s.est_distinct
        |FROM s JOIN tot USING (n) ORDER BY n""".stripMargin,

    // integer counts from single regexp passes; the Flesch double
    // chain runs on those integers in the same operation order, then
    // quantizes to millis — the grade CASE compares the milli INTEGER
    "t_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sentences,
        |    len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_words,
        |    greatest(len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT,
        |             len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT) AS n_syllables
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_sentences, n_words, n_syllables,
        |    CASE WHEN n_words > 0 THEN
        |      CAST(floor((206.835
        |        - 1.015 * (n_words::DOUBLE / greatest(n_sentences, 1)::DOUBLE)
        |        - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE)) * 1000.0 + 0.5) AS BIGINT)
        |    END AS flesch_milli
        |  FROM c)
        |SELECT doc_id, n_sentences, n_words, n_syllables, flesch_milli,
        |  CASE WHEN flesch_milli IS NULL THEN 'empty'
        |       WHEN flesch_milli >= 90000 THEN 'very_easy'
        |       WHEN flesch_milli >= 70000 THEN 'easy'
        |       WHEN flesch_milli >= 50000 THEN 'medium'
        |       WHEN flesch_milli >= 30000 THEN 'hard'
        |       ELSE 'very_hard' END AS grade
        |FROM f ORDER BY doc_id""".stripMargin,

    // same planted code block (chr(10) = the Scala "\n"); every count
    // is a single RE2/JVM-identical regexp pass over ASCII
    "t_code_detect" ->
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 2 THEN
        |      chr(10) || 'def check(x):' ||
        |      chr(10) || '    if x == 2 && x != 0:' ||
        |      chr(10) || '        return x + 1' ||
        |      chr(10) || 'class Foo {' ||
        |      chr(10) || '    int y = 0;' ||
        |      chr(10) || '}' || chr(10)
        |    ELSE '' END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[{}\[\]();]'))::BIGINT AS n_braces,
        |    len(regexp_extract_all(text, '(==|!=|->|=>|&&|\|\||\+=|::)'))::BIGINT AS n_operators,
        |    len(regexp_extract_all(text, '\b(def|class|return|import|function|const|var|void|if|else|for|while|lambda|public|static)\b'))::BIGINT AS n_keywords,
        |    len(regexp_extract_all(text, '(?m)^(    |\t)'))::BIGINT AS n_indent_lines,
        |    CASE WHEN length(text) > 0
        |         THEN (length(text) - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))) * 1000000 // length(text)
        |         ELSE 0 END::BIGINT AS symbol_ppm
        |  FROM planted)
        |SELECT doc_id, n_braces, n_operators, n_keywords, n_indent_lines, symbol_ppm,
        |  (CASE WHEN (n_braces + n_operators >= 5 AND n_keywords >= 2)
        |             OR n_indent_lines >= 3 THEN 1 ELSE 0 END)::BIGINT AS is_code
        |FROM c ORDER BY doc_id""".stripMargin,

    // same planted URLs; URL chars measured by the strip-delta, hosts
    // by a per-match extract — list ops over the same RE2 matches
    "t_urls" ->
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 1 THEN ' see https://example.com/a/b and http://docs.example.org/x?q=1 plus https://example.com/c' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 2 THEN ' asset at https://cdn' || (doc_id % 3) || '.example-media.net/img.png' ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, text,
        |         list_distinct(list_transform(regexp_extract_all(text, 'https?://[^\s]+'),
        |                                      x -> regexp_extract(x, '^https?://([^/\s:?#]+)', 1))) AS hosts,
        |         len(regexp_extract_all(text, 'https?://[^\s]+'))::BIGINT AS n_urls
        |  FROM planted)
        |SELECT doc_id, n_urls,
        |       len(hosts)::BIGINT AS n_hosts,
        |       list_sort(hosts)[1] AS first_host,
        |       CASE WHEN length(text) > 0
        |            THEN (length(text) - length(regexp_replace(text, 'https?://[^\s]+', '', 'g'))) * 1000000 // length(text)
        |            ELSE 0 END::BIGINT AS url_ppm
        |FROM u ORDER BY doc_id""".stripMargin,

    // unordered pairs within a 3-word span; the lateral index unnests
    // mirror the Spark transform(sequence) nesting exactly
    "t_skipgram" ->
      """WITH a AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT least(a.ws[i.i], a.ws[j.j]) AS w1,
        |         greatest(a.ws[i.i], a.ws[j.j]) AS w2
        |  FROM a,
        |       UNNEST(range(1, len(a.ws))) AS i(i),
        |       UNNEST(range(i.i + 1, least(i.i + 3, len(a.ws)) + 1)) AS j(j)),
        |c AS (SELECT w1, w2, count(*)::BIGINT AS n FROM g GROUP BY 1, 2)
        |SELECT w1, w2, n FROM c ORDER BY n DESC, w1, w2 LIMIT 30""".stripMargin,

    "t_ttr" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |tc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        |  FROM tc GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |       (n_types * 1000000 // n_tokens)::BIGINT AS ttr_ppm,
        |       (n_hapax * 1000000 // n_tokens)::BIGINT AS hapax_ppm
        |FROM d ORDER BY doc_id""".stripMargin,

    // gaps-and-islands phrase split at the stopword list; word scores
    // are deg*1000 // freq milli LONGs, phrase scores LONG sums
    "t_rake" ->
      """WITH ts AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, ts[i.i] AS w, i.i AS pos
        |  FROM ts, UNNEST(range(1, len(ts) + 1)) AS i(i)),
        |ns AS (
        |  SELECT doc_id, pos, w,
        |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM tok
        |  WHERE w NOT IN ('the','a','an','of','to','and','in','is','on','for')),
        |ph AS (
        |  SELECT doc_id, isl, string_agg(w, ' ' ORDER BY pos) AS phrase,
        |         count(*)::BIGINT AS plen
        |  FROM ns GROUP BY 1, 2),
        |wl AS (
        |  SELECT ns.doc_id, ns.isl, ns.w, ph.phrase, ph.plen
        |  FROM ns JOIN ph USING (doc_id, isl)),
        |ws AS (
        |  SELECT w, (sum(plen)::BIGINT * 1000 // count(*)::BIGINT)::BIGINT AS score_milli
        |  FROM wl GROUP BY 1),
        |psc AS (
        |  SELECT wl.doc_id, wl.isl, wl.phrase, wl.plen,
        |         sum(ws.score_milli)::BIGINT AS score_milli
        |  FROM wl JOIN ws USING (w) GROUP BY 1, 2, 3, 4),
        |agg AS (
        |  SELECT phrase, max(plen)::BIGINT AS n_words,
        |         count(*)::BIGINT AS n_occurrences,
        |         max(score_milli)::BIGINT AS score_milli
        |  FROM psc GROUP BY 1)
        |SELECT phrase, n_words, n_occurrences, score_milli
        |FROM agg ORDER BY score_milli DESC, phrase LIMIT 20""".stripMargin,

    "t_kn_continuation" ->
      """WITH ts AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |bg AS (
        |  SELECT DISTINCT ts[i.i] AS w1, ts[i.i + 1] AS w2
        |  FROM ts, UNNEST(range(1, len(ts))) AS i(i)),
        |n AS (SELECT count(*)::BIGINT AS n_bi_distinct FROM bg),
        |c AS (SELECT w2 AS token, count(*)::BIGINT AS cont_count FROM bg GROUP BY 1)
        |SELECT token, cont_count, n_bi_distinct,
        |       (cont_count * 1000000 // n_bi_distinct)::BIGINT AS cont_ppm
        |FROM c, n ORDER BY cont_count DESC, token LIMIT 50""".stripMargin,

    // micro-log weights from ln of exact integer counts only (the
    // t_pmi precedent); OOV tokens take the lang's add-one floor;
    // argmax by (score, lang)
    "t_nb_langid" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |traintok AS (
        |  SELECT lang, unnest(ts) AS w FROM base WHERE doc_id % 5 <> 0),
        |counts AS (SELECT lang, w, count(*)::BIGINT AS c FROM traintok GROUP BY 1, 2),
        |langtot AS (SELECT lang, count(*)::BIGINT AS n_tok FROM traintok GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w)::BIGINT AS v FROM traintok),
        |priors AS (
        |  SELECT lang,
        |         CAST(floor(ln(count(*)::DOUBLE) * 1000000.0) AS BIGINT)
        |         - CAST(floor(ln((SELECT count(*) FROM base WHERE doc_id % 5 <> 0)::DOUBLE) * 1000000.0) AS BIGINT) AS prior_micro
        |  FROM base WHERE doc_id % 5 <> 0 GROUP BY 1),
        |langden AS (
        |  SELECT lang,
        |         CAST(floor(ln((n_tok + (SELECT v FROM vocab))::DOUBLE) * 1000000.0) AS BIGINT) AS den_micro
        |  FROM langtot),
        |weights AS (
        |  SELECT counts.lang, counts.w,
        |         CAST(floor(ln((c + 1)::DOUBLE) * 1000000.0) AS BIGINT) - den_micro AS w_micro
        |  FROM counts JOIN langden USING (lang)),
        |testtok AS (
        |  SELECT doc_id, lang AS true_lang, unnest(ts) AS w
        |  FROM base WHERE doc_id % 5 = 0),
        |cand AS (
        |  SELECT t.doc_id, t.true_lang, d.lang AS cand_lang,
        |         coalesce(wt.w_micro, -d.den_micro) AS tok_micro
        |  FROM testtok t
        |  CROSS JOIN langden d
        |  LEFT JOIN weights wt ON wt.lang = d.lang AND wt.w = t.w),
        |scored AS (
        |  SELECT doc_id, true_lang, cand_lang,
        |         sum(tok_micro)::BIGINT + max(p.prior_micro)::BIGINT AS score_micro
        |  FROM cand JOIN priors p ON p.lang = cand.cand_lang
        |  GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT doc_id, true_lang, cand_lang AS pred_lang, score_micro,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score_micro DESC, cand_lang ASC) AS rn
        |  FROM scored)
        |SELECT doc_id, true_lang, pred_lang, score_micro,
        |       CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END::BIGINT AS correct
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // same planted fragment; the strip is the standard <[^>]+> pass on
    // both engines, the boilerplate flag an (?i) RE2/JVM-identical scan
    "t_html_strip" ->
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 6 = 3 THEN ' <html><body><nav>menu</nav><p class="x">hello</p><footer>(c) 2024</footer></body></html>' ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '<[^>]+>'))::BIGINT AS n_tags,
        |  length(regexp_replace(text, '<[^>]+>', '', 'g'))::BIGINT AS stripped_chars,
        |  (CASE WHEN length(text) > 0
        |        THEN (length(text) - length(regexp_replace(text, '<[^>]+>', '', 'g'))) * 1000000 // length(text)
        |        ELSE 0 END)::BIGINT AS markup_ppm,
        |  (len(regexp_extract_all(text, '(?i)<(nav|footer|aside)\b')) > 0)::BIGINT AS has_boilerplate
        |FROM planted ORDER BY doc_id""".stripMargin,

    // the d_dedup_clusters candidate/intersection replays + per-pair
    // signature agreement over the same (doc, seed) minhash matrix
    "d_minhash_estimate" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT id_a, id_b, count(*) AS inter
        |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2),
        |agree AS (
        |  SELECT c.id_a, c.id_b,
        |         sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)::BIGINT AS agree
        |  FROM cand c JOIN mh ma ON ma.doc_id = c.id_a
        |              JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
        |  GROUP BY 1, 2)
        |SELECT c.id_a, c.id_b, g.agree,
        |       g.agree * 1000000 // 16 AS est_ppm,
        |       coalesce(i.inter, 0) * 1000000 // (x.n + y.n - coalesce(i.inter, 0)) AS jacc_ppm,
        |       g.agree * 1000000 // 16
        |         - coalesce(i.inter, 0) * 1000000 // (x.n + y.n - coalesce(i.inter, 0)) AS err_ppm
        |FROM cand c
        |JOIN agree g ON c.id_a = g.id_a AND c.id_b = g.id_b
        |LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
        |JOIN n x ON c.id_a = x.doc_id
        |JOIN n y ON c.id_b = y.doc_id
        |ORDER BY c.id_a, c.id_b""".stripMargin,

    // the s_centroids exact-quantized means on both snapshots,
    // assembled pos-ordered; cosine over the same 64-term chain
    "s_centroid_drift" ->
      """WITH ca AS (
        |  SELECT label, i - 1 AS pos,
        |         sum(floor(embedding[i]::DOUBLE * 10000000.0 + 0.5))::BIGINT::DOUBLE
        |           / (count(*)::DOUBLE * 10000000.0) AS mean,
        |         count(*) AS n
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY 1, 2),
        |cb AS (
        |  SELECT label, i - 1 AS pos,
        |         sum(floor(embedding[i]::DOUBLE * 10000000.0 + 0.5))::BIGINT::DOUBLE
        |           / (count(*)::DOUBLE * 10000000.0) AS mean,
        |         count(*) AS n
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  WHERE vec_id % 5 <> 0
        |  GROUP BY 1, 2),
        |la AS (SELECT label, min(n)::BIGINT AS n_a, list(mean ORDER BY pos) AS va FROM ca GROUP BY 1),
        |lb AS (SELECT label, min(n)::BIGINT AS n_b, list(mean ORDER BY pos) AS vb FROM cb GROUP BY 1)
        |SELECT coalesce(la.label, lb.label) AS label, n_a, n_b,
        |       round(list_sum(list_transform(range(1, 65), i -> va[i] * vb[i])) /
        |             (sqrt(list_sum(list_transform(range(1, 65), i -> va[i] * va[i]))) *
        |              sqrt(list_sum(list_transform(range(1, 65), i -> vb[i] * vb[i])))), 6) AS drift_cos
        |FROM la FULL OUTER JOIN lb ON la.label = lb.label
        |ORDER BY label""".stripMargin,

    // the p_stats quality replay feeds ordinal ranks (id tie-break);
    // Σd² is exact, the ρ double chain runs on exact integers
    "p_signal_corr" ->
      """WITH qw AS (
        |  SELECT doc_id, n_chars, length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_chars,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN len(lw) = 0 THEN 0
        |            ELSE (300 * least(len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for'))) * 5, len(lw))) // len(lw) END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM qw),
        |rk AS (
        |  SELECT row_number() OVER (ORDER BY quality ASC, doc_id ASC) AS r1,
        |         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS r2
        |  FROM q)
        |SELECT count(*)::BIGINT AS n,
        |       sum((r1 - r2) * (r1 - r2))::BIGINT AS sum_d2,
        |       round(CASE WHEN count(*) >= 2 THEN
        |         1.0 - 6.0 * sum((r1 - r2) * (r1 - r2))::DOUBLE
        |           / (count(*)::DOUBLE * (count(*)::DOUBLE * count(*)::DOUBLE - 1.0)) END, 6) AS spearman
        |FROM rk""".stripMargin,

    // the p_signal_corr pipeline behind the deterministic md5
    // Bernoulli gate — the sampled audit frame
    "p_signal_corr_sampled" ->
      """WITH qw AS (
        |  SELECT doc_id, n_chars, length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents
        |  WHERE ('0x' || substr(md5('corr:' || doc_id), 1, 15))::BIGINT
        |        / 1152921504606846976.0 < 0.25),
        |q AS (
        |  SELECT doc_id, n_chars,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN len(lw) = 0 THEN 0
        |            ELSE (300 * least(len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for'))) * 5, len(lw))) // len(lw) END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM qw),
        |rk AS (
        |  SELECT row_number() OVER (ORDER BY quality ASC, doc_id ASC) AS r1,
        |         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS r2
        |  FROM q)
        |SELECT count(*)::BIGINT AS n,
        |       sum((r1 - r2) * (r1 - r2))::BIGINT AS sum_d2,
        |       round(CASE WHEN count(*) >= 2 THEN
        |         1.0 - 6.0 * sum((r1 - r2) * (r1 - r2))::DOUBLE
        |           / (count(*)::DOUBLE * (count(*)::DOUBLE * count(*)::DOUBLE - 1.0)) END, 6) AS spearman
        |FROM rk""".stripMargin,

    // skyline dominance via the two running-max windows over the
    // n_chars order — strictly-cheaper max >= mine OR tied-cost max >
    // mine means dominated
    "p_quality_frontier" ->
      """WITH qw AS (
        |  SELECT doc_id, n_chars, length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_chars,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN len(lw) = 0 THEN 0
        |            ELSE (300 * least(len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for'))) * 5, len(lw))) // len(lw) END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM qw),
        |f AS (
        |  SELECT doc_id, quality, n_chars,
        |         max(quality) OVER (ORDER BY n_chars RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_lt,
        |         max(quality) OVER (ORDER BY n_chars RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_le
        |  FROM q)
        |SELECT doc_id, quality, n_chars FROM f
        |WHERE (max_lt IS NULL OR max_lt < quality) AND max_le <= quality
        |ORDER BY n_chars, doc_id""".stripMargin,

    // md5 fold assignment replayed byte-identically; shares are exact
    // integer ppm of fold totals
    "p_kfold" ->
      """WITH a AS (
        |  SELECT ('0x' || substr(md5('fold:' || doc_id), 1, 15))::BIGINT % 5 AS fold,
        |         lang AS stratum
        |  FROM documents),
        |cell AS (SELECT fold, stratum, count(*)::BIGINT AS n_docs FROM a GROUP BY 1, 2),
        |ft AS (SELECT fold, sum(n_docs)::BIGINT AS fold_total FROM cell GROUP BY 1)
        |SELECT fold, stratum, n_docs, fold_total,
        |       (n_docs * 1000000 // fold_total)::BIGINT AS share_ppm
        |FROM cell JOIN ft USING (fold)
        |ORDER BY fold, stratum""".stripMargin,

    // all-integer rebalancing weights; sqrt is IEEE-exact on the
    // integer-division input so the milli floor cannot straddle
    "p_class_weights" ->
      """WITH c AS (SELECT label, count(*)::BIGINT AS cnt FROM embeddings GROUP BY 1),
        |t AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS k FROM c)
        |SELECT label, cnt, total, k,
        |       (total * 1000000 // (cnt * k))::BIGINT AS inv_weight_ppm,
        |       CAST(floor(sqrt((total * 1000000 // cnt)::DOUBLE)) AS BIGINT) AS sqrt_weight_milli
        |FROM c, t ORDER BY label""".stripMargin,

    // ppm-quantized CDFs BEFORE the difference (bounded longs at any
    // corpus size — no na*nb cross product), mirroring SampleOps.ksDrift
    "p_ks_drift" ->
      """WITH a AS (SELECT n_chars AS v, count(*) AS ca FROM documents GROUP BY 1),
        |b AS (SELECT n_chars AS v, count(*) AS cb FROM documents
        |      WHERE NOT (lang = 'en' AND doc_id % 3 = 0) GROUP BY 1),
        |u AS (SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |      FROM a FULL OUTER JOIN b ON a.v = b.v),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM u),
        |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma, sum(cb) OVER (ORDER BY v) AS cumb FROM u),
        |d AS (SELECT v, abs(CAST(cuma * 1000000 // na AS BIGINT) - CAST(cumb * 1000000 // nb AS BIGINT)) AS dppm FROM c, t)
        |SELECT (SELECT na FROM t)::BIGINT AS n_a, (SELECT nb FROM t)::BIGINT AS n_b,
        |       max(dppm)::BIGINT AS ks_ppm,
        |       min(v) FILTER (WHERE dppm = (SELECT max(dppm) FROM d))::BIGINT AS at_value
        |FROM d""".stripMargin,

    "p_mixture_drift" ->
      """WITH a AS (SELECT lang, count(*)::BIGINT AS n_a FROM documents GROUP BY 1),
        |at AS (SELECT sum(n_a)::BIGINT AS ta FROM a),
        |b AS (SELECT lang, count(*)::BIGINT AS n_b FROM documents
        |      WHERE NOT (lang = 'en' AND doc_id % 3 = 0) GROUP BY 1),
        |bt AS (SELECT sum(n_b)::BIGINT AS tb FROM b),
        |sa AS (SELECT lang, n_a, CAST((n_a * 1000000) // ta AS BIGINT) AS share_a_ppm FROM a, at),
        |sb AS (SELECT lang, n_b, CAST((n_b * 1000000) // tb AS BIGINT) AS share_b_ppm FROM b, bt)
        |SELECT coalesce(sa.lang, sb.lang) AS domain,
        |  coalesce(n_a, 0)::BIGINT AS n_a, coalesce(n_b, 0)::BIGINT AS n_b,
        |  coalesce(share_a_ppm, 0)::BIGINT AS share_a_ppm,
        |  coalesce(share_b_ppm, 0)::BIGINT AS share_b_ppm,
        |  (coalesce(share_b_ppm, 0) - coalesce(share_a_ppm, 0))::BIGINT AS delta_ppm
        |FROM sa FULL OUTER JOIN sb ON sa.lang = sb.lang
        |ORDER BY domain""".stripMargin,

    // the UniMax waterfill recurrence as a recursive CTE over the
    // capacity-ascending language list: state r after language i,
    // alloc_i = least(cap_i, r_{i-1} // (L - (i-1))) — k=1 at the
    // last language absorbs every division remainder
    "p_unimax" ->
      """WITH RECURSIVE counts AS (
        |  SELECT lang, sum(length(text))::BIGINT AS n,
        |         (SELECT count(DISTINCT lang) FROM documents)::BIGINT AS cnt,
        |         (SELECT 3 * sum(length(text)) FROM documents)::BIGINT AS budget
        |  FROM documents GROUP BY 1),
        |ord AS (SELECT lang, n, n * 4 AS cap, cnt, budget,
        |               row_number() OVER (ORDER BY n * 4 ASC, lang ASC) AS i
        |        FROM counts),
        |rec AS (
        |  SELECT 0::BIGINT AS i, (SELECT budget FROM ord LIMIT 1)::BIGINT AS r
        |  UNION ALL
        |  SELECT o.i::BIGINT, rec.r - least(o.cap, rec.r // (o.cnt - rec.i))
        |  FROM rec JOIN ord o ON o.i = rec.i + 1),
        |alloc AS (
        |  SELECT o.lang, o.n, o.cap,
        |         least(o.cap, rec.r // (o.cnt - rec.i)) AS alloc
        |  FROM ord o JOIN rec ON rec.i = o.i - 1)
        |SELECT lang, n AS n_chars, cap::BIGINT AS capacity, alloc::BIGINT AS alloc,
        |       (CASE WHEN n = 0 THEN 0 ELSE (alloc * 1000) // n END)::BIGINT AS epochs_milli
        |FROM alloc ORDER BY lang""".stripMargin,

    // floor(sqrt(n)) is IEEE-exact on both engines (sqrt correctly
    // rounded, n < 2^53); everything downstream is integral division
    "p_temperature" ->
      """WITH c AS (
        |  SELECT lang AS domain, count(*)::BIGINT AS n_docs,
        |         floor(sqrt(count(*)::DOUBLE))::BIGINT AS isq
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs)::BIGINT AS total, sum(isq)::BIGINT AS isq_total FROM c)
        |SELECT domain, n_docs,
        |       CAST((n_docs * 1000000) // total AS BIGINT) AS share_ppm,
        |       CAST((isq * 1000000) // isq_total AS BIGINT) AS temp_ppm,
        |       CASE WHEN (n_docs * 1000000) // total = 0 THEN 0
        |            ELSE (((isq * 1000000) // isq_total) * 1000)
        |                   // ((n_docs * 1000000) // total) END::BIGINT AS boost_milli
        |FROM c, t ORDER BY domain""".stripMargin,

    "d_decontaminate_substr" ->
      """WITH ref AS (
        |  SELECT doc_id AS ref_id, substr(text, 20, 60) AS rt
        |  FROM documents WHERE doc_id < 50),
        |r2 AS (SELECT ref_id, rt FROM ref WHERE length(rt) >= 20)
        |SELECT c.doc_id AS corpus_id, ref_id
        |FROM documents c, r2
        |WHERE position(rt IN c.text) > 0
        |ORDER BY 1, 2""".stripMargin,

    "d_dedup_clusters" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT id_a, id_b, count(*) AS inter
        |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |  WHERE round(inter::DOUBLE / (x.n + y.n - inter), 4) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT rr.id, e.b FROM reach rr JOIN edges e ON e.a = rr.r)
        |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin,

    // the clusters replay + the quality replay + per-cluster argmax
    // (quality DESC, id ASC) — one row per cluster, singletons included
    "d_canonical" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT id_a, id_b, count(*) AS inter
        |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |  WHERE round(inter::DOUBLE / (x.n + y.n - inter), 4) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT rr.id, e.b FROM reach rr JOIN edges e ON e.a = rr.r),
        |clusters AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |qw AS (
        |  SELECT doc_id, length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN len(lw) = 0 THEN 0
        |            ELSE (300 * least(len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for'))) * 5, len(lw))) // len(lw) END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM qw),
        |ranked AS (
        |  SELECT c.cluster_id, c.id, q.quality,
        |         row_number() OVER (PARTITION BY c.cluster_id
        |                            ORDER BY q.quality DESC, c.id ASC) AS rn,
        |         count(*) OVER (PARTITION BY c.cluster_id) AS n_members
        |  FROM clusters c JOIN q ON c.id = q.doc_id)
        |SELECT cluster_id, id AS canonical_id, quality, n_members
        |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // the clusters + quality replays of d_canonical, with the source
    // TIER (src suffix % 3) leading the survivor sort and n_tiers
    // marking the clusters where the priority rule could bind
    "d_dedup_priority" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        |  FROM sh, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, seed // 4 AS band,
        |         string_agg(seed || '~' || mh, '|' ORDER BY seed || '~' || mh) AS bandval
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b ON a.band = b.band AND a.bandval = b.bandval
        |                          AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT id_a, id_b, count(*) AS inter
        |  FROM cand JOIN sh a ON id_a = a.doc_id JOIN sh b ON id_b = b.doc_id AND a.sh = b.sh
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN n x ON id_a = x.doc_id JOIN n y ON id_b = y.doc_id
        |  WHERE round(inter::DOUBLE / (x.n + y.n - inter), 4) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT rr.id, e.b FROM reach rr JOIN edges e ON e.a = rr.r),
        |clusters AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |qw AS (
        |  SELECT doc_id, length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN len(lw) = 0 THEN 0
        |            ELSE (300 * least(len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for'))) * 5, len(lw))) // len(lw) END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM qw),
        |tiers AS (
        |  SELECT doc_id, CAST(substr(source, 4) AS BIGINT) % 3 AS tier
        |  FROM documents),
        |ranked AS (
        |  SELECT c.cluster_id, c.id, t.tier,
        |         row_number() OVER (PARTITION BY c.cluster_id
        |                            ORDER BY t.tier ASC, q.quality DESC, c.id ASC) AS rn,
        |         count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
        |         count(DISTINCT t.tier) OVER (PARTITION BY c.cluster_id) AS n_tiers
        |  FROM clusters c JOIN q ON c.id = q.doc_id JOIN tiers t ON c.id = t.doc_id)
        |SELECT cluster_id, id AS canonical_id, tier,
        |       n_members, n_tiers::BIGINT AS n_tiers
        |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // winnow replay: same normalization, same 15-hex-char md5 gram
    // hashes, list-aggregate window minima, distinct, shared counts;
    // same df<=100 stop-fingerprint drop as the Spark plan (maxFpDf)
    "d_dedup_winnow" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(generate_series(1, length(t) - 12 + 1),
        |           i -> ('0x' || substr(md5(substr(t, i, 12)), 1, 15))::BIGINT) AS grams
        |  FROM n WHERE length(t) >= 12),
        |f AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |           generate_series(1, len(grams) - 8 + 1),
        |           j -> list_aggregate(grams[j:j+7], 'min')))) AS fp
        |  FROM g WHERE len(grams) >= 8),
        |keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) BETWEEN 2 AND 100)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS shared_fps
        |FROM f a JOIN keep k ON a.fp = k.fp JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY id_a, id_b""".stripMargin,

    // the same spoof planting, both fingerprints, TR39 fold via one
    // translate — groups with >= 2 raw variants are the spoof sets
    "d_dedup_homoglyph" ->
      """WITH spoof AS (
        |  SELECT doc_id + 1 AS doc_id,
        |         translate(text, 'aeopcyx', 'аеорсух') AS spoof
        |  FROM documents),
        |planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 3 AND s.spoof IS NOT NULL
        |              THEN s.spoof ELSE d.text END AS text
        |  FROM documents d LEFT JOIN spoof s USING (doc_id)),
        |f AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS raw_fp,
        |         md5(translate(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |             'аеорсухіѕјһԁԛԝον', 'aeopcyxisjhdqwov')) AS norm_fp
        |  FROM planted)
        |SELECT norm_fp, count(*)::BIGINT AS n_docs,
        |       count(DISTINCT raw_fp)::BIGINT AS n_raw_variants,
        |       min(doc_id) AS min_id
        |FROM f GROUP BY 1 HAVING count(DISTINCT raw_fp) >= 2
        |ORDER BY min_id""".stripMargin,

    "d_dedup_incremental" ->
      """WITH fp AS (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |known AS (SELECT DISTINCT fp FROM fp WHERE doc_id < 250),
        |newb AS (SELECT * FROM fp WHERE doc_id >= 250)
        |SELECT min(doc_id) AS id, fp FROM newb
        |WHERE fp NOT IN (SELECT fp FROM known)
        |GROUP BY fp ORDER BY id""".stripMargin,

    // the Bloom sketch only routes rows to/around the exact join — the
    // result is defined to be identical to the plain incremental dedup,
    // so the oracle IS the plain incremental oracle
    "d_dedup_incremental_bloom" ->
      """WITH fp AS (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |known AS (SELECT DISTINCT fp FROM fp WHERE doc_id < 250),
        |newb AS (SELECT * FROM fp WHERE doc_id >= 250)
        |SELECT min(doc_id) AS id, fp FROM newb
        |WHERE fp NOT IN (SELECT fp FROM known)
        |GROUP BY fp ORDER BY id""".stripMargin,

    // same md5("split:"||id) % 1000 bucketing: [0,900) train,
    // [900,950) val, [950,1000) test
    "p_split" ->
      """SELECT doc_id,
        |       CASE WHEN b < 900 THEN 'train'
        |            WHEN b < 950 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |             ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 1000 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "d_corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id AS id,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |v2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0),
        |n AS (
        |  SELECT doc_id AS id,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM v2)
        |SELECT coalesce(o.id, n.id) AS id,
        |       CASE WHEN o.fp IS NULL THEN 'added'
        |            WHEN n.fp IS NULL THEN 'removed'
        |            WHEN o.fp = n.fp THEN 'same'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.id = n.id
        |ORDER BY id""".stripMargin,

    // directed containment over shingle STRINGS (hash-as-equality for
    // Spark's xxhash64 groups); the digest construction replays the
    // query's synthetic quote-inclusion corpus
    "d_dedup_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT a.doc_id + 20000 AS doc_id, a.text || ' ' || b.text AS text
        |  FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
        |  WHERE a.doc_id % 50 = 0),
        |w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dirs AS (
        |  SELECT id_a AS src_id, id_b AS dst_id,
        |         round(inter::DOUBLE / x.n, 4) AS containment
        |  FROM inter JOIN n x ON id_a = x.doc_id
        |  UNION ALL
        |  SELECT id_b AS src_id, id_a AS dst_id,
        |         round(inter::DOUBLE / y.n, 4) AS containment
        |  FROM inter JOIN n y ON id_b = y.doc_id)
        |SELECT src_id, dst_id, containment FROM dirs
        |WHERE containment >= 0.9 ORDER BY src_id, dst_id""".stripMargin,

    // replays the span pipeline on gram STRINGS where Spark groups
    // xxhash64(gram) — hash-as-equality, the ShingleHashes stance;
    // the islands CTE is the same lag + running-sum merge
    "d_dedup_spans" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(wd[i:i+12], ' ') AS gram
        |  FROM w, unnest(generate_series(1, len(wd) - 12)) AS t(i)
        |  WHERE len(wd) >= 13),
        |df AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |d AS (SELECT doc_id, pos FROM g JOIN df USING (gram)),
        |isl AS (
        |  SELECT doc_id, pos,
        |         sum(CASE WHEN prev IS NULL OR pos - prev > 13 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM (SELECT doc_id, pos,
        |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM d))
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 13 AS span_end,
        |       count(*) AS n_grams
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    "d_decontaminate" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |c AS (SELECT * FROM sh WHERE doc_id >= 50),
        |r AS (SELECT * FROM sh WHERE doc_id < 50),
        |nc AS (SELECT doc_id, count(*) AS n FROM c GROUP BY 1),
        |nr AS (SELECT doc_id, count(*) AS n FROM r GROUP BY 1),
        |-- engine's maxShingleDf=10000 mirrored: shingles whose REF-side
        |-- document frequency exceeds the cap are excluded from the
        |-- intersection (sizes stay uncapped, matching contaminationPairs)
        |kept AS (SELECT sh FROM r GROUP BY sh HAVING count(*) <= 10000),
        |inter AS (
        |  SELECT c.doc_id AS cid, r.doc_id AS rid, count(*) AS inter
        |  FROM c JOIN r ON c.sh = r.sh JOIN kept k ON r.sh = k.sh
        |  GROUP BY 1, 2)
        |SELECT cid AS corpus_id, rid AS ref_id,
        |       round(inter::DOUBLE / (nc.n + nr.n - inter), 4) AS jaccard
        |FROM inter JOIN nc ON cid = nc.doc_id JOIN nr ON rid = nr.doc_id
        |WHERE round(inter::DOUBLE / (nc.n + nr.n - inter), 4) >= 0.5
        |ORDER BY 1, 2""".stripMargin,

    "d_decontaminate_ngram" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 13 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 12),
        |                             i -> array_to_string(wd[i:i+12], ' ')) END)) AS sh
        |  FROM w),
        |c AS (SELECT * FROM sh WHERE doc_id >= 50),
        |r AS (SELECT * FROM sh WHERE doc_id < 50),
        |-- engine's maxShingleDf=10000 mirrored (r is per-doc distinct,
        |-- so count(*) = distinct ref docs per shingle)
        |kept AS (SELECT sh FROM r GROUP BY sh HAVING count(*) <= 10000),
        |j AS (SELECT c.doc_id AS cid, c.sh, r.doc_id AS rid
        |      FROM c JOIN r ON c.sh = r.sh JOIN kept k ON c.sh = k.sh)
        |SELECT cid AS corpus_id, count(DISTINCT sh) AS n_grams,
        |       count(DISTINCT rid) AS n_refs
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "d_dedup_cosine" ->
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 6)) & 63 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) bb),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bandval = b.bandval
        |                              AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT id_a, id_b,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * ae.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> be.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings ae ON id_a = ae.vec_id
        |            JOIN embeddings be ON id_b = be.vec_id)
        |SELECT id_a, id_b, sim
        |FROM scored WHERE sim >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    // same replay, band width PICKED from the corpus count exactly like
    // SimilarityOps.autoBandBits: smallest bits in 6..14 with
    // n <= 128 * 2^bits; 4 bands of `bits` over a 4*bits-plane signature
    "d_dedup_cosine_auto" ->
      """WITH pick AS (
        |  SELECT CASE WHEN n <= 128 * (1::BIGINT << 6)  THEN 6
        |              WHEN n <= 128 * (1::BIGINT << 7)  THEN 7
        |              WHEN n <= 128 * (1::BIGINT << 8)  THEN 8
        |              WHEN n <= 128 * (1::BIGINT << 9)  THEN 9
        |              WHEN n <= 128 * (1::BIGINT << 10) THEN 10
        |              WHEN n <= 128 * (1::BIGINT << 11) THEN 11
        |              WHEN n <= 128 * (1::BIGINT << 12) THEN 12
        |              WHEN n <= 128 * (1::BIGINT << 13) THEN 13
        |              ELSE 14 END AS bits
        |  FROM (SELECT count(*) AS n FROM embeddings)),
        |planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM pick, (SELECT unnest(generate_series(0, 55)) AS b) bb WHERE b < 4 * bits),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * bits)) & ((1::BIGINT << bits) - 1) AS bandval
        |  FROM sig, pick, (SELECT unnest(generate_series(0, 3)) AS band) bb),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bandval = b.bandval
        |                              AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT id_a, id_b,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> ae.embedding[i]::DOUBLE * ae.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> be.embedding[i]::DOUBLE * be.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings ae ON id_a = ae.vec_id
        |            JOIN embeddings be ON id_b = be.vec_id)
        |SELECT id_a, id_b, sim
        |FROM scored WHERE sim >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    "s_ann_ivf" ->
      """WITH cent AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('centroid:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
        |cellsim AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS csim
        |  FROM embeddings, cent),
        |ranked_cells AS (
        |  SELECT vec_id, c,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c ASC) AS crank
        |  FROM cellsim),
        |assign AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank = 1),
        |probes AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank <= 6 AND vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE p.vec_id <> a.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "s_ann_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))), 6) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // threshold compares the 6-dp ROUNDED sim on both engines, so the
    // radius boundary cannot flip on a last-ulp libm difference
    "s_range_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))), 6) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, sim FROM scored
        |WHERE sim >= 0.25 ORDER BY query_id, neighbor_id""".stripMargin,

    // raw inner product, no normalization — the MIPS retrieval mode
    "s_mips" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_sum(list_transform(range(1, 65),
        |               i -> qv[i]::DOUBLE * cv[i]::DOUBLE)), 6) AS score
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, score
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // norm-augmented IVF serving of MIPS: shared CTEs end at the
    // candidate set, the tail re-ranks by the ORIGINAL 64-dim inner
    // product (equal to the augmented dot — query's 65th coord is 0)
    "s_mips_ivf" ->
      ("WITH " + MipsIvfCtes.stripMargin + ",\n" +
        """|scored AS (
           |  SELECT query_id, neighbor_id,
           |         round(list_sum(list_transform(range(1, 65),
           |               i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)), 6) AS score
           |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
           |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
           |ranked AS (
           |  SELECT query_id, neighbor_id, score,
           |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, rank::BIGINT AS rank, neighbor_id, score
           |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // recall of the augmented-cell probe vs exact inner-product top-5
    "s_recall_mips" ->
      ("WITH " + MipsIvfCtes.stripMargin + ",\n" +
        """|scored_i AS (
           |  SELECT query_id, neighbor_id,
           |         round(list_sum(list_transform(range(1, 65),
           |               i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)), 6) AS score
           |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
           |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
           |ivf AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |    FROM scored_i) WHERE rank <= 5),
           |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
           |scored_b AS (
           |  SELECT query_id, ce.vec_id AS neighbor_id,
           |         round(list_sum(list_transform(range(1, 65),
           |               i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)), 6) AS score
           |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
           |ex AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |    FROM scored_b) WHERE rank <= 5),
           |j AS (
           |  SELECT ex.query_id,
           |         (ivf.neighbor_id IS NOT NULL)::INT AS hit
           |  FROM ex LEFT JOIN ivf ON ex.query_id = ivf.query_id
           |                        AND ex.neighbor_id = ivf.neighbor_id)
           |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
           |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
           |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin),

    // mutual top-5 edges: the ranked frame self-joined on the reversed
    // id pair, each undirected edge emitted once
    "s_knn_mutual" ->
      """WITH e AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id < 200),
        |scored AS (
        |  SELECT a.id AS qid, b.id AS nid,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM e a, e b WHERE a.id <> b.id),
        |ranked AS (
        |  SELECT qid, nid, sim,
        |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
        |  FROM scored),
        |top AS (SELECT qid, nid, sim FROM ranked WHERE rank <= 5)
        |SELECT t.qid AS src, t.nid AS dst, t.sim
        |FROM top t JOIN top r ON t.qid = r.nid AND t.nid = r.qid
        |WHERE t.qid < t.nid ORDER BY src, dst""".stripMargin,

    // hardest positive = (simq asc, id asc) first of the same-label
    // pairs; hardest negative = (simq desc, id asc) first of the rest;
    // margin stays in integer micros end to end
    "s_triplets" ->
      """WITH e AS (SELECT vec_id AS id, embedding, label FROM embeddings WHERE vec_id < 200),
        |scored AS (
        |  SELECT a.id AS anchor_id, a.label AS a_label, b.id AS other_id, b.label AS o_label,
        |         CAST(floor(
        |           list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
        |           * 1000000.0 + 0.5) AS BIGINT) AS simq
        |  FROM e a, e b WHERE a.id <> b.id),
        |pos AS (
        |  SELECT anchor_id, a_label AS label, other_id AS pos_id, simq AS pos_simq
        |  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY simq ASC, other_id ASC) AS rn
        |        FROM scored WHERE o_label = a_label) q WHERE rn = 1),
        |neg AS (
        |  SELECT anchor_id, other_id AS neg_id, simq AS neg_simq
        |  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY simq DESC, other_id ASC) AS rn
        |        FROM scored WHERE o_label <> a_label) q WHERE rn = 1)
        |SELECT anchor_id, label, pos_id,
        |       pos_simq::DOUBLE / 1000000.0 AS pos_sim,
        |       neg_id, neg_simq::DOUBLE / 1000000.0 AS neg_sim,
        |       pos_simq - neg_simq AS margin_micro
        |FROM pos JOIN neg USING (anchor_id) ORDER BY anchor_id""".stripMargin,

    "s_rrf" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |full_s AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))), 6) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |trunc_s AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 33), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 33), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 33), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))), 6) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ra AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM full_s),
        |rb AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM trunc_s),
        |u AS (
        |  SELECT query_id, neighbor_id, floor(1000000.0 / (60.0 + rank::DOUBLE))::BIGINT AS contrib
        |  FROM (SELECT * FROM ra WHERE rank <= 10 UNION ALL SELECT * FROM rb WHERE rank <= 10) z),
        |g AS (
        |  SELECT query_id, neighbor_id, CAST(sum(contrib) AS BIGINT) AS rrf_micro,
        |         count(*) AS n_lists
        |  FROM u GROUP BY 1, 2),
        |f AS (
        |  SELECT query_id, neighbor_id, rrf_micro, n_lists,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY rrf_micro DESC, n_lists DESC, neighbor_id) AS fused_rank
        |  FROM g)
        |SELECT query_id, fused_rank::BIGINT AS fused_rank, neighbor_id, rrf_micro, n_lists
        |FROM f WHERE fused_rank <= 5 ORDER BY query_id, fused_rank""".stripMargin,

    "s_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, label AS nl, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id, nl,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))), 6) AS sim
        |  FROM q, c WHERE ql <> nl),
        |ranked AS (
        |  SELECT query_id, neighbor_id, nl, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, nl::BIGINT AS neighbor_label, sim
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "s_label_outliers" ->
      """WITH comp AS (
        |  SELECT label, i,
        |         sum(floor(embedding[i]::DOUBLE * 10000000.0 + 0.5))::BIGINT::DOUBLE
        |           / (count(*)::DOUBLE * 10000000.0) AS mean
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY label, i),
        |cen AS (SELECT label, list(mean ORDER BY i) AS centroid FROM comp GROUP BY 1),
        |d AS (
        |  SELECT e.label, e.vec_id,
        |         round(sqrt(list_sum(list_transform(range(1, 65),
        |           i -> (e.embedding[i]::DOUBLE - centroid[i]) * (e.embedding[i]::DOUBLE - centroid[i])))), 6) AS dist
        |  FROM embeddings e JOIN cen USING (label)),
        |r AS (
        |  SELECT label, vec_id, dist,
        |         row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id ASC) AS rank
        |  FROM d)
        |SELECT label::BIGINT AS label, rank::BIGINT AS rank, vec_id, dist
        |FROM r WHERE rank <= 5 ORDER BY label, rank""".stripMargin,

    // simplified silhouette: same centroid + rounded-distance replay
    // as s_label_outliers, then micro-quantized per vector so the
    // per-label mean is pure integral division
    "s_silhouette" ->
      """WITH comp AS (
        |  SELECT label, i,
        |         sum(floor(embedding[i]::DOUBLE * 10000000.0 + 0.5))::BIGINT::DOUBLE
        |           / (count(*)::DOUBLE * 10000000.0) AS mean
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY label, i),
        |cen AS (SELECT label AS clabel, list(mean ORDER BY i) AS centroid FROM comp GROUP BY 1),
        |d AS (
        |  SELECT e.label, e.vec_id, cen.clabel,
        |         round(sqrt(list_sum(list_transform(range(1, 65),
        |           i -> (e.embedding[i]::DOUBLE - centroid[i]) * (e.embedding[i]::DOUBLE - centroid[i])))), 6) AS dist
        |  FROM embeddings e, cen),
        |ab AS (
        |  SELECT label, vec_id,
        |         min(CASE WHEN clabel = label THEN dist END) AS a,
        |         min(CASE WHEN clabel <> label THEN dist END) AS b
        |  FROM d GROUP BY 1, 2),
        |sm AS (
        |  SELECT label,
        |         CASE WHEN b IS NULL OR greatest(a, b) <= 0 THEN 0
        |              ELSE CAST(floor((b - a) / greatest(a, b) * 1000000.0 + 0.5) AS BIGINT) END AS s_micro
        |  FROM ab)
        |SELECT label::BIGINT AS label, count(*)::BIGINT AS n,
        |       CAST(sum(s_micro) // count(*) AS BIGINT) AS mean_sil_micro,
        |       min(s_micro)::BIGINT AS min_sil_micro,
        |       max(s_micro)::BIGINT AS max_sil_micro
        |FROM sm GROUP BY 1 ORDER BY label""".stripMargin,

    // ratio-margin mining: rounded-6dp pair cosines, then integer
    // micro sums / ppm margins — the denominator is the mean of both
    // directions' top-4 neighborhoods
    "s_bitext_margin" ->
      """WITH x AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE label = 0),
        |y AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE label = 1),
        |sc AS (
        |  SELECT x.id AS src_id, y.id AS tgt_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> x.v[i]::DOUBLE * y.v[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> x.v[i]::DOUBLE * x.v[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> y.v[i]::DOUBLE * y.v[i]::DOUBLE)))), 6) AS sim
        |  FROM x, y),
        |fk AS (
        |  SELECT src_id, tgt_id, sim FROM (
        |    SELECT src_id, tgt_id, sim,
        |           row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, tgt_id ASC) AS r
        |    FROM sc) WHERE r <= 4),
        |bk AS (
        |  SELECT tgt_id, sim FROM (
        |    SELECT tgt_id, sim,
        |           row_number() OVER (PARTITION BY tgt_id ORDER BY sim DESC, src_id ASC) AS r
        |    FROM sc) WHERE r <= 4),
        |fs AS (SELECT src_id, sum(CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT)) AS fsum, count(*) AS fcnt FROM fk GROUP BY 1),
        |bs AS (SELECT tgt_id, sum(CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT)) AS bsum, count(*) AS bcnt FROM bk GROUP BY 1),
        |m AS (
        |  SELECT fk.src_id, fk.tgt_id, fk.sim,
        |         CAST(floor(fk.sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro,
        |         CAST((fsum + bsum) // (fcnt + bcnt) AS BIGINT) AS denom
        |  FROM fk JOIN fs USING (src_id) JOIN bs USING (tgt_id)),
        |mm AS (
        |  SELECT src_id, tgt_id, sim,
        |         CAST((sim_micro * 1000000) // denom AS BIGINT) AS margin_ppm
        |  FROM m WHERE denom > 0),
        |rk AS (
        |  SELECT src_id, tgt_id, sim, margin_ppm,
        |         row_number() OVER (PARTITION BY src_id ORDER BY margin_ppm DESC, tgt_id ASC) AS r
        |  FROM mm)
        |SELECT src_id, tgt_id, sim, margin_ppm
        |FROM rk WHERE r = 1 AND margin_ppm >= 1000000
        |ORDER BY src_id""".stripMargin,

    "s_ann_lsh" ->
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bb),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM banded q JOIN banded c ON q.band = c.band AND q.bandval = c.bandval
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the s_ann_lsh oracle with the query side fanned out to its
    // Hamming-1 probe set (bandval XOR each of the 3 band bits)
    "s_ann_lsh_mp" ->
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bb),
        |qprobe AS (
        |  SELECT vec_id, band,
        |         unnest(list_prepend(bandval,
        |           list_transform(range(0, 3), i -> xor(bandval, 1::BIGINT << i)))) AS bandval
        |  FROM banded WHERE vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM qprobe q JOIN banded c ON q.band = c.band AND q.bandval = c.bandval
        |  WHERE q.vec_id <> c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "s_recall_lsh_mp" ->
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bb),
        |qprobe AS (
        |  SELECT vec_id, band,
        |         unnest(list_prepend(bandval,
        |           list_transform(range(0, 3), i -> xor(bandval, 1::BIGINT << i)))) AS bandval
        |  FROM banded WHERE vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM qprobe q JOIN banded c ON q.band = c.band AND q.bandval = c.bandval
        |  WHERE q.vec_id <> c.vec_id),
        |scored_i AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |mp AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_i) WHERE rank <= 5),
        |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |scored_b AS (
        |  SELECT query_id, ce.vec_id AS neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_b) WHERE rank <= 5),
        |j AS (
        |  SELECT ex.query_id,
        |         (mp.neighbor_id IS NOT NULL)::INT AS hit
        |  FROM ex LEFT JOIN mp ON ex.query_id = mp.query_id
        |                       AND ex.neighbor_id = mp.neighbor_id)
        |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
        |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
        |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin,

    // query-directed probing replay: per-band bit margins come from the
    // same dots the signature uses; perturbation cost is the list_sum
    // over masked squared margins (zero identities keep the double sum
    // bit-identical to the Scala ascending-bit fold); ties break on the
    // mask, rn <= 3 takes the bandBits cheapest masks
    "s_ann_lsh_qd" -> lshQdOracleSql(recall = false, global = false),

    "s_recall_lsh_qd" -> lshQdOracleSql(recall = true, global = false),

    "s_ann_lsh_qa" -> lshQdOracleSql(recall = false, global = true),

    // auto-banded probing: geometry re-derived from count(embeddings)
    "s_ann_lsh_auto" -> lshQdAutoOracleSql(recall = false),

    "s_recall_lsh_auto" -> lshQdAutoOracleSql(recall = true),

    // auto-cells IVF: cell count re-derived from count(embeddings)
    "s_ann_ivf_auto" -> ivfAutoOracleSql(recall = false),

    "s_recall_ivf_auto" -> ivfAutoOracleSql(recall = true),

    "s_recall_lsh_qa" -> lshQdOracleSql(recall = true, global = true),

    // both sides are the s_ann_lsh / s_ann_cosine formulations
    // verbatim, reduced to (query_id, neighbor_id) id sets
    "s_recall_lsh" ->
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bb),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM banded q JOIN banded c ON q.band = c.band AND q.bandval = c.bandval
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |scored_l AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |lsh AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_l) WHERE rank <= 5),
        |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |scored_b AS (
        |  SELECT query_id, ce.vec_id AS neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_b) WHERE rank <= 5),
        |j AS (
        |  SELECT ex.query_id,
        |         (lsh.neighbor_id IS NOT NULL)::INT AS hit
        |  FROM ex LEFT JOIN lsh ON ex.query_id = lsh.query_id
        |                        AND ex.neighbor_id = lsh.neighbor_id)
        |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
        |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
        |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin,

    // the s_ann_ivf formulation (fixed md5 codebook, nprobe 6) on one
    // side, the s_ann_cosine brute force on the other, same audit fold
    "s_recall_ivf" ->
      """WITH cent AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('centroid:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
        |cellsim AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS csim
        |  FROM embeddings, cent),
        |ranked_cells AS (
        |  SELECT vec_id, c,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c ASC) AS crank
        |  FROM cellsim),
        |assign AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank = 1),
        |probes AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank <= 6 AND vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE p.vec_id <> a.vec_id),
        |scored_i AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ivf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_i) WHERE rank <= 5),
        |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |scored_b AS (
        |  SELECT query_id, ce.vec_id AS neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_b) WHERE rank <= 5),
        |j AS (
        |  SELECT ex.query_id,
        |         (ivf.neighbor_id IS NOT NULL)::INT AS hit
        |  FROM ex LEFT JOIN ivf ON ex.query_id = ivf.query_id
        |                        AND ex.neighbor_id = ivf.neighbor_id)
        |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
        |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
        |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin,

    "t_tokens" ->
      """WITH w AS (
        |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents)
        |SELECT doc_id,
        |       len(wd)::BIGINT AS ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS subword_tokens,
        |       len(list_distinct(wd))::BIGINT AS distinct_tokens
        |FROM w ORDER BY doc_id""".stripMargin,

    "t_fertility" ->
      """WITH w AS (
        |  SELECT lang::VARCHAR AS grp,
        |         length(text)::BIGINT AS chars,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS words,
        |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS subwords
        |  FROM documents),
        |a AS (
        |  SELECT grp, count(*) AS n_docs,
        |         CAST(sum(chars) AS BIGINT) AS chars,
        |         CAST(sum(words) AS BIGINT) AS words,
        |         CAST(sum(subwords) AS BIGINT) AS subwords
        |  FROM w GROUP BY 1)
        |SELECT grp AS "group", n_docs, chars, words, subwords,
        |       CASE WHEN words > 0 THEN CAST((chars * 1000000) // words AS BIGINT) ELSE 0 END AS chars_per_word_ppm,
        |       CASE WHEN words > 0 THEN CAST((subwords * 1000000) // words AS BIGINT) ELSE 0 END AS subwords_per_word_ppm
        |FROM a ORDER BY "group"""".stripMargin,

    "t_quality" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, len, np,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w)
        |SELECT doc_id,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |FROM f ORDER BY doc_id""".stripMargin,

    "t_langid" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(lw, x -> x IN ('the','and','of','to','is'))) AS en,
        |    len(list_filter(lw, x -> x IN ('der','die','das','und','ist'))) AS de,
        |    len(list_filter(lw, x -> x IN ('el','la','los','de','es'))) AS es
        |  FROM w)
        |SELECT doc_id,
        |       CASE WHEN de > en AND de > es THEN 'de'
        |            WHEN es > en AND es >= de THEN 'es'
        |            WHEN en > 0 THEN 'en' ELSE 'unknown' END AS lang_guess,
        |       lang
        |FROM hits ORDER BY doc_id""".stripMargin,

    "t_gopher_rules" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd,
        |         string_split(text, chr(10)) AS ln
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         len(wd)::BIGINT AS n_words,
        |         coalesce(list_sum(list_transform(wd, w -> length(w))), 0)::BIGINT AS nch,
        |         len(list_filter(wd, w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS alpha_w,
        |         len(ln)::BIGINT AS n_lines,
        |         len(list_filter(ln, l -> regexp_matches(l, '^[ \t]*[-*•]')))::BIGINT AS bullets,
        |         len(list_filter(ln, l -> regexp_matches(l, '(\.\.\.|…)$')))::BIGINT AS ell_lines,
        |         (length(text) - length(replace(text, '#', '')))::BIGINT AS hashes,
        |         (length(text) - length(replace(text, '...', ''))) / 3
        |           + (length(text) - length(replace(text, '…', '')))::BIGINT AS ells,
        |         (list_contains(list_transform(wd, w -> lower(w)), 'the')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'be')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'to')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'of')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'and')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'that')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'have')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'with')::INT) AS stop_cnt
        |  FROM b),
        |f AS (
        |  SELECT doc_id, n_words,
        |    (n_words BETWEEN 50 AND 100000)::BIGINT AS r_words,
        |    (n_words > 0 AND nch::DOUBLE / n_words >= 3.0
        |                 AND nch::DOUBLE / n_words <= 10.0)::BIGINT AS r_wordlen,
        |    (n_words > 0 AND hashes::DOUBLE / n_words <= 0.1
        |                 AND ells / n_words <= 0.1)::BIGINT AS r_symbol,
        |    (bullets::DOUBLE / n_lines <= 0.9)::BIGINT AS r_bullet,
        |    (ell_lines::DOUBLE / n_lines <= 0.3)::BIGINT AS r_ellipsis,
        |    (n_words > 0 AND alpha_w::DOUBLE / n_words >= 0.8)::BIGINT AS r_alpha,
        |    (stop_cnt >= 2)::BIGINT AS r_stop
        |  FROM c)
        |SELECT doc_id, n_words, r_words, r_wordlen, r_symbol, r_bullet,
        |       r_ellipsis, r_alpha, r_stop,
        |       (r_words * r_wordlen * r_symbol * r_bullet * r_ellipsis
        |        * r_alpha * r_stop)::BIGINT AS pass
        |FROM f ORDER BY doc_id""".stripMargin,

    // lines via chr(10) split on both engines; terminal check is
    // right(rtrim,1) — rtrim strips SPACES only in both engines, so a
    // trailing \t or \r fails the check identically on both sides
    "t_c4_rules" ->
      """WITH b AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ln,
        |         (position('lorem ipsum' IN lower(text)) > 0)::BIGINT AS has_lorem,
        |         (position('{' IN text) > 0)::BIGINT AS has_brace
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, has_lorem, has_brace, len(ln)::BIGINT AS n_lines,
        |         list_filter(ln, l ->
        |             rtrim(l) <> '' AND right(rtrim(l), 1) IN ('.', '!', '?', '"')
        |             AND len(list_filter(regexp_split_to_array(l, '\s+'), x -> x <> '')) >= 3
        |             AND position('javascript' IN lower(l)) = 0) AS keptl
        |  FROM b),
        |d AS (
        |  SELECT doc_id, n_lines, len(keptl)::BIGINT AS kept_lines,
        |         coalesce(list_sum(list_transform(keptl,
        |           l -> length(l) - length(regexp_replace(l, '[.!?]', '', 'g')))), 0)::BIGINT AS n_sentences,
        |         has_lorem, has_brace
        |  FROM c)
        |SELECT doc_id, n_lines, kept_lines, n_sentences, has_lorem, has_brace,
        |       (kept_lines > 0 AND n_sentences >= 5
        |        AND has_lorem = 0 AND has_brace = 0)::BIGINT AS pass
        |FROM d ORDER BY doc_id""".stripMargin,

    // avg_nll is the t_perplexity formulation verbatim (rounded to 4
    // decimals BEFORE the window sort, so the ntile order key is the
    // cross-engine-stable value; doc_id breaks ties uniquely)
    "t_ccnet_buckets" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |freq AS (SELECT token, count(*) AS freq FROM inst GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS n FROM inst),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_tokens, avg(ln(freq::DOUBLE)) AS mlf
        |  FROM inst JOIN freq USING (token) GROUP BY 1),
        |scored AS (
        |  SELECT d.doc_id, d.lang, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |         coalesce(round(ln((SELECT n FROM tot)) - mlf, 4), 0.0) AS avg_nll
        |  FROM documents d LEFT JOIN perdoc USING (doc_id)),
        |t AS (
        |  SELECT doc_id, lang, n_tokens, avg_nll,
        |         ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS trc
        |  FROM scored)
        |SELECT doc_id, lang, n_tokens, avg_nll,
        |       CASE trc WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM t ORDER BY doc_id""".stripMargin,

    // vocab cutoff ties: ORDER BY freq DESC, token ASC LIMIT 100 —
    // the p_vocab order, total and identical on both engines
    "t_oov" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |freq AS (SELECT token, count(*) AS freq FROM inst GROUP BY 1),
        |v AS (SELECT token FROM freq ORDER BY freq DESC, token ASC LIMIT 100),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         sum((token NOT IN (SELECT token FROM v))::INT) AS oov_tokens
        |  FROM inst GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |       coalesce(oov_tokens, 0)::BIGINT AS oov_tokens,
        |       CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0
        |            ELSE (oov_tokens * 1000000) // n_tokens END::BIGINT AS oov_ppm
        |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // the gopher and c4 CTE chains are the t_gopher_rules /
    // t_c4_rules formulations verbatim, reduced to their pass flags
    "p_funnel" ->
      """WITH gb AS (
        |  SELECT doc_id, text,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd,
        |         string_split(text, chr(10)) AS ln
        |  FROM documents),
        |gc AS (
        |  SELECT doc_id,
        |         len(wd)::BIGINT AS n_words,
        |         coalesce(list_sum(list_transform(wd, w -> length(w))), 0)::BIGINT AS nch,
        |         len(list_filter(wd, w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS alpha_w,
        |         len(ln)::BIGINT AS n_lines,
        |         len(list_filter(ln, l -> regexp_matches(l, '^[ \t]*[-*•]')))::BIGINT AS bullets,
        |         len(list_filter(ln, l -> regexp_matches(l, '(\.\.\.|…)$')))::BIGINT AS ell_lines,
        |         (length(text) - length(replace(text, '#', '')))::BIGINT AS hashes,
        |         (length(text) - length(replace(text, '...', ''))) / 3
        |           + (length(text) - length(replace(text, '…', '')))::BIGINT AS ells,
        |         (list_contains(list_transform(wd, w -> lower(w)), 'the')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'be')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'to')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'of')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'and')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'that')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'have')::INT
        |          + list_contains(list_transform(wd, w -> lower(w)), 'with')::INT) AS stop_cnt
        |  FROM gb),
        |g AS (
        |  SELECT doc_id,
        |    ((n_words BETWEEN 50 AND 100000)::BIGINT
        |     * (n_words > 0 AND nch::DOUBLE / n_words >= 3.0
        |                    AND nch::DOUBLE / n_words <= 10.0)::BIGINT
        |     * (n_words > 0 AND hashes::DOUBLE / n_words <= 0.1
        |                    AND ells / n_words <= 0.1)::BIGINT
        |     * (bullets::DOUBLE / n_lines <= 0.9)::BIGINT
        |     * (ell_lines::DOUBLE / n_lines <= 0.3)::BIGINT
        |     * (n_words > 0 AND alpha_w::DOUBLE / n_words >= 0.8)::BIGINT
        |     * (stop_cnt >= 2)::BIGINT) AS gpass
        |  FROM gc),
        |cb AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ln,
        |         (position('lorem ipsum' IN lower(text)) > 0)::BIGINT AS has_lorem,
        |         (position('{' IN text) > 0)::BIGINT AS has_brace
        |  FROM documents),
        |cc AS (
        |  SELECT doc_id, has_lorem, has_brace,
        |         list_filter(ln, l ->
        |             rtrim(l) <> '' AND right(rtrim(l), 1) IN ('.', '!', '?', '"')
        |             AND len(list_filter(regexp_split_to_array(l, '\s+'), x -> x <> '')) >= 3
        |             AND position('javascript' IN lower(l)) = 0) AS keptl
        |  FROM cb),
        |c4 AS (
        |  SELECT doc_id,
        |         (len(keptl) > 0
        |          AND coalesce(list_sum(list_transform(keptl,
        |                l -> length(l) - length(regexp_replace(l, '[.!?]', '', 'g')))), 0) >= 5
        |          AND has_lorem = 0 AND has_brace = 0)::BIGINT AS cpass
        |  FROM cc),
        |sig AS (
        |  SELECT doc_id, lang, source,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS nw
        |  FROM documents),
        |canon AS (SELECT fp, min(doc_id) AS canon_id FROM sig GROUP BY 1),
        |j AS (
        |  SELECT s.lang, s.source, g.gpass, c4.cpass,
        |         (s.doc_id = canon.canon_id)::BIGINT AS is_canon, s.nw
        |  FROM sig s JOIN g USING (doc_id) JOIN c4 USING (doc_id) JOIN canon USING (fp))
        |SELECT lang, source, count(*)::BIGINT AS n_docs,
        |       sum(gpass)::BIGINT AS n_gopher, sum(cpass)::BIGINT AS n_c4,
        |       sum(is_canon)::BIGINT AS n_canonical,
        |       sum(gpass * cpass * is_canon)::BIGINT AS n_selected,
        |       sum(gpass * cpass * is_canon * nw)::BIGINT AS words_selected
        |FROM j GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

    "t_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, wd, unnest(generate_series(1, greatest(len(wd) - 10, 1), 40)) AS start
        |  FROM w)
        |SELECT doc_id,
        |       ((start - 1) // 40 + 1)::BIGINT AS chunk_no,
        |       start::BIGINT AS start_token,
        |       least(50, len(wd) - start + 1)::BIGINT AS n_tokens,
        |       array_to_string(wd[start:start+49], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_no""".stripMargin,

    // same planted PII, same three RE2-safe patterns in the same order
    "t_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@example.com'
        |              || ' or +1 (415) 555-01' || doc_id
        |              || ' node 10.0.0.' || (doc_id % 256) AS text
        |  FROM documents)
        |SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(
        |           regexp_replace(text,
        |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g'),
        |         '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS redacted
        |FROM d ORDER BY doc_id""".stripMargin,

    // hash fraction = uint60(md5('sample:' || id)) / 2^60 — identical
    // IEEE double math on both engines, so the < compare can't diverge
    "p_sample" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT
        |      / 1152921504606846976.0 < 0.25
        |ORDER BY doc_id""".stripMargin,

    // ::DOUBLE on the fraction: DuckDB would otherwise use exact decimal
    // arithmetic where Spark uses IEEE doubles (ceil could differ by 1)
    "p_sample_stratified" ->
      """WITH k AS (
        |  SELECT doc_id, lang, substr(md5('stratified:' || doc_id), 1, 15) AS k
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY k, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM k)
        |SELECT doc_id, lang FROM r
        |WHERE rn <= ceil(n * 0.2::DOUBLE) ORDER BY doc_id""".stripMargin,

    "p_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS tokens,
        |         substr(md5('mixture:' || doc_id), 1, 15) AS k
        |  FROM documents),
        |b(lang, budget) AS (VALUES ('en', 4000), ('de', 1500), ('es', 1500), ('fr', 1000), ('zh', 2000)),
        |c AS (
        |  SELECT t.doc_id, t.lang, t.tokens, b.budget,
        |         sum(t.tokens) OVER (PARTITION BY t.lang ORDER BY t.k, t.doc_id
        |                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t JOIN b ON t.lang = b.lang)
        |SELECT doc_id, lang, tokens, cum_tokens::BIGINT AS cum_tokens FROM c
        |WHERE cum_tokens - tokens < budget ORDER BY doc_id""".stripMargin,

    "p_shuffle" ->
      """SELECT doc_id AS id,
        |       row_number() OVER (ORDER BY substr(md5('shuffle:' || doc_id), 1, 15), doc_id)::BIGINT AS pos
        |FROM documents ORDER BY pos""".stripMargin,

    "p_domain_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY substr(md5('domaincap:' || doc_id), 1, 15), doc_id) AS domain_rank
        |  FROM documents)
        |SELECT doc_id, source, domain_rank::BIGINT AS domain_rank
        |FROM r WHERE domain_rank <= 10 ORDER BY doc_id""".stripMargin,

    // composition of the d_dedup_exact + t_quality + t_langid oracles
    "p_corpus" ->
      """WITH keep AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
        |w AS (
        |  SELECT doc_id, lang, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents JOIN keep USING (doc_id)),
        |f AS (
        |  SELECT doc_id, lang, lw, len, np,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w),
        |q AS (
        |  SELECT doc_id, lang, lw,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM f),
        |h AS (
        |  SELECT doc_id, lang, quality,
        |    len(list_filter(lw, x -> x IN ('the','and','of','to','is'))) AS en,
        |    len(list_filter(lw, x -> x IN ('der','die','das','und','ist'))) AS de,
        |    len(list_filter(lw, x -> x IN ('el','la','los','de','es'))) AS es
        |  FROM q)
        |SELECT doc_id, lang FROM h
        |WHERE quality >= 500
        |  AND (CASE WHEN de > en AND de > es THEN 'de'
        |            WHEN es > en AND es >= de THEN 'es'
        |            WHEN en > 0 THEN 'en' ELSE 'unknown' END) = 'en'
        |ORDER BY doc_id""".stripMargin,

    "p_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS tokens,
        |         substr(md5('pack:' || doc_id), 1, 15) AS k,
        |         (('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT % 8) AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tokens, shard,
        |         (sum(tokens) OVER (PARTITION BY shard ORDER BY k, doc_id
        |                            ROWS UNBOUNDED PRECEDING) - tokens)::BIGINT AS seq_offset
        |  FROM t)
        |SELECT doc_id, tokens, shard, (seq_offset // 2048)::BIGINT AS seq_no, seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // predicts what the REAL byte-level header parser must read back from
    // the planted binaries: png/jpeg dims and wav channel/rate are
    // arithmetic in doc_id; %4==3 blobs are magic-less and take the
    // documented md5-stub fallback (h = md5 of the uppercase content hex,
    // where the content is 0x00 || md5(text))
    "m_media_decode" ->
      """WITH hx AS (SELECT doc_id, md5('00' || upper(md5(text))) AS h FROM documents)
        |SELECT doc_id AS media_id,
        |       CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 23 WHEN 2 THEN 44 ELSE 17 END::BIGINT AS byte_len,
        |       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav' ELSE 'unknown' END AS format,
        |       CASE doc_id % 4 WHEN 2 THEN 0
        |            WHEN 3 THEN ('0x' || substr(h, 1, 2))::BIGINT
        |            ELSE doc_id % 200 + 1 END::BIGINT AS width,
        |       CASE doc_id % 4 WHEN 2 THEN 0
        |            WHEN 3 THEN ('0x' || substr(h, 3, 2))::BIGINT
        |            ELSE doc_id % 100 + 1 END::BIGINT AS height,
        |       CASE doc_id % 4 WHEN 2 THEN doc_id % 2 + 1
        |            WHEN 3 THEN ('0x' || substr(h, 5, 2))::BIGINT % 3
        |            ELSE 3 END::BIGINT AS channels,
        |       CASE doc_id % 4 WHEN 2 THEN doc_id % 100 * 10 + 8000 ELSE 0 END::BIGINT AS sample_rate
        |FROM hx ORDER BY media_id""".stripMargin,

    "m_media_batch" ->
      """WITH hx AS (SELECT doc_id, md5(upper(md5(text))) AS h FROM documents)
        |SELECT doc_id AS media_id, 16::BIGINT AS byte_len,
        |       ('0x' || substr(h, 1, 2))::BIGINT AS width,
        |       ('0x' || substr(h, 3, 2))::BIGINT AS height,
        |       (('0x' || substr(h, 5, 2))::BIGINT % 3) AS channels_mod
        |FROM hx ORDER BY media_id""".stripMargin,

    // box math over the REAL parsed dims of planted png (even doc_id) /
    // jpeg (odd) headers; both plant width=doc_id%200+1, height=%100+1,
    // always >= 1, so the degenerate clamp never fires here
    "m_media_resize" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |         (doc_id % 200 + 1)::BIGINT AS w, (doc_id % 100 + 1)::BIGINT AS h
        |  FROM documents)
        |SELECT media_id, w AS width, h AS height,
        |       CASE WHEN w >= h THEN 64
        |            ELSE greatest(1, (w * 64) // h) END::BIGINT AS out_w,
        |       CASE WHEN w >= h THEN greatest(1, (h * 64) // w)
        |            ELSE 64 END::BIGINT AS out_h
        |FROM dims ORDER BY media_id""".stripMargin,

    "m_media_features" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id,
        |         list_transform(generate_series(0, 15),
        |           i -> ('0x' || substr(upper(md5(text)), i * 2 + 1, 2))::BIGINT) AS bytes
        |  FROM documents)
        |SELECT media_id, 16::BIGINT AS byte_len,
        |       ((list_sum(bytes) * 1000) // 16)::BIGINT AS byte_mean_milli,
        |       len(list_distinct(bytes))::BIGINT AS distinct_bytes,
        |       list_max(bytes) AS max_byte
        |FROM b ORDER BY media_id""".stripMargin,

    // pixel stats predicted from the SAME arithmetic that generated the
    // planted pixels — no codec in the oracle: if Spark's inflate or any
    // of the five filter reversals is off by one byte, the stats diverge.
    // Junk rows (%4==3) replay the 17-byte 0x00+md5 blob distribution.
    "m_media_pixels" ->
      """WITH png AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255), i -> (doc_id * 7 + i * 13) % 256) AS p
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'png' AS format, true AS decoded,
        |       256::BIGINT AS n_vals,
        |       ((list_sum(p) * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(p))::BIGINT AS distinct_vals,
        |       list_max(p)::BIGINT AS max_val
        |FROM png
        |UNION ALL -- m_media_pixels junk branch
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_vals,
        |       ((list_sum(b) * 1000) // 17)::BIGINT AS mean_milli,
        |       len(list_distinct(b))::BIGINT AS distinct_vals,
        |       list_max(b)::BIGINT AS max_val
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // decoded-byte predictions per depth class: sub-byte values scale
    // by 255/(2^d−1) (255/85/17), 16-bit emits the high byte (// 256)
    "m_media_pixels_depth" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN list_transform(generate_series(0, 255), i -> ((doc_id * 1 + i * 1) % 2) * 255)
        |      WHEN 1 THEN list_transform(generate_series(0, 255), i -> ((doc_id * 3 + i * 5) % 4) * 85)
        |      WHEN 2 THEN list_transform(generate_series(0, 255), i -> ((doc_id * 7 + i * 3) % 16) * 17)
        |      ELSE list_transform(generate_series(0, 255), i -> ((doc_id * 2654 + i * 997) % 65536) // 256)
        |    END AS p
        |  FROM documents)
        |SELECT doc_id AS media_id, 'png' AS format, true AS decoded,
        |       256::BIGINT AS n_vals,
        |       ((list_sum(p) * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(p))::BIGINT AS distinct_vals,
        |       list_max(p)::BIGINT AS max_val
        |FROM px ORDER BY media_id""".stripMargin,


    // signed-sample stats predicted from the SAME arithmetic that
    // generated the planted PCM — the zero-crossing count and |peak|
    // only match if every 16-bit little-endian (and 8-bit offset-128)
    // sample decodes exactly; mean uses floor over a double in both
    // engines (integer floorDiv paths differ on negative numerators).
    // Junk rows (%4==3) replay the 17-byte 0x00+md5 blob distribution.
    "m_media_samples" ->
      """WITH wav AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 1
        |              THEN list_transform(generate_series(0, 47),
        |                     i -> ((doc_id * 31 + i * 17) % 256) - 128)
        |              ELSE list_transform(generate_series(0, 47),
        |                     i -> ((doc_id * 31 + i * 17) % 65536) - 32768)
        |         END AS sl
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'wav' AS format, true AS decoded,
        |       48::BIGINT AS n_samples,
        |       floor(list_sum(sl) * 1000 / 48.0)::BIGINT AS mean_milli,
        |       list_max(list_transform(sl, x -> abs(x)))::BIGINT AS peak,
        |       len(list_filter(generate_series(2, 48),
        |             j -> (sl[j - 1] < 0) <> (sl[j] < 0)))::BIGINT AS zero_crossings
        |FROM wav
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_samples,
        |       floor(list_sum(b) * 1000 / 17.0)::BIGINT AS mean_milli,
        |       list_max(b)::BIGINT AS peak,
        |       0::BIGINT AS zero_crossings
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // the G.711 expansions replay as pure integer segment arithmetic:
    // mu-law complements then biases by 132, A-law XORs 0x55 with the
    // zero-segment special case; sign conventions differ by design
    "m_audio_g711" ->
      """WITH mu AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 47), i ->
        |           CASE WHEN (255 - (doc_id * 13 + i * 7) % 256) >= 128
        |                THEN 132 - (((255 - (doc_id * 13 + i * 7) % 256) % 16) * 8 + 132)
        |                     * (1 << (((255 - (doc_id * 13 + i * 7) % 256) // 16) % 8))
        |                ELSE (((255 - (doc_id * 13 + i * 7) % 256) % 16) * 8 + 132)
        |                     * (1 << (((255 - (doc_id * 13 + i * 7) % 256) // 16) % 8)) - 132
        |           END) AS sl
        |  FROM documents WHERE doc_id % 4 <> 3 AND doc_id % 2 = 0),
        |al AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 47), i ->
        |           CASE WHEN xor((doc_id * 13 + i * 7) % 256, 85) >= 128 THEN 1 ELSE -1 END *
        |           CASE WHEN (xor((doc_id * 13 + i * 7) % 256, 85) // 16) % 8 = 0
        |                THEN (xor((doc_id * 13 + i * 7) % 256, 85) % 16) * 16 + 8
        |                ELSE ((xor((doc_id * 13 + i * 7) % 256, 85) % 16) * 16 + 264)
        |                     * (1 << ((xor((doc_id * 13 + i * 7) % 256, 85) // 16) % 8 - 1))
        |           END) AS sl
        |  FROM documents WHERE doc_id % 4 = 1),
        |wav AS (SELECT doc_id, sl FROM mu UNION ALL SELECT doc_id, sl FROM al),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'wav' AS format, true AS decoded,
        |       48::BIGINT AS n_samples,
        |       floor(list_sum(sl) * 1000 / 48.0)::BIGINT AS mean_milli,
        |       list_max(list_transform(sl, x -> abs(x)))::BIGINT AS peak,
        |       len(list_filter(generate_series(2, 48),
        |             j -> (sl[j - 1] < 0) <> (sl[j] < 0)))::BIGINT AS zero_crossings
        |FROM wav
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_samples,
        |       floor(list_sum(b) * 1000 / 17.0)::BIGINT AS mean_milli,
        |       list_max(b)::BIGINT AS peak,
        |       0::BIGINT AS zero_crossings
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // 24-bit samples replay as exact integer arithmetic; float samples
    // as round(k*32767/256.0) in doubles — k/256 is exactly
    // representable and |k| <= 100 never lands on a .5 boundary
    // (that needs k ≡ 128 mod 256), so float-vs-double rounding and
    // both engines' round conventions agree by construction
    "m_media_samples_deep" ->
      """WITH deep AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN list_transform(generate_series(0, 47),
        |                     i -> ((doc_id * 31 + i * 1717) % 16000000) - 8000000)
        |              ELSE list_transform(generate_series(0, 47),
        |                     i -> CAST(round((((doc_id * 31 + i * 17) % 200) - 100) * 32767.0 / 256.0) AS BIGINT))
        |         END AS sl
        |  FROM documents WHERE doc_id % 3 <> 2),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id AS media_id, 'wav' AS format, true AS decoded,
        |       48::BIGINT AS n_samples,
        |       floor(list_sum(sl) * 1000 / 48.0)::BIGINT AS mean_milli,
        |       list_max(list_transform(sl, x -> abs(x)))::BIGINT AS peak,
        |       len(list_filter(generate_series(2, 48),
        |             j -> (sl[j - 1] < 0) <> (sl[j] < 0)))::BIGINT AS zero_crossings
        |FROM deep
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_samples,
        |       floor(list_sum(b) * 1000 / 17.0)::BIGINT AS mean_milli,
        |       list_max(b)::BIGINT AS peak,
        |       0::BIGINT AS zero_crossings
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    "m_media_audio_frames" ->
      """WITH wav AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 1
        |              THEN list_transform(generate_series(0, 47),
        |                     i -> ((doc_id * 31 + i * 17) % 256) - 128)
        |              ELSE list_transform(generate_series(0, 47),
        |                     i -> ((doc_id * 31 + i * 17) % 65536) - 32768)
        |         END AS sl
        |  FROM documents WHERE doc_id % 4 <> 3),
        |fr AS (
        |  SELECT doc_id, f,
        |         list_transform(generate_series(f * 16 + 1, f * 16 + 16), j -> sl[j]) AS w
        |  FROM wav, (SELECT unnest(generate_series(0, 2)) AS f) fs),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, f::BIGINT AS frame_no, true AS decoded,
        |       16::BIGINT AS n_samples,
        |       CAST(list_sum(list_transform(w, x -> x * x)) AS BIGINT) AS sumsq,
        |       floor(sqrt(list_sum(list_transform(w, x -> x * x))::DOUBLE / 16.0) * 1000)::BIGINT AS rms_milli,
        |       list_max(list_transform(w, x -> abs(x)))::BIGINT AS peak,
        |       len(list_filter(generate_series(2, 16),
        |             j -> (w[j - 1] < 0) <> (w[j] < 0)))::BIGINT AS zero_crossings
        |FROM fr
        |UNION ALL
        |SELECT doc_id AS media_id, 0::BIGINT, false, 17::BIGINT,
        |       CAST(list_sum(list_transform(b, x -> x * x)) AS BIGINT),
        |       floor(sqrt(list_sum(list_transform(b, x -> x * x))::DOUBLE / 17.0) * 1000)::BIGINT,
        |       list_max(b)::BIGINT, 0::BIGINT
        |FROM junk
        |ORDER BY media_id, frame_no""".stripMargin,

    // pixel stats predicted from the block-value arithmetic: a 16x16
    // four-flat-block JPEG decodes to 64 copies of each block value
    // (flat blocks are exact under DC quant 8), so sum = 64 * sum(bv);
    // the four per-doc block values are always distinct (offsets 0, 29,
    // 58, 87 mod 256). Junk rows replay the 0x00+md5 distribution.
    "m_media_pixels_jpeg" ->
      """WITH jb AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 3), b -> (doc_id * 13 + b * 29) % 256) AS bv
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'jpeg' AS format, true AS decoded,
        |       256::BIGINT AS n_vals,
        |       ((list_sum(bv) * 64 * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(bv))::BIGINT AS distinct_vals,
        |       list_max(bv)::BIGINT AS max_val
        |FROM jb
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_vals,
        |       ((list_sum(b) * 1000) // 17)::BIGINT AS mean_milli,
        |       len(list_distinct(b))::BIGINT AS distinct_vals,
        |       list_max(b)::BIGINT AS max_val
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // the progressive planting uses the SAME flat-block arithmetic:
    // the stream differs (six Annex G scans), the decoded pixels and
    // therefore the oracle must not
    "m_media_pixels_prog" ->
      """WITH jb AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 3), b -> (doc_id * 13 + b * 29) % 256) AS bv
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'jpeg' AS format, true AS decoded,
        |       256::BIGINT AS n_vals,
        |       ((list_sum(bv) * 64 * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(bv))::BIGINT AS distinct_vals,
        |       list_max(bv)::BIGINT AS max_val
        |FROM jb
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_vals,
        |       ((list_sum(b) * 1000) // 17)::BIGINT AS mean_milli,
        |       len(list_distinct(b))::BIGINT AS distinct_vals,
        |       list_max(b)::BIGINT AS max_val
        |FROM junk
        |ORDER BY media_id""".stripMargin,


    // aHash replay: 8x8 resample of the base-class pattern, integer
    // mean, strict > threshold, bits as two unsigned 32-bit halves
    "m_media_phash" ->
      """WITH gp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           i -> ((doc_id % 50) * 11 + i * i * 13) % 256) AS p
        |  FROM documents WHERE doc_id % 4 <> 3),
        |rp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> p[((j // 8) * 2) * 16 + (j % 8) * 2 + 1]) AS q
        |  FROM gp),
        |m AS (SELECT doc_id, q, list_sum(q) // 64 AS mean FROM rp)
        |SELECT doc_id AS media_id, 'gif' AS format, true AS decoded,
        |       list_sum(list_transform(generate_series(32, 63),
        |         j -> CASE WHEN q[j + 1] > mean THEN 1::BIGINT << (j - 32) ELSE 0 END))::BIGINT AS phash_hi,
        |       list_sum(list_transform(generate_series(0, 31),
        |         j -> CASE WHEN q[j + 1] > mean THEN 1::BIGINT << j ELSE 0 END))::BIGINT AS phash_lo
        |FROM m
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT
        |FROM documents WHERE doc_id % 4 = 3
        |ORDER BY media_id""".stripMargin,

    "m_media_phash_dups" ->
      """WITH gp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           i -> ((doc_id % 50) * 11 + i * i * 13) % 256) AS p
        |  FROM documents WHERE doc_id % 4 <> 3),
        |rp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> p[((j // 8) * 2) * 16 + (j % 8) * 2 + 1]) AS q
        |  FROM gp),
        |m AS (SELECT doc_id, q, list_sum(q) // 64 AS mean FROM rp),
        |ph AS (
        |  SELECT doc_id,
        |         list_sum(list_transform(generate_series(32, 63),
        |           j -> CASE WHEN q[j + 1] > mean THEN 1::BIGINT << (j - 32) ELSE 0 END))::BIGINT AS phash_hi,
        |         list_sum(list_transform(generate_series(0, 31),
        |           j -> CASE WHEN q[j + 1] > mean THEN 1::BIGINT << j ELSE 0 END))::BIGINT AS phash_lo
        |  FROM m)
        |SELECT phash_hi, phash_lo, min(doc_id) AS canonical_id, count(*) AS dup_count
        |FROM ph GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY canonical_id""".stripMargin,

    // the 8x8 nearest-neighbor resample of the planted 16x16 pattern:
    // out pixel j reads source ((j//8)*2)*16 + (j%8)*2 — the fit-box
    // dims and the resampled stats must all match
    "m_media_resample" ->
      """WITH gp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           i -> (doc_id * 11 + i * i * 13) % 256) AS p
        |  FROM documents WHERE doc_id % 4 <> 3),
        |rp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> p[((j // 8) * 2) * 16 + (j % 8) * 2 + 1]) AS q
        |  FROM gp),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'gif' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       64::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 64)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM rp
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // interlaced fixtures carry the SAME pixel formula as sequential
    // ones (Appendix E only permutes the container's row order), so
    // the de-interlaced resample replays with the identical oracle —
    // a decoder skipping the de-interleave fails every odd doc's row
    "m_media_gif_interlaced" ->
      """WITH gp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           i -> (doc_id * 11 + i * i * 13) % 256) AS p
        |  FROM documents WHERE doc_id % 4 <> 3),
        |rp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> p[((j // 8) * 2) * 16 + (j % 8) * 2 + 1]) AS q
        |  FROM gp),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'gif' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       64::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 64)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM rp
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // the resample samples logical pixel (2y, 2x, c): output index j
    // maps to source index ((j//24)*2*16 + (j%24)//3*2)*3 + j%3 of the
    // planted top-down BGR stream — row-order exact for BOTH stored
    // orientations (even docs bottom-up, odd top-down)
    "m_media_pixels_bmp" ->
      """WITH bp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 7 + ((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + j % 3) * 13) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'bmp' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM bp
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // BGR resample like the BMP oracle: output index j maps to source
    // index ((j//24)*2*16 + (j%24)//3*2)*3 + j%3 of the planted stream
    // PCX replay: closed-form fixture pixels through the same 2x box
    // walk; srcbyte = (((j//24)*2)*16 + ((j%24)//3)*2)*3 + j%3
    // 4-channel resampled replay (the farbfeld mapping): out j ->
    // src byte i = (2*(j//32)*16 + 2*((j%32)//4))*4 + j%4, value
    // (doc*23 + ((i//4)//2)*13 + (i%4)*5) % 256
    // even docs: new-style pair pattern (//2); odd docs: old-style
    // quad pattern (//4) — the decode output is the planted stream
    // either way, so only the value formula splits
    "m_media_pixels_hdr" ->
      """WITH ip AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           j -> (doc_id * 23
        |                 + ((((((j // 32) * 2) * 16 + ((j % 32) // 4) * 2) * 4 + (j % 4)) // 4)
        |                    // (CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 2 END)) * 13
        |                 + (j % 4) * 5) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'hdr' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h, 256::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM ip
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // resampled-formula replay (the m_media convention): RGB docs map
    // out j to src byte i = (2*(j//24)*16 + 2*((j%24)//3))*3 + j%3 and
    // value (doc*19 + (i//6)*23 + (i%3)*7) % 256; gray docs map
    // i = 2*(j//8)*16 + 2*(j%8), value (doc*19 + (i//2)*23) % 256
    "m_media_pixels_ras" ->
      """WITH rgb AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 19
        |                 + (((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + (j % 3)) // 6) * 23
        |                 + (j % 3) * 7) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3 AND doc_id % 2 = 0),
        |gray AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> (doc_id * 19
        |                 + (((((j // 8) * 2) * 16 + (j % 8) * 2)) // 2) * 23) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3 AND doc_id % 2 = 1),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'ras' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h, 192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM rgb
        |UNION ALL
        |SELECT doc_id AS media_id, 'ras' AS format, true AS decoded,
        |       8::BIGINT, 8::BIGINT, 64::BIGINT,
        |       ((list_sum(q) * 1000) // 64)::BIGINT,
        |       len(list_distinct(q))::BIGINT, list_max(q)::BIGINT
        |FROM gray
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    "m_media_pixels_pcx" ->
      """WITH ip AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 17
        |                 + (((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + (j % 3)) // 6) * 11
        |                 + (j % 3) * 3) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'pcx' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM ip
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // QOI replay: the fixture's logical pixels are closed-form, so the
    // oracle computes the resampled stream directly — srcbyte for out
    // byte j is (((j//24)*2)*16 + ((j%24)//3)*2)*3 + j%3 (2x box walk)
    // resampled-formula replay (the m_media convention: the decode
    // round-trip is spec-pinned in sbt; the oracle recomputes the
    // fixture pixel value at each resampled position): out j over
    // 8x8x4 maps to src i = ((2*(j//32))*16 + 2*((j%32)//4))*4 + j%4
    "m_media_pixels_ff" ->
      """WITH ip AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           j -> (doc_id * 11
        |                 + (((((j // 32) * 2) * 16 + ((j % 32) // 4) * 2) * 4 + (j % 4)) // 7) * 3
        |                 + (j % 4) * 5) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'farbfeld' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       256::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM ip
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    "m_media_pixels_qoi" ->
      """WITH ip AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 13
        |                 + (((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + (j % 3)) // 9) * 5
        |                 + (j % 3) * 7) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'qoi' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM ip
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    "m_media_pixels_ico" ->
      """WITH ip AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 9 + ((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + j % 3) * 19) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'ico' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM ip
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // the planted stream repeats each value for a pixel pair
    // (k//6 collapses the pair), so the oracle is one formula across
    // raw/RLE and both row orders
    "m_media_pixels_tga" ->
      """WITH tp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 21 +
        |                 (((((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + j % 3) // 6) * 3
        |                   + ((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + j % 3) % 3) * 29)) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'tga' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM tp
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // P6 rows resample 192 interleaved bytes, P5 rows 64 gray bytes —
    // n_vals pins the channel count per parity
    "m_media_pixels_pnm" ->
      """WITH p6 AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 191),
        |           j -> (doc_id * 5 + ((((j // 24) * 2) * 16 + ((j % 24) // 3) * 2) * 3 + j % 3) * 31) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3 AND doc_id % 2 = 0),
        |p5 AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> (doc_id * 5 + (((j // 8) * 2) * 16 + (j % 8) * 2) * 31) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3 AND doc_id % 2 = 1),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'pnm' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h, 192::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 192)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM p6
        |UNION ALL
        |SELECT doc_id AS media_id, 'pnm' AS format, true AS decoded,
        |       8::BIGINT, 8::BIGINT, 64::BIGINT,
        |       ((list_sum(q) * 1000) // 64)::BIGINT,
        |       len(list_distinct(q))::BIGINT, list_max(q)::BIGINT
        |FROM p5
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // orientation is planted doc_id arithmetic; junk rows sniff as
    // unknown with orientation 0
    "m_media_exif" ->
      """SELECT doc_id AS media_id, 'jpeg' AS format, true AS has_exif,
        |       (doc_id % 8 + 1)::BIGINT AS orientation
        |FROM documents WHERE doc_id % 4 <> 3
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS has_exif,
        |       0::BIGINT AS orientation
        |FROM documents WHERE doc_id % 4 = 3
        |ORDER BY media_id""".stripMargin,

    // the quantized Goertzel recurrence replayed per (doc, bin): a
    // recursive CTE carries (s1, s2) through all 48 planted samples —
    // // truncates toward zero on both engines, so every state is the
    // same LONG
    "m_media_goertzel" ->
      """WITH RECURSIVE
        |bins AS (SELECT * FROM (VALUES (0, 1414), (1, 0), (2, -1414)) b(bin, coef)),
        |d AS (SELECT doc_id, 100 + doc_id % 50 AS amp FROM documents WHERE doc_id % 4 <> 3),
        |walk AS (
        |  SELECT doc_id, amp, bin, coef, 0 AS n,
        |         CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2
        |  FROM d, bins
        |  UNION ALL
        |  SELECT doc_id, amp, bin, coef, n + 1,
        |         (CASE WHEN ((n // 4) % 2) = 0 THEN amp ELSE -amp END
        |           + (doc_id * 7 + n * 3) % 5 - 2)
        |           + (coef * s1) // 1000 - s2 AS s1,
        |         s1 AS s2
        |  FROM walk WHERE n < 48),
        |fin AS (SELECT doc_id, bin, coef, s1, s2 FROM walk WHERE n = 48),
        |junk AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'wav' AS format, true AS decoded,
        |       bin::BIGINT AS bin, coef::BIGINT AS coef_milli,
        |       (s1 * s1 + s2 * s2 - (coef * s1 * s2) // 1000)::BIGINT AS energy
        |FROM fin
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       -1::BIGINT, 0::BIGINT, 0::BIGINT
        |FROM junk
        |ORDER BY media_id, bin""".stripMargin,

    // the IMA recurrence replayed sample-by-sample: a recursive CTE
    // walks each (doc, block)'s 16 nibbles through the shared 89-entry
    // step table — per-sample clamp, per-sample index adjust — then
    // the stats fold over the block-concatenated stream (crossings
    // COUNT across the block boundary, like the decoder's flat array)
    "m_media_samples_adpcm" ->
      """WITH RECURSIVE
        |tabs AS (SELECT
        |  [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
        |   41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,
        |   190,209,230,253,279,307,337,371,408,449,494,544,598,658,
        |   724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,
        |   2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,
        |   6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,
        |   16818,18500,20350,22385,24623,27086,29794,32767] AS steps,
        |  [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8] AS idxadj),
        |blocks AS (
        |  SELECT doc_id, b.blk
        |  FROM documents, (SELECT unnest([0, 1]) AS blk) b
        |  WHERE doc_id % 4 <> 3),
        |walk AS (
        |  SELECT doc_id, blk, 0 AS n,
        |         (doc_id * 97 + blk * 1013) % 4096 - 2048 AS pred,
        |         (doc_id + blk * 7) % 89 AS idx
        |  FROM blocks
        |  UNION ALL
        |  SELECT doc_id, blk, n + 1,
        |         greatest(-32768, least(32767,
        |           CASE WHEN nib >= 8 THEN pred - diff ELSE pred + diff END)) AS pred,
        |         greatest(0, least(88, idx + adj)) AS idx
        |  FROM (
        |    SELECT doc_id, blk, n, pred, idx, nib,
        |           step // 8 + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
        |                     + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
        |                     + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END AS diff,
        |           adj
        |    FROM (
        |      SELECT doc_id, blk, n, pred, idx,
        |             CASE WHEN n % 2 = 0 THEN byte % 16 ELSE byte // 16 END AS nib,
        |             steps[idx + 1] AS step,
        |             idxadj[(CASE WHEN n % 2 = 0 THEN byte % 16 ELSE byte // 16 END) + 1] AS adj
        |      FROM (
        |        SELECT w.doc_id, w.blk, w.n, w.pred, w.idx, t.steps, t.idxadj,
        |               (w.doc_id * 3 + (w.blk * 8 + w.n // 2) * 11) % 256 AS byte
        |        FROM walk w, tabs t WHERE w.n < 16)))),
        |ordered AS (
        |  SELECT doc_id, pred,
        |         lag(pred) OVER (PARTITION BY doc_id ORDER BY blk, n) AS prev
        |  FROM walk),
        |wavstats AS (
        |  SELECT doc_id, count(*) AS n, sum(pred) AS s,
        |         max(abs(pred)) AS peak,
        |         sum(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (pred < 0))
        |                  THEN 1 ELSE 0 END) AS zc
        |  FROM ordered GROUP BY doc_id),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'wav' AS format, true AS decoded,
        |       n::BIGINT AS n_samples,
        |       floor(s * 1000 / (n * 1.0))::BIGINT AS mean_milli,
        |       peak::BIGINT AS peak, zc::BIGINT AS zero_crossings
        |FROM wavstats
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_samples,
        |       floor(list_sum(b) * 1000 / 17.0)::BIGINT AS mean_milli,
        |       list_max(b)::BIGINT AS peak,
        |       0::BIGINT AS zero_crossings
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // gray resample: output index j samples logical pixel (2(j//8),
    // 2(j%8)) -> source index (j//8)*32 + (j%8)*2 of the planted
    // stream; endian/PackBits/WhiteIsZero/strips all normalize away
    "m_media_pixels_tiff" ->
      """WITH tp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 63),
        |           j -> (doc_id * 5 + ((j // 8) * 32 + (j % 8) * 2) * 17) % 256) AS q
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'tiff' AS format, true AS decoded,
        |       8::BIGINT AS out_w, 8::BIGINT AS out_h,
        |       64::BIGINT AS n_vals,
        |       ((list_sum(q) * 1000) // 64)::BIGINT AS mean_milli,
        |       len(list_distinct(q))::BIGINT AS distinct_vals,
        |       list_max(q)::BIGINT AS max_val
        |FROM tp
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       0::BIGINT, 0::BIGINT, 17::BIGINT,
        |       ((list_sum(b) * 1000) // 17)::BIGINT,
        |       len(list_distinct(b))::BIGINT, list_max(b)::BIGINT
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // index-stream stats predicted from the planted arithmetic — LZW
    // is lossless, so the full 256-pixel pattern (not just flat
    // blocks) replays in SQL. Junk rows replay the 0x00+md5 blob.
    "m_media_pixels_gif" ->
      """WITH gp AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 255),
        |           i -> (doc_id * 11 + i * i * 13) % 256) AS p
        |  FROM documents WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, 'gif' AS format, true AS decoded,
        |       256::BIGINT AS n_vals,
        |       ((list_sum(p) * 1000) // 256)::BIGINT AS mean_milli,
        |       len(list_distinct(p))::BIGINT AS distinct_vals,
        |       list_max(p)::BIGINT AS max_val
        |FROM gp
        |UNION ALL
        |SELECT doc_id AS media_id, 'unknown' AS format, false AS decoded,
        |       17::BIGINT AS n_vals,
        |       ((list_sum(b) * 1000) // 17)::BIGINT AS mean_milli,
        |       len(list_distinct(b))::BIGINT AS distinct_vals,
        |       list_max(b)::BIGINT AS max_val
        |FROM junk
        |ORDER BY media_id""".stripMargin,

    // animated-GIF frames: the per-frame index pattern replays exactly
    // (LZW lossless); distinct_vals is absent from this surface (the
    // video schema), mean/max carry the per-frame signal
    "m_media_video_gif" ->
      """WITH fr AS (
        |  SELECT doc_id, j,
        |         list_transform(generate_series(0, 255),
        |           i -> (doc_id * 7 + j * 19 + i * i * 13) % 256) AS p
        |  FROM documents, (SELECT unnest(generate_series(0, 2)) AS j) js
        |  WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, j::BIGINT AS frame_no, 'gif' AS format,
        |       true AS decoded, 256::BIGINT AS n_vals,
        |       ((list_sum(p) * 1000) // 256)::BIGINT AS mean_milli,
        |       list_max(p)::BIGINT AS max_val
        |FROM fr
        |UNION ALL
        |SELECT doc_id AS media_id, 0::BIGINT AS frame_no, 'unknown' AS format,
        |       false AS decoded, 17::BIGINT AS n_vals,
        |       ((list_sum(b) * 1000) // 17)::BIGINT AS mean_milli,
        |       list_max(b)::BIGINT AS max_val
        |FROM junk
        |ORDER BY media_id, frame_no""".stripMargin,

    // per-frame pixel stats predicted from the (doc_id, frame, block)
    // arithmetic — three frames per doc, four flat blocks per frame,
    // exact under DC quant 8 like m_media_pixels_jpeg. Junk rows
    // collapse to a single frame_no=0 byte-stats row.
    "m_media_video" ->
      """WITH fr AS (
        |  SELECT doc_id, j,
        |         list_transform(generate_series(0, 3),
        |           b -> (doc_id * 13 + j * 37 + b * 29) % 256) AS bv
        |  FROM documents, (SELECT unnest(generate_series(0, 2)) AS j) js
        |  WHERE doc_id % 4 <> 3),
        |junk AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 16),
        |           i -> CASE WHEN i = 0 THEN 0
        |                     ELSE ('0x' || substr(upper(md5(text)), (i - 1) * 2 + 1, 2))::BIGINT END) AS b
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT doc_id AS media_id, j::BIGINT AS frame_no, 'mjpeg' AS format,
        |       true AS decoded, 256::BIGINT AS n_vals,
        |       ((list_sum(bv) * 64 * 1000) // 256)::BIGINT AS mean_milli,
        |       list_max(bv)::BIGINT AS max_val
        |FROM fr
        |UNION ALL
        |SELECT doc_id AS media_id, 0::BIGINT AS frame_no, 'unknown' AS format,
        |       false AS decoded, 17::BIGINT AS n_vals,
        |       ((list_sum(b) * 1000) // 17)::BIGINT AS mean_milli,
        |       list_max(b)::BIGINT AS max_val
        |FROM junk
        |ORDER BY media_id, frame_no""".stripMargin,

    // blob = unhex(md5(text)) is always 16 bytes; chunkBytes=4 -> chunks
    // 0..3, everyNth=2 keeps 0 and 2, each fully inside the blob -> len 4.
    "m_media_frames" ->
      """SELECT doc_id AS media_id, unnest([0::BIGINT, 2::BIGINT]) AS frame_no,
        |       4::BIGINT AS frame_len
        |FROM documents ORDER BY media_id, frame_no""".stripMargin,

    // same deterministic 6-word reflow as linedDocs; a non-blank line key
    // (lowercased, trimmed) in >1 docs is removed from every doc
    "d_dedup_lines" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, list_transform(generate_series(1, greatest(len(wd), 1), 6),
        |           i -> array_to_string(wd[i:i+5], ' ')) AS ls
        |  FROM w),
        |l AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS pos, ls FROM lined),
        |lx AS (SELECT doc_id, pos, ls[pos] AS ln, lower(trim(ls[pos])) AS key FROM l),
        |hot AS (
        |  SELECT key FROM (
        |    SELECT key, count(DISTINCT doc_id) AS df FROM lx WHERE key <> '' GROUP BY 1) z
        |  WHERE df > 1),
        |kept AS (
        |  SELECT doc_id, pos, ln FROM lx
        |  WHERE key = '' OR key NOT IN (SELECT key FROM hot)),
        |agg AS (
        |  SELECT doc_id, count(*) AS kept_lines,
        |         string_agg(ln, chr(10) ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT lined.doc_id, len(lined.ls)::BIGINT AS n_lines,
        |       coalesce(agg.kept_lines, 0)::BIGINT AS kept_lines,
        |       coalesce(agg.clean_text, '') AS clean_text
        |FROM lined LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    "t_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |lined0 AS (
        |  SELECT doc_id, list_transform(generate_series(1, greatest(len(wd), 1), 6),
        |           i -> array_to_string(wd[i:i+5], ' ')) AS ls0
        |  FROM w),
        |-- planted repetition: every 5th doc's first line appended again
        |txt AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |              THEN array_to_string(ls0, chr(10)) || chr(10) || ls0[1]
        |              ELSE array_to_string(ls0, chr(10)) END AS text
        |  FROM lined0),
        |base AS (
        |  SELECT doc_id, lw, ls, len(lw)::BIGINT AS nw, len(ls)::BIGINT AS nl,
        |         list_transform(generate_series(1, len(lw) - 1), i -> lw[i] || ' ' || lw[i+1]) AS bg
        |  FROM (SELECT doc_id,
        |               list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |               string_split(text, chr(10)) AS ls
        |        FROM txt) z),
        |wc AS (SELECT doc_id, tk, count(*) AS c
        |       FROM (SELECT doc_id, unnest(lw) AS tk FROM base) z GROUP BY 1, 2),
        |topw AS (SELECT doc_id, max(c) AS m FROM wc GROUP BY 1),
        |bc AS (SELECT doc_id, tk, count(*) AS c
        |       FROM (SELECT doc_id, unnest(bg) AS tk FROM base) z GROUP BY 1, 2),
        |topb AS (SELECT doc_id, max(c) AS m FROM bc GROUP BY 1)
        |SELECT base.doc_id, nw AS n_words,
        |       CASE WHEN nw <= 0 THEN 0.0
        |            ELSE round((nw - len(list_distinct(lw)))::DOUBLE / nw, 4) END AS dup_word_frac,
        |       CASE WHEN nw <= 0 THEN 0.0
        |            ELSE round(coalesce(topw.m, 0)::DOUBLE / nw, 4) END AS top_word_frac,
        |       CASE WHEN nw - 1 <= 0 THEN 0.0
        |            ELSE round(coalesce(topb.m, 0)::DOUBLE / (nw - 1), 4) END AS top_bigram_frac,
        |       CASE WHEN nl <= 0 THEN 0.0
        |            ELSE round((nl - len(list_distinct(ls)))::DOUBLE / nl, 4) END AS dup_line_frac
        |FROM base LEFT JOIN topw ON base.doc_id = topw.doc_id
        |          LEFT JOIN topb ON base.doc_id = topb.doc_id
        |ORDER BY base.doc_id""".stripMargin,

    "p_vocab" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |f AS (SELECT token, count(*) AS freq FROM t GROUP BY 1)
        |SELECT row_number() OVER (ORDER BY freq DESC, token ASC)::BIGINT AS rank, token, freq
        |FROM f ORDER BY freq DESC, token ASC LIMIT 100""".stripMargin,

    "p_bpe" -> bpeOracleSql(4),
    "p_bpe_encode" -> bpeOracleSql(4, encode = true),

    // seed-vocab trainer: all 2..4-char substrings of corpus words,
    // freq-weighted, scored freq x len, top 64 — pure aggregates
    "p_subword_vocab" ->
      ("WITH " + SubwordVocabCtes.stripMargin + "\n" +
        "SELECT rank, piece, freq, score FROM vocab ORDER BY rank"),

    // greedy longest-match replay: the recursive CTE walks each
    // DISTINCT word left to right, taking the longest (4->3->2) vocab
    // piece at the cursor via length-specific LEFT JOINs, single-char
    // fallback; per-doc counts fan back through one word join
    "p_maxmatch_encode" ->
      ("WITH RECURSIVE " + SubwordVocabCtes.stripMargin + ",\n" +
        """|v2 AS (SELECT piece FROM vocab WHERE len(piece) = 2),
           |v3 AS (SELECT piece FROM vocab WHERE len(piece) = 3),
           |v4 AS (SELECT piece FROM vocab WHERE len(piece) = 4),
           |wd AS (SELECT DISTINCT word FROM w),
           |seg AS (
           |  SELECT word, 1 AS pos, 0 AS n FROM wd
           |  UNION ALL
           |  SELECT s.word,
           |         s.pos + (CASE WHEN v4.piece IS NOT NULL THEN 4
           |                       WHEN v3.piece IS NOT NULL THEN 3
           |                       WHEN v2.piece IS NOT NULL THEN 2
           |                       ELSE 1 END),
           |         s.n + 1
           |  FROM seg s
           |  LEFT JOIN v4 ON v4.piece = substr(s.word, s.pos, 4)
           |  LEFT JOIN v3 ON v3.piece = substr(s.word, s.pos, 3)
           |  LEFT JOIN v2 ON v2.piece = substr(s.word, s.pos, 2)
           |  WHERE s.pos <= len(s.word)),
           |tok AS (SELECT word, n::BIGINT AS n_tok FROM seg WHERE pos > len(word)),
           |inst AS (
           |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word
           |  FROM documents),
           |perdoc AS (
           |  SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_tok)::BIGINT AS n_subwords
           |  FROM inst JOIN tok USING (word) GROUP BY 1)
           |SELECT d.doc_id, coalesce(n_words, 0)::BIGINT AS n_words,
           |       coalesce(n_subwords, 0)::BIGINT AS n_subwords
           |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin),

    // per-doc quality identical to the t_quality oracle; all sums exact ints
    "p_stats" ->
      """WITH w AS (
        |  SELECT doc_id, source, lang, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source, lang, len, np,
        |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS tokens,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w),
        |q AS (
        |  SELECT source, lang, tokens, len,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM f)
        |SELECT source, lang, count(*) AS n_docs, sum(tokens)::BIGINT AS total_tokens,
        |       sum(len)::BIGINT AS total_chars,
        |       round(sum(quality)::DOUBLE / count(*)::DOUBLE, 4) AS avg_quality
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // entirely LONG arithmetic: ppm shares by integer division, Gini
    // from Σ(share²) — no float, no aggregation-order sensitivity
    "p_label_balance" ->
      """WITH c AS (SELECT label, count(*)::BIGINT AS cnt FROM embeddings GROUP BY 1),
        |s AS (SELECT label, cnt,
        |             cnt * 1000000 // (SELECT sum(cnt) FROM c) AS share_ppm
        |      FROM c)
        |SELECT count(*)::BIGINT AS n_labels, sum(cnt)::BIGINT AS total,
        |       min(share_ppm)::BIGINT AS min_share_ppm,
        |       max(share_ppm)::BIGINT AS max_share_ppm,
        |       (1000000 - sum(share_ppm * share_ppm) // 1000000)::BIGINT AS gini_ppm
        |FROM s""".stripMargin,

    // the ¾ power replays as the SAME floor(sqrt(floor(sqrt(f·1e12))·f))
    // chain — sqrt is IEEE-exact on both engines, floors pin the rest
    "p_neg_sampling" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*)::BIGINT AS freq FROM t GROUP BY 1),
        |k AS (SELECT token, freq FROM c ORDER BY freq DESC, token LIMIT 50),
        |w AS (SELECT row_number() OVER (ORDER BY freq DESC, token ASC) AS rank,
        |             token, freq,
        |             CAST(floor(sqrt(floor(sqrt(freq::DOUBLE * 1000000000000.0)) * freq::DOUBLE)) AS BIGINT) AS w_milli
        |      FROM k)
        |SELECT rank::BIGINT AS rank, token, freq, w_milli,
        |       (w_milli * 1000000 // (SELECT sum(w_milli) FROM w))::BIGINT AS sample_ppm
        |FROM w ORDER BY rank""".stripMargin,

    // the p_shard rendezvous replay feeding a per-shard rollup; load
    // ppm = n·shards·1e6 // total on exact counts
    "p_shard_skew" ->
      """WITH h AS (
        |  SELECT doc_id, s, md5('shard:' || s || ':' || doc_id) AS h
        |  FROM documents, (SELECT unnest(generate_series(0, 15)) AS s) sh),
        |r AS (
        |  SELECT doc_id, s,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
        |  FROM h),
        |a AS (
        |  SELECT r.s::BIGINT AS shard, count(*)::BIGINT AS n_docs,
        |         sum(length(d.text))::BIGINT AS n_chars
        |  FROM r JOIN documents d USING (doc_id) WHERE rn = 1 GROUP BY 1)
        |SELECT shard, n_docs, n_chars,
        |       (n_docs * 16 * 1000000 // (SELECT sum(n_docs) FROM a))::BIGINT AS doc_load_ppm,
        |       (n_chars * 16 * 1000000 // (SELECT sum(n_chars) FROM a))::BIGINT AS char_load_ppm
        |FROM a ORDER BY shard""".stripMargin,

    // exact quantized means (floor(x*1e7 + 0.5) summed as BIGINT), so the
    // mean doubles are bit-identical to Spark's regardless of row order;
    // exploded (label, pos, mean, n) rows — pos is 0-based like posexplode
    "s_centroids" ->
      """SELECT label, i - 1 AS pos,
        |       sum(floor(embedding[i]::DOUBLE * 10000000.0 + 0.5))::BIGINT::DOUBLE
        |         / (count(*)::DOUBLE * 10000000.0) AS mean,
        |       count(*) AS n
        |FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    // replays the FULL k-means training: md5 init, argmax-cosine assign
    // (tie -> smaller cell), exact quantized means, 2 Lloyd rounds — then
    // within-cell exact cosine pairs
    "d_dedup_semantic" -> semanticOracleSql(
      """c0 AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('kmeans:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, 7)) AS c))""".stripMargin),

    // identical full-training replay, but k is PRICED from the corpus
    // count exactly like KMeansOps.autoCells:
    // k = least(65536, greatest(8, n // 256))
    // The init-cell series runs to 65535 — the FULL autoCells cap — so
    // the oracle replays any k the pick can produce (above ~1.05M
    // embeddings the pick passes 4096 cells; a shorter series would
    // silently train the oracle on fewer cells — round-5 ADVICE)
    "d_dedup_semantic_auto" -> semanticOracleSql(
      """pick AS (SELECT least(65536, greatest(8, count(*) // 256))::BIGINT AS k FROM embeddings),
        |c0 AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('kmeans:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM pick, (SELECT unnest(generate_series(0, 65535)) AS c) cc WHERE c < k)""".stripMargin),

    // two-level replay: same 2-round training at the query's tiny cap
    // (k = min(8, max(8, n // 32)) = 8 — the cap binds by design), then
    // count-priced per-cell subcell widths + md5 subplane sign bits
    "d_dedup_semantic_sharded" ->
      ("WITH " +
        """c0 AS (
          |  SELECT c, list_transform(generate_series(0, 63),
          |           d -> (('0x' || substr(md5('kmeans:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
          |  FROM (SELECT unnest(generate_series(0, 7)) AS c))""".stripMargin +
        ",\n" + (SemanticTrainCtes + ",\n" + semanticShardedTail(32L, 16)).stripMargin),

    // the s_ann_ivf oracle with the codebook REPLACED by the same 2-round
    // trained centroids as d_dedup_semantic (k=16, salt 'kmeans')
    "s_ann_ivf_trained" ->
      """WITH c0 AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('kmeans:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |s0 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c0),
        |a0 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s0) z WHERE rn = 1),
        |m1 AS (
        |  SELECT a0.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a0, embeddings e, dims WHERE a0.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c1m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m1 GROUP BY 1),
        |c1 AS (SELECT c0.c, coalesce(c1m.cv, c0.cv) AS cv FROM c0 LEFT JOIN c1m USING (c)),
        |s1 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c1),
        |a1 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s1) z WHERE rn = 1),
        |m2 AS (
        |  SELECT a1.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a1, embeddings e, dims WHERE a1.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c2m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m2 GROUP BY 1),
        |c2 AS (SELECT c1.c, coalesce(c2m.cv, c1.cv) AS cv FROM c1 LEFT JOIN c2m USING (c)),
        |s2 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c2),
        |ranked_cells AS (
        |  SELECT vec_id, c,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS crank
        |  FROM s2),
        |assign AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank = 1),
        |probes AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank <= 6 AND vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE p.vec_id <> a.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // replays PQ end-to-end: Forgy sub-codebook init (sub-slices of the
    // 32 lowest-id vectors), one Lloyd round per subquantizer
    // (argmin-L2² assignment, 1e-7-quantized exact means), corpus codes
    // under the trained books, each query's 1e-9-quantized integer
    // distance table, the ADC 50-candidate shortlist as an exact LONG
    // sum across subspaces (order-independent by design), and the
    // exact-cosine re-rank of the shortlist
    "s_ann_pq" ->
      """WITH subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
        |dims AS (SELECT unnest(generate_series(1, 8)) AS d),
        |seed AS (SELECT vec_id, embedding,
        |                row_number() OVER (ORDER BY vec_id) - 1 AS c
        |         FROM embeddings QUALIFY c < 32),
        |c0 AS (
        |  SELECT sub, seed.c,
        |         list(seed.embedding[sub*8 + d]::DOUBLE ORDER BY d) AS cv
        |  FROM subs, seed, dims GROUP BY 1, 2),
        |s0 AS (
        |  SELECT vec_id, sub, c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (embedding[sub*8 + i]::DOUBLE - cv[i]) * (embedding[sub*8 + i]::DOUBLE - cv[i]))) AS dist
        |  FROM embeddings, c0),
        |a0 AS (SELECT vec_id, sub, c AS cell FROM (
        |         SELECT vec_id, sub, c,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
        |         FROM s0) z WHERE rn = 1),
        |m1 AS (
        |  SELECT a0.sub, a0.cell, dims.d,
        |         sum(floor(e.embedding[a0.sub*8 + dims.d]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a0, embeddings e, dims WHERE a0.vec_id = e.vec_id
        |  GROUP BY 1, 2, 3),
        |c1m AS (SELECT sub, cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY d) AS cv
        |        FROM m1 GROUP BY 1, 2),
        |c1 AS (SELECT c0.sub, c0.c, coalesce(c1m.cv, c0.cv) AS cv
        |       FROM c0 LEFT JOIN c1m ON c0.sub = c1m.sub AND c0.c = c1m.c),
        |s1 AS (
        |  SELECT vec_id, sub, c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (embedding[sub*8 + i]::DOUBLE - cv[i]) * (embedding[sub*8 + i]::DOUBLE - cv[i]))) AS dist
        |  FROM embeddings, c1),
        |codes AS (SELECT vec_id, sub, c AS cell FROM (
        |            SELECT vec_id, sub, c,
        |                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
        |            FROM s1) z WHERE rn = 1),
        |qd AS (
        |  SELECT vec_id AS query_id, sub, c,
        |         floor(list_sum(list_transform(range(1, 9),
        |           i -> (embedding[sub*8 + i]::DOUBLE - cv[i]) * (embedding[sub*8 + i]::DOUBLE - cv[i])))
        |           * 1000000000.0 + 0.5)::BIGINT AS dq
        |  FROM embeddings, c1 WHERE vec_id < 5),
        |adc AS (
        |  SELECT qd.query_id, x.vec_id AS neighbor_id, sum(qd.dq)::BIGINT AS adist_q
        |  FROM codes x JOIN qd ON qd.sub = x.sub AND qd.c = x.cell
        |  WHERE x.vec_id <> qd.query_id
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY adist_q ASC, neighbor_id ASC) AS arn
        |    FROM adc) z WHERE arn <= 50),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM shortlist JOIN embeddings qe ON query_id = qe.vec_id
        |                 JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the s_ann_pq replay reduced to its id set, joined against the
    // exact top-5 — identical audit tail to s_recall_ivf/lsh
    "s_recall_pq" ->
      """WITH subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
        |dims AS (SELECT unnest(generate_series(1, 8)) AS d),
        |seed AS (SELECT vec_id, embedding,
        |                row_number() OVER (ORDER BY vec_id) - 1 AS c
        |         FROM embeddings QUALIFY c < 32),
        |c0 AS (
        |  SELECT sub, seed.c,
        |         list(seed.embedding[sub*8 + d]::DOUBLE ORDER BY d) AS cv
        |  FROM subs, seed, dims GROUP BY 1, 2),
        |s0 AS (
        |  SELECT vec_id, sub, c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (embedding[sub*8 + i]::DOUBLE - cv[i]) * (embedding[sub*8 + i]::DOUBLE - cv[i]))) AS dist
        |  FROM embeddings, c0),
        |a0 AS (SELECT vec_id, sub, c AS cell FROM (
        |         SELECT vec_id, sub, c,
        |                row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
        |         FROM s0) z WHERE rn = 1),
        |m1 AS (
        |  SELECT a0.sub, a0.cell, dims.d,
        |         sum(floor(e.embedding[a0.sub*8 + dims.d]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a0, embeddings e, dims WHERE a0.vec_id = e.vec_id
        |  GROUP BY 1, 2, 3),
        |c1m AS (SELECT sub, cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY d) AS cv
        |        FROM m1 GROUP BY 1, 2),
        |c1 AS (SELECT c0.sub, c0.c, coalesce(c1m.cv, c0.cv) AS cv
        |       FROM c0 LEFT JOIN c1m ON c0.sub = c1m.sub AND c0.c = c1m.c),
        |s1 AS (
        |  SELECT vec_id, sub, c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (embedding[sub*8 + i]::DOUBLE - cv[i]) * (embedding[sub*8 + i]::DOUBLE - cv[i]))) AS dist
        |  FROM embeddings, c1),
        |codes AS (SELECT vec_id, sub, c AS cell FROM (
        |            SELECT vec_id, sub, c,
        |                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, c ASC) AS rn
        |            FROM s1) z WHERE rn = 1),
        |qd AS (
        |  SELECT vec_id AS query_id, sub, c,
        |         floor(list_sum(list_transform(range(1, 9),
        |           i -> (embedding[sub*8 + i]::DOUBLE - cv[i]) * (embedding[sub*8 + i]::DOUBLE - cv[i])))
        |           * 1000000000.0 + 0.5)::BIGINT AS dq
        |  FROM embeddings, c1 WHERE vec_id < 5),
        |adc AS (
        |  SELECT qd.query_id, x.vec_id AS neighbor_id, sum(qd.dq)::BIGINT AS adist_q
        |  FROM codes x JOIN qd ON qd.sub = x.sub AND qd.c = x.cell
        |  WHERE x.vec_id <> qd.query_id
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY adist_q ASC, neighbor_id ASC) AS arn
        |    FROM adc) z WHERE arn <= 50),
        |rescored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM shortlist JOIN embeddings qe ON query_id = qe.vec_id
        |                 JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |pq AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM rescored) z WHERE rank <= 5),
        |qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |scored_b AS (
        |  SELECT query_id, ce.vec_id AS neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM qv, embeddings ce WHERE query_id <> ce.vec_id),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM scored_b) WHERE rank <= 5),
        |j AS (
        |  SELECT ex.query_id,
        |         (pq.neighbor_id IS NOT NULL)::INT AS hit
        |  FROM ex LEFT JOIN pq ON ex.query_id = pq.query_id
        |                       AND ex.neighbor_id = pq.neighbor_id)
        |SELECT query_id, count(*)::BIGINT AS k_exact, sum(hit)::BIGINT AS hits,
        |       ((sum(hit) * 1000000) // count(*))::BIGINT AS recall_ppm
        |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin,

    // IVF+PQ: the s_ann_ivf_trained coarse-quantizer replay composed
    // with the s_ann_pq sub-codebook replay — candidates are the IVF
    // probe set, ranked by the exact LONG ADC sum, re-ranked by exact
    // cosine (CTEs shared with s_label_knn_ivf_pq via ivfPqOracle)
    // OPQ: pinned-literal rotation + the s_ann_pq replay on the
    // rotated column; re-rank on original embeddings
    "s_ann_opq" -> opqOracleSql(recall = false),

    "s_recall_opq" -> opqOracleSql(recall = true),

    "s_ann_ivf_pq" -> ivfPqOracle(5,
      """SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // the same coarse chain (on originals) + the PQ chain on the
    // rotated column (the s_ann_opq literals), exactly ivfOpqTopK
    "s_ann_ivf_opq" -> ivfPqOracle(5,
      """SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      rotated = true),

    "s_recall_ivf_opq" -> ivfPqOracle(5, ivfAuditTail, rotated = true),

    "s_label_knn_ivf_pq" -> ivfPqOracle(25,
      """, votes AS (
        |  SELECT query_id, e.label, count(*) AS votes
        |  FROM ranked JOIN embeddings e ON neighbor_id = e.vec_id
        |  WHERE rank <= 5 GROUP BY 1, 2),
        |best AS (SELECT query_id, label, votes,
        |                row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
        |         FROM votes)
        |SELECT query_id, label AS predicted_label, votes
        |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin),

    // HUGEINT-vs-BIGINT: DuckDB sums promote to int128, so every summed
    // column casts back before comparing/dividing (the m_media_features
    // lesson); the milli mean mirrors Spark's long*1000/long -> double
    // division -> floor
    "t_rarity" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |freq AS (SELECT token, count(*) AS freq FROM inst GROUP BY 1),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_words,
        |         sum(CASE WHEN freq < 20 THEN 1 ELSE 0 END)::BIGINT AS rare_words,
        |         sum(freq)::BIGINT AS freq_sum
        |  FROM inst JOIN freq USING (token) GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(n_words, 0)::BIGINT AS n_words,
        |       coalesce(rare_words, 0)::BIGINT AS rare_words,
        |       CASE WHEN coalesce(n_words, 0) = 0 THEN 0.0
        |            ELSE round(rare_words::DOUBLE / n_words, 4) END AS rare_frac,
        |       coalesce(floor(freq_sum * 1000 / n_words), 0)::BIGINT AS mean_freq_milli
        |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "t_perplexity" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |freq AS (SELECT token, count(*) AS freq FROM inst GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS n FROM inst),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_tokens, avg(ln(freq::DOUBLE)) AS mlf
        |  FROM inst JOIN freq USING (token) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |       coalesce(round(ln((SELECT n FROM tot)) - mlf, 4), 0.0) AS avg_nll
        |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "t_postings" ->
      """WITH post AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |    FROM documents) q),
        |df AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
        |r AS (
        |  SELECT token, doc_id,
        |         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rank
        |  FROM post)
        |SELECT token, df, rank::BIGINT AS rank, doc_id
        |FROM r JOIN df USING (token)
        |WHERE rank <= 5 AND df >= 20
        |ORDER BY token, rank""".stripMargin,

    "t_dsir" ->
      """WITH ri AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents WHERE doc_id >= 50),
        |rc AS (SELECT w, count(*) AS cr FROM ri GROUP BY 1),
        |tc AS (
        |  SELECT w, count(*) AS ct FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |    FROM documents WHERE doc_id < 50) q GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM rc) AS nr,
        |         (SELECT count(*) FROM rc) AS v,
        |         (SELECT coalesce(CAST(sum(ct) AS BIGINT), 0) FROM tc) AS nt),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         sum(ln(coalesce(ct, 0)::DOUBLE + 1.0) - ln(cr::DOUBLE + 1.0)) AS s
        |  FROM ri JOIN rc USING (w) LEFT JOIN tc USING (w) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |       coalesce(round(s + n_tokens::DOUBLE *
        |         (ln(nr::DOUBLE + v::DOUBLE) - ln(nt::DOUBLE + v::DOUBLE)), 4), 0.0) AS log_weight
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
        |LEFT JOIN perdoc USING (doc_id) CROSS JOIN tot
        |ORDER BY d.doc_id""".stripMargin,

    "t_quality_rank" ->
      """WITH w AS (
        |  SELECT doc_id, lang, text,
        |         length(text)::BIGINT AS len,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS lw,
        |         (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::BIGINT AS np
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang, len, np,
        |    len(lw)::BIGINT AS nw,
        |    len(list_filter(lw, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))::BIGINT AS ns
        |  FROM w),
        |q AS (
        |  SELECT doc_id, lang,
        |       (400 * least(len, 500)) // 500
        |     + CASE WHEN nw = 0 THEN 0 ELSE (300 * least(ns * 5, nw)) // nw END
        |     + CASE WHEN len = 0 THEN 0 ELSE (300 * greatest(len - np * 5, 0)) // len END AS quality
        |  FROM f),
        |r AS (
        |  SELECT lang, doc_id, quality,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY quality DESC, doc_id ASC) AS rank,
        |         count(*) OVER (PARTITION BY lang) AS n_group
        |  FROM q)
        |SELECT lang, doc_id, quality, rank::BIGINT AS rank, n_group::BIGINT AS n_group
        |FROM r WHERE rank * 1000 <= n_group * 100
        |ORDER BY lang, rank""".stripMargin,

    "t_perplexity2" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM w, LATERAL unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2),
        |pre AS (SELECT w1, count(*) AS c1 FROM inst GROUP BY 1),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         avg(ln(c1::DOUBLE) - ln(c12::DOUBLE)) AS nll
        |  FROM inst JOIN big USING (w1, w2) JOIN pre USING (w1) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
        |       coalesce(round(nll, 4), 0.0) AS avg_nll
        |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // exact rational Fano: (N·S2 − tf²)·1000 // (N·tf) over per-doc
    // counts with zeros implicit in the N term
    "t_burstiness" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |tc AS (SELECT doc_id, w, count(*) AS c FROM inst GROUP BY 1, 2),
        |t AS (SELECT w, sum(c)::BIGINT AS tf, count(*)::BIGINT AS df,
        |             sum(c * c)::BIGINT AS s2
        |      FROM tc GROUP BY 1),
        |r AS (SELECT w, tf, df, s2,
        |             row_number() OVER (ORDER BY tf DESC, w ASC) AS rank
        |      FROM t)
        |SELECT rank::BIGINT AS rank, w AS term, tf, df,
        |       ((n_docs * s2 - tf * tf) * 1000 // (n_docs * tf))::BIGINT AS fano_milli
        |FROM r, n WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // exact spectrum sums: S2 = Σ c² per doc; K undefined below 2 tokens
    "t_yule_k" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |tc AS (SELECT doc_id, w, count(*) AS c FROM inst GROUP BY 1, 2),
        |perdoc AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |         sum(c * c)::BIGINT AS s2
        |  FROM tc GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |       coalesce(n_types, 0)::BIGINT AS n_types,
        |       coalesce(CASE WHEN n_tokens >= 2
        |                     THEN (10000000 * (s2 - n_tokens)) // (n_tokens * n_tokens) END,
        |                0)::BIGINT AS yule_k_milli
        |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Kneser-Ney replay: one bigram-count CTE feeds the discounted MLE
    // term and both continuation statistics; the P expression is the
    // same double chain as the Spark column, term for term
    "t_kn_score" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM w, LATERAL unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2),
        |lft AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*) AS n1f FROM big GROUP BY 1),
        |cont AS (SELECT w2, count(*) AS n1p FROM big GROUP BY 1),
        |tt AS (SELECT count(*) AS tt FROM big),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         avg(-ln(
        |           greatest(c12::DOUBLE - 0.75, 0.0) / c1::DOUBLE +
        |           0.75 * n1f::DOUBLE / c1::DOUBLE * (n1p::DOUBLE / tt::DOUBLE))) AS nll
        |  FROM inst JOIN big USING (w1, w2) JOIN lft USING (w1)
        |            JOIN cont USING (w2), tt
        |  GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
        |       coalesce(round(nll, 4), 0.0) AS avg_nll
        |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // the factored entropy form (log2 n - sum(c*ln c)/n/ln 2) keeps the
    // double chain identical on both engines; ln(2) and math.log(2.0)
    // are the same IEEE double
    "t_entropy" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |cnt AS (SELECT doc_id, token, count(*) AS c FROM inst GROUP BY 1, 2),
        |perdoc AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
        |         ln(sum(c)::DOUBLE)/ln(2) - sum(c::DOUBLE * ln(c::DOUBLE))/sum(c)::DOUBLE/ln(2) AS h
        |  FROM cnt GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |       coalesce(n_distinct, 0)::BIGINT AS n_distinct,
        |       coalesce(round(h, 4), 0.0) AS entropy,
        |       coalesce(CASE WHEN n_distinct > 1
        |                     THEN round(h / (ln(n_distinct::DOUBLE)/ln(2)), 4)
        |                     ELSE 0.0 END, 0.0) AS norm_entropy
        |FROM documents d LEFT JOIN perdoc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "t_novelty" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS wd
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
        |         ELSE list_transform(generate_series(1, len(wd) - 2),
        |                             i -> array_to_string(wd[i:i+2], ' ')) END)) AS sh
        |  FROM w),
        |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, count(*) AS n_shingles, sum((df.df = 1)::INT)::BIGINT AS n_unique,
        |       round(sum((df.df = 1)::INT)::DOUBLE / count(*), 4) AS novelty
        |FROM sh JOIN df USING (sh) GROUP BY 1 ORDER BY 1""".stripMargin,

    // replays the quantized-LONG covariance sums exactly: per-component
    // floor(x*1e7+0.5) and per-product floor(x_i*x_j*1e9+0.5) LONGS,
    // then the identical double chain for E[xy] - E[x]E[y]
    "s_covariance" ->
      """WITH inst AS (
        |  SELECT vec_id, i, embedding[i + 1]::DOUBLE AS x
        |  FROM embeddings, unnest(generate_series(0, 63)) AS t(i)),
        |p AS (
        |  SELECT a.i AS i, b.i AS j, count(*) AS n,
        |         sum(CAST(floor(a.x * b.x * 1000000000.0 + 0.5) AS BIGINT)) AS s2
        |  FROM inst a JOIN inst b ON a.vec_id = b.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2),
        |s1 AS (SELECT i, sum(CAST(floor(x * 10000000.0 + 0.5) AS BIGINT)) AS s
        |       FROM inst GROUP BY 1)
        |SELECT p.i::BIGINT AS i, p.j::BIGINT AS j, p.n,
        |       round((p.s2::DOUBLE / 1000000000.0) / p.n::DOUBLE
        |             - (a.s::DOUBLE / 10000000.0 / p.n::DOUBLE)
        |             * (b.s::DOUBLE / 10000000.0 / p.n::DOUBLE), 8) AS cov
        |FROM p JOIN s1 a ON p.i = a.i JOIN s1 b ON p.j = b.i
        |ORDER BY p.i, p.j""".stripMargin,

    "s_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, i AS pos, embedding[i + 1]::DOUBLE AS x
        |  FROM embeddings, unnest(generate_series(0, 63)) AS t(i)),
        |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1)
        |SELECT vec_id, pos::BIGINT AS pos,
        |       CASE WHEN mx > mn
        |            THEN CAST(least(255.0, floor((x - mn) * 255.0 / (mx - mn) + 0.5)) AS BIGINT)
        |            ELSE 0 END AS code
        |FROM e JOIN st USING (pos)
        |ORDER BY vec_id, pos""".stripMargin,

    "t_topterms" ->
      """WITH inst AS (
        |  SELECT lang,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS cnt FROM inst GROUP BY 1, 2),
        |r AS (SELECT lang, token, cnt,
        |             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rank
        |      FROM c)
        |SELECT lang, rank::BIGINT AS rank, token, cnt
        |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "t_tfidf" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM inst GROUP BY 1, 2),
        |dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM inst GROUP BY 1),
        |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
        |         CAST(floor(tf.tf::DOUBLE * ln((SELECT n_docs FROM nd) / dfq.df::DOUBLE)
        |              * 1000000.0) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfq USING (token)),
        |r AS (SELECT doc_id, token, tf, df, score_micro,
        |             row_number() OVER (PARTITION BY doc_id
        |                                ORDER BY score_micro DESC, token ASC) AS rank
        |      FROM s)
        |SELECT doc_id, rank::BIGINT AS rank, token, tf, df, score_micro
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // the SAME fixed-association float chain as the Spark plan —
    // ln((N−df+0.5)/(df+0.5)) · (tf·2.2)/(tf + 1.2·(0.25 +
    // 0.75·(dl·N)/Σdl)) · 1e6, floored per term — then exact LONG
    // sums; identical integer tuples quantize identically
    "t_bm25" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |lens AS (SELECT doc_id, len(ws)::BIGINT AS dl FROM ws),
        |corpus AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM lens),
        |inst AS (
        |  SELECT w.doc_id, l.dl, unnest(w.ws) AS token
        |  FROM ws w JOIN lens l USING (doc_id)),
        |tf AS (
        |  SELECT doc_id, token, count(*)::BIGINT AS tf, any_value(dl) AS dl
        |  FROM inst WHERE token IN ('spark', 'vector', 'customer', 'stream')
        |  GROUP BY 1, 2),
        |dfq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id,
        |         CAST(floor(
        |           ln((c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |             ((tf.tf * 2.2) /
        |               (tf.tf + 1.2 * (0.25 + 0.75 * (tf.dl * c.n_docs) / c.sum_dl))) *
        |             1000000.0) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfq USING (token), corpus c),
        |byd AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_terms, sum(score_micro)::BIGINT AS score_micro
        |  FROM s GROUP BY 1),
        |top AS (SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
        |        FROM byd)
        |SELECT rank::BIGINT AS rank, doc_id, n_terms, score_micro
        |FROM top WHERE rank <= 25 ORDER BY rank""".stripMargin,

    // md5-head hash replay: dim = h mod 64, sign from the next hash
    // bit via exact integer division — all-LONG output
    "t_hash_embed" ->
      """WITH inst AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv FROM inst)
        |SELECT doc_id, (hv % 64)::BIGINT AS dim,
        |       sum(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS val
        |FROM h GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin,

    // aligned dual-group regexp extraction (DuckDB zips same-select
    // unnests positionally, like arrays_zip), then the host/term fold
    "t_anchors" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 <> 0
        |              THEN text || ' <a href="https://h' || (doc_id % 7)
        |                   || '.example.net/p">' || substr(text, 1, 20) || '</a>'
        |              ELSE text END AS text
        |  FROM documents),
        |a AS (
        |  SELECT unnest(regexp_extract_all(text,
        |           '<a href="(https?://[^"/]+)[^"]*"[^>]*>([^<]*)</a>', 1)) AS href,
        |         unnest(regexp_extract_all(text,
        |           '<a href="(https?://[^"/]+)[^"]*"[^>]*>([^<]*)</a>', 2)) AS body
        |  FROM planted),
        |t AS (
        |  SELECT regexp_extract(href, '^https?://([^/\s:?#]+)', 1) AS host,
        |         unnest(list_filter(regexp_split_to_array(lower(body), '\s+'), x -> x <> '')) AS term
        |  FROM a)
        |SELECT host, term, count(*)::BIGINT AS cnt
        |FROM t WHERE host <> ''
        |GROUP BY 1, 2 ORDER BY host, term""".stripMargin,

    // q17's unrolled integer-PageRank rounds over the planted
    // doc<->host bipartite graph; only host nodes report
    "q39_host_rank" -> {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.node,
           |         (3 * (SELECT base FROM params)) // 20
           |         + (17 * coalesce(c.s, 0)) // 20 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
           |    FROM edges e JOIN $prev p ON p.node = e.src
           |                 JOIN deg d ON d.node = e.src
           |    GROUP BY 1) c ON c.node = n.node)""".stripMargin
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         text || ' https://h' || (doc_id % 23) || '.example.net/p http://h'
         |              || ((doc_id // 3) % 23) || '.example.net/q' AS text
         |  FROM documents),
         |hosts AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |           regexp_extract_all(text, 'https?://[^\\s]+'),
         |           u -> regexp_extract(u, '^https?://([^/\\s:?#]+)', 1)))) AS host
         |  FROM planted),
         |fwd AS (SELECT DISTINCT 'd' || doc_id AS src, 'h' || host AS dst
         |        FROM hosts WHERE host <> ''),
         |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |params AS (SELECT 1000000000 // count(*) AS base FROM nodes),
         |it0 AS (SELECT node, (SELECT base FROM params) AS pr FROM nodes),
         |${round("it0", "it1")},
         |${round("it1", "it2")},
         |${round("it2", "it3")}
         |SELECT node, pr FROM it3 WHERE node LIKE 'hh%' ORDER BY node""".stripMargin
    },

    // PMI as the SAME left-associated ln chain Spark evaluates, on
    // exact integer counts, quantized to 1e-6 LONGS before ranking
    "t_pmi" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |       FROM tok, unnest(range(1, len(ts))) AS t(i)),
        |uni AS (
        |  SELECT unnest(ts) AS w FROM tok),
        |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
        |n1 AS (SELECT count(*)::BIGINT AS n_uni FROM uni),
        |n2 AS (SELECT count(*)::BIGINT AS n_bi FROM bg),
        |pairs AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
        |s AS (
        |  SELECT p.w1, p.w2, p.c12, u1.c AS c1, u2.c AS c2,
        |         CAST(floor((ln(p.c12::DOUBLE) + ln((SELECT n_uni FROM n1)::DOUBLE)
        |                     + ln((SELECT n_uni FROM n1)::DOUBLE)
        |                     - ln((SELECT n_bi FROM n2)::DOUBLE)
        |                     - ln(u1.c::DOUBLE) - ln(u2.c::DOUBLE))
        |              * 1000000.0) AS BIGINT) AS pmi_micro
        |  FROM pairs p
        |  JOIN uc u1 ON p.w1 = u1.w
        |  JOIN uc u2 ON p.w2 = u2.w),
        |r AS (SELECT *, row_number() OVER (ORDER BY pmi_micro DESC, w1 ASC, w2 ASC) AS rank
        |      FROM s)
        |SELECT rank::BIGINT AS rank, w1, w2, c12, c1, c2, pmi_micro
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // u = (h+1)/2^60 with the +1 in INTEGER space (one int64->double
    // rounding on both engines); the ln(u)/w key quantizes to a BIGINT
    // before ranking so a last-ulp ln() difference cannot reorder
    "p_sample_weighted" ->
      """WITH w AS (
        |  SELECT lang, doc_id, greatest(length(text), 1)::DOUBLE AS weight,
        |         (('0x' || substr(md5('wsample:' || doc_id), 1, 15))::BIGINT + 1)
        |           / 1152921504606846976.0 AS u
        |  FROM documents),
        |k AS (SELECT lang, doc_id, weight,
        |             CAST(floor(ln(u) / weight * 1000000000000.0) AS BIGINT) AS wkey
        |      FROM w WHERE weight > 0),
        |r AS (SELECT lang, doc_id, weight, wkey,
        |             row_number() OVER (PARTITION BY lang ORDER BY wkey DESC, doc_id ASC) AS rank
        |      FROM k)
        |SELECT lang, rank::BIGINT AS rank, doc_id, weight, wkey
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,

    "s_label_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 25),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id, label,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))), 6) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, label,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored),
        |votes AS (SELECT query_id, label, count(*) AS votes
        |          FROM ranked WHERE rank <= 5 GROUP BY 1, 2),
        |best AS (SELECT query_id, label, votes,
        |                row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
        |         FROM votes)
        |SELECT query_id, label AS predicted_label, votes
        |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin,

    // the s_ann_lsh candidate/re-rank chain (same planes, bands, cosine)
    // composed with s_label_knn's voting tail — pins knnClassify's "lsh"
    // strategy end-to-end
    "s_label_knn_lsh" ->
      """WITH planes AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('plane:' || b || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS pl
        |  FROM (SELECT unnest(generate_series(0, 23)) AS b)),
        |sig AS (
        |  SELECT vec_id,
        |         sum(CASE WHEN list_sum(list_transform(range(1, 65),
        |               i -> pl[i] * embedding[i]::DOUBLE)) > 0
        |             THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings, planes GROUP BY 1),
        |banded AS (
        |  SELECT vec_id, band, (sig >> (band * 3)) & 7 AS bandval
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bb),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM banded q JOIN banded c ON q.band = c.band AND q.bandval = c.bandval
        |  WHERE q.vec_id < 25 AND q.vec_id <> c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, e.label, count(*) AS votes
        |  FROM ranked JOIN embeddings e ON neighbor_id = e.vec_id
        |  WHERE rank <= 5 GROUP BY 1, 2),
        |best AS (SELECT query_id, label, votes,
        |                row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
        |         FROM votes)
        |SELECT query_id, label AS predicted_label, votes
        |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin,

    // the s_ann_ivf_trained probe chain (2 Lloyd rounds, quantized means)
    // composed with the same voting tail — pins the "ivf-trained" strategy
    "s_label_knn_ivf_trained" ->
      """WITH c0 AS (
        |  SELECT c, list_transform(generate_series(0, 63),
        |           d -> (('0x' || substr(md5('kmeans:' || c || ':' || d), 1, 8))::BIGINT / 2147483648.0) - 1) AS cv
        |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |s0 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c0),
        |a0 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s0) z WHERE rn = 1),
        |m1 AS (
        |  SELECT a0.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a0, embeddings e, dims WHERE a0.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c1m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m1 GROUP BY 1),
        |c1 AS (SELECT c0.c, coalesce(c1m.cv, c0.cv) AS cv FROM c0 LEFT JOIN c1m USING (c)),
        |s1 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c1),
        |a1 AS (SELECT vec_id, c AS cell FROM (
        |         SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
        |         FROM s1) z WHERE rn = 1),
        |m2 AS (
        |  SELECT a1.cell, dims.i,
        |         sum(floor(e.embedding[dims.i]::DOUBLE * 10000000.0 + 0.5))::BIGINT AS sq,
        |         count(*) AS n
        |  FROM a1, embeddings e, dims WHERE a1.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |c2m AS (SELECT cell AS c, list(sq::DOUBLE / (n::DOUBLE * 10000000.0) ORDER BY i) AS cv
        |        FROM m2 GROUP BY 1),
        |c2 AS (SELECT c1.c, coalesce(c2m.cv, c1.cv) AS cv FROM c1 LEFT JOIN c2m USING (c)),
        |s2 AS (
        |  SELECT vec_id, c,
        |         list_sum(list_transform(range(1, 65), i -> cv[i] * embedding[i]::DOUBLE)) /
        |         (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
        |          sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS s
        |  FROM embeddings, c2),
        |ranked_cells AS (
        |  SELECT vec_id, c,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS crank
        |  FROM s2),
        |assign AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank = 1),
        |probes AS (SELECT vec_id, c AS cell FROM ranked_cells WHERE crank <= 6 AND vec_id < 25),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON p.cell = a.cell
        |  WHERE p.vec_id <> a.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(
        |           list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
        |           (sqrt(list_sum(list_transform(range(1, 65), i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))) *
        |            sqrt(list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)))), 6) AS sim
        |  FROM cand JOIN embeddings qe ON query_id = qe.vec_id
        |            JOIN embeddings ce ON neighbor_id = ce.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, e.label, count(*) AS votes
        |  FROM ranked JOIN embeddings e ON neighbor_id = e.vec_id
        |  WHERE rank <= 5 GROUP BY 1, 2),
        |best AS (SELECT query_id, label, votes,
        |                row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
        |         FROM votes)
        |SELECT query_id, label AS predicted_label, votes
        |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin,

    "p_epochs" ->
      """WITH r(lang, repeats) AS (VALUES ('zh', 3), ('fr', 2))
        |SELECT doc_id, d.lang,
        |       unnest(generate_series(1, coalesce(r.repeats, 1)))::BIGINT AS epoch
        |FROM documents d LEFT JOIN r ON d.lang = r.lang
        |ORDER BY doc_id, epoch""".stripMargin
  )
}

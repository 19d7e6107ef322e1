package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs every SparkEntry query against
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall times.
 * The same line is also written to SPARK_GRAFT_BENCH_OUT (default
 * bench_out.json in the cwd) so the result survives any log wrapping of
 * stdout by the build tool.
 *
 * Timing methodology: one untimed warmup action first (JIT + codegen +
 * session init would otherwise land on the first query), then each query
 * is fully materialized through the noop sink — count() would let column
 * pruning skip most of the scan work for non-aggregating queries.
 * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 2) and reports
 * the per-query MINIMUM — steady-state throughput, robust to transient
 * I/O or scheduler noise on shared hosts (a single noisy run was
 * observed to inflate an untouched 1 s scan query to 17 s).
 *
 * ADAPTIVE re-runs: when the observed runs for a query still disagree by
 * more than 1.5x (max/min), the measurement is noise-dominated and extra
 * runs are taken until they agree or SPARK_GRAFT_BENCH_MAX_RUNS (default
 * 4) is reached. Identical code has measured 2.06/5.08/2.05 s across
 * three sessions on sub-5 s rows — without the adaptive pass the
 * round-over-round comparison carries ±50% noise on exactly the rows a
 * regression would first show up in. Min-of-agreeing-runs keeps the
 * reported number isolated-run-equivalent.
 *
 * A failing query is NOT silently timed as ~0 s: it is reported in a
 * "failed" list, its time excluded from the total, and the process exits
 * non-zero so a broken query can never inflate the round's apparent speed.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 only reads it as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: session init, codegen, and parquet footer reads for every
    // base table (a count reads footers/metadata, not the data pages —
    // real column scans stay inside the timed queries)
    try {
      materialize(SparkEntry.queries("q1_agg")(spark, sfDir))
      for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings"))
        spark.read.parquet(s"$sfDir/$t.parquet").count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // SPARK_GRAFT_BENCH_ONLY=q1_agg,s_ann_lsh limits the run to named
    // queries — an iteration aid; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val maxRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "4").toInt.max(runs)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        val r =
          try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] QUERY FAILED $name: $e")
              None
          }
        // release operator-pinned checkpoint blocks between queries
        // (graft.core.Blocks ownership convention) — without this a
        // long multi-query session accumulates block-manager state and
        // late queries time up to ~3x slower than isolated runs
        graft.core.Blocks.releaseAll(spark)
        r
      }
      var attempts = 0
      var times = Vector.empty[Double]
      var anyFailed = false
      while (attempts < runs ||
             (!anyFailed && attempts < maxRuns && times.nonEmpty &&
              times.max / times.min > 1.5)) {
        attempts += 1
        once() match {
          case Some(t) => times :+= t
          case None    => anyFailed = true
        }
      }
      // a query that failed ANY run is reported failed — retries may not
      // hide flakiness
      (name, if (times.isEmpty) 0.0 else times.min, !anyFailed && times.nonEmpty)
    }
    val passed = results.filter(_._3)
    val failed = results.filterNot(_._3).map(_._1)
    val qs = passed.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = passed.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs every SparkEntry query against
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall times.
 *
 * Timing methodology: one untimed warmup action first (JIT + codegen +
 * session init would otherwise land on the first query), then each query
 * is fully materialized through the noop sink — count() would let column
 * pruning skip most of the scan work for non-aggregating queries.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    // warmup: session init, codegen, parquet footer reads
    try materialize(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PqOps

/** A/B harness: ADC recall@5 vs the exact L2 scan across PQ (m, k)
  * configurations, to price the default code geometry. Run:
  * sbt "runMain graft.tools.PqRecallAB [sfDir]" */
object PqRecallAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val normUdf = udf { (v: Seq[Float]) =>
      val ss = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      val n = math.sqrt(ss)
      if (n == 0.0) v.map(_ => 0.0f) else v.map(x => (x / n).toFloat)
    }
    val e = if (args.contains("--norm"))
      raw.select(col("id"), normUdf(col("embedding")).as("embedding"))
    else raw
    val queries = e.filter(col("id") < 50)
    // exact L2 reference
    val q = queries.select(col("id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("id").as("neighbor_id"), col("embedding").as("cv"))
    val d = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dist", aggregate(zip_with(col("qv"), col("cv"),
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist").asc, col("neighbor_id").asc)
    val exact = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    for ((m, k, iters) <- Seq((4, 16, 1), (8, 32, 1), (8, 64, 1), (16, 16, 1))) {
      for (cand <- Seq(5, 25, 50, 100)) {
        val t0 = System.nanoTime()
        val approx = PqOps.pqTopK(queries, e, topk = cand, m = m, k = k, iters = iters)
          .select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val sec = (System.nanoTime() - t0) / 1e9
        val recalls = exact.keys.toSeq.map(qq => (approx(qq) & exact(qq)).size.toDouble / 5.0)
        println(f"m=$m%3d k=$k%4d iters=$iters C=$cand%4d  contain@5=${recalls.sum / recalls.length}%.3f  ${sec}%.1fs")
      }
    }
    spark.stop()
  }
}

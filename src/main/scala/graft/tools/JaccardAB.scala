package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/**
 * A/B harness for jaccardPairs plan variants. The shipped
 * implementation (DedupOps.jaccardPairs) is the grouped-pairs plan;
 * the legacy two-sided co-shingle self-join is kept here as the
 * baseline it was measured against (sf0.1, local[32]: ~11.6 s
 * steady-state vs ~5.0 s grouped — 2.3x).
 */
object JaccardAB {

  /** Legacy variant: two-sided equality self-join on the shingle hash. */
  def selfJoin(docs: DataFrame, idCol: String, textCol: String,
               minJaccard: Double, w: Int = 3, maxShingleDf: Long = 10000L): DataFrame = {
    val shAll = docs.select(col(idCol).as("id"),
      explode(DedupOps.shingles(col(textCol), w)).as("shs"))
      .select(col("id"), xxhash64(col("shs")).as("sh"))
    val rare = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf).select("sh")
    val sh = shAll.join(rare, Seq("sh"), "left_semi")
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup
    docs.select(TextOps.fingerprint(col("text"))).write.format("noop").mode("overwrite").save()

    time("legacy self-join")(selfJoin(docs, "doc_id", "text", 0.8))
    time("shipped grouped-pairs")(DedupOps.jaccardPairs(docs, "doc_id", "text", 0.8))
    time("legacy self-join again")(selfJoin(docs, "doc_id", "text", 0.8))
    time("shipped grouped-pairs again")(DedupOps.jaccardPairs(docs, "doc_id", "text", 0.8))

    val a = selfJoin(docs, "doc_id", "text", 0.8).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = DedupOps.jaccardPairs(docs, "doc_id", "text", 0.8).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"equal=${a == b} |pairs|=${a.size}")
    spark.stop()
  }
}

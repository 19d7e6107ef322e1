package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinhashSig

object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("scan partitions: " + docs.rdd.getNumPartitions)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("sig, native partitions")(
      docs.select(MinhashSig(col("text"), 16, 8, charGrams = true).as("mh"))
        .write.format("noop").mode("overwrite").save())
    time("sig, repartition 32")(
      docs.repartition(32).select(MinhashSig(col("text"), 16, 8, charGrams = true).as("mh"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

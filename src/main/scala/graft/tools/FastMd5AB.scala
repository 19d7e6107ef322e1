package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, FastHash}

/** A/B: built-in md5() (DigestUtils per-call getInstance) vs FastMd5
  * (thread-local digest) in the minhash signature aggregation. */
object FastMd5AB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def sig(md5Fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val mhCols = (0 until 16).map(s =>
        min(md5Fn(concat(lit(s.toString), lit(":"), col("sh")))).as(s"mh$s"))
      docs.select(col("doc_id").as("id"), explode(DedupOps.shingles(col("text"), 3)).as("sh"))
        .groupBy(col("id")).agg(mhCols.head, mhCols.tail: _*)
    }
    def sigSliced(md5Fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val hashCat = concat((0 until 4).map {
        case 0 => md5Fn(col("sh"))
        case i => md5Fn(concat(lit(s"$i:"), col("sh")))
      }: _*)
      val mhCols = (0 until 16).map(s =>
        min(substring(col("h"), s * 8 + 1, 8)).as(s"mh$s"))
      docs.select(col("doc_id").as("id"), explode(DedupOps.shingles(col("text"), 3)).as("sh"))
        .withColumn("h", hashCat)
        .groupBy(col("id")).agg(mhCols.head, mhCols.tail: _*)
    }
    for (_ <- 1 to 2) {
      time("builtin md5 sig") { sig(md5).write.format("noop").mode("overwrite").save() }
      time("fast md5 sig   ") { sig(FastHash.fastMd5).write.format("noop").mode("overwrite").save() }
      time("fast sliced sig") { sigSliced(FastHash.fastMd5).write.format("noop").mode("overwrite").save() }
    }
    // equality check
    val a = sig(md5).collect().map(_.toSeq).toSet
    val b = sig(FastHash.fastMd5).collect().map(_.toSeq).toSet
    println(s"identical: ${a == b}")
    spark.stop()
  }
}

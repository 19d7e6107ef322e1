package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

object EdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // two passes: pass 1 absorbs JIT/codegen warmup, pass 2 is the
    // steady-state stage decomposition (verify share = full − candidates
    // − prefilter, all warm)
    for (pass <- 1 to 2) {
      println(s"-- pass $pass --")
      val cand0 = time("minhashCandidates (char 8-gram)")(
        DedupOps.minhashCandidates(docs, "doc_id", "text", 16, 8, 8,
          charGrams = true, maxBucket = 64).localCheckpoint())
      println("  candidates: " + cand0.count())
      val lens = docs.select(col("doc_id").as("id"), length(col("text")).as("len"))
      val cand = time("length prefilter")(
        cand0.join(lens.select(col("id").as("id_a"), col("len").as("la")), "id_a")
          .join(lens.select(col("id").as("id_b"), col("len").as("lb")), "id_b")
          .filter(abs(col("la") - col("lb")) <= 80)
          .select("id_a", "id_b").localCheckpoint())
      println("  after length: " + cand.count())
      time("full operator")(
        println("  pairs: " + DedupOps.editDistancePairs(docs, "doc_id", "text", maxDist = 80).count()))
      graft.core.Blocks.releaseAll(spark)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{KMeansOps, PqOps, SimilarityOps}

/**
 * Train-vs-search decomposition for the IVF+PQ classify row
 * (`s_label_knn_ivf_pq`): the bench number is one scalar, but its two
 * halves scale differently — TRAINING (coarse k-means + m sub-codebook
 * k-means, each a fixed number of whole-corpus aggregate passes whose
 * result is a model-sized driver array) is an INDEX-BUILD cost paid
 * once per corpus snapshot and amortized over every query batch served
 * from it, while SEARCH (probe join + ADC + re-rank) is the recurring
 * per-batch cost. Two passes; read pass 2 (pass 1 absorbs JIT).
 */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"), col("label"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val passes = if (args.length > 1) args(1).toInt else 2
    for (pass <- 1 to passes) {
      println(s"-- pass $pass --")
      // the two training halves ivfPqTopK runs internally (same knobs
      // as the knnClassify("ivf-pq") defaults: ncells=16/coarseIters=2,
      // m=8/k=32/pqIters=1)
      time("coarse k-means train (ncells=16, 2 iters)")(
        KMeansOps.train(e, "embedding", 16, 2, 64))
      time("PQ sub-codebook train (m=8, k=32, 1 iter)")(
        PqOps.trainSubCodebooks(e, "id", "embedding", 8, 32, 8, 1))
      // the full row: training + index projection + probe/ADC/re-rank +
      // label vote — search share = full − the two train times above
      time("ivfPqTopK only (train + index + probe/ADC/re-rank)")(
        PqOps.ivfPqTopK(e.filter(col("id") < 25).select("id", "embedding"),
          e.select("id", "embedding"), 5).count())
      time("full s_label_knn_ivf_pq (train + search + vote)")(
        SimilarityOps.knnClassify(e.filter(col("id") < 25), e, k = 5,
          strategy = "ivf-pq").count())
      graft.core.Blocks.releaseAll(spark)
      val rt = Runtime.getRuntime
      println(s"  [state] persistentRDDs=${spark.sparkContext.getPersistentRDDs.size} " +
        s"heapUsedMB=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}")
    }
    spark.stop()
  }
}

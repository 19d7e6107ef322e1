package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{PqOps, SimilarityOps}

/** A/B harness: recall@5 of raw PQ vs OPQ (rotated PQ) at identical
  * geometry, across query-set sizes — the evidence row behind the
  * opq >= pq spec pin. Run:
  * sbt "runMain graft.tools.OpqRecallAB [sfDir]" */
object OpqRecallAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    for (nq <- Seq(5, 25, 50)) {
      val queries = e.filter(col("id") < nq)
      val brute = SimilarityOps.bruteForceTopK(queries, e, k = 5)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val rs = brute.keys.toSeq.map(q => (got(q) & brute(q)).size.toDouble / 5.0)
        rs.sum / rs.length
      }
      val pq = recallOf(PqOps.pqTopK(queries, e, topk = 5, m = 8, k = 32, iters = 1, cand = 50))
      val opq = recallOf(PqOps.opqTopK(queries, e, topk = 5, m = 8, k = 32, iters = 1, cand = 50, opqIters = 3))
      val ivfPq = recallOf(PqOps.ivfPqTopK(queries, e, topk = 5))
      val ivfOpq = recallOf(PqOps.ivfOpqTopK(queries, e, topk = 5))
      println(f"nq=$nq%3d  pq=$pq%.3f  opq=$opq%.3f  delta=${opq - pq}%+.3f  ivfpq=$ivfPq%.3f  ivfopq=$ivfOpq%.3f  delta=${ivfOpq - ivfPq}%+.3f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KMeansOps, SimilarityOps, TextOps}

/** Stage-by-stage timing of the k-means family and repetition signals at
  * sf0.1 — locates the bottleneck behind the round-4 bench regressions
  * (not shipped API). */
object KMeansAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    println(s"embeddings rows: ${e.count()}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"documents rows: ${docs.count()}")
    materialize(docs.select(md5(col("text")))) // warmup

    var cents: Array[Array[Double]] = null
    val init = KMeansOps.initCentroids(16, 64)
    time("mean-update job alone (init centroids)") {
      val assigned = e.select(
        element_at(KMeansOps.cellsUdfPublic(init, 1)(col("embedding")), 1).as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "el")))
      val n = assigned.groupBy("cell", "pos")
        .agg(sum(floor(col("el").cast("double") * lit(1.0e7) + lit(0.5))).as("sq"),
          count(lit(1)).as("n"))
        .collect().length
      println(s"  rows: $n")
    }
    time("posexplode+groupBy WITHOUT udf") {
      val n = e.select(lit(0).as("cell"), posexplode(col("embedding")).as(Seq("pos", "el")))
        .groupBy("cell", "pos")
        .agg(sum(floor(col("el").cast("double") * lit(1.0e7) + lit(0.5))).as("sq"))
        .collect().length
      println(s"  rows: $n")
    }
    time("udf+posexplode, no agg (count)") {
      println("  " + e.select(
        element_at(KMeansOps.cellsUdfPublic(init, 1)(col("embedding")), 1).as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "el"))).count())
    }
    time("train k=16 iters=2") {
      cents = KMeansOps.train(e, "embedding", k = 16, iters = 2, dim = 64)
    }
    time("assign (count)") {
      println("  cells: " + KMeansOps.assignCells(e, "id", "embedding", cents).count())
    }
    time("semantic full") {
      materialize(KMeansOps.semanticNearDuplicates(e, "id", "embedding", 0.25, 8, 2))
    }
    time("ivf_trained full") {
      materialize(KMeansOps.ivfTopKTrained(e.filter(col("id") < 5), e, 5, 16, 6, 2))
    }
    time("t_repetition full") {
      materialize(TextOps.repetitionSignals(docs, "doc_id", "text"))
    }
    time("topWordFrac only") {
      materialize(docs.select(TextOps.topWordFrac(col("text"))))
    }
    time("dupWordFrac only") {
      materialize(docs.select(TextOps.dupWordFrac(col("text"))))
    }
    time("brute cosine 5q") {
      materialize(SimilarityOps.bruteForceTopK(e.filter(col("id") < 5), e, 5))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the t_pmi bottleneck hunt (sf dir as arg). */
object PmiProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val toks = docs.select(graft.operators.TextOps.words(lower(col("text"))).as("t"))
    time("toks count")(println(toks.count()))
    val bg = toks.select(when(size(col("t")) >= 2,
        expr("transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
        .otherwise(expr("array()")).as("bgs"))
      .select(explode(col("bgs")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    time("bg count")(println(bg.count()))
    val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).filter(col("c12") >= 5)
    time("pairs count")(println(pairs.count()))

    // B: arrays_zip over two slices (no lambda, no sequence)
    val bgB = toks.select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
    time("B zip-slice count")(println(bgB.count()))
    time("B pairs")(println(
      bgB.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).filter(col("c12") >= 5).count()))

    // C: posexplode + shifted self-join
    val inst = docs.select(col("doc_id"),
      posexplode(graft.operators.TextOps.words(lower(col("text")))).as(Seq("pos", "w")))
    val bgC = inst.as("a").join(inst.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
    time("C join count")(println(bgC.count()))
    val full = graft.operators.TextOps.pmiBigrams(docs, "text", 5L, 20)
    time("full run 1")(full.collect())
    time("full run 2")(full.collect())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan inspection and micro-experiments (not shipped API). */
object PlanScratch {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warmup
    materialize(docs.select(md5(col("text"))))

    // variant A: current simhash (60 agg exprs over projected h)
    time("A 60-agg") {
      materialize(graft.operators.DedupOps.simhash(docs, "doc_id", "text"))
    }

    // variant B: h materialized through an exchange before the 60 aggs
    time("B exchange-then-agg") {
      val wordRows = docs
        .select(col("doc_id").as("id"), explode(graft.operators.TextOps.words(col("text"))).as("w"))
        .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
        .select("id", "h")
        .repartition(32, col("id"))
      val bitSums = (0 until 60).map(b =>
        sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
      val assemble = (0 until 60)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
        .reduce(_ + _)
      materialize(wordRows.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("id"), assemble.as("simhash")))
    }

    // variant C: contributions precomputed in one projection, plain sums agg
    time("C project-contrib") {
      val wordRows = docs
        .select(col("doc_id").as("id"), explode(graft.operators.TextOps.words(col("text"))).as("w"))
        .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
      val withContribs = wordRows.select(
        col("id") +: (0 until 60).map(b =>
          (expr(s"shiftright(h, $b) & 1") * 2 - 1).cast("long").as(s"c$b")): _*)
      val sums = (0 until 60).map(b => sum(col(s"c$b")).as(s"s$b"))
      val assemble = (0 until 60)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
        .reduce(_ + _)
      materialize(withContribs.groupBy("id").agg(sums.head, sums.tail: _*)
        .select(col("id"), assemble.as("simhash")))
    }

    // variant D: typed Aggregator, one Array[Long](60) buffer instead of
    // 60 SUM aggregates (imperative update loop; leaves codegen)
    time("D typed-aggregator") {
      import spark.implicits._
      val wordRows = docs
        .select(col("doc_id").as("id"), explode(graft.operators.TextOps.words(col("text"))).as("w"))
        .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
        .select(col("id").as[Long], col("h").as[Long])
      val simAgg = new org.apache.spark.sql.expressions.Aggregator[(Long, Long), Array[Long], Long] {
        def zero: Array[Long] = new Array[Long](60)
        def reduce(buf: Array[Long], row: (Long, Long)): Array[Long] = {
          val h = row._2
          var b = 0
          while (b < 60) { buf(b) += ((h >>> b) & 1L) * 2 - 1; b += 1 }
          buf
        }
        def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
          var i = 0
          while (i < 60) { a(i) += b(i); i += 1 }
          a
        }
        def finish(buf: Array[Long]): Long = {
          var sig = 0L
          var b = 0
          while (b < 60) { if (buf(b) > 0) sig |= 1L << b; b += 1 }
          sig
        }
        def bufferEncoder = implicitly[org.apache.spark.sql.Encoder[Array[Long]]]
        def outputEncoder = implicitly[org.apache.spark.sql.Encoder[Long]]
      }
      materialize(
        wordRows.groupByKey(_._1).agg(simAgg.toColumn.name("simhash")).toDF("id", "simhash"))
    }

    args.headOption.foreach { q =>
      println(s"=== plan for $q ===")
      graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, MinhashSig}

/**
 * A/B harness for the round-4 candidate-pair plan decision: grouped
 * pairs (collect ids per bucket, explode pairs) versus a bucket
 * self-join. The split is BUCKET DENSITY, not taste:
 *
 *  - minhash band values are high-cardinality strings → tiny buckets →
 *    grouped pairs win (one corpus scan + one kernel pass instead of
 *    two; sf0.1 steady-state 1.37 s vs 1.69 s);
 *  - simhash 6-bit segments have 64 values → dense buckets → grouped
 *    pairs MATERIALIZE bucket² struct arrays per group (sf0.1
 *    steady-state 17.6 s vs 2.3 s — 7.8x, and 43 s cold) while the
 *    join streams the same quadratic.
 *
 * DedupOps ships grouped pairs for minhashCandidates and the self-join
 * for simhashPairs/cosineNearDuplicates accordingly; this harness keeps
 * both variants runnable so the numbers stay reproducible.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.BandPairsAB"
 */
object BandPairsAB {

  /** The legacy minhash band SELF-JOIN (shipped through r3). */
  def minhashJoin(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    val rowsPerBand = k / bands
    val sig = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), MinhashSig(col(textCol), k, w).as("mh"))
    val bandStructs = array((0 until bands).map { b =>
      val members = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(s => concat(lit(s.toString), lit("~"), element_at(col("mh"), s + 1)))
      struct(lit(b).as("band"), array_join(array_sort(array(members: _*)), "|").as("bandval"))
    }: _*)
    val banded = sig.select(col("id"), explode(bandStructs).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bandval").as("bandval"))
    val a = banded.select(col("band"), col("bandval"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bandval"), col("id").as("id_b"))
    a.join(b, Seq("band", "bandval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Grouped-pairs over simhash SEGMENTS — the variant that LOSES there
    * (dense 64-value buckets); kept to reproduce the negative result. */
  def simhashGrouped(docs: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 9): DataFrame = {
    val segments = maxDist + 1
    val segBits = 60 / segments
    val segMask = (1L << segBits) - 1
    val sh = DedupOps.simhash(docs, idCol, textCol)
    val seg = sh.select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(segments - 1))).as("seg"))
      .withColumn("segval", expr(s"shiftright(simhash, cast(seg * $segBits as int)) & $segMask"))
    seg.groupBy("seg", "segval")
      .agg(collect_list(struct(col("id"), col("simhash"))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(expr(
        "filter(flatten(transform(xs, a -> transform(xs, b -> struct(a.id as id_a, b.id as id_b, a.simhash as h_a, b.simhash as h_b)))), p -> p.id_a < p.id_b)"))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        bit_count(col("p.h_a").bitwiseXOR(col("p.h_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    time("minhash grouped (shipped)") {
      DedupOps.minhashCandidates(docs, "doc_id", "text") }
    time("minhash self-join (legacy)") {
      minhashJoin(docs, "doc_id", "text") }
    time("simhash self-join (shipped)") {
      DedupOps.simhashPairs(docs, "doc_id", "text", maxDist = 9) }
    time("simhash grouped (rejected)") {
      simhashGrouped(docs, "doc_id", "text") }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/**
 * A/B harness for minhash signature computation variants.
 *
 * MEASURED NEGATIVE RESULT (sf0.1, local[32]): slicing 4 md5 calls into
 * 16 x 8-hex seed hashes is NOT faster than the shipped 16-md5-per-row
 * formulation steady-state (5.7 s vs 5.3 s) — the concat + 16
 * substrings cost what the md5 calls saved. Kept as the record of the
 * experiment; the shipped plan stays per-seed md5 (which the DuckDB
 * oracle mirrors 1:1).
 */
object MinhashAB {

  /** Variant B: 4 md5 calls per shingle row (128 hex chars) sliced into
    * 16 x 8-hex (32-bit) per-seed hashes, instead of 16 md5 calls. */
  def sliced(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    require(k % bands == 0)
    val rowsPerBand = k / bands
    val nMd5 = (k * 8 + 31) / 32 // 8 hex chars per seed, 32 per md5
    val hashCat = concat((0 until nMd5).map {
      case 0 => md5(col("sh"))
      case i => md5(concat(lit(s"$i:"), col("sh")))
    }: _*)
    val mhCols = (0 until k).map(s =>
      min(substring(col("h"), s * 8 + 1, 8)).as(s"mh$s"))
    val sig = docs
      .select(col(idCol).as("id"), explode(DedupOps.shingles(col(textCol), w)).as("sh"))
      .withColumn("h", hashCat)
      .groupBy(col("id"))
      .agg(mhCols.head, mhCols.tail: _*)
    val bandStructs = array((0 until bands).map { b =>
      val members = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(s => concat(lit(s.toString), lit("~"), col(s"mh$s")))
      struct(lit(b).as("band"), array_join(array_sort(array(members: _*)), "|").as("bandval"))
    }: _*)
    val banded = sig
      .select(col("id"), explode(bandStructs).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bandval").as("bandval"))
    val a = banded.select(col("band"), col("bandval"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bandval"), col("id").as("id_b"))
    a.join(b, Seq("band", "bandval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
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
    docs.select(TextOps.fingerprint(col("text"))).write.format("noop").mode("overwrite").save()

    time("A per-seed md5 (current)")(DedupOps.minhashCandidates(docs, "doc_id", "text"))
    time("B sliced md5")(sliced(docs, "doc_id", "text"))
    time("A per-seed md5 again")(DedupOps.minhashCandidates(docs, "doc_id", "text"))
    time("B sliced md5 again")(sliced(docs, "doc_id", "text"))

    val a = DedupOps.minhashCandidates(docs, "doc_id", "text").count()
    val b = sliced(docs, "doc_id", "text").count()
    println(s"pairs A=$a B=$b (different hash families -> counts may differ slightly)")
    spark.stop()
  }
}

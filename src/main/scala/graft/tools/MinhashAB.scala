package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/**
 * A/B harness for minhash signature computation variants.
 *
 * MEASURED NEGATIVE RESULTS (sf0.1, local[32]), kept as the record of
 * the experiments; the shipped plan stays per-seed md5 min-aggregates
 * (which the DuckDB oracle mirrors 1:1):
 *  - slicing 4 md5 calls into 16 x 8-hex seed hashes: 5.7 s vs 5.3 s
 *    steady-state — the concat + 16 substrings cost what the md5 calls
 *    saved;
 *  - typed Aggregator computing the 16 md5s imperatively (the shape
 *    that won 2.1x for simhash): 5.5 s vs 5.3 s — unlike simhash's 60
 *    aggregate trees, minhash's cost IS the 16 md5 evaluations per
 *    shingle, which no aggregation shape removes.
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

  /** Variant C: typed Aggregator — the 16 md5s computed imperatively per
    * shingle row with a reused MessageDigest, min kept in an
    * Array[String](16) buffer (no 16 aggregate expression trees). */
  def typedAgg(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    require(k % bands == 0)
    val rowsPerBand = k / bands
    val sp = docs.sparkSession
    import sp.implicits._
    val rows = docs
      .select(col(idCol).cast("long").as("id"), explode(DedupOps.shingles(col(textCol), w)).as("sh"))
      .as[(Long, String)]
    val mhAgg = new org.apache.spark.sql.expressions.Aggregator[(Long, String), Array[String], Array[String]] {
      def zero: Array[String] = new Array[String](k)
      @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
      private def hex(b: Array[Byte]): String = {
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < b.length) { sb.append("0123456789abcdef".charAt((b(i) >> 4) & 0xf)); sb.append("0123456789abcdef".charAt(b(i) & 0xf)); i += 1 }
        sb.toString
      }
      def reduce(buf: Array[String], row: (Long, String)): Array[String] = {
        var s = 0
        while (s < k) {
          md.reset()
          val h = hex(md.digest((s.toString + ":" + row._2).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          if (buf(s) == null || h < buf(s)) buf(s) = h
          s += 1
        }
        buf
      }
      def merge(a: Array[String], b: Array[String]): Array[String] = {
        var s = 0
        while (s < k) {
          if (a(s) == null || (b(s) != null && b(s) < a(s))) a(s) = b(s)
          s += 1
        }
        a
      }
      def finish(buf: Array[String]): Array[String] = buf
      def bufferEncoder: org.apache.spark.sql.Encoder[Array[String]] = implicitly
      def outputEncoder: org.apache.spark.sql.Encoder[Array[String]] = implicitly
    }
    val sig = rows.groupByKey(_._1).agg(mhAgg.toColumn.name("mh")).toDF("id", "mh")
    val bandStructs = array((0 until bands).map { b =>
      val members = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(s => concat(lit(s.toString), lit("~"), col("mh").getItem(s)))
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

    time("C typed-agg")(typedAgg(docs, "doc_id", "text"))
    time("C typed-agg again")(typedAgg(docs, "doc_id", "text"))

    val a = DedupOps.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = sliced(docs, "doc_id", "text").count()
    val c = typedAgg(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"pairs A=${a.size} B=$b C=${c.size} A==C: ${a == c}")
    spark.stop()
  }
}

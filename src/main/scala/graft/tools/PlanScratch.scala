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

    import graft.operators.DedupOps
    val cand0 = DedupOps.minhashCandidates(docs, "doc_id", "text", 16, 8, 8,
      charGrams = true, maxBucket = 64).localCheckpoint()
    val lens = docs.select(col("doc_id").as("id"), length(col("text")).as("len"))
    val cand = cand0
      .join(lens.select(col("id").as("id_a"), col("len").as("la")), "id_a")
      .join(lens.select(col("id").as("id_b"), col("len").as("lb")), "id_b")
      .filter(abs(col("la") - col("lb")) <= 80)
      .select("id_a", "id_b").localCheckpoint()
    println("cand pairs: " + cand.count())

    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    println("distinct docs in pairs: " + candIds.count())
    val texts = docs.select(col("doc_id").as("id"), col("text"))
      .join(candIds, "id").localCheckpoint()

    val joined = cand
      .join(texts.select(col("id").as("id_a"), col("text").as("ta")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("text").as("tb")), "id_b")
      .localCheckpoint()

    val banded = udf { (a: String, b: String) =>
      val k = 80
      val x0 = a.codePoints.toArray
      val y0 = b.codePoints.toArray
      // strip common prefix/suffix
      var lo = 0
      val maxLo = math.min(x0.length, y0.length)
      while (lo < maxLo && x0(lo) == y0(lo)) lo += 1
      var hxi = x0.length - 1; var hyi = y0.length - 1
      while (hxi >= lo && hyi >= lo && x0(hxi) == y0(hyi)) { hxi -= 1; hyi -= 1 }
      val n = hxi - lo + 1
      val m = hyi - lo + 1
      val (x, y, nn, mm) = if (n <= m) (x0, y0, n, m) else (y0, x0, m, n)
      if (mm - nn > k) -1
      else if (nn == 0) mm
      else {
        // Ukkonen band: row i covers j in [i-k, i+k] intersect [0, mm]
        val prev = new Array[Int](mm + 1)
        val cur = new Array[Int](mm + 1)
        var j = 0
        while (j <= math.min(mm, k)) { prev(j) = j; j += 1 }
        var i = 1
        var bailed = false
        while (i <= nn && !bailed) {
          val jLo = math.max(1, i - k)
          val jHi = math.min(mm, i + k)
          cur(jLo - 1) = if (jLo == 1) i else Int.MaxValue / 2
          var rowMin = cur(jLo - 1)
          val xi = x(lo + i - 1)
          j = jLo
          while (j <= jHi) {
            val c = if (xi == y(lo + j - 1)) prev(j - 1)
              else math.min(math.min(prev(j - 1), prev(j)), cur(j - 1)) + 1
            // prev(j) out of band (j == i+k) must not be read as stale:
            val cc = if (j == i + k)
              (if (xi == y(lo + j - 1)) prev(j - 1)
               else math.min(prev(j - 1), cur(j - 1)) + 1)
              else c
            cur(j) = cc
            if (cc < rowMin) rowMin = cc
            j += 1
          }
          if (rowMin > k) bailed = true
          System.arraycopy(cur, jLo - 1, prev, jLo - 1, jHi - jLo + 2)
          i += 1
        }
        if (bailed) -1
        else { val d = prev(mm); if (d > k) -1 else d }
      }
    }
    for (pass <- 1 to 2) {
      println(s"-- pass $pass --")
      time("levenshtein builtin(80) on joined") {
        materialize(joined.select(levenshtein(col("ta"), col("tb"), 80)))
      }
      time("banded UDF on joined") {
        materialize(joined.select(banded(col("ta"), col("tb"))))
      }
      val diff = joined.select(levenshtein(col("ta"), col("tb"), 80).as("x"),
        banded(col("ta"), col("tb")).as("y")).filter(col("x") =!= col("y")).count()
      println("  disagreements: " + diff)
      graft.core.Blocks.releaseAll(spark)
    }
    spark.stop()
  }
}

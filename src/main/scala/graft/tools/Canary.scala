package graft.tools

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** The standing round-close environment canary as one command
  * (SCALING.md "Round-15" rule): run the fixed drift-prone row set
  * min-of-N interleaved (H,R,H,R,…) against a previous sealed tree in
  * the SAME session, and emit the adjudication artifact.
  *
  * Usage:
  *   sbt "runMain graft.tools.Canary <sealedRef> [outFile] [sfDir] [passes]"
  * e.g. sbt "runMain graft.tools.Canary 54ff60a BENCH_canary_r16.json"
  *
  * The sealed tree is materialized once as a git worktree under
  * /tmp/canary-<ref> and compiled there; each pass then runs
  * graft.Bench on HEAD and on the worktree back to back with
  * SPARK_GRAFT_BENCH_RUNS=1 (the interleave IS the repetition). Rows
  * whose min-of-N ratio falls inside [0.7, 1.4] with overlapping pass
  * ranges are environment by the committed rule; anything outside is
  * flagged in the artifact for adjudication.
  */
object Canary {
  /** The historically drift-prone, verify-heavy canary rows. */
  val rows: Seq[String] = Seq(
    "d_dedup_editdist", "s_label_knn_ivf_pq", "d_canonical",
    "d_corpus_diff", "q41_cocitation_rank", "q17_pagerank", "q18_ppr",
    "q39_host_rank", "q9_sessions", "d_dedup_winnow")

  private def benchOnce(dir: String, sfDir: String): Map[String, Double] = {
    val out = new StringBuilder
    val env = Seq(
      "SPARK_GRAFT_SF_DIR" -> sfDir,
      "SPARK_GRAFT_BENCH_ONLY" -> rows.mkString(","),
      "SPARK_GRAFT_BENCH_RUNS" -> "1",
      "SPARK_GRAFT_BENCH_OUT" -> "/tmp/canary_bench_scratch.json")
    val code = Process(Seq("sbt", "-batch", "runMain graft.Bench"),
      new java.io.File(dir), env: _*) ! ProcessLogger(l => out.append(l).append('\n'))
    require(code == 0, s"bench in $dir exited $code")
    val line = out.toString.linesIterator.filter(_.startsWith("{")).toSeq.last
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line).get("queries")
    rows.map(q => q -> m.get(q).asDouble()).toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Canary <sealedRef> [outFile] [sfDir] [passes]")
    val ref = args(0)
    val outFile = if (args.length > 1) args(1) else s"BENCH_canary_$ref.json"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val passes = if (args.length > 3) args(3).toInt else 3
    val wt = s"/tmp/canary-$ref"
    if (!Files.exists(Paths.get(wt))) {
      require(Seq("git", "worktree", "add", wt, ref).! == 0, s"worktree add $ref failed")
    }
    require(Process(Seq("sbt", "-batch", "compile"), new java.io.File(wt)).! == 0,
      s"sealed-tree compile failed in $wt")
    val head = Array.fill(passes)(Map.empty[String, Double])
    val prev = Array.fill(passes)(Map.empty[String, Double])
    for (p <- 0 until passes) {
      head(p) = benchOnce(".", sfDir)
      prev(p) = benchOnce(wt, sfDir)
      println(s"pass ${p + 1}/$passes done")
    }
    def fmt(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rowJson = rows.map { q =>
      val hs = head.map(_(q)); val rs = prev.map(_(q))
      val ratio = hs.min / rs.min
      // the overlap clause needs ranges: with a single pass (a smoke
      // run, not the committed min-of-3 protocol) the ratio band alone
      // decides
      val overlap = passes < 2 || (hs.min <= rs.max && rs.min <= hs.max)
      val verdict =
        if (ratio >= 0.7 && ratio <= 1.4 && overlap) "environment"
        else "ADJUDICATE"
      s"""  {"query":"$q","head_min":${fmt(hs.min)},"sealed_min":${fmt(rs.min)},""" +
        s""""ratio":${fmt(ratio)},"head_passes":[${hs.map(fmt).mkString(",")}],""" +
        s""""sealed_passes":[${rs.map(fmt).mkString(",")}],"verdict":"$verdict"}"""
    }.mkString(",\n")
    val json =
      s"""{"artifact":"canary","sealed_ref":"$ref","sf_dir":"$sfDir","passes":$passes,
         |"protocol":"same-session interleaved A/B, min-of-$passes, SPARK_GRAFT_BENCH_RUNS=1 per invocation",
         |"rows":[
         |$rowJson
         |]}""".stripMargin
    Files.write(Paths.get(outFile), json.getBytes("UTF-8"))
    println(s"wrote $outFile")
    json.linesIterator.filter(_.contains("ADJUDICATE"))
      .foreach(l => println(s"NEEDS ADJUDICATION: $l"))
  }
}

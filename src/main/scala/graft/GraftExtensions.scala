package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.operators.{FastMd5Expr, GopherStatsExpr, Md5Head60Expr, MinhashSigExpr, NgramHashesExpr, RepetitionStatsExpr, ScriptMixStatsExpr, ShingleHashesExpr, Simhash60Expr, TextStatsExpr}

/**
 * SparkSessionExtensions entry point: registers the engine's custom
 * Catalyst expressions as SQL functions, so they are callable from
 * `spark.sql(...)` (and spark-sql / thrift-server sessions on a
 * cluster) exactly like built-ins:
 *
 *   spark.builder.withExtensions(new GraftExtensions)         // code
 *   --conf spark.sql.extensions=graft.GraftExtensions          // conf
 *
 *   SELECT fast_md5(text), simhash60(text), minhash_sig(text, 16, 3)
 *
 * Literal-argument helpers (k/bands/w) take integer literals, matching
 * how the DataFrame API parameterizes the same kernels.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("fast_md5"),
      info("fast_md5", "fast_md5(str) - md5 hex with a thread-local digest"),
      (args: Seq[Expression]) => FastMd5Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("md5_head60"),
      info("md5_head60", "md5_head60(str) - top 60 bits of md5 as a long"),
      (args: Seq[Expression]) => Md5Head60Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit simhash over word occurrences"),
      (args: Seq[Expression]) => Simhash60Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, w) - xxhash64 of distinct word w-shingles"),
      (args: Seq[Expression]) =>
        ShingleHashesExpr(args.head, if (args.length > 1) intLit(args(1), "w") else 3)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text, k, w) - k md5 minhash signatures over word w-shingles"),
      (args: Seq[Expression]) => MinhashSigExpr(args.head,
        if (args.length > 1) intLit(args(1), "k") else 16,
        if (args.length > 2) intLit(args(2), "w") else 3)))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - [n_words, distinct_words, top_word, top_bigram, n_lines, distinct_lines]"),
      (args: Seq[Expression]) => RepetitionStatsExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats",
        "text_stats(text) - [len, n_words, n_stops, n_punct, en_hits, de_hits, es_hits, n_subwords]"),
      (args: Seq[Expression]) => TextStatsExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes",
        "ngram_hashes(text, n) - xxhash64 of ALL word n-gram occurrences (duplicates kept)"),
      (args: Seq[Expression]) =>
        NgramHashesExpr(args.head, if (args.length > 1) intLit(args(1), "n") else 1)))
    ext.injectFunction((FunctionIdentifier("script_mix"),
      info("script_mix",
        "script_mix(text) - [latin, cyrillic, greek, arabic, hebrew, cjk, digit] codepoint counts"),
      (args: Seq[Expression]) => ScriptMixStatsExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("gopher_stats"),
      info("gopher_stats",
        "gopher_stats(text) - [n_words, n_chars, alpha_words, n_lines, bullets, ell_lines, hashes, ells, stop_cnt]"),
      (args: Seq[Expression]) => GopherStatsExpr(args.head)))
  }
}

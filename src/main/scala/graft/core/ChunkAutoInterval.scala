package graft.core

/**
 * Adaptive chunk-rotation interval (/root/reference/helper/config/
 * chunk_interval.go:11-85): a sorted rule table `unhandled:interval`
 * (e.g. "5:5s,20:60s") picks a longer rotation interval as the count
 * of rotated-but-unprocessed chunks grows — the reference's
 * backpressure valve when the downstream consumer falls behind.
 */
final class ChunkAutoInterval private (
    rules: Seq[(Int, Long)], // (unhandled threshold, interval ms), sorted ascending
    val defaultMs: Long) {

  /** Interval for the given unhandled-chunk count: the last rule whose
    * threshold is <= count, else the default (GetInterval semantics). */
  def intervalMsFor(unhandled: Int): Long = {
    var chosen = defaultMs
    var i = 0
    while (i < rules.length && unhandled >= rules(i)._1) {
      chosen = rules(i)._2
      i += 1
    }
    chosen
  }
}

object ChunkAutoInterval {

  /** Parse "5:10s,20:60s" (empty string -> no rules, always default). */
  def parse(s: String, defaultMs: Long): ChunkAutoInterval = {
    val trimmed = s.trim
    val rules =
      if (trimmed.isEmpty) Nil
      else trimmed.split(",").toSeq.map { part =>
        val kv = part.trim.split(":", 2)
        require(kv.length == 2, s"can't parse chunk-auto-interval: '$s'")
        (kv(0).trim.toInt, Toml.durationMs(kv(1).trim))
      }.sortBy(_._1)
    new ChunkAutoInterval(rules, defaultMs)
  }
}

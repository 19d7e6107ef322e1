package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming heavy hitters with BOUNDED state: the Space-Saving
 * algorithm (Metwally, Agrawal, El Abbadi, "Efficient computation of
 * frequent and top-k elements in data streams", ICDT 2005) as a
 * `flatMapGroupsWithState` operator — the custom-state streaming shape
 * Structured Streaming reserves for exactly this case, where the
 * built-in windowed aggregate cannot help: a `groupBy(token).count()`
 * over an unbounded token stream grows state with the VOCABULARY
 * (unbounded on real text), while Space-Saving holds exactly `k`
 * counters per group forever and still guarantees that every token
 * with true frequency > N/k is present, each counter overestimating
 * by at most its recorded `err`.
 *
 * Counter update per occurrence: a tracked token increments; an
 * untracked token with spare capacity starts at (1, 0); otherwise it
 * REPLACES the minimum counter (min by count, ties to the
 * lexicographically largest token so the smallest token survives),
 * inheriting count+1 with err = the evicted count — the classic
 * "pessimistic takeover" that keeps the overestimate bound exact.
 *
 * Determinism contract (the repo-wide policy): stream-order algorithms
 * are replayable only if the fold order is explicit, so occurrences
 * fold in ascending `seqCol` order within each (group, micro-batch) —
 * with unique seqs the result is bit-identical on any engine, any
 * partitioning, and any shuffle order, where folding Spark's raw
 * iterator order would differ run to run. The sort is per
 * (group, batch), never global.
 *
 * Works unchanged on a BATCH frame (Spark runs flatMapGroupsWithState
 * with empty initial state, one invocation per group) — the
 * StreamTopKSpec asserts batch ≡ streaming on a split feed.
 *
 * Scale: state is k counters x groups regardless of stream length;
 * each micro-batch shuffles only its own rows (hash on group). Output
 * per trigger: the current top `emit` counters per group seen in the
 * batch (Update mode), (group, token, count, err)-shaped.
 */
object StreamTopK {

  /** One tracked counter: `count` >= true occurrences >= count - err. */
  case class Counter(token: String, count: Long, err: Long)

  case class TopKRow(group: String, token: String, count: Long, err: Long)

  // public, not private: the generated state serializer lives outside
  // this object and janino refuses accessor calls on a private class
  // ("no applicable method" at codegen time)
  case class SSState(counters: Seq[Counter])

  private def fold(state: Seq[Counter], k: Int,
                   occurrences: Iterator[(String, Long)]): Seq[Counter] = {
    // small-k mutable map fold; k is a constant (64-1024), so the
    // linear min scan on eviction is bounded work per occurrence
    val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
    state.foreach(c => m(c.token) = (c.count, c.err))
    occurrences.foreach { case (token, _) =>
      m.get(token) match {
        case Some((c, e)) => m(token) = (c + 1, e)
        case None if m.size < k => m(token) = (1L, 0L)
        case None =>
          val (evTok, (evCnt, _)) = m.minBy { case (t, (c, _)) => (c, reverseOrder(t)) }
          m.remove(evTok)
          m(token) = (evCnt + 1, evCnt)
      }
    }
    m.iterator.map { case (t, (c, e)) => Counter(t, c, e) }.toSeq
  }

  /** Wrap for "ties to the lexicographically LARGEST token evicted":
    * minBy on (count, reverseOrder(token)) keeps the smallest token. */
  private def reverseOrder(t: String): ReverseString = ReverseString(t)
  private case class ReverseString(s: String) extends Ordered[ReverseString] {
    def compare(that: ReverseString): Int = that.s.compareTo(s)
  }

  /**
   * `events` must carry `groupCol` (string), `seqCol` (long, unique
   * fold order), `tokenCol` (string). Returns (group, token, count,
   * err), the per-group top `emit` by (count desc, token asc) after
   * each micro-batch (or after the single batch pass).
   */
  def spaceSavingTopK(events: DataFrame, groupCol: String, seqCol: String,
                      tokenCol: String, k: Int, emit: Int): Dataset[TopKRow] = {
    require(k >= 1 && emit >= 1 && emit <= k,
      s"spaceSavingTopK k=$k emit=$emit")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(groupCol).cast("string").as("g"),
        col(seqCol).cast("long").as("seq"),
        col(tokenCol).cast("string").as("tok"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SSState, TopKRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, Long, String)],
         state: GroupState[SSState]) =>
          val prev = if (state.exists) state.get.counters else Seq.empty[Counter]
          val batch = rows.toArray.sortBy(_._2)
          val next = fold(prev, k, batch.iterator.map(r => (r._3, r._2)))
          state.update(SSState(next))
          next.sortBy(c => (-c.count, c.token)).take(emit)
            .map(c => TopKRow(group, c.token, c.count, c.err)).iterator
      }
  }
}

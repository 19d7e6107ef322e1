package graft.core

import org.apache.spark.SparkContext

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/**
 * Managed overlap of INDEPENDENT driver-side job chains (guide §2.6:
 * a chain's straggler tail leaves cores idle that the sibling chain's
 * stages can back-fill).
 *
 * Why not `Future` on the global pool: a bare future holds no Spark
 * job group and nobody awaits it on failure, so when the first chain's
 * `Await.result` rethrows — or a test suite tears the session down —
 * the orphan thread keeps submitting jobs into a stopping
 * SparkContext. That is exactly the round-15 red suite
 * (`RejectedExecutionException` from a Terminated `TaskResultGetter`
 * pool). The contract here closes every leak path:
 *
 *   - a DEDICATED two-thread pool per call, shut down in `finally`
 *     (never the global ExecutionContext);
 *   - each chain runs under its OWN Spark job group with
 *     `interruptOnCancel = true`, set and cleared on the pool thread
 *     (job-group state is thread-local);
 *   - on either chain's failure the SIBLING's job group is cancelled
 *     and BOTH futures are awaited before control returns — the
 *     caller can never observe a still-running orphan;
 *   - the first failure (by completion order) is rethrown unchanged.
 */
object Concurrent {

  /** Run `fa` and `fb` concurrently as independent Spark job chains;
    * return both results, or rethrow the first failure after both
    * threads have settled and the sibling's jobs are cancelled. */
  private[graft] def both[A, B](sc: SparkContext)(fa: => A, fb: => B): (A, B) = {
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gid = java.util.UUID.randomUUID().toString
    def chain[T](tag: String, thunk: => T): Future[T] = Future {
      sc.setJobGroup(s"$gid-$tag", s"concurrent chain $tag", interruptOnCancel = true)
      try thunk
      finally sc.clearJobGroup()
    }
    val fut1 = chain("a", fa)
    val fut2 = chain("b", fb)
    try {
      // Await BOTH to completion regardless of outcome — settle first,
      // then rethrow — so no thread outlives this call.
      val r1 =
        try Right(Await.result(fut1, Duration.Inf))
        catch { case e: Throwable => cancelQuiet(sc, s"$gid-b"); Left(e) }
      val r2 =
        try Right(Await.result(fut2, Duration.Inf))
        catch { case e: Throwable => cancelQuiet(sc, s"$gid-a"); Left(e) }
      (r1, r2) match {
        case (Right(a), Right(b)) => (a, b)
        case (Left(e), _)         => awaitQuiet(fut2); throw e
        case (_, Left(e))         => awaitQuiet(fut1); throw e
      }
    } finally pool.shutdown()
  }

  private def cancelQuiet(sc: SparkContext, group: String): Unit =
    try sc.cancelJobGroup(group) catch { case _: Throwable => () }

  private def awaitQuiet(f: Future[_]): Unit =
    try Await.ready(f, Duration.Inf) catch { case _: Throwable => () }
}

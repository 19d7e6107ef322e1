package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.util.concurrent.atomic.AtomicBoolean

/**
 * Pins the no-orphan contract of [[Concurrent.both]] — the property
 * whose absence made round 15's suite red: when a chain fails (or the
 * whole call is abandoned), NO thread may still be submitting Spark
 * jobs after the call returns. Every test here asserts "both thunks
 * have fully settled by the time both() returns", which is the exact
 * leak path (an orphan future racing a stopping SparkContext).
 */
class ConcurrentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-concurrent")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("both chains run Spark jobs concurrently and both results return") {
    val sc = spark.sparkContext
    val (a, b) = Concurrent.both(sc)(
      sc.parallelize(1 to 1000, 4).map(_ * 2L).sum(),
      sc.parallelize(1 to 500, 4).map(_.toLong).sum())
    assert(a == 1001000.0 && b == 125250.0)
  }

  test("a failing chain rethrows AND the sibling has settled before both() returns") {
    val sc = spark.sparkContext
    val siblingSettled = new AtomicBoolean(false)
    val boom = intercept[RuntimeException] {
      Concurrent.both(sc)(
        { throw new RuntimeException("chain a dies") }: Unit,
        {
          try {
            // a multi-job chain: keeps submitting like a training loop
            for (_ <- 1 to 5) sc.parallelize(1 to 200, 4).map { i => Thread.sleep(1); i }.count()
          } finally siblingSettled.set(true)
        }: Unit)
    }
    assert(boom.getMessage == "chain a dies")
    // the no-orphan property: by the time both() has returned, the
    // sibling thunk is DONE (finished or cancelled) — nothing can race
    // a later session teardown
    assert(siblingSettled.get(),
      "sibling chain must be settled when both() returns")
    // and the context is still healthy for the next caller
    assert(sc.parallelize(1 to 10, 2).count() == 10L)
  }

  test("second chain failing is also rethrown after the first settles") {
    val sc = spark.sparkContext
    val firstSettled = new AtomicBoolean(false)
    val boom = intercept[IllegalStateException] {
      Concurrent.both(sc)(
        try sc.parallelize(1 to 100, 2).count()
        finally firstSettled.set(true),
        { Thread.sleep(20); throw new IllegalStateException("chain b dies") }: Unit)
    }
    assert(boom.getMessage == "chain b dies")
    assert(firstSettled.get())
    assert(sc.parallelize(1 to 10, 2).count() == 10L)
  }

  test("failure cancels the sibling's job group (long sibling job aborts, not completes)") {
    val sc = spark.sparkContext
    @volatile var siblingOutcome: Option[Throwable] = None
    val t0 = System.nanoTime()
    intercept[RuntimeException] {
      Concurrent.both(sc)(
        { Thread.sleep(50); throw new RuntimeException("fail fast") }: Unit,
        {
          try {
            // ~40 s of task sleep if it ran to completion
            sc.parallelize(1 to 400, 4).map { i => Thread.sleep(100); i }.count()
            ()
          } catch { case e: Throwable => siblingOutcome = Some(e); throw e }
        }: Unit)
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    // cancellation must have cut the sibling short: both() returned far
    // sooner than the sibling's full runtime, and the sibling saw the
    // cancellation as an exception
    assert(elapsedSec < 20.0, s"both() took $elapsedSec s — sibling was not cancelled")
    assert(siblingOutcome.nonEmpty, "sibling should have aborted with a cancellation error")
    assert(sc.parallelize(1 to 10, 2).count() == 10L)
  }
}

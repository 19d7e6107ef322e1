package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Evidence-surface lockstep: EVIDENCE.md's close-out must quote the
 * CURRENT query surface, machine-checked the same way
 * [[PlansLockstepSpec]] pins PLANS.md. Three rounds running, the
 * hand-written close-out lagged the surface (167→179→187 while the
 * surface moved on to 189) because nothing failed the build when it
 * went stale. The contract: EVIDENCE.md carries EXACTLY ONE marker
 * line of the form
 *
 *   FINAL SURFACE: N/N driver queries
 *
 * and both numbers equal `SparkEntry.queries.size`. Adding a query
 * without refreshing the close-out (and re-running the full
 * Verify → check_oracle pass the marker asserts) now fails `sbt test`.
 */
class EvidenceLockstepSpec extends AnyFunSuite {

  test("EVIDENCE.md close-out quotes the current query surface") {
    val path = java.nio.file.Paths.get("EVIDENCE.md")
    assert(java.nio.file.Files.exists(path), "EVIDENCE.md missing from repo root")
    val marker = raw"^FINAL SURFACE: (\d+)/(\d+) driver queries\b.*".r
    val hits = scala.jdk.CollectionConverters.IteratorHasAsScala(
      java.nio.file.Files.lines(path).iterator()).asScala
      .collect { case marker(a, b) => (a.toInt, b.toInt) }
      .toList
    assert(hits.length == 1,
      s"EVIDENCE.md must carry exactly one 'FINAL SURFACE: N/N driver queries' line, found ${hits.length}")
    val n = SparkEntry.queries.size
    assert(hits.head == ((n, n)),
      s"EVIDENCE.md close-out says ${hits.head._1}/${hits.head._2} but SparkEntry.queries.size is $n — " +
        "refresh the close-out (and re-run Verify → tools/check_oracle.py) after changing the surface")
  }
}

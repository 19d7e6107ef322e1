package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-evidence lockstep: PLANS.md must carry one `## <name>` section
 * for EVERY `SparkEntry.queries` key. Round 7 shipped a query
 * (m_media_phash) with no plan dump because the dump list was
 * hand-maintained; PlanDump now derives its list from
 * `SparkEntry.queries` itself, and this spec fails the build if the
 * committed PLANS.md lags the query surface — the fix is always
 * `sbt "runMain graft.tools.PlanDump /root/testdata/sf0.01 PLANS.md"`.
 */
class PlansLockstepSpec extends AnyFunSuite {

  test("PLANS.md has a section per SparkEntry query") {
    val path = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.exists(path), "PLANS.md missing from repo root")
    val sections = scala.jdk.CollectionConverters.IteratorHasAsScala(
      java.nio.file.Files.lines(path).iterator()).asScala
      .filter(_.startsWith("## "))
      .map(_.stripPrefix("## ").trim)
      .toSet
    val missing = SparkEntry.queries.keySet -- sections
    assert(missing.isEmpty,
      s"queries with no PLANS.md section (re-run PlanDump): ${missing.toSeq.sorted.mkString(", ")}")
    val stale = sections -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"PLANS.md sections for queries that no longer exist: ${stale.toSeq.sorted.mkString(", ")}")
  }
}

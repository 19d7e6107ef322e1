package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** -cat / -recover equivalents over the TSV spool
  * (reference carbon-clickhouse.go:52-95). */
class SpoolToolSpec extends AnyFunSuite {

  test("parseRow validates the TSV interchange row") {
    assert(SpoolTool.parseRow("a.b\t1.5\t1625478240\t1625478999")
      .contains(SpoolTool.Row("a.b", 1.5, 1625478240L, 1625478999L)))
    assert(SpoolTool.parseRow("a.b\tNaN\t1\t2").isEmpty, "NaN value")
    assert(SpoolTool.parseRow("a.b\t1.5\tx\t2").isEmpty, "bad time")
    assert(SpoolTool.parseRow("a.b\t1.5\t1").isEmpty, "missing field")
    assert(SpoolTool.parseRow("a.b\t1.5\t1\t2\t3").isEmpty, "extra field")
    assert(SpoolTool.parseRow("\t1.5\t1\t2").isEmpty, "empty name")
  }

  test("cat rendering includes the derived date (reference -cat shape)") {
    val r = SpoolTool.parseRow("test.path\t10.2\t1625478240\t0").get
    assert(SpoolTool.render(r) == "test.path\t10.2\t1625478240\t2021-07-05\t0")
  }

  test("recover salvages good records from a corrupt chunk") {
    val dir = Files.createTempDirectory("graft-recover")
    val in = dir.resolve("corrupt.tsv")
    Files.write(in, Seq(
      "good.one\t1.0\t1625478240\t1625478999",
      "truncated.row\t2.0\t16254",        // torn mid-write
      "good.two\t3.0\t1625478300\t1625478999",
      "garbage line with no tabs",
      "bad.value\tnot_a_number\t1\t2"
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))

    val out = dir.resolve("recovered.tsv").toString
    val (good, bad) = SpoolTool.recover(in.toString, out)
    assert(good == 2 && bad == 3)
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.size() == 2)
    assert(lines.get(0).startsWith("good.one\t") && lines.get(1).startsWith("good.two\t"))
  }
}

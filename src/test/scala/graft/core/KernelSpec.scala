package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Golden tables ported from the reference test suite (see FIXTURES.md). */
class KernelSpec extends AnyFunSuite {

  /** Minimal scalacheck bridge (scalatestplus isn't in the offline cache). */
  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
  private def forAll[A](gen: Gen[A])(f: A => Boolean): Unit =
    checkProp(Prop.forAll(gen)(f))

  // --- tag normalization goldens: helper/tags/graphite_test.go:15-33 ---
  private val normalizeGoldens = Seq(
    "notag" -> Right("notag"),
    "some.metric;tag1=value2;tag2=value.2;tag1=value3" -> Right("some.metric?tag1=value3&tag2=value.2"),
    "some.metric;c=1;b=2;a=3" -> Right("some.metric?a=3&b=2&c=1"),
    "some.metric;k=a;k=_;k2=3;k=0;k=42" -> Right("some.metric?k=42&k2=3"),
    "name.иван;tagged=true" -> Right("name.%D0%B8%D0%B2%D0%B0%D0%BD?tagged=true"),
    "some.metric?name;tagged=true" -> Right("some.metric%3Fname?tagged=true"),
    "some.metric;tagged=true?false" -> Right("some.metric?tagged=true%3Ffalse")
  )

  test("graphite tag normalization goldens") {
    for ((in, expected) <- normalizeGoldens) {
      assert(GraphiteTags.normalize(GraphiteTags.Disabled, in) == expected, s"input: $in")
    }
    // error cases
    assert(GraphiteTags.normalize(GraphiteTags.Disabled, ";tag1=value2;tag2=value.2").isLeft)
    assert(GraphiteTags.normalize(GraphiteTags.Disabled, "used;metric_type=gauge;agentdiamond;processed_by=statsd2").isLeft)
  }

  // --- template goldens: helper/tags/graphite_template_test.go:8-40 ---
  private val templateConfig = GraphiteTags.configure(
    enabled = true,
    separator = "_",
    tags = Seq("tag0=value0", "tag1=value1"),
    templates = Seq(
      "*.app a.b.c.measurement",
      "stats.* .host.measurement* region=us-west,tag1=new-value1",
      "multi.tags.* ..a.measurement* tag0=new-value0",
      ".measurement*"
    )
  )

  test("template engine goldens") {
    val cases = Seq(
      "some.metric" -> "metric?tag0=value0&tag1=value1",
      "aval.bval.cval.app" -> "app?a=aval&b=bval&c=cval&tag0=value0&tag1=value1",
      "stats.local.a.b.c.d" -> "a_b_c_d?host=local&region=us-west&tag0=value0&tag1=new-value1",
      "multi.tags.aval.m1.m2.m3" -> "m1_m2_m3?a=aval&tag0=new-value0&tag1=value1"
    )
    for ((in, out) <- cases)
      assert(GraphiteTags.normalize(templateConfig, in) == Right(out), s"input: $in")
  }

  // --- escaping goldens: tests/plain/test.toml:160-186, issues #116/#135 ---
  test("byte-exact escaping goldens") {
    val specSymbols = "spec_symbols;minus=-;plus=+;percent=%;underscore=_;colon=:;hash=#;forward/0=/0"
    assert(
      GraphiteTags.normalize(GraphiteTags.Disabled, specSymbols) ==
        Right("spec_symbols?colon=%3A&forward%2F0=%2F0&hash=%23&minus=-&percent=%25&plus=%2B&underscore=_")
    )
    assert(Escape.path("non-ascii.иван") == "non-ascii.%D0%B8%D0%B2%D0%B0%D0%BD")
    assert(Escape.query("node&a b") == "node%26a+b")
    assert(Escape.path("instance:cpu_utilization?ratio_avg") == "instance:cpu_utilization%3Fratio_avg")
  }

  // --- tagged parse round-trip: uploader/tagged_test.go:25-120 ---
  test("tagged parse round-trip golden") {
    val stored = "instance:cpu_utilization%3Fratio_avg?dc=qwe%2B1&fqdn=asd%26a&instance=10.33.10.10%3A9100&job=node%26a+b"
    val Right((name, nameTag, tags)) = GraphiteTags.parseTagged(stored)
    assert(name == "instance:cpu_utilization?ratio_avg")
    assert(nameTag == "__name__=instance:cpu_utilization?ratio_avg")
    assert(tags == Seq("dc=qwe+1", "fqdn=asd&a", "instance=10.33.10.10:9100", "job=node&a b"))
  }

  test("normalize then parseTagged inverts escaping") {
    val raw = "instance:cpu_utilization?ratio_avg;dc=qwe+1;fqdn=asd&a;instance=10.33.10.10:9100;job=node&a b"
    val Right(canonical) = GraphiteTags.normalize(GraphiteTags.Disabled, raw)
    assert(canonical == "instance:cpu_utilization%3Fratio_avg?dc=qwe%2B1&fqdn=asd%26a&instance=10.33.10.10%3A9100&job=node%26a+b")
    val Right((name, _, tags)) = GraphiteTags.parseTagged(canonical)
    assert(name == "instance:cpu_utilization?ratio_avg")
    assert(tags.contains("job=node&a b"))
  }

  // --- path reverse oracle: helper/RowBinary/reverse_test.go:22-56 ---
  test("path reverse equals naive split-reverse-join") {
    val cases = Seq("", ".", "carbon..xx", ".hello..world.",
      "carbon.agents.carbon-clickhouse.graphite1.tcp.metricsReceived")
    def naive(s: String) = s.split("\\.", -1).reverse.mkString(".")
    for (c <- cases) assert(GraphitePath.reverse(c) == naive(c), s"input: '$c'")
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(""))).map(_.mkString("."))) { s =>
      GraphitePath.reverse(s) == naive(s) && GraphitePath.reverse(GraphitePath.reverse(s)) == s
    }
  }

  test("pathLevel and treeAncestors") {
    assert(GraphitePath.level("a.b.c") == 3)
    assert(GraphitePath.level("a") == 1)
    assert(GraphitePath.treeAncestors("carbon.agents.carbon-clickhouse.writer.writtenBytes") ==
      Seq("carbon.agents.carbon-clickhouse.writer." -> 4,
          "carbon.agents.carbon-clickhouse." -> 3,
          "carbon.agents." -> 2,
          "carbon." -> 1))
    assert(GraphitePath.treeAncestors("a") == Nil)
  }

  // --- double dot removal: receiver/plain_test.go TestRemoveDoubleDot ---
  test("removeDoubleDot") {
    val cases = Seq(
      "" -> "", "a.b.c" -> "a.b.c", "a..b.c" -> "a.b.c", "a...b.c" -> "a.b.c",
      "..a.b.c" -> ".a.b.c", "a.b.c.." -> "a.b.c.", ".." -> "."
    )
    for ((in, out) <- cases) assert(GraphitePath.removeDoubleDot(in) == out, s"input: '$in'")
  }

  // --- plain line parse: receiver/plain.go:53-96 semantics ---
  test("plain line parse") {
    import PlainProtocol._
    assert(parseLine("test.host1.cpu.loadavg 10.2 1625478240", 99) ==
      Right(Parsed("test.host1.cpu.loadavg", 10.2, 1625478240L)))
    assert(parseLine("metric 1 -1\n", 1234) == Right(Parsed("metric", 1.0, 1234L)))
    assert(parseLine("metric 1 1625478240.74\r\n", 0) == Right(Parsed("metric", 1.0, 1625478240L)))
    assert(parseLine("a..b 1 2", 0) == Right(Parsed("a.b", 1.0, 2L)))
    assert(parseLine("cpu.loadavg;env=test2;host=host1;env=test 21.4 1625478300", 0) ==
      Right(Parsed("cpu.loadavg?env=test&host=host1", 21.4, 1625478300L)))
    assert(parseLine("noval", 0).isLeft)
    assert(parseLine("name nan 123", 0).isLeft)
    assert(parseLine("name 1", 0).isLeft)
    assert(parseLine(" 1 2", 0).isLeft)
    assert(parseLine("", 0).isLeft)
  }

  // --- unescape semantics: helper/escape/unescape.go ---
  test("unescape leniency") {
    assert(Escape.unescape("a%20b") == "a b")
    assert(Escape.unescape("a+b") == "a b")
    assert(Escape.unescape("a%zzb") == "a%zzb") // invalid escape passes through
    assert(Escape.unescape("a%2") == "a%2")     // truncated escape passes through
    assert(Escape.unescape("%D0%B8%D0%B2%D0%B0%D0%BD") == "иван")
  }

  test("escape/unescape inverse property") {
    forAll(Gen.asciiPrintableStr) { s =>
      // path mode leaves '+' literal which unescape turns into space,
      // so the path inverse only holds for strings without '+'
      Escape.unescape(Escape.query(s)) == s &&
        (s.contains('+') || Escape.unescape(Escape.path(s)) == s)
    }
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.const('и'), Gen.const('.'), Gen.const(' '), Gen.const('%'))).map(_.mkString)) { s =>
      Escape.unescape(Escape.query(s)) == s
    }
  }

  // --- blacklist trie: uploader/filter.go semantics ---
  test("blacklist glob trie") {
    val bl = new Blacklist(Seq("a.b.c.d", "a.b.c.d.e", "a.b.d.c", "a.b.c.d.f", "k.b.*.f"))
    assert(bl.contains("a.b.c.d"))
    assert(bl.contains("a.b.c.d.e"))
    assert(bl.contains("k.b.anything.f"))
    assert(!bl.contains("a.b.c"))       // shorter than any pattern of its length
    assert(!bl.contains("a.b.c.x"))
    assert(!bl.contains("k.b.two.seg.f")) // '*' is exactly one segment
    // reverse orientation matches reversed names
    assert(bl.contains("d.c.b.a", isReverse = true))
    assert(bl.contains("f.anything.b.k", isReverse = true))
    assert(!bl.contains("a.b.c.d", isReverse = true))
  }

  test("blacklist trie equals naive glob match (property)") {
    val segGen = Gen.oneOf("a", "b", "c", "d", "*")
    val patGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, segGen).map(_.mkString(".")))
    val pathGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "x")).map(_.mkString(".")))
    checkProp(Prop.forAll(Gen.listOfN(5, patGen), pathGen) { (pats: List[String], path: String) =>
      val bl = new Blacklist(pats)
      val naive = pats.exists { p =>
        val ps = p.split("\\.", -1); val xs = path.split("\\.", -1)
        ps.length == xs.length && ps.zip(xs).forall { case (a, b) => a == "*" || a == b }
      }
      bl.contains(path) == naive
    })
  }

  // --- dates ---
  test("date conversion") {
    assert(Dates.utcTimestampToDays(1625478240L) == 18813) // 2021-07-05
    assert(Dates.daysToDate(42).toString == "1970-02-12")
    assert(Dates.daysToDate(18813).toString == "2021-07-05")
    // local mode differs from UTC for a timestamp near midnight
    val zone = java.time.ZoneId.of("America/New_York")
    assert(Dates.localTimestampToDays(1625450000L, zone) == 18812) // still Jul 4 in NY
    assert(Dates.utcTimestampToDays(1625450000L) == 18813)
  }

  test("rollup rule selection") {
    val c = Rollup.ReferenceConfig
    assert(c.ruleFor("a.b.sum").fn == Rollup.Sum)
    assert(c.ruleFor("a.b.min").fn == Rollup.Min)
    assert(c.ruleFor("a.b.max").fn == Rollup.Max)
    assert(c.ruleFor("a.b.c").fn == Rollup.Avg)
    assert(c.ruleFor("a.summary").fn == Rollup.Avg) // anchored at end
  }

  test("rollup.xml loads: the reference deployment's own config file") {
    // the exact shape carbon-clickhouse ships for its e2e ClickHouse
    // (tests/clickhouse/rollup/rollup.xml): yandex wrapper, default avg,
    // one pattern per agg suffix, multi-retention
    val xml =
      """<yandex><graphite_rollup>
        |  <default>
        |    <function>avg</function>
        |    <retention><age>0</age><precision>60</precision></retention>
        |    <retention><age>2592000</age><precision>3600</precision></retention>
        |  </default>
        |  <pattern>
        |    <regexp>\.sum$</regexp><function>sum</function>
        |    <retention><age>0</age><precision>1</precision></retention>
        |  </pattern>
        |  <pattern>
        |    <regexp>\.max$</regexp><function>max</function>
        |    <retention><age>0</age><precision>1</precision></retention>
        |  </pattern>
        |</graphite_rollup></yandex>""".stripMargin
    val c = Rollup.fromXml(xml)
    assert(c.ruleFor("a.b.sum").fn == Rollup.Sum)
    assert(c.ruleFor("a.b.max").fn == Rollup.Max)
    assert(c.ruleFor("a.b.c").fn == Rollup.Avg)
    // multi-retention: age picks the precision
    val d = c.ruleFor("a.b.c")
    assert(c.precisionFor(d, 100) == 60)
    assert(c.precisionFor(d, 3000000) == 3600)
    // pattern order preserved; unknown function rejected loudly
    intercept[IllegalArgumentException] {
      Rollup.fromXml("<graphite_rollup><default><function>anyLast</function>" +
        "<retention><age>0</age><precision>1</precision></retention></default></graphite_rollup>")
    }
  }

  test("scriptMix kernel property: one UTF-8 walk equals per-codepoint classification") {
    import org.apache.spark.unsafe.types.UTF8String
    def cls(cp: Int): Int =
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0xC0 && cp <= 0x24F)) 0
      else if (cp >= 0x400 && cp <= 0x4FF) 1
      else if (cp >= 0x370 && cp <= 0x3FF) 2
      else if (cp >= 0x600 && cp <= 0x6FF) 3
      else if (cp >= 0x590 && cp <= 0x5FF) 4
      else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
        (cp >= 0xAC00 && cp <= 0xD7AF)) 5
      else if (cp >= '0' && cp <= '9') 6
      else -1
    // boundary code points of every class edge + fillers + supplementary
    val cps = Seq('a'.toInt, 'Z'.toInt, '5'.toInt, '!'.toInt, ' '.toInt,
      0xBF, 0xC0, 0x24F, 0x250, 0x36F, 0x370, 0x3FF, 0x400, 0x4FF, 0x500,
      0x58F, 0x590, 0x5FF, 0x600, 0x6FF, 0x700, 0x303F, 0x3040, 0x30FF,
      0x3100, 0x4DFF, 0x4E00, 0x9FFF, 0xA000, 0xABFF, 0xAC00, 0xD7AF, 0xD7B0,
      0x1F600, 0x10000)
    val doc = Gen.listOf(Gen.oneOf(cps)).map(_.flatMap(Character.toChars(_)).mkString)
    forAll(doc) { s =>
      val got = graft.operators.ScriptMixStats.counts(UTF8String.fromString(s)).toLongArray()
      val want = new Array[Long](7)
      s.codePoints().forEach { cp => val c = cls(cp); if (c >= 0) want(c) += 1 }
      got.toSeq == want.toSeq
    }
  }

  test("gopherStats property: one-walk kernel equals the documented-semantics reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    val spaceChars = " \t\n\f\r".toSet
    def ref(s: String): Seq[Long] = {
      val words = s.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val lowerWords = s.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSet
      val lines = s.split("\n", -1)
      var nChars = 0L
      s.codePoints().forEach(cp => if (cp > 0xff || !spaceChars.contains(cp.toChar)) nChars += 1)
      Seq(
        words.length.toLong,
        nChars,
        words.count(_.exists(ch => (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z'))).toLong,
        lines.length.toLong,
        lines.count { l =>
          val t = l.dropWhile(c => c == ' ' || c == '\t')
          t.nonEmpty && (t(0) == '-' || t(0) == '*' || t(0) == '•')
        }.toLong,
        lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong,
        s.count(_ == '#').toLong,
        ((s.length - s.replace("...", "").length) / 3 + s.count(_ == '…')).toLong,
        stops.count(lowerWords.contains).toLong)
    }
    val tokens = Seq("the", "be", "with", "That", "word", "ф", "日", "#", "...",
      "..", "....", ".....", "…", "….", "•x", "- y", "* z", "\t•",
      "\n", "\r", " ", "\t", "a#b", "ends...", "ends…", "A")
    val doc = Gen.listOf(Gen.oneOf(tokens)).map(_.mkString)
    forAll(doc) { s =>
      graft.operators.GopherStats.stats(UTF8String.fromString(s))
        .toLongArray().toSeq == ref(s)
    }
  }

  test("ngramHashes property: byte-walk kernel equals the split/sliding reference") {
    import org.apache.spark.unsafe.Platform
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import java.nio.charset.StandardCharsets.UTF_8
    def ref(s: String, n: Int): Seq[Long] = {
      val words = s.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      if (words.length < n) Nil
      else words.sliding(n).map { g =>
        val b = g.mkString(" ").getBytes(UTF_8)
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }.toSeq
    }
    // alphabet mixes multibyte UTF-8, every space byte the kernel
    // recognizes, and long words (scratch-buffer regrowth path)
    val token = Gen.oneOf(Gen.const("a"), Gen.const("ф"), Gen.const("日"),
      Gen.const("longword" * 12), Gen.alphaNumStr)
    val sep = Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "  ", " \t ")
    val doc = Gen.listOf(Gen.zip(token, sep)).map(_.map { case (t, s) => t + s }.mkString)
    val gen = Gen.zip(doc, Gen.choose(1, 4))
    forAll(gen) { case (s, n) =>
      val got = graft.operators.Shingles.ngramHashes(UTF8String.fromString(s), n)
      got.toLongArray().toSeq == ref(s, n)
    }
  }
}

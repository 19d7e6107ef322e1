package graft.core

/**
 * Graphite rollup rules: first-matching regex selects the aggregation
 * function; the row's age selects the precision (bucket width).
 * Model of the GraphiteMergeTree rollup config the reference targets
 * (/root/reference/tests/clickhouse/rollup/rollup.xml).
 */
object Rollup {

  sealed abstract class AggFn(val name: String)
  case object Avg extends AggFn("avg")
  case object Sum extends AggFn("sum")
  case object Min extends AggFn("min")
  case object Max extends AggFn("max")

  /** (age seconds, precision seconds) — sorted by age ascending. */
  final case class Retention(age: Long, precision: Long)

  final case class Rule(pattern: scala.util.matching.Regex, fn: AggFn, retention: Seq[Retention])

  final case class Config(rules: Seq[Rule], default: Rule) {
    /** First-matching rule, else default (unanchored regex find). */
    def ruleFor(path: String): Rule =
      rules.find(_.pattern.findFirstIn(path).isDefined).getOrElse(default)

    /** Bucket width for a point of the given age under a rule. */
    def precisionFor(rule: Rule, ageSeconds: Long): Long = {
      var p = rule.retention.head.precision
      for (r <- rule.retention if ageSeconds >= r.age) p = r.precision
      p
    }
  }

  private val FnByName: Map[String, AggFn] =
    Seq(Avg, Sum, Min, Max).map(f => f.name -> f).toMap

  /**
   * Parse a ClickHouse GraphiteMergeTree rollup XML — the file a
   * reference deployment already has (tests/clickhouse/rollup/
   * rollup.xml): `<pattern>` entries with `<regexp>/<function>/
   * <retention><age><precision>`, one `<default>`, any wrapper
   * elements (`<yandex>`, `<clickhouse>`) tolerated. Pattern order is
   * preserved (first match wins, like the engine). Unknown aggregation
   * functions are rejected loudly rather than silently averaged.
   */
  def fromXml(xml: String): Config = {
    val root = scala.xml.XML.loadString(xml)
    def retentions(n: scala.xml.Node): Seq[Retention] = {
      val rs = (n \ "retention").map { r =>
        Retention((r \ "age").text.trim.toLong, (r \ "precision").text.trim.toLong)
      }
      require(rs.nonEmpty, "rollup entry without <retention>")
      rs.sortBy(_.age)
    }
    def fn(n: scala.xml.Node): AggFn = {
      val name = (n \ "function").text.trim
      FnByName.getOrElse(name,
        throw new IllegalArgumentException(s"unsupported rollup function: '$name'"))
    }
    val patterns = (root \\ "pattern").map { p =>
      val re = (p \ "regexp").text.trim
      require(re.nonEmpty, "<pattern> without <regexp>")
      Rule(re.r, fn(p), retentions(p))
    }
    val defaults = root \\ "default"
    require(defaults.length == 1, s"expected exactly one <default>, got ${defaults.length}")
    Config(patterns, Rule("".r, fn(defaults.head), retentions(defaults.head)))
  }

  /** The shipped test config: default avg; `\.sum$`->sum, `\.min$`->min, `\.max$`->max. */
  val ReferenceConfig: Config = Config(
    rules = Seq(
      Rule("""\.sum$""".r, Sum, Seq(Retention(0, 1))),
      Rule("""\.min$""".r, Min, Seq(Retention(0, 1))),
      Rule("""\.max$""".r, Max, Seq(Retention(0, 1)))
    ),
    default = Rule("""""".r, Avg, Seq(Retention(0, 1)))
  )
}

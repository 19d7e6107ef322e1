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

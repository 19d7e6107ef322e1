package graft.core

/**
 * Graphite tagged-name normalization and the InfluxDB-style template
 * engine that converts plain dotted names into tagged form.
 *
 * Canonical form: `escapedName?k1=v1&k2=v2` — keys stable-sorted,
 * duplicate keys resolved last-wins, name path-escaped, keys/values
 * query-escaped. Mirrors /root/reference/helper/tags/graphite.go:45-184
 * (golden table: helper/tags/graphite_test.go:15-33).
 */
object GraphiteTags {

  final case class TagTemplate(
      filter: Option[scala.util.matching.Regex], // None = empty filter (matches names containing '.')
      template: Array[String],
      extraTags: Map[String, String]
  )

  final case class TagConfig(
      enabled: Boolean = false,
      separator: String = "_",
      globalTags: Map[String, String] = Map.empty,
      templates: Seq[TagTemplate] = Nil
  )

  val Disabled: TagConfig = TagConfig()

  /**
   * Compile a template config from its TOML string forms, e.g.
   * `"stats.* .host.measurement* region=us-west,tag1=new-value1"`.
   * Token rules per graphite.go:227-262: 1 token = template; 2 tokens =
   * (template, tags) if the 2nd contains '=', else (filter, template);
   * 3 tokens = (filter, template, tags).
   */
  def configure(
      enabled: Boolean,
      separator: String,
      tags: Seq[String],
      templates: Seq[String]
  ): TagConfig = {
    def tagMap(pairs: Seq[String]): Map[String, String] =
      if (pairs.isEmpty || pairs.head.isEmpty) Map.empty
      else pairs.map { t => val Array(k, v) = t.split("=", 2); (k, v) }.toMap

    val descs = templates.map { s =>
      val tokens = s.split("\\s+").iterator.map(_.trim).filter(_.nonEmpty).toArray
      require(tokens.length <= 3, s"wrong template format: $s")
      val (filter, template, tagStr) = tokens.length match {
        case 1 => ("", tokens(0), "")
        case 2 =>
          if (tokens(1).contains("=")) ("", tokens(0), tokens(1))
          else (tokens(0), tokens(1), "")
        case 3 => (tokens(0), tokens(1), tokens(2))
      }
      TagTemplate(compileFilter(filter), template.split("\\.", -1), tagMap(tagStr.split(",").toSeq))
    }
    TagConfig(enabled, separator, tagMap(tags), descs)
  }

  /**
   * Glob filter -> anchored regex (graphite.go:205-221): leading/trailing
   * `*` unanchor that end, `.` is literal, inner `*` = one segment
   * (`[^.]*`). Empty filter matches any name containing a '.' (the
   * reference compiles `[.]^*`, i.e. an unanchored literal dot).
   */
  private[core] def compileFilter(filter: String): Option[scala.util.matching.Regex] = {
    if (filter.isEmpty) return None
    var f = filter
    var begin = "^"
    var end = "$"
    if (f.startsWith("*")) { begin = ""; f = f.substring(1) }
    if (f.endsWith("*")) { end = ""; f = f.substring(0, f.length - 1) }
    val body = f.replace(".", "\\.").replace("*", "[^\\.]*")
    Some(new scala.util.matching.Regex(begin + body + end))
  }

  /** Unanchored regex find, matching Go's regexp.Match semantics. */
  @inline private def filterMatches(t: TagTemplate, name: String): Boolean = t.filter match {
    case None    => name.indexOf('.') >= 0
    case Some(r) => r.findFirstIn(name).isDefined
  }

  /**
   * Normalize a raw received name (`name;k=v;...` or plain) into canonical
   * form. Returns Left(error) on unparseable tags, Right(canonical).
   * A plain name with templates enabled but no matching template yields
   * Right("") — an intentional reference quirk (graphite.go:332 returns an
   * empty name without error).
   */
  def normalize(config: TagConfig, raw: String): Either[String, String] = {
    var s = raw
    if (config.enabled && s.indexOf(';') < 0) {
      s = applyTemplates(config, s)
    }
    val pos = s.indexOf(';')
    if (pos < 0) return Right(s)
    if (pos == 0) return Left(s"cannot parse path '$s', no metric found")
    val name = s.substring(0, pos)

    // parse `k=v;k2=v2` — empty segment or missing '=' (or '=' first) is an error
    val kvs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rest = s.substring(pos + 1)
    var done = false
    while (!done) {
      val semi = rest.indexOf(';')
      val seg = if (semi < 0) rest else rest.substring(0, semi)
      if (semi == 0) return Left(s"cannot parse path '$raw', empty segment")
      val eq = seg.indexOf('=')
      if (eq < 1) return Left(s"cannot parse path '$raw', invalid segment '$seg', no '='")
      kvs += ((seg.substring(0, eq), seg.substring(eq + 1)))
      if (semi < 0) done = true else rest = rest.substring(semi + 1)
    }

    // stable sort by key, duplicate keys -> LAST occurrence wins
    // (graphite.go:98-114; golden `k=a;k=_;k2=3;k=0;k=42` -> `k=42&k2=3`)
    val sorted = kvs.sortBy(_._1)(Ordering.String) // ArrayBuffer.sortBy is stable
    val dedup = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (kv <- sorted) {
      if (dedup.nonEmpty && dedup.last._1 == kv._1) dedup(dedup.length - 1) = kv
      else dedup += kv
    }

    val sb = new java.lang.StringBuilder(s.length + 10)
    sb.append(Escape.path(name)).append('?')
    var i = 0
    while (i < dedup.length) {
      if (i > 0) sb.append('&')
      sb.append(Escape.query(dedup(i)._1)).append('=').append(Escape.query(dedup(i)._2))
      i += 1
    }
    Right(sb.toString)
  }

  /**
   * First-matching-template conversion of a plain dotted name to
   * `measurement;k=v;...` intermediate form (graphite.go:283-333).
   * Returns "" when no template matches (reference quirk preserved).
   */
  private[core] def applyTemplates(config: TagConfig, s: String): String = {
    for (desc <- config.templates) {
      if (filterMatches(desc, s)) {
        val names = s.split("\\.", -1)
        val tpl = desc.template
        val lastIsGlob = tpl.last.endsWith("*")
        val lengthOk =
          !((names.length != tpl.length && !lastIsGlob) || names.length < tpl.length)
        if (lengthOk) {
          val tagMap = scala.collection.mutable.LinkedHashMap.empty[String, String]
          tagMap ++= config.globalTags
          tagMap ++= desc.extraTags
          val measurement = new java.lang.StringBuilder
          var i = 0
          var broke = false
          while (i < names.length && i < tpl.length && !broke) {
            // template may be shorter than names only when last entry is a glob
            tpl(i) match {
              case ""            => // skip segment
              case "measurement" => measurement.append(names(i)).append(config.separator)
              case "measurement*" =>
                measurement.append(names.slice(i, names.length).mkString(config.separator))
                broke = true
              case key =>
                tagMap.get(key) match {
                  // pre-existing value (incl. globals) gets the segment appended
                  case Some(prev) => tagMap(key) = prev + config.separator + names(i)
                  case None       => tagMap(key) = names(i)
                }
            }
            i += 1
          }
          var m = measurement.toString
          // reference strips a trailing literal "_" regardless of separator
          if (m.endsWith("_")) m = m.substring(0, m.length - 1)
          val tags = tagMap.iterator.map { case (k, v) => s";$k=$v" }.mkString
          return m + tags
        }
      }
    }
    ""
  }

  /**
   * Parse a canonical tagged path back into (name, nameTag, tags[]) with
   * everything unescaped; tags keep the `k=v` joined form and canonical
   * order. Mirrors uploader/tagged.go:91-119 (incl. the corrupted-tag
   * break: a trailing fragment with no '=' is silently dropped).
   */
  def parseTagged(path: String): Either[String, (String, String, Seq[String])] = {
    val delim = path.indexOf('?')
    if (delim < 1) return Left(s"incomplete tags in '$path'")
    val name = Escape.unescape(path.substring(0, delim))
    val nameTag = "__name__=" + name
    val tags = Seq.newBuilder[String]
    var args = path.substring(delim + 1)
    var done = false
    while (!done) {
      val eq = args.indexOf('=')
      if (eq == -1) done = true // corrupted tag: drop remainder
      else {
        val amp = args.indexOf('&', eq + 1)
        if (amp == -1) { tags += Escape.unescape(args); done = true }
        else { tags += Escape.unescape(args.substring(0, amp)); args = args.substring(amp + 1) }
      }
    }
    Right((name, nameTag, tags.result()))
  }
}

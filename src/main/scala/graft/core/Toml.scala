package graft.core

/**
 * Minimal TOML reader covering the subset the reference's config files
 * use (/root/reference/carbon/config.go:38-302 and the deploy confs):
 * `[table]` / `[a.b]` headers, bare or quoted keys, basic strings,
 * integers/floats/booleans, single- and multi-line arrays, `#`
 * comments. Not a general TOML implementation — no dates, no inline
 * tables, no dotted keys, no escapes beyond \" \\ \n \t \r.
 */
object Toml {

  sealed trait Value
  final case class Str(v: String) extends Value
  final case class Num(v: Double) extends Value
  final case class IntV(v: Long) extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Arr(v: Seq[Value]) extends Value

  /** table-path ("" for root, "upload.graphite" for [upload.graphite]) -> key -> value */
  type Doc = Map[String, Map[String, Value]]

  def parse(text: String): Doc = {
    val doc = collection.mutable.LinkedHashMap[String, collection.mutable.LinkedHashMap[String, Value]]()
    var table = ""
    doc(table) = collection.mutable.LinkedHashMap()

    // join physical lines while an array's brackets are unbalanced
    val logical = collection.mutable.ArrayBuffer[String]()
    var pending = new StringBuilder
    var depth = 0
    for (raw <- text.linesIterator) {
      val line = stripComment(raw)
      pending.append(if (pending.nonEmpty) " " else "").append(line.trim)
      // count brackets only while inside a value: a [table] header line
      // balances itself, but every line of an open multi-line array counts
      // (including a bare closing "]")
      if (depth > 0 || line.contains("=")) depth += bracketDelta(line)
      if (depth <= 0) {
        if (pending.toString.trim.nonEmpty) logical += pending.toString.trim
        pending = new StringBuilder
        depth = 0
      }
    }
    if (pending.toString.trim.nonEmpty) logical += pending.toString.trim

    for (line <- logical) {
      if (line.startsWith("[") && line.endsWith("]")) {
        table = line.substring(1, line.length - 1).trim
        if (!doc.contains(table)) doc(table) = collection.mutable.LinkedHashMap()
      } else {
        val eq = indexOfUnquoted(line, '=')
        require(eq > 0, s"bad TOML line: $line")
        val key = unquoteKey(line.substring(0, eq).trim)
        val value = parseValue(line.substring(eq + 1).trim)
        doc(table)(key) = value
      }
    }
    doc.view.mapValues(_.toMap).toMap
  }

  // ---- accessors ----

  def str(doc: Doc, table: String, key: String): Option[String] =
    doc.get(table).flatMap(_.get(key)).collect { case Str(s) => s }
  def bool(doc: Doc, table: String, key: String, default: Boolean = false): Boolean =
    doc.get(table).flatMap(_.get(key)).collect { case Bool(b) => b }.getOrElse(default)
  def long(doc: Doc, table: String, key: String): Option[Long] =
    doc.get(table).flatMap(_.get(key)).collect { case IntV(v) => v; case Num(v) => v.toLong }
  def strings(doc: Doc, table: String, key: String): Seq[String] =
    doc.get(table).flatMap(_.get(key)).collect {
      case Arr(vs) => vs.collect { case Str(s) => s }
      case Str(s)  => Seq(s)
    }.getOrElse(Nil)
  /** All table paths under `prefix.` (e.g. uploads for prefix "upload"). */
  def tablesUnder(doc: Doc, prefix: String): Seq[String] =
    doc.keys.filter(_.startsWith(prefix + ".")).toSeq.sorted

  /**
   * Reference Size option (helper/config/size.go:12-37): a bare integer
   * is BYTES (the reference's tests use `chunk-max-size = 128` = 128
   * bytes), a k/m/g suffix multiplies by 1024^n, negative is rejected.
   * Accepts both TOML integers and quoted strings ("512m").
   */
  def sizeBytes(doc: Doc, table: String, key: String): Option[Long] =
    doc.get(table).flatMap(_.get(key)).map {
      case IntV(v) => require(v >= 0, s"size must be greater than 0: $key"); v
      case Num(v)  => require(v >= 0, s"size must be greater than 0: $key"); v.toLong
      case Str(s)  => parseSize(s)
      case other   => throw new IllegalArgumentException(s"bad size for $key: $other")
    }

  /** "128" -> 128 bytes, "512k"/"64m"/"1g" -> suffixed multiples of 1024. */
  def parseSize(s: String): Long = {
    val t = s.trim.toLowerCase
    require(t.nonEmpty, "empty size")
    val (num, mult) = t.last match {
      case 'k' => (t.dropRight(1).trim, 1024L)
      case 'm' => (t.dropRight(1).trim, 1024L * 1024)
      case 'g' => (t.dropRight(1).trim, 1024L * 1024 * 1024)
      case _   => (t, 1L)
    }
    val v = num.toLong * mult
    require(v >= 0, "size must be greater than 0")
    v
  }

  /**
   * Go-style duration ("2m30s", "1h", "100ms", "0s") to milliseconds.
   * The reference treats a zero duration as "disabled" for drop windows.
   */
  def durationMs(s: String): Long = {
    val re = "([0-9]+(?:\\.[0-9]+)?)(ms|s|m|h|d)".r
    val trimmed = s.trim
    require(trimmed.nonEmpty, "empty duration")
    if (trimmed == "0") return 0L
    var total = 0.0
    var matched = 0
    for (m <- re.findAllMatchIn(trimmed)) {
      matched += m.matched.length
      val n = m.group(1).toDouble
      total += (m.group(2) match {
        case "ms" => n
        case "s"  => n * 1000
        case "m"  => n * 60000
        case "h"  => n * 3600000
        case "d"  => n * 86400000
      })
    }
    require(matched == trimmed.length, s"bad duration: $s")
    total.toLong
  }

  // ---- internals ----

  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && (i == 0 || line.charAt(i - 1) != '\\')) inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def bracketDelta(line: String): Int = {
    var inStr = false
    var d = 0
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && (i == 0 || line.charAt(i - 1) != '\\')) inStr = !inStr
      else if (!inStr && c == '[') d += 1
      else if (!inStr && c == ']') d -= 1
      i += 1
    }
    d
  }

  private def indexOfUnquoted(line: String, ch: Char): Int = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && (i == 0 || line.charAt(i - 1) != '\\')) inStr = !inStr
      else if (c == ch && !inStr) return i
      i += 1
    }
    -1
  }

  private def unquoteKey(k: String): String =
    if (k.startsWith("\"") && k.endsWith("\"")) unescape(k.substring(1, k.length - 1)) else k

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case o    => sb.append(c).append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseValue(v: String): Value = {
    val t = v.trim
    if (t.startsWith("\"")) Str(unescape(t.substring(1, t.lastIndexOf('"'))))
    else if (t == "true") Bool(true)
    else if (t == "false") Bool(false)
    else if (t.startsWith("[")) {
      val inner = t.substring(1, t.lastIndexOf(']'))
      Arr(splitTopLevel(inner).map(parseValue))
    }
    else if (t.matches("[+-]?[0-9]+")) IntV(t.toLong)
    else if (t.matches("[+-]?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?")) Num(t.toDouble)
    else Str(t) // bare value (lenient: the reference's configs quote strings)
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer[String]()
    var inStr = false
    var depth = 0
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) { inStr = !inStr; cur.append(c) }
      else if (!inStr && c == '[') { depth += 1; cur.append(c) }
      else if (!inStr && c == ']') { depth -= 1; cur.append(c) }
      else if (!inStr && depth == 0 && c == ',') { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

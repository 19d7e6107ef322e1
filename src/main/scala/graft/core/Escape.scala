package graft.core

/**
 * Graphite-flavoured RFC-3986 percent-escaping.
 *
 * Byte-exact re-implementation of the escaping rules the reference engine
 * applies to metric names (path mode) and tag key/values (query mode):
 * see /root/reference/helper/escape/escape.go:6-21 and url.go:32-107.
 * The goldens (e.g. `%D0%B8%D0%B2%D0%B0%D0%BD`, `+` for space in query
 * mode) depend on these exact tables — java.net.URLEncoder does NOT match
 * (it escapes `~`, leaves `*`, etc.), hence the hand-rolled version.
 */
object Escape {
  private final val HexUpper = "0123456789ABCDEF"

  /** Should byte c be escaped in path mode? (url.go:46-107, encodePath) */
  @inline private def shouldEscapePath(c: Byte): Boolean = {
    val ch = c & 0xff
    if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')) false
    else
      (ch: @annotation.switch) match {
        case '-' | '_' | '.' | '~' => false // unreserved marks
        case '$' | '&' | '+' | ',' | '/' | ':' | ';' | '=' | '@' => false // reserved allowed in path
        case '?' => true
        case _ => true
      }
  }

  /** Should byte c be escaped in query-component mode? Everything but unreserved. */
  @inline private def shouldEscapeQuery(c: Byte): Boolean = {
    val ch = c & 0xff
    if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')) false
    else
      (ch: @annotation.switch) match {
        case '-' | '_' | '.' | '~' => false
        case _ => true // incl. space, handled specially (-> '+')
      }
  }

  private def escape(s: String, query: Boolean): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var needs = false
    var i = 0
    while (i < bytes.length && !needs) {
      val c = bytes(i)
      if (if (query) shouldEscapeQuery(c) else shouldEscapePath(c)) needs = true
      i += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      val esc = if (query) shouldEscapeQuery(c) else shouldEscapePath(c)
      if (esc) {
        if (query && c == ' ') sb.append('+')
        else {
          sb.append('%')
          sb.append(HexUpper.charAt((c >> 4) & 0xf))
          sb.append(HexUpper.charAt(c & 0xf))
        }
      } else sb.append(c.toChar)
      i += 1
    }
    sb.toString
  }

  /** Escape for use as the metric-name part (before `?`). */
  def path(s: String): String = escape(s, query = false)

  /** Escape for use as a tag key or value (after `?`). Space -> `+`. */
  def query(s: String): String = escape(s, query = true)

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  @inline private def unhex(c: Char): Int =
    if (c <= '9') c - '0' else if (c >= 'a') c - 'a' + 10 else c - 'A' + 10

  /**
   * Unescape percent-encoding; `+` -> space; malformed escapes pass through
   * literally. Mirrors /root/reference/helper/escape/unescape.go:33-78
   * (both path and query positions use this one lenient decoder).
   */
  def unescape(s: String): String = {
    var first = -1
    var i = 0
    while (i < s.length && first < 0) {
      val c = s.charAt(i)
      if (c == '%' || c == '+') first = i
      i += 1
    }
    if (first < 0) return s
    // Decode into bytes (percent escapes are raw UTF-8 bytes), then re-string.
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(in.length)
    i = 0
    while (i < in.length) {
      val c = in(i).toChar
      if (c == '%') {
        if (in.length < i + 3) { // truncated escape: copy rest verbatim
          while (i < in.length) { out.write(in(i)); i += 1 }
        } else if (isHex(in(i + 1).toChar) && isHex(in(i + 2).toChar)) {
          out.write((unhex(in(i + 1).toChar) << 4) | unhex(in(i + 2).toChar))
          i += 3
        } else { // invalid escape: copy the 3 chars verbatim (unescape.go:47-49)
          out.write(in(i)); out.write(in(i + 1)); out.write(in(i + 2))
          i += 3
        }
      } else if (c == '+') { out.write(' '); i += 1 }
      else { out.write(in(i)); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}

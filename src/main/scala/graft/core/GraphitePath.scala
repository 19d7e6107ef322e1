package graft.core

/**
 * Pure path-string kernels shared by the ingest pipeline and the query
 * layer. Semantics mirror the reference engine:
 *  - reverse:      /root/reference/helper/RowBinary/reader.go:71-102
 *  - level:        /root/reference/uploader/utils.go:13-21
 *  - double dots:  /root/reference/receiver/plain.go:22-51
 *  - tree prefixes:/root/reference/uploader/index.go:56-81
 */
object GraphitePath {

  /** Segment-wise reversal: `a.b.c` -> `c.b.a`. Empty segments preserved. */
  def reverse(path: String): String = {
    if (path.isEmpty) return path
    val sb = new java.lang.StringBuilder(path.length)
    var end = path.length
    var i = path.length - 1
    while (i >= 0) {
      if (path.charAt(i) == '.') {
        sb.append(path, i + 1, end)
        sb.append('.')
        end = i
      }
      i -= 1
    }
    sb.append(path, 0, end)
    sb.toString
  }

  /** Number of dot-separated segments (= dots + 1). */
  def level(path: String): Int = {
    var n = 1
    var i = 0
    while (i < path.length) {
      if (path.charAt(i) == '.') n += 1
      i += 1
    }
    n
  }

  /** Collapse runs of consecutive dots: `a..b` -> `a.b`. */
  def removeDoubleDot(path: String): String = {
    if (!hasDoubleDot(path)) return path
    val sb = new java.lang.StringBuilder(path.length)
    var prevDot = false
    var i = 0
    while (i < path.length) {
      val c = path.charAt(i)
      if (c != '.' || !prevDot) sb.append(c)
      prevDot = c == '.'
      i += 1
    }
    sb.toString
  }

  def hasDoubleDot(path: String): Boolean = {
    var i = 1
    while (i < path.length) {
      if (path.charAt(i) == '.' && path.charAt(i - 1) == '.') return true
      i += 1
    }
    false
  }

  /**
   * Ancestor prefixes for the tree index, dot-terminated, deepest first:
   * `a.b.c` -> Seq("a.b." -> 2, "a." -> 1). The full path itself is NOT
   * included. Pair = (prefix, level). Mirrors the `for l--; l > 0` walk in
   * index.go:56-81 (without the seen-set early stop, which is a dedup
   * optimization — set semantics are identical after distinct()).
   */
  def treeAncestors(path: String): Seq[(String, Int)] = {
    val out = Seq.newBuilder[(String, Int)]
    var l = level(path) - 1
    var end = path.length
    while (l > 0) {
      val idx = path.lastIndexOf('.', end - 1)
      out += ((path.substring(0, idx + 1), l))
      end = idx
      l -= 1
    }
    out.result()
  }

  /** True if the canonical name is a tagged series (`name?k=v&...`). */
  @inline def isTagged(path: String): Boolean = path.indexOf('?') >= 0
}

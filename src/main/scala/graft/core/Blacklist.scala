package graft.core

/**
 * Glob blacklist for plain metric paths (`ignored-patterns`).
 *
 * Pattern semantics per /root/reference/uploader/filter.go:44-149:
 * patterns are dot-paths where `*` matches exactly one whole-or-partial
 * segment position in the trie; a path matches only a pattern with the
 * SAME segment count. Patterns are compiled into per-length tries in both
 * left-to-right and right-to-left orientation (the reverse-points uploader
 * matches reversed names). Tagged series bypass the blacklist entirely
 * (points.go:56-58).
 */
final class Blacklist(patterns: Seq[String]) extends Serializable {

  private type Node = java.util.HashMap[String, AnyRef] // value: Node

  private def buildTries(reverse: Boolean): Map[Int, Node] = {
    val groups = patterns.groupBy(p => p.split("\\.", -1).length)
    groups.map { case (len, pats) =>
      val root = new Node
      for (p <- pats) {
        val segs0 = p.split("\\.", -1)
        val segs = if (reverse) segs0.reverse else segs0
        var node = root
        for (s <- segs) {
          var child = node.get(s).asInstanceOf[Node]
          if (child == null) { child = new Node; node.put(s, child) }
          node = child
        }
      }
      (len, root)
    }
  }

  private val l2r: Map[Int, Node] = buildTries(reverse = false)
  private val r2l: Map[Int, Node] = buildTries(reverse = true)

  def contains(path: String, isReverse: Boolean = false): Boolean = {
    val segs = path.split("\\.", -1)
    val group = if (isReverse) r2l else l2r
    group.get(segs.length) match {
      case None       => false
      case Some(root) => matches(root, segs, 0)
    }
  }

  private def matches(node: Node, segs: Array[String], i: Int): Boolean = {
    if (i == segs.length) return true
    val exact = node.get(segs(i)).asInstanceOf[Node]
    if (exact != null && matches(exact, segs, i + 1)) return true
    val wild = node.get("*").asInstanceOf[Node]
    wild != null && matches(wild, segs, i + 1)
  }

  def isEmpty: Boolean = patterns.isEmpty
}

package graft.core

/**
 * Fixed-capacity ring of the last N dropped input lines with the drop
 * reason — the reference's main triage tool for "where did my metric
 * go" (/root/reference/receiver/base.go:16,88-127 exposes the same data
 * at /debug/receive/<proto>/dropped/).
 */
final class DroppedRing(capacity: Int = 1000) {
  require(capacity > 0)
  private val buf = new Array[(Long, String, String)](capacity)
  private var next = 0L // monotone insert counter
  private val lock = new Object

  def record(line: String, reason: String): Unit = lock.synchronized {
    buf((next % capacity).toInt) = (next, line, reason)
    next += 1
  }

  def size: Int = lock.synchronized(math.min(next, capacity.toLong).toInt)

  /** Oldest-to-newest snapshot of (line, reason). */
  def dump(): Seq[(String, String)] = lock.synchronized {
    val n = math.min(next, capacity.toLong).toInt
    (0 until n).map { i =>
      val e = buf(((next - n + i) % capacity).toInt)
      (e._2, e._3)
    }
  }
}

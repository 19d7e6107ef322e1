package graft.core

/**
 * Per-receiver drop filters (/root/reference/receiver/base.go:68-86):
 * drop-future (ts too far ahead of receive time), drop-past (ts too far
 * behind), drop-longer-than (name length cap). A disabled window is
 * `None` — the reference encodes "disabled" as a zero duration
 * (carbon/config.go:38-42).
 */
final case class DropFilter(
    dropFutureSec: Option[Long] = None,
    dropPastSec: Option[Long] = None,
    dropLongerThan: Option[Int] = None) {

  def isEmpty: Boolean = dropFutureSec.isEmpty && dropPastSec.isEmpty && dropLongerThan.isEmpty

  /** True if the point survives all configured filters. */
  def accepts(name: String, ts: Long, now: Long): Boolean =
    dropFutureSec.forall(f => ts <= now + f) &&
      dropPastSec.forall(p => ts >= now - p) &&
      dropLongerThan.forall(l => name.length <= l)
}

object DropFilter {
  val Empty: DropFilter = DropFilter()
}

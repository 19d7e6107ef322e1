package graft.core

/**
 * Timestamp -> days-since-epoch conversion.
 *
 * The reference defaults to a *local-timezone* day boundary (documented as
 * "broken, not always UTC": /root/reference/helper/RowBinary/date.go:12-29)
 * with `data.utc-date = true` switching to plain `ts / 86400`
 * (date.go:72-74). We default to UTC (the sane mode) and keep the local
 * mode behind the same flag for parity testing.
 */
object Dates {

  /** UTC mode: date.go:72-74. */
  @inline def utcTimestampToDays(ts: Long): Int = (ts / 86400L).toInt

  /**
   * Local mode: midnight of the timestamp's local calendar day, taken as a
   * UTC epoch-day (date.go:57-61 SlowTimestampToDays).
   */
  def localTimestampToDays(ts: Long, zone: java.time.ZoneId): Int = {
    val local = java.time.Instant.ofEpochSecond(ts).atZone(zone).toLocalDate
    local.toEpochDay.toInt
  }

  def toDays(ts: Long, utc: Boolean, zone: java.time.ZoneId = java.time.ZoneId.systemDefault()): Int =
    if (utc) utcTimestampToDays(ts) else localTimestampToDays(ts, zone)

  /** Default tree date: day 42 = 1970-02-12 (uploader/index.go:25). */
  final val DefaultTreeDate = 42

  def daysToDate(days: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
}

package graft.core

/**
 * Graphite plaintext protocol: `name value timestamp\n`.
 * Exact parse semantics of /root/reference/receiver/plain.go:53-96:
 *  - split on the first two single spaces;
 *  - value parsed as float64, NaN rejected;
 *  - timestamp literally `-1` -> receive time; otherwise parsed as float
 *    and truncated to integer seconds;
 *  - trailing `\n` / `\r\n` tolerated;
 *  - consecutive dots in the name collapsed before tag normalization.
 */
object PlainProtocol {

  final case class Parsed(name: String, value: Double, timestamp: Long)

  /** Parse one line. `now` supplies the receive time for ts=-1. */
  def parseLine(line: String, now: Long, tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled): Either[String, Parsed] = {
    var p = line
    if (p.nonEmpty && p.charAt(p.length - 1) == '\n') p = p.substring(0, p.length - 1)
    if (p.nonEmpty && p.charAt(p.length - 1) == '\r') p = p.substring(0, p.length - 1)

    val i1 = p.indexOf(' ')
    if (i1 < 1) return Left(s"bad message: '$line'")
    val i2 = p.indexOf(' ', i1 + 1)
    if (i2 < i1 + 2) return Left(s"bad message: '$line'")

    val value =
      try p.substring(i1 + 1, i2).toDouble
      catch { case _: NumberFormatException => Double.NaN }
    if (value.isNaN) return Left(s"bad message: '$line'")

    val tsStr = p.substring(i2 + 1)
    val timestamp: Long =
      if (tsStr == "-1") now
      else {
        val tsf =
          try tsStr.toDouble
          catch { case _: NumberFormatException => Double.NaN }
        if (tsf.isNaN) return Left(s"bad message: '$line'")
        tsf.toLong & 0xffffffffL // reference truncates to uint32
      }

    val name = GraphitePath.removeDoubleDot(p.substring(0, i1))
    GraphiteTags.normalize(tagConfig, name) match {
      case Left(err)        => Left(err)
      case Right(canonical) => Right(Parsed(canonical, value, timestamp))
    }
  }
}

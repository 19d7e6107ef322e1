package graft.sources

import graft.core.Escape

/**
 * Minimal protobuf wire-format scanner (public encoding: varint field
 * headers, wire types 0/1/2/5) — enough to decode Prometheus remote-write
 * `WriteRequest` and the graphite-project `carbon.proto` `Payload`
 * without a protobuf runtime. Shape mirrors the reference's scanner
 * (/root/reference/helper/pb/pb.go:11-118) re-expressed over
 * (array, offset) cursors.
 */
object ProtoWire {

  final class Cursor(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
  }

  def cursor(b: Array[Byte]): Cursor = new Cursor(b, 0, b.length)

  /** Read a varint; throws on truncation. */
  def varint(c: Cursor): Long = {
    var shift = 0
    var out = 0L
    while (true) {
      if (c.pos >= c.end) throw new IllegalArgumentException("truncated varint")
      val b = c.buf(c.pos)
      c.pos += 1
      out |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return out
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("varint too long")
    }
    0L // unreachable
  }

  /** Read a length-delimited field as a sub-cursor. */
  def bytes(c: Cursor): Cursor = {
    val len = varint(c).toInt
    if (len < 0 || c.pos + len > c.end) throw new IllegalArgumentException("truncated bytes")
    val sub = new Cursor(c.buf, c.pos, c.pos + len)
    c.pos += len
    sub
  }

  def string(c: Cursor): String = {
    val sub = bytes(c)
    new String(sub.buf, sub.pos, sub.end - sub.pos, java.nio.charset.StandardCharsets.UTF_8)
  }

  def double(c: Cursor): Double = {
    if (c.pos + 8 > c.end) throw new IllegalArgumentException("truncated double")
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (c.buf(c.pos + i) & 0xffL); i -= 1 }
    c.pos += 8
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Skip one field given its already-read header tag. */
  def skip(c: Cursor, tag: Long): Unit = (tag & 7) match {
    case 0 => varint(c)
    case 1 => c.pos += 8
    case 2 => bytes(c)
    case 5 => c.pos += 4
    case t => throw new IllegalArgumentException(s"unsupported wire type $t")
  }
}

/**
 * Prometheus remote-write decode: snappy-compressed protobuf
 * `WriteRequest{ repeated TimeSeries{ repeated Label, repeated Sample } }`
 * -> canonical tagged points. Label handling follows
 * /root/reference/helper/tags/prometheus.go:20-52: `__name__` hoisted and
 * path-escaped, remaining labels stable-sorted and query-escaped; NaN
 * samples are dropped; sample timestamps are milliseconds -> seconds
 * (receiver/prometheus.go:97-107).
 *
 * DELIBERATE DIVERGENCE: a series with NO `__name__` label is dropped
 * here. The reference (prometheus.go:29-38) unconditionally writes '?'
 * then skips only labels[0], emitting a nameless `?k=v&...` point when
 * `__name__` is absent — an artifact of its alloc-free writer, not a
 * semantic the scrape protocol can produce (Prometheus always sends
 * `__name__`). Dropping keeps nameless rows out of every index.
 */
object PrometheusRemoteWrite {
  import ProtoWire._

  final case class Sample(value: Double, timestampSec: Long)
  final case class Series(canonicalName: String, samples: Seq[Sample])

  def decodeSnappy(body: Array[Byte]): Seq[Series] =
    decode(org.xerial.snappy.Snappy.uncompress(body))

  def decode(raw: Array[Byte]): Seq[Series] = {
    val out = Seq.newBuilder[Series]
    val c = cursor(raw)
    while (c.hasNext) {
      val tag = varint(c)
      if (tag == 0x0a) { // field 1: TimeSeries
        decodeSeries(bytes(c)).foreach(out += _)
      } else skip(c, tag)
    }
    out.result()
  }

  private def decodeSeries(ts: Cursor): Option[Series] = {
    val labels = Seq.newBuilder[(String, String)]
    val samples = Seq.newBuilder[Sample]
    while (ts.hasNext) {
      val tag = varint(ts)
      tag match {
        case 0x0a => // Label
          val l = bytes(ts)
          var name: String = null
          var value: String = null
          while (l.hasNext) {
            val lt = varint(l)
            lt match {
              case 0x0a => name = string(l)
              case 0x12 => value = string(l)
              case _    => skip(l, lt)
            }
          }
          if (name != null && value != null) labels += ((name, value))
        case 0x12 => // Sample
          val s = bytes(ts)
          var value = 0.0
          var tsMs = 0L
          while (s.hasNext) {
            val st = varint(s)
            st match {
              case 0x09 => value = double(s)
              case 0x10 => tsMs = varint(s)
              case _    => skip(s, st)
            }
          }
          if (!value.isNaN) samples += Sample(value, tsMs / 1000)
        case _ => skip(ts, tag)
      }
    }
    val ls = labels.result()
    ls.find(_._1 == "__name__").map { case (_, name) =>
      val rest = ls.filter(_._1 != "__name__").sortBy(_._1)
      val sb = new java.lang.StringBuilder(Escape.path(name)).append('?')
      rest.zipWithIndex.foreach { case ((k, v), i) =>
        if (i > 0) sb.append('&')
        sb.append(Escape.query(k)).append('=').append(Escape.query(v))
      }
      Series(sb.toString, samples.result())
    }
  }
}

/**
 * graphite-project carbon.proto Payload decode (the gRPC Store/StoreSync
 * body): `Payload{ repeated Metric{ string metric, repeated Point{ uint32
 * timestamp, double value } } }` (/root/reference/grpc/carbon.proto).
 */
object CarbonPayload {
  import ProtoWire._

  final case class Point(timestamp: Long, value: Double)
  final case class Metric(name: String, points: Seq[Point])

  def decode(raw: Array[Byte]): Seq[Metric] = {
    val out = Seq.newBuilder[Metric]
    val c = cursor(raw)
    while (c.hasNext) {
      val tag = varint(c)
      if (tag == 0x0a) { // field 1: Metric
        val m = bytes(c)
        var name = ""
        val pts = Seq.newBuilder[Point]
        while (m.hasNext) {
          val mt = varint(m)
          mt match {
            case 0x0a => name = string(m)
            case 0x12 =>
              val p = bytes(m)
              var ts = 0L
              var v = 0.0
              while (p.hasNext) {
                val pt = varint(p)
                pt match {
                  case 0x08 => ts = varint(p)
                  case 0x11 => v = double(p)
                  case _    => skip(p, pt)
                }
              }
              pts += Point(ts, v)
            case _ => skip(m, mt)
          }
        }
        out += Metric(name, pts.result())
      } else skip(c, tag)
    }
    out.result()
  }

  /** Encode a Payload (for the load generator and tests). */
  def encode(metrics: Seq[Metric]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def lenDelim(out: java.io.ByteArrayOutputStream, tag: Int, body: Array[Byte]): Unit = {
      writeVarint(out, tag); writeVarint(out, body.length); out.write(body)
    }
    for (m <- metrics) {
      val mb = new java.io.ByteArrayOutputStream()
      lenDelim(mb, 0x0a, m.name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      for (p <- m.points) {
        val pb = new java.io.ByteArrayOutputStream()
        writeVarint(pb, 0x08); writeVarint(pb, p.timestamp)
        writeVarint(pb, 0x11)
        val bits = java.lang.Double.doubleToLongBits(p.value)
        var i = 0
        while (i < 8) { pb.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
        lenDelim(mb, 0x12, pb.toByteArray)
      }
      lenDelim(bos, 0x0a, mb.toByteArray)
    }
    bos.toByteArray
  }
}

package graft.sources

import java.nio.charset.StandardCharsets

/**
 * Graphite pickle protocol: 4-byte big-endian frame length, then a python
 * pickle of `[(name, (timestamp, value)), ...]` (see
 * /root/reference/receiver/pickle.go:17,39-133). This is a minimal
 * unpickler for the opcode subset graphite senders emit (protocols 0-4:
 * lists, tuples, strings, ints, floats) — not a general pickle VM.
 * Frames above 64 MiB are rejected, matching the reference cap.
 */
object PickleProtocol {

  val MaxFrameBytes: Int = 64 * 1024 * 1024

  final case class Point(name: String, timestamp: Long, value: Double)

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def u1: Int = { val v = b(pos) & 0xff; pos += 1; v }
    def i4le: Int = { val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) | ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24); pos += 4; v }
    def u2le: Int = { val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8); pos += 2; v }
    def f8be: Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits = (bits << 8) | (b(pos + i) & 0xffL); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    def bytes(n: Int): Array[Byte] = { val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out }
    def line(): String = {
      val start = pos
      while (b(pos) != '\n') pos += 1
      val s = new String(b, start, pos - start, StandardCharsets.US_ASCII)
      pos += 1
      s
    }
    def hasNext: Boolean = pos < b.length
  }

  private object Mark // stack sentinel

  /** Unpickle one frame body into the graphite point list. */
  def decode(body: Array[Byte]): Seq[Point] = {
    val r = new Reader(body)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Any]
    // real python picklers ALWAYS emit memo puts (p/q/r/MEMOIZE) for
    // protocols >= 0 — a VM without a memo rejects every real frame
    val memo = scala.collection.mutable.HashMap.empty[Int, Any]
    var result: Any = null
    var done = false

    def popToMark(): Seq[Any] = {
      val idx = stack.lastIndexWhere(_ == Mark)
      require(idx >= 0, "no MARK on stack")
      val items = stack.slice(idx + 1, stack.length).toSeq
      stack.remove(idx, stack.length - idx)
      items
    }

    while (!done && r.hasNext) {
      val op = r.u1
      op match {
        case 0x80 => r.u1 // PROTO n
        case 0x95 => r.bytes(8) // FRAME (protocol 4)
        case '('  => stack += Mark
        case ']'  => stack += scala.collection.mutable.ArrayBuffer.empty[Any]
        case 'l'  => stack += scala.collection.mutable.ArrayBuffer(popToMark(): _*) // LIST
        case 'a' => // APPEND
          val v = stack.remove(stack.length - 1)
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] += v
        case 'e' => // APPENDS
          val items = popToMark()
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] ++= items
        case 't'  => stack += popToMark() // TUPLE
        case 0x85 => val a = stack.remove(stack.length - 1); stack += Seq(a)
        case 0x86 =>
          val b2 = stack.remove(stack.length - 1); val a = stack.remove(stack.length - 1)
          stack += Seq(a, b2)
        case 0x87 =>
          val c = stack.remove(stack.length - 1); val b2 = stack.remove(stack.length - 1)
          val a = stack.remove(stack.length - 1); stack += Seq(a, b2, c)
        case 'S' | 'V' => // STRING / UNICODE (newline-terminated, repr-quoted for S)
          val s = r.line()
          stack += (if (op == 'S') s.stripPrefix("'").stripSuffix("'") else s)
        case 'U'  => stack += new String(r.bytes(r.u1), StandardCharsets.UTF_8) // SHORT_BINSTRING
        case 'T'  => stack += new String(r.bytes(r.i4le), StandardCharsets.UTF_8) // BINSTRING
        case 'X'  => stack += new String(r.bytes(r.i4le), StandardCharsets.UTF_8) // BINUNICODE
        case 0x8c => stack += new String(r.bytes(r.u1), StandardCharsets.UTF_8) // SHORT_BINUNICODE
        case 'I' | 'L' => // INT / LONG (ascii line; trailing L tolerated)
          stack += r.line().stripSuffix("L").toLong
        case 'F'  => stack += r.line().toDouble // FLOAT (ascii)
        case 'J'  => stack += r.i4le.toLong // BININT
        case 'K'  => stack += r.u1.toLong // BININT1
        case 'M'  => stack += r.u2le.toLong // BININT2
        case 0x8a => // LONG1: n bytes little-endian signed
          val n = r.u1
          val bs = r.bytes(n)
          var v = 0L
          var i = n - 1
          while (i >= 0) { v = (v << 8) | (bs(i) & 0xffL); i -= 1 }
          if (n > 0 && (bs(n - 1) & 0x80) != 0) v -= (1L << (8 * n))
          stack += v
        case 'G'  => stack += r.f8be // BINFLOAT
        case 'N'  => stack += null // NONE
        case 0x88 => stack += true // NEWTRUE
        case 0x89 => stack += false // NEWFALSE
        case ')'  => stack += Seq.empty // EMPTY_TUPLE
        case '0'  => stack.remove(stack.length - 1) // POP
        case '2'  => stack += stack.last // DUP
        case 'p'  => memo(r.line().toInt) = stack.last // PUT (ascii)
        case 'g'  => stack += memo(r.line().toInt) // GET (ascii)
        case 'q'  => memo(r.u1) = stack.last // BINPUT
        case 'r'  => memo(r.i4le) = stack.last // LONG_BINPUT
        case 'h'  => stack += memo(r.u1) // BINGET
        case 'j'  => stack += memo(r.i4le) // LONG_BINGET
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE (protocol 4)
        case '.'  => result = stack.remove(stack.length - 1); done = true // STOP
        case other => throw new IllegalArgumentException(f"unsupported pickle opcode 0x$other%02x")
      }
    }

    def num(a: Any): Double = a match {
      case l: Long   => l.toDouble
      case d: Double => d
      case s: String => s.toDouble
      case other     => throw new IllegalArgumentException(s"not a number: $other")
    }

    val items: Seq[Any] = result match {
      case buf: scala.collection.mutable.ArrayBuffer[_] => buf.toSeq
      case seq: Seq[_]                                  => seq
      case other => throw new IllegalArgumentException(s"pickle root is not a list: $other")
    }
    items.map {
      case Seq(name: String, Seq(ts, value)) => Point(name, num(ts).toLong, num(value))
      case other => throw new IllegalArgumentException(s"unexpected pickle item shape: $other")
    }
  }

  /** Read framed messages from a stream: 4-byte BE length + body. */
  def readFrame(in: java.io.DataInputStream): Option[Array[Byte]] = {
    val len =
      try in.readInt()
      catch { case _: java.io.EOFException => return None }
    require(len >= 0 && len <= MaxFrameBytes, s"pickle frame too large: $len")
    val body = new Array[Byte](len)
    in.readFully(body)
    Some(body)
  }
}

package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import graft.core.{DropFilter, DroppedRing, GraphiteTags}
import graft.streaming.SpoolWriter

/**
 * Plaintext protocol front-ends (no Spark): accept `name value ts\n`
 * lines and append parsed canonical records to the spool. The thread
 * boundary and receive-time stamping mirror /root/reference/receiver/
 * tcp.go:34-147 and udp.go:34-95. Framing is on '\n' ONLY (a lone '\r'
 * is not a terminator; the parser strips a trailing '\r'), and a
 * connection cut mid-line DISCARDS the partial tail instead of
 * ingesting a truncated metric — tcp.go:83-96 semantics.
 */
final class TcpLineServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    drops: DropFilter = DropFilter.Empty,
    tls: Option[javax.net.ssl.SSLContext] = None, // tests/tls e2e intent
    readTimeoutMs: Option[Long] = None, // [tcp] read-timeout (config.go default 2m)
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  /** Per-receiver dropped ring (receiver/base.go:16). */
  val droppedRing = new DroppedRing(1000)

  private val server = tls match {
    case Some(ctx) => ctx.getServerSocketFactory.createServerSocket()
    case None      => new ServerSocket()
  }
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(port))
  private val pool = Executors.newCachedThreadPool()
  private val running = new AtomicBoolean(true)

  /** Bound port (use port=0 for ephemeral in tests). */
  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable { def run(): Unit = handle(sock) })
      } catch { case _: Exception if !running.get() => /* closing */ }
    }
  }, s"tcp-line-acceptor-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    // idle-connection reaping (receiver/tcp.go read deadline): a read
    // blocking past the timeout raises SocketTimeoutException, which the
    // IOException handler below turns into a clean close
    readTimeoutMs.foreach(ms => sock.setSoTimeout(ms.toInt))
    // explicit '\n' framing at the byte level (BufferedReader.readLine
    // would treat lone '\r' as a terminator and surface the EOF tail as
    // a complete line — both diverge from receiver/tcp.go)
    val in = new java.io.BufferedInputStream(sock.getInputStream, 256 * 1024)
    val pending = new java.io.ByteArrayOutputStream(512)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        // receive time stamped per read batch, like the reference's buffer stamp
        val now = clock()
        var start = 0
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') {
            pending.write(buf, start, i - start)
            val line = new String(pending.toByteArray, StandardCharsets.UTF_8)
            pending.reset()
            if (line.nonEmpty) spool.writeLine(line, now, tagConfig, drops, Some(droppedRing))
            start = i + 1
          }
          i += 1
        }
        pending.write(buf, start, n - start)
        n = in.read(buf)
      }
      // EOF with no trailing '\n': the partial tail is dropped (tcp.go:83-96)
      if (pending.size() > 0) {
        spool.parseErrors.incrementAndGet()
        val tail = new String(pending.toByteArray, StandardCharsets.UTF_8)
        spool.droppedRing.record(tail, "partial line at connection close")
        droppedRing.record(tail, "partial line at connection close")
      }
    } catch { case _: java.io.IOException => /* peer closed */ }
    finally sock.close()
  }

  override def close(): Unit = {
    running.set(false)
    server.close()
    pool.shutdown()
  }
}

/** UDP datagram front-end: each packet carries whole lines up to the last `\n`. */
final class UdpLineServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    drops: DropFilter = DropFilter.Empty,
    logIncomplete: Boolean = false, // [udp] log-incomplete (receiver/udp.go)
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  /** Per-receiver dropped ring (receiver/base.go:16). */
  val droppedRing = new DroppedRing(1000)

  private val socket = new DatagramSocket(null)
  socket.setReuseAddress(true)
  socket.bind(new InetSocketAddress(port))
  private val running = new AtomicBoolean(true)

  def boundPort: Int = socket.getLocalPort

  private val reader = new Thread(() => {
    val buf = new Array[Byte](64 * 1024)
    while (running.get()) {
      try {
        val pkt = new DatagramPacket(buf, buf.length)
        socket.receive(pkt)
        val now = clock()
        val text = new String(pkt.getData, pkt.getOffset, pkt.getLength, StandardCharsets.UTF_8)
        // datagrams may end without a newline; trailing partial lines are
        // dropped like the reference's udp.go "up to last \n" framing
        val (upToLastNl, tail) = text.lastIndexOf('\n') match {
          case -1 => ("", text)
          case i  => (text.substring(0, i), text.substring(i + 1))
        }
        if (tail.nonEmpty) {
          droppedRing.record(tail, "incomplete line in datagram")
          if (logIncomplete) // [udp] log-incomplete = true (receiver/udp.go)
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"incomplete line in udp datagram: '$tail'")
        }
        upToLastNl.split("\n").foreach { line =>
          if (line.nonEmpty) spool.writeLine(line, now, tagConfig, drops, Some(droppedRing))
        }
      } catch { case _: Exception if !running.get() => /* closing */ }
    }
  }, s"udp-line-reader-$port")
  reader.setDaemon(true)
  reader.start()

  override def close(): Unit = {
    running.set(false)
    socket.close()
  }
}

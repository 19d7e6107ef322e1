package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import graft.core.GraphiteTags
import graft.streaming.SpoolWriter

/**
 * Plaintext protocol front-ends (no Spark): accept `name value ts\n`
 * lines and append parsed canonical records to the spool. The thread
 * boundary and receive-time stamping mirror /root/reference/receiver/
 * tcp.go:34-147 and udp.go:34-95; partial-line carry is handled by the
 * BufferedReader line framing.
 */
final class TcpLineServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  private val server = new ServerSocket()
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
    // receive time is stamped per line batch, like the reference's buffer stamp
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8), 256 * 1024)
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty) spool.writeLine(line, clock(), tagConfig)
        line = in.readLine()
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
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

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
        val upToLastNl = text.lastIndexOf('\n') match {
          case -1 => ""
          case i  => text.substring(0, i)
        }
        upToLastNl.split("\n").foreach { line =>
          if (line.nonEmpty) spool.writeLine(line, now, tagConfig)
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

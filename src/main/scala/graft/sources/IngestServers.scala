package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.{DropFilter, DroppedRing, GraphiteTags}
import graft.streaming.SpoolWriter

/**
 * HTTP ingest front-end: Prometheus remote write (snappy+protobuf) and
 * Telegraf JSON on one listener, mirroring the reference's HTTP
 * receivers (/root/reference/receiver/prometheus.go:173-191,
 * telegraf_http_json.go:139-150). Decoded points land in the spool with
 * the shared receive-time version stamp.
 *
 * Each endpoint applies ITS OWN receiver's drop windows (the reference
 * configures [prometheus] and [telegraf_http_json] separately) and owns
 * a per-receiver dropped ring; `debugRings` lets the other front-ends
 * register theirs so this listener can serve the reference's
 * /debug/receive/<type>/dropped/ routes (carbon/app.go:265-353).
 */
final class HttpIngestServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    telegrafConcat: String = "_",
    promDrops: DropFilter = DropFilter.Empty,
    telegrafDrops: DropFilter = DropFilter.Empty,
    debugRings: Map[String, DroppedRing] = Map.empty,
    onCacheClear: () => Unit = () => (),
    tls: Option[javax.net.ssl.SSLContext] = None, // tests/tls e2e intent
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  /** Per-receiver dropped rings (receiver/base.go:16). */
  val promRing = new DroppedRing(1000)
  val telegrafRing = new DroppedRing(1000)

  private def spoolIfAccepted(drops: DropFilter, ring: DroppedRing,
                              name: String, value: Double, ts: Long, now: Long): Unit =
    if (drops.accepts(name, ts, now)) spool.write(name, value, ts, now)
    else {
      spool.droppedPoints.incrementAndGet()
      // same shape as the reference's saveDropped (base.go:104-111)
      ring.record(s"rcv:$now\tname:$name\ttimestamp:$ts\tvalue:$value", "drop filter")
      spool.droppedRing.record(name, "drop filter")
    }

  private val server = tls match {
    case Some(ctx) =>
      val s = com.sun.net.httpserver.HttpsServer.create(new InetSocketAddress(port), 64)
      s.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx))
      s
    case None => HttpServer.create(new InetSocketAddress(port), 64)
  }
  server.setExecutor(Executors.newFixedThreadPool(4))

  def boundPort: Int = server.getAddress.getPort

  private def readBody(ex: HttpExchange): Array[Byte] = ex.getRequestBody.readAllBytes()

  private def respond(ex: HttpExchange, code: Int, msg: String = ""): Unit = {
    val b = msg.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  server.createContext("/api/prom/write", (ex: HttpExchange) => {
    try {
      val now = clock()
      val series = PrometheusRemoteWrite.decodeSnappy(readBody(ex))
      series.foreach { s =>
        s.samples.foreach(p =>
          spoolIfAccepted(promDrops, promRing, s.canonicalName, p.value, p.timestampSec, now))
      }
      respond(ex, 200)
    } catch { case e: Exception => respond(ex, 400, e.getMessage) }
  })

  // per-receiver dropped routes (carbon/app.go:265-353); the reference
  // serves text/plain sorted lines — JSON here matches /debug/dropped
  private val allRings =
    debugRings ++ Map("prometheus" -> promRing, "telegraf_http_json" -> telegrafRing)
  allRings.foreach { case (name, ring) =>
    server.createContext(s"/debug/receive/$name/dropped/", (ex: HttpExchange) => {
      val body = ring.dump()
        .map { case (line, reason) =>
          s"""{"line":${jsonStr(line)},"reason":${jsonStr(reason)}}"""
        }
        .mkString("[", ",", "]")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      respond(ex, 200, body)
    })
  }

  // admin analogue of the reference's SIGUSR1 exists-cache clear
  // (carbon-clickhouse.go:146-148): POST/GET both accepted
  server.createContext("/admin/clear-cache", (ex: HttpExchange) => {
    onCacheClear()
    respond(ex, 200, "cache clear requested\n")
  })

  // the reference's main triage surface: the last-1000 dropped lines
  // with reasons (receiver/base.go:88-127 /debug/receive/*/dropped/)
  server.createContext("/debug/dropped", (ex: HttpExchange) => {
    val body = spool.droppedRing.dump()
      .map { case (line, reason) =>
        s"""{"line":${jsonStr(line)},"reason":${jsonStr(reason)}}"""
      }
      .mkString("[", ",", "]")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    respond(ex, 200, body)
  })

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  server.createContext("/telegraf", (ex: HttpExchange) => {
    try {
      val now = clock()
      val pts = TelegrafJson.decode(new String(readBody(ex), StandardCharsets.UTF_8), telegrafConcat)
      pts.foreach(p => spoolIfAccepted(telegrafDrops, telegrafRing, p.path, p.value, p.timestamp, now))
      respond(ex, 200)
    } catch { case e: Exception => respond(ex, 400, e.getMessage) }
  })

  server.start()

  override def close(): Unit = server.stop(0)
}

/**
 * Pickle front-end: framed (4-byte BE length) pickle messages over TCP
 * (/root/reference/receiver/pickle.go).
 */
final class PickleServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    drops: DropFilter = DropFilter.Empty,
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  /** Per-receiver dropped ring (receiver/base.go:16). */
  val droppedRing = new DroppedRing(1000)

  private val server = new java.net.ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(port))
  private val pool = Executors.newCachedThreadPool()
  private val running = new AtomicBoolean(true)

  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable {
          def run(): Unit = {
            val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
            try {
              var frame = PickleProtocol.readFrame(in)
              while (frame.isDefined) {
                val now = clock()
                PickleProtocol.decode(frame.get).foreach { p =>
                  // pickle names go through the same normalize path as plaintext
                  GraphiteTags.normalize(tagConfig, graft.core.GraphitePath.removeDoubleDot(p.name)) match {
                    case Right(canonical) if !p.value.isNaN && drops.accepts(canonical, p.timestamp, now) =>
                      spool.write(canonical, p.value, p.timestamp, now)
                    case Right(canonical) =>
                      spool.droppedPoints.incrementAndGet()
                      droppedRing.record(s"rcv:$now\tname:$canonical\ttimestamp:${p.timestamp}\tvalue:${p.value}",
                        if (p.value.isNaN) "NaN value" else "drop filter")
                    case Left(err) =>
                      spool.parseErrors.incrementAndGet()
                      droppedRing.record(p.name, err)
                  }
                }
                frame = PickleProtocol.readFrame(in)
              }
            } catch { case _: Exception => /* bad frame or peer closed */ }
            finally sock.close()
          }
        })
      } catch { case _: Exception if !running.get() => }
    }
  }, s"pickle-acceptor-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { running.set(false); server.close(); pool.shutdown() }
}

/**
 * Carbon Store/StoreSync over a minimal length-prefixed TCP framing
 * (4-byte BE length + 1-byte opcode: 0=Store, 1=StoreSync) carrying
 * the same `carbon.proto` Payload bytes. The wire-compatible gRPC
 * transport is [[GrpcStoreServer]]; this framed variant remains as a
 * dependency-free alternative and the load-test target. Semantics are
 * shared via [[CarbonStore]]; "sync" acks once the records are flushed
 * to the OS chunk file (grpc.go:72-184 + writer.go:265-283 —
 * buffered-to-OS-file, NOT rotated/uploaded).
 */
/**
 * Shared Store/StoreSync semantics for both transports (real gRPC and
 * the framed-TCP stand-in): validation — empty name, >16384-byte name,
 * empty points fail the WHOLE call (grpc.go:84-110) — then normalize +
 * drop-filter + spool.
 */
private[sources] object CarbonStore {
  val MaxNameLen = 16384

  def store(spool: SpoolWriter, tagConfig: GraphiteTags.TagConfig, drops: DropFilter,
            payload: Array[Byte], now: Long,
            ring: Option[DroppedRing] = None): Either[String, Int] = {
    val metrics = CarbonPayload.decode(payload)
    // validate everything first (the reference fails the whole RPC)
    metrics.foreach { m =>
      if (m.name.isEmpty) return Left("empty metric name")
      if (m.name.length > MaxNameLen) return Left("metric name too long")
      if (m.points.isEmpty) return Left(s"metric '${m.name}' has no points")
    }
    var n = 0
    metrics.foreach { m =>
      GraphiteTags.normalize(tagConfig, m.name) match {
        case Right(canonical) =>
          m.points.foreach { p =>
            if (!p.value.isNaN && drops.accepts(canonical, p.timestamp, now)) {
              spool.write(canonical, p.value, p.timestamp, now); n += 1
            } else {
              spool.droppedPoints.incrementAndGet()
              ring.foreach(_.record(
                s"rcv:$now\tname:$canonical\ttimestamp:${p.timestamp}\tvalue:${p.value}",
                if (p.value.isNaN) "NaN value" else "drop filter"))
            }
          }
        case Left(err) => return Left(err)
      }
    }
    Right(n)
  }
}

final class FramedStoreServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    drops: DropFilter = DropFilter.Empty,
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  val MaxNameLen: Int = CarbonStore.MaxNameLen

  /** Per-receiver dropped ring (receiver/base.go:16). */
  val droppedRing = new DroppedRing(1000)

  private val server = new java.net.ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(port))
  private val pool = Executors.newCachedThreadPool()
  private val running = new AtomicBoolean(true)

  def boundPort: Int = server.getLocalPort

  private def store(payload: Array[Byte], now: Long): Either[String, Int] =
    CarbonStore.store(spool, tagConfig, drops, payload, now, Some(droppedRing))

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable {
          def run(): Unit = {
            val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
            val out = new java.io.DataOutputStream(sock.getOutputStream)
            try {
              while (true) {
                val len = in.readInt()
                val op = in.readByte()
                val body = new Array[Byte](len - 1)
                in.readFully(body)
                store(body, clock()) match {
                  case Right(_) =>
                    if (op == 1) spool.flushCurrent() // StoreSync: flushed to OS file before ack
                    out.writeByte(0) // OK
                  case Left(err) =>
                    out.writeByte(1)
                    val eb = err.getBytes(StandardCharsets.UTF_8)
                    out.writeInt(eb.length)
                    out.write(eb)
                }
                out.flush()
              }
            } catch { case _: Exception => /* peer closed */ }
            finally sock.close()
          }
        })
      } catch { case _: Exception if !running.get() => }
    }
  }, s"store-acceptor-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { running.set(false); server.close(); pool.shutdown() }
}

/**
 * Self-metrics collector: periodically emits the front-ends' own
 * counters as points into the same spool (reference
 * /root/reference/carbon/collector.go:44-318).
 */
final class SelfMetricsCollector(
    spool: SpoolWriter,
    prefix: String = "carbon.agents.graft",
    intervalMs: Long = 60000,
    // [common] metric-endpoint (carbon/collector.go): "local" feeds the
    // own pipeline; "tcp://h:p" / "udp://h:p" ship plaintext to a remote
    // graphite, best-effort per interval (a down remote drops the
    // interval's self-points, never blocks ingest)
    endpoint: String = "local",
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  private val running = new AtomicBoolean(true)
  private var lastWritten = 0L
  private var lastErrors = 0L
  private var lastRejected = 0L
  private var lastDropped = 0L

  private def emit(points: Seq[(String, Double, Long)]): Unit = endpoint match {
    case "local" | "" =>
      points.foreach { case (n, v, t) => spool.write(n, v, t, t) }
    case ep if ep.startsWith("tcp://") || ep.startsWith("udp://") =>
      val uri = java.net.URI.create(ep)
      val payload = points.map { case (n, v, t) => s"$n $v $t\n" }.mkString
        .getBytes(StandardCharsets.UTF_8)
      try {
        if (ep.startsWith("tcp://")) {
          val s = new Socket(uri.getHost, uri.getPort)
          try { s.getOutputStream.write(payload); s.getOutputStream.flush() }
          finally s.close()
        } else {
          val s = new DatagramSocket()
          try s.send(new DatagramPacket(payload, payload.length,
            java.net.InetAddress.getByName(uri.getHost), uri.getPort))
          finally s.close()
        }
      } catch { case _: java.io.IOException => /* remote down: drop interval */ }
    case other =>
      throw new IllegalArgumentException(s"bad metric-endpoint: $other")
  }

  def collectOnce(): Unit = {
    val now = clock()
    val written = spool.pointsWritten.get()
    val errors = spool.parseErrors.get()
    val rejected = spool.rejectedNames.get()
    val dropped = spool.droppedPoints.get()
    // rate-style counters: delta since last interval, like the reference's
    // swap-to-zero atomics (receiver/base.go:129-153)
    emit(Seq(
      (s"$prefix.pointsWritten", (written - lastWritten).toDouble, now),
      (s"$prefix.parseErrors", (errors - lastErrors).toDouble, now),
      (s"$prefix.rejectedNames", (rejected - lastRejected).toDouble, now),
      (s"$prefix.droppedPoints", (dropped - lastDropped).toDouble, now)))
    lastWritten = written
    lastErrors = errors
    lastRejected = rejected
    lastDropped = dropped
  }

  private val timer = new Thread(() => {
    var interrupted = false
    while (running.get() && !interrupted) {
      try Thread.sleep(intervalMs)
      catch { case _: InterruptedException => interrupted = true }
      if (running.get() && !interrupted) collectOnce()
    }
  }, "self-metrics")
  timer.setDaemon(true)
  timer.start()

  override def close(): Unit = { running.set(false); timer.interrupt() }
}

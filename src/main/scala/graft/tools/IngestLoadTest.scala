package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.sources.{CarbonPayload, FramedStoreServer, GrpcStoreServer}
import graft.streaming.SpoolWriter

/**
 * Ingest throughput bench with the reference load generator's shape
 * (/root/reference/receiver/grpc_sender/loadtest.go:70-101): per round,
 * hosts x plugins StoreSync payloads of `values` single-point metrics —
 * 1000 x 50 x 10 = 500k points/round by default — sent over N
 * concurrent connections, acked only after the spool flush. Prints one
 * JSON line with points/s and queries/s, the same numbers the
 * reference's loadtest reports.
 *
 * `--transport framed` drives the framed-TCP stand-in; `--transport
 * grpc` drives the REAL gRPC Carbon service (the reference loadtest's
 * own transport). `--stripes` and `--compress` expose the spool
 * knobs for the scaling numbers in EVIDENCE.md; `spool_bytes` in the
 * output is the on-disk size for the compression trade.
 *
 * Usage: graft.tools.IngestLoadTest [--transport framed|grpc]
 *   [--hosts N] [--plugins N] [--values N] [--threads N] [--rounds N]
 *   [--stripes N] [--compress none|gzip|lz4] [--workdir DIR]
 */
object IngestLoadTest {

  def main(args: Array[String]): Unit = {
    def flag(name: String, default: Int): Int =
      args.sliding(2).collectFirst { case Array(`name`, v) => v.toInt }.getOrElse(default)
    def strFlag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val transport = strFlag("--transport").getOrElse("framed")
    val hosts = flag("--hosts", 1000)
    val plugins = flag("--plugins", 50)
    val values = flag("--values", 10)
    val threads = flag("--threads", 8)
    val rounds = flag("--rounds", 1)
    val stripes = flag("--stripes", SpoolWriter.DefaultStripes)
    val compress = strFlag("--compress").getOrElse("none")
    val workdir = strFlag("--workdir")
      .getOrElse(Files.createTempDirectory("graft-loadtest").toString)

    val spool = new SpoolWriter(s"$workdir/spool", chunkIntervalMs = 1000,
      stripes = stripes, compression = compress)
    val rotator = new Thread(() => {
      while (true) { Thread.sleep(1000); spool.maybeRotate() }
    }, "rotator")
    rotator.setDaemon(true)
    rotator.start()

    val queries = new AtomicLong(0)
    val nowTs = System.currentTimeMillis() / 1000

    def payloadFor(host: Int, plugin: Int): Array[Byte] =
      CarbonPayload.encode((0 until values).map { v =>
        CarbonPayload.Metric(s"loadtest.host$host.plugin$plugin.stuff$v.value",
          Seq(CarbonPayload.Point(nowTs, (host * 31 + plugin * 7 + v) / 1000.0)))
      })

    // one sender per thread, sticky connection — the loadtest.go shape
    def run(send: (Int, Array[Byte]) => Unit, close: Int => Unit): Double = {
      def worker(tid: Int): Thread = new Thread(() => {
        for (_ <- 0 until rounds; host <- tid until hosts by threads; plugin <- 0 until plugins) {
          send(tid, payloadFor(host, plugin))
          queries.incrementAndGet()
        }
        close(tid)
      }, s"load-$tid")
      val t0 = System.nanoTime()
      val ws = (0 until threads).map(worker)
      ws.foreach(_.start())
      ws.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    val (sec, server: AutoCloseable) = transport match {
      case "grpc" =>
        import org.sparkproject.connect.grpc.{CallOptions, ManagedChannel, ManagedChannelBuilder}
        import org.sparkproject.connect.grpc.stub.ClientCalls
        val srv = new GrpcStoreServer(spool, port = 0)
        val channels = Array.fill[ManagedChannel](threads)(
          ManagedChannelBuilder.forAddress("127.0.0.1", srv.boundPort).usePlaintext().build())
        val s = run(
          (tid, payload) => ClientCalls.blockingUnaryCall(
            channels(tid), GrpcStoreServer.StoreSyncMethod, CallOptions.DEFAULT, payload),
          tid => { channels(tid).shutdownNow(); () })
        (s, srv)
      case "framed" =>
        val srv = new FramedStoreServer(spool, port = 0)
        val socks = Array.tabulate(threads) { _ =>
          val sock = new java.net.Socket("127.0.0.1", srv.boundPort)
          sock.setTcpNoDelay(true)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(sock.getOutputStream, 64 * 1024))
          val in = new java.io.DataInputStream(sock.getInputStream)
          (sock, out, in)
        }
        val s = run(
          { (tid, payload) =>
            val (_, out, in) = socks(tid)
            out.writeInt(payload.length + 1)
            out.writeByte(1) // StoreSync
            out.write(payload)
            out.flush()
            require(in.read() == 0, "StoreSync nack")
          },
          tid => socks(tid)._1.close())
        (s, srv)
      case other => sys.error(s"unknown transport: $other")
    }
    spool.close()
    server.close()

    val points = spool.pointsWritten.get()
    // on-disk spool size: the compression size-vs-CPU trade in one number
    // (nothing consumed the chunks, so this is the complete byte count)
    val spoolBytes = Files.list(java.nio.file.Paths.get(s"$workdir/spool")).toArray
      .map(p => Files.size(p.asInstanceOf[java.nio.file.Path])).sum
    println(f"""{"transport":"$transport","points":$points,"queries":${queries.get()},"sec":$sec%.3f,"points_per_sec":${points / sec}%.0f,"queries_per_sec":${queries.get() / sec}%.0f,"threads":$threads,"stripes":$stripes,"compress":"$compress","spool_bytes":$spoolBytes}""")
  }
}

package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.sources.{CarbonPayload, FramedStoreServer}
import graft.streaming.SpoolWriter

/**
 * Ingest throughput bench with the reference load generator's shape
 * (/root/reference/receiver/grpc_sender/loadtest.go:70-101): per round,
 * hosts x plugins StoreSync payloads of `values` single-point metrics —
 * 1000 x 50 x 10 = 500k points/round by default — sent over N
 * concurrent connections to the framed Store front-end, acked only
 * after the spool flush. Prints one JSON line with points/s and
 * queries/s, the same numbers the reference's loadtest reports.
 *
 * Usage: graft.tools.IngestLoadTest [--hosts N] [--plugins N]
 *   [--values N] [--threads N] [--rounds N] [--workdir DIR]
 */
object IngestLoadTest {

  def main(args: Array[String]): Unit = {
    def flag(name: String, default: Int): Int =
      args.sliding(2).collectFirst { case Array(`name`, v) => v.toInt }.getOrElse(default)
    val hosts = flag("--hosts", 1000)
    val plugins = flag("--plugins", 50)
    val values = flag("--values", 10)
    val threads = flag("--threads", 8)
    val rounds = flag("--rounds", 1)
    val workdir = args.sliding(2).collectFirst { case Array("--workdir", v) => v }
      .getOrElse(Files.createTempDirectory("graft-loadtest").toString)

    val spool = new SpoolWriter(s"$workdir/spool", chunkIntervalMs = 1000)
    val rotator = new Thread(() => {
      while (true) { Thread.sleep(1000); spool.maybeRotate() }
    }, "rotator")
    rotator.setDaemon(true)
    rotator.start()
    val server = new FramedStoreServer(spool, port = 0)

    val queries = new AtomicLong(0)
    val nowTs = System.currentTimeMillis() / 1000

    def worker(tid: Int): Thread = new Thread(() => {
      val sock = new java.net.Socket("127.0.0.1", server.boundPort)
      sock.setTcpNoDelay(true)
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream, 64 * 1024))
      val in = new java.io.DataInputStream(sock.getInputStream)
      for (_ <- 0 until rounds; host <- tid until hosts by threads; plugin <- 0 until plugins) {
        val metrics = (0 until values).map { v =>
          CarbonPayload.Metric(s"loadtest.host$host.plugin$plugin.stuff$v.value",
            Seq(CarbonPayload.Point(nowTs, (host * 31 + plugin * 7 + v) / 1000.0)))
        }
        val payload = CarbonPayload.encode(metrics)
        out.writeInt(payload.length + 1)
        out.writeByte(1) // StoreSync
        out.write(payload)
        out.flush()
        require(in.read() == 0, "StoreSync nack")
        queries.incrementAndGet()
      }
      sock.close()
    }, s"load-$tid")

    val t0 = System.nanoTime()
    val ws = (0 until threads).map(worker)
    ws.foreach(_.start())
    ws.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    spool.close()
    server.close()

    val points = spool.pointsWritten.get()
    println(f"""{"points":$points,"queries":${queries.get()},"sec":$sec%.3f,"points_per_sec":${points / sec}%.0f,"queries_per_sec":${queries.get() / sec}%.0f,"threads":$threads}""")
  }
}

package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.sources._

/**
 * Production entrypoint: the full ingest engine in one process —
 * protocol front-ends (TCP/UDP plaintext, pickle, HTTP telegraf +
 * prometheus remote write, framed Store/StoreSync) feeding a spool dir,
 * and the Structured Streaming job fanning micro-batches out to the
 * points / points_reverse / index / tagged tables.
 *
 * Usage:
 *   graft.streaming.IngestMain <workDir> [--tcp PORT] [--udp PORT]
 *     [--pickle PORT] [--http PORT] [--store PORT] [--trigger-ms N]
 *     [--chunk-ms N] [--once]
 *
 * `--once` drains the spool and exits (backfill mode); otherwise the
 * stream runs until SIGTERM. Port 0 binds ephemeral (printed on stdout).
 */
object IngestMain {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(sys.error("usage: IngestMain <workDir> [flags]"))
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val once = args.contains("--once")
    val triggerMs = flag("--trigger-ms").map(_.toLong).getOrElse(1000L)
    val chunkMs = flag("--chunk-ms").map(_.toLong).getOrElse(1000L)

    val spool = new SpoolWriter(s"$work/spool", chunkIntervalMs = chunkMs)
    val rotator = new Thread(() => {
      while (true) { Thread.sleep(chunkMs); spool.maybeRotate() }
    }, "spool-rotator")
    rotator.setDaemon(true)
    rotator.start()

    val servers = Seq.newBuilder[AutoCloseable]
    flag("--tcp").foreach { p =>
      val s = new TcpLineServer(spool, p.toInt); servers += s
      println(s"tcp listening on ${s.boundPort}")
    }
    flag("--udp").foreach { p =>
      val s = new UdpLineServer(spool, p.toInt); servers += s
      println(s"udp listening on ${s.boundPort}")
    }
    flag("--pickle").foreach { p =>
      val s = new PickleServer(spool, p.toInt); servers += s
      println(s"pickle listening on ${s.boundPort}")
    }
    flag("--http").foreach { p =>
      val s = new HttpIngestServer(spool, p.toInt); servers += s
      println(s"http (telegraf + prometheus) listening on ${s.boundPort}")
    }
    flag("--store").foreach { p =>
      val s = new FramedStoreServer(spool, p.toInt); servers += s
      println(s"store listening on ${s.boundPort}")
    }
    val collector = new SelfMetricsCollector(spool)
    servers += collector

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ingest")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ingest = new StreamingIngest(spark, s"$work/spool", s"$work/tables", s"$work/ckpt")
    if (once) {
      spool.rotate()
      ingest.runAvailableNow()
      println(s"points=${ingest.pointsTable().count()} index=${ingest.indexTable().count()} tagged=${ingest.taggedTable().count()}")
    } else {
      val q = ingest.start(triggerMs)
      sys.addShutdownHook {
        q.stop()
        servers.result().foreach(_.close())
        spool.close()
      }
      println("streaming started")
      q.awaitTermination()
    }
    spark.stop()
  }
}

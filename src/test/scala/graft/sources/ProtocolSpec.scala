package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SpoolWriter

/** Protocol front-end kernels vs reference goldens (FIXTURES.md §8/§9). */
class ProtocolSpec extends AnyFunSuite {

  // --- telegraf: receiver/telegraf_http_json_test.go:43-80 ---
  test("telegraf JSON golden (empty concat char, as in the reference test)") {
    val payload =
      """{"metrics":[
        | {"name":"name with space.","timestamp":1670348700,
        |  "fields":{"counter":3538944},
        |  "tags":{"key with space":"value with space","name":"name_value"}},
        | {"name":"name with space.","timestamp":1670348702,
        |  "fields":{"gauge":3538945},"tags":{"key2":"value2","key1":"value2"}}]}""".stripMargin
    val pts = TelegrafJson.decode(payload, concatChar = "").sortBy(_.timestamp)
    assert(pts.map(p => (p.path, p.value, p.timestamp)) == Seq(
      ("name%20with%20space.counter?key+with+space=value+with+space&_name=name_value", 3538944.0, 1670348700L),
      ("name%20with%20space.gauge?key1=value2&key2=value2", 3538945.0, 1670348702L)))
  }

  test("telegraf tag encoding quirks") {
    // single tag: reserved-name rename NOT applied (reference fast path)
    assert(TelegrafJson.encodeTags(Map("name" -> "v")) == "name=v")
    // multi tag: rename applied, keys sorted by ORIGINAL name
    assert(TelegrafJson.encodeTags(Map("name" -> "name with space", "tag" -> "value with space")) ==
      "_name=name+with+space&tag=value+with+space")
    // bool fields -> 0/1; field "value" not appended
    val pts = TelegrafJson.decode(
      """{"metrics":[{"name":"m","timestamp":5,"fields":{"value":true,"other":false},"tags":{}}]}""")
    assert(pts.map(p => (p.path, p.value)).toSet == Set(("m?", 1.0), ("m_other?", 0.0)))
  }

  // --- prometheus remote write: labels -> canonical tagged name ---
  test("prometheus WriteRequest decode with hand-rolled proto scan") {
    // build a WriteRequest wire-format body by hand:
    // TimeSeries{labels: [__name__=up, job=node&a b], samples: [(1.0, 1625478240000ms)]}
    def lenDelim(tag: Int, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(tag)
      var v = body.length
      while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
      out.write(v)
      out.write(body)
      out.toByteArray
    }
    def label(k: String, v: String): Array[Byte] =
      lenDelim(0x0a, k.getBytes(StandardCharsets.UTF_8)) ++ lenDelim(0x12, v.getBytes(StandardCharsets.UTF_8))
    def varint(v0: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      out.toByteArray
    }
    val sample = {
      val bits = java.lang.Double.doubleToLongBits(1.0)
      val b = new java.io.ByteArrayOutputStream()
      b.write(0x09)
      (0 until 8).foreach(i => b.write(((bits >>> (8 * i)) & 0xff).toInt))
      b.write(0x10)
      b.write(varint(1625478240000L))
      b.toByteArray
    }
    val ts = lenDelim(0x0a, label("job", "node&a b")) ++
      lenDelim(0x0a, label("__name__", "up")) ++
      lenDelim(0x12, sample)
    val req = lenDelim(0x0a, ts)

    val series = PrometheusRemoteWrite.decode(req)
    assert(series.size == 1)
    assert(series.head.canonicalName == "up?job=node%26a+b")
    assert(series.head.samples == Seq(PrometheusRemoteWrite.Sample(1.0, 1625478240L)))
  }

  test("prometheus series without __name__ is dropped") {
    // reuse CarbonPayload's encoder shapes: craft a labels-only series
    val ts = {
      val out = new java.io.ByteArrayOutputStream()
      val lbl = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(0x0a); b.write(1); b.write('k')
        b.write(0x12); b.write(1); b.write('v')
        b.toByteArray
      }
      out.write(0x0a); out.write(lbl.length); out.write(lbl)
      out.toByteArray
    }
    val req = new java.io.ByteArrayOutputStream()
    req.write(0x0a); req.write(ts.length); req.write(ts)
    assert(PrometheusRemoteWrite.decode(req.toByteArray).isEmpty)
  }

  // --- carbon payload (gRPC body) round trip ---
  test("carbon Payload encode/decode round trip") {
    val metrics = Seq(
      CarbonPayload.Metric("host1.cpu.load", Seq(
        CarbonPayload.Point(1625478240L, 0.5), CarbonPayload.Point(1625478300L, 1.5))),
      CarbonPayload.Metric("host2.mem;env=prod", Seq(CarbonPayload.Point(1625478240L, 42.0))))
    assert(CarbonPayload.decode(CarbonPayload.encode(metrics)) == metrics)
  }

  // --- pickle ---
  test("pickle decode: graphite [(name,(ts,value))] shapes") {
    // protocol-2 style opcodes, hand-assembled
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0x80); bos.write(2) // PROTO 2
    bos.write(']') // EMPTY_LIST
    bos.write('(') // MARK
    // ("metric.one", (1625478240, 3.14))
    bos.write(0x8c); bos.write(10); bos.write("metric.one".getBytes(StandardCharsets.UTF_8))
    bos.write('J') // BININT LE 1625478240
    val tsInt = 1625478240
    (0 until 4).foreach(i => bos.write((tsInt >>> (8 * i)) & 0xff))
    bos.write('G') // BINFLOAT BE
    val bits = java.lang.Double.doubleToLongBits(3.14)
    (7 to 0 by -1).foreach(i => bos.write(((bits >>> (8 * i)) & 0xff).toInt))
    bos.write(0x86) // TUPLE2 -> (ts, value)
    bos.write(0x86) // TUPLE2 -> (name, (ts, value))
    // ("metric.two", (1, 2)) with ascii ints
    bos.write('U'); bos.write(10); bos.write("metric.two".getBytes(StandardCharsets.UTF_8))
    bos.write('I'); bos.write("1\n".getBytes); bos.write('F'); bos.write("2.0\n".getBytes)
    bos.write(0x86); bos.write(0x86)
    bos.write('e') // APPENDS
    bos.write('.') // STOP
    val pts = PickleProtocol.decode(bos.toByteArray)
    assert(pts == Seq(
      PickleProtocol.Point("metric.one", 1625478240L, 3.14),
      PickleProtocol.Point("metric.two", 1L, 2.0)))
  }

  test("pickle decode: REAL python pickle.dumps bytes, protocols 0/1/2/4") {
    // pickle.dumps([('proto.pickle.metric', (1625478240, 3.0)),
    //               ('second.metric', (1625478300, 4.5))], protocol=p).hex()
    // — includes the memo opcodes (p/q/MEMOIZE) every real sender emits
    val goldens = Map(
      0 -> ("286c70300a285670726f746f2e7069636b6c652e6d65747269630a70310a2849313632353437383234300a46332e300a74" +
        "70320a7470330a6128567365636f6e642e6d65747269630a70340a2849313632353437383330300a46342e350a7470350a7470360a612e"),
      1 -> ("5d71002828581300000070726f746f2e7069636b6c652e6d65747269637101284a60d4e2604740080000000000007471027471" +
        "0328580d0000007365636f6e642e6d65747269637104284a9cd4e260474012000000000000747105747106652e"),
      2 -> ("80025d710028581300000070726f746f2e7069636b6c652e6d657472696371014a60d4e26047400800000000000086710286710" +
        "3580d0000007365636f6e642e6d657472696371044a9cd4e260474012000000000000867105867106652e"),
      4 -> ("8004954f000000000000005d94288c1370726f746f2e7069636b6c652e6d6574726963944a60d4e26047400800000000000086948" +
        "6948c0d7365636f6e642e6d6574726963944a9cd4e26047401200000000000086948694652e"))
    val expected = Seq(
      PickleProtocol.Point("proto.pickle.metric", 1625478240L, 3.0),
      PickleProtocol.Point("second.metric", 1625478300L, 4.5))
    for ((proto, hexStr) <- goldens) {
      val bytes = hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      assert(PickleProtocol.decode(bytes) == expected, s"protocol $proto")
    }
  }

  // --- live servers over real sockets ---
  test("HTTP telegraf + framed StoreSync end-to-end into the spool") {
    val dir = Files.createTempDirectory("graft-proto").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val http = new HttpIngestServer(spool, port = 0, clock = () => 1625478999L)
    val store = new FramedStoreServer(spool, port = 0, clock = () => 1625478999L)
    try {
      // telegraf over HTTP
      val url = new java.net.URI(s"http://127.0.0.1:${http.boundPort}/telegraf").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(
        """{"metrics":[{"name":"web","timestamp":1625478240,"fields":{"value":7},"tags":{"host":"a"}}]}"""
          .getBytes(StandardCharsets.UTF_8))
      assert(conn.getResponseCode == 200)

      // StoreSync over the framed socket
      val payload = CarbonPayload.encode(Seq(
        CarbonPayload.Metric("srv.cpu", Seq(CarbonPayload.Point(1625478240L, 9.9)))))
      val sock = new java.net.Socket("127.0.0.1", store.boundPort)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      out.writeInt(payload.length + 1)
      out.writeByte(1) // StoreSync
      out.write(payload)
      out.flush()
      val resp = sock.getInputStream.read()
      assert(resp == 0, "StoreSync must ack success")
      sock.close()

      // StoreSync ack = records flushed to the OS chunk file (the reference's
      // buffered-to-OS-file guarantee, writer.go:265-283) — the bytes must be
      // on disk NOW, in the in-flight .tmp chunk or an already-rotated one
      val files = Files.list(java.nio.file.Paths.get(s"$dir/spool")).toArray.map(_.toString)
      val ready = files.filter(f => f.endsWith(".tsv") || f.endsWith(".tsv.tmp"))
      assert(ready.nonEmpty, "StoreSync ack requires a durable chunk file")
      val content = ready.map(f => Files.readString(java.nio.file.Paths.get(f))).mkString
      assert(content.contains("srv.cpu\t9.9\t1625478240\t1625478999"))
      assert(content.contains("web?host=a\t7.0\t1625478240\t1625478999"))

      // validation error path: empty metric name fails the whole call
      val bad = CarbonPayload.encode(Seq(CarbonPayload.Metric("", Seq(CarbonPayload.Point(1L, 1.0)))))
      val sock2 = new java.net.Socket("127.0.0.1", store.boundPort)
      val out2 = new java.io.DataOutputStream(sock2.getOutputStream)
      out2.writeInt(bad.length + 1); out2.writeByte(0); out2.write(bad); out2.flush()
      assert(sock2.getInputStream.read() == 1, "empty name must be rejected")
      sock2.close()
    } finally {
      http.close(); store.close(); spool.close()
    }
  }

  test("UDP front-end drops trailing partial line") {
    val dir = Files.createTempDirectory("graft-udp").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val udp = new UdpLineServer(spool, port = 0, clock = () => 1625478999L)
    try {
      val sock = new java.net.DatagramSocket()
      val payload = "a.b 1 1625478240\nc.d 2 1625478240\npartial.line 3".getBytes(StandardCharsets.UTF_8)
      sock.send(new java.net.DatagramPacket(payload, payload.length,
        java.net.InetAddress.getLoopbackAddress, udp.boundPort))
      val deadline = System.currentTimeMillis() + 5000
      while (spool.pointsWritten.get() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(spool.pointsWritten.get() == 2, "only complete lines count")
      sock.close()
    } finally { udp.close(); spool.close() }
  }

  test("TCP framing: '\\n'-only terminators, partial tail at EOF dropped") {
    val dir = Files.createTempDirectory("graft-tcp").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val tcp = new TcpLineServer(spool, port = 0, clock = () => 1625478999L)
    try {
      val sock = new java.net.Socket("127.0.0.1", tcp.boundPort)
      // \r\n tolerated (parser strips \r); connection cut mid-line drops
      // the tail instead of ingesting a truncated metric (tcp.go:83-96)
      sock.getOutputStream.write(
        "a.b 1 1625478240\r\nc.d 2 1625478240\ntruncated.metric 3 16254".getBytes(StandardCharsets.UTF_8))
      sock.getOutputStream.flush()
      sock.close()
      val deadline = System.currentTimeMillis() + 5000
      while (spool.parseErrors.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(spool.pointsWritten.get() == 2, "only '\\n'-terminated lines count")
      assert(spool.droppedRing.dump().exists(_._2.contains("partial line")))
    } finally { tcp.close(); spool.close() }
  }

  test("drop filters: future/past windows and name length applied per receiver") {
    val dir = Files.createTempDirectory("graft-drops").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val now = 1625478999L
    val drops = graft.core.DropFilter(
      dropFutureSec = Some(3600), dropPastSec = Some(3600), dropLongerThan = Some(10))
    assert(spool.writeLine(s"a.b 1 ${now + 60}", now, drops = drops))
    assert(!spool.writeLine(s"a.b 1 ${now + 7200}", now, drops = drops), "too far in the future")
    assert(!spool.writeLine(s"a.b 1 ${now - 7200}", now, drops = drops), "too far in the past")
    assert(!spool.writeLine(s"a.very.long.name 1 $now", now, drops = drops), "name too long")
    assert(spool.droppedPoints.get() == 3)
    spool.close()
  }

  test("spool rejects names with TSV-breaking control bytes") {
    val dir = Files.createTempDirectory("graft-reject").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    spool.write("bad\tname", 1.0, 1L, 1L)
    spool.write("bad\nname", 1.0, 1L, 1L)
    spool.write("good.name", 1.0, 1L, 1L)
    spool.close()
    assert(spool.rejectedNames.get() == 2)
    assert(spool.pointsWritten.get() == 1)
    val files = Files.list(java.nio.file.Paths.get(s"$dir/spool")).toArray.map(_.toString).filter(_.endsWith(".tsv"))
    val content = files.map(f => Files.readString(java.nio.file.Paths.get(f))).mkString
    assert(content.linesIterator.size == 1 && content.startsWith("good.name\t"))
  }

  test("/debug/dropped exposes the last dropped lines with reasons") {
    val dir = Files.createTempDirectory("graft-debug").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val http = new HttpIngestServer(spool, port = 0)
    try {
      spool.writeLine("garbage with \"quotes\"", 1625478999L)
      spool.writeLine("ok.metric 1.0 1625478240", 1625478999L)
      spool.writeLine("nanvalue NaN 1625478240", 1625478999L)
      val url = new java.net.URI(s"http://127.0.0.1:${http.boundPort}/debug/dropped").toURL
      val body = new String(url.openStream().readAllBytes(), StandardCharsets.UTF_8)
      assert(body.contains("garbage with \\\"quotes\\\""))
      assert(body.contains("nanvalue"))
      assert(!body.contains("ok.metric"))
    } finally { http.close(); spool.close() }
  }

  test("per-receiver dropped rings, per-endpoint drop filters, admin cache clear") {
    val dir = Files.createTempDirectory("graft-rings").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val now = 1625478999L
    // prometheus drops everything >1h old; telegraf has NO drop windows —
    // the two endpoints must not share filters (carbon/config.go keeps
    // [prometheus] and [telegraf_http_json] separate)
    val tcp = new TcpLineServer(spool, port = 0,
      drops = graft.core.DropFilter(dropPastSec = Some(3600), dropFutureSec = None, dropLongerThan = None),
      clock = () => now)
    @volatile var cleared = false
    val http = new HttpIngestServer(spool, port = 0,
      promDrops = graft.core.DropFilter(dropPastSec = Some(3600), dropFutureSec = None, dropLongerThan = None),
      telegrafDrops = graft.core.DropFilter.Empty,
      debugRings = Map("tcp" -> tcp.droppedRing),
      onCacheClear = () => cleared = true,
      clock = () => now)
    try {
      def get(path: String): String = {
        val url = new java.net.URI(s"http://127.0.0.1:${http.boundPort}$path").toURL
        new String(url.openStream().readAllBytes(), StandardCharsets.UTF_8)
      }
      def postTelegraf(body: String): Int = {
        val url = new java.net.URI(s"http://127.0.0.1:${http.boundPort}/telegraf").toURL
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
        conn.getResponseCode
      }
      // an hour-old point: telegraf (no windows) accepts what prometheus would drop
      val old = now - 7200
      assert(postTelegraf(
        s"""{"metrics":[{"name":"aged","timestamp":$old,"fields":{"value":1},"tags":{}}]}""") == 200)
      assert(spool.droppedPoints.get() == 0, "telegraf endpoint has no drop windows")

      // a TCP drop lands in the TCP receiver's own ring...
      val sock = new java.net.Socket("127.0.0.1", tcp.boundPort)
      sock.getOutputStream.write(s"stale.metric 1 $old\n".getBytes(StandardCharsets.UTF_8))
      sock.getOutputStream.flush(); sock.close()
      val deadline = System.currentTimeMillis() + 5000
      while (tcp.droppedRing.size < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(get("/debug/receive/tcp/dropped/").contains("stale.metric"))
      // ...and NOT in the prometheus receiver's ring
      assert(!get("/debug/receive/prometheus/dropped/").contains("stale.metric"))

      // admin cache clear (SIGUSR1 analogue) reaches the engine hook
      assert(get("/admin/clear-cache").contains("requested"))
      assert(cleared)
    } finally { tcp.close(); http.close(); spool.close() }
  }

  test("TLS round-trip: TCP and HTTP listeners serve the checked-in PEM pair") {
    // self-signed server.crt/key under test resources, same pattern as
    // the reference's checked-in tests/tls/{ca,client}.{crt,key}
    def res(name: String): String =
      new java.io.File(getClass.getClassLoader.getResource(s"tls/$name").toURI).getAbsolutePath
    val serverCtx = graft.core.Tls.serverContext(res("server.crt"), res("server.key"))
    // self-signed: the server cert IS the trust anchor
    val clientCtx = graft.core.Tls.clientContext(Seq(res("server.crt")))

    val dir = Files.createTempDirectory("graft-tls").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val now = 1625478999L
    val tcp = new TcpLineServer(spool, port = 0, tls = Some(serverCtx), clock = () => now)
    val http = new HttpIngestServer(spool, port = 0, tls = Some(serverCtx), clock = () => now)
    try {
      // TLS TCP: plaintext protocol line over an SSL socket
      val sock = clientCtx.getSocketFactory.createSocket("localhost", tcp.boundPort)
      sock.getOutputStream.write("tls.tcp.metric 4.2 1625478240\n".getBytes(StandardCharsets.UTF_8))
      sock.getOutputStream.flush(); sock.close()

      // a NON-TLS client must fail the handshake (listener really is TLS)
      val plain = new java.net.Socket("127.0.0.1", tcp.boundPort)
      plain.getOutputStream.write("plaintext.should.fail 1 1625478240\n".getBytes(StandardCharsets.UTF_8))
      try { plain.getOutputStream.flush(); plain.close() } catch { case _: java.io.IOException => () }

      // TLS HTTP: telegraf JSON over https
      val conn = new java.net.URI(s"https://localhost:${http.boundPort}/telegraf").toURL
        .openConnection().asInstanceOf[javax.net.ssl.HttpsURLConnection]
      conn.setSSLSocketFactory(clientCtx.getSocketFactory)
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(
        """{"metrics":[{"name":"tls_http","timestamp":1625478300,"fields":{"value":7.7},"tags":{}}]}"""
          .getBytes(StandardCharsets.UTF_8))
      assert(conn.getResponseCode == 200)

      spool.rotate()
      val lines = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/spool")).toArray
        .map(_.toString).filter(_.endsWith(".tsv"))
        .flatMap(f => java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f)).toArray(Array.empty[String]))
      assert(lines.exists(_.startsWith("tls.tcp.metric\t4.2\t1625478240")), lines.mkString("|"))
      // transport assertion only — telegraf naming quirks have their own goldens
      assert(lines.exists(l => l.startsWith("tls_http") && l.contains("\t7.7\t1625478300")),
        lines.mkString("|"))
      assert(!lines.exists(_.contains("plaintext.should.fail")),
        "non-TLS bytes must not reach the spool through a TLS listener")
    } finally { tcp.close(); http.close(); spool.close() }
  }

  test("self-metrics collector emits rate counters into the spool") {
    val dir = Files.createTempDirectory("graft-self").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val collector = new SelfMetricsCollector(spool, intervalMs = 3600000, clock = () => 1625478999L)
    spool.write("x.y", 1.0, 1625478240L, 1625478999L)
    spool.write("x.z", 2.0, 1625478240L, 1625478999L)
    collector.collectOnce()
    spool.close()
    collector.close()
    val files = Files.list(java.nio.file.Paths.get(s"$dir/spool")).toArray.map(_.toString).filter(_.endsWith(".tsv"))
    val content = files.map(f => Files.readString(java.nio.file.Paths.get(f))).mkString
    assert(content.contains("carbon.agents.graft.pointsWritten\t2.0"))
  }
}

package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import graft.core.{ChunkAutoInterval, DropFilter, DroppedRing, GraphiteTags, PlainProtocol}

/**
 * Chunk-rotating spool writer — the hand-off point between protocol
 * front-ends and the Spark streaming job, mirroring the reference design
 * (/root/reference/writer/writer.go:50-312): front-ends append parsed,
 * canonical records to the current chunk; the chunk rotates on an
 * interval or size cap and becomes visible to the Spark file source only
 * on rotation (atomic rename), so Spark never reads a half-written file.
 *
 * Records are spooled as TSV `path \t value \t time \t version` — the
 * canonical interchange row (§1.1). Plain text instead of RowBinary is a
 * deliberate divergence: Spark's text/csv source reads it natively and
 * splittably; wire-compat with ClickHouse spool files buys nothing here.
 *
 * Concurrency: the writer is STRIPED — each stripe owns its own chunk
 * file and lock, and a writing thread sticks to one stripe, so N
 * ingest connections don't serialize on a single monitor (the
 * reference gives each connection pooled buffers, receiver/buffer.go;
 * striping is the same contention fix for a shared append sink). Line
 * formatting happens outside the lock. The ingest loadtest
 * (graft.tools.IngestLoadTest) is the regression harness for this.
 */
final class SpoolWriter(
    dir: String,
    chunkIntervalMs: Long = 1000,
    chunkMaxBytes: Long = 0, // 0 = no size limit (writer.go:148)
    stripes: Int = SpoolWriter.DefaultStripes,
    autoInterval: Option[ChunkAutoInterval] = None,
    compression: String = "none", // "none" | "gzip" | "lz4" ([data] compression)
    compressionLevel: Option[Int] = None // [data] compression-level (gzip 1-9, lz4hc 1-17)
) extends AutoCloseable {
  require(stripes > 0)
  // The reference offers none|lz4|lz4hc (helper/config/compression.go:
  // 16-19, writer.go:200-232); all three are honored — lz4 chunks use
  // the Hadoop-Lz4Codec block layout (lz4-java ships with Spark), which
  // Spark's text source decompresses natively by the .lz4 extension.
  // gzip is an ADDITIONAL option the reference doesn't have (kept for
  // ubiquity of .gz tooling). compression-level: deflate 1-9 for gzip,
  // lz4hc 1-17 for lz4 (absent = fast/default mode, like the reference).
  require(compression == "none" || compression == "gzip" || compression == "lz4",
    s"Compression algorithm '$compression' not supported")
  private val gz = compression == "gzip"
  private val lz4 = compression == "lz4"
  private val chunkExt = if (gz) ".tsv.gz" else if (lz4) ".tsv.lz4" else ".tsv"

  private val spoolDir = Paths.get(dir)
  Files.createDirectories(spoolDir)

  /** Points written since start (self-metrics source). */
  val pointsWritten = new AtomicLong(0)
  /** Parse errors since start. */
  val parseErrors = new AtomicLong(0)
  /** Names rejected for containing TSV-breaking control bytes. */
  val rejectedNames = new AtomicLong(0)
  /** Points dropped by receiver drop filters. */
  val droppedPoints = new AtomicLong(0)
  /** Last-1000 dropped lines with reasons (receiver/base.go:88-127). */
  val droppedRing = new DroppedRing(1000)

  // per-process uniqueness: a per-instance seq alone collides when two
  // writers (or a restarted one) open chunks in the same millisecond, and
  // the later atomic rename would silently REPLACE the earlier chunk
  private val writerId = f"${scala.util.Random.nextInt(0xffffff)}%06x"
  private val seq = new AtomicLong(0)

  private final class Stripe {
    var current: java.io.BufferedWriter = _
    var currentPath: Path = _
    var currentBytes = 0L
    var openedAt = 0L
    val lock = new Object

    def openChunk(): Unit = {
      currentPath = spoolDir.resolve(
        f"chunk-${System.currentTimeMillis()}%013d-$writerId-${seq.incrementAndGet()}%06d$chunkExt.tmp")
      val fileOut = Files.newOutputStream(currentPath,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      // syncFlush so flushCurrent() (the StoreSync durability point)
      // pushes the current deflate block to the OS file, not a buffer;
      // compression-level maps to the deflater level (reference
      // carbon/config.go compression-level for lz4hc)
      val out =
        if (gz) new java.util.zip.GZIPOutputStream(fileOut, 8192, true) {
          compressionLevel.foreach(l => `def`.setLevel(math.min(9, math.max(1, l))))
        }
        else if (lz4) {
          val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()
          val compressor = compressionLevel match {
            case Some(l) => factory.highCompressor(math.min(17, math.max(1, l))) // lz4hc
            case None    => factory.fastCompressor()
          }
          new SpoolWriter.Lz4BlockOutputStream(fileOut, compressor)
        }
        else fileOut
      current = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8))
      currentBytes = 0L
      openedAt = System.currentTimeMillis()
    }

    // size cap counts UNCOMPRESSED chars (with gzip the on-disk chunk is
    // smaller; the cap still bounds the consumer's per-chunk work)
    def write(line: String): Unit = lock.synchronized {
      if (current == null) openChunk()
      current.write(line)
      currentBytes += line.length
      if (chunkMaxBytes > 0 && currentBytes >= chunkMaxBytes) rotateLocked()
    }

    def rotateLocked(): Unit = {
      if (current != null) {
        current.close()
        // atomic visibility: drop the .tmp suffix only when complete
        val done = currentPath.resolveSibling(currentPath.getFileName.toString.stripSuffix(".tmp"))
        Files.move(currentPath, done, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        current = null
      }
    }

    def flush(): Unit = lock.synchronized { if (current != null) current.flush() }
    def rotate(): Unit = lock.synchronized(rotateLocked())
    def maybeRotate(intervalMs: Long): Unit = lock.synchronized {
      if (current != null && System.currentTimeMillis() - openedAt >= intervalMs) rotateLocked()
    }
  }

  private val stripeArr = Array.fill(stripes)(new Stripe)

  private def myStripe: Stripe =
    stripeArr(((Thread.currentThread().getId % stripes) + stripes).toInt % stripes)

  /** TSV interchange cannot carry tab/newline in the name column. Only
    * binary protocols (pickle, framed Store) can produce such names —
    * the reference's RowBinary spool is length-prefixed and would pass
    * them through; rejecting (and counting) at the spool boundary is a
    * DOCUMENTED DIVERGENCE that keeps every downstream row well-formed. */
  private def nameIsSpoolable(path: String): Boolean = {
    var i = 0
    while (i < path.length) {
      val c = path.charAt(i)
      if (c == '\t' || c == '\n' || c == '\r') return false
      i += 1
    }
    true
  }

  /** Append one canonical record. Thread-safe. */
  def write(path: String, value: Double, time: Long, version: Long): Unit = {
    if (!nameIsSpoolable(path)) { rejectedNames.incrementAndGet(); return }
    // format OUTSIDE the stripe lock
    val line = new java.lang.StringBuilder(path.length + 40)
      .append(path).append('\t').append(value).append('\t')
      .append(time).append('\t').append(version).append('\n').toString
    myStripe.write(line)
    pointsWritten.incrementAndGet()
  }

  /**
   * Parse a raw plaintext protocol line and spool it; bad lines are
   * counted and dropped, as are points failing the receiver's drop
   * filters (receiver/base.go:68-86 semantics). Drops are recorded in
   * the writer's aggregate ring AND, when given, the calling receiver's
   * own ring (the reference keeps one ring per receiver, base.go:16).
   */
  def writeLine(line: String, now: Long,
                config: GraphiteTags.TagConfig = GraphiteTags.Disabled,
                drops: DropFilter = DropFilter.Empty,
                ring: Option[DroppedRing] = None): Boolean = {
    def rec(reason: String): Unit = {
      droppedRing.record(line, reason)
      ring.foreach(_.record(line, reason))
    }
    PlainProtocol.parseLine(line, now, config) match {
      case Right(p) if drops.accepts(p.name, p.timestamp, now) =>
        write(p.name, p.value, p.timestamp, now); true
      case Right(_) =>
        droppedPoints.incrementAndGet(); rec("drop filter"); false
      case Left(err) =>
        parseErrors.incrementAndGet(); rec(err); false
    }
  }

  /**
   * Flush every stripe's buffer to its OS file — the StoreSync
   * durability point (writer.go:265-283 confirms write buffers after
   * bufio.Flush, BEFORE rotation/upload).
   */
  def flushCurrent(): Unit = stripeArr.foreach(_.flush())

  /** Rotated chunks not yet consumed+cleaned by the streaming job —
    * the reference's "unhandled files" backpressure signal
    * (writer.go:146-162; requires the stream's cleanSource=delete). */
  def unhandledChunks(): Int = {
    val ds = Files.newDirectoryStream(spoolDir, "*.{tsv,tsv.gz,tsv.lz4}")
    try {
      var n = 0
      val it = ds.iterator()
      while (it.hasNext) { it.next(); n += 1 }
      n
    } finally ds.close()
  }

  /**
   * Rotate chunks whose interval has elapsed (call from a timer). With
   * an [[ChunkAutoInterval]] configured, the effective interval grows
   * with the count of unhandled chunks (chunk_interval.go:68-85) —
   * fewer, larger chunks when the consumer is behind.
   */
  def maybeRotate(): Unit = {
    val intervalMs = autoInterval match {
      case Some(auto) => auto.intervalMsFor(unhandledChunks())
      case None       => chunkIntervalMs
    }
    stripeArr.foreach(_.maybeRotate(intervalMs))
  }

  /** Force-rotate all current chunks (flush for sync acks / shutdown). */
  def rotate(): Unit = stripeArr.foreach(_.rotate())

  override def close(): Unit = rotate()
}

object SpoolWriter {
  /** Enough stripes to take lock contention off the ingest hot path
    * without exploding the chunk-file count. */
  val DefaultStripes: Int =
    math.max(2, math.min(8, Runtime.getRuntime.availableProcessors() / 4))

  /**
   * Flushable lz4 chunk stream in the Hadoop Lz4Codec on-disk layout —
   * per block: uncompressed length (int BE), compressed length (int
   * BE), one raw lz4 block — which is exactly what Hadoop's
   * BlockDecompressorStream (and therefore Spark's text source, keyed
   * by the .lz4 extension) reads back. Hand-rolled rather than
   * `codec.createOutputStream` for ONE reason: here `flush()` FINISHES
   * the current block and pushes it to the OS file — the StoreSync
   * durable-before-ack point (writer.go:265-283) — where the codec's
   * stream can keep a whole block buffered across flush. The reference
   * frames lz4 the same way for its spool (writer.go:200-232).
   */
  private[graft] final class Lz4BlockOutputStream(
      out: java.io.OutputStream,
      compressor: net.jpountz.lz4.LZ4Compressor,
      blockSize: Int = 64 * 1024) extends java.io.OutputStream {
    private val buf = new Array[Byte](blockSize)
    private var pos = 0
    private val cbuf = new Array[Byte](compressor.maxCompressedLength(blockSize))

    override def write(b: Int): Unit = {
      if (pos == blockSize) emit()
      buf(pos) = b.toByte
      pos += 1
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off
      var l = len
      while (l > 0) {
        if (pos == blockSize) emit()
        val n = math.min(l, blockSize - pos)
        System.arraycopy(b, o, buf, pos, n)
        pos += n; o += n; l -= n
      }
    }

    private def writeIntBE(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }

    private def emit(): Unit = if (pos > 0) {
      val clen = compressor.compress(buf, 0, pos, cbuf, 0)
      writeIntBE(pos)
      writeIntBE(clen)
      out.write(cbuf, 0, clen)
      pos = 0
    }

    override def flush(): Unit = { emit(); out.flush() }
    override def close(): Unit = { emit(); out.close() }
  }
}

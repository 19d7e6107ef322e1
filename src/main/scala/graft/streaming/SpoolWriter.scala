package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import graft.core.{DropFilter, DroppedRing, GraphiteTags, PlainProtocol}

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
 */
final class SpoolWriter(
    dir: String,
    chunkIntervalMs: Long = 1000,
    chunkMaxBytes: Long = 64L * 1024 * 1024
) extends AutoCloseable {

  private val spoolDir = Paths.get(dir)
  Files.createDirectories(spoolDir)

  private val seq = new AtomicLong(0)
  private var current: java.io.BufferedWriter = _
  private var currentPath: Path = _
  private var currentBytes = 0L
  private var openedAt = 0L
  private val lock = new Object

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

  // per-process uniqueness: the per-instance seq alone collides when two
  // writers (or a restarted one) open chunks in the same millisecond, and
  // the later atomic rename would silently REPLACE the earlier chunk
  private val writerId = f"${scala.util.Random.nextInt(0xffffff)}%06x"

  private def openChunk(): Unit = {
    currentPath = spoolDir.resolve(
      f"chunk-${System.currentTimeMillis()}%013d-$writerId-${seq.incrementAndGet()}%06d.tsv.tmp")
    current = Files.newBufferedWriter(currentPath, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    currentBytes = 0L
    openedAt = System.currentTimeMillis()
  }

  /** Append one canonical record. Thread-safe. */
  def write(path: String, value: Double, time: Long, version: Long): Unit = {
    if (!nameIsSpoolable(path)) { rejectedNames.incrementAndGet(); return }
    writeChecked(path, value, time, version)
  }

  private def writeChecked(path: String, value: Double, time: Long, version: Long): Unit = lock.synchronized {
    if (current == null) openChunk()
    val line = new java.lang.StringBuilder(path.length + 40)
      .append(path).append('\t').append(value).append('\t')
      .append(time).append('\t').append(version).append('\n').toString
    current.write(line)
    currentBytes += line.length
    pointsWritten.incrementAndGet()
    if (currentBytes >= chunkMaxBytes) rotateLocked()
  }

  /**
   * Parse a raw plaintext protocol line and spool it; bad lines are
   * counted and dropped, as are points failing the receiver's drop
   * filters (receiver/base.go:68-86 semantics).
   */
  def writeLine(line: String, now: Long,
                config: GraphiteTags.TagConfig = GraphiteTags.Disabled,
                drops: DropFilter = DropFilter.Empty): Boolean =
    PlainProtocol.parseLine(line, now, config) match {
      case Right(p) if drops.accepts(p.name, p.timestamp, now) =>
        write(p.name, p.value, p.timestamp, now); true
      case Right(_) =>
        droppedPoints.incrementAndGet(); droppedRing.record(line, "drop filter"); false
      case Left(err) =>
        parseErrors.incrementAndGet(); droppedRing.record(line, err); false
    }

  private def rotateLocked(): Unit = {
    if (current != null) {
      current.close()
      // atomic visibility: drop the .tmp suffix only when complete
      val done = currentPath.resolveSibling(currentPath.getFileName.toString.stripSuffix(".tmp"))
      Files.move(currentPath, done, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      current = null
    }
  }

  /** Rotate if the chunk interval has elapsed (call from a timer). */
  def maybeRotate(): Unit = lock.synchronized {
    if (current != null && System.currentTimeMillis() - openedAt >= chunkIntervalMs) rotateLocked()
  }

  /** Force-rotate the current chunk (flush for sync acks / shutdown). */
  def rotate(): Unit = lock.synchronized(rotateLocked())

  override def close(): Unit = rotate()
}

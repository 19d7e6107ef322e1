package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Spool ops tooling, the `-cat` / `-recover` equivalents of the
 * reference binary (/root/reference/carbon-clickhouse.go:52-95): `cat`
 * prints a spool chunk as validated TSV with the derived date column
 * (what the reference's RowBinary cat shows), `recover` salvages every
 * well-formed record from a corrupt/truncated chunk into a new chunk
 * file that the streaming job will pick up.
 *
 * Usage:
 *   graft.tools.SpoolTool cat <chunk.tsv> [...]
 *   graft.tools.SpoolTool recover <corrupt-chunk> <out-chunk.tsv>
 */
object SpoolTool {

  final case class Row(path: String, value: Double, time: Long, version: Long)

  /** Strict row validation: 4 tab-separated fields, finite value,
    * integral time/version, non-empty control-free name. */
  def parseRow(line: String): Option[Row] = {
    val f = line.split("\t", -1)
    if (f.length != 4) return None
    val path = f(0)
    if (path.isEmpty || path.exists(c => c == '\n' || c == '\r')) return None
    try {
      val value = f(1).toDouble
      if (value.isNaN) return None
      val time = f(2).toLong
      val version = f(3).toLong
      if (time < 0 || version < 0) return None
      Some(Row(path, value, time, version))
    } catch { case _: NumberFormatException => None }
  }

  /** TSV render with the derived date, like the reference's -cat output
    * (Path Value Time Date Version). */
  def render(r: Row): String = {
    val date = java.time.LocalDate.ofEpochDay(r.time / 86400)
    s"${r.path}\t${r.value}\t${r.time}\t$date\t${r.version}"
  }

  /** Open a chunk for reading; .gz / .lz4 chunks decompress
    * transparently (.lz4 via the same Hadoop codec Spark's text source
    * resolves by extension — it reads the SpoolWriter block layout). */
  private def chunkReader(path: String): java.io.BufferedReader = {
    val in = Files.newInputStream(Paths.get(path))
    val stream: java.io.InputStream =
      if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(in)
      else if (path.endsWith(".lz4")) {
        val codec = new org.apache.hadoop.io.compress.Lz4Codec()
        codec.setConf(new org.apache.hadoop.conf.Configuration(false))
        codec.createInputStream(in)
      } else in
    new java.io.BufferedReader(new java.io.InputStreamReader(stream, StandardCharsets.UTF_8))
  }

  /** Salvage good rows; returns (good, bad) counts. A truncated gzip
    * chunk (crash mid-write) keeps every row decoded before the cut. */
  def recover(in: String, out: String): (Long, Long) = {
    var good = 0L
    var bad = 0L
    val tmp = Paths.get(out + ".tmp")
    val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try {
      val reader = chunkReader(in)
      try {
        var line = reader.readLine()
        while (line != null) {
          parseRow(line) match {
            case Some(r) =>
              w.write(s"${r.path}\t${r.value}\t${r.time}\t${r.version}\n"); good += 1
            case None => bad += 1
          }
          line = reader.readLine()
        }
      } catch {
        // truncated deflate stream: keep everything salvaged so far
        case _: java.io.EOFException | _: java.util.zip.ZipException => bad += 1
      } finally reader.close()
    } finally w.close()
    // atomic visibility, same contract as SpoolWriter rotation
    Files.move(tmp, Paths.get(out), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    (good, bad)
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "cat" :: files if files.nonEmpty =>
      for (f <- files) {
        val r = chunkReader(f)
        try {
          var line = r.readLine()
          while (line != null) {
            parseRow(line) match {
              case Some(row) => println(render(row))
              case None      => System.err.println(s"skip bad record: ${line.take(120)}")
            }
            line = r.readLine()
          }
        } finally r.close()
      }
    case "recover" :: in :: out :: Nil =>
      val (good, bad) = recover(in, out)
      System.err.println(s"recovered $good records, dropped $bad")
    case _ =>
      System.err.println("usage: SpoolTool cat <chunk.tsv>... | SpoolTool recover <in> <out>")
      sys.exit(2)
  }
}

package graft.tools

import graft.operators.{GifPixels, JpegBaseline, MultimodalOps}

/**
 * Single-thread decode-throughput measurement for the pure-JVM media
 * decoders — the scale question it answers: at 100 TB of blobs, is the
 * pixel/sample stage the pipeline bottleneck, or does the parquet scan
 * still dominate? Prints per-format blobs/s and MB/s on one core
 * (multiply by executor cores for cluster throughput; the operators
 * run the decoders inside mapPartitions, embarrassingly parallel).
 * No Spark session — this times the kernels themselves.
 */
object MediaDecodeAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)

    // representative fixtures (encode cost excluded from timing)
    val pngPx = Array.tabulate(64 * 64)(i => ((i * 31 + 7) % 256).toByte)
    val png = MultimodalOps.encodePngGray(pngPx, 64, 64, r => r % 5)
    val jpegBlocks = Array.tabulate(64) { b => // 64x64 gray, mixed AC
      val zz = new Array[Int](64)
      zz(0) = (b * 97 % 255) - 127
      for (k <- 1 until 64 if (k * 31 + b * 17) % 5 == 0) zz(k) = ((k * 13 + b * 41) % 15) - 7
      zz
    }
    val jpeg = JpegBaseline.encodeGrayBlocks(jpegBlocks, 8, 8, Array.tabulate(64)(k => 1 + k % 23))
    val gif = GifPixels.encodeGifGray(Array.tabulate(64 * 64)(i => ((i * 31 + (i * i) % 97) % 256).toByte), 64, 64)
    val wav = MultimodalOps.encodeWavPcm(Array.tabulate(4096)(i => i * 1337 % 30000 - 15000), 16, 2, 16000)
    val avi = MultimodalOps.encodeAviMjpeg(Array.fill(4)(jpeg), 64, 64)

    def bench(label: String, blob: Array[Byte], decode: Array[Byte] => Any): Unit = {
      var i = 0
      while (i < n / 4) { decode(blob); i += 1 } // warmup/JIT
      val t0 = System.nanoTime()
      i = 0
      var sink = 0L // defeat dead-code elimination
      while (i < n) {
        sink += (decode(blob) match {
          case Some(a: Array[Byte]) => a.length
          case Some(d: JpegBaseline.Decoded) => d.samples.length
          case Some(a: Array[Int]) => a.length
          case Some(fs: Array[_]) => fs.length
          case _ => 0
        })
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s ${n / dt}%9.0f blobs/s  ${n * blob.length / dt / 1e6}%8.1f MB/s  (sink=$sink)")
    }
    println(s"single-core decode throughput, n=$n per format")
    bench("png 64x64 gray", png, MultimodalOps.decodePngPixels(_))
    bench("jpeg 64x64 gray", jpeg, JpegBaseline.decodePixels(_))
    bench("gif 64x64 gray", gif, GifPixels.decodeGifPixels(_))
    bench("wav 4096 s16 stereo", wav, MultimodalOps.decodeWavSamples(_))
    bench("avi 4x mjpeg 64x64", avi, (b: Array[Byte]) =>
      MultimodalOps.parseAviFrames(b).map(_.map(JpegBaseline.decodePixels(_))))
  }
}

package graft.util

/** RAW-I/O canary shared by Bench and ScaleSoak: 200 MB written (fsync'd)
  * + read back through plain JVM streams, returning MB moved (write+read)
  * per second. The box shows recurring degraded-I/O windows (30-40%
  * uniform drops across all legs — BENCH_NOTES.md rounds 5-9, and the
  * round-18 archived q55 x64 soak leg at 11.61 s whose clean rerun was
  * 4.91 s) that previously took manual re-runs and prose notes to
  * adjudicate; a canary reading recorded NEXT TO each measurement makes
  * the artifact self-describing — anyone reading the CSV/JSON can tell a
  * regression from disk weather without cross-referencing BENCH_NOTES.
  */
object IoCanary {

  /** One probe under `dir` (the measurement's own tmp filesystem). */
  def probe(dir: java.nio.file.Path): Double = {
    val f = dir.resolve("io_canary.bin").toFile
    val buf = new Array[Byte](1 << 20)
    var i = 0
    while (i < buf.length) { buf(i) = (i * 31 + 7).toByte; i += 1 } // incompressible-ish, non-zero
    val mb = 200
    val t0 = System.nanoTime()
    val fos = new java.io.FileOutputStream(f)
    val out = new java.io.BufferedOutputStream(fos, 1 << 20)
    try {
      var j = 0
      while (j < mb) { out.write(buf); j += 1 }
      out.flush()
      fos.getFD.sync() // page-cache-proof: the write must reach the device
    } finally out.close()
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 20)
    try { while (in.read(buf) > 0) () } finally in.close()
    val sec = (System.nanoTime() - t0) / 1e9
    f.delete()
    2.0 * mb / sec // MB moved (write+read) per second
  }
}

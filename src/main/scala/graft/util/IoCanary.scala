package graft.util

/** RAW-I/O canary shared by Bench and ScaleSoak: 200 MB written (fsync'd)
  * + read back, returning MB moved (write+read) per second. The box shows
  * recurring degraded-I/O windows (30-40% uniform drops across all legs —
  * BENCH_NOTES.md rounds 5-9, and the round-18 archived q55 x64 soak leg
  * at 11.61 s whose clean rerun was 4.91 s) that previously took manual
  * re-runs and prose notes to adjudicate; a canary reading recorded NEXT
  * TO each measurement makes the artifact self-describing — anyone
  * reading the CSV/JSON can tell a regression from disk weather without
  * cross-referencing BENCH_NOTES.
  *
  * The read leg opens the file O_DIRECT (round-19 advice #3): a plain
  * read of a just-written 200 MB file is served from the page cache, so
  * the previous probe mostly measured write+fsync throughput and was
  * blind to read-side disk degradation. O_DIRECT bypasses the cache —
  * the read hits the device — with 4 KiB-aligned direct buffers (the
  * O_DIRECT alignment contract). A filesystem that refuses O_DIRECT
  * (tmpfs) falls back to the buffered read; the metric is then
  * write-dominated there, which matches what such a filesystem's "disk
  * weather" can even mean.
  */
object IoCanary {

  /** One probe under `dir` (the measurement's own tmp filesystem). */
  def probe(dir: java.nio.file.Path): Double = {
    val p = dir.resolve("io_canary.bin")
    val f = p.toFile
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
    readBack(p, buf)
    val sec = (System.nanoTime() - t0) / 1e9
    f.delete()
    2.0 * mb / sec // MB moved (write+read) per second
  }

  /** Read the whole file back, uncached where the filesystem allows it. */
  private def readBack(p: java.nio.file.Path, fallbackBuf: Array[Byte]): Unit = {
    val direct =
      try {
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.READ,
          com.sun.nio.file.ExtendedOpenOption.DIRECT)
        try {
          // 1 MiB direct buffer, 4 KiB-aligned (file size 200 MiB is a
          // multiple, so every read is fully aligned)
          val bb = java.nio.ByteBuffer.allocateDirect((1 << 20) + 4096)
            .alignedSlice(4096)
          while (ch.read(bb) > 0) bb.clear()
        } finally ch.close()
        true
      } catch {
        case _: UnsupportedOperationException | _: java.io.IOException => false
      }
    if (!direct) {
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(p.toFile), 1 << 20)
      try { while (in.read(fallbackBuf) > 0) () } finally in.close()
    }
  }
}

package graft.operators

import graft.sinks.Sink
import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import org.apache.hadoop.fs.Path

/** The byte fast paths' shared DRIVER-SIDE commit: all new data is fully
  * materialized as attempt-unique files in a temp dir before anything at
  * the output paths is touched (the destructive window is the renames, not
  * the copy), then either merged into ONE file (the `-o out.ext` single-
  * writer contract — same inherent bottleneck as `coalesce(1)`) or renamed
  * to deterministic rolled part names; stale parts a previous run left are
  * swept AFTER, the same contract as Sink.promote. One implementation so
  * the CSV and JSONL fast paths cannot diverge on commit semantics.
  */
private[operators] object BytePromote {

  /** Promote collected attempts; returns bytes written at the contract
    * path(s). `header`: bytes + '\n' prepended to a single-file merge (the
    * CSV header; parts were written headerless in single-file mode).
    */
  def promote(
      hconf: org.apache.hadoop.conf.Configuration,
      sinkPath: String,
      ext: String,
      tmpDir: String,
      results: Seq[(Int, String, Long, Long, Double)],
      singleFile: Boolean,
      bufBytes: Int,
      header: Option[Array[Byte]]): Long = {
    val tfs = new Path(sinkPath).getFileSystem(hconf)
    Option(new Path(sinkPath).getParent).foreach(tfs.mkdirs)
    val outBase = sinkPath.stripSuffix(ext)
    val bytesWritten = if (singleFile) {
      val merged = new Path(tmpDir, "merged")
      val out = new BufferedOutputStream(tfs.create(merged, true), bufBytes)
      try {
        header.foreach { h => out.write(h); out.write('\n'.toInt) }
        results.sortBy(_._1).foreach { case (_, name, _, _, _) =>
          val in = new BufferedInputStream(tfs.open(new Path(tmpDir, name)), 1 << 20)
          try copyAll(in, out) finally in.close()
        }
      } finally out.close()
      Sink.replaceMove(tfs, merged, new Path(sinkPath))
      Sink.deleteStaleParts(hconf, sinkPath, ext, keepBelow = 0)
      tfs.getFileStatus(new Path(sinkPath)).getLen
    } else {
      results.foreach { case (idx, name, _, _, _) =>
        Sink.replaceMove(tfs, new Path(tmpDir, name),
          new Path(f"$outBase%s-$idx%04d$ext%s"))
      }
      Sink.deleteStaleParts(hconf, sinkPath, ext, keepBelow = results.size)
      results.map { case (idx, _, _, _, _) =>
        tfs.getFileStatus(new Path(f"$outBase%s-$idx%04d$ext%s")).getLen
      }.sum
    }
    new Path(tmpDir).getFileSystem(hconf).delete(new Path(tmpDir), true)
    bytesWritten
  }

  /** Per-file completion records (the reference renders per-file progress
    * bars, progress.rs:6-197; batch-mode Spark reports them post-hoc).
    */
  def perFileMetrics(results: Seq[(Int, String, Long, Long, Double)],
      paths: Int => String): Seq[Map[String, Any]] =
    results.sortBy(_._1).map { case (idx, _, rows, inBytes, sec) =>
      Map[String, Any]("path" -> paths(idx), "rows" -> rows,
        "bytes" -> inBytes, "elapsed_sec" -> sec)
    }

  def copyAll(in: InputStream, out: OutputStream): Unit = {
    val buf = new Array[Byte](1 << 20)
    var n = in.read(buf)
    while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
  }
}

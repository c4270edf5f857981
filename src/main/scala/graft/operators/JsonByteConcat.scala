package graft.operators

import graft.sinks.Sink
import graft.sources.Discovery.{InputFile, Jsonl}
import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JSONL->JSONL concatenation at byte level — the fast path CSV gets from
  * [[CsvByteConcat]], radically simpler here because JSONL is
  * SELF-DESCRIBING: each line carries its own keys, so concatenating files
  * with different schemas is value-faithful without any unification step —
  * a reader of the byte-concatenated output binds by key and produces
  * exactly the unified frame the typed Concat plan would (absent keys read
  * as null either way; corrupt lines null out identically under PERMISSIVE
  * on both routes). No headers to dedupe, no quote state to track, no NA
  * normalization: the whole transform is "copy the bytes, normalize the
  * final newline".
  *
  * Scale shape: one task per input file (files RDD, genuine per-partition
  * byte I/O — the documented last-resort case, same as the CSV path),
  * streaming through the Hadoop FS API. No shuffle, no row
  * materialization; storage-bound and scales with file count across
  * executors.
  *
  * Contract note: fidelity is to the SOURCE BYTES, which is STRONGER than
  * the typed path — the typed plan is bounded by the `--infer-rows` sample
  * (a type drifting past the sample nulls there but survives here), and a
  * cross-file scalar conflict that the typed path would reject without
  * `--stringify-conflicts` simply passes through (JSON needs no widening:
  * readers bind per line). `--verify` for this route therefore compares
  * against a full-inference read of the inputs, not the sampled typed plan
  * (Maw.verifyOutput).
  *
  * Commit protocol mirrors CsvByteConcat: every task writes an
  * ATTEMPT-UNIQUE file in the temp dir, the driver promotes exactly the
  * attempts it collected (never a final path from a task) — chained
  * concats of a previous run's rolled output can't truncate their own
  * inputs, and a zombie duplicate attempt can't interleave with the
  * winner's stream.
  */
object JsonByteConcat {

  private val Lf = '\n'.toByte

  /** Static eligibility: any reshaping option forces the typed path. */
  def eligible(cfg: Concat.Config, sink: Sink.Config): Boolean =
    cfg.include.isEmpty && cfg.exclude.isEmpty && cfg.renames.isEmpty &&
      !cfg.skipCorrupt && // a byte copy would propagate corrupt blocks verbatim
      sink.format == Jsonl &&
      sink.rollByRows.isEmpty && sink.rollByBytes.isEmpty &&
      // layout options re-shape rows/files — typed path only
      sink.partitionBy.isEmpty && sink.clusterBy.isEmpty && sink.zorderBy.isEmpty

  /** Run the byte path if eligible and every input is JSONL. Returns write
    * metrics like [[Sink.write]]; None = caller falls back to the typed
    * pipeline.
    */
  def tryRun(spark: SparkSession, files: Seq[InputFile], cfg: Concat.Config,
      sink: Sink.Config): Option[Map[String, Any]] = {
    if (!eligible(cfg, sink) || files.isEmpty || files.exists(_.format != Jsonl) ||
        files.exists(f => graft.sources.Discovery.isGzip(f.path))) // see CsvByteConcat
      return None
    val hconf = spark.sparkContext.hadoopConfiguration
    val tmpDir = sink.path + ".bytes-out"
    val fs0 = new Path(tmpDir).getFileSystem(hconf)
    fs0.delete(new Path(tmpDir), true)
    fs0.mkdirs(new Path(tmpDir))
    val singleFile = sink.singleFile
    val bufBytes = sink.writerBufferBytes
    val paths = files.map(_.path).zipWithIndex
    val hconfBc = spark.sparkContext.broadcast(HConf.snapshot(hconf))

    val results = spark.sparkContext
      .parallelize(paths, paths.size)
      .map { case (path, idx) =>
        val t0 = System.nanoTime()
        val conf = HConf.restore(hconfBc.value)
        val inPath = new Path(path)
        val ifs = inPath.getFileSystem(conf)
        val inBytes = ifs.getFileStatus(inPath).getLen
        val attemptName =
          f"part-$idx%05d-a${org.apache.spark.TaskContext.get.taskAttemptId}%d"
        val outPath = new Path(tmpDir, attemptName)
        val ofs = outPath.getFileSystem(conf)
        val out = new BufferedOutputStream(ofs.create(outPath, true), bufBytes)
        val rows = try {
          val in = new BufferedInputStream(ifs.open(inPath), 1 << 20)
          try copyCountingLines(in, out) finally in.close()
        } finally out.close()
        (idx, attemptName, rows, inBytes, (System.nanoTime() - t0) / 1e9)
      }
      .collect()

    val total = results.map(_._3).sum
    val bytesRead = results.map(_._4).sum
    val bytesWritten = BytePromote.promote(hconf, sink.path, ".jsonl", tmpDir,
      results.toIndexedSeq, singleFile, bufBytes, header = None)
    Some(Map("rows_written" -> total, "bytes_read" -> bytesRead,
      "bytes_written" -> bytesWritten,
      "files" -> BytePromote.perFileMetrics(results.toIndexedSeq, i => files(i).path)))
  }

  /** Stream `in` to `out`, counting non-empty lines, normalizing the file's
    * FINAL newline (a source without one would otherwise splice its last
    * record onto the next file's first line).
    */
  private def copyCountingLines(in: InputStream, out: OutputStream): Long = {
    val buf = new Array[Byte](1 << 20)
    var rows = 0L
    var last: Byte = Lf        // empty file contributes nothing
    var lineHasBytes = false   // non-newline bytes seen since last LF
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) {
        var i = 0
        while (i < n) {
          val b = buf(i)
          if (b == Lf) { if (lineHasBytes) rows += 1; lineHasBytes = false }
          else if (b != '\r'.toByte) lineHasBytes = true
          i += 1
        }
        out.write(buf, 0, n)
        last = buf(n - 1)
      }
      n = in.read(buf)
    }
    if (lineHasBytes) rows += 1
    if (last != Lf) out.write(Lf.toInt)
    rows
  }

}

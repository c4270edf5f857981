package graft.streaming

import graft.operators.Concat
import graft.schema.SchemaUnifier
import graft.sources.{CsvSource, Discovery}
import graft.sources.Discovery.{Csv, Format, Parquet}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming door into the same normalize/align/union core.
  *
  * Replaces the reference's hand-rolled resumable state
  * (`/root/reference/src/state.rs:10-169` — JSON ledger of processed files /
  * offsets, never actually wired into its pipeline) with Spark checkpointing:
  * the file-source + `checkpointLocation` gives exactly-once *file-level*
  * resume natively, which is precisely the ledger's intent
  * (`state.rs:89-102`). `Trigger.AvailableNow` processes everything present
  * and stops, so repeated CLI invocations resume where the last one ended —
  * the `--resume` contract (`cli.rs:109-120`).
  */
object StreamingConcat {

  /** Build ONE streaming source per INPUT ARGUMENT (directory / glob /
    * file), aligned and unioned like the batch path.
    *
    * Why per-argument and not per-discovered-file: Spark checkpoints pin the
    * NUMBER of sources in a query — per-file sources would break resume the
    * moment a new file appears. A directory/glob source keeps the source
    * count stable while its file index picks up late-arriving files, which
    * is exactly the reference ledger's intent (state.rs:89-102).
    *
    * The per-source schema is fixed up-front from a batch pass over the data
    * present at start (streams require a declared schema; inference happens
    * once, matching `--infer-rows` intent, cli.rs:66-68).
    */
  def planStream(spark: SparkSession, cfg: Concat.Config): DataFrame = {
    val perInput = cfg.inputs.map { input =>
      val files = Discovery.discover(Seq(input))
      require(files.nonEmpty, s"no inputs found in $input")
      val formats = files.map(_.format).distinct
      require(formats.size == 1,
        s"streaming input $input mixes formats $formats; pass separate inputs per format")
      // batch pass over the files present now: per-file schemas, unified
      val batchSchema = SchemaUnifier.unify(
        files.map(f => Concat.readOne(spark, f, cfg.csv).schema), cfg.stringifyConflicts)
      (input, formats.head, batchSchema.schema)
    }
    val unified = SchemaUnifier.unify(
      perInput.map(_._3), cfg.stringifyConflicts, cfg.renames, cfg.include, cfg.exclude)
    val streams = perInput.map { case (input, format, schema) =>
      val f = new java.io.File(input)
      // dirs and globs stream natively; a literal file streams via its
      // parent dir + a glob filter on the file name
      val (path, globFilter) =
        if (f.isFile) (Option(f.getParent).getOrElse("."), Some(f.getName))
        else (input, None)
      val src = format match {
        case Parquet =>
          val r = spark.readStream.schema(schema)
          globFilter.fold(r)(g => r.option("pathGlobFilter", g)).parquet(path)
        case Csv =>
          val r0 = spark.readStream
            .schema(schema)
            .option("header", cfg.csv.headers.toString)
            .option("delimiter", cfg.csv.delimiter)
            .option("quote", cfg.csv.quote)
            .option("encoding", cfg.csv.encoding)
            .option("mode", "PERMISSIVE") // parse failure -> null (coercion.rs:117-154)
          val raw = globFilter.fold(r0)(g => r0.option("pathGlobFilter", g)).csv(path)
          // NA list -> null on string columns (numeric NA already nulled by parse)
          raw.select(raw.schema.fields.map { fld =>
            if (fld.dataType == StringType)
              when(col(fld.name).isin(cfg.csv.naValues: _*), lit(null))
                .otherwise(col(fld.name)).as(fld.name)
            else col(fld.name)
          }.toIndexedSeq: _*)
      }
      SchemaUnifier.align(src, unified)
    }
    streams.reduce(_ unionByName _)
  }

  /** Run to completion over currently-available input, writing rolled output
    * files + checkpoint; returns after the stream drains. Resumable across
    * invocations via the checkpoint.
    */
  def run(spark: SparkSession, cfg: Concat.Config, outPath: String, fmt: Format,
      checkpoint: String): Unit = {
    val df = planStream(spark, cfg)
    val writer = df.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
    val q = fmt match {
      case Csv     => writer.format("csv").option("header", "true").start(outPath)
      case Parquet => writer.format("parquet").start(outPath)
    }
    q.awaitTermination()
  }

  /** Progress listener — the Spark-native replacement for the reference's
    * progress bars / MB/s / ETA tracker (`progress.rs:6-197`).
    */
  final class ProgressListener(quiet: Boolean = false) extends StreamingQueryListener {
    @volatile var rowsProcessed: Long = 0L
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      if (!quiet) println(s"[graft] stream started: ${e.id}")
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      rowsProcessed += e.progress.numInputRows
      if (!quiet)
        println(f"[graft] batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          f"total=$rowsProcessed ${e.progress.processedRowsPerSecond}%.0f rows/s")
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      if (!quiet) println(s"[graft] stream terminated: ${e.id}")
  }
}

package graft.operators

import graft.schema.SchemaUnifier
import graft.sources.{CsvSource, Discovery}
import graft.sources.Discovery.{Csv, Format, InputFile, Parquet}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's whole dataflow as ONE lazy Catalyst plan:
  *
  *   discover -> (per file) scan -> unify schema -> align/cast -> UNION ALL
  *
  * (`/root/reference/src/pipeline.rs:31-100`). The reference hand-builds a
  * reader-thread/channel/writer-thread graph (pipeline.rs:83,102-193); on
  * Spark that collapses into a single narrow plan — file-parallelism becomes
  * partition-parallelism, back-pressure becomes task scheduling, and the plan
  * stays SHUFFLE-FREE, so it scales linearly across executors at 100 TB.
  */
object Concat {

  final case class Config(
      inputs: Seq[String],
      csv: CsvSource.CsvOptions = CsvSource.CsvOptions(),
      stringifyConflicts: Boolean = false,
      renames: Map[String, String] = Map.empty,
      include: Option[Seq[String]] = None,
      exclude: Seq[String] = Nil)

  def readOne(spark: SparkSession, f: InputFile, csv: CsvSource.CsvOptions): DataFrame =
    f.format match {
      case Csv     => CsvSource.read(spark, f.path, csv)
      case Parquet => spark.read.parquet(f.path)
    }

  /** Discover + build the unified concat plan. Lazy — nothing executes. */
  def plan(spark: SparkSession, cfg: Config): (Seq[InputFile], DataFrame) = {
    val files = Discovery.discover(cfg.inputs)
    require(files.nonEmpty, s"no inputs found in ${cfg.inputs.mkString(", ")}")
    // Group contiguous same-format runs? Not needed: same-format files with
    // identical schemas could share one multi-path scan, but per-file reads
    // keep per-file schema alignment exact; Spark still schedules all file
    // splits in parallel within the union.
    val dfs = files.map(readOne(spark, _, cfg.csv))
    val unified = SchemaUnifier.unify(
      dfs.map(_.schema), cfg.stringifyConflicts, cfg.renames, cfg.include, cfg.exclude)
    val out = dfs.map(SchemaUnifier.align(_, unified)).reduce(_ unionByName _)
    (files, out)
  }

  def run(spark: SparkSession, cfg: Config): DataFrame = plan(spark, cfg)._2
}

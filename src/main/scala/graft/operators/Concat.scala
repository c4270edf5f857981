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

  /** Discover + build the unified concat plan. The per-file planning work
    * (CSV header read + bounded inference sample = 1-2 small Spark jobs per
    * file) runs CONCURRENTLY across files — with many inputs the planning
    * wall-time stays ~one file's latency instead of N× (the reference gets
    * the same effect from its per-file reader threads, pipeline.rs:102-154).
    * The returned plan itself is lazy — nothing big executes here.
    */
  def plan(spark: SparkSession, cfg: Config): (Seq[InputFile], DataFrame) = {
    val files = Discovery.discover(cfg.inputs)
    require(files.nonEmpty, s"no inputs found in ${cfg.inputs.mkString(", ")}")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dfs = Await.result(
      Future.sequence(files.map(f => Future(readOne(spark, f, cfg.csv)))), Duration.Inf)
    val unified = SchemaUnifier.unify(
      dfs.map(_.schema), cfg.stringifyConflicts, cfg.renames, cfg.include, cfg.exclude)
    val out = dfs.map(SchemaUnifier.align(_, unified)).reduce(_ unionByName _)
    (files, out)
  }

  def run(spark: SparkSession, cfg: Config): DataFrame = plan(spark, cfg)._2
}

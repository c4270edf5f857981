package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{ParityQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: p = reference-parity surface (SURVEY §2.1), q = relational
  * extension (§2.2), t/d/s/m/st = LLM-pipeline extensions (§2.3: text,
  * dedup, similarity, multimodal, streaming). Every query with an
  * `oracleSql` entry is hash-checked against DuckDB by the driver; the rest
  * (engine-specific signatures / stubs) get the rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ RelationalQueries.oracleSql ++ PipelineQueries.oracleSql
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV reading with the reference's option surface
  * (`/root/reference/src/csv_in.rs:23-43`, `cli.rs:33-68`):
  *
  *   - delimiter / quote
  *   - headers on/off; when off, synthetic names `col_1..col_N` (csv_in.rs:73-78)
  *   - encoding utf8 / latin1 (csv_in.rs:80-84)
  *   - NA value LIST -> null (defaults `NA,null,\N`, cli.rs:41-43) — Spark takes
  *     ONE `nullValue`, so the list is normalized post-read with `when(isin)`
  *   - BOM stripping (csv_in.rs:158-162) — Spark's UnivocityParser handles BOM
  *   - type inference from a bounded sample (`--infer-rows`, default 1000,
  *     cli.rs:66-68). The reference's shipped reader re-infers per 64k batch
  *     (csv_in.rs:95-113) — a type-drift bug; per SURVEY §7 we infer ONCE up
  *     front with precedence i64 -> f64 -> bool -> string (csv_in.rs:171-232).
  */
object CsvSource {

  final case class CsvOptions(
      delimiter: String = ",",
      quote: String = "\"",
      headers: Boolean = true,
      encoding: String = "UTF-8",
      naValues: Seq[String] = Seq("NA", "null", "\\N"),
      inferRows: Int = 1000,
      inferTypes: Boolean = true)

  def read(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions()): DataFrame = {
    def reader = spark.read
      .option("header", opts.headers.toString)
      .option("delimiter", opts.delimiter)
      .option("quote", opts.quote)
      .option("encoding", opts.encoding)

    // pass 1 (cheap, bounded): raw strings over the inference sample only
    val raw = reader.csv(path)
    val names =
      if (opts.headers) raw.columns.toSeq
      else raw.columns.indices.map(i => s"col_${i + 1}") // csv_in.rs:73-78
    val named = if (opts.headers) raw else raw.toDF(names: _*)

    val naClear: DataFrame => DataFrame = df => df.select(df.schema.fields.map { f =>
      // NA list -> null (csv_in.rs:129-131); non-string cols already nulled by parse
      if (f.dataType == StringType)
        when(col(f.name).isin(opts.naValues: _*), lit(null)).otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

    if (!opts.inferTypes) naClear(named)
    else {
      val inferred = inferTypes(naClear(named), opts.inferRows)
      // pass 2 (full scan): re-read with the inferred schema so the CSV
      // parser produces typed columns natively (vectorized, single pass —
      // no parse-to-string-then-cast double work); PERMISSIVE => parse
      // failure -> null, same as the reference's `.parse().ok()`.
      // NullType isn't a valid parser type: read those as string, then
      // project them to true null columns below.
      val schema = StructType(names.map(n => StructField(n,
        if (inferred(n) == NullType) StringType else inferred(n), nullable = true)))
      val typed = reader
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("nullValue", opts.naValues.headOption.getOrElse(""))
        .csv(path)
      val withNulls = typed.select(names.map { n =>
        if (inferred(n) == NullType) lit(null).as(n) else col(n)
      }.toIndexedSeq: _*)
      naClear(withNulls)
    }
  }

  /** Sample-based per-column inference with the reference's exact precedence
    * (csv_in.rs:171-232): try i64, then f64, then bool; any non-parsing value
    * makes the column a string (csv_in.rs:201); floats dominate ints
    * (csv_in.rs:207-213). Runs on a bounded `limit(inferRows)` sample — one
    * small job, independent of total input size, so it holds at 100 TB.
    */
  def inferTypes(stringDf: DataFrame, inferRows: Int): Map[String, DataType] = {
    val cols = stringDf.columns
    if (cols.isEmpty) return Map.empty
    val sample = stringDf.limit(inferRows)
    // One aggregate pass over the sample: for each column count values that
    // fail each parse. try_cast yields null on parse failure (ANSI-safe).
    val aggs = cols.flatMap { c =>
      val v = col(c)
      val present = v.isNotNull
      Seq(
        sum(when(present && v.try_cast(LongType).isNull, 1).otherwise(0)).as(s"${c}__badLong"),
        sum(when(present && v.try_cast(DoubleType).isNull, 1).otherwise(0)).as(s"${c}__badDouble"),
        // reference bool = literal "true"/"false" only (csv_in.rs:192-197)
        sum(when(present && !v.isin("true", "false"), 1).otherwise(0)).as(s"${c}__badBool"),
        sum(when(present, 1).otherwise(0)).as(s"${c}__n"))
    }
    val row = sample.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val badLong = Option(row.get(i * 4)).fold(0L)(_.asInstanceOf[Long])
      val badDouble = Option(row.get(i * 4 + 1)).fold(0L)(_.asInstanceOf[Long])
      val badBool = Option(row.get(i * 4 + 2)).fold(0L)(_.asInstanceOf[Long])
      val n = Option(row.get(i * 4 + 3)).fold(0L)(_.asInstanceOf[Long])
      val t: DataType =
        // all-null (e.g. a header-only part file, or an all-NA column):
        // transient NullType, widened away by the lattice (schema.rs:137-142)
        if (n == 0L) NullType
        else if (badLong == 0L) LongType
        else if (badDouble == 0L) DoubleType
        else if (badBool == 0L) BooleanType
        else StringType
      c -> t
    }.toMap
  }
}

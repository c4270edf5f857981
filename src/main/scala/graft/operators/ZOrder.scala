package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — MULTI-column data skipping, the layout
  * primitive single-key range clustering (`Sink.Config.clusterBy`) cannot
  * give: sorting by `(a, b)` makes per-file `a` ranges narrow but leaves
  * every file spanning `b`'s full domain. Interleaving the bits of each
  * column's quantile-bucket id instead gives every file a small HYPERCUBE
  * of the combined domain, so min/max footer stats prune scans filtering
  * on ANY clustered column (~sqrt coverage per dimension for two columns).
  *
  * Scale design:
  *   - Per-column quantile boundaries come from ONE bounded
  *     `approxQuantile` pass (driver holds B doubles per column, data
  *     never moves); skewed distributions get equal-POPULATION buckets,
  *     which uniform `width_bucket` binning would not.
  *   - Bucketing + bit interleave are pure built-in expressions (a fold of
  *     shift/or over the bucket bits), so the whole z-value stays inside
  *     whole-stage codegen — no UDF, no custom expression needed.
  *   - The final layout is `repartitionByRange(zvalue)` +
  *     `sortWithinPartitions(zvalue)`: contiguous z-ranges per file AND
  *     per row group.
  *
  * String/binary columns are bucketed by `xxhash64` (documented caveat:
  * hash buckets skip POINT predicates only — range predicates on a hashed
  * dimension see shuffled order and prune nothing).
  */
object ZOrder {

  /** Bits per dimension (256 equal-population buckets): granularity is
    * bounded by the file count a partition produces — hundreds of files
    * per directory is the practical regime, so 2^8 cells per dimension
    * (2^16 combined for two columns) over-resolves it already while
    * keeping the interleave fold short.
    */
  val BitsPerDim = 8
  val Buckets: Int = 1 << BitsPerDim

  /** The z-value column for `cols` over `df`'s own distribution. Runs the
    * bounded boundary pass now; the returned Column is then pure codegen.
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size * BitsPerDim <= 63,
      s"zorder supports up to ${63 / BitsPerDim} columns")
    // ONE multi-column approxQuantile job computes every numeric dimension's
    // boundaries together (per-column calls would re-scan the input once per
    // dimension); nulls are ignored per column by the sketch
    val numeric = cols.map(c => c -> numericExpr(df, c))
    val numericOnly = numeric.collect { case (c, Some(v)) => (c, v) }
    val boundsByCol: Map[String, Array[Double]] =
      if (numericOnly.isEmpty) Map.empty
      else {
        val names = numericOnly.indices.map(i => s"__z$i")
        val proj = df.select(numericOnly.zip(names).map {
          case ((_, v), n) => v.as(n) }: _*)
        val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
        val all = proj.stat.approxQuantile(names.toArray, probs, 0.001)
        numericOnly.map(_._1).zip(all).toMap
      }
    val buckets = numeric.map {
      case (c, Some(v)) => quantileBucket(v, boundsByCol(c))
      case (c, None)    =>
        // hash-bucket: uniform by construction, point-skip only
        pmod(xxhash64(col(graft.schema.SchemaUnifier.quoted(c))),
          lit(Buckets.toLong)).cast("long")
    }
    // Morton interleave: output bit (i * nDims + d) = bit i of dimension d.
    // Each dimension's SPREAD (its 8 bucket bits moved to stride-nDims
    // positions) is a pure function of the 256 possible bucket values, so it
    // is one element_at into a 256-entry literal array — the bucket
    // expression (a ~255-term when() fold) is referenced exactly ONCE per
    // dimension. The earlier shiftleft-per-bit fold referenced it 8 times,
    // and after projection collapse that inlined ~4000 comparisons per row
    // and pushed the generated code past JIT limits (~5x wall on the write).
    val nDims = cols.size
    def spread(v: Int, d: Int): Long = {
      var out = 0L; var i = 0
      while (i < BitsPerDim) {
        if (((v >> i) & 1) == 1) out |= 1L << (i * nDims + d)
        i += 1
      }
      out
    }
    val zs = buckets.zipWithIndex.map { case (b, d) =>
      val lut = lit((0 until Buckets).map(v => spread(v, d)).toArray)
      element_at(lut, b.cast("int") + 1)
    }
    // spread LUTs occupy disjoint bit positions, so sum == bitwise-or
    zs.reduce(_ + _).as("zvalue")
  }

  /** Double-comparable rendering of a column, or None for the hash-bucket
    * path (strings/binary). Quoted: a literal dotted column name (JSONL
    * keys like "a.b") must resolve as the column, not a nested field path.
    */
  private def numericExpr(df: DataFrame, c: String): Option[Column] = {
    val dt = df.schema(c).dataType
    val cRef = col(graft.schema.SchemaUnifier.quoted(c))
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => Some(cRef.cast("double"))
      case DateType => Some(cRef.cast("double"))
      case TimestampType | TimestampNTZType =>
        Some(unix_micros(cRef.cast("timestamp")).cast("double"))
      case _ => None
    }
  }

  /** Equal-population bucket id (0..Buckets-1) from precomputed interior
    * boundaries: the count of boundaries <= v, one binary search per row
    * ([[graft.expressions.QuantileBucket]] — nulls/NaNs land in bucket 0,
    * which min/max file stats ignore anyway).
    */
  private def quantileBucket(v: Column, bounds: Array[Double]): Column = {
    // strictly increasing subset (duplicated quantiles on low-cardinality
    // data would make bucket comparisons redundant, not wrong; dropping
    // them keeps the search array minimal)
    val distinct = bounds.foldLeft(Vector.empty[Double])((acc, b) =>
      if (acc.lastOption.exists(_ >= b)) acc else acc :+ b)
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.QuantileBucket(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v), distinct.toArray))
  }

  /** Cluster `df` for writing: z-value computed, range-partitioned and
    * sorted so contiguous z-ranges land in each file and row group. The
    * helper column is dropped after the sort (file stats come from the
    * data columns themselves).
    *
    * `numFiles` must be EXPLICIT (default: the session's shuffle
    * parallelism): an implicit-count range shuffle is fair game for AQE
    * partition coalescing, which on a small input folds the whole layout
    * back into one file. An explicit user repartition count is exempt.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Option[Int] = None): DataFrame = {
    // the helper column is dropped before the write: an input that already
    // carries __zvalue would be silently replaced and then LOST — fail loud
    // instead (same reserved-name discipline as Dedup.bestSurvivors)
    require(!df.columns.contains("__zvalue"),
      "zorder: input already has a __zvalue column (reserved helper name) — rename it first")
    val n = numFiles.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val z = df.withColumn("__zvalue", zvalue(df, cols))
    z.repartitionByRange(n, col("__zvalue"))
      .sortWithinPartitions(col("__zvalue"))
      .drop("__zvalue")
  }
}

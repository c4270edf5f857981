package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the driver-checked query surface.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *   - every query is fully ordered over its output columns, NULLS FIRST on
  *     both engines;
  *   - double aggregations go through exact DECIMAL(18,6) accumulation
  *     (long-backed fast path; see dsum) and
  *     are cast back to double at the end, so the result is independent of
  *     partitioning / addition order on either engine;
  *   - timestamps are emitted as formatted strings (engine-neutral; avoids
  *     tz-awareness mismatches between Spark parquet and DuckDB).
  */
object Q {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events frame's `ts` column to TimestampType, ADAPTIVELY —
    * the fixture's physical type has changed across driver regenerations
    * (timestamp[ns] through round 6, timestamp[us] from round 7) and a
    * hard-coded assumption cost nine queries once:
    *   - LongType (a ns file read under `nanosAsLong`): truncate to micros,
    *     exactly DuckDB's CAST(ts AS TIMESTAMP);
    *   - TimestampNTZType (a us file, `isAdjustedToUTC=false`): reinterpret
    *     in the session timezone — every entry point pins
    *     `spark.sql.session.timeZone=UTC`, so the wall-clock value (and
    *     therefore every window/format/oracle comparison) is unchanged;
    *   - TimestampType: already there.
    * Schema-driven, so it works on batch AND streaming frames.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampType => df
    case _             => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** The events table with `ts` normalized (see [[normalizeTs]]).
    *
    * The conf.set is a DELIBERATE session-level set, not a withConf scope:
    * the returned plan is lazy, and the parquet scan consults the conf
    * again at action time — restoring it after the builder returns would
    * make a later action throw on an old ns-timestamp fixture. On a us
    * fixture the conf is a no-op. Entry points that mix this surface with
    * other reads (Verify/Bench/ScaleSoak) set it globally up front for the
    * same reason.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, dir, "events"))
  }

  /** Exact-accumulation sum of a double expression: order-independent.
    * DECIMAL(18,6) keeps per-row values on the compact long-backed Decimal
    * fast path (precision<=18) — measurably faster than wider decimals.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact average via dsum/count (decimal division rounding differs across
    * engines; double division does not).
    */
  // DECIMAL(38,6), not (18,6): the order-insensitive exact mean must
  // survive outlier magnitudes — a single 1e15-scale embedding component
  // overflowed (18,6) and ANSI mode killed the whole centroid job (found
  // by the round-15 hostile-embeddings probe). Values that fit (18,6)
  // quantize identically at scale 6, so existing oracles are unchanged.
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast("double") / count(lit(1))

  /** Timestamp -> engine-neutral string. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Total order over all output columns, nulls first (DuckDB needs the
    * explicit NULLS FIRST; Spark's asc defaults to nulls-first).
    *
    * The sort exists ONLY so the driver's hash-compare sees a deterministic
    * row order — it is not part of the operator's work. Bench sets
    * `graft.bench.skipOrder` to measure the operators without the
    * determinism sort (a global sort of a full projection would otherwise
    * dominate several benchmarks).
    */
  def ordered(df: DataFrame): DataFrame =
    if (sys.props.get("graft.bench.skipOrder").contains("1")) df
    else df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)

  /** Run `f` with a scoped session-conf value, restoring (or unsetting)
    * the previous value after — queries share one SparkSession, so a bare
    * `conf.set` would leak into every later query.
    */
  def withConf[A](s: SparkSession, key: String, value: String)(f: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try f finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** `ORDER BY <all cols> NULLS FIRST` suffix for DuckDB oracle SQL. */
  def orderSql(cols: String*): String =
    "ORDER BY " + cols.map(c => s"$c NULLS FIRST").mkString(", ")

  /** DuckDB-side mirror of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  def davgSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)"
}

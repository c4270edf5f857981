package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling for shuffles.
  *
  * AQE's skew-join split handles sort-merge joins at runtime; these helpers
  * cover the cases it can't: broadcast-ineligible dimension joins with a few
  * pathological keys, and skewed aggregations. Salting is deterministic
  * (hash-derived, no randomness) so plans stay replayable.
  */
object SkewJoin {

  /** Fact-side salt in [0, salts): hash of the join key plus per-row
    * disambiguator columns, so rows of the SAME hot key still spread over
    * all salts. The disambiguator MUST be derived from row values, never
    * from partition layout (`monotonically_increasing_id`, `rand`,
    * `spark_partition_id`): a task retry after a fetch failure recomputes
    * its input, and a layout-derived salt can then route a row to a
    * different (key, salt) reducer than the one that already consumed it —
    * rows duplicated or lost (SPARK-23207-class hazard). Value-derived
    * hashing is idempotent across recomputations by construction.
    *
    * `tiebreak` picks the disambiguator columns; empty means all columns
    * (safe default — costs CPU proportional to row width, so callers with
    * a natural unique-ish narrow column should pass it). Rows identical in
    * every hashed column share a salt; that is inherent to value-derived
    * salting and only matters if a hot key's rows are full duplicates.
    */
  private def saltCol(df: DataFrame, key: String, salts: Int,
      tiebreak: Seq[String]): Column = {
    val cols =
      if (tiebreak.nonEmpty) (key +: tiebreak).distinct
      else {
        // default disambiguator = every UNIQUELY-NAMED hashable column:
        // xxhash64 rejects MapType outright, and col() on a name that
        // appears twice in the schema fails analysis with an
        // ambiguous-attribute error no matter how the list is deduped — so
        // duplicated names are EXCLUDED from the default set entirely
        // (callers who need those values in the salt must rename or pass
        // `tiebreak`). Rows identical in all selected columns share a salt —
        // inherent to value-derived salting.
        val occurrences = df.schema.fields.groupBy(_.name).view.mapValues(_.length)
        val cols = df.schema.fields.collect {
          case f if occurrences(f.name) == 1 && hashable(f.dataType) => f.name
        }.toSeq
        if (cols.isEmpty) Seq(key) else cols
      }
    pmod(xxhash64(cols.map(col): _*), lit(salts)).cast("int")
  }

  /** Types xxhash64 accepts without legacy confs (no MapType anywhere). */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** Inner equi-join where `fact` is massively skewed on `key`: the fact
    * side gets a deterministic salt in [0, salts), the (small-ish) `dim`
    * side is replicated once per salt, and the join key becomes
    * (key, salt) — a hot key now spreads over `salts` reducers instead of
    * melting one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    // same contract as AsOfJoin's reserved names: a user __salt column
    // would be silently overwritten and dropped from the output
    require(!(fact.columns ++ dim.columns).contains("__salt"),
      "salted join reserves column name __salt")
    val saltedFact = fact.withColumn("__salt", saltCol(fact, key, salts, tiebreak))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, saltedFact(key) === saltedDim(key) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key)).drop(saltedFact("__salt")).drop(saltedDim("__salt"))
  }

  /** Two-phase aggregation for a skewed group-by: partial-aggregate on
    * (key, salt) — spreading a hot key across reducers — then finish on key.
    * Works for any algebraic aggregate expressed as (partial, merge) pairs;
    * the common sum/count/min/max come prebuilt via [[skewedSum]] etc.
    */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
      partial: Seq[Column], merge: Seq[Column],
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains("__salt"),
      "two-phase agg reserves column name __salt")
    val salted = df.withColumn("__salt", saltCol(df, key, salts, tiebreak))
    salted.groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }

  /** Skew-safe sum+count per key (the building block for mean as well). */
  def skewedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame =
    twoPhaseAgg(df, key, salts,
      partial = Seq(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt")),
      merge = Seq(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count")))
}

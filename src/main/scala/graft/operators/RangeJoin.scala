package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval join: match left point events to right intervals
  * (`start <= t <= end`), optionally with equality keys.
  *
  * The naive formulation is a non-equi join — Spark plans it as a
  * broadcast-nested-loop (fine when one side is small) or a cartesian
  * product (catastrophic at scale). [[bucketed]] makes it an EQUI join:
  * both sides are exploded onto fixed time granules, joined on
  * (keys..., granule), then filtered by the exact predicate — candidate
  * pairs are only those sharing a granule, so cost tracks overlap density
  * instead of |left|x|right|. Intervals spanning g granules replicate g
  * times (choose `granule` near the typical interval length).
  */
object RangeJoin {

  /** Exact semantics, naive plan (small right side / reference baseline). */
  def naive(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      t: String, start: String, end: String): DataFrame = {
    val cond = keyCols.map(k => left(k) === right(k))
      .reduceOption(_ && _)
      .map(_ && left(t) >= right(start) && left(t) <= right(end))
      .getOrElse(left(t) >= right(start) && left(t) <= right(end))
    val joined = left.join(right, cond)
    keyCols.foldLeft(joined)((d, k) => d.drop(right(k)))
  }

  /** Granule-bucketed equi-join formulation. `granuleExpr` maps a time
    * column to a long granule id (e.g. `unix_micros(ts) div granuleUs`).
    */
  def bucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      t: String, start: String, end: String, granuleOf: Column => Column): DataFrame = {
    // same contract as AsOfJoin's reserved names: a user column __g would
    // be silently overwritten and then dropped from the output
    require(!(left.columns ++ right.columns).contains("__g"),
      "range join reserves column name __g")
    val l = left.withColumn("__g", granuleOf(col(t)))
    val r = right.withColumn("__g",
      explode(sequence(granuleOf(col(start)), granuleOf(col(end)))))
    val joinKeys = keyCols :+ "__g"
    // a point lives in exactly one granule, so each (event, interval) pair
    // joins at most once even when the interval replicates across granules
    l.join(r, joinKeys, "inner")
      .where(col(t) >= col(start) && col(t) <= col(end))
      .drop("__g")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the single right row
  * with the greatest right timestamp <= the left timestamp, per key.
  *
  * Built by composing built-ins (preference (a) over a custom SparkPlan):
  * tag + union both sides, then one window pass per key ordered by
  * (ts, tag) carrying the last-seen right payload forward
  * (`last(..., ignoreNulls)` over unbounded-preceding). Cost = ONE
  * shuffle+sort on (key, ts) — the same physical work a dedicated
  * sort-merge as-of operator would do, but it inherits AQE, codegen, and
  * spill handling for free. Right rows sort before left rows at equal
  * timestamps, so ties are inclusive (<=), matching ASOF JOIN semantics.
  */
object AsOfJoin {

  /** @param left     probe side; keeps all its rows
    * @param right    reference side; its `payloadCols` are attached
    * @param keyCols  equality keys present in both
    * @param leftTs / rightTs  event-time columns
    * @return left rows + payload columns (null when no right row precedes)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val reserved = Seq("__ts", "__tag", "__p", "__m")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"as-of join reserves column names ${reserved.mkString(", ")}")
    val carryLeft = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTs)
    require(carryLeft.intersect(payloadCols).isEmpty,
      s"payload columns ${carryLeft.intersect(payloadCols).mkString(", ")} collide with " +
        "left's carried columns — rename one side before joining")
    // All payload columns travel as ONE struct so `last(ignoreNulls)` picks
    // the whole matched right row atomically — per-column windows would
    // stitch fields from DIFFERENT right rows whenever a payload value is
    // null, violating single-row-match ASOF semantics.
    val payloadType = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
    // 0 = right (sorts first at equal ts => inclusive match), 1 = left.
    // NULL-ts right rows are dropped up front: `left_ts >= NULL` is never
    // true under ASOF semantics, but asc-nulls-first ordering would sort
    // them BEFORE every real row and make them the match for early left
    // rows. (A NULL-ts left row then correctly gets a null payload — it
    // sorts before all remaining right rows.)
    val taggedRight = right.where(col(rightTs).isNotNull).select(
      (keyCols.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__tag") :+
        struct(payloadCols.map(col): _*).as("__p")) ++
        carryLeft.map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__tag") :+
        lit(null).cast(payloadType).as("__p")) ++
        carryLeft.map(col): _*)
    // deterministic among right rows tied on (key, ts): order by the payload
    // struct as the final tiebreak, so which row `last` sees is a function of
    // the DATA, not of partition/shuffle order (rows tied on ts, tag, AND the
    // whole payload are interchangeable). Skipped for unorderable payload
    // types (maps), which keep the engine-order behavior
    val orderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(payloadType)
    val ordering = Seq(col("__ts").asc, col("__tag").asc) ++
      (if (orderable) Seq(col("__p").asc_nulls_first) else Nil)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__tag")) ++
        carryLeft.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
    carried.where(col("__tag") === 1)
      .drop("__tag")
      .withColumnRenamed("__ts", leftTs)
  }
}

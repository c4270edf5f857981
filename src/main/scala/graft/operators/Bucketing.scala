package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * When two big fact tables are repeatedly joined on the same key, writing
  * both bucketed by that key (same bucket count) lets every subsequent join
  * run with ZERO exchange — each task joins bucket i against bucket i.
  * That's the amortize-one-shuffle-forever play for 100 TB star joins, and
  * it composes with the concat pipeline (bucketed parquet as the sink of an
  * ingest run, joined downstream with no shuffle).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two previously-bucketed tables on their bucket key. When bucket
    * counts match, the physical plan contains no Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}

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

  /** Write `df` as a bucketed (and optionally sorted) managed parquet table.
    *
    * The input is repartitioned BY THE BUCKET KEY into exactly `buckets`
    * partitions first: `repartition(n, col)` and the bucket assignment use
    * the same hash family (murmur3 pmod n), so every write task holds
    * exactly one bucket's rows and emits ONE file per bucket. Without
    * this, file count = input-partitions x buckets — the round-13 x64
    * soak measured the d17 band index at 16,384 files of ~12 KB (1024
    * shuffle partitions x 16 buckets), and the "corpus-sized scan" in the
    * probe was mostly file-open/footer overhead: fixed-batch probe 9.4 s
    * against that tree vs 2.8 s after this change (flat in corpus size —
    * the same probe against a 1x index was 3.4 s), and the x64 index
    * BUILD dropped 88 s -> 17 s (file commits dominated). Write parallelism
    * becomes `buckets`: at larger corpora raise `buckets` (the same knob
    * that scales probe-side pruning), not the file count per bucket.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two previously-bucketed tables on their bucket key. When bucket
    * counts match, the physical plan contains no Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}

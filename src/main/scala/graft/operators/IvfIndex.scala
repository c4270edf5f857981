package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer assigns every vector to its nearest centroid cell; queries
  * probe only their `nprobe` nearest cells, turning all-pairs search into
  * cell-local joins (the FAISS IVF-Flat shape, re-expressed relationally).
  *
  * Scale design: training runs on a BOUNDED deterministic sample (first
  * `sampleSize` ids — seedless, replayable) with a fixed number of Lloyd
  * iterations; centroids are tiny and live on the driver / in the plan as
  * literals; assignment and search are narrow passes + one join keyed on
  * cell id. Everything is deterministic run-to-run.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Nearest-centroid id via lexicographic `least(struct(dist, id))`. */
  private def nearestCell(v: Column, m: Model): Column =
    least(m.centroids.zipWithIndex.map { case (c, i) =>
      struct(VF.l2Distance(v, typedlit(c.toSeq)).as("d"), lit(i).as("cell"))
    }: _*).getField("cell")

  /** `nprobe` nearest cells as an array (sorted by distance). */
  private def nearestCells(v: Column, m: Model, nprobe: Int): Column = {
    val ranked = array_sort(array(m.centroids.zipWithIndex.map { case (c, i) =>
      struct(VF.l2Distance(v, typedlit(c.toSeq)).as("d"), lit(i).as("cell"))
    }: _*))
    slice(transform(ranked, s => s.getField("cell")), 1, nprobe)
  }

  /** Train a coarse quantizer on a deterministic sample with `iters` Lloyd
    * steps. Empty cells keep their previous centroid.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      sampleSize: Int = 2048, iters: Int = 2): Model = {
    val sample = emb.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol).cast("array<double>").as("v"))
    val seed = sample.limit(k).collect().map(_.getSeq[Double](0).toArray)
    require(seed.nonEmpty, "empty training set")
    var model = Model(seed)
    for (_ <- 1 to iters) {
      val assigned = sample.withColumn("cell", nearestCell(col("v"), model))
      // element-wise mean per cell: explode dims, aggregate, rebuild
      val means = assigned
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      val next = model.centroids.zipWithIndex.map { case (old, cell) =>
        byCell.get(cell).fold(old) { rows =>
          val c = old.clone()
          rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
          c
        }
      }
      model = Model(next)
    }
    model
  }

  /** Assign every vector its IVF cell (narrow, no shuffle). */
  def assign(emb: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame =
    emb.withColumn("ivf_cell", nearestCell(col(vecCol), m))

  /** Top-k cosine neighbors per query, searching only each query's
    * `nprobe` nearest cells. Ties broken by neighbor id.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      m: Model, k: Int = 10, nprobe: Int = 3): DataFrame = {
    val c = assign(corpus, idCol, vecCol, m)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("ivf_cell"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(nearestCells(col(vecCol), m, nprobe)).as("ivf_cell"))
    val scored = c.join(q, Seq("ivf_cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), VF.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}

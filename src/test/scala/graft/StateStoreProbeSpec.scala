package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the state-data-source contract st14 depends on: the store exposes
  * (key struct, value struct, partition_id), the value struct's field
  * names are the CANONICAL aggregate names (`count`, `sum`) regardless of
  * the query's aliases, and the state after a run-to-completion equals the
  * batch aggregate over everything consumed. If a Spark upgrade changes
  * the naming or nesting, this fails before the driver gate does.
  */
class StateStoreProbeSpec extends SparkSpec {
  import spark.implicits._

  test("statestore source: schema contract + state == the semantic aggregate") {
    val dir = tmpDir("ssprobe")
    val srcDir = dir.resolve("src")
    java.nio.file.Files.createDirectories(srcDir)
    val ckpt = dir.resolve("ckpt").toString
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("k", "v")
      .write.parquet(srcDir.resolve("f1").toString)
    val stream = spark.readStream.schema(
      StructType(Seq(StructField("k", StringType), StructField("v", LongType))))
      .parquet(srcDir.toString + "/*")
    // aliases on purpose: the state schema must IGNORE them (canonical names)
    val q = stream.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => { b.count(); () })
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val st = spark.read.format("statestore").load(ckpt)
    val value = st.schema("value").dataType.asInstanceOf[StructType]
    assert(value.fieldNames.toSeq == Seq("count", "sum"), value.fieldNames.toSeq)
    assert(st.schema("key").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("k"))
    val got = st.select(col("key.k"), col("value.count"), col("value.sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 4L), ("b", 1L, 2L)), got)
  }
}

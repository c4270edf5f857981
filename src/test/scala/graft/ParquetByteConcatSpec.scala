package graft

import graft.operators.{Concat, ParquetByteConcat}
import graft.sinks.Sink
import graft.sources.Discovery
import org.apache.spark.sql.functions._

/** The row-group-copy Parquet->Parquet fast path must be value-identical to
  * the typed read->unify->write pipeline, and decline to the typed path
  * whenever unification would actually do work.
  */
class ParquetByteConcatSpec extends SparkSpec {

  private def mawParquet(dir: java.nio.file.Path, name: String,
      table: String = "nation"): String = {
    // "maw-shape": unified (sorted) column order, like anything maw wrote
    val src = sf(table)
    val out = dir.resolve(name).toString
    src.select(src.columns.sorted.map(col).toIndexedSeq: _*)
      .coalesce(1).write.parquet(out)
    out
  }

  private def convert(inputs: Seq[String], out: String, single: Boolean = true) =
    Concat.convert(spark, Concat.Config(inputs),
      Sink.Config(out, Discovery.Parquet, singleFile = single))

  test("single-file concat: row counts, values, and schema match the typed path") {
    val d = tmpDir("pbc1")
    val in1 = mawParquet(d, "a.parquet")
    val in2 = mawParquet(d, "b.parquet")
    val out = d.resolve("out.parquet").toString
    val m = convert(Seq(in1, in2), out)
    assert(m("rows_written") == 50L)
    val got = spark.read.parquet(out)
    val want = spark.read.parquet(in1).unionAll(spark.read.parquet(in2))
    assert(got.schema == want.schema)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
    // and it really was a row-group copy, not a rewrite
    val meta = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(out),
        spark.sparkContext.hadoopConfiguration))
    try assert(meta.getFooter.getFileMetaData.getKeyValueMetaData
      .get("graft.concat") == "row-group-copy")
    finally meta.close()
  }

  test("multi-file output: one part per input at deterministic names") {
    val d = tmpDir("pbc2")
    val in1 = mawParquet(d, "a.parquet")
    val in2 = mawParquet(d, "b.parquet")
    val out = d.resolve("out.parquet").toString
    val m = convert(Seq(in1, in2), out, single = false)
    assert(m("rows_written") == 50L)
    assert(spark.read.parquet(d.resolve("out-0000.parquet").toString).count() == 25)
    assert(spark.read.parquet(d.resolve("out-0001.parquet").toString).count() == 25)
  }

  test("declines on schema mismatch, unsorted columns, or projection flags") {
    val d = tmpDir("pbc3")
    val nation = mawParquet(d, "n.parquet")
    val region = mawParquet(d, "r.parquet", table = "region")
    val sinkCfg = Sink.Config(d.resolve("never.parquet").toString, Discovery.Parquet)
    def files(ins: String*) = Discovery.discover(ins.toSeq)
    // different schemas -> decline (typed path must widen/null-inject)
    assert(ParquetByteConcat.tryRun(spark, files(nation, region),
      Concat.Config(Seq(nation, region)), sinkCfg).isEmpty)
    // source column order not unified -> decline (typed path reorders)
    val unsorted = d.resolve("unsorted.parquet").toString
    sf("nation").coalesce(1).write.parquet(unsorted) // n_nationkey first, not alphabetical
    assert(ParquetByteConcat.tryRun(spark, files(unsorted),
      Concat.Config(Seq(unsorted)), sinkCfg).isEmpty)
    // projection requested -> decline
    assert(ParquetByteConcat.tryRun(spark, files(nation),
      Concat.Config(Seq(nation), include = Some(Seq("n_name"))), sinkCfg).isEmpty)
    // but the full convert still works via the typed path
    val out = d.resolve("out.parquet").toString
    val m = Concat.convert(spark, Concat.Config(Seq(nation, region)),
      Sink.Config(out, Discovery.Parquet))
    assert(m("rows_written") == 30L)
  }

  test("property: randomized typed tables roundtrip the row-group copy value-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 5) {
      val d = tmpDir(s"pbcProp$round")
      // mixed types incl nulls, decimals-as-doubles, strings with quotes
      val rows = (1 to 1 + rnd.nextInt(50)).map { i =>
        (i.toLong,
          if (rnd.nextBoolean()) Some(rnd.nextDouble() * 1000) else None,
          if (rnd.nextInt(5) == 0) null
          else s"""v${rnd.nextInt(100)} "q" ${"x" * rnd.nextInt(8)}""",
          rnd.nextBoolean())
      }
      val df = rows.toDF("a_id", "b_val", "c_txt", "d_flag")
      val parts = (0 until 2).map { p =>
        val out = d.resolve(s"in$p.parquet").toString
        df.where(pmod(col("a_id"), lit(2)) === p).coalesce(1).write.parquet(out)
        out
      }
      val out = d.resolve("out.parquet").toString
      val m = convert(parts, out)
      // fast path must have engaged (footer marker), values exactly the union
      val meta = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(out),
          spark.sparkContext.hadoopConfiguration))
      try assert(meta.getFooter.getFileMetaData.getKeyValueMetaData
        .get("graft.concat") == "row-group-copy")
      finally meta.close()
      val got = spark.read.parquet(out).collect().map(_.toSeq).toSeq
        .sortBy(_.head.asInstanceOf[Long])
      val want = df.collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
      assert(got == want, s"round $round diverged")
      assert(m("rows_written") == want.size.toLong)
    }
  }

  test("ns-timestamp parquet passes through bit-exact (no decode happens)") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val d = tmpDir("pbc4")
    // nanosecond timestamps are exactly what Spark CANNOT decode without a
    // legacy flag — write one with parquet-mr directly, then prove the byte
    // path concatenates it without ever materializing rows
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int64 id; required int64 ts (TIMESTAMP(NANOS,true)); }")
    def writeNs(name: String): String = {
      val p = d.resolve(name).toString
      val w = ExampleParquetWriter.builder(
          org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), spark.sparkContext.hadoopConfiguration))
        .withType(schema).build()
      val gf = new SimpleGroupFactory(schema)
      try (1 to 3).foreach { i =>
        w.write(gf.newGroup().append("id", i.toLong).append("ts", i * 1234567891011L))
      } finally w.close()
      p
    }
    val out = d.resolve("out.parquet").toString
    val m = convert(Seq(writeNs("ns1.parquet"), writeNs("ns2.parquet")), out)
    assert(m("rows_written") == 6L)
    // SparkSpec sets the legacy nanos flag, so read back as raw longs: the
    // nanosecond values must be untouched
    val got = spark.read.parquet(out).orderBy("id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (1 to 3).flatMap(i =>
      Seq.fill(2)((i.toLong, i * 1234567891011L))).sortBy(identity))
  }

  test("footer carries the source key-value metadata plus the copy marker") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val d = tmpDir("pbc5")
    val in1 = mawParquet(d, "a.parquet")
    val out = d.resolve("out.parquet").toString
    convert(Seq(in1), out)
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(out), spark.sparkContext.hadoopConfiguration))
    val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData finally r.close()
    // Spark wrote the input, so its row metadata must survive the copy —
    // downstream Spark readers then recover exact Catalyst types instead of
    // falling back to parquet-schema inference
    assert(kv.containsKey("org.apache.spark.sql.parquet.row.metadata"))
    assert(kv.get("graft.concat") == "row-group-copy")
  }

  test("re-run over fewer inputs clears stale higher-numbered parts") {
    val d = tmpDir("pbc6")
    val ins = (1 to 3).map(i => mawParquet(d, s"f$i.parquet"))
    val out = d.resolve("out.parquet").toString
    convert(ins, out, single = false)
    assert(java.nio.file.Files.exists(d.resolve("out-0002.parquet")))
    convert(ins.take(2), out, single = false)
    assert(!java.nio.file.Files.exists(d.resolve("out-0002.parquet")),
      "stale part from the 3-input run must be removed")
    assert(Sink.readBack(spark, out, Discovery.Parquet).count() == sf("nation").count() * 2)
  }
}

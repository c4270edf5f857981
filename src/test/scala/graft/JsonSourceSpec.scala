package graft

import graft.operators.Concat
import graft.sinks.Sink
import graft.sources.{Discovery, JsonSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL source/sink: driver-side sampled inference (same lattice as CSV),
  * typed multi-path scan, nested-as-raw-text passthrough, concat unification
  * with other formats, sink round trip, and the CLI drive.
  */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  test("inference: scalar lattice, null-only keys, nested as raw JSON text") {
    val dir = tmpDir("jsonl-infer")
    val f = writeFile(dir, "a.jsonl",
      """{"i": 1, "f": 1.5, "b": true, "s": "x", "n": null, "obj": {"k": [1, 2]}, "arr": [1, "two"]}
        |{"i": 9223372036854775807, "f": 2, "b": false, "s": "y", "n": null}
        |{"i": 3, "f": -0.25, "s": "z", "extra": "late key"}
        |""".stripMargin)
    val schema = JsonSource.resolveSchema(spark, f, JsonSource.JsonOptions())
    // first-seen key order, i64/f64/bool/string lattice, null-only -> NullType
    assert(schema.fieldNames.toSeq == Seq("i", "f", "b", "s", "n", "obj", "arr", "extra"))
    assert(schema("i").dataType == LongType)
    assert(schema("f").dataType == DoubleType) // 2 is integral but widened by 1.5
    assert(schema("b").dataType == BooleanType)
    assert(schema("s").dataType == StringType)
    assert(schema("n").dataType == NullType)
    assert(schema("obj").dataType == StringType)
    assert(schema("arr").dataType == StringType)
    val rows = JsonSource.read(spark, f).orderBy("i").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 1.5 && rows(0).getBoolean(2))
    // nested values pass through as their raw JSON text — byte-faithful,
    // original whitespace included (no re-serialization)
    assert(rows(0).getString(5) == """{"k": [1, 2]}""")
    assert(rows(0).getString(6) == """[1, "two"]""")
    // absent keys -> null; null-only key is a true null column
    // (sorted by i: row 1 is i=3 with the late key, row 2 is i64-max)
    assert(rows(0).isNullAt(7) && rows(1).getString(7) == "late key")
    assert(rows.forall(_.isNullAt(4)))
    assert(rows(2).getLong(0) == Long.MaxValue)
  }

  test("inference: conflicting scalar types stringify; corrupt line nulls out") {
    val dir = tmpDir("jsonl-conflict")
    val f = writeFile(dir, "a.jsonl",
      """{"v": 1}
        |{"v": "one"}
        |not json at all
        |{"v": 2}
        |""".stripMargin)
    val schema = JsonSource.resolveSchema(spark, f, JsonSource.JsonOptions())
    assert(schema("v").dataType == StringType)
    val vs = JsonSource.read(spark, f).select("v").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSet
    // numbers read into the stringified column as their literal text;
    // the corrupt line becomes an all-null row (PERMISSIVE)
    assert(vs == Set("1", "one", "2", null))
  }

  test("concat unifies jsonl + csv through the same widening lattice") {
    val dir = tmpDir("jsonl-mixed")
    val j = writeFile(dir, "a.jsonl", "{\"a\": 1, \"b\": \"x\"}\n{\"a\": 2, \"b\": \"y\"}\n")
    val c = writeFile(dir, "b.csv", "a,c\n1.5,10\n2.5,20\n")
    val out = Concat.run(spark, Concat.Config(Seq(j, c)))
    // a widens long+double -> double; b/c null-inject across sources
    assert(out.schema("a").dataType == DoubleType)
    assert(out.columns.sorted.toSeq == Seq("a", "b", "c"))
    assert(out.count() == 4)
    assert(out.where(col("b").isNull).count() == 2)
    assert(out.where(col("c").isNull).count() == 2)
  }

  test("sink round trip: write jsonl (explicit nulls), read back, values intact") {
    val dir = tmpDir("jsonl-roundtrip")
    val out = dir.resolve("out.jsonl").toString
    val df = Seq((1L, Some("x"), 1.5), (2L, None, -0.25), (3L, Some("émoji 😀"), 2.0))
      .toDF("id", "s", "v")
    Sink.write(df, Sink.Config(out, Discovery.Jsonl))
    // single-file promotion honored the -o contract
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(out)))
    val first = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out)).get(0)
    assert(first.contains("\"s\":\"x\""))
    val back = Sink.readBack(spark, out, Discovery.Jsonl)
      .select("id", "s", "v").orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back(1).isNullAt(1) && back(2).getString(1) == "émoji 😀")
    assert(back.map(_.getDouble(2)).toSeq == Seq(1.5, -0.25, 2.0))
    // explicit null kept the key in the written line for row 2
    val line2 = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out)).get(1)
    assert(line2.contains("\"s\":null"))
  }

  test("streaming concat reads jsonl sources and writes jsonl output, resumable") {
    val d = tmpDir("jsonl-stream")
    writeFile(d, "in/a.jsonl", "{\"k\": 1, \"v\": \"x\"}\n")
    val out = d.resolve("out").toString
    val ckpt = d.resolve("ckpt").toString
    val cfg = Concat.Config(Seq(d.resolve("in").toString))
    graft.streaming.StreamingConcat.run(spark, cfg, out, Discovery.Jsonl, ckpt)
    assert(spark.read.json(out).count() == 1)
    // a later file joins the same checkpointed stream; no reprocessing
    writeFile(d, "in/b.jsonl", "{\"k\": 2, \"v\": null}\n")
    graft.streaming.StreamingConcat.run(spark, cfg, out, Discovery.Jsonl, ckpt)
    val rows = spark.read.json(out)
    assert(rows.count() == 2)
    assert(rows.where(col("v").isNull).count() == 1)
  }

  test("partitioned jsonl layout: col=value tree, partition-pruned read-back") {
    val d = tmpDir("jsonl-part")
    val out = d.resolve("tree").toString
    val df = Seq((1L, "en", "a"), (2L, "de", "b"), (3L, "en", "c")).toDF("id", "lang", "s")
    Sink.write(df, Sink.Config(out, Discovery.Jsonl, partitionBy = Seq("lang")))
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(out, "lang=en")))
    val back = Sink.readBack(spark, out, Discovery.Jsonl)
    assert(back.count() == 3)
    val pruned = back.where(col("lang") === "en")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.count() == 2)
  }

  test("jsonl byte fast path: verbatim concat, newline splice guard, typed-path equivalence") {
    import graft.operators.JsonByteConcat
    import graft.sources.Discovery.InputFile
    val d = tmpDir("jsonl-bytes")
    // b.jsonl has DIFFERENT keys and no trailing newline — self-describing
    // lines make the byte concat value-faithful anyway, and the copier must
    // splice a newline so c.jsonl's first record isn't glued to b's last
    val a = writeFile(d, "a.jsonl", "{\"x\": 1}\n{\"x\": 2}\n")
    val b = writeFile(d, "b.jsonl", "{\"y\": \"only\"}")
    val c = writeFile(d, "c.jsonl", "{\"x\": 3, \"y\": \"both\"}\n")
    val out = d.resolve("out.jsonl").toString
    val files = Seq(a, b, c).map(p => InputFile(p, Discovery.Jsonl,
      java.nio.file.Files.size(java.nio.file.Paths.get(p))))
    val cfg = Concat.Config(Seq(a, b, c))
    val metrics = JsonByteConcat.tryRun(spark, files, cfg, Sink.Config(out, Discovery.Jsonl))
    assert(metrics.isDefined, "byte path declined an eligible jsonl concat")
    assert(metrics.get("rows_written") == 4L)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(out))
    assert(lines.size == 4 && lines.get(1) == "{\"x\": 2}" && lines.get(2) == "{\"y\": \"only\"}")
    // read-back of the byte output == the typed Concat plan's frame
    val byteBack = JsonSource.read(spark, out).select("x", "y")
      .collect().map(_.toSeq).toSet
    val typed = Concat.run(spark, cfg).select("x", "y")
      .collect().map(_.toSeq).toSet
    assert(byteBack == typed)
    // reshaping options or mixed formats force the typed path
    assert(JsonByteConcat.tryRun(spark, files, cfg.copy(exclude = Seq("y")),
      Sink.Config(out, Discovery.Jsonl)).isEmpty)
    val mixed = files.updated(0, files.head.copy(format = Discovery.Csv))
    assert(JsonByteConcat.tryRun(spark, mixed, cfg, Sink.Config(out, Discovery.Jsonl)).isEmpty)
  }

  test("gzip inputs: .csv.gz/.jsonl.gz detect as inner format, sample + scan agree") {
    def gzWrite(p: java.nio.file.Path, content: String): String = {
      val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(p))
      try out.write(content.getBytes("UTF-8")) finally out.close()
      p.toString
    }
    assert(Discovery.detectFormat("x.csv.gz").contains(Discovery.Csv))
    assert(Discovery.detectFormat("x.jsonl.gz").contains(Discovery.Jsonl))
    assert(Discovery.detectFormat("x.parquet.gz").isEmpty) // parquet is internally compressed
    intercept[IllegalArgumentException](Discovery.outputFormat("out.jsonl.gz", None))
    val d = tmpDir("gz-inputs")
    val jgz = gzWrite(d.resolve("a.jsonl.gz"), "{\"k\": 1, \"v\": \"x\"}\n{\"k\": 2, \"v\": null}\n")
    val cgz = gzWrite(d.resolve("b.csv.gz"), "k,w\n3,1.5\n4,2.5\n")
    // sampled inference reads through the same decompression the scan uses
    val js = JsonSource.resolveSchema(spark, jgz, JsonSource.JsonOptions())
    assert(js("k").dataType == LongType && js("v").dataType == StringType)
    val rows = JsonSource.read(spark, jgz).orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L) && rows(1).isNullAt(1))
    // mixed gz csv + gz jsonl unify through the typed concat
    val out = Concat.run(spark, Concat.Config(Seq(jgz, cgz)))
    assert(out.count() == 4 && out.columns.sorted.toSeq == Seq("k", "v", "w"))
    assert(out.schema("k").dataType == LongType)
    // byte paths must decline compressed inputs (plain-out copy would be garbage)
    import graft.sources.Discovery.InputFile
    val files = Seq(InputFile(jgz, Discovery.Jsonl, java.nio.file.Files.size(d.resolve("a.jsonl.gz"))))
    assert(graft.operators.JsonByteConcat.tryRun(spark, files,
      Concat.Config(Seq(jgz)), Sink.Config(d.resolve("o.jsonl").toString, Discovery.Jsonl)).isEmpty)
  }

  test("dotted column names resolve as literal columns, not nested paths") {
    val d = tmpDir("dotted")
    val j = writeFile(d, "a.jsonl", "{\"user.name\": \"ann\", \"k\": 1}\n")
    val jr = JsonSource.read(spark, j).collect()
    assert(jr(0).getString(0) == "ann" && jr(0).getLong(1) == 1L)
    val c = writeFile(d, "b.csv", "user.name,k\nbob,2\n")
    val cr = graft.sources.CsvSource.read(spark, c).collect()
    assert(cr(0).getString(0) == "bob" && cr(0).getLong(1) == 2L)
    // and through the unifier (align's cast projection)
    val both = Concat.run(spark, Concat.Config(Seq(j, c))).orderBy("k").collect()
    assert(both.map(_.getAs[String]("user.name")).toSeq == Seq("ann", "bob"))
  }

  test("review fixes: dotted-name writes, empty shards, .json walk skip, infer-rows threading") {
    val d = tmpDir("review-fixes")
    // dotted names survive the WRITE path too (Sink.writeInternal projection)
    val out = d.resolve("dotted.parquet").toString
    Sink.write(Seq(("ann", 1L)).toDF("user.name", "k"), Sink.Config(out, Discovery.Parquet))
    assert(spark.read.parquet(out).collect()(0).getString(0) == "ann")
    // an empty shard contributes zero rows instead of aborting the concat
    writeFile(d, "shards/s1.jsonl", "{\"k\": 1}\n")
    writeFile(d, "shards/s2.jsonl", "")
    val cat = Concat.run(spark, Concat.Config(Seq(d.resolve("shards").toString)))
    assert(cat.count() == 1)
    // bare .json files stay SKIPPED in directory walks (configs, pretty
    // arrays), while -o out.json still means a jsonl sink
    writeFile(d, "walk/a.jsonl", "{\"k\": 1}\n")
    writeFile(d, "walk/config.json", "{\n  \"not\": \"line-delimited\"\n}\n")
    val walked = Discovery.discover(Seq(d.resolve("walk").toString))
    assert(walked.map(_.path).forall(_.endsWith("a.jsonl")))
    assert(Discovery.outputFormat("out.json", None) == Discovery.Jsonl)
    // --infer-rows reaches the jsonl sampler through Concat's call sites
    val late = writeFile(d, "late.jsonl",
      "{\"k\": 1}\n{\"k\": 2}\n{\"k\": 3, \"late\": \"seen\"}\n")
    import graft.sources.Discovery.InputFile
    val f = InputFile(late, Discovery.Jsonl, java.nio.file.Files.size(d.resolve("late.jsonl")))
    val narrow = Concat.fileSchema(spark, f,
      graft.sources.CsvSource.CsvOptions(inferRows = 2))
    assert(!narrow.fieldNames.contains("late"))
    val wide = Concat.fileSchema(spark, f,
      graft.sources.CsvSource.CsvOptions(inferRows = 1000))
    assert(wide.fieldNames.contains("late"))
  }

  test("CLI: csv -> jsonl and jsonl -> parquet conversions with --verify") {
    val dir = tmpDir("jsonl-cli")
    val csv = writeFile(dir, "in.csv", "a,b\n1,x\n2,y\n")
    val outJ = dir.resolve("out.jsonl").toString
    graft.cli.Maw.execute(spark, graft.cli.Maw.parse(Seq(csv, "-o", outJ, "--verify")))
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(outJ))
    assert(lines.size == 2 && lines.get(0) == """{"a":1,"b":"x"}""")
    val outP = dir.resolve("out.parquet").toString
    graft.cli.Maw.execute(spark, graft.cli.Maw.parse(Seq(outJ, "-o", outP, "--verify")))
    val back = spark.read.parquet(outP).orderBy("a").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x"), (2L, "y")))
    // jsonl -> jsonl rides the byte fast path inside convert; --verify
    // checksums the byte output against the typed plan
    val outJ2 = dir.resolve("out2.jsonl").toString
    graft.cli.Maw.execute(spark, graft.cli.Maw.parse(Seq(outJ, "-o", outJ2, "--verify")))
    assert(java.nio.file.Files.readAllLines(java.nio.file.Paths.get(outJ2)) ==
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(outJ)))
  }
}

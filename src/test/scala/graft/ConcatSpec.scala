package graft

import graft.operators.Concat
import graft.schema.SchemaUnifier
import graft.sinks.Sink
import graft.sources.{CsvSource, Discovery}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end mirrors of the reference's integration tests
  * (`/root/reference/tests/integration.rs`, `tests/e2e_csv.rs`) plus the
  * widen-conflict fixture from FIXTURES.md.
  */
class ConcatSpec extends SparkSpec {

  test("concat2: two CSVs -> one CSV, header once, exact 5 lines (integration.rs:7-40)") {
    val d = tmpDir("concat2")
    writeFile(d, "file1.csv", "a,b,c\n1,2,3\n4,5,6\n")
    writeFile(d, "file2.csv", "a,b,c\n7,8,9\n10,11,12\n")
    val out = d.resolve("out.csv").toString
    val df = Concat.run(spark, Concat.Config(Seq(
      d.resolve("file1.csv").toString, d.resolve("file2.csv").toString)))
    Sink.write(df, Sink.Config(out, Discovery.Csv))
    val lines = Files.readAllLines(Paths.get(out)).asScala.toList
    assert(lines.length == 5) // header + 4 rows (integration.rs:34)
    assert(lines.head == "a,b,c")
    assert(lines.toSet == Set("a,b,c", "1,2,3", "4,5,6", "7,8,9", "10,11,12"))
  }

  test("recursive directory discovery (integration.rs:43-71)") {
    val d = tmpDir("subdir")
    writeFile(d, "subdir/file1.csv", "x,y\n1,2\n")
    writeFile(d, "subdir/file2.csv", "x,y\n3,4\n")
    val df = Concat.run(spark, Concat.Config(Seq(d.toString)))
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("x", "y"))
  }

  test("glob discovery") {
    val d = tmpDir("glob")
    writeFile(d, "a1.csv", "k\n1\n")
    writeFile(d, "a2.csv", "k\n2\n")
    writeFile(d, "skip.txt", "not data")
    val files = Discovery.discover(Seq(d.toString + "/a*.csv"))
    assert(files.map(f => Paths.get(f.path).getFileName.toString) == Seq("a1.csv", "a2.csv"))
  }

  test("fileSchema footer read matches spark.read for every fixture table") {
    // includes events.parquet — historically timestamp[ns], which under
    // nanosAsLong resolves to long; currently timestamp[us] -> TIMESTAMP_NTZ.
    // Either way the footer read must resolve it exactly like spark.read
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")) {
      val p = s"$dir/$t.parquet"
      val viaRead = spark.read.parquet(p).schema
      val viaFooter = Concat.fileSchema(spark,
        Discovery.InputFile(p, Discovery.Parquet, 0L), CsvSource.CsvOptions())
      assert(viaFooter == viaRead, s"schema mismatch for $t")
    }
  }

  test("discovery: symlink loops are skipped, file symlinks honor --follow-symlinks") {
    val d = tmpDir("symlinks")
    writeFile(d, "real.csv", "k\n1\n")
    writeFile(d, "elsewhere/target.csv", "k\n2\n")
    Files.createSymbolicLink(d.resolve("link.csv"), d.resolve("elsewhere/target.csv"))
    Files.createSymbolicLink(d.resolve("loop"), d) // cycle under FOLLOW_LINKS
    def names(follow: Boolean) =
      Discovery.discover(Seq(d.toString), Discovery.Options(followSymlinks = follow))
        .map(f => Paths.get(f.path).getFileName.toString).toSet
    // no-follow (default): the file symlink is a symlink, not a file —
    // skipped like the reference's WalkDir without follow_links
    assert(names(follow = false) == Set("real.csv", "target.csv"))
    // follow: the symlinked file is ingested; the directory loop is skipped
    // instead of aborting the walk with FileSystemLoopException
    assert(names(follow = true).contains("link.csv"))
  }

  test("multi-char delimiter is rejected up front (inference samples with charAt(0))") {
    intercept[IllegalArgumentException] { CsvSource.CsvOptions(delimiter = "||") }
    // the CLI's literal backslash-t spelling maps to a real tab
    assert(graft.cli.Maw.parse(Seq("in.csv", "--delimiter", "\\t")).delimiter == "\t")
  }

  test("fileSchema forces nullability recursively (array elements written required)") {
    // spark.read reports asNullable schemas for file sources — including
    // array containsNull; a footer probe that only nulls top-level fields
    // would make two identical-under-spark.read files unify as a conflict
    val d = tmpDir("reqarray")
    val p = d.resolve("req.parquet").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = Seq(org.apache.spark.sql.Row(1L, Seq(1.0f, 2.0f)))
    spark.createDataFrame(rows.asJava, schema).write.parquet(p)
    val f = Discovery.discover(Seq(p)).head
    assert(Concat.fileSchema(spark, f, CsvSource.CsvOptions()) ==
      spark.read.parquet(p).schema)
  }

  test("glob does not over-include nested files repeating the base dir path") {
    // relative pattern 'base/*.csv' + file 'base/base/y.csv': the nested
    // file's parent-relative form 'base/y.csv' used to match the
    // full-pattern matcher and get silently concatenated
    val base = java.nio.file.Files.createTempDirectory(
      Paths.get("target").toAbsolutePath, "globrep")
    base.toFile.deleteOnExit()
    val rel = Paths.get("").toAbsolutePath.relativize(base).toString
    writeFile(base, "x.csv", "k\n1\n")
    writeFile(base, s"$rel/y.csv", "k\n2\n") // subtree repeating the parent prefix
    val files = Discovery.discover(Seq(s"$rel/*.csv"))
    assert(files.map(f => Paths.get(f.path).getFileName.toString) == Seq("x.csv"))
    // the nested file IS reachable when the pattern asks for the subtree
    val deep = Discovery.discover(Seq(s"$rel/**/*.csv"))
    assert(deep.map(f => Paths.get(f.path).getFileName.toString) == Seq("y.csv"))
  }

  test("discovery is deduped + lexicographically sorted (discover.rs:88-90)") {
    val d = tmpDir("dedup")
    val f1 = writeFile(d, "b.csv", "k\n1\n")
    val f2 = writeFile(d, "a.csv", "k\n2\n")
    val files = Discovery.discover(Seq(f1, f2, f1))
    assert(files.map(_.path) == Seq(f2, f1).sorted)
    assert(files.size == 2)
  }

  test("noheader: synthetic col_N names (csv_in.rs:73-78)") {
    val d = tmpDir("nohead")
    val f = writeFile(d, "x.csv", "1,2,3\n4,5,6\n")
    val df = CsvSource.read(spark, f, CsvSource.CsvOptions(headers = false))
    assert(df.columns.toSeq == Seq("col_1", "col_2", "col_3"))
    assert(df.count() == 2)
  }

  test("NA value list -> null (cli.rs:41-43)") {
    val d = tmpDir("na")
    val f = writeFile(d, "x.csv", "a,b\nNA,1\nnull,2\n\\N,3\nok,4\n")
    val df = CsvSource.read(spark, f)
    assert(df.filter(df("a").isNull).count() == 3)
    assert(df.filter(df("a") === "ok").count() == 1)
  }

  test("inference precedence i64 -> f64 -> bool -> string (csv_in.rs:171-232)") {
    val d = tmpDir("infer")
    val f = writeFile(d, "x.csv",
      "i,f,b,s,mixed\n1,1.5,true,abc,1\n2,2.5,false,def,x\n")
    val df = CsvSource.read(spark, f)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("i") == LongType)
    assert(types("f") == DoubleType)
    assert(types("b") == BooleanType)
    assert(types("s") == StringType)
    assert(types("mixed") == StringType) // one non-parse -> string (csv_in.rs:201)
  }

  test("floats dominate ints in inference (csv_in.rs:207-213)") {
    val d = tmpDir("fdom")
    val f = writeFile(d, "x.csv", "v\n1\n2.5\n")
    val df = CsvSource.read(spark, f)
    assert(df.schema.fields.head.dataType == DoubleType)
  }

  test("widen-conflict fixture: a:int+a:double, null injection, alphabetical order") {
    val d = tmpDir("widen")
    val f1 = writeFile(d, "f1.csv", "a,b\n1,x\n2,y\n")
    val f2 = writeFile(d, "f2.csv", "a,c\n1.5,10\n2.5,20\n")
    val df = Concat.run(spark, Concat.Config(Seq(f1, f2)))
    assert(df.columns.toSeq == Seq("a", "b", "c")) // alphabetical (schema.rs:101-102)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("a") == DoubleType) // I64 + F64 -> F64
    assert(types("b") == StringType)
    assert(types("c") == LongType)
    assert(df.schema.fields.forall(_.nullable)) // schema.rs:107
    assert(df.count() == 4)
    assert(df.filter(df("b").isNull).count() == 2) // null-injected for f2 rows
  }

  test("conflict without stringify errors; with stringify coerces (schema.rs:184-191)") {
    val d = tmpDir("conflict")
    val f1 = writeFile(d, "f1.csv", "a\n1\n")
    val f2 = writeFile(d, "f2.csv", "a\nxyz\n")
    intercept[graft.schema.TypeWidening.WidenError] {
      Concat.run(spark, Concat.Config(Seq(f1, f2)))
    }
    val df = Concat.run(spark, Concat.Config(Seq(f1, f2), stringifyConflicts = true))
    assert(df.schema.fields.head.dataType == StringType)
    assert(df.collect().map(_.getString(0)).toSet == Set("1", "xyz"))
  }

  test("rename + include + exclude (cli.rs:46-56)") {
    val d = tmpDir("proj")
    val f = writeFile(d, "f.csv", "a,b,c\n1,2,3\n")
    val df = Concat.run(spark, Concat.Config(Seq(f),
      renames = Map("a" -> "zz"), include = Some(Seq("zz", "b"))))
    assert(df.columns.toSeq == Seq("b", "zz")) // alphabetical
    val df2 = Concat.run(spark, Concat.Config(Seq(f), exclude = Seq("b")))
    assert(df2.columns.toSeq == Seq("a", "c"))
  }

  test("CSV -> Parquet roundtrip with zstd (writer_parquet.rs:33-57)") {
    val d = tmpDir("roundtrip")
    val f = writeFile(d, "f.csv", "id,name,value\n1,Alice,100\n2,Bob,200\n")
    val out = d.resolve("out.parquet").toString
    val df = Concat.run(spark, Concat.Config(Seq(f)))
    Sink.write(df, Sink.Config(out, Discovery.Parquet, compression = "zstd"))
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("id", "name", "value"))
    assert(back.schema("id").dataType == LongType)
  }

  test("rolling output by rows (cli.rs:70-77 intent)") {
    val d = tmpDir("roll")
    val f = writeFile(d, "f.csv", "k\n" + (1 to 10).map(_.toString).mkString("\n") + "\n")
    val out = d.resolve("out.csv").toString
    val df = Concat.run(spark, Concat.Config(Seq(f))).repartition(1)
    Sink.write(df, Sink.Config(out, Discovery.Csv, rollByRows = Some(4)))
    val parts = Files.list(d).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("out-")).toList.sorted
    assert(parts.size >= 3) // 10 rows / 4 per file
  }

  test("header-only part file: all-null columns widen away (NullType transient)") {
    val d = tmpDir("emptypart")
    writeFile(d, "p0.csv", "a,b\n") // header only — like an empty Spark output partition
    writeFile(d, "p1.csv", "a,b\n1,2.5\n4,5.5\n")
    val df = Concat.run(spark, Concat.Config(Seq(d.toString)))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("a") == LongType)
    assert(types("b") == DoubleType)
    assert(df.count() == 2)
  }

  test("many same-schema files collapse into one scan node") {
    val d = tmpDir("manyfiles")
    (1 to 100).foreach(i => writeFile(d, f"part$i%03d.csv", s"a,b\n$i,x$i\n"))
    val t0 = System.nanoTime()
    val df = Concat.run(spark, Concat.Config(Seq(d.toString)))
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(df.count() == 100)
    val scans = "Scan csv".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(scans == 1, s"expected 1 consolidated scan, got $scans")
    assert(planSec < 30, f"planning 100 files took $planSec%.1f s")
  }

  test("mixed-schema files group separately but still unify") {
    val d = tmpDir("mixedgroups")
    writeFile(d, "a1.csv", "a,b\n1,x\n")
    writeFile(d, "a2.csv", "a,b\n2,y\n")
    writeFile(d, "z1.csv", "a,c\n3.5,10\n")
    val df = Concat.run(spark, Concat.Config(Seq(d.toString)))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    val scans = "Scan csv".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(scans == 2, s"expected 2 scans (one per schema group), got $scans")
  }

  test("mixed CSV + Parquet inputs unify into one plan") {
    val d = tmpDir("mixedfmt")
    val csv = writeFile(d, "extra.csv", "r_regionkey,r_comment\n99,from-csv\n")
    val df = Concat.run(spark, Concat.Config(Seq(
      "/root/testdata/sf0.001/region.parquet", csv)))
    assert(df.columns.toSeq == Seq("r_comment", "r_name", "r_regionkey")) // alphabetical union
    assert(df.count() == 6) // 5 parquet regions + 1 csv row
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("r_regionkey") == LongType) // parquet int32 + csv long -> long
    assert(df.where(df("r_comment") === "from-csv").count() == 1)
  }

  test("quoted newline inside a field parses as ONE record (RFC 4180, like the csv crate)") {
    val d = tmpDir("qnl")
    // field 'x\ny' spans a raw newline inside quotes; naive line splitting
    // would produce two malformed records
    writeFile(d, "q.csv", "a,b\n\"x\ny\",2\n3,4\n")
    val df = Concat.run(spark, Concat.Config(Seq(d.resolve("q.csv").toString)))
    val rows = df.orderBy("b").collect()
    assert(rows.length == 2, s"expected 2 records, got ${rows.length}: ${rows.mkString(";")}")
    assert(rows(0).getString(0) == "x\ny" && rows(0).getLong(1) == 2L)
    assert(rows(1).getString(0) == "3" && rows(1).getLong(1) == 4L)
  }

  test("nonexistent input fails with a clear error (tests/basic.rs:21-30)") {
    intercept[IllegalArgumentException] {
      Discovery.discover(Seq("/nonexistent/path.csv"))
    }
    intercept[IllegalArgumentException] {
      Concat.run(spark, Concat.Config(Seq())) // no inputs at all
    }
  }

  test("custom delimiter and quote (csv_in.rs:23-43)") {
    val d = tmpDir("delim")
    val f = writeFile(d, "x.csv", "a;b\n'x;y';2\n'plain';3\n")
    val df = CsvSource.read(spark, f,
      CsvSource.CsvOptions(delimiter = ";", quote = "'"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("x;y", 2L), ("plain", 3L))) // quoted delimiter preserved
  }

  test("parquet-only concat of testdata tables") {
    val df = Concat.run(spark, Concat.Config(Seq(
      "/root/testdata/sf0.001/region.parquet", "/root/testdata/sf0.001/nation.parquet")))
    assert(df.columns.toSeq == df.columns.sorted.toSeq)
    assert(df.count() == 30)
  }
}

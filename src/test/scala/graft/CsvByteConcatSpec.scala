package graft

import graft.operators.{Concat, CsvByteConcat}
import graft.sinks.Sink
import graft.sources.Discovery
import java.nio.file.Files

/** The byte-level CSV->CSV fast path must be value-identical to the
  * all-string Concat+Sink pipeline: clean files copy through, dirty files
  * (NA fields / ragged rows / odd quoting) are normalized record-by-record.
  */
class CsvByteConcatSpec extends SparkSpec {

  private def sinkCfg(path: String) =
    Sink.Config(path, Discovery.Csv, singleFile = true)

  private def convert(inputs: Seq[String], out: String,
      naOut: String = ""): Map[String, Any] =
    Concat.convert(spark, Concat.Config(inputs, rawPassThrough = true),
      Sink.Config(out, Discovery.Csv, naString = naOut))

  private def readValues(path: String): Seq[Seq[String]] =
    spark.read.option("header", "true").option("escape", "\"").csv(path)
      .collect().toSeq.map(r => (0 until r.length).map(i =>
        Option(r.getString(i)).getOrElse("<null>")))

  test("clean files: byte copy, exact bytes preserved, rows counted") {
    val d = tmpDir("bcc1")
    val f1 = writeFile(d, "a.csv", "k,v\n1,x\n2,y\n")
    val f2 = writeFile(d, "b.csv", "k,v\n3,z\n")
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(f1, f2), out)
    assert(m("rows_written") == 3L)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,x\n2,y\n3,z\n")
  }

  test("quoted fields with embedded delimiters pass through untouched") {
    val d = tmpDir("bcc2")
    val f = writeFile(d, "a.csv", "k,v\n1,\"x,with,commas\"\n2,\"he said \"\"hi\"\"\"\n")
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(f), out)
    assert(m("rows_written") == 2L)
    assert(Files.readString(d.resolve("out.csv")) ==
      "k,v\n1,\"x,with,commas\"\n2,\"he said \"\"hi\"\"\"\n")
  }

  test("NA fields trigger record fallback and are normalized like the typed path") {
    val d = tmpDir("bcc3")
    val f = writeFile(d, "a.csv", "k,v\n1,NA\n2,ok\nnull,3\n")
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(f), out)
    assert(m("rows_written") == 3L)
    // NA/null cells -> empty (naOut default ""), others untouched
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,\n2,ok\n,3\n")
    // and with a visible NA string
    val out2 = d.resolve("out2.csv").toString
    convert(Seq(f), out2, naOut = "\\N")
    assert(Files.readString(d.resolve("out2.csv")) == "k,v\n1,\\N\n2,ok\n\\N,3\n")
  }

  test("quoted NA is normalized too (parser unquotes before the NA compare)") {
    val d = tmpDir("bcc4")
    val f = writeFile(d, "a.csv", "k,v\n1,\"NA\"\n2,ok\n")
    val out = d.resolve("out.csv").toString
    convert(Seq(f), out)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,\n2,ok\n")
  }

  test("substring NA (NATION) does NOT trigger normalization") {
    val d = tmpDir("bcc5")
    val f = writeFile(d, "a.csv", "k,v\n1,NATION\n2,nullify\n")
    val out = d.resolve("out.csv").toString
    convert(Seq(f), out)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,NATION\n2,nullify\n")
  }

  test("ragged rows fall back and are padded/truncated to header width") {
    val d = tmpDir("bcc6")
    val f = writeFile(d, "a.csv", "k,v\n1\n2,x,extra\n")
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(f), out)
    assert(m("rows_written") == 2L)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,\n2,x\n")
  }

  test("mixed clean + dirty files: each file independently fast or fallback") {
    val d = tmpDir("bcc7")
    val clean = writeFile(d, "a.csv", "k,v\n1,x\n")
    val dirty = writeFile(d, "b.csv", "k,v\nNA,y\n")
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(clean, dirty), out)
    assert(m("rows_written") == 2L)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,x\n,y\n")
  }

  test("non-empty output NA string: byte path declines, empty fields render as NA") {
    val d = tmpDir("bccNa")
    val f = writeFile(d, "a.csv", "k,v\n1,\n2,y\n")
    val out = d.resolve("out.csv").toString
    val cfg = Concat.Config(Seq(f), rawPassThrough = true)
    val sink = Sink.Config(out, Discovery.Csv, naString = "NULL")
    assert(!CsvByteConcat.eligible(cfg, sink)) // null -> "NULL" is a re-render
    Concat.convert(spark, cfg, sink)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,NULL\n2,y\n")
  }

  test("record fallback preserves whitespace and quoted-empty fields (Spark CSV semantics)") {
    val d = tmpDir("bccWs")
    // the NA field makes the file dirty -> record path; ' x ' and "" must
    // survive exactly as the typed path would emit them
    val f = writeFile(d, "a.csv", "k,v,w\n1, x ,NA\n2,\"\",y\n")
    val out = d.resolve("out.csv").toString
    convert(Seq(f), out, naOut = "")
    assert(Files.readString(d.resolve("out.csv")) == "k,v,w\n1, x ,\n2,,y\n")
  }

  test("verify passes with a custom delimiter (readBack honors the sink delimiter)") {
    val d = tmpDir("bccDelim")
    val f = writeFile(d, "a.csv", "a;b\n1;x\n2;y\n")
    val out = d.resolve("out.csv").toString
    val cfg = Concat.Config(Seq(f),
      csv = graft.sources.CsvSource.CsvOptions(delimiter = ";"), rawPassThrough = true)
    Concat.convert(spark, cfg, Sink.Config(out, Discovery.Csv, delimiter = ";"))
    val (rows, _) = graft.cli.Maw.verifyOutput(spark, cfg, out, Discovery.Csv, "",
      outDelimiter = ";")
    assert(rows == 2L)
  }

  test("roll-by-bytes reports the REAL row count, not the sampling cap") {
    val d = tmpDir("bccRoll")
    val body = (1 to 3000).map(i => s"$i,v$i").mkString("\n")
    val f = writeFile(d, "a.csv", "k,v\n" + body + "\n")
    val out = d.resolve("out.csv").toString
    val m = Concat.convert(spark, Concat.Config(Seq(f)),
      Sink.Config(out, Discovery.Csv, rollByBytes = Some(5000)))
    assert(m("rows_written") == 3000L, s"got ${m("rows_written")}")
  }

  test("different headers: byte path declines, typed pipeline handles it") {
    val d = tmpDir("bcc8")
    val f1 = writeFile(d, "a.csv", "a,b\n1,x\n")
    val f2 = writeFile(d, "b.csv", "a,c\n2,y\n")
    assert(CsvByteConcat.tryRun(spark,
      Discovery.discover(Seq(f1, f2)),
      Concat.Config(Seq(f1, f2), rawPassThrough = true),
      sinkCfg(d.resolve("never.csv").toString)).isEmpty)
    // convert() still produces the unified result via the normal path
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(f1, f2), out)
    assert(m("rows_written") == 2L)
    val vals = readValues(out)
    assert(vals.toSet == Set(Seq("1", "x", "<null>"), Seq("2", "<null>", "y")))
  }

  test("missing trailing newline: parts still concatenate row-safe") {
    val d = tmpDir("bcc9")
    val f1 = writeFile(d, "a.csv", "k,v\n1,x") // no trailing \n
    val f2 = writeFile(d, "b.csv", "k,v\n2,y\n")
    val out = d.resolve("out.csv").toString
    val m = convert(Seq(f1, f2), out)
    assert(m("rows_written") == 2L)
    assert(Files.readString(d.resolve("out.csv")) == "k,v\n1,x\n2,y\n")
  }

  test("multi-file (singleFile=false) output: header per part, direct final names") {
    val d = tmpDir("bcc10")
    val f1 = writeFile(d, "a.csv", "k,v\n1,x\n")
    val f2 = writeFile(d, "b.csv", "k,v\n2,y\n")
    val out = d.resolve("out.csv").toString
    val m = Concat.convert(spark, Concat.Config(Seq(f1, f2), rawPassThrough = true),
      Sink.Config(out, Discovery.Csv, singleFile = false))
    assert(m("rows_written") == 2L)
    assert(Files.readString(d.resolve("out-0000.csv")) == "k,v\n1,x\n")
    assert(Files.readString(d.resolve("out-0001.csv")) == "k,v\n2,y\n")
  }

  test("unsorted header declines (unification reorders alphabetically)") {
    val d = tmpDir("bcc12")
    val f = writeFile(d, "a.csv", "z,a\n1,2\n")
    assert(CsvByteConcat.tryRun(spark, Discovery.discover(Seq(f)),
      Concat.Config(Seq(f), rawPassThrough = true),
      sinkCfg(d.resolve("never.csv").toString)).isEmpty)
    // the fallback output has the reordered columns
    val out = d.resolve("out.csv").toString
    convert(Seq(f), out)
    assert(Files.readString(d.resolve("out.csv")) == "a,z\n2,1\n")
  }

  test("property: byte path values == typed path values on randomized content") {
    // seeded: deterministic across runs. Alphabet hits every scanner branch:
    // clean, empty, NA (fallback trigger), embedded delimiter/quote (quoted
    // pass-through), whitespace padding, ragged-looking numerics
    val rnd = new scala.util.Random(20260812L)
    val cells = Array(
      "plain", "", "NA", "\"x,y\"", "\"he said \"\"hi\"\"\"", " padded ",
      "42", "3.14", "x", "\"\"", "multi word value", "0")
    for (round <- 1 to 15) {
      val d = tmpDir(s"bccProp$round")
      val files = (0 until 2).map { fi =>
        val rows = (1 to 1 + rnd.nextInt(20)).map { _ =>
          (0 until 3).map(_ => cells(rnd.nextInt(cells.length))).mkString(",")
        }
        writeFile(d, s"f$fi.csv", "a,b,c\n" + rows.mkString("\n") + "\n")
      }
      val fastOut = d.resolve("fast.csv").toString
      val typedOut = d.resolve("typed.csv").toString
      val m = convert(files, fastOut)
      // typed reference: the all-string plan through the normal sink
      val cfg = Concat.Config(files, rawPassThrough = true)
      Sink.write(Concat.planFor(spark, cfg, graft.sources.Discovery.discover(files)),
        sinkCfg(typedOut))
      val got = readValues(fastOut).map(_.mkString("\u0001")).sorted
      val want = readValues(typedOut).map(_.mkString("\u0001")).sorted
      assert(got == want, s"round $round diverged:\ngot  $got\nwant $want")
      assert(m("rows_written") == want.size.toLong)
    }
  }

  test("byte path and all-string pipeline agree value-for-value on testdata CSV") {
    val d = tmpDir("bcc11")
    // render a real table to CSV in unified column order (as maw writes it)
    val src0 = sf("customer", "/root/testdata/sf0.001")
    val src = src0.select(src0.columns.sorted.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    val in = d.resolve("cust_csv").toString
    src.write.option("header", "true").csv(in)
    val fast = d.resolve("fast.csv").toString
    val m = convert(Seq(in), fast)
    val slow = d.resolve("slow.csv").toString
    Sink.write(
      Concat.planFor(spark, Concat.Config(Seq(in), rawPassThrough = true),
        Discovery.discover(Seq(in))),
      Sink.Config(slow, Discovery.Csv))
    assert(m("rows_written") == src.count())
    assert(readValues(fast).sortBy(_.mkString("|")) ==
      readValues(slow).sortBy(_.mkString("|")))
  }

  test("default Config (type inference on) declines the byte path") {
    val d = tmpDir("bccInfer")
    val f = writeFile(d, "a.csv", "k,v\n007,1e3\n")
    // without rawPassThrough, the typed fallback would re-render values
    // ("007"->7), so the byte path must not fire for the library API either
    assert(CsvByteConcat.tryRun(spark, Discovery.discover(Seq(f)),
      Concat.Config(Seq(f)), sinkCfg(d.resolve("o.csv").toString)).isEmpty)
    // and inference explicitly off IS eligible even without rawPassThrough
    assert(CsvByteConcat.tryRun(spark, Discovery.discover(Seq(f)),
      Concat.Config(Seq(f), csv = graft.sources.CsvSource.CsvOptions(inferTypes = false)),
      sinkCfg(d.resolve("o2.csv").toString)).nonEmpty)
  }

  test("re-run over fewer inputs clears stale higher-numbered parts") {
    val d = tmpDir("bccStale")
    val fs = (1 to 3).map(i => writeFile(d, s"f$i.csv", s"k,v\n$i,x$i\n"))
    val out = d.resolve("out.csv").toString
    def multi(inputs: Seq[String]) =
      Concat.convert(spark, Concat.Config(inputs, rawPassThrough = true),
        Sink.Config(out, Discovery.Csv, singleFile = false, preserveOrder = false))
    multi(fs)
    assert(Files.exists(d.resolve("out-0002.csv")))
    multi(fs.take(2))
    assert(!Files.exists(d.resolve("out-0002.csv")),
      "stale part from the 3-input run must be removed")
    assert(Sink.readBack(spark, out, Discovery.Csv).count() == 2)
    // and a single-file re-run clears ALL parts
    Concat.convert(spark, Concat.Config(fs.take(1), rawPassThrough = true),
      Sink.Config(out, Discovery.Csv, singleFile = true))
    assert(!Files.exists(d.resolve("out-0000.csv")) &&
      !Files.exists(d.resolve("out-0001.csv")))
    assert(Sink.readBack(spark, out, Discovery.Csv).count() == 1)
  }

  test("chained concat of a previous run's rolled output preserves the inputs") {
    // the output part names (out-0000.csv, ...) ARE the input names here:
    // any write to a final path before the inputs are fully consumed would
    // truncate the data being read (this held a real data-loss bug: stale-
    // part cleanup ran before the read, deleting both inputs)
    val d = tmpDir("bccChained")
    val fs = (1 to 2).map(i => writeFile(d, s"src$i.csv", s"k,v\n$i,x$i\n"))
    val rolled = d.resolve("out.csv").toString
    Concat.convert(spark, Concat.Config(fs, rawPassThrough = true),
      Sink.Config(rolled, Discovery.Csv, singleFile = false, preserveOrder = false))
    val parts = Seq(d.resolve("out-0000.csv").toString, d.resolve("out-0001.csv").toString)
    parts.foreach(p => assert(Files.exists(java.nio.file.Paths.get(p))))
    // chain 1: concat the rolled parts into a single file
    val merged = d.resolve("merged.csv").toString
    Concat.convert(spark, Concat.Config(parts, rawPassThrough = true),
      Sink.Config(merged, Discovery.Csv, singleFile = true))
    assert(Sink.readBack(spark, merged, Discovery.Csv).count() == 2)
    // chain 2: re-roll ONTO the same part names (input == output paths)
    Concat.convert(spark, Concat.Config(parts, rawPassThrough = true),
      Sink.Config(rolled, Discovery.Csv, singleFile = false, preserveOrder = false))
    assert(Sink.readBack(spark, rolled, Discovery.Csv).count() == 2)
  }

  test("stale-part cleanup never touches sibling files outside the index regime") {
    val d = tmpDir("bccSibling")
    // 8-digit (date-suffixed) and overflow-length digit runs are user files,
    // not part indexes (the writer emits 4..7-digit indexes only)
    val dated = writeFile(d, "out-20260812.csv", "k,v\nkeep,1\n")
    val huge = writeFile(d, "out-99999999999.csv", "k,v\nkeep,2\n")
    val f = writeFile(d, "f.csv", "k,v\n1,x\n")
    val out = d.resolve("out.csv").toString
    Concat.convert(spark, Concat.Config(Seq(f), rawPassThrough = true),
      Sink.Config(out, Discovery.Csv, singleFile = false, preserveOrder = false))
    assert(Files.exists(java.nio.file.Paths.get(dated)), "date-suffixed sibling deleted")
    assert(Files.exists(java.nio.file.Paths.get(huge)), "overflow-length sibling deleted")
  }
}

package graft

import graft.cli.Maw
import graft.operators.Concat
import graft.sinks.Sink
import graft.sources.{Discovery, XmlSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XML as a first-class source/sink (Spark 4 native XML): detection, the
  * driver-side StAX schema sampler, typed round trip with null-vs-empty
  * fidelity, mixed-format concat unification, gz input, the CLI drive, and
  * the loud refusals on the unsupported surfaces (streaming, compaction).
  */
class XmlSpec extends SparkSpec {
  import spark.implicits._

  test("format detection: .xml/.xml.gz in; xml out-format flag and extension") {
    assert(Discovery.detectFormat("/x/a.xml").contains(Discovery.Xml))
    assert(Discovery.detectFormat("/x/a.XML").contains(Discovery.Xml))
    assert(Discovery.detectFormat("/x/a.xml.gz").contains(Discovery.Xml))
    assert(Discovery.outputFormat("out.xml", None) == Discovery.Xml)
    assert(Discovery.outputFormat("out.bin", Some("xml")) == Discovery.Xml)
  }

  test("xml round trip: values, inferred types, null vs empty, missing fields") {
    val dir = tmpDir("xml-rt")
    val df = Seq(
      (1L, "v one", "x", 1.5),
      (2L, null.asInstanceOf[String], "", 2.0),
      (3L, "v <three> & \"co\"", "y", -0.25),
      // whitespace-padded value: the reader must NOT trim it (pure-concat
      // fidelity — same contract the CSV scan pins with its
      // ignoreLeading/TrailingWhiteSpace=false options)
      (4L, "  padded  ", "z", 0.5))
      .toDF("id", "s", "e", "d")
    val out = dir.resolve("t.xml").toString
    Sink.write(df, Sink.Config(out, Discovery.Xml))
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(out)))
    val back = Concat.run(spark, Concat.Config(Seq(out)))
    // text format + sampler inference: long/double recovered, strings stay
    val byName = back.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("id") == LongType && byName("d") == DoubleType, byName)
    assert(byName("s") == StringType && byName("e") == StringType, byName)
    val rows = back.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows(3).getAs[String]("s") == "  padded  ", // no silent trim
      s"'${rows(3).getAs[String]("s")}'")
    // null wrote as an ABSENT element and reads back null; empty string
    // wrote as an empty element and reads back "" — the distinction the
    // JSONL sink also preserves
    assert(rows(1).isNullAt(rows(1).fieldIndex("s")))
    assert(rows(1).getAs[String]("e") == "")
    // XML escaping round-trips markup-significant characters
    assert(rows(2).getAs[String]("s") == "v <three> & \"co\"")
  }

  test("glob with an xml extension (dir/*.xml) expands instead of being stat'd literally") {
    // the round-15 advice repro: '*.xml' carries the xml extension, so the
    // extension branch used to pass the literal pattern to the sampler's
    // getFileStatus — the glob check must come first
    val dir = tmpDir("xml-glob")
    for (i <- Seq(1, 2)) {
      val out = dir.resolve(s"g$i.xml").toString
      Sink.write(Seq((i.toLong, s"v$i")).toDF("id", "s"),
        Sink.Config(out, Discovery.Xml))
    }
    val back = XmlSource.readPaths(spark, Seq(s"$dir/*.xml"), XmlSource.XmlOptions())
    assert(back.orderBy("id").collect().map(_.getAs[String]("s")).toSeq == Seq("v1", "v2"))
  }

  test("driver-side StAX sampler: bounded, typed like CSV, DTDs refused") {
    val dir = tmpDir("xml-sample")
    val f = dir.resolve("r.xml")
    java.nio.file.Files.write(f,
      ("<rows><row><a>1</a><b>x</b></row>" +
        "<row><a>2</a><b>true</b><c>3.5</c></row></rows>").getBytes("UTF-8"))
    val schema = XmlSource.resolveSchema(spark, f.toString, XmlSource.XmlOptions())
    assert(schema("a").dataType == LongType)
    assert(schema("b").dataType == StringType) // "x" forces string, like CSV
    assert(schema("c").dataType == DoubleType) // absent row samples as null
    // bounded: inferRows=1 sees only the first row -> c never observed
    val s1 = XmlSource.resolveSchema(spark, f.toString,
      XmlSource.XmlOptions(inferRows = 1))
    assert(!s1.fieldNames.contains("c"), s1.fieldNames.toSeq)
    // untrusted input: a DTD in the sample is refused, not resolved
    val evil = dir.resolve("evil.xml")
    java.nio.file.Files.write(evil,
      ("<?xml version=\"1.0\"?><!DOCTYPE r [<!ENTITY x SYSTEM \"file:///etc/hostname\">]>" +
        "<rows><row><a>&x;</a></row></rows>").getBytes("UTF-8"))
    intercept[Exception](
      XmlSource.resolveSchema(spark, evil.toString, XmlSource.XmlOptions()))
  }

  test("mixed xml + csv concat unifies schemas; .xml.gz reads transparently") {
    val dir = tmpDir("xml-mixed")
    val x = dir.resolve("a.xml")
    java.nio.file.Files.write(x,
      "<rows><row><k>1</k><only_xml>q</only_xml></row></rows>".getBytes("UTF-8"))
    val c = dir.resolve("b.csv")
    java.nio.file.Files.write(c, "k,only_csv\n2.5,z\n".getBytes("UTF-8"))
    val merged = Concat.run(spark, Concat.Config(Seq(dir.toString)))
    // k widens long + double -> double; each side's solo column null-fills
    assert(merged.schema("k").dataType == DoubleType, merged.schema)
    val rows = merged.orderBy("k").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("only_xml") == "q" && rows(0).isNullAt(rows(0).fieldIndex("only_csv")))
    assert(rows(1).getAs[String]("only_csv") == "z" && rows(1).isNullAt(rows(1).fieldIndex("only_xml")))
    // gz: same content compressed reads identically through discovery
    val gz = dir.resolve("sub").resolve("a.xml.gz")
    java.nio.file.Files.createDirectories(gz.getParent)
    val os = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    os.write("<rows><row><k>7</k></row></rows>".getBytes("UTF-8")); os.close()
    val viaGz = Concat.run(spark, Concat.Config(Seq(gz.toString)))
    assert(viaGz.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("CLI drive: csv -> xml -> csv, and the streaming/compact refusals") {
    val dir = tmpDir("xml-cli")
    val in = dir.resolve("in.csv")
    java.nio.file.Files.write(in, "a,b\n1,x\n2,\n".getBytes("UTF-8"))
    val outX = dir.resolve("out.xml").toString
    Maw.execute(spark, Maw.parse(Seq(in.toString, "-o", outX)))
    val outC = dir.resolve("back.csv").toString
    Maw.execute(spark, Maw.parse(Seq(outX, "-o", outC)))
    val content = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outC)), "UTF-8")
    assert(content.linesIterator.next() == "a,b", content)
    assert(content.contains("1,x"), content)
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamingConcat.run(spark,
        graft.operators.Concat.Config(Seq(outX)),
        dir.resolve("s.csv").toString, Discovery.Csv,
        checkpoint = dir.resolve("ckpt").toString))
    assert(e.getMessage.contains("xml"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      graft.operators.Compact.run(spark, dir.toString, Discovery.Xml))
    assert(e2.getMessage.contains("xml"), e2.getMessage)
  }
}

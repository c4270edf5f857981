package graft

import graft.operators.Concat
import graft.sinks.Sink
import graft.sources.Discovery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ORC as a first-class source/sink format: detection, footer-schema probe,
  * typed round trip (exact types, unlike the text formats), mixed-format
  * concat, rolled parts, compression mapping, and the CLI drive with
  * --verify.
  */
class OrcSpec extends SparkSpec {

  test("format detection: .orc in, orc out-format flag and extension") {
    assert(Discovery.detectFormat("/x/a.orc").contains(Discovery.Orc))
    assert(Discovery.detectFormat("/x/a.ORC").contains(Discovery.Orc)) // case-insensitive like every extension
    assert(Discovery.detectFormat("/x/a.orc.gz").isEmpty) // internally compressed, no .gz variant
    assert(Discovery.outputFormat("out.orc", None) == Discovery.Orc)
    assert(Discovery.outputFormat("out.bin", Some("orc")) == Discovery.Orc)
  }

  test("parquet -> orc -> read-back round trip preserves values and exact types") {
    val dir = tmpDir("orc-rt")
    val orders = sf("orders")
    val out = dir.resolve("orders.orc").toString
    Sink.write(orders, Sink.Config(out, Discovery.Orc))
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(out)))
    val back = Concat.run(spark, Concat.Config(Seq(out)))
    // exact type round trip: long stays long, decimal stays decimal,
    // timestamp stays a timestamp type (ORC carries real types)
    val byName = back.schema.fields.map(f => f.name -> f.dataType).toMap
    val src = orders.schema.fields.map(f => f.name -> f.dataType).toMap
    src.foreach { case (n, dt) => assert(byName(n) == dt, s"column $n: ${byName(n)} != $dt") }
    assert(back.count() == orders.count())
    // value equality via the order-insensitive checksum both sides
    assert(Sink.rowChecksum(back.select(back.columns.sorted.map(col).toIndexedSeq: _*), None) ==
      Sink.rowChecksum(orders.select(orders.columns.sorted.map(col).toIndexedSeq: _*), None))
  }

  test("footer-schema probe agrees with spark.read.orc and powers a multi-file single-scan group") {
    val dir = tmpDir("orc-footer")
    val nation = sf("nation")
    val a = dir.resolve("a.orc").toString
    val b = dir.resolve("b.orc").toString
    Sink.write(nation, Sink.Config(a, Discovery.Orc))
    Sink.write(nation, Sink.Config(b, Discovery.Orc))
    val files = Discovery.discover(Seq(dir.toString))
    assert(files.map(_.format).distinct == Seq(Discovery.Orc))
    val probed = Concat.fileSchemas(spark, files, graft.sources.CsvSource.CsvOptions())
    assert(probed.toSet == Set(spark.read.orc(a).schema))
    // same-schema files collapse into one scan group: the concat plan has a
    // single relation, not one per file
    val plan = Concat.run(spark, Concat.Config(Seq(dir.toString)))
    assert(plan.count() == 2 * nation.count())
    val scans = plan.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected one merged ORC scan, got ${scans.size}")
  }

  test("mixed-format concat: orc + parquet + csv unify into one table") {
    val dir = tmpDir("orc-mixed")
    val region = sf("region")
    val orc = dir.resolve("r.orc").toString
    Sink.write(region, Sink.Config(orc, Discovery.Orc))
    val pq = dir.resolve("r.parquet").toString
    Sink.write(region, Sink.Config(pq, Discovery.Parquet))
    val csv = writeFile(dir, "extra.csv",
      "r_regionkey,r_name\n99,ORC LAND\n")
    val merged = Concat.run(spark, Concat.Config(Seq(orc, pq, csv)))
    assert(merged.count() == 2 * region.count() + 1)
    assert(merged.where(col("r_name") === "ORC LAND").count() == 1)
    // CSV has no r_comment: null-injected, not dropped
    assert(merged.columns.sorted.toSeq == region.columns.sorted.toSeq)
  }

  test("compression flag maps onto ORC codecs (gzip -> zlib; zstd default)") {
    val dir = tmpDir("orc-comp")
    val nation = sf("nation")
    def codecOf(path: String): String = {
      val reader = org.apache.orc.OrcFile.createReader(
        new org.apache.hadoop.fs.Path(path),
        org.apache.orc.OrcFile.readerOptions(
          spark.sparkContext.hadoopConfiguration))
      try reader.getCompressionKind.name() finally reader.close()
    }
    val z = dir.resolve("z.orc").toString
    Sink.write(nation, Sink.Config(z, Discovery.Orc)) // default zstd
    assert(codecOf(z) == "ZSTD")
    val g = dir.resolve("g.orc").toString
    Sink.write(nation, Sink.Config(g, Discovery.Orc, compression = "gzip"))
    assert(codecOf(g) == "ZLIB")
    val n = dir.resolve("n.orc").toString
    Sink.write(nation, Sink.Config(n, Discovery.Orc, compression = "none"))
    assert(codecOf(n) == "NONE")
  }

  test("rolled orc parts promote to -NNNN names and readBack globs them") {
    val dir = tmpDir("orc-roll")
    val orders = sf("orders")
    val out = dir.resolve("o.orc").toString
    Sink.write(orders, Sink.Config(out, Discovery.Orc, rollByRows = Some(400L),
      singleFile = false, preserveOrder = false))
    val parts = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(p => p.contains("o-") && p.endsWith(".orc"))
    assert(parts.length > 1, s"expected rolled parts, got ${parts.mkString(",")}")
    val back = Sink.readBack(spark, out, Discovery.Orc)
    assert(back.count() == orders.count())
  }

  test("CLI: csv -> orc with --verify, then orc -> parquet with --verify") {
    val dir = tmpDir("orc-cli")
    val csv = writeFile(dir, "in.csv",
      "id,name,score\n1,ada,9.5\n2,grace,8.25\n3,,7.0\n")
    val orcOut = dir.resolve("out.orc").toString
    cli.Maw.execute(spark, cli.Maw.parse(
      Seq(csv, "-o", orcOut, "--verify", "-q")))
    val back = spark.read.orc(orcOut)
    assert(back.count() == 3)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("score").dataType == DoubleType)
    val pqOut = dir.resolve("out.parquet").toString
    cli.Maw.execute(spark, cli.Maw.parse(
      Seq(orcOut, "-o", pqOut, "--verify", "-q")))
    assert(spark.read.parquet(pqOut).count() == 3)
  }

  test("partitioned orc tree writes col=value directories and prunes on read") {
    val dir = tmpDir("orc-part")
    val docs = sf("documents")
    val out = dir.resolve("docs-tree").toString
    Sink.write(docs, Sink.Config(out, Discovery.Orc, partitionBy = Seq("lang")))
    val langs = java.nio.file.Files.list(java.nio.file.Paths.get(out)).toArray
      .map(_.toString).filter(_.contains("lang="))
    assert(langs.nonEmpty)
    val back = Sink.readBack(spark, out, Discovery.Orc)
    assert(back.count() == docs.count())
    // partition pruning: a lang filter reaches PartitionFilters, not a scan
    val one = back.where(col("lang") === "en")
    val expl = one.queryExecution.executedPlan.toString
    assert(expl.contains("PartitionFilters: [isnotnull(lang"), expl.take(500))
  }

  test("streaming: csv stream -> orc sink, resumable, reads back typed") {
    val dir = tmpDir("orc-stream")
    val in = dir.resolve("in")
    java.nio.file.Files.createDirectories(in)
    writeFile(in, "a.csv", "k,v\n1,x\n2,y\n")
    val out = dir.resolve("out").toString
    val cp = dir.resolve("cp").toString
    graft.streaming.StreamingConcat.run(spark,
      Concat.Config(Seq(in.toString)), out, Discovery.Orc, cp)
    val got = spark.read.orc(out)
    assert(got.count() == 2)
    assert(got.schema("k").dataType == LongType)
    // resume: a late file is picked up, already-seen files are not re-read
    writeFile(in, "b.csv", "k,v\n3,z\n")
    graft.streaming.StreamingConcat.run(spark,
      Concat.Config(Seq(in.toString)), out, Discovery.Orc, cp)
    assert(spark.read.orc(out).count() == 3)
  }
}

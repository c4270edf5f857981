package graft

import graft.operators.Concat
import graft.sinks.Sink
import graft.sources.Discovery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro as a first-class source/sink format (p20): detection, the
  * header-schema probe (Avro carries its writer schema in the container
  * header — the front-of-file analog of the parquet/orc footer probes),
  * typed round trip, mixed-format concat, codec mapping, rolled parts,
  * compaction of an avro landing tree, the CLI drive, and the streaming
  * source/sink. Spark 4 bundles the formerly-external avro FileFormat in
  * spark-sql minus only the short-name registration, so everything goes
  * through [[Discovery.AvroClass]].
  */
class AvroSpec extends SparkSpec {

  test("format detection: .avro in, avro out-format flag and extension") {
    assert(Discovery.detectFormat("/x/a.avro").contains(Discovery.Avro))
    assert(Discovery.detectFormat("/x/a.AVRO").contains(Discovery.Avro))
    assert(Discovery.detectFormat("/x/a.avro.gz").isEmpty) // internally compressed, no .gz variant
    assert(Discovery.outputFormat("out.avro", None) == Discovery.Avro)
    assert(Discovery.outputFormat("out.bin", Some("avro")) == Discovery.Avro)
  }

  test("parquet -> avro -> read-back round trip preserves values and types") {
    val dir = tmpDir("avro-rt")
    val docs = sf("documents")
    val out = dir.resolve("docs.avro").toString
    Sink.write(docs, Sink.Config(out, Discovery.Avro))
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(out)))
    val back = Concat.run(spark, Concat.Config(Seq(out)))
    val byName = back.schema.fields.map(f => f.name -> f.dataType).toMap
    val src = docs.schema.fields.map(f => f.name -> f.dataType).toMap
    src.foreach { case (n, dt) => assert(byName(n) == dt, s"column $n: ${byName(n)} != $dt") }
    assert(back.count() == docs.count())
    assert(Sink.rowChecksum(back.select(back.columns.sorted.map(col).toIndexedSeq: _*), None) ==
      Sink.rowChecksum(docs.select(docs.columns.sorted.map(col).toIndexedSeq: _*), None))
  }

  test("header-schema probe agrees with the spark avro read and merges same-schema scans") {
    val dir = tmpDir("avro-header")
    val nation = sf("nation")
    val a = dir.resolve("a.avro").toString
    val b = dir.resolve("b.avro").toString
    Sink.write(nation, Sink.Config(a, Discovery.Avro))
    Sink.write(nation, Sink.Config(b, Discovery.Avro))
    val files = Discovery.discover(Seq(dir.toString))
    assert(files.map(_.format).distinct == Seq(Discovery.Avro))
    val probed = Concat.fileSchemas(spark, files, graft.sources.CsvSource.CsvOptions())
    assert(probed.toSet ==
      Set(spark.read.format(Discovery.AvroClass).load(a).schema))
    val plan = Concat.run(spark, Concat.Config(Seq(dir.toString)))
    assert(plan.count() == 2 * nation.count())
    val scans = plan.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected one merged Avro scan, got ${scans.size}")
  }

  test("mixed-format concat: avro + parquet + csv unify into one table") {
    val dir = tmpDir("avro-mixed")
    val region = sf("region")
    val av = dir.resolve("r.avro").toString
    Sink.write(region, Sink.Config(av, Discovery.Avro))
    val pq = dir.resolve("r.parquet").toString
    Sink.write(region, Sink.Config(pq, Discovery.Parquet))
    val csv = writeFile(dir, "extra.csv",
      "r_regionkey,r_name\n99,AVRO LAND\n")
    val merged = Concat.run(spark, Concat.Config(Seq(av, pq, csv)))
    assert(merged.count() == 2 * region.count() + 1)
    assert(merged.where(col("r_name") === "AVRO LAND").count() == 1)
    assert(merged.columns.sorted.toSeq == region.columns.sorted.toSeq)
  }

  test("compression flag maps onto avro codecs (gzip -> deflate, zstd -> zstandard)") {
    val dir = tmpDir("avro-comp")
    val nation = sf("nation")
    def codecOf(path: String): String = {
      val rdr = new org.apache.avro.file.DataFileReader(
        new java.io.File(path),
        new org.apache.avro.generic.GenericDatumReader[AnyRef]())
      try Option(rdr.getMetaString("avro.codec")).getOrElse("null")
      finally rdr.close()
    }
    val z = dir.resolve("z.avro").toString
    Sink.write(nation, Sink.Config(z, Discovery.Avro)) // default zstd
    assert(codecOf(z) == "zstandard")
    val g = dir.resolve("g.avro").toString
    Sink.write(nation, Sink.Config(g, Discovery.Avro, compression = "gzip"))
    assert(codecOf(g) == "deflate")
    val n = dir.resolve("n.avro").toString
    Sink.write(nation, Sink.Config(n, Discovery.Avro, compression = "none"))
    assert(codecOf(n) == "null")
  }

  test("rolled avro parts promote to -NNNN names and readBack globs them") {
    val dir = tmpDir("avro-roll")
    val orders = sf("orders")
    val out = dir.resolve("o.avro").toString
    Sink.write(orders, Sink.Config(out, Discovery.Avro, rollByRows = Some(400L),
      singleFile = false, preserveOrder = false))
    val parts = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(p => p.contains("o-") && p.endsWith(".avro"))
    assert(parts.length > 1, s"expected rolled parts, got ${parts.mkString(",")}")
    val back = Sink.readBack(spark, out, Discovery.Avro)
    assert(back.count() == orders.count())
  }

  test("compaction folds a small-files avro landing tree and keeps every row") {
    val dir = tmpDir("avro-compact")
    val tree = dir.resolve("tree")
    java.nio.file.Files.createDirectories(tree)
    val docs = sf("documents").limit(200)
    // a many-small-files landing zone (the Kafka-archiver shape)
    for (i <- 0 until 4)
      Sink.write(docs.where(col("doc_id") % 4 === i),
        Sink.Config(tree.resolve(s"drop$i.avro").toString, Discovery.Avro))
    val before = java.nio.file.Files.list(tree).toArray.map(_.toString)
      .count(p => p.endsWith(".avro") && !new java.io.File(p).getName.startsWith("."))
    assert(before == 4)
    val rows = spark.read.format(Discovery.AvroClass).load(tree.toString).count()
    graft.operators.Compact.run(spark, tree.toString, Discovery.Avro,
      targetFileBytes = 1L << 30)
    val after = java.nio.file.Files.list(tree).toArray.map(_.toString)
      .filter(p => p.endsWith(".avro") && !new java.io.File(p).getName.startsWith("."))
    assert(after.length == 1, s"expected one compacted file, got ${after.mkString(",")}")
    assert(spark.read.format(Discovery.AvroClass).load(tree.toString).count() == rows)
  }

  test("CLI: csv -> avro with --verify, then avro -> parquet with --verify") {
    val dir = tmpDir("avro-cli")
    val csv = writeFile(dir, "in.csv",
      "id,name,score\n1,ada,9.5\n2,grace,8.25\n3,,7.0\n")
    val avOut = dir.resolve("out.avro").toString
    cli.Maw.execute(spark, cli.Maw.parse(
      Seq(csv, "-o", avOut, "--verify", "-q")))
    val back = spark.read.format(Discovery.AvroClass).load(avOut)
    assert(back.count() == 3)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("score").dataType == DoubleType)
    val pqOut = dir.resolve("out.parquet").toString
    cli.Maw.execute(spark, cli.Maw.parse(
      Seq(avOut, "-o", pqOut, "--verify", "-q")))
    assert(spark.read.parquet(pqOut).count() == 3)
  }

  test("streaming: avro stream source -> parquet, and csv -> avro sink, resumable") {
    val dir = tmpDir("avro-stream")
    val in = dir.resolve("in")
    java.nio.file.Files.createDirectories(in)
    Sink.write(sf("nation").limit(5),
      Sink.Config(in.resolve("n1.avro").toString, Discovery.Avro))
    val out = dir.resolve("out").toString
    val cp = dir.resolve("cp").toString
    graft.streaming.StreamingConcat.run(spark,
      Concat.Config(Seq(in.toString)), out, Discovery.Parquet, cp)
    assert(spark.read.parquet(out).count() == 5)
    // resume: a late avro file is picked up, already-seen files are not re-read
    Sink.write(sf("nation").limit(8),
      Sink.Config(in.resolve("n2.avro").toString, Discovery.Avro))
    graft.streaming.StreamingConcat.run(spark,
      Concat.Config(Seq(in.toString)), out, Discovery.Parquet, cp)
    assert(spark.read.parquet(out).count() == 13)
    // and the avro SINK leg: csv stream -> avro output
    val in2 = dir.resolve("in2")
    java.nio.file.Files.createDirectories(in2)
    writeFile(in2, "a.csv", "k,v\n1,x\n2,y\n")
    val out2 = dir.resolve("out2").toString
    graft.streaming.StreamingConcat.run(spark,
      Concat.Config(Seq(in2.toString)), out2, Discovery.Avro,
      dir.resolve("cp2").toString)
    val got = spark.read.format(Discovery.AvroClass).load(out2)
    assert(got.count() == 2)
    assert(got.schema("k").dataType == LongType)
  }
}

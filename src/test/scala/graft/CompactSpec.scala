package graft

import graft.operators.Compact
import graft.sinks.Sink
import graft.sources.Discovery
import org.apache.spark.sql.functions._

/** In-place small-file compaction: fewer files, same rows and values, hive
  * partitioning preserved verbatim, pre-swap row verification, and the CLI
  * drive.
  */
class CompactSpec extends SparkSpec {

  private def fileCount(dir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0
        else if (st.isDirectory) walk(st.getPath)
        else 1
      }.sum
    walk(root)
  }

  test("flat parquet tree: many small files -> few right-sized, values intact") {
    val d = tmpDir("compact-flat")
    val orders = sf("orders")
    val out = d.resolve("tree").toString
    // simulate micro-batch litter: 20 tiny files
    orders.repartition(20).write.parquet(out)
    assert(fileCount(out) == 20)
    val before = Sink.rowChecksum(
      orders.select(orders.columns.sorted.map(col).toIndexedSeq: _*), None)
    val st = Compact.run(spark, out, Discovery.Parquet)
    assert(st.filesBefore == 20 && st.filesAfter < 5,
      s"expected big file-count drop, got ${st.filesBefore} -> ${st.filesAfter}")
    assert(st.rows == orders.count())
    val back = spark.read.parquet(out)
    assert(Sink.rowChecksum(
      back.select(back.columns.sorted.map(col).toIndexedSeq: _*), None) == before)
    // no staging/old residue next to the compacted tree
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out + ".compact-tmp")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out + ".compact-old")))
  }

  test("hive-partitioned tree: layout and verbatim partition values preserved") {
    val d = tmpDir("compact-part")
    val out = d.resolve("tree").toString
    import spark.implicits._
    // string partition values that type inference would mangle ("007" -> 7)
    val df = (1 to 200).map(i => (i.toLong, s"v$i", if (i % 2 == 0) "007" else "b"))
      .toDF("id", "v", "grp")
    df.repartition(10).write.partitionBy("grp").parquet(out)
    val before = fileCount(out)
    val st = Compact.run(spark, out, Discovery.Parquet)
    assert(st.partitionColumns == Seq("grp"))
    assert(st.filesAfter < before)
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(out)).toArray
      .map(_.toString.split('/').last).filter(_.startsWith("grp=")).sorted
    assert(dirs.toSeq == Seq("grp=007", "grp=b"), dirs.mkString(","))
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    assert(back.where(col("grp") === "007").count() == 100)
  }

  test("target size controls output file count via the tree's own bytes/row") {
    val d = tmpDir("compact-size")
    val out = d.resolve("tree").toString
    sf("orders", "/root/testdata/sf0.01").repartition(16).write.parquet(out)
    val bytes = {
      val root = new org.apache.hadoop.fs.Path(out)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isFile)
        .filterNot(s => s.getPath.getName.startsWith("_")).map(_.getLen).sum
    }
    // a target of ~1/4 the tree size should land ~4 files (AQE/rounding slack)
    val st = Compact.run(spark, out, Discovery.Parquet, targetFileBytes = bytes / 4)
    assert(st.filesAfter >= 3 && st.filesAfter <= 6,
      s"expected ~4 files for a quarter-size target, got ${st.filesAfter}")
  }

  test("orc and jsonl trees compact too (jsonl parts carry the sink's .json names)") {
    val d = tmpDir("compact-fmt")
    val nation = sf("nation")
    val orc = d.resolve("orc-tree").toString
    nation.repartition(5).write.orc(orc)
    assert(Compact.detectTreeFormat(spark, orc) == Discovery.Orc)
    val st1 = Compact.run(spark, orc, Discovery.Orc)
    assert(st1.filesBefore == 5 && st1.filesAfter < 5)
    assert(spark.read.orc(orc).count() == nation.count())
    val js = d.resolve("json-tree").toString
    nation.repartition(5).write.option("ignoreNullFields", "false").json(js)
    assert(Compact.detectTreeFormat(spark, js) == Discovery.Jsonl)
    val st2 = Compact.run(spark, js, Discovery.Jsonl)
    assert(st2.filesAfter < 5)
    assert(spark.read.json(js).count() == nation.count())
  }

  test("CLI: --compact rewrites in place and reports stats") {
    val d = tmpDir("compact-cli")
    val out = d.resolve("tree").toString
    sf("region").repartition(8).write.parquet(out)
    cli.Maw.execute(spark, cli.Maw.parse(
      Seq(out, "--compact", "--target-file-size", "128m", "-q")))
    assert(fileCount(out) < 8)
    assert(spark.read.parquet(out).count() == sf("region").count())
  }

  test("CLI: --compact --verify checksums the tree across the rewrite") {
    val d = tmpDir("compact-verify")
    val out = d.resolve("tree").toString
    sf("nation").repartition(6).write.parquet(out)
    // must complete without throwing (the checksum path compares pre/post)
    cli.Maw.execute(spark, cli.Maw.parse(Seq(out, "--compact", "--verify", "-q")))
    assert(fileCount(out) < 6)
    assert(spark.read.parquet(out).count() == sf("nation").count())
  }

  test("refuses a tree holding non-format files the swap would destroy") {
    val d = tmpDir("compact-stray")
    val out = d.resolve("tree").toString
    sf("region").repartition(3).write.parquet(out)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "README.txt"), "user notes")
    val e = intercept[IllegalArgumentException](
      Compact.run(spark, out, Discovery.Parquet))
    assert(e.getMessage.contains("README.txt"))
    // the tree is untouched, stray file included (glob-filtered read: the
    // stray itself would fail a bare parquet scan, which is the point)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "README.txt")))
    assert(spark.read.option("pathGlobFilter", "*.parquet").parquet(out).count() ==
      sf("region").count())
    assert(fileCount(out) == 4) // 3 parts + the stray
  }

  test("size suffix parsing") {
    assert(cli.Maw.parseSize("1024") == 1024L)
    assert(cli.Maw.parseSize("128m") == 128L * 1024 * 1024)
    assert(cli.Maw.parseSize("2G") == 2L * 1024 * 1024 * 1024)
    assert(cli.Maw.parseSize("64K") == 64L * 1024)
    intercept[IllegalArgumentException](cli.Maw.parseSize("abc"))
    intercept[IllegalArgumentException](cli.Maw.parseSize("-5m"))
  }
}

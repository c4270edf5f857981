package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Input discovery: literal files, recursive directory walk, glob patterns,
  * `-` = stdin (spooled to a temp file — Spark has no stdin source).
  *
  * Mirrors `/root/reference/src/discover.rs:46-159`: dedup + lexicographic
  * sort for a deterministic processing order (discover.rs:88-90), format by
  * extension (discover.rs:20-28), unknown extensions skipped.
  */
object Discovery {

  sealed trait Format
  case object Csv extends Format
  case object Parquet extends Format
  /** Newline-delimited JSON — beyond the reference (csv/parquet only), the
    * de-facto LLM-corpus interchange format. See [[JsonSource]].
    */
  case object Jsonl extends Format
  /** ORC — beyond the reference, the other columnar warehouse format; Spark
    * reads/writes it natively (same engine surface as parquet), so the cost
    * of first-class support is plumbing, and warehouses routinely hold both.
    */
  case object Orc extends Format
  /** XML — beyond the reference; Spark 4 ships the (formerly spark-xml)
    * data source natively. Typed path only (rows under a `row` tag; no
    * byte fast path — XML has no line-delimited framing to splice). XML
    * 1.0 cannot represent control characters, so arbitrary binary-ish
    * text does not round-trip; the format exists for the
    * structured-record interchange case, not raw-corpus storage.
    */
  case object Xml extends Format
  /** Avro — beyond the reference; the Kafka-ecosystem row format. Spark
    * 4 bundles the (formerly external spark-avro) file format classes in
    * spark-sql minus only the short-name service registration, so the
    * scan/sink go through the fully-qualified [[AvroClass]]. Container
    * files are internally compressed (deflate/snappy/zstandard codecs in
    * the block headers) — no `.avro.gz` variant, like parquet/orc.
    */
  case object Avro extends Format

  /** The bundled Avro FileFormat's class name — `format("avro")` throws
    * (no DataSourceRegister entry in this distribution), the class works.
    */
  val AvroClass = "org.apache.spark.sql.avro.AvroFileFormat"

  final case class InputFile(path: String, format: Format, sizeBytes: Long)

  /** Extension-based format detection (discover.rs:20-28). Gzip-compressed
    * TEXT inputs (`.csv.gz`, `.jsonl.gz`, ...) detect as their inner format:
    * Spark's text scans decompress by extension natively, and the
    * driver-side inference samplers wrap a GZIPInputStream (see
    * [[isGzip]]). Parquet is internally compressed — a `.parquet.gz` is not
    * a thing this tool produces or reads.
    */
  def detectFormat(path: String): Option[Format] = {
    val lower0 = path.toLowerCase
    val lower = if (lower0.endsWith(".gz")) lower0.stripSuffix(".gz") else lower0
    if (lower.endsWith(".csv") || lower.endsWith(".tsv")) Some(Csv)
    else if (lower.endsWith(".parquet") && lower == lower0) Some(Parquet)
    // ORC is internally compressed, like parquet: no .orc.gz variant
    else if (lower.endsWith(".orc") && lower == lower0) Some(Orc)
    // Avro container files are internally compressed too: no .avro.gz
    else if (lower.endsWith(".avro") && lower == lower0) Some(Avro)
    // .xml.gz works like the other text formats: Spark's scan decompresses
    // by extension
    else if (lower.endsWith(".xml")) Some(Xml)
    // bare .json is deliberately NOT an input format: directory walks would
    // otherwise ingest configs / pretty-printed arrays that are not
    // line-delimited (they were skipped before JSONL existed, and must stay
    // skipped). Line-delimited corpora use .jsonl/.ndjson; -o out.json is
    // still honored by outputFormat below.
    else if (lower.endsWith(".jsonl") || lower.endsWith(".ndjson")) Some(Jsonl)
    else None
  }

  /** Is this input gzip-compressed (by extension, same rule Spark uses)? */
  def isGzip(path: String): Boolean = path.toLowerCase.endsWith(".gz")

  /** Output format: explicit flag > output extension > CSV default
    * (pipeline.rs:64-74).
    */
  def outputFormat(outPath: String, flag: Option[String]): Format = {
    require(!isGzip(outPath),
      s"compressed output is not supported: $outPath — write plain .csv/.jsonl, " +
        "or parquet with --compression")
    flag.map(_.toLowerCase) match {
      case Some("parquet")          => Parquet
      case Some("csv")              => Csv
      case Some("jsonl" | "json")   => Jsonl
      case Some("orc")              => Orc
      case Some("xml")              => Xml
      case Some("avro")             => Avro
      case Some(other)             => throw new IllegalArgumentException(s"unknown format $other")
      case None =>
        detectFormat(outPath)
          .orElse(if (outPath.toLowerCase.endsWith(".json")) Some(Jsonl) else None)
          .getOrElse(Csv)
    }
  }

  private def isGlob(s: String): Boolean = s.exists("*?[{".contains(_))

  /** Directory-walk behavior (discover.rs:29-44 DiscoveryConfig):
    * `recursive=false` limits the walk to a directory's direct children
    * (`--no-recursive`, cli.rs:102-103); `followSymlinks` opts into
    * traversing links (`--follow-symlinks`, cli.rs:106-107 — off by
    * default, like the reference's WalkDir).
    */
  final case class Options(recursive: Boolean = true, followSymlinks: Boolean = false)

  def discover(inputs: Seq[String], opts: Options = Options()): Seq[InputFile] = {
    val found = inputs.flatMap {
      case "-"                  => spoolStdin().toSeq
      case g if isGlob(g)       => expandGlob(g, opts)
      case p =>
        val path = Paths.get(p)
        if (Files.isDirectory(path)) walkDir(path, opts)
        else if (Files.isRegularFile(path)) classify(path).toSeq
        else throw new IllegalArgumentException(s"input not found: $p")
    }
    // dedup + lexicographic sort => deterministic union order (discover.rs:88-90)
    found.groupBy(_.path).map(_._2.head).toSeq.sortBy(_.path)
  }

  private def classify(p: Path): Option[InputFile] =
    detectFormat(p.toString).map(f => InputFile(p.toString, f, Files.size(p)))

  /** Regular files under `root` (depth-bounded), in visit order.
    * `walkFileTree` instead of `Files.walk`: a symlink cycle under
    * FOLLOW_LINKS is SKIPPED via visitFileFailed where Files.walk's stream
    * throws mid-iteration and aborts the whole discovery; and without
    * followSymlinks, each file is classified by its own (link) attributes,
    * so a file symlink is skipped exactly like the reference's WalkDir
    * (walkdir without follow_links yields it as a symlink, not a file) —
    * `Files.isRegularFile(p)` would follow it regardless of the flag.
    */
  private def regularFilesUnder(root: Path, opts: Options, depth: Int): Seq[Path] = {
    import java.nio.file.{FileVisitOption, FileVisitResult, SimpleFileVisitor}
    val out = scala.collection.mutable.ListBuffer.empty[Path]
    val fvOpts =
      if (opts.followSymlinks) java.util.EnumSet.of(FileVisitOption.FOLLOW_LINKS)
      else java.util.EnumSet.noneOf(classOf[FileVisitOption])
    Files.walkFileTree(root, fvOpts, depth, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path,
          attrs: java.nio.file.attribute.BasicFileAttributes): FileVisitResult = {
        if (attrs.isRegularFile) out += f
        FileVisitResult.CONTINUE
      }
      override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
        FileVisitResult.CONTINUE // unreadable entry or symlink loop: skip it
    })
    out.toList
  }

  private def walkDir(dir: Path, opts: Options): Seq[InputFile] = {
    val depth = if (opts.recursive) Int.MaxValue else 1
    regularFilesUnder(dir, opts, depth).flatMap(classify)
  }

  private def expandGlob(pattern: String, opts: Options): Seq[InputFile] = {
    val p = Paths.get(pattern)
    val parent = {
      // deepest non-glob prefix directory
      var base = p.getParent
      while (base != null && isGlob(base.toString)) base = base.getParent
      if (base == null) Paths.get(".") else base
    }
    val matcher = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$pattern")
    // Relative matching must use the pattern MINUS the non-glob parent prefix:
    // matching the full pattern against a parent-relative path over-includes
    // when a subdirectory repeats the base directory's name (pattern
    // 'data/*.csv' + file 'data/data/x.csv' relativizes to 'data/x.csv',
    // which the full pattern would wrongly match).
    val relPattern = {
      val parentStr = parent.toString
      if (parentStr != "." && pattern.startsWith(parentStr + "/"))
        pattern.substring(parentStr.length + 1)
      else pattern
    }
    val relMatcher = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$relPattern")
    if (!Files.isDirectory(parent)) return Nil
    // globs always search the full subtree (the pattern itself bounds depth,
    // discover.rs:132-139); only symlink behavior applies here
    // match the raw path AND the parent-relative path: a bare-filename
    // pattern like *.csv never matches the ./-prefixed paths the walk
    // yields ('*' does not cross '/'), so "graft '*.csv'" would find nothing
    def matches(f: java.nio.file.Path): Boolean =
      matcher.matches(f) || {
        val rel = try parent.relativize(f) catch {
          case _: IllegalArgumentException => f
        }
        relMatcher.matches(rel)
      }
    regularFilesUnder(parent, opts.copy(recursive = true), Int.MaxValue)
      .filter(matches).flatMap(classify)
  }

  /** `-` input: spool stdin to a temp file (discover.rs:53-60 reads stdin
    * directly; Spark needs a file). Assumed CSV, as in the reference.
    */
  private def spoolStdin(): Option[InputFile] = {
    val tmp = Files.createTempFile("graft-stdin-", ".csv")
    Files.copy(System.in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.toFile.deleteOnExit()
    classify(tmp)
  }
}

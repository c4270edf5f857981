package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XML reading on Spark 4's built-in XML data source (the upstreamed
  * spark-xml) — beyond the reference, the structured-record interchange
  * format. Same design as [[CsvSource]]/[[JsonSource]]:
  *
  *   - schema resolution is a DRIVER-SIDE bounded sample (`--infer-rows`,
  *     shared knob): a StAX stream over the first N `<row>` elements, no
  *     Spark jobs — with many input files this is O(files) cheap probes,
  *     not O(files) job round-trips;
  *   - type inference uses the same i64 -> f64 -> bool -> string precedence
  *     as CSV ([[CsvSource.inferColumnType]]), so a value types identically
  *     whether it arrived in a .csv or a .xml;
  *   - the typed scan reads one-or-many same-schema files in ONE reader
  *     with the resolved schema; PERMISSIVE => parse failure -> null.
  *
  * Scope: FLAT rows (each `<row>` child element is a column; nested
  * elements and attributes are out of scope for the sampler — the sink
  * writes flat rows, and concat-unification is column-oriented). XML 1.0
  * cannot represent control characters, so raw-corpus text with exotic
  * bytes does not round-trip — this format is for structured records.
  * `.xml.gz` decompresses by extension like the other text formats.
  */
object XmlSource {

  final case class XmlOptions(
      rowTag: String = "row",
      inferRows: Int = 1000,
      inferTypes: Boolean = true)

  def read(spark: SparkSession, path: String, opts: XmlOptions = XmlOptions()): DataFrame =
    readPaths(spark, Seq(path), opts, Some(resolveSchema(spark, path, opts)))

  /** Driver-side bounded sample: StAX over the first `inferRows` row
    * elements straight off the (Hadoop) filesystem. Returns the union of
    * observed field names (first-seen order) with inferred types. A field
    * absent from a row samples as absent (not empty string), matching the
    * scan's null-fill for missing elements.
    */
  def resolveSchema(spark: SparkSession, path: String, opts: XmlOptions): StructType = {
    val (names, values) = sampleRows(spark, path, opts)
    StructType(names.map { n =>
      val t =
        if (!opts.inferTypes) StringType
        else CsvSource.inferColumnType(values(n).filter(_ != null))
      StructField(n, t, nullable = true)
    })
  }

  /** Typed scan of one-or-many same-schema XML files in ONE reader. */
  def readPaths(spark: SparkSession, paths: Seq[String], opts: XmlOptions,
      resolvedSchema: Option[StructType] = None): DataFrame = {
    // a directory passed straight to the scan would sweep EVERY member file
    // (a stray non-XML member parses as PERMISSIVE nulls) while the sampler
    // reads only the first .xml member — expand directories to their XML
    // members so scan and sampler agree on the file set. Paths that already
    // carry an XML extension (the Concat/Discovery case: always resolved
    // regular files) skip the existence RPC entirely, so 10^5 discovered
    // inputs cost zero extra driver round-trips; only extension-less paths
    // (directories, by convention) pay one stat each. Glob patterns can't be
    // stat'd (getFileStatus throws on the literal pattern) — expand them via
    // globStatus, then treat each match like a directly-passed path.
    // Directory members must carry an .xml extension to be scanned.
    val expanded = paths.flatMap { p =>
      val hPath = new org.apache.hadoop.fs.Path(p)
      // glob check FIRST: the most natural glob form is `dir/*.xml`, whose
      // getName ('*.xml') matches the xml extension — the extension branch
      // would pass the literal pattern to the sampler's getFileStatus and
      // throw FileNotFoundException instead of expanding it
      if (p.exists(c => c == '*' || c == '?' || c == '[' || c == '{')) {
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val matches = Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Seq.empty)
        require(matches.nonEmpty, s"glob matched no files: $p")
        // globStatus already returned each match's FileStatus — branch on
        // it directly; re-statting would double the driver round-trips on
        // exactly the large-discovery path this block exists to keep cheap
        matches.flatMap { st =>
          if (st.isDirectory) xmlMembers(fs, st.getPath).map(_.toString)
          else Seq(st.getPath.toString)
        }
      } else if (Discovery.detectFormat(hPath.getName).contains(Discovery.Xml)) Seq(p)
      else {
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.getFileStatus(hPath).isDirectory) xmlMembers(fs, hPath).map(_.toString)
        else Seq(p)
      }
    }
    require(expanded.nonEmpty, s"no xml files under ${paths.mkString(",")}")
    val schema = resolvedSchema.getOrElse(resolveSchema(spark, expanded.head, opts))
    // NullType isn't a valid parser type (all-null sampled column): read as
    // string, project to true null columns below — CsvSource's convention
    val parserSchema = StructType(schema.fields.map(f =>
      f.copy(dataType = if (f.dataType == NullType) StringType else f.dataType,
        nullable = true)))
    val typed = spark.read
      .format("xml")
      .schema(parserSchema)
      .option("rowTag", opts.rowTag)
      // fidelity like the CSV scan's ignoreLeading/TrailingWhiteSpace=false:
      // Spark's XML reader TRIMS element text by default, which would
      // silently alter whitespace-padded values on a pure concat (and
      // disagree with the StAX sampler, which never trims)
      .option("ignoreSurroundingSpaces", "false")
      .option("mode", "PERMISSIVE")
      .load(expanded: _*)
    typed.select(schema.fieldNames.toIndexedSeq.map { n =>
      if (schema(n).dataType == NullType) lit(null).as(n)
      else col(graft.schema.SchemaUnifier.quoted(n))
    }: _*)
  }

  /** (field names in first-seen order, field -> sampled values incl. nulls
    * for rows where the field is missing). StAX pull parsing: only START/
    * END/CHARACTERS events, constant memory, stops at `inferRows` rows.
    */
  /** A directory's XML member files (by [[Discovery.detectFormat]]),
    * name-sorted — the ONE member-selection rule the scan expansion and
    * the schema sampler share, so they agree by construction.
    */
  private def xmlMembers(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    fs.listStatus(dir).map(_.getPath)
      .filter(p => Discovery.detectFormat(p.getName).contains(Discovery.Xml))
      .sortBy(_.getName).toIndexedSeq

  private def sampleRows(spark: SparkSession, path: String,
      opts: XmlOptions): (Seq[String], Map[String, Seq[String]]) = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(hPath).isDirectory)
        xmlMembers(fs, hPath).headOption
          .getOrElse(throw new IllegalArgumentException(s"no xml files under $path"))
      else hPath
    val in: java.io.InputStream =
      if (Discovery.isGzip(file.toString)) new java.util.zip.GZIPInputStream(fs.open(file))
      else fs.open(file)
    val factory = XMLInputFactory.newInstance()
    // the sampler parses UNTRUSTED input: no DTDs, no external entities
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(in)
    val names = scala.collection.mutable.LinkedHashSet.empty[String]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    try {
      var inRow = false
      var field: String = null
      val sb = new StringBuilder
      var depth = 0 // element depth relative to the row element
      var cur = scala.collection.mutable.Map.empty[String, String]
      while (reader.hasNext && rows.length < opts.inferRows) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val ln = reader.getLocalName
            if (!inRow && ln == opts.rowTag) { inRow = true; depth = 0; cur.clear() }
            else if (inRow) {
              depth += 1
              if (depth == 1) { field = ln; sb.clear() }
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inRow && depth == 1 && field != null) sb.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val ln = reader.getLocalName
            if (inRow && depth == 0 && ln == opts.rowTag) {
              inRow = false
              rows += cur.toMap
            } else if (inRow) {
              if (depth == 1 && field != null) {
                names += field
                cur(field) = sb.toString
                field = null
              }
              depth -= 1
            }
          case _ => ()
        }
      }
    } finally {
      reader.close()
      in.close()
    }
    val byField = names.toSeq.map { n =>
      n -> rows.toSeq.map(r => r.getOrElse(n, null))
    }.toMap
    (names.toSeq, byField)
  }
}

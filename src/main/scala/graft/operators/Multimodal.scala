package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media travels as an opaque `binary` payload plus a typed metadata struct.
  * Images are REAL: [[fromTextPng]] renders a deterministic synthetic PNG
  * per row (pixels derived from the text fixture) and [[extractFeatures]]
  * decodes payloads with `javax.imageio` — an actual codec pass, zero extra
  * dependencies. PNG is lossless, so the decoded raster is byte-exact and
  * the pixel-lane features stay engine-reproducible (the driver's DuckDB
  * oracle recomputes them from the text bytes the pixels were built from).
  * Non-image payloads ([[fromText]]) keep the opaque-binary contract:
  * metadata and frame windows, no decode.
  */
object Multimodal {

  // ImageIO's stream cache defaults to DISK: every encode/decode spools
  // through a temp FILE (FileCache*ImageStream), which serializes
  // concurrent codec passes on filesystem traffic — measured here as a
  // 30x executor-time blowup the moment the decode pass ran 32-wide
  // (6 s single-task -> 200 s at 32 tasks for the same 6k images).
  // Memory-backed streams are strictly better for in-memory byte-array
  // payloads at any scale (the payloads already fit on the heap). Set
  // once per JVM at operator load; encode/decode output is byte-identical.
  ImageIO.setUseCache(false)

  val ImgW = 16
  val ImgH = 16

  /** Ensure at least session-parallelism partitions before an expensive
    * per-row codec pass (round-20 optimization, guide §2.5 "input skew:
    * one huge unsplittable file ... repartition immediately after the
    * read"): a media table built from ONE small parquet file arrives as a
    * single scan split, so the ImageIO encode/decode pass — the m-family's
    * dominant cost — ran on 1-3 cores of 32 (m02 measured 2 tasks, wall ==
    * executor time). The shuffle moves only the slim pre-encode text rows,
    * never the rendered payloads, and is skipped when the input already
    * carries enough splits (a 100 TB scan does — bumping it here would ADD
    * a full-corpus shuffle). Round-robin repartition is retry-deterministic
    * (sortBeforeRepartition is on), and every downstream consumer is
    * per-row or keyed, so results are partitioning-independent.
    */
  private def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  val mediaSchema: StructType = StructType(Seq(
    // nullable: an id that is null (or fails the Long cast) flows through as
    // a null id rather than NPE-ing the task on Row.getLong
    StructField("media_id", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Wrap any (id, string) table as an opaque media table: payload = utf-8
    * bytes, meta derived from content. The binary-column plumbing for
    * formats we have no codec for (audio/video).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(df).select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "utf-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        pmod(length(col(textCol)), lit(1920)).cast(IntegerType).as("width"),
        pmod(length(col(textCol)), lit(1080)).cast(IntegerType).as("height"),
        length(col(textCol)).cast(LongType).as("duration_ms")).as("meta"))

  /** Deterministic synthetic PNG: [[ImgW]]x[[ImgH]] 8-bit grayscale where
    * pixel i (row-major) is utf-8 byte `i mod len` of the text (0 for empty
    * text). Lossless encoding, so a decoder recovers the exact gray levels
    * — which is what lets an engine with no PNG codec (the oracle) verify
    * the decode path from the source text alone.
    *
    * `shift` brightens every pixel by that many levels (clamped at 255) —
    * the m05 fixture's "same image, adjusted" copy. `rgb = true` writes the
    * SAME gray levels through an RGB raster (R=G=B): a re-encode that
    * changes the payload bytes (color-type-2 PNG) but not the decoded
    * band-0 samples — the "same image, different file" copy exact-byte
    * dedup (m04) provably passes and perceptual dedup must catch.
    */
  def encodePng(bytes: Array[Byte], shift: Int = 0, rgb: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(ImgW, ImgH,
      if (rgb) BufferedImage.TYPE_INT_RGB else BufferedImage.TYPE_BYTE_GRAY)
    fillSamples(img.getRaster, ImgW, ImgH, bytes, shift)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** THE pixel-sampling convention (one definition — the DuckDB oracles
    * recompute pixels from the text bytes, so a second copy of this loop
    * drifting would silently break their parity): sample i (row-major) is
    * utf-8 byte `i mod len` (0 for null/empty), brightened by `shift` and
    * clamped at both ends (a negative shift must saturate at 0, not wrap
    * mod 256), written to every band (gray: 1; rgb: R=G=B; indexed: the
    * palette index).
    */
  private def fillSamples(raster: java.awt.image.WritableRaster, w: Int, h: Int,
      bytes: Array[Byte], shift: Int): Unit = {
    var i = 0
    while (i < w * h) {
      val raw = if (bytes == null || bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
      val px = math.max(0, math.min(raw + shift, 255))
      var b = 0
      while (b < raster.getNumBands) {
        raster.setSample(i % w, i / w, b, px)
        b += 1
      }
      i += 1
    }
  }

  /** Wrap a (id, string) table as an IMAGE media table: payload is a real
    * PNG rendered from the text. `mapPartitions`, not a per-row UDF, so a
    * codec that needs per-partition setup can hoist it before `rows.map`;
    * [[encodePng]] itself is allocation-per-row (ImageIO keeps no reusable
    * encoder state worth hoisting), the batched shape is what matters.
    */
  def fromTextPng(df: DataFrame, idCol: String, textCol: String,
      shift: Int = 0, rgb: Boolean = false): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    spread(df.select(col(idCol).cast(LongType).as("media_id"),
        encode(col(textCol), "utf-8").as("bytes")))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          Row(id, encodePng(bytes, shift, rgb),
            Row("image/png", ImgW, ImgH, null))
        }
      }(enc)
  }

  /** [[encodePng]] with an explicit raster size and an optional INDEXED
    * (palette, PNG color type 3) encoding — the shapes a crawled image
    * corpus actually contains and [[decodeImage]] must survive: thin
    * rasters below the dHash grid, and palette images whose band-0 samples
    * are palette indices, not gray levels.
    */
  def encodePngSized(bytes: Array[Byte], w: Int, h: Int,
      indexed: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(w, h,
      if (indexed) BufferedImage.TYPE_BYTE_INDEXED else BufferedImage.TYPE_BYTE_GRAY)
    fillSamples(img.getRaster, w, h, bytes, shift = 0)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Adversarial media fixture (m07): five payload variants per input row,
    * `media_id = id * 8 + variant index` so the per-variant outcome stays
    * keyed through [[extractFeatures]]/[[withDHash]] (which carry only the
    * id). Variants, in index order:
    *
    *   0 `valid`      — the standard 16x16 gray PNG;
    *   1 `truncated`  — a recognized PNG magic cut mid-header (the codec
    *                    throws; the contract is a null row, not a task
    *                    failure);
    *   2 `mislabeled` — mime says image/png, bytes are NOT an image. A
    *                    0x00 0x01 prefix guarantees no codec recognizes
    *                    the magic (raw crawl text could legitimately start
    *                    with 'BM'/'GIF87a' and make the outcome
    *                    content-dependent);
    *   3 `thin`       — a real 1x16 PNG: decodes fine, but sits under the
    *                    8x8 dHash grid (features yes, perceptual hash no);
    *   4 `palette`    — color-type-3 PNG: decodes, hashes (over palette
    *                    indices — deterministic, engine-local).
    */
  def adversarialMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", mediaSchema("meta").dataType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast(LongType).as("id"),
        encode(col(textCol), "utf-8").as("bytes"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          def vid(v: Int) =
            if (id == null) null else java.lang.Long.valueOf(id * 8 + v)
          val meta = Row("image/png", null, null, null)
          val png = encodePng(bytes)
          Seq(
            Row(vid(0), png, meta),
            Row(vid(1), png.take(20), meta),
            Row(vid(2), Array[Byte](0, 1) ++ Option(bytes).getOrElse(Array.empty[Byte]), meta),
            Row(vid(3), encodePngSized(bytes, 1, 16), meta),
            Row(vid(4), encodePngSized(bytes, 16, 16, indexed = true), meta))
        }
      }(enc)
  }

  /** 64-bit difference hash (dHash) over decoded gray levels — the
    * standard public perceptual fingerprint (average the image down to an
    * 8x8 grid, emit one bit per horizontal neighbor comparison): invariant
    * to re-encoding (bytes change, pixels don't) and to uniform brightness
    * shifts (every comparison shifts both sides), the two duplicate forms
    * exact-byte frame dedup (m04) passes. Bit (r*8+c) is 1 iff cell
    * (r,c)'s average exceeds cell (r,(c+1)%8)'s — wraparound keeps all 64
    * bits defined. Block averages use floor boundaries and CROSS-MULTIPLIED
    * integer sums (sumA*nB > sumB*nA), so the hash is exact arithmetic any
    * engine reproduces — no float resize, no rounding mode.
    */
  def dHash64(px: Array[Int], w: Int, h: Int): Long = {
    require(w >= 8 && h >= 8, s"dHash needs >= 8x8 pixels (got ${w}x$h)")
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val r = y * 8 / h
      var x = 0
      while (x < w) {
        val c = x * 8 / w
        sums(r * 8 + c) += px(y * w + x)
        counts(r * 8 + c) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val j = (i / 8) * 8 + (i % 8 + 1) % 8
      if (sums(i) * counts(j) > sums(j) * counts(i)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** (media_id, dhash) via the same batched decode pass as
    * [[extractFeatures]]: one codec init per partition, undecodable or
    * non-image payloads yield a null hash (they drop out of perceptual
    * pairing). Narrow — no shuffle; the pairing stage downstream owns the
    * banding discipline.
    */
  def withDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("dhash", LongType, nullable = true))))
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val isImage = Option(r.getAs[String]("mime")).exists(_.startsWith("image/"))
          val decoded = if (isImage) decodeImage(payload) else null
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          decoded match {
            case null => Row(id, null)
            case (w, h, px) if w >= 8 && h >= 8 => Row(id, dHash64(px, w, h))
            case _ => Row(id, null) // thumbnails under the grid: no hash
          }
        }
      }(enc)
  }

  /** Real image decode: `javax.imageio` parses the payload and returns
    * (width, height, gray levels row-major), or null for undecodable bytes.
    */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    if (payload == null || payload.isEmpty) return null
    // ImageIO.read returns null only for UNRECOGNIZED formats; a recognized
    // header with a corrupt body (truncated IDAT, bad CRC) throws IIOException
    // instead — which must also map to null, not a deterministic task failure
    // that aborts the whole job on one bad row
    val img = try ImageIO.read(new ByteArrayInputStream(payload)) catch {
      case scala.util.control.NonFatal(_) => null
    }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = raster.getSample(i % w, i / w, 0)
      i += 1
    }
    (w, h, px)
  }

  /** 8 pixel-lane features: lane j = integer sum of pixels at i % 8 == j,
    * normalized once at the end — exact and order-independent, so any
    * engine that can reproduce the pixels reproduces the features (float
    * accumulation would depend on addition order; floor(x+0.5) because
    * math.rint's half-to-even has no portable SQL equivalent).
    */
  def pixelLaneFeatures(px: Array[Int]): Array[Double] = {
    if (px == null || px.isEmpty) return Array.fill(8)(0.0)
    val sums = new Array[Long](8)
    var i = 0
    while (i < px.length) { sums(i % 8) += px(i); i += 1 }
    sums.map(s => math.floor(s.toDouble / 255.0 / px.length * 1e6 + 0.5) / 1e6)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Feature extraction over media batches via `mapPartitions` — the Scala
    * analog of a batched pandas UDF: one decoder init per partition, rows
    * streamed through it. Narrow (no shuffle); scales with input splits.
    * Image payloads get a REAL `javax.imageio` decode (features + decoded
    * dimensions); undecodable/non-image payloads yield nulls.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .mapPartitions { rows =>
        // decoder/codec contexts initialize here, once per partition —
        // never per row
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val isImage = Option(r.getAs[String]("mime")).exists(_.startsWith("image/"))
          val decoded = if (isImage) decodeImage(payload) else null
          val nBytes = if (payload == null) 0L else payload.length.toLong
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          decoded match {
            case null => Row(id, null, null, null, nBytes)
            case (w, h, px) =>
              Row(id, pixelLaneFeatures(px).toSeq, w, h, nBytes)
          }
        }
      }(enc)
  }

  /** "Frame sampling": carve `n` evenly spaced fixed-size byte windows from
    * the payload — the real version would seek keyframes; the plumbing
    * (explode to one row per frame, ordinal column) is the production shape.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame = {
    val stride = greatest((length(col("payload")) / n).cast(IntegerType), lit(1))
    media.select(col("media_id"), col("meta"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => col("payload").substr(i * stride + 1, lit(frameBytes)))))
      .select(col("media_id"), col("pos").as("frame_idx"), col("col").as("frame"), col("meta"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media travels as an opaque `binary` payload plus a typed metadata struct
  * — the Spark-side plumbing (schema, batch iteration, partitioning) is real
  * and tested; the actual codec step is STUBBED with a deterministic fake
  * because no image/audio libraries exist in this container. Swap
  * [[decodeStub]] for a real decoder (e.g. JavaCV / TwelveMonkeys) without
  * touching anything else.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Wrap any (id, string) table as a media table: payload = utf-8 bytes
    * (deterministic fake media), meta derived from content. Lets the whole
    * pipeline run end-to-end against the `documents` fixture.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "utf-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        pmod(length(col(textCol)), lit(1920)).cast(IntegerType).as("width"),
        pmod(length(col(textCol)), lit(1080)).cast(IntegerType).as("height"),
        length(col(textCol)).cast(LongType).as("duration_ms")).as("meta"))

  /** DECODE STUB — deterministic fake "decoded features" from raw bytes.
    * A real implementation decodes the payload (image pixels / audio PCM)
    * here; everything around it (batching, schema, null handling) is the
    * production shape.
    *
    * The fake accumulates INTEGER byte sums per lane and divides once at the
    * end: exact and order-independent, so the result is reproducible by any
    * engine (the driver's DuckDB oracle recomputes it from hex-decoded
    * bytes) — a float-per-byte accumulation would make the value depend on
    * addition order. Rounding is floor(x+0.5) for the same reason (math.rint
    * half-to-even has no portable SQL equivalent).
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0)
    val sums = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      sums(i % 8) += (payload(i) & 0xff).toLong
      i += 1
    }
    sums.map(s => math.floor(s.toDouble / 255.0 / payload.length * 1e6 + 0.5) / 1e6)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Feature extraction over media batches via `mapPartitions` — the Scala
    * analog of a batched pandas UDF: one decoder init per partition, rows
    * streamed through it. Narrow (no shuffle); scales with input splits.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec contexts are
        // expensive; never per-row)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0),
            decodeStub(payload).toSeq,
            if (payload == null) 0L else payload.length.toLong)
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

package graft.util

import org.apache.spark.sql.SparkSession

/** Fixture-drift guard: one stderr line per table with the RESOLVED Spark
  * schema, plus a loud diff when a column's type departs from the expected
  * set. Round 7 lost nine queries to a silent driver-side regeneration that
  * flipped `events.ts` from timestamp[ns] (read as BIGINT under
  * `nanosAsLong`) to timestamp[us] (TIMESTAMP_NTZ); this banner turns the
  * next such change into a one-minute diagnosis instead of a red round.
  *
  * Deliberately WARNS rather than aborts: a benign physical-type drift that
  * the adaptive readers (Q.normalizeTs, try_cast paths) absorb must not
  * cost the whole round's correctness rows.
  */
object FixtureSchemas {

  /** column -> types any supported fixture vintage may legitimately resolve
    * to. Single-element sets pin a type exactly; `events.ts` floats across
    * the vintages the adaptive reader handles.
    */
  private val Expected: Map[String, Map[String, Set[String]]] = Map(
    "events" -> Map(
      "event_id" -> Set("bigint"),
      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("bigint"),
      "event_type" -> Set("string"),
      "value" -> Set("double"),
      "props" -> Set("string")),
    "documents" -> Map(
      "doc_id" -> Set("bigint"),
      "text" -> Set("string"),
      "lang" -> Set("string"),
      "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Map(
      "vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>", "array<double>"),
      "label" -> Set("int", "bigint", "string")),
    "lineitem" -> Map(
      "l_orderkey" -> Set("bigint"),
      "l_quantity" -> Set("double", "bigint"),
      "l_extendedprice" -> Set("double"),
      "l_shipdate" -> Set("timestamp_ntz", "timestamp", "date")),
    "orders" -> Map(
      "o_orderkey" -> Set("bigint"),
      "o_custkey" -> Set("bigint"),
      "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp_ntz", "timestamp", "date")))

  private val Tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def banner(spark: SparkSession, sfDir: String, tag: String): Unit =
    for (t <- Tables) {
      val path = s"$sfDir/$t.parquet"
      try {
        val schema = spark.read.parquet(path).schema
        val line = schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        System.err.println(s"[$tag][schema] $t: $line")
        for {
          expected <- Expected.get(t).toSeq
          f <- schema
          want <- expected.get(f.name)
          if !want.contains(f.dataType.simpleString)
        } System.err.println(s"[$tag][SCHEMA DRIFT] $t.${f.name} resolved to " +
          s"${f.dataType.simpleString}, expected one of {${want.mkString(", ")}} — " +
          "a driver fixture regeneration likely changed the physical type; " +
          "check the adaptive readers (Q.normalizeTs) before trusting red queries")
      } catch {
        // NonFatal only: an OOM/interrupt must propagate, not be downgraded
        // to a one-line stderr note with the run continuing in a possibly
        // corrupted state
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[$tag][schema] $t: UNREADABLE (${e.getMessage})")
      }
    }
}

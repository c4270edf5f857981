package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** LLM-training-data pipeline operators (BASELINE.json "north_star"): text
  * analysis, dedup family (exact / fingerprint / MinHash / SimHash / n-gram
  * Jaccard / embedding), similarity search (brute-force + LSH ANN),
  * multimodal columns, streaming. SQL-expressible ones carry DuckDB oracles
  * (including the minhash/simhash pairs via the engine-portable md5
  * signature family); only the recall-gated ANN paths (s02/s03/s05) take
  * the driver's rows-only check, and those persist their measured per-query
  * recall as an output column so the artifact pins the quality number.
  */
object PipelineQueries {

  /** Per-batch wall seconds of the most recent st13 invocation, in batch
    * order — soak ATTRIBUTION only (written by the foreachBatch closure,
    * read by ScaleSoak after the query returns; harnesses are
    * single-threaded over legs). st13's product claim is per-batch cost
    * flat in corpus size / linear in batch rows; the total leg wall mixes
    * in the one-off index build, so the claim needs per-batch numbers.
    */
  @volatile var lastIngestBatchWalls: List[Double] = Nil

  /** Minimal English stopword list used by the quality queries (kept tiny and
    * explicit so the DuckDB oracle can mirror it verbatim).
    */
  private val StopWords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Planted boilerplate lines for t17 (see the query's comment). */
  private val BoilerFooter1 = "COPYRIGHT 2026 EXAMPLE CORP - ALL RIGHTS RESERVED"
  private val BoilerFooter2 = "subscribe to our newsletter for updates"

  /** documents + a mutated near-duplicate of each (first token dropped,
    * id offset by 1e6) — plants verifiable near-dups for the dedup family.
    */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val mutated = d.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    d.unionByName(mutated)
  }

  /** Run `f` with a scoped shuffle-partition count, restoring the session
    * setting after. Streaming stateful queries pay per-partition state-store
    * setup on EVERY micro-batch; at this corpus size 8 state partitions
    * halve the fixed cost vs 32 with identical results (at cluster scale
    * you'd size this to keys/executors instead).
    */
  private def withShufflePartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** SCALE-ADAPTIVE state-store partition count for a stateful streaming
    * leg (round-20 optimization, guide §2.2's many-tiny-blocks lesson
    * applied to state stores): a stateful operator creates one state-store
    * instance per shuffle partition, and EVERY micro-batch pays each
    * instance's fixed lifecycle cost (open/load, commit snapshot, close —
    * measured here at ~1 s per RocksDB instance per batch: st17 at the
    * session's 32 partitions burned 200 executor-seconds to move 5,000
    * rows; at 8 partitions the same query took 8). Sizing state partitions
    * to the core count is a production anti-pattern at BOTH ends — a tiny
    * stream drowns in per-instance overhead, a 100 TB stream wants stores
    * sized by throughput, not cores — so derive the count from the
    * stream's own row volume: one store per `SPARK_GRAFT_STATE_ROWS` rows
    * (default 8192 — below ~10k rows/store the fixed lifecycle cost
    * dominates any per-row work), clamped to [1, defaultParallelism] so
    * parallelism never exceeds what the session can schedule. Partition
    * count is pinned into the checkpoint at first start, so the derivation
    * is deterministic in the fixture (a restart re-derives the same
    * number; Spark re-reads it from the checkpoint anyway). Results are
    * partitioning-independent (hash by key), which the existing oracles
    * pin.
    */
  private def stateStorePartitions(s: SparkSession, approxRows: Long): Int = {
    val target = sys.env.getOrElse("SPARK_GRAFT_STATE_ROWS", "8192").toLong
    val need = math.ceil(math.max(0L, approxRows).toDouble / target).toLong
    math.max(1L, math.min(need, s.sparkContext.defaultParallelism.toLong)).toInt
  }

  /** Start `df` into a fresh memory sink, drain synchronously, and return
    * the sink table. The shared tail of every single-shot st query (st05/
    * st06 stay inline — they add source files between drains). The sink
    * name hex-encodes dir.hashCode (no math.abs Int.MinValue edge) under a
    * per-query prefix so concurrent sf dirs and queries never collide in
    * the shared session's table catalog.
    */
  private def drainToMemory(s: SparkSession, df: DataFrame, prefix: String,
      dir: String, mode: String): DataFrame = {
    val sinkName = s"${prefix}_sink_${java.lang.Integer.toHexString(dir.hashCode)}"
    val q = df.writeStream.outputMode(mode).format("memory").queryName(sinkName).start()
    try { q.processAllAvailable() } finally { q.stop() }
    s.table(sinkName)
  }

  /** Write `df` as ONE parquet file named `<stage>.parquet` inside `dir` —
    * the unit of arrival for a file-source micro-batch; calling this between
    * `processAllAvailable()` calls delivers data in a known batch order
    * (no modification-time races).
    */
  /** Wall seconds spent STAGING stream-input fixtures (addStreamFile's
    * coalesce(1) writes) since the last reset — ScaleSoak zeroes this
    * before a timed run and subtracts it from the corpus-sized streaming
    * legs (st16/st17), whose input staging is test harness, not operator
    * cost (round-15 verdict ask #7). Derived-subset legs (st13/st15) keep
    * staging in their walls as they always have — it is small there.
    */
  @volatile var lastStagingSecs: Double = 0.0

  private def addStreamFile(df: DataFrame, dir: java.nio.file.Path, stage: String): Unit = {
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val tStage0 = System.nanoTime()
    try addStreamFileInner(df, dir, stage)
    finally lastStagingSecs += (System.nanoTime() - tStage0) / 1e9
  }

  private def addStreamFileInner(df: DataFrame, dir: java.nio.file.Path, stage: String): Unit = {
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    // stage OUTSIDE the watched dir: a _tmp subdir inside it races the file
    // source's recursive listing (it can list the dir, then hit
    // FileNotFoundException when the staging tree is deleted mid-listing);
    // only the final atomic move may touch the watched tree
    val tmp = java.nio.file.Files.createTempDirectory(s"${dir.getFileName}_stage_$stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Using.resource(java.nio.file.Files.list(tmp)) { st =>
      st.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.toList.head
    }
    java.nio.file.Files.move(part, dir.resolve(s"$stage.parquet"))
    deleteRecursively(tmp)
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    graft.util.Fs.deleteRecursively(root)

  /** embeddings + 5 EXACT duplicates of each query vector (< 10), planted at
    * ids 100000 + query*10 + j. The recall-1 trick d05/d06 use for the dedup
    * LSH, applied to ANN: an identical vector hashes to the identical sign-LSH
    * bucket in EVERY table and assigns to the query's own nearest IVF cell, so
    * the approximate paths provably cannot miss the planted top-5 — which lets
    * the DuckDB brute-force-cosine oracle hash-check the whole approximate
    * pipeline INCLUDING its candidate stage (s06/s07). Ranking is
    * engine-stable: each planted copy's cosine is computed from the same bits
    * on both engines (all five tie exactly, broken by neighbor id) and sits
    * ~0.6 above the fixture's natural max cosine.
    */
  private def embWithPlantedDups(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val qs = e.where(col("vec_id") < 10)
    val planted = qs
      .select(col("vec_id"), col("embedding"), explode(sequence(lit(0), lit(4))).as("j"))
      .select((lit(100000L) + col("vec_id") * 10 + col("j")).as("vec_id"), col("embedding"))
    (e.unionByName(planted), qs)
  }

  /** s12's build-once serving index: bucketed assigned-corpus table +
    * persisted centroids, keyed by the fixture's identity (path, size,
    * mtime — a regenerated fixture gets a fresh key and rebuilds).
    * Returns (table name, loaded model). Within a session every
    * invocation after the first measures only centroid load + pruned
    * probe — the production serving shape where assignment is paid at
    * ingest. (Scope note: the default in-memory catalog forgets managed
    * tables at JVM exit, so build-once is per-JVM; on a real cluster with
    * a persistent metastore the same code is build-once per corpus.)
    */
  /** Fixture-identity key for build-once serving tables: dir + the backing
    * parquet's (length, mtime), so a regenerated fixture at the same path
    * gets fresh tables (a stale index would silently serve old data). One
    * definition for all five build-once families — a keying fix must land
    * once, not five times.
    */
  /** d20's planted off-grid offset: exactly 37 chars (off every 100-char
    * grid point), shared by the Spark fixture, the SQL oracle, and the spec
    * that proves d18's fixed grid misses the duplicate behind it.
    */
  private[graft] val cdcOffGridPrefix = "OFFGRID_PREFIX_0123456789_abcdefghij "

  /** m05/m06's shared signature table: base PNGs of every non-empty doc
    * plus the planted perceptual duplicates — brightness-shifted (+16,
    * clamped) at +2e6 and RGB-re-encoded (different bytes, identical
    * pixels) at +3e6 — decoded and dHashed; undecodable rows drop.
    */
  private def m05Sigs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .where(col("text").isNotNull && length(col("text")) > 0)
      .select("doc_id", "text")
    val base = Multimodal.fromTextPng(docs, "doc_id", "text")
    val shifted = Multimodal.fromTextPng(
      docs.where(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")),
      "doc_id", "text", shift = 16)
    val reenc = Multimodal.fromTextPng(
      docs.where(col("doc_id") % 9 === 4)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")),
      "doc_id", "text", rgb = true)
    // localCheckpoint: the ImageIO encode+decode pass is the dominant cost
    // and this frame's lineage appears on BOTH sides of the banded
    // self-join (and a third time in m06's singleton rejoin) — materialize
    // the slim (id, hash) table once instead of decoding 2-3x
    Multimodal.withDHash(base.unionByName(shifted).unionByName(reenc))
      .where(col("dhash").isNotNull)
      .localCheckpoint()
  }

  /** m05/m06's shared oracle CTEs: the dHash rebuilt from text bytes
    * (pixel i = utf-8 byte i mod len; +16 clamp for the shifted copies,
    * RGB re-encode changes nothing), 2x2 block sums, wraparound neighbor
    * comparisons, and the (hi, lo) 32-bit halves for portable popcounts.
    */
  private val m05SigCtes: String =
    s"""src AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS len
       |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
       |m AS (
       |  SELECT doc_id AS media_id, 0 AS shift, hx, len FROM src
       |  UNION ALL
       |  SELECT doc_id + 2000000, 16, hx, len FROM src WHERE doc_id % 7 = 3
       |  UNION ALL
       |  SELECT doc_id + 3000000, 0, hx, len FROM src WHERE doc_id % 9 = 4),
       |e AS (SELECT media_id, shift, len, hx, unnest(range(0, 256)) AS i FROM m),
       |v AS (
       |  SELECT media_id, i, least(
       |    (instr('0123456789ABCDEF', substr(hx, CAST(2*(i % len)+1 AS INTEGER), 1)) - 1) * 16 +
       |    (instr('0123456789ABCDEF', substr(hx, CAST(2*(i % len)+2 AS INTEGER), 1)) - 1)
       |    + shift, 255) AS px
       |  FROM e),
       |cells AS (
       |  SELECT media_id, CAST((i // 16 // 2) * 8 + (i % 16) // 2 AS INTEGER) AS cell,
       |         SUM(px) AS s
       |  FROM v GROUP BY 1, 2),
       |bits AS (
       |  SELECT a.media_id, a.cell AS idx,
       |         CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
       |  FROM cells a JOIN cells b
       |    ON a.media_id = b.media_id
       |   AND b.cell = (a.cell // 8) * 8 + (a.cell % 8 + 1) % 8),
       |sig AS (
       |  SELECT media_id,
       |    CAST(SUM(CASE WHEN idx >= 32 THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) AS hi,
       |    CAST(SUM(CASE WHEN idx < 32 THEN bit * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS lo
       |  FROM bits GROUP BY media_id)""".stripMargin

  /** Brute-force all-pairs Hamming over [[m05SigCtes]]'s sig table. */
  private val m05PairsSql: String =
    s"""SELECT a.media_id AS idA, b.media_id AS idB,
       |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
       |  FROM sig a JOIN sig b ON a.media_id < b.media_id""".stripMargin

  /** m05's full brute-force replay — the dHash from text bytes, all
    * pairs, Hamming <= 4. ONE definition shared by the one-shot m05 and
    * the incrementally-maintained st24.
    */
  private lazy val perceptualPairsOracle: String =
    s"""WITH $m05SigCtes
       |SELECT idA, idB, hamming FROM ($m05PairsSql)
       |WHERE hamming <= 4 ${orderSql("idA", "idB", "hamming")}""".stripMargin

  /** The d20 chunker's rolling polynomial in nested stepwise-mod form —
    * the exact arithmetic [[graft.expressions.CdcSpans]] folds, kept
    * INT64-safe under DuckDB's strict overflow checking (each partial is
    * reduced mod 1048573 before the next multiply-by-257).
    */
  private val cdcPolySql: String =
    (0 until 8).foldLeft("0")((acc, k) =>
      s"(($acc * 257 + unicode(substr(text, i - ${7 - k}, 1))) % 1048573)")

  private def fixtureKey(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    java.lang.Integer.toHexString(
      (dir + ":" + f.length + ":" + f.lastModified).hashCode)
  }

  private def s12ServeIndex(s: SparkSession, dir: String,
      corpus: DataFrame): (String, graft.operators.IvfIndex.Model) = {
    // staged-swap versioned: the bucketed table AND its model parquet share
    // one versioned name (model at `<name>_model`), committed atomically
    // after both are written. Build-once is still per-JVM (the in-memory
    // catalog forgets managed tables across JVMs while locations survive) —
    // a fresh JVM builds a NEW version and a sibling session's live reader
    // keeps its old one (retention keeps the newest two committed versions).
    val key = fixtureKey(dir, "embeddings")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
    var model: graft.operators.IvfIndex.Model = null
    val name = graft.util.VersionedTable.ensure(s, "s12_", s"s12_ivf_serve_$key",
      build = n => {
        val m = graft.operators.IvfIndex.train(corpus, "vec_id", "embedding", k = 8)
        graft.operators.IvfIndex.saveAssigned(corpus, "vec_id", "embedding",
          m, n, buckets = 8)
        graft.operators.IvfIndex.save(s, m, s"$wh/${n}_model")
        model = m
      },
      // a throwing probe (torn model parquet) counts as unusable -> rebuild
      usable = n => s.catalog.tableExists(n) && {
        model = graft.operators.IvfIndex.load(s, s"$wh/${n}_model"); true
      },
      siblings = n => Seq(s"${n}_model"))
    (name, model)
  }

  /** s14's build-once IVF-PQ serving index — the composition of s12's
    * bucketed coarse index and s13's PQ compression into the production
    * serving layout: ONE ingest-time scan assigns every vector its coarse
    * cell AND its m-byte PQ code, persisted bucketed by `ivf_cell` with
    * both models alongside (fixture-keyed like [[s12ServeIndex]]). The
    * serving path then never touches float vectors until the
    * candidates-bounded exact re-rank. Cell count is fixture-sized at 8
    * (= [[graft.operators.IvfIndex.autoNlist]]'s floor region for this
    * corpus); at warehouse scale autoNlist keeps probe cost ~nprobe*sqrt(n).
    */
  private def s14ServeIndex(s: SparkSession, dir: String, corpus: DataFrame)
      : (String, graft.operators.IvfIndex.Model, graft.operators.PqIndex.Model) = {
    // staged-swap versioned like s12, with TWO model artifacts per version
    val key = fixtureKey(dir, "embeddings")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
    var models: (graft.operators.IvfIndex.Model, graft.operators.PqIndex.Model) = null
    val name = graft.util.VersionedTable.ensure(s, "s14_", s"s14_ivfpq_serve_$key",
      build = n => {
        val ivf = graft.operators.IvfIndex.train(corpus, "vec_id", "embedding", k = 8)
        val pq = graft.operators.PqIndex.train(corpus, "vec_id", "embedding",
          m = 16, k = 256, sampleSize = 4096)
        graft.operators.PqIndex.saveEncodedAssigned(corpus, "vec_id", "embedding",
          ivf, pq, n, buckets = 8)
        graft.operators.IvfIndex.save(s, ivf, s"$wh/${n}_ivf")
        graft.operators.PqIndex.save(s, pq, s"$wh/${n}_pq")
        models = (ivf, pq)
      },
      usable = n => s.catalog.tableExists(n) && {
        models = (graft.operators.IvfIndex.load(s, s"$wh/${n}_ivf"),
          graft.operators.PqIndex.load(s, s"$wh/${n}_pq")); true
      },
      siblings = n => Seq(s"${n}_ivf", s"${n}_pq"))
    (name, models._1, models._2)
  }

  /** s15's build-once filtered-serving index: like [[s14ServeIndex]] but
    * the corpus carries a label column persisted into the index
    * (`extraCols`) so attribute predicates can pre-filter the pruned ADC
    * scan. Separate key space from s14 — the schemas differ.
    */
  private def s15ServeIndex(s: SparkSession, dir: String, corpus: DataFrame)
      : (String, graft.operators.IvfIndex.Model, graft.operators.PqIndex.Model) = {
    // staged-swap versioned like s14 (separate key space — schemas differ)
    val key = fixtureKey(dir, "embeddings")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
    var models: (graft.operators.IvfIndex.Model, graft.operators.PqIndex.Model) = null
    val name = graft.util.VersionedTable.ensure(s, "s15_", s"s15_ivfpq_filt_$key",
      build = n => {
        val ivf = graft.operators.IvfIndex.train(corpus, "vec_id", "embedding", k = 8)
        val pq = graft.operators.PqIndex.train(corpus, "vec_id", "embedding",
          m = 16, k = 256, sampleSize = 4096)
        graft.operators.PqIndex.saveEncodedAssigned(corpus, "vec_id", "embedding",
          ivf, pq, n, buckets = 8, extraCols = Seq("label"))
        graft.operators.IvfIndex.save(s, ivf, s"$wh/${n}_ivf")
        graft.operators.PqIndex.save(s, pq, s"$wh/${n}_pq")
        models = (ivf, pq)
      },
      usable = n => s.catalog.tableExists(n) && {
        models = (graft.operators.IvfIndex.load(s, s"$wh/${n}_ivf"),
          graft.operators.PqIndex.load(s, s"$wh/${n}_pq")); true
      },
      siblings = n => Seq(s"${n}_ivf", s"${n}_pq"))
    (name, models._1, models._2)
  }

  /** d17's build-once INGEST-SIDE dedup index (round-11 verdict #2): the
    * corpus's banded minhash signatures + shingle sets persisted as two
    * slim bucketed tables, fixture-keyed like [[s14ServeIndex]]. First
    * invocation per fixture pays the one corpus text pass; every
    * subsequent batch probe reads the slim tables and never re-shingles
    * the corpus — the warehouse-scale daily-batch absorption shape.
    * Parameters are pinned to d17's (shingleN=3, numHashes=16, bandRows=1)
    * — the index bakes them in.
    */
  private def d17IngestIndex(s: SparkSession, dir: String,
      corpus: DataFrame): (String, String) = {
    // staged-swap versioned like d19: one version = TWO sibling tables
    // (band + shingle) derived from the versioned base name; the commit
    // marker lands on the base name only after both are written, so a
    // reader never resolves a version with one table missing
    val key = fixtureKey(dir, "documents")
    val name = graft.util.VersionedTable.ensure(s, "d17_", s"d17_jx_$key",
      build = n => Dedup.buildJaccardIngestIndex(corpus, "doc_id", "text",
        s"${n}_band", s"${n}_sh", shingleN = 3, numHashes = 16, bandRows = 1,
        buckets = 16),
      usable = n =>
        s.catalog.tableExists(s"${n}_band") && s.catalog.tableExists(s"${n}_sh"),
      siblings = n => Seq(s"${n}_band", s"${n}_sh"))
    (s"${name}_band", s"${name}_sh")
  }

  /** FIXED-batch ingest-dedup probe: the d17 batch constructed from
    * `baseDir`'s documents, probed against `dir`'s persisted ingest index.
    * The indexed probe's product claim is per-batch cost FLAT in corpus
    * size — the d17 soak leg can't measure that (its batch is derived from
    * the scaled corpus, so its wall mixes batch growth in); ScaleSoak times
    * THIS at every scale with the same batch, so the `ratio_vs_1x` column
    * is the flatness number directly (round-13 measured: ~2.6 s against a
    * 1x index vs ~2.2 s against 64x, identical survivors). When
    * `dir == baseDir` the output is exactly the d17 query's (spec-pinned).
    * Batch ids (+1e6/+2e6 over base ids) stay disjoint from every soak
    * replica id (r * 1e7 offsets) — the probe's uniqueness guard enforces
    * it rather than trusting this comment.
    */
  def d17FixedBatchProbe(s: SparkSession, dir: String, baseDir: String): DataFrame = {
    val baseDocs = t(s, baseDir, "documents").select("doc_id", "text")
    val mut = baseDocs.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val freshNew = baseDocs.where(col("doc_id") % 5 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "), t => concat(t, lit("_xq"))),
          " ").as("text"))
    val batch = mut.unionByName(freshNew)
    val (bandTable, shTable) =
      d17IngestIndex(s, dir, t(s, dir, "documents").select("doc_id", "text"))
    val pairs = Dedup.incrementalJaccardPairsIndexed(s, bandTable, shTable,
      batch, "doc_id", "text",
      shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
    batch.join(pairs.select(col("idA").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id")
  }

  /** st13's ingest loop, with the CORPUS side (index build) and the BATCH
    * side (the two arriving micro-batches) decoupled. The st13 query passes
    * the same docs for both; [[st13FixedBatchIngest]] scales only the
    * corpus. Body is the load-bearing st13 shape: per-invocation index,
    * probe -> admitted rows staged to parquet BEFORE the append -> bucketed
    * append -> per-batch marker (full redelivery a skip, partial-apply
    * replay refused by the append's duplicate-id guard).
    */
  private def st13Ingest(s: SparkSession, corpusDocs: DataFrame,
      batchDocs: DataFrame, key: String): DataFrame = {
    val bandT = s"st13_band_$key"; val shT = s"st13_sh_$key"
    // per-invocation index: sweep crashed leftovers, then build fresh
    graft.util.TableRetention.sweep(s, "st13_", keep = Set.empty)
    Dedup.buildJaccardIngestIndex(corpusDocs, "doc_id", "text", bandT, shT,
      shingleN = 3, numHashes = 16, bandRows = 1, buckets = 16)
    try {
      val toks = split(col("text"), " ")
      val wdocs = batchDocs.where(size(toks) >= 30 && col("doc_id") % 4 === 0)
      def win(from: Int, len: Int, off: Long) = wdocs.select(
        (col("doc_id") + off).as("doc_id"),
        array_join(transform(slice(toks, from, len),
          t => concat(t, lit("_w"))), " ").as("text"))
      val m1 = batchDocs.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val a = win(1, 20, 4000000L)
      val b = win(6, 20, 5000000L)
      val batch1 = m1.unionByName(a).unionByName(b)
      val c = win(11, 20, 6000000L)
      val d = win(2, 19, 7000000L)
      val n2 = batchDocs.where(col("doc_id") % 5 === 2)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          array_join(transform(toks, t => concat(t, lit("_xr"))), " ")
            .as("text"))
      val batch2 = c.unionByName(d).unionByName(n2)
      val base = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"st13_ingest_$key")
      deleteRecursively(base)
      val deltaDir = base.resolve("delta")
      val admittedDir = base.resolve("admitted")
      java.nio.file.Files.createDirectories(deltaDir)
      java.nio.file.Files.createDirectories(admittedDir)
      val stream = s.readStream.schema(
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType)))).parquet(deltaDir.toString)
      lastIngestBatchWalls = Nil
      val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        val tb0 = System.nanoTime()
        val marker = admittedDir.resolve(s"b$batchId")
        // per-batch stages are sized by the BATCH, not by the global
        // shuffle-partition setting (which a soak/production session sizes
        // for the CORPUS): round 13 measured the 1x->16x fixed-batch step
        // (4.54 -> 7.65 s) tracking the soak's 32->1024 partition scaling,
        // pure task-scheduling overhead. Pinning to the core count makes
        // per-batch wall flat from 1x; the corpus side is bucketed, so the
        // probe join never reshuffles it regardless of this setting.
        if (!batch.isEmpty && !java.nio.file.Files.exists(marker))
          withShufflePartitions(s, s.sparkContext.defaultParallelism) {
            val pairs = Dedup.incrementalJaccardPairsIndexed(s, bandT, shT,
              batch, "doc_id", "text",
              shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
            val staged = base.resolve(s"stage_b$batchId")
            // materialize admitted BEFORE the append mutates the index
            batch.join(pairs.select(col("idA").as("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
              .write.mode("overwrite").parquet(staged.toString)
            Dedup.appendJaccardIngestIndex(s, bandT, shT,
              s.read.parquet(staged.toString), "doc_id", "text",
              shingleN = 3, numHashes = 16, bandRows = 1, buckets = 16)
            java.nio.file.Files.move(staged, marker)
            lastIngestBatchWalls =
              lastIngestBatchWalls :+ (System.nanoTime() - tb0) / 1e9
          }
      }
      val q = stream.writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
      try {
        addStreamFile(batch1, deltaDir, "b1")
        q.processAllAvailable()
        addStreamFile(batch2, deltaDir, "b2")
        q.processAllAvailable()
      } finally q.stop()
      val parts = {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.list(admittedDir)) {
          st => st.iterator().asScala.map(_.toString).toSeq.sorted
        }
      }
      require(parts.size == 2,
        s"st13: expected 2 admitted micro-batches, saw ${parts.size}")
      // the result must OUTLIVE the finally-swept index tables
      ordered(s.read.parquet(parts: _*).select("doc_id")).localCheckpoint()
    } finally graft.util.TableRetention.sweep(s, "st13_", keep = Set.empty)
  }

  /** st13's ingest loop with the corpus index built over `dir` and the
    * SAME two micro-batches (constructed from `baseDir`) at every corpus
    * scale. ScaleSoak runs this as the `st13_fixed_batch_ingest` leg: the
    * `ingest_batch_sec_max` column across scales is the streaming claim —
    * per-batch wall (probe + staged admitted write + bucketed append +
    * marker) independent of corpus size — that the st13 soak leg can't
    * witness (its batches are derived from the scaled corpus). When
    * `dir == baseDir` the output equals the st13 query's (spec-pinned).
    * Batch ids stay under 1e7, disjoint from every soak replica id.
    */
  def st13FixedBatchIngest(s: SparkSession, dir: String, baseDir: String): DataFrame =
    st13Ingest(s,
      t(s, dir, "documents").select("doc_id", "text"),
      t(s, baseDir, "documents").select("doc_id", "text"),
      java.lang.Integer.toHexString((dir + "|" + baseDir).hashCode))

  /** d22's planted URL corpus — (doc_id, url, n_chars) with the RFC 3986
    * normalization targets: every 6th doc re-appears (+5e6) upper-cased
    * with an explicit default port, trailing slash, and utm_* params at
    * HIGHER quality; every 6th-offset-4 doc re-appears (+6e6) with a
    * fragment and a mixed utm/real query string at quality 0. ONE
    * definition shared by d22 (batch) and st20 (streaming admission).
    */
  private def d22Corpus(s: SparkSession, dir: String): DataFrame = {
    // NULL-safe source: a null host would slip a broadcast-anti-join
    // blocklist (null never equals) while SQL NOT IN drops it — coalesce
    // on BOTH sides keeps the engines row-identical on hostile fixtures
    val docs = t(s, dir, "documents").select(col("doc_id"),
      coalesce(col("source"), lit("nosrc")).as("source"), col("n_chars"))
    val path = concat(lit("/p/"), (col("doc_id") % 500).cast("string"))
    val base = docs.select(col("doc_id"),
      concat(lit("https://www."), col("source"), lit(".example.com"), path).as("url"),
      col("n_chars"))
    val v1 = docs.where(col("doc_id") % 6 === 1).select(
      (col("doc_id") + 5000000L).as("doc_id"),
      concat(lit("HTTPS://WWW."), upper(col("source")), lit(".EXAMPLE.COM:443"),
        path, lit("/?utm_source=feed&utm_campaign=x")).as("url"),
      (col("n_chars") + 100000L).as("n_chars"))
    val v2 = docs.where(col("doc_id") % 6 === 4).select(
      (col("doc_id") + 6000000L).as("doc_id"),
      concat(lit("https://www."), col("source"), lit(".example.com"),
        path, lit("?utm_medium=z&id=7#frag")).as("url"),
      lit(0L).as("n_chars"))
    base.unionByName(v1).unionByName(v2)
  }

  /** d22's RFC 3986 string normalization, one rule per staged column —
    * fragment strip, query string after the FIRST '?' (a second '?'
    * belongs to the query string; substring_index(-1) would take after
    * the LAST and diverge from the oracle), scheme/host lowering, default
    * port strip, empty/trailing path normalization, utm_* param filter.
    * Adds `url_norm` and `__host` to the input (which must carry `url`).
    * All codegen'd string ops, no UDF, mirrored 1:1 in the oracle.
    */
  private def urlNormalized(corpus: DataFrame): DataFrame = corpus
    .withColumn("__nofrag", substring_index(col("url"), "#", 1))
    .withColumn("__qs", when(col("__nofrag").contains("?"),
      expr("substring(__nofrag, instr(__nofrag, '?') + 1)")).otherwise(lit("")))
    .withColumn("__pre", substring_index(col("__nofrag"), "?", 1))
    .withColumn("__scheme", lower(substring_index(col("__pre"), "://", 1)))
    .withColumn("__rest",
      expr("substring(__pre, length(substring_index(__pre, '://', 1)) + 4)"))
    .withColumn("__hostport", lower(substring_index(col("__rest"), "/", 1)))
    .withColumn("__path",
      expr("substring(__rest, length(substring_index(__rest, '/', 1)) + 1)"))
    .withColumn("__host",
      when(col("__scheme") === "https" && col("__hostport").endsWith(":443"),
        expr("substring(__hostport, 1, length(__hostport) - 4)"))
      .when(col("__scheme") === "http" && col("__hostport").endsWith(":80"),
        expr("substring(__hostport, 1, length(__hostport) - 3)"))
      .otherwise(col("__hostport")))
    .withColumn("__pathn",
      when(col("__path") === "", lit("/"))
      .when(length(col("__path")) > 1 && col("__path").endsWith("/"),
        expr("substring(__path, 1, length(__path) - 1)"))
      .otherwise(col("__path")))
    .withColumn("__params", array_join(
      filter(split(col("__qs"), "&"), p => !p.startsWith("utm_") && p =!= ""), "&"))
    .withColumn("url_norm", concat(col("__scheme"), lit("://"), col("__host"),
      col("__pathn"),
      when(col("__params") === "", lit(""))
        .otherwise(concat(lit("?"), col("__params")))))

  /** The blocklisted hosts — the shape a multi-million-host blocklist
    * needs is a broadcast left_anti frame (isin would compile the list
    * into the plan). Shared by d22 and st20.
    */
  private val blockedHosts = Seq("www.src3.example.com",
    "www.src7.example.com", "www.src13.example.com")

  /** Normalize + blocklist-filter one frame of (doc_id, url, n_chars):
    * the ROW-LOCAL half of URL dedup, shared verbatim by d22's one-shot
    * and st20's per-batch admission.
    */
  private def urlAllowed(s: SparkSession, frame: DataFrame): DataFrame = {
    import s.implicits._
    val normed = urlNormalized(frame)
    normed.join(broadcast(blockedHosts.toDF("blocked_host")),
        normed("__host") === col("blocked_host"), "left_anti")
      .select("doc_id", "url_norm", "n_chars")
  }

  /** st20: d22's URL admission AT INGEST against a persisted best-per-URL
    * index (round-16 verdict ask #5 — the d17/st13 build-once-probe pairing
    * applied to the commonest real ingest gate). The corpus arrives as two
    * micro-batches split so every planted URL-collision group STRADDLES
    * the boundary (base rows in batch 1, the planted variants in batch 2):
    * batch 2's higher-quality +5e6 variants must REPLACE their already
    * admitted batch-1 rows, and its quality-0 +6e6 variants must LOSE to
    * them — a genuine cross-batch upsert, not a skip. Each batch is
    * normalized + blocklist-filtered row-locally (urlAllowed — the same
    * single definition as d22), reduced to its per-URL best, and merged
    * into the index by the SAME (n_chars DESC, doc_id ASC) argmax. Argmax
    * is associative and commutative, so the final index equals d22's
    * one-shot survivors for ANY batch split — d22's oracle pins batch ==
    * streaming exactly. Index versions land as `after_bN` dirs via
    * staged writes: a redelivered batch finds its marker dir and skips
    * (idempotent), a torn write leaves only the staged dir (never a
    * half-visible version). Per-batch cost: the batch's narrow
    * normalization + one url-partitioned window over (index + batch best)
    * — index-sized, never corpus-history-sized.
    */
  private def st20UrlIngest(s: SparkSession, dir: String): DataFrame = {
    val corpus = d22Corpus(s, dir)
    val batch1 = corpus.where(col("doc_id") < 5000000L)
    val batch2 = corpus.where(col("doc_id") >= 5000000L)
    val base = ingestLoopBase("st20_url", dir)
    deleteRecursively(base)
    val deltaDir = base.resolve("delta")
    val idxDir = base.resolve("idx")
    java.nio.file.Files.createDirectories(deltaDir)
    java.nio.file.Files.createDirectories(idxDir)
    def versions(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(idxDir)) { st =>
        st.iterator().asScala.filter(
          _.getFileName.toString.startsWith("after_b")).toSeq
          .sortBy(p => p.getFileName.toString.stripPrefix("after_b").toLong)
      }
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("url_norm"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val marker = idxDir.resolve(s"after_b$batchId")
      if (!batch.isEmpty && !java.nio.file.Files.exists(marker))
        withShufflePartitions(s, s.sparkContext.defaultParallelism) {
          val batchBest = urlAllowed(s, batch)
            .withColumn("__rk", row_number().over(w))
            .where(col("__rk") === 1).drop("__rk")
          val merged = versions().lastOption match {
            case Some(prior) =>
              s.read.parquet(prior.toString).unionByName(batchBest)
                .withColumn("__rk", row_number().over(w))
                .where(col("__rk") === 1).drop("__rk")
            case None => batchBest
          }
          val staged = base.resolve(s"stage_b$batchId")
          merged.write.mode("overwrite").parquet(staged.toString)
          java.nio.file.Files.move(staged, marker)
        }
    }
    val stream = s.readStream.schema(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("url", StringType), StructField("n_chars", LongType))))
      .parquet(deltaDir.toString)
    val q = stream.writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
    try {
      addStreamFile(batch1, deltaDir, "b1")
      q.processAllAvailable()
      addStreamFile(batch2, deltaDir, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val vs = versions()
    require(vs.size == 2,
      s"st20: expected 2 admitted micro-batches, saw ${vs.size}")
    ordered(s.read.parquet(vs.last.toString)
      .select("doc_id", "url_norm", "n_chars"))
  }

  /** st21: BM25 index MAINTENANCE at ingest — the CDC pairing every other
    * build-once index already has (d16/st12 for ANN, d19/st15 for
    * decontamination, st13 for near-dup admission), applied to t36's
    * lexical postings. The corpus arrives as two doc-disjoint micro-
    * batches (parity split); each batch builds its OWN delta trio with
    * the one shared [[graft.operators.Bm25Index.build]] and APPENDS it
    * to the prior version ([[graft.operators.Bm25Index.appendSegment]],
    * round-18 verdict #1): the delta postings become a new immutable
    * SEGMENT (prior segments are never rewritten — per-batch cost is
    * O(delta + vocabulary), flat in index size, where the previous
    * prior-UNION-delta rewrite made K batches cost O(K*index)), df sums
    * per token, stats add — all associative and commutative, so the
    * final index equals the one-shot t36 build for ANY batch split and
    * t36's DuckDB oracle pins batch == streaming verbatim (st20's argmax
    * argument, applied to additive index state). Versions land as
    * `_b<N>`-derived table trios gated by `after_b<N>` marker dirs: a
    * redelivered batch finds its marker and skips; a crash between merge
    * and marker replays the merge from the prior committed version (the
    * delta rebuild and every merge output are mode-overwrite) —
    * idempotent (Bm25Spec pins the kill-between-merge-and-marker case).
    * RETENTION runs inside the loop (round-18 verdict #4): after each
    * commit, versions beyond the newest two are swept —
    * VersionedTable's keep-newest-2 rule applied to the segment-sharing
    * chain, where a postings segment stays live while ANY kept version's
    * manifest references it — so a long-running ingest loop's version
    * litter is bounded. The final probe runs the REAL t36 serving path
    * (term selection from the merged df, bucket-pruned topK over the
    * SEGMENTED layout — every segment scan must prune) with the same
    * in-query plan gates.
    */
  private def st21Bm25Maintain(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val batch1 = docs.where(col("doc_id") % 2 === 0)
    val batch2 = docs.where(col("doc_id") % 2 =!= 0)
    val base = ingestLoopBase("st21_bm25", dir)
    deleteRecursively(base)
    val deltaDir = base.resolve("delta")
    val idxDir = base.resolve("idx")
    java.nio.file.Files.createDirectories(deltaDir)
    java.nio.file.Files.createDirectories(idxDir)
    val tblBase = s"st21bm25_${java.lang.Integer.toHexString(dir.hashCode)}"
    wipeWarehousePrefix(s, tblBase)
    def committed(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(idxDir)) { st =>
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("after_b"))
          .map(_.stripPrefix("after_b").toLong).toSeq.sorted
      }
    }
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val marker = idxDir.resolve(s"after_b$batchId")
      if (!batch.isEmpty && !java.nio.file.Files.exists(marker))
        withShufflePartitions(s, s.sparkContext.defaultParallelism) {
          val delta = s"${tblBase}_delta"
          graft.operators.Bm25Index.build(batch, "doc_id", "text", delta)
          val prior = committed().lastOption.map(n => s"${tblBase}_b$n")
          graft.operators.Bm25Index.appendSegment(s, prior, delta,
            s"${tblBase}_b$batchId")
          java.nio.file.Files.createDirectory(marker)
          // in-loop retention: newest-2 committed versions stay (plus
          // every segment a kept manifest references — segments are
          // shared, append-only state); older version trios sweep
          graft.operators.Bm25Index.sweepVersions(s, tblBase,
            committed().takeRight(2).map(n => s"${tblBase}_b$n"))
        }
    }
    val stream = s.readStream.schema(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(deltaDir.toString)
    val q = stream.writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
    try {
      addStreamFile(batch1, deltaDir, "b1")
      q.processAllAvailable()
      addStreamFile(batch2, deltaDir, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val vs = committed()
    require(vs.size == 2,
      s"st21: expected 2 merged micro-batches, saw ${vs.size}")
    val idx = s"${tblBase}_b${vs.last}"
    // selectTerms refuses loudly on empty/stopword-saturated indexes
    val terms = graft.operators.Bm25Index.selectTerms(s, idx)
    val top = graft.operators.Bm25Index.topK(s, idx, terms)
    val plan = top.queryExecution.executedPlan.toString
    // the appended layout probes ONE bucket-pruned scan PER SEGMENT: every
    // segment scan in the unioned plan must prune, not just the first
    val sels = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    require(sels.size == 2 && sels.forall(m => m.group(1).toInt < m.group(2).toInt),
      s"st21: expected 2 bucket-pruned segment scans, saw " +
        s"${sels.map(_.matched).mkString("[", ", ", "]")}")
    require(!plan.contains("documents.parquet"),
      "st21: probe plan re-reads document text — probes touch only the index")
    ordered(top.select(col("doc_id"), col("n_terms"), col("score")))
  }

  /** Wipe a plain-named table prefix's residue from the shared warehouse:
    * a PREVIOUS JVM's run leaves locations behind while the in-memory
    * catalog forgot the tables, and saveAsTable then refuses the orphan
    * location — the cross-JVM failure mode VersionedTable documents (its
    * versioned names dodge it by construction; plain-named ingest chains
    * must clean up explicitly).
    */
  private def wipeWarehousePrefix(s: SparkSession, prefix: String): Unit = {
    // prefix-LISTED on both sides (round-19 verdict #8): a warehouse glob
    // + a SHOW TABLES pattern keep the per-ingest-loop wipe O(prefix
    // matches), never O(warehouse)
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir").stripSuffix("/"))
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(wh))
      fs.globStatus(new org.apache.hadoop.fs.Path(wh, prefix + "*"))
        .foreach(st => fs.delete(st.getPath, true))
    s.catalog.listTables(s.catalog.currentDatabase, prefix + "*")
      .collect().map(_.name)
      .foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
  }

  /** Per-batch appendSegment (MERGE) walls of the most recent
    * [[st21MultiBatchIngest]], batch order — ScaleSoak's evidence column
    * for the append-shaped-maintenance claim (round-18 verdict #1): each
    * merge is a postings-table rename + a vocabulary-sized df sum + 1-row
    * stats arithmetic, so the wall must stay FLAT across batches; the
    * previous prior-UNION-delta postings rewrite grew per-batch cost with
    * the accumulated index (the 5.20 -> 12.04 s x16 growth in
    * SOAK_UNIFORM_r18 this rework exists to remove).
    */
  @volatile var lastBm25MergeWalls: List[Double] = Nil

  /** The K-batch BM25 ingest chain (K = 8 — the round-18 verdict's K>=8
    * flatness soak): the corpus arrives as K doc-disjoint batches; each
    * builds its delta trio and appendSegment-merges it into the chain
    * under the size-tiered COMPACTION POLICY (compactAt = 6: the 6th
    * segment folds the chain into one table — the amortized O(index)
    * event that bounds probe fan-out; every other merge is
    * O(delta + vocabulary)), with keep-newest-2 retention sweeping as it
    * goes (st21's bounded-litter contract). Returns the final t36
    * serving probe; the per-batch MERGE walls land in
    * [[lastBm25MergeWalls]] — flat except the one visible fold.
    */
  def st21MultiBatchIngest(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val tblBase = s"st21mb_${java.lang.Integer.toHexString(dir.hashCode)}"
    wipeWarehousePrefix(s, tblBase)
    var prior: Option[String] = None
    val walls = List.newBuilder[Double]
    withShufflePartitions(s, s.sparkContext.defaultParallelism) {
      for (b <- 0 until k) {
        val delta = s"${tblBase}_delta"
        graft.operators.Bm25Index.build(
          docs.where(pmod(col("doc_id"), lit(k)) === b), "doc_id", "text", delta)
        val t0 = System.nanoTime()
        graft.operators.Bm25Index.appendSegment(s, prior, delta,
          s"${tblBase}_b$b", compactAt = 6)
        walls += (System.nanoTime() - t0) / 1e9
        prior = Some(s"${tblBase}_b$b")
        graft.operators.Bm25Index.sweepVersions(s, tblBase,
          (math.max(0, b - 1) to b).map(n => s"${tblBase}_b$n"))
      }
    }
    lastBm25MergeWalls = walls.result()
    // the policy's invariant: segments bounded at compactAt-1 (K=8 with
    // compactAt=6 folds at batch 6, leaving 1 + 2 appended = 3)
    val finalSegs = s.table(prior.get + "_segs").count()
    require(finalSegs < 6,
      s"st21 multibatch: compaction policy failed to bound segments ($finalSegs)")
    // the bounded-chain gate (r18 verdict #4): after K batches with
    // in-loop retention, only the newest TWO versions' df/stats/segs
    // trios remain — an unswept chain would hold K of each
    val verTables = s.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith(s"${tblBase}_b") && !n.contains("_seg"))
    val keptIds = verTables.flatMap(
      s"^${java.util.regex.Pattern.quote(tblBase)}_b([0-9]+).*$$".r
        .findFirstMatchIn(_).map(_.group(1).toLong)).distinct.sorted
    require(keptIds.toSeq == Seq(k - 2L, k - 1L),
      s"st21 multibatch: version chain not bounded to newest 2 — " +
        s"found versions ${keptIds.mkString(",")} of $k")
    val idx = prior.get
    val terms = graft.operators.Bm25Index.selectTerms(s, idx)
    graft.operators.Bm25Index.topK(s, idx, terms)
  }

  /** t38's query-count scaling probe (round-18 verdict #2's soak leg):
    * derive `nQueries` deterministic 3-term queries over the same
    * vocabulary (query i takes terms[(i + j*7) mod V], j in 0..2 —
    * queries OVERLAP in terms, the serving regime) and run ONE batchTopK
    * pass. The soak sweeps Q at a fixed corpus: wall must grow
    * SUB-linearly in Q — the bucket-pruned postings scan is shared across
    * the whole batch and only the per-(query, doc) aggregate fan-out
    * grows; a per-query rescan would show linear wall.
    */
  def t38QueryCountProbe(s: SparkSession, dir: String, nQueries: Int): DataFrame = {
    val docs = t(s, dir, "documents")
    val key = fixtureKey(dir, "documents")
    val idx = graft.util.VersionedTable.ensure(s, "t36_", s"t36_bm25_$key",
      build = name =>
        graft.operators.Bm25Index.build(docs, "doc_id", "text", name),
      usable = n => s.catalog.tableExists(n) &&
        s.catalog.tableExists(n + "_df") &&
        s.catalog.tableExists(n + "_stats"),
      siblings = graft.operators.Bm25Index.siblings)
    val terms = graft.operators.Bm25Index.selectTerms(s, idx, nTerms = 24,
      dfCapDenom = 1)
    val queries = (0 until nQueries).map(i =>
      (f"q$i%04d",
        (0 until 3).map(j => terms((i + j * 7) % terms.size)).distinct))
    graft.operators.Bm25Index.batchTopK(s, idx, queries)
  }

  /** st22: POSITIONAL index maintenance at ingest — t39's phrase index
    * gets the CDC pairing every other build-once index has (t36→st21,
    * d19→st15, d16/s12→st12, d17→st13). Two doc-disjoint micro-batches
    * each build their own positional delta ([[graft.operators.Bm25Index
    * .buildPositional]]) and append it
    * ([[graft.operators.Bm25Index.appendPositionalSegment]]): the delta
    * postings adopt as an immutable segment, the bigram-statistics
    * sibling merges arithmetically (positions AND bigrams are doc-local,
    * so both merges are associative + commutative and the maintained
    * index equals the one-shot t39 build for ANY batch split — t39's
    * DuckDB oracle pins batch == streaming verbatim). Same marker
    * idempotence, in-loop keep-newest-2 retention, and probe plan gates
    * (every segment scan bucket-pruned, no text rescan) as st21.
    */
  private def st22PhraseMaintain(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val batch1 = docs.where(col("doc_id") % 2 === 0)
    val batch2 = docs.where(col("doc_id") % 2 =!= 0)
    val base = ingestLoopBase("st22_phrase", dir)
    deleteRecursively(base)
    val deltaDir = base.resolve("delta")
    val idxDir = base.resolve("idx")
    java.nio.file.Files.createDirectories(deltaDir)
    java.nio.file.Files.createDirectories(idxDir)
    val tblBase = s"st22pos_${java.lang.Integer.toHexString(dir.hashCode)}"
    wipeWarehousePrefix(s, tblBase)
    def committed(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(idxDir)) { st =>
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("after_b"))
          .map(_.stripPrefix("after_b").toLong).toSeq.sorted
      }
    }
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val marker = idxDir.resolve(s"after_b$batchId")
      if (!batch.isEmpty && !java.nio.file.Files.exists(marker))
        withShufflePartitions(s, s.sparkContext.defaultParallelism) {
          val delta = s"${tblBase}_delta"
          graft.operators.Bm25Index.buildPositional(batch, "doc_id", "text", delta)
          val prior = committed().lastOption.map(n => s"${tblBase}_b$n")
          graft.operators.Bm25Index.appendPositionalSegment(s, prior, delta,
            s"${tblBase}_b$batchId")
          java.nio.file.Files.createDirectory(marker)
          graft.operators.Bm25Index.sweepVersions(s, tblBase,
            committed().takeRight(2).map(n => s"${tblBase}_b$n"))
        }
    }
    val stream = s.readStream.schema(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(deltaDir.toString)
    val q = stream.writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
    try {
      addStreamFile(batch1, deltaDir, "b1")
      q.processAllAvailable()
      addStreamFile(batch2, deltaDir, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val vs = committed()
    require(vs.size == 2,
      s"st22: expected 2 merged micro-batches, saw ${vs.size}")
    val idx = s"${tblBase}_b${vs.last}"
    val phrase = graft.operators.Bm25Index.derivePhrase(s, idx)
    val hits = graft.operators.Bm25Index.phraseHits(s, idx, phrase)
    val plan = hits.queryExecution.executedPlan.toString
    val sels = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    require(sels.size == 2 && sels.forall(m => m.group(1).toInt < m.group(2).toInt),
      s"st22: expected 2 bucket-pruned segment scans, saw " +
        s"${sels.map(_.matched).mkString("[", ", ", "]")}")
    require(!plan.contains("documents.parquet"),
      "st22: probe plan re-reads document text — probes touch only the index")
    ordered(hits.select(col("doc_id"), col("n_hits"), col("first_pos")))
  }

  /** Per-batch appendPositionalSegment (MERGE) walls of the most recent
    * [[st22MultiBatchIngest]], batch order — ScaleSoak's evidence column
    * for the positional family's append-shaped-maintenance claim
    * (round-19 verdict #2): each merge is a postings-segment rename + a
    * bigram-stats arithmetic sum, so the wall must stay FLAT across
    * batches except the one visible size-tiered fold.
    */
  @volatile var lastPosMergeWalls: List[Double] = Nil

  /** The K-batch POSITIONAL ingest chain (round-19 verdict #2 — st21's
    * K>=8 flatness soak, mirrored for the t39/st22 family): the corpus
    * arrives as K doc-disjoint batches; each builds its positional delta
    * and appendPositionalSegment-merges it under the size-tiered
    * compaction policy (compactAt = 6: the 6th merge folds the chain —
    * including the `_2g` bigram sibling carry — into one table; every
    * other merge is O(delta + bigram vocabulary)), with keep-newest-2
    * retention sweeping as it goes. Returns the final phrase probe
    * (derivePhrase reads the folded+merged `_2g` — the sibling carry
    * exercised on the driver path, previously only Bm25Spec-pinned); the
    * per-batch MERGE walls land in [[lastPosMergeWalls]] — flat except
    * the one visible fold.
    */
  def st22MultiBatchIngest(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val tblBase = s"st22mb_${java.lang.Integer.toHexString(dir.hashCode)}"
    wipeWarehousePrefix(s, tblBase)
    var prior: Option[String] = None
    val walls = List.newBuilder[Double]
    withShufflePartitions(s, s.sparkContext.defaultParallelism) {
      for (b <- 0 until k) {
        val delta = s"${tblBase}_delta"
        graft.operators.Bm25Index.buildPositional(
          docs.where(pmod(col("doc_id"), lit(k)) === b), "doc_id", "text", delta)
        val t0 = System.nanoTime()
        graft.operators.Bm25Index.appendPositionalSegment(s, prior, delta,
          s"${tblBase}_b$b", compactAt = 6)
        walls += (System.nanoTime() - t0) / 1e9
        prior = Some(s"${tblBase}_b$b")
        graft.operators.Bm25Index.sweepVersions(s, tblBase,
          (math.max(0, b - 1) to b).map(n => s"${tblBase}_b$n"))
      }
    }
    lastPosMergeWalls = walls.result()
    // compaction invariant: K=8 with compactAt=6 folds at batch 6,
    // leaving 1 folded + 2 appended = 3 segments
    val finalSegs = s.table(prior.get + "_segs").count()
    require(finalSegs < 6,
      s"st22 multibatch: compaction policy failed to bound segments ($finalSegs)")
    val verTables = s.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith(s"${tblBase}_b") && !n.contains("_seg"))
    val keptIds = verTables.flatMap(
      s"^${java.util.regex.Pattern.quote(tblBase)}_b([0-9]+).*$$".r
        .findFirstMatchIn(_).map(_.group(1).toLong)).distinct.sorted
    require(keptIds.toSeq == Seq(k - 2L, k - 1L),
      s"st22 multibatch: version chain not bounded to newest 2 — " +
        s"found versions ${keptIds.mkString(",")} of $k")
    // the folded chain's _2g sibling must still serve phrase derivation
    // AND the probe must prune every remaining segment scan
    val idx = prior.get
    val phrase = graft.operators.Bm25Index.derivePhrase(s, idx)
    val hits = graft.operators.Bm25Index.phraseHits(s, idx, phrase)
    val plan = hits.queryExecution.executedPlan.toString
    val sels = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    require(sels.size == finalSegs &&
        sels.forall(m => m.group(1).toInt < m.group(2).toInt),
      s"st22 multibatch: expected $finalSegs bucket-pruned segment scans, " +
        s"saw ${sels.map(_.matched).mkString("[", ", ", "]")}")
    hits
  }

  /** Per-batch closure-maintenance walls (pair probe + closureMerge +
    * staged state write + index append) of the most recent st23 /
    * [[st23FixedBatchMaintain]] invocation, batch order — ScaleSoak's
    * evidence column for the round-19 verdict-#1 claim: per-batch
    * maintenance cost FLAT in corpus size, vs the ~300 s x64 full
    * recompute the d25/t34 legs pay every run.
    */
  @volatile var lastClosureBatchWalls: List[Double] = Nil

  /** st23: cluster-closure maintenance at ingest (round-19 verdict #1) —
    * the d17/st13 build-once discipline applied to the LAST index-like
    * family still rebuilt per run. The d09 corpus arrives as THREE
    * micro-batches (even originals, odd originals, then the planted
    * mutations — so the hostile corpus's near-dup CHAIN merges prior
    * clusters across the batch boundary, the genuine incremental-merge
    * regime); each batch derives its NEW pairs from the ingest index
    * ([[graft.operators.Dedup.incrementalJaccardPairsIndexed]], the
    * batch the only text shingled), transitions the persisted closure
    * state ([[graft.operators.Dedup.closureMerge]]: stored labels
    * append-only, merges composed into the slim remap — prior clusters
    * never re-walk), and appends the batch to the index. State versions
    * land as `after_b<N>` marker dirs via staged writes (st20's
    * idempotence: a redelivered batch skips; a torn write leaves only
    * the staged dir; a crash between index append and marker replays
    * into the probe's duplicate-id refusal — st13's loud partial-apply
    * contract). The final labels equal the one-shot d09 closure for ANY
    * batch split (the union-find induction in closureMerge's doc), so
    * d09's recursive-CTE oracle pins batch == streaming verbatim.
    */
  private def st23ClosureMaintain(s: SparkSession, dir: String): DataFrame = {
    val corpus = docsWithNearDups(s, dir)
    val batches = Seq(
      corpus.where(col("doc_id") < 1000000L && col("doc_id") % 2 === 0),
      corpus.where(col("doc_id") < 1000000L && col("doc_id") % 2 =!= 0),
      corpus.where(col("doc_id") >= 1000000L))
    val base = ingestLoopBase("st23_closure", dir)
    deleteRecursively(base)
    val tblBase = s"st23cl_${java.lang.Integer.toHexString(dir.hashCode)}"
    st23Ingest(s, batches, base, tblBase)
  }

  /** The st23 ingest loop body, shared with the fixed-batch soak probe:
    * stream `batches` through a file source, maintaining the jaccard
    * ingest index + the closure state per micro-batch. Per-batch cost is
    * O(batch + pairs + remap): the corpus-sized stored frame is only
    * narrow-scanned under a broadcast endpoint filter inside
    * closureMerge, and the index append is bucketed — nothing
    * corpus-shuffling. Returns the read-side labels over everything
    * ingested.
    */
  private[graft] def st23Ingest(s: SparkSession, batches: Seq[DataFrame],
      base: java.nio.file.Path, tblBase: String): DataFrame = {
    val bandT = s"${tblBase}_band"; val shT = s"${tblBase}_sh"
    graft.util.TableRetention.sweep(s, tblBase, keep = Set.empty)
    val deltaDir = base.resolve("delta")
    val idxDir = base.resolve("idx")
    java.nio.file.Files.createDirectories(deltaDir)
    java.nio.file.Files.createDirectories(idxDir)
    // seed an EMPTY ingest index: the loop is then uniform — batch 1
    // probes it (its own internal pairs still surface through the
    // fresh-vs-fresh leg) and appends, exactly like every later batch
    Dedup.buildJaccardIngestIndex(batches.head.limit(0), "doc_id", "text",
      bandT, shT, shingleN = 3, numHashes = 16, bandRows = 1, buckets = 16)
    def committed(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(idxDir)) { st =>
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("after_b"))
          .map(_.stripPrefix("after_b").toLong).toSeq.sorted
      }
    }
    def storedPaths(vs: Seq[Long]): Seq[String] =
      vs.map(n => idxDir.resolve(s"after_b$n").resolve("stored").toString)
    def remapPath(n: Long): String =
      idxDir.resolve(s"after_b$n").resolve("remap").toString
    lastClosureBatchWalls = Nil
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val marker = idxDir.resolve(s"after_b$batchId")
      if (!batch.isEmpty && !java.nio.file.Files.exists(marker))
        withShufflePartitions(s, s.sparkContext.defaultParallelism) {
          val tb0 = System.nanoTime()
          val pairs = Dedup.incrementalJaccardPairsIndexed(s, bandT, shT,
            batch, "doc_id", "text",
            shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
          val vs = committed()
          val storedPrior =
            if (vs.isEmpty)
              batch.select(col("doc_id").as("id"),
                col("doc_id").as("cluster")).limit(0)
            else s.read.parquet(storedPaths(vs): _*)
          val remapPrior = vs.lastOption match {
            case None => batch.select(col("doc_id").as("cluster"),
              col("doc_id").as("root")).limit(0)
            case Some(n) => s.read.parquet(remapPath(n))
          }
          val (storedApp, remapNew) = Dedup.closureMerge(
            storedPrior, remapPrior, batch.select("doc_id"), pairs)
          // stage the FULL version dir, append the index, THEN move the
          // staged dir to the marker: a torn write leaves only the
          // staged dir (never a half-visible version); a crash between
          // append and move replays into the probe's duplicate-id
          // refusal — st13's loud partial-apply contract
          val staged = base.resolve(s"stage_b$batchId")
          // the batch itself is staged too and the index append reads the
          // STAGED copy (st13's pattern): a bucketed saveAsTable append
          // fed the streaming batch DF directly writes through the
          // micro-batch's cloned session and lands zero rows in the
          // shared catalog's table — re-reading the staged parquet binds
          // the append to the main session
          // the three staged writes are independent (closureMerge returns
          // frames over checkpointed inputs) — run them concurrently
          // (guide §2.6): each is mostly fixed job/commit cost per batch
          graft.util.Par.actions(
            () => batch.write.mode("overwrite")
              .parquet(staged.resolve("batch").toString),
            () => storedApp.write.mode("overwrite")
              .parquet(staged.resolve("stored").toString),
            () => remapNew.write.mode("overwrite")
              .parquet(staged.resolve("remap").toString))
          Dedup.appendJaccardIngestIndex(s, bandT, shT,
            s.read.parquet(staged.resolve("batch").toString),
            "doc_id", "text",
            shingleN = 3, numHashes = 16, bandRows = 1, buckets = 16)
          java.nio.file.Files.move(staged, marker)
          lastClosureBatchWalls =
            lastClosureBatchWalls :+ (System.nanoTime() - tb0) / 1e9
        }
    }
    val stream = s.readStream.schema(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(deltaDir.toString)
    val q = stream.writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        addStreamFile(b, deltaDir, s"b${i + 1}")
        q.processAllAvailable()
      }
    } finally q.stop()
    val vs = committed()
    require(vs.size == batches.size,
      s"st23: expected ${batches.size} merged micro-batches, saw ${vs.size}")
    val labels = Dedup.closureLabels(
      s.read.parquet(storedPaths(vs): _*),
      s.read.parquet(remapPath(vs.last)))
    // the result must OUTLIVE the finally-swept index tables
    val out = ordered(labels.select(col("id").as("doc_id"), col("cluster")))
      .localCheckpoint()
    graft.util.TableRetention.sweep(s, tblBase, keep = Set.empty)
    out
  }

  /** st23's fixed-batch flatness probe (the soak leg the round-19
    * verdict's done-criterion names): closure state over `dir`'s corpus
    * is seeded ONCE per scale by the one-shot d09 path (pairs +
    * [[graft.operators.Dedup.clusters]] — the linear-in-corpus ingest
    * cost the d25 leg measures every run), then the SAME two
    * base-fixture batches are closure-MAINTAINED against it: per-batch
    * pairs from the fixture's read-only d17 ingest index (batch vs
    * corpus) plus the inline incremental overload (batch vs earlier
    * batch — the persisted index is never mutated, so the versioned
    * fixture index stays shared), then [[graft.operators.Dedup
    * .closureMerge]]. The per-batch walls land in
    * [[lastClosureBatchWalls]]; flat across x1/x16/x64 — against d25's
    * ~300 s x64 full recompute — is the claim. Batch ids (+4e6/+5e6/+6e6
    * over base ids) stay disjoint from every soak replica id (r * 1e7)
    * and from the closure corpus's raw ids.
    */
  def st23FixedBatchMaintain(s: SparkSession, dir: String,
      baseDir: String): DataFrame = {
    val corpus = t(s, dir, "documents").select("doc_id", "text")
    // one-shot state seed (the once-per-corpus ingest cost)
    val seedPairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
    var stored = Dedup.clusters(corpus, "doc_id", seedPairs).localCheckpoint()
    var remap = stored.select(col("id").as("cluster"),
      col("id").as("root")).limit(0).localCheckpoint()
    // read-only probes of the shared fixture index (d17's versioned
    // build-once — already paid by the d17 legs at this scale)
    val (bandT, shT) = d17IngestIndex(s, dir, corpus)
    val baseDocs = t(s, baseDir, "documents").select("doc_id", "text")
    def batchOf(off: Long, m: Long, r: Long) = baseDocs
      .where(col("doc_id") % m === r)
      .select((col("doc_id") + off).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val b1 = batchOf(4000000L, 3L, 0L)
    val b2 = batchOf(5000000L, 3L, 1L).unionByName(
      baseDocs.where(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 6000000L).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_xz"))), " ").as("text")))
    lastClosureBatchWalls = Nil
    var earlier = b1.limit(0)
    for (batch <- Seq(b1, b2)) {
      val tb0 = System.nanoTime()
      withShufflePartitions(s, s.sparkContext.defaultParallelism) {
        // batch vs corpus through the persisted index; batch vs the
        // earlier fixed batch inline (the index is shared and read-only
        // here — the mutating append path is st23Ingest's)
        val vsCorpus = Dedup.incrementalJaccardPairsIndexed(s, bandT, shT,
          batch, "doc_id", "text",
          shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
        val vsEarlier = Dedup.incrementalJaccardPairs(earlier, batch,
          "doc_id", "text",
          shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
        val (storedApp, remapNew) = Dedup.closureMerge(stored, remap,
          batch.select("doc_id"), vsCorpus.unionByName(vsEarlier))
        stored = stored.unionByName(storedApp).localCheckpoint()
        remap = remapNew.localCheckpoint()
      }
      lastClosureBatchWalls =
        lastClosureBatchWalls :+ (System.nanoTime() - tb0) / 1e9
      earlier = earlier.unionByName(batch)
    }
    Dedup.closureLabels(stored, remap)
      .select(col("id").as("doc_id"), col("cluster"))
  }

  /** st24: PERCEPTUAL dedup at ingest (round-19 verdict #5) — m05/m06
    * re-decode and re-pair the whole image corpus every run; this is
    * their d17/st13 pairing. The m05 media corpus arrives as two
    * micro-batches split so every planted perceptual-duplicate group
    * STRADDLES the boundary (base images in batch 1, the
    * brightness-shifted and RGB-re-encoded copies in batch 2); each
    * batch is dHashed ALONE (the corpus is never re-decoded — the
    * build-once claim), probed against the persisted combination-key
    * band index ([[graft.operators.Dedup.incrementalSimhashPairsIndexed]]
    * — the old side is one bucket-pruned scan semi-filtered by the
    * batch's broadcast bucket set, so per-batch shuffle is
    * occupancy-bounded), and its signatures append to the index. Pair
    * results land as idempotent per-batch parquet dirs gated by marker
    * moves (st13's contract: redelivery skips, a crash between append
    * and marker replays into the probe's duplicate-id refusal). The
    * union over batches equals the one-shot m05 banded pairs for any
    * batch split (orientation-normalized, min-hamming deduped), so
    * m05's brute-force DuckDB oracle pins batch == streaming verbatim.
    */
  private def st24PerceptualIngest(s: SparkSession, dir: String): DataFrame = {
    val media = {
      val docs = t(s, dir, "documents")
        .where(col("text").isNotNull && length(col("text")) > 0)
        .select("doc_id", "text")
      val base = Multimodal.fromTextPng(docs, "doc_id", "text")
      val shifted = Multimodal.fromTextPng(
        docs.where(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")),
        "doc_id", "text", shift = 16)
      val reenc = Multimodal.fromTextPng(
        docs.where(col("doc_id") % 9 === 4)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")),
        "doc_id", "text", rgb = true)
      base.unionByName(shifted).unionByName(reenc)
    }
    val batch1 = media.where(col("media_id") < 2000000L)
    val batch2 = media.where(col("media_id") >= 2000000L)
    val base = ingestLoopBase("st24_perceptual", dir)
    deleteRecursively(base)
    val tblBase = s"st24pd_${java.lang.Integer.toHexString(dir.hashCode)}"
    val bandT = s"${tblBase}_band"
    graft.util.TableRetention.sweep(s, tblBase, keep = Set.empty)
    val deltaDir = base.resolve("delta")
    val idxDir = base.resolve("idx")
    java.nio.file.Files.createDirectories(deltaDir)
    java.nio.file.Files.createDirectories(idxDir)
    // seed an EMPTY band index — the uniform-loop trick st23 uses
    Dedup.buildSimhashIngestIndex(
      batch1.select(col("media_id").as("id"), lit(0L).as("sig")).limit(0),
      "id", "sig", bandT, maxHamming = 4, blocks = 8)
    def committed(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(idxDir)) { st =>
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("after_b"))
          .map(_.stripPrefix("after_b").toLong).toSeq.sorted
      }
    }
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val marker = idxDir.resolve(s"after_b$batchId")
      if (!batch.isEmpty && !java.nio.file.Files.exists(marker))
        withShufflePartitions(s, s.sparkContext.defaultParallelism) {
          // decode ONLY the batch — the corpus side is the slim persisted
          // band index, never re-decoded
          val sigs = Multimodal.withDHash(batch)
            .where(col("dhash").isNotNull).localCheckpoint()
          val pairs = Dedup.incrementalSimhashPairsIndexed(s, bandT,
            sigs, "media_id", "dhash", maxHamming = 4, blocks = 8)
          val staged = base.resolve(s"stage_b$batchId")
          pairs.write.mode("overwrite")
            .parquet(staged.resolve("pairs").toString)
          // stage the signatures and append the RE-READ copy (the st23
          // lesson: a bucketed saveAsTable append fed a streaming-derived
          // frame writes through the micro-batch's cloned session and
          // lands zero rows)
          sigs.write.mode("overwrite")
            .parquet(staged.resolve("sigs").toString)
          Dedup.appendSimhashIngestIndex(s, bandT,
            s.read.parquet(staged.resolve("sigs").toString),
            "media_id", "dhash", maxHamming = 4, blocks = 8)
          java.nio.file.Files.move(staged, marker)
        }
    }
    val stream = s.readStream.schema(
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType),
        StructField("meta", Multimodal.mediaSchema("meta").dataType))))
      .parquet(deltaDir.toString)
    val q = stream.writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
    try {
      addStreamFile(batch1, deltaDir, "b1")
      q.processAllAvailable()
      addStreamFile(batch2, deltaDir, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val vs = committed()
    require(vs.size == 2,
      s"st24: expected 2 merged micro-batches, saw ${vs.size}")
    val out = ordered(s.read.parquet(vs.map(n =>
        idxDir.resolve(s"after_b$n").resolve("pairs").toString): _*)
      .select(col("idA"), col("idB"), col("hamming").cast("int").as("hamming")))
      .localCheckpoint()
    graft.util.TableRetention.sweep(s, tblBase, keep = Set.empty)
    out
  }

  /** d19's build-once contamination index (train's distinct window hashes,
    * one slim bucketed table per fixture) — shared by the batch probe
    * (d19) and the streaming probe (st15), the same build-once discipline
    * as [[d17IngestIndex]].
    */
  private def d19ContaminationIndex(s: SparkSession, dir: String,
      train: DataFrame): String = {
    // staged-swap versioned (round-14 verdict #2): a sibling session's
    // rebuild can no longer clobber a live probe — each build goes to a
    // fresh versioned name and the previous committed version survives
    // until two newer ones exist (VersionedTable's retention contract)
    val key = fixtureKey(dir, "documents")
    graft.util.VersionedTable.ensure(s, "d19_", s"d19_whx_$key",
      build = name => Dedup.buildContaminationIndex(train, "doc_id", "text", name))
  }

  /** Per-batch wall seconds of the most recent st15 invocation (the d19
    * probe inside foreachBatch), batch order — ScaleSoak's evidence column
    * for the streaming-decontamination claim: per-batch probe cost flat in
    * TRAIN-corpus size (the index is slim and bucketed; the batch is the
    * only text windowed per arrival).
    */
  @volatile var lastProbeBatchWalls: List[Double] = Nil

  /** st15's probe loop: the d11/d19 eval set arrives as a STREAM (two
    * micro-batches) and each batch is decontamination-checked inside
    * foreachBatch against the PERSISTED train-hash table — the
    * build-once/probe-streaming pairing d17/st13 have, applied to d19.
    * Results land as one idempotent parquet dir per batch id (a replayed
    * batch overwrites its own output and a marker skips the probe —
    * exactly-once results without an index mutation to guard). Per-doc
    * counts are batch-local AND correct: a document's windows all arrive
    * in its batch, so the union over batches equals the one-shot d19
    * output — one oracle pins all three paths (d11, d19, st15).
    *
    * The probe's shuffle stages are pinned to the session's core count
    * rather than `spark.sql.shuffle.partitions`: per-batch work is sized
    * by the BATCH, and inheriting a corpus-sized global setting would
    * charge each micro-batch the task-scheduling cost of the whole-corpus
    * configuration (the st13 coupling round 13 measured).
    */
  /** Shared two-micro-batch foreachBatch harness (st15/st16 — this
    * idempotency scaffold was hand-copied per loop, and its conventions
    * are hard-won: stage OUTSIDE the watched dir, write-then-atomic-move
    * output markers keyed by batch id, EMPTY batches still marked so the
    * trailing delivered-batch check holds, per-batch stages pinned to the
    * core count because per-batch work is sized by the BATCH, not the
    * corpus-global shuffle setting — a no-op for exchange-free decisions
    * like st16's). Streams `batch1` then `batch2` through a file source,
    * decides each arriving batch with `perBatch`, lands one idempotent
    * parquet dir per batch id, and returns the union read plus per-batch
    * walls. st13/st12 keep their own loops — mutating an index between
    * batches is a different contract.
    */
  private def twoBatchIngestLoop(s: SparkSession, tag: String, key: String,
      schema: StructType, batch1: DataFrame, batch2: DataFrame,
      /** Applied to the STREAMING plan itself (st17's transformWithState
        * lives here — state carried by the stream, not foreachBatch).
        * Row-local decisions stay in `perBatch`; genuinely stateful ones
        * must be in-plan or the state store never sees them.
        */
      transformStream: DataFrame => DataFrame = identity,
      /** Stop the query after batch 1 and restart from the checkpoint for
        * batch 2 — proves cross-batch state survives a process handover,
        * not just consecutive triggers (st17's durability claim).
        */
      restartBetweenBatches: Boolean = false,
      /** Streaming output mode — stateful in-plan transforms declare
        * theirs and the query must match (st17: update).
        */
      outputMode: String = "append")
      (perBatch: DataFrame => DataFrame): (DataFrame, List[Double]) = {
    val base = ingestLoopBase(tag, key)
    deleteRecursively(base)
    val deltaDir = base.resolve("delta")
    val outDir = base.resolve("out")
    java.nio.file.Files.createDirectories(deltaDir)
    java.nio.file.Files.createDirectories(outDir)
    var walls: List[Double] = Nil
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val tb0 = System.nanoTime()
      val marker = outDir.resolve(s"b$batchId")
      if (!java.nio.file.Files.exists(marker)) {
        if (batch.isEmpty) {
          // an EMPTY micro-batch (no-data trigger) is still a delivered
          // batch — mark it so the trailing delivered-batch check holds —
          // but without a parquet payload: relying on the writer to emit a
          // schema-bearing empty part file is fragile, and an empty marker
          // records neither a wall (nothing was decided) nor a union member
          // (the read below skips payload-less markers)
          java.nio.file.Files.createDirectories(marker)
        } else {
          withShufflePartitions(s, s.sparkContext.defaultParallelism) {
            val staged = base.resolve(s"stage_b$batchId")
            perBatch(batch).write.mode("overwrite").parquet(staged.toString)
            java.nio.file.Files.move(staged, marker)
          }
          walls = walls :+ (System.nanoTime() - tb0) / 1e9
        }
      }
    }
    def startQuery() =
      transformStream(s.readStream.schema(schema).parquet(deltaDir.toString))
        .writeStream
        .outputMode(outputMode)
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
    if (restartBetweenBatches) {
      val q1 = startQuery()
      try {
        addStreamFile(batch1, deltaDir, "b1")
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = startQuery()
      try {
        addStreamFile(batch2, deltaDir, "b2")
        q2.processAllAvailable()
      } finally q2.stop()
    } else {
      val q = startQuery()
      try {
        addStreamFile(batch1, deltaDir, "b1")
        q.processAllAvailable()
        addStreamFile(batch2, deltaDir, "b2")
        q.processAllAvailable()
      } finally q.stop()
    }
    val parts = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(outDir)) {
        st => st.iterator().asScala.map(_.toString).toSeq.sorted
      }
    }
    require(parts.size == 2,
      s"$tag: expected 2 decided micro-batches, saw ${parts.size}")
    // only markers WITH a parquet payload join the union read (an empty
    // delivered batch's marker carries no part files and no schema)
    val decided = committedBatchOutputs(outDir)
    require(decided.nonEmpty, s"$tag: every delivered micro-batch was empty")
    (s.read.parquet(decided: _*), walls)
  }

  /** The ingest harness's base dir for (tag, key) — ONE definition shared
    * with consumers that read the harness's own committed outputs (st18's
    * event-sourced running profile); a second hand-copied path formula
    * would silently desynchronize the moment this one changes.
    */
  private def ingestLoopBase(tag: String, key: String): java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"${tag}_${java.lang.Integer.toHexString(key.hashCode)}")

  /** Marker dirs under `outDir` that carry a parquet payload — the
    * committed non-empty batches (an empty delivered batch marks without
    * payload). Shared by the harness's final union read and st18's prior
    * scan for the same no-drift reason as [[ingestLoopBase]].
    */
  private def committedBatchOutputs(outDir: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(outDir)) return Seq.empty
    scala.util.Using.resource(java.nio.file.Files.list(outDir)) {
      st => st.iterator().asScala.map(_.toString).toSeq.sorted
    }.filter { p =>
      scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(p))) {
        st => st.iterator().asScala.exists(_.getFileName.toString.startsWith("part-"))
      }
    }
  }

  private def st15Probe(s: SparkSession, dir: String, baseDir: String): DataFrame = {
    val train = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val table = d19ContaminationIndex(s, dir, train)
    val eval0 = t(s, baseDir, "documents").select(col("doc_id"), col("text"))
      .where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("substring(text, 65)").as("text"))
    // eval ids are derived non-null (offset over a % filter), so the
    // parity split is total here; st16's corpus-wide split must also
    // route NULL ids
    val batch1 = eval0.where(col("doc_id") % 2 === 0)
    val batch2 = eval0.where(col("doc_id") % 2 =!= 0)
    val (res, walls) = twoBatchIngestLoop(s, "st15_probe", dir + "|" + baseDir,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))), batch1, batch2) { batch =>
      Dedup.crossContaminationIndexed(s, table, batch, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_windows"), col("n_contaminated"))
    }
    lastProbeBatchWalls = walls
    ordered(res.select("doc_id", "n_windows", "n_contaminated"))
  }

  /** st15's loop with the train index from `dir` (soak-scaled) and the
    * SAME eval batches from `baseDir`: ScaleSoak's
    * `st15_fixed_eval_probe` leg — per-batch probe wall flat in train
    * size is the claim; when `dir == baseDir` the output equals the st15
    * query's (spec-pinned).
    */
  def st15FixedEvalProbe(s: SparkSession, dir: String, baseDir: String): DataFrame =
    st15Probe(s, dir, baseDir)

  /** st16's ingest loop: two parity micro-batches of documents decided by
    * [[curationDecision]] through [[twoBatchIngestLoop]] — see the query
    * entry for the batch==streaming argument. NULL doc_ids route to
    * batch1: the parity predicates alone would drop them from BOTH sides
    * (NULL % 2 is NULL) while the one-shot t28 decides them — the
    * union-equals-batch invariant must cover every row.
    */
  private def st16Funnel(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text", "source")
    val batch1 = docs.where(col("doc_id") % 2 === 0 || col("doc_id").isNull)
    val batch2 = docs.where(col("doc_id") % 2 =!= 0)
    val (res, _) = twoBatchIngestLoop(s, "st16_funnel", dir,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))),
      batch1, batch2)(curationDecision)
    ordered(res.select("doc_id", "keep", "reason"))
  }

  /** Per-batch wall seconds of the most recent st17 invocation (batch
    * order) — the soak's evidence that per-batch packing cost is sized by
    * the batch, not the corpus.
    */
  @volatile var lastPackBatchWalls: List[Double] = Nil

  /** st17's packing loop: the corpus arrives as two micro-batches split at
    * the median doc_id — every batch-1 id precedes every batch-2 id, so
    * per-lang id order is preserved across the boundary (NULL ids route to
    * batch 1, first, matching the window's nulls-first order) — and each
    * batch is packed by [[graft.streaming.TokenPackProcessor]], a per-lang
    * running token total on the RocksDB state store. Unlike st16's
    * row-local gates, the batch boundary CUTS the prefix sum: batch ==
    * one-shot (t27's oracle) holds only because the ValueState CARRIES.
    * st17 proves the strongest form of that by STOPPING the query after
    * batch 1 and restarting from the checkpoint for batch 2 — the running
    * totals survive a process handover, not just consecutive triggers.
    * Output lands via the shared idempotent marker discipline.
    */
  private def st17Pack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      coalesce(TF.vocabTokenCount(col("text")), lit(0L)).as("n_tokens"))
    // the batch boundary: one driver-side row (bounded agg), not a scan;
    // the same pass counts rows for the state-store sizing below
    val maxRow = docs.agg(max("doc_id"), count(lit(1))).head()
    val mid = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) / 2
    val nRows = maxRow.getLong(1)
    val batch1 = docs.where(col("doc_id") <= mid || col("doc_id").isNull)
    val batch2 = docs.where(col("doc_id") > mid)
    val pack: DataFrame => DataFrame = stream => stream
      .as[graft.streaming.PackIn]
      .groupByKey(r => r.lang.getOrElse(graft.streaming.TokenPackProcessor.NoLangKey))
      .transformWithState(new graft.streaming.TokenPackProcessor(),
        TimeMode.None(), OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[graft.streaming.PackOut])
      .toDF("doc_id", "lang", "n_tokens", "pack_id")
    // transformWithState requires the RocksDB provider (st07's scoping);
    // state-store partition count pins at the first batch, so the scope
    // covers BOTH query incarnations. Partitions derived from the stream's
    // row volume (see stateStorePartitions), not the session core count.
    val (res, walls) = withConf(s, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      withShufflePartitions(s, stateStorePartitions(s, nRows)) {
      twoBatchIngestLoop(s, "st17_pack", dir,
        StructType(Seq(StructField("doc_id", LongType),
          StructField("lang", StringType), StructField("n_tokens", LongType))),
        batch1, batch2, transformStream = pack,
        restartBetweenBatches = true, outputMode = "update")(b => b)
    } }
    lastPackBatchWalls = walls
    ordered(res.select("doc_id", "lang", "n_tokens", "pack_id"))
  }

  /** st19: q55's last-touch funnel attribution as a stateful stream — see
    * the queries-map comment and [[graft.streaming.FunnelAttributionProcessor]].
    * The split is PER-USER EVEN (each user's first half of events by
    * (ts, event_id) rank lands in batch 1): every user's history is cut
    * mid-activity, so view->click->purchase chains straddle the boundary
    * (11 converted chains carry a batch-1 link at sf0.01, measured) —
    * those purchases convert ONLY because the per-user state carries,
    * which is what StreamingAndPlanSpec's carry-less contrast pins. A
    * range-midpoint ts split looked natural but left the carry almost
    * unexercised (1 straddle at sf0.01, 0 at sf0.001).
    */
  private def st19Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val ev = events(s, dir)
      .where(col("user_id").isNotNull &&
        col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    val ranked = ev
      .withColumn("__rn", row_number().over(wu))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
    val batch1 = ranked.where(expr("__rn <= __n div 2")).drop("__rn", "__n")
    val batch2 = ranked.where(expr("__rn > __n div 2")).drop("__rn", "__n")
    val attribute: DataFrame => DataFrame = stream => stream
      .as[graft.streaming.FunnelIn]
      .groupByKey(_.user_id)
      .transformWithState(new graft.streaming.FunnelAttributionProcessor(),
        TimeMode.None(), OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[graft.streaming.FunnelOut])
      .toDF("user_id", "event_id", "converted")
    val (res, _) = withConf(s, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      // state partitions sized by the stream's row volume, not core count
      withShufflePartitions(s, stateStorePartitions(s, ev.count())) {
      twoBatchIngestLoop(s, "st19_funnel", dir,
        StructType(Seq(StructField("user_id", LongType),
          StructField("event_id", LongType),
          StructField("ts_us", LongType),
          StructField("event_type", StringType))),
        batch1, batch2, transformStream = attribute,
        restartBetweenBatches = true, outputMode = "update")(b => b)
    } }
    ordered(res.groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_conversions")))
  }

  /** st18: the data-quality MONITOR at ingest — each micro-batch is
    * profiled (rows + nulls per column, the MERGEABLE stats; distinct
    * deliberately excluded — it cannot merge across batches without
    * sketch state, t21's territory) and compared against the RUNNING
    * pre-batch profile; a batch whose per-column null rate deviates from
    * the running rate by > 0.10 raises `null_drift` — catching an
    * upstream regression (batch 2 plants one: `text` degraded to NULL for
    * doc_id % 5) the moment it lands instead of at the next d24 snapshot
    * diff. The running state is EVENT-SOURCED from the harness's own
    * committed batch outputs (prior totals = sum over existing markers'
    * rows) rather than a side table: a replayed batch recomputes from the
    * same priors and a crash leaves no half-applied running state — the
    * marker move is the only commit point. Drift compares are two exact
    * integer-derived double divisions (same operands both engines — IEEE
    * division is deterministic); at warehouse scale the same compare runs
    * on DECIMAL(38) cross-multiplies, here rates are the readable form.
    */
  private def st18Profile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source")
    val docs = t(s, dir, "documents").select(cols.map(col): _*)
    val batch1 = docs.where(col("doc_id") % 2 === 0 || col("doc_id").isNull)
    val batch2 = docs.where(col("doc_id") % 2 =!= 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        lit(null).cast("string")).otherwise(col("text")))
    // the closure reads prior batches' committed outputs from the same
    // outDir the harness writes (shared ingestLoopBase — one path
    // definition), which is what makes the running state event-sourced
    val outDir = ingestLoopBase("st18_profile", dir).resolve("out")
    def slimProfile(df: DataFrame): DataFrame = {
      val aggs = count(lit(1)).as("n_rows") +: cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col("n_rows"),
            col(s"__nulls_$c").as("n_nulls"))): _*)).as("p"))
        .select("p.col_name", "p.n_rows", "p.n_nulls")
    }
    val decide: DataFrame => DataFrame = batch => {
      val committed = committedBatchOutputs(outDir)
      val prior =
        if (committed.isEmpty)
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("col_name", StringType),
              StructField("prior_rows", LongType),
              StructField("prior_nulls", LongType),
              StructField("prior_batches", LongType))))
        else s.read.parquet(committed: _*)
          .groupBy("col_name")
          .agg(sum("batch_rows").as("prior_rows"),
            sum("batch_nulls").as("prior_nulls"),
            max("batch_seq").as("prior_batches"))
      slimProfile(batch).join(prior, Seq("col_name"), "left")
        .select(col("col_name"),
          (coalesce(col("prior_batches"), lit(0L)) + 1L).as("batch_seq"),
          col("n_rows").as("batch_rows"), col("n_nulls").as("batch_nulls"),
          (coalesce(col("prior_rows"), lit(0L)) + col("n_rows")).as("total_rows"),
          (coalesce(col("prior_nulls"), lit(0L)) + col("n_nulls")).as("total_nulls"),
          when(coalesce(col("prior_rows"), lit(0L)) === 0 || col("n_rows") === 0,
            lit(false))
            .otherwise(
              abs(col("n_nulls").cast("double") / col("n_rows") -
                col("prior_nulls").cast("double") / col("prior_rows")) > 0.10)
            .as("null_drift"))
    }
    val (res, _) = twoBatchIngestLoop(s, "st18_profile", dir,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType),
        StructField("source", StringType))),
      batch1, batch2)(decide)
    ordered(res.select("col_name", "batch_seq", "batch_rows", "batch_nulls",
      "total_rows", "total_nulls", "null_drift"))
  }

  /** embeddings + a slightly perturbed copy of each (id offset by 1e6). */
  private def embWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val mutated = e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
    e.unionByName(mutated)
  }

  // ---- the curation GATES, defined once (round-15 review: t28 composes
  // t20/t23/t25's arithmetic, and a hand-copied gate silently stops
  // composing the moment the original is tuned — so each gate has exactly
  // one Spark definition and one SQL fragment, shared by the standalone
  // query and the funnel) ----

  /** t20's Gopher token gates over one textStats struct. Returns
    * (mean_word_len, alpha_ratio, passes); floors parameterized — t20 uses
    * the paper's 50-token / 2-stopword floors, t28's funnel fixture-sizes
    * them to 10 / 1 (the synthetic vocabulary carries ONE Gopher stopword).
    */
  private def gopherGates(st: Column, tokenFloor: Int, stopFloor: Int)
      : (Column, Column, Column) = {
    val nTok = st.getField("n_tokens")
    val meanLen = when(nTok === 0, lit(null)).otherwise(round(
      st.getField("token_len_sum").cast("double") / nTok, 6))
    val alphaRatio = when(nTok === 0, lit(null)).otherwise(round(
      st.getField("alpha_tokens").cast("double") / nTok, 6))
    val passes = coalesce(nTok.between(tokenFloor, 100000) &&
      meanLen.between(3.0, 10.0) && alphaRatio >= 0.8 &&
      st.getField("gopher_stops") >= stopFloor, lit(false))
    (meanLen, alphaRatio, passes)
  }

  /** t25's repetition fractions + pass over one repetitionStats struct
    * (whether the text was augmented is the caller's business). Returns
    * (dup_line_frac, dup_line_char_frac, top2gram_frac, dup3gram_frac,
    * passes).
    */
  private def repetitionGates(rs: Column)
      : (Column, Column, Column, Column, Column) = {
    val nl = rs.getField("n_lines")
    val nc = rs.getField("n_chars")
    def frac(num: Column, den: Column) =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(num / den.cast("double"), 6))
    val dupLine = frac(rs.getField("dup_line_excess"), nl)
    val dupLineChar = frac(rs.getField("dup_line_char_excess"), rs.getField("line_chars"))
    val top2 = frac(rs.getField("top2_cover"), nc)
    val dup3 = frac(rs.getField("dup3_chars"), nc)
    // the top-2-gram rule carries its applicability floor (see t25)
    val top2Ok = rs.getField("n_2grams") < 20 || top2 <= 0.20
    val passes = coalesce(dupLine <= 0.30 && dupLineChar <= 0.20 &&
      top2Ok && dup3 <= 0.18, lit(false))
    (dupLine, dupLineChar, top2, dup3, passes)
  }

  /** t28/st16's funnel decision over (doc_id, text, source) rows: the
    * per-document keep/drop a curation pipeline applies, FIRST failing
    * gate recorded as the reason. Entirely row-local (three expression
    * walks + the blocklist CASE in one projection, shared by
    * subexpression elimination), which is exactly why the streaming form
    * (st16) equals the batch form per construction. The Gopher floors are
    * the two deliberately fixture-sized parameters (synthetic docs run
    * ~15-30 tokens and the fixture vocabulary carries exactly ONE Gopher
    * stopword), called out not hidden; t25's gates run on RAW text.
    */
  private def curationDecision(docs: DataFrame): DataFrame = {
    val df = docs
      .withColumn("__st", TF.textStats(col("text")))
      .withColumn("__rs", TF.repetitionStats(col("text")))
      .withColumn("__li", TF.langIdScore(col("text")))
    val gBlock = coalesce(col("source").isin("src3", "src7", "src13"), lit(false))
    val gLang = coalesce(col("__li.lang") === "en", lit(false))
    val (_, _, gGopher) = gopherGates(col("__st"), 10, 1)
    val (_, _, _, _, gRep) = repetitionGates(col("__rs"))
    val gQual = coalesce(qualityModelScore(col("__st")) >= 0.55, lit(false))
    val reason = when(gBlock, "blocklist")
      .when(!gLang, "language")
      .when(!gGopher, "gopher")
      .when(!gRep, "repetition")
      .when(!gQual, "quality")
      .otherwise("kept")
    df.select(col("doc_id"), (reason === "kept").as("keep"), reason.as("reason"))
  }

  /** Luhn checksum terms over a fixed-length all-digit string expression
    * `x` — pure integer arithmetic, so BOTH engines replay it from the
    * SAME generated SQL text (Spark SQL and DuckDB agree on substring/
    * CAST/CASE/%): for a 16-digit card the doubled digits are the odd
    * 1-indexed positions (= every second from the right, starting at the
    * second-to-last), the check digit (position 16) is never doubled. The
    * same parity rule over the first 15 positions yields the partial sum
    * the check digit is derived from — one fragment, two uses, zero drift.
    */
  private def luhnSumSql(x: String, len: Int): String =
    (1 to len).map { i =>
      val d = s"CAST(substring($x, $i, 1) AS INT)"
      if (i % 2 == 1) s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString(" + ")

  /** Lambda body validating a 16-digit candidate bound to `x`. */
  private val luhnValidSql = s"((${luhnSumSql("x", 16)}) % 10) = 0"

  /** t30's IPv4 pattern — octet-precise (999.1.2.3 must NOT match), word
    * boundaries, no lookarounds (Java regex and RE2 agree on every form
    * used: alternation, bounded classes, ASCII \b).
    */
  private val ipv4Pat =
    "\\b((25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\\b"

  /** t31's seed-stable shuffle key: two LCG-plus-xorshift rounds over
    * `doc_id` in mod-2^32 space (multipliers 69069 and 1103515245 — the
    * classic public LCG constants), ALL-INTEGER and ANSI-overflow-safe
    * (every intermediate < 2^63: the largest product is
    * (2^32-1) * 1103515245 ≈ 4.7e18). One template generates both dialect
    * texts — the engines differ only in xor spelling (Spark `a ^ b`,
    * DuckDB `xor(a, b)`) and integer division (`div` vs `//`), so the
    * arithmetic itself has exactly one definition and cannot drift.
    */
  private def shuffleKeyExpr(seed: Long, xorFn: (String, String) => String,
      divOp: String): String = {
    val x1 = s"(((doc_id % 4294967296) * 69069 + $seed) % 4294967296)"
    val x2 = s"(${xorFn(x1, s"($x1 $divOp 65536)")})"
    val x3 = s"((($x2) * 1103515245 + 12345) % 4294967296)"
    s"(${xorFn(x3, s"($x3 $divOp 1048576)")})"
  }

  /** Per-epoch seed for t31 (epoch folded in so each epoch is a DIFFERENT
    * but equally reproducible permutation — the trainer's reshuffle-per-
    * epoch contract). Classic Numerical-Recipes LCG constants.
    */
  private def epochSeed(epoch: Int): Long = 1664525L + 1013904223L * epoch

  /** st18's mergeable per-column profile (rows + nulls) of relation `rel`
    * in DuckDB SQL — generated from the same column list the Spark side
    * profiles, one fragment per engine pair.
    */
  private def slimProfileSql(rel: String, cols: Seq[String]): String =
    cols.map(c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS batch_rows,
         |  CAST(COALESCE(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS batch_nulls
         |FROM $rel""".stripMargin).mkString("\nUNION ALL\n")

  /** t19's exact per-column profile (ONE pass: Spark plans the
    * multi-column COUNT(DISTINCT) as a single Expand + one shuffle), shared
    * with d24's snapshot-drift diff so the profile arithmetic has exactly
    * one definition (the t28 composition discipline). Returns one row per
    * column: (col_name, n_rows, n_nulls, n_distinct).
    */
  private def columnProfile(df: DataFrame, cs: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cs.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__dist_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.map(c =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__dist_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct")
  }

  /** t23's learned quality score over one textStats struct — rational
    * sigmoid z/(1+|z|), left-to-right literal fold, bit-identical doubles
    * across engines. NULL struct (null text) scores null.
    */
  private def qualityModelScore(st: Column): Column = {
    val nt = st.getField("n_tokens")
    val nc = st.getField("n_chars")
    val fLen = least(nt.cast("double") / 100.0, lit(1.0))
    val fWlen = when(nt === 0, 0.0)
      .otherwise(least(st.getField("token_len_sum").cast("double") / nt / 10.0, lit(1.0)))
    val fPunct = when(nc === 0, 0.0).otherwise(st.getField("punct") / nc.cast("double"))
    val fStop = when(nt === 0, 0.0).otherwise(st.getField("stop_en") / nt.cast("double"))
    val fAlpha = when(nt === 0, 0.0).otherwise(st.getField("alpha_tokens") / nt.cast("double"))
    val fBpe = when(nt === 0, 0.0)
      .otherwise(least(st.getField("bpe").cast("double") / nt / 3.0, lit(1.0)))
    val z = lit(-1.1) + lit(1.2) * fLen + lit(0.8) * fWlen - lit(2.5) * fPunct +
      lit(3.0) * fStop + lit(1.5) * fAlpha - lit(0.4) * fBpe
    when(st.isNull, lit(null).cast("double"))
      .otherwise(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ----
    "t01_text_stats" -> ((s, dir) =>
      // token count via the one-pass TextStatsExpr walk, not the
      // CodegenFallback filter(split(...)) HOF chain (~100x per-row cost)
      ordered(t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        TF.textStats(col("text")).getField("n_tokens").as("n_tokens")))),
    // quality/langid/BPE heuristics: every stat is replicated in the DuckDB
    // oracle (same token split, same ASCII-run BPE regex semantics, same
    // stopword votes + tie-break), so the whole heuristic stack hash-checks
    "t02_text_quality" -> ((s, dir) =>
      ordered(t(s, dir, "documents")
        .withColumn("stats", TF.textStats(col("text"))) // ONE text walk per row
        .select(
          col("doc_id"),
          TF.qualityScoreFromStats(col("stats")).as("quality"),
          TF.langIdFromStats(col("stats")).as("lang_guess"),
          col("stats.bpe").as("bpe_tokens")))),
    "t03_fingerprint_md5" -> ((s, dir) =>
      ordered(t(s, dir, "documents").select(
        col("doc_id"), md5(col("text").cast(BinaryType)).as("fp")))),
    // Unicode NFC canonicalization before fingerprinting — the step that
    // makes decomposed (e + U+0301) and precomposed (é) forms dedup
    // identically. The planted row is DECOMPOSED in-query, so the oracle
    // hash only matches if both engines' NFC implementations agree on the
    // recomposition (java.text.Normalizer vs DuckDB utf8proc).
    "t14_nfc_fingerprint" -> ((s, dir) => {
      val planted = s.range(1).select(lit(9000001L).as("doc_id"),
        lit("cafe\u0301 re\u0301sume\u0301 nai\u0308ve").as("text")) // decomposed
      val nfc = TF.nfcNormalize(col("text"))
      ordered(t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionByName(planted)
        .select(col("doc_id"),
          length(nfc).as("n_chars_nfc"),
          md5(nfc.cast(BinaryType)).as("fp_nfc")))
    }),
    "t04_token_freq" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TF.tokensFast(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),
    "t06_top_bigrams" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TF.shingles(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(30)),
    "t05_lang_distribution" -> ((s, dir) =>
      ordered(t(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("total_chars")))),
    // within-doc repetition (the Gopher-style duplicate-n-gram rule): the
    // multiset of word 3-grams vs its distinct set, as exact integer counts
    // (a duplicate fraction would divide doubles; the counts ARE the
    // contract and the caller picks the threshold). Docs with < 3 tokens
    // have zero 3-grams; NULL text stays NULL on both engines.
    "t13_dup_ngrams" -> ((s, dir) => {
      val g = TF.shingles(col("text"), 3)
      ordered(t(s, dir, "documents").select(
        col("doc_id"),
        size(g).as("n_grams3"),
        (size(g) - size(array_distinct(g))).as("n_dup3")))
    }),
    // Frame-level binary dedup — the video/audio analog of t17's line
    // boilerplate: payloads are sliced into fixed 64-byte frames (no
    // decode needed for dedup), each frame fingerprinted, and frames
    // shared across >= 2 media flagged via the same hash-window shape.
    // Frames slice the HEX rendering of the payload (2 chars/byte):
    // DuckDB cannot substring a BLOB, but both engines slice the ASCII
    // hex string identically — including mid-codepoint byte boundaries
    // the hostile corpus's multibyte text produces, which a charwise
    // text slice would never expose. Scale shape: frames explode to slim
    // (media, hash) rows; one map-side-combined shuffle; one slim hash
    // window; one per-media agg — state O(distinct frames), never a
    // pair join.
    "m04_frame_dedup" -> ((s, dir) => {
      val media = Multimodal.fromText(
        t(s, dir, "documents").where(col("text").isNotNull && length(col("text")) > 0),
        "doc_id", "text")
      val frames = media
        .select(col("media_id"), hex(col("payload")).as("hx"),
          posexplode(sequence(lit(0),
            (ceil(length(col("payload")) / 64.0) - 1).cast(IntegerType))))
        .select(col("media_id"),
          md5(expr("substring(hx, pos * 128 + 1, 128)").cast(BinaryType)).as("fhash"))
      // t17's shape: distinct (hash, media) pairs with per-pair counts,
      // then a slim window for the distinct-media count — collect_set
      // would buffer per-hash media lists in window state
      val pairs = frames.groupBy("fhash", "media_id").agg(count(lit(1)).as("c"))
      val flagged = pairs.withColumn("nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fhash")))
      ordered(flagged.groupBy("media_id").agg(
        sum(col("c")).as("n_frames"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_shared")))
    }),
    // Script-mix accounting — the script/language-consistency curation
    // signal (a "lang=en" doc that is 40% CJK is mislabeled or spam).
    // Counts characters per Unicode BMP block via regexp_count: BMP ranges
    // count identically in Java regex (UTF-16 code units = codepoints
    // inside the BMP) and RE2; astral codepoints match no range on either
    // engine, so no total/other count is emitted (a total would hit the
    // length() code-unit-vs-codepoint divergence). One narrow scan, all
    // counting inside codegen.
    "t18_script_mix" -> ((s, dir) => {
      def blockCount(pattern: String) = regexp_count(col("text"), lit(pattern))
      ordered(t(s, dir, "documents").select(
        col("doc_id"),
        blockCount("[A-Za-z]").as("n_latin"),
        blockCount("[\\u0400-\\u04FF]").as("n_cyrillic"),
        blockCount("[\\u0370-\\u03FF]").as("n_greek"),
        blockCount("[\\u4E00-\\u9FFF]").as("n_cjk"),
        blockCount("[\\u3040-\\u30FF]").as("n_kana"),
        blockCount("[\\u0600-\\u06FF]").as("n_arabic"),
        blockCount("[0-9]").as("n_digit")))
    }),
    // Exact per-column corpus profiling — the first look any pipeline
    // takes at a new 100 TB drop: row count, null count, and exact
    // distinct cardinality per column, in ONE pass (Spark plans the
    // multi-column COUNT(DISTINCT) as a single Expand + one shuffle —
    // no per-column re-scan). At warehouse scale you'd swap
    // count_distinct for approx_count_distinct (HLL, constant state) per
    // column; the exact form here is what DuckDB can hash-pin.
    "t19_profile" -> ((s, dir) =>
      ordered(columnProfile(t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars")))),
    // t19's WAREHOUSE-SCALE mode, declared and tested rather than prose:
    // per-column distinct cardinality via approx_count_distinct (HLL++,
    // constant sketch state per column — no Expand, no distinct shuffle;
    // the only form that survives a 100 TB profile pass). The exact count
    // rides along here purely to GATE the sketch inside the query (q17's
    // error-envelope discipline, |approx-exact| <= 15%): the declared
    // output carries the exact figure + the gate bool, so the DuckDB
    // oracle hash-pins it while the sketch path is what actually executed.
    "t21_profile_approx" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cs = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = count(lit(1)).as("n_rows") +:
        cs.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
          count_distinct(col(c)).as(s"__dist_$c"),
          approx_count_distinct(col(c)).as(s"__approx_$c")))
      val onerow = docs.agg(aggs.head, aggs.tail: _*)
      ordered(onerow.select(explode(array(cs.map(c =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__dist_$c").as("n_distinct"),
          (abs(col(s"__approx_$c") - col(s"__dist_$c")) <=
            col(s"__dist_$c") * lit(0.15)).as("approx_ok"))): _*)).as("p"))
        .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct",
          "p.approx_ok"))
    }),
    // Deterministic data-MIXTURE sampling — the per-source rate control a
    // training-data pipeline applies before packing ("web at 1.0, forums
    // at 0.5, ..."): each source gets a keep probability, and a doc is
    // kept iff its salted-md5 uniform falls under its source's threshold
    // (t08's split discipline, so a doc's fate never changes as the corpus
    // grows — mixtures are reproducible AND incrementally maintainable;
    // rerunning over a grown corpus keeps exactly the old decisions).
    // Weights here derive from the source id (suffix % 4 -> 1/4..4/4),
    // with thresholds expressed as exact 2-hex-char md5 prefixes ("40"/
    // "80"/"c0") so the comparison is integer-exact on both engines.
    // Sources OUTSIDE the mixture spec (unparsable suffix -> null weight)
    // are dropped — the real-world contract: an unknown source
    // contributes nothing rather than silently passing at some default.
    // Scale shape: one narrow pass, no shuffle before the output order.
    // Learned document-quality scoring (round-13 verdict ask #5): the
    // fastText-style LINEAR model every curation pipeline runs after the
    // rule-based filters (t02/t20) — a fixed public-fixture weight vector
    // over one-pass textStats features, squashed and thresholded. Nothing
    // is trained here; the weights are literals (the serving-side shape:
    // training happens offline, scoring is a vectorized expression).
    // Determinism across engines is by construction, not luck: every
    // feature is an exact integer ratio, the dot product folds
    // left-to-right in both engines (IEEE doubles are order-deterministic),
    // and the squash is the RATIONAL sigmoid z/(1+|z|) — no exp/log libm
    // calls whose last ulp could differ between JVM and DuckDB. One narrow
    // codegen pass: no UDF, no shuffle (the trailing sort is the driver's
    // determinism order, bench-skipped).
    "t23_quality_model" -> ((s, dir) => {
      val df = t(s, dir, "documents")
        .withColumn("__st", TF.textStats(col("text"))) // ONE walk per row
      val score = qualityModelScore(col("__st"))
      ordered(df.select(col("doc_id"),
        round(score, 6).as("model_score"),
        coalesce(score >= 0.55, lit(false)).as("keep")))
    }),
    // Gopher REPETITION filters (Rae et al. 2021, App. A1.2 — the
    // within-doc complement of t20's token-level rules): documents
    // dominated by duplicate lines or repeated n-grams are template/spam
    // noise. All fractions derive from RepetitionStatsExpr's exact
    // integer counters (the t07/t13 excess convention) in ONE narrow
    // pass — no explode, no shuffle, no libm; thresholds adapted from
    // the paper (dup-line 0.30, dup-line-chars 0.20, top-2-gram cover
    // 0.20, dup-3-gram mass 0.18). The planted doubled-line docs (every
    // 6th doc gets its text twice, newline-joined) make the line counters
    // hash-observable even on single-line fixtures.
    "t25_repetition_filter" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 6 === 2,
          concat(col("text"), lit("\n"), col("text")))
          .otherwise(col("text")).as("text"))
      val df = aug.withColumn("__rs", TF.repetitionStats(col("text")))
      // the top-2-gram coverage rule's applicability floor (n_2grams < 20
      // exempts short clean docs — Gopher targets long web pages) lives
      // inside the shared repetitionGates with the thresholds
      val (dupLine, dupLineChar, top2, dup3, passes) = repetitionGates(col("__rs"))
      ordered(df.select(col("doc_id"),
        when(col("__rs").isNull, lit(null).cast("int"))
          .otherwise(col("__rs.n_lines")).as("n_lines"),
        dupLine.as("dup_line_frac"),
        dupLineChar.as("dup_line_char_frac"),
        top2.as("top2gram_frac"),
        dup3.as("dup3gram_frac"),
        passes.as("passes")))
    }),
    // N-gram LM perplexity filter (round-15 verdict ask #2): the public
    // CCNet curation step (Wenzek et al. 2020) t23's linear scorer only
    // approximates — score each document by a small language model and
    // threshold on the per-token cost. NgramLmExpr is the engine-exact
    // reduction: fixture bigram/unigram tables with fixed-point integer
    // costs, stupid-backoff lookup (bigram, else unigram + flat penalty,
    // else OOV), integer accumulation, ONE division at the end. The DuckDB
    // oracle replays every lookup via a token/lag join over the SAME
    // literal tables (generated from the fixture arrays — one definition).
    // passes is an integer cross-multiply, not a float threshold compare.
    // One narrow codegen pass, no UDF, no shuffle.
    "t29_lm_perplexity" -> ((s, dir) => {
      val df = t(s, dir, "documents")
        .withColumn("__lm", TF.ngramLmStats(col("text")))
      val n = col("__lm.n_tokens")
      val tot = col("__lm.total_cost")
      ordered(df.select(col("doc_id"),
        coalesce(n, lit(0L)).as("n_tokens"),
        coalesce(tot, lit(0L)).as("total_cost"),
        when(n > 0, round(tot / n.cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("avg_cost"),
        coalesce(n > 0 && tot <= lit(700L) * n, lit(false)).as("passes")))
    }),
    // Character-distribution profiling — the degenerate-text detector
    // (padding runs, progress-bar spam, encoded payloads masquerading as
    // text): distinct code points and the Gini impurity of the character
    // distribution, from ONE CharDistributionExpr walk per row. All
    // accumulation is integer (sum of squared counts), so the Gini is one
    // exact division — no order-dependent float summation, no libm (why
    // this is Gini and not Shannon entropy). Narrow single pass, no UDF,
    // no shuffle beyond the determinism sort.
    "t24_char_distribution" -> ((s, dir) => {
      val df = t(s, dir, "documents")
        .withColumn("__cd", TF.charDistribution(col("text")))
      val n = col("__cd.n_cp")
      val gini = when(col("__cd").isNull || n === 0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - col("__cd.sum_sq") / (n.cast("double") * n), 6))
      ordered(df.select(col("doc_id"),
        when(col("__cd").isNull, lit(null).cast("int"))
          .otherwise(col("__cd.n_distinct")).as("n_distinct_chars"),
        gini.as("char_gini")))
    }),
    // Content-derived language identification (round-14 verdict ask #3):
    // t05 aggregates the fixture's EXISTING lang column; a crawl pipeline
    // must DERIVE language from content. LangIdExpr is the public
    // fastText-langid shape (n-gram features -> linear scores -> argmax)
    // with fixture marker weights and all-integer scoring, so the DuckDB
    // oracle recomputes every score via replace()-count arithmetic. The
    // fixture's text is pseudo-English under every lang label, so ground
    // truth is PLANTED: every doc re-appears at +4e6 rewritten in one
    // language's marker words (lang chosen by doc_id % 4, phrase repeated
    // 1 + doc_id % 3 times so scores vary by row); base docs classify from
    // their own content (en when ' the '/' a ' fire, und when nothing
    // does). One narrow codegen pass, no UDF, no shuffle.
    "t26_language_id" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val phrases = Seq( // index = doc_id % 4 residue
        " der und das nicht der und ",
        " el los que y el que ",
        " le les est une le est ",
        "的了是在的是")
      val planted = phrases.zipWithIndex.map { case (ph, k) =>
        docs.where(col("doc_id") % 4 === k)
          .select((col("doc_id") + 4000000L).as("doc_id"),
            expr(s"repeat('$ph', CAST(1 + doc_id % 3 AS INT))").as("text"))
      }
      val corpus = planted.foldLeft(docs)(_ unionByName _)
      ordered(corpus.withColumn("__li", TF.langIdScore(col("text")))
        .select(col("doc_id"),
          col("__li.lang").as("lang_pred"),
          col("__li.score").as("score"),
          col("__li.margin").as("margin")))
    }),
    // Token-budget sequence packing (round-14 verdict ask #4): t09 packs
    // by characters, but trainers budget by TOKENS. TokenCountExpr is the
    // public greedy longest-prefix subword tokenizer over a fixture vocab
    // (BPE-vocab inference), integer-exact, so the oracle replays the
    // identical walk with a recursive CTE. Same per-lang prefix-sum window
    // as t09 (pack boundary = running token total div 1024), so the plan
    // keeps t09's single-shuffle shape with the count folded into the scan
    // projection.
    "t27_token_packing" -> ((s, dir) =>
      ordered(t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        coalesce(TF.vocabTokenCount(col("text")), lit(0L)).as("n_tokens"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr("coalesce(sum(n_tokens) over (partition by lang order by doc_id " +
            "rows between unbounded preceding and 1 preceding), 0) div 1024").as("pack_id")))),
    // t27's packing with the per-lang MEGA-PARTITION removed — q57/q58's
    // segmentation applied to the third window-family member (the 90%-
    // hot-lang regime the round-17 skew corpus plants): prefix sums
    // decompose EXACTLY across contiguous segments (global exclusive
    // prefix = carry-in + segment-local exclusive prefix), so
    //   1. seg-local exclusive sums run partitioned by (lang, seg) over
    //      doc_id range buckets (largest partition capped at hot/S;
    //      NULL doc_ids route to a -1 segment, preserving the window's
    //      nulls-first order);
    //   2. per-(lang, seg) totals prefix-sum over seg order on a
    //      langs x <=S+1 frame (negligible);
    //   3. pack_id = (carry + local_prefix) div 1024.
    // t27's oracle is reused verbatim: same output, any segmentation.
    "t35_packing_segmented" -> ((s, dir) => {
      val S = 32
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        coalesce(TF.vocabTokenCount(col("text")), lit(0L)).as("n_tokens"))
      val mm = docs.agg(min("doc_id"), max("doc_id")).head()
      val lo = if (mm.isNullAt(0)) 0L else mm.getLong(0)
      val hi = if (mm.isNullAt(1)) 0L else mm.getLong(1)
      val segLen = math.max(1L, (hi - lo) / S + 1)
      val seg = docs.withColumn("seg",
        when(col("doc_id").isNull, lit(-1L))
          .otherwise(((col("doc_id") - lo) / segLen).cast("long")))
      val wLocal = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "seg").orderBy(col("doc_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val local = seg.withColumn("local_prefix",
        coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      val wCarry = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("seg").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val carry = seg.groupBy("lang", "seg")
        .agg(sum("n_tokens").as("seg_tokens"))
        .withColumn("carry", coalesce(sum("seg_tokens").over(wCarry), lit(0L)))
        .select(col("lang").as("__clang"), col("seg").as("__cseg"), col("carry"))
      // NULL-SAFE lang join: a NULL lang is its own window partition in
      // t27 (windows group nulls), and a plain equi-join would drop it
      ordered(local.join(carry,
          local("lang") <=> col("__clang") && local("seg") === col("__cseg"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr("(carry + local_prefix) div 1024").as("pack_id")))
    }),
    // End-to-end curation FUNNEL (t28): the per-document keep/drop decision
    // a C4/Gopher/RefinedWeb-style pipeline actually applies, composed from
    // this engine's proven gates in one pass — blocklisted source, content
    // language (t26's scorer), Gopher token rules (t20), repetition rules
    // (t25, raw text), learned quality score (t23) — with the FIRST failing
    // gate recorded as the drop reason (the operational contract: a
    // curation run must explain every drop). One scan, one projection
    // (subexpression elimination shares the three expression walks), no
    // shuffle beyond the determinism sort. Every gate's arithmetic is an
    // already-oracled mirror; the funnel pins their composition end to end.
    "t28_curation_funnel" -> ((s, dir) =>
      ordered(curationDecision(t(s, dir, "documents")))),
    "t22_mixture_sample" -> ((s, dir) => {
      val n = expr("try_cast(substring(source, 4) AS INT)")
      val bucket = pmod(n, lit(4)) // 0..3 -> keep 1/4, 1/2, 3/4, all
      val fp = md5(concat(lit("mix:"), col("doc_id").cast("string")))
      val keep = bucket === 3 ||
        substring(fp, 1, 2) < when(bucket === 0, "40")
          .when(bucket === 1, "80").when(bucket === 2, "c0")
      ordered(t(s, dir, "documents")
        .where(keep)
        .select(col("doc_id"), col("source"),
          ((bucket + 1).cast("double") / 4.0).as("keep_rate")))
    }),
    // Cross-document boilerplate detection (the CCNet/RefinedWeb curation
    // step: lines repeated across many documents — footers, nav bars,
    // cookie banners — are template noise, not content). A line is
    // boilerplate when it appears in >= 3 DISTINCT docs. The fixture's
    // docs are organic-boilerplate-free, so the query PLANTS footer lines
    // on even doc_ids (the d11 pattern): the oracle then proves the
    // detector finds exactly the planted lines and nothing else — and on
    // the hostile corpus, that line split/trim/md5 agree cross-engine on
    // adversarial text. Scale shape: one map-side-combinable shuffle to
    // distinct (line-hash, doc) pairs, a slim window over the hash for the
    // distinct-doc count (no self-join re-scan — t16's df trick), one
    // final per-doc agg. Never a pair join; state is O(distinct lines).
    "t17_boilerplate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // concat_ws skips NULLs on both engines: a NULL-text doc gains just
      // the two footer lines
      val aug = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat_ws("\n",
          col("text"), lit(BoilerFooter1), lit(BoilerFooter2)))
          .otherwise(col("text")).as("text"))
      val lines = aug.select(col("doc_id"), explode(
        filter(transform(split(col("text"), "\n"), x => trim(x)),
          x => length(x) > 0)).as("line"))
      val pairs = lines
        .groupBy(md5(col("line").cast(BinaryType)).as("h"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      val flagged = pairs.withColumn("nd",
        count(lit(1)).over(Window.partitionBy("h")))
      ordered(flagged.groupBy("doc_id").agg(
        sum(col("c")).as("n_lines"),
        sum(when(col("nd") >= 3, col("c")).otherwise(0L)).as("n_boiler")))
    }),
    // stopword + repetition accounting (exact integer counts, oracled):
    // the natural-language-ness and dedup-pressure signals of a quality filter
    "t07_stopword_repetition" -> ((s, dir) => {
      val toks = TF.tokens(col("text"))
      ordered(t(s, dir, "documents").select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.stopwordCount(col("text"), StopWords).as("n_stopwords"),
        (TF.tokenCount(col("text")) - size(array_distinct(toks))).as("n_repeated")))
    }),
    // Gopher quality rules (Rae et al. 2021, App. A1.1 — the token-level
    // subset; line-level boilerplate is t17's job): word count in
    // [50, 100k], mean word length in [3, 10], >= 80% of words contain an
    // alphabetic character, and >= 2 DISTINCT hits from the paper's
    // 8-stopword list. Output = every doc's metrics + the composite pass
    // flag (token-less/null docs simply fail), hash-pinned line-for-line
    // against the DuckDB mirror.
    // ONE TextStatsExpr walk per row supplies every metric (token count,
    // codepoint token lengths, alpha-token count, distinct-stopword mask)
    // — no per-token lambdas in the hot path, the same t01/t02 discipline.
    "t20_gopher_filter" -> ((s, dir) => {
      val df = t(s, dir, "documents")
        .withColumn("__st", TF.textStats(col("text"))) // ONE walk per row
      val (meanLen, alphaRatio, passes) = gopherGates(col("__st"), 50, 2)
      ordered(df.select(
        col("doc_id"), col("__st.n_tokens").as("n_tokens"),
        meanLen.as("mean_word_len"), alphaRatio.as("alpha_ratio"),
        col("__st.gopher_stops").as("stop_hits"), passes.as("passes")))
    }),
    // ---- dedup family ----
    "d01_dedup_exact" -> ((s, dir) => {
      val doubled = t(s, dir, "documents").select("doc_id", "text")
        .unionByName(t(s, dir, "documents").select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      ordered(Dedup.exact(doubled, Seq("text"), "doc_id").select("doc_id"))
    }),
    "d02_dedup_fingerprint" -> ((s, dir) =>
      ordered(t(s, dir, "documents")
        .groupBy(md5(col("text").cast(BinaryType)).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies")))),
    // portable md5-derived signature family (MinHashSigMd5), so the DuckDB
    // oracle recomputes the identical signatures and checks BOTH the
    // banding condition (some band's slice fully equal) and the estimate
    // threshold — a full hash-match, not rows-only
    "d03_minhash_pairs" -> ((s, dir) =>
      ordered(Dedup.minhashPairs(docsWithNearDups(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
        sigFn = TF.minhashSignatureMd5))),
    // portable 60-bit md5 simhash; banding recall is exactly 1 by
    // pigeonhole (maxHamming 2 < bands 4), so the brute-force all-pairs
    // Hamming oracle reproduces the banded output exactly
    // blocks=6 = combination-key banding (C(6,4)=15 keys of 40 bits): the
    // 100 TB-safe bucket space. Pigeonhole-exact like single-chunk banding,
    // so the output — and the DuckDB oracle match — is identical.
    "d04_simhash_pairs" -> ((s, dir) =>
      ordered(Dedup.simhashPairs(docsWithNearDups(s, dir), "doc_id", "text",
        maxHamming = 2, bands = 4, bits = 60, sigFn = TF.simhash60, blocks = 6)
        .select(col("idA"), col("idB"), col("hamming").cast("int").as("hamming")))),
    // r=1 banding with 16 hashes -> candidate recall at J>=0.5 is ~1
    // (miss < 2e-5), so the DuckDB brute-force exact-Jaccard oracle is a
    // true end-to-end check INCLUDING the LSH candidate stage's recall
    "d05_ngram_jaccard_pairs" -> ((s, dir) =>
      ordered(Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard")))),
    // sign-LSH recall is exactly 1 for the planted pairs (a positively
    // scaled copy keeps every hyperplane sign), and no organic 64-dim pair
    // comes near cosine 0.999 — so the DuckDB brute-force-cosine oracle
    // hash-checks the LSH candidate stage end-to-end, like d05 does for
    // minhash banding
    // targetBucketSize auto-sizes the plane count as the corpus grows
    // (constant bucket occupancy -> linear candidates; the round-7 soak
    // caught fixed-plane LSH going quadratic). At the driver's gate scale
    // the floor of 8 planes binds, so the oracle regime is unchanged.
    // corpusSizeHint: the input is a derived union (2x embeddings), whose
    // count() would be a real Spark job — the hint derives the same number
    // from the base table's parquet METADATA count (cheap) instead
    "d06_embed_near_dup" -> ((s, dir) =>
      ordered(Dedup.embeddingPairs(embWithNearDups(s, dir), "vec_id", "embedding",
        minCosine = 0.999, numPlanes = 8, dim = 64, tables = 8,
        targetBucketSize = 32,
        corpusSizeHint = 2L * t(s, dir, "embeddings").count())
        .select(col("idA"), col("idB"), round(col("cosine"), 4).as("cosine")))),
    // survivors over EXACT-verified jaccard pairs (same recall-1 candidate
    // params as d05), so keep-first selection is DuckDB-oracle-checkable
    // end-to-end; minhash estimated pairs stay covered by d03
    "d07_dedup_survivors" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
      ordered(Dedup.survivors(docs, "doc_id", pairs).select("doc_id"))
    }),
    // exact transitive-closure clusters over the recall-1 exact-Jaccard
    // pairs: the chain doc -> first-token-dropped mutation merges via the
    // shared pair, and any indirect A~B~C chain collapses to one cluster —
    // checked against a DuckDB recursive-CTE reachability oracle
    "d09_dedup_clusters" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
      ordered(Dedup.clusters(docs, "doc_id", pairs)
        .select(col("id").as("doc_id"), col("cluster")))
    }),
    // exact-substring contamination: plant an aligned near-copy of every doc
    // (one in-place char substitution at position 200 — the stride grid
    // stays aligned, which is the regime window-hashing detects) and report
    // per-doc shared-window counts
    "d10_substring_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val edited = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 199), lit("X"),
          expr("substring(text, 201)")).as("text"))
      ordered(Dedup.substringContamination(d.unionByName(edited), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_windows"), col("n_shared")))
    }),
    // quality-aware survivors: the mutated near-dup (first token dropped)
    // is STRICTLY SHORTER than its original, so keep-best-by-length must
    // pick every original — and the cluster label + winning score are part
    // of the oracled output, so a wrong closure or a wrong pick both break
    // the hash
    "d12_best_survivors" -> ((s, dir) => {
      val docs = docsWithNearDups(s, dir).withColumn("score", length(col("text")))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
      ordered(Dedup.bestSurvivors(docs, "doc_id", "score", pairs)
        .select(col("doc_id"), col("cluster"), col("score")))
    }),
    // SEMANTIC curation chain — the embedding-space analog of d12's text
    // chain: near-dup pairs from sign-LSH + cosine verify (d06's recall-1
    // regime) -> exact transitive clusters -> one quality-ranked survivor
    // per cluster. Score is a deterministic int (vec_id % 97), so the
    // cross-engine pick has no float tie-break hazard; the oracle recomputes
    // pairs brute-force, floods the closure with a recursive CTE, and
    // applies the same window pick.
    "d14_semantic_curation" -> ((s, dir) => {
      val e = embWithNearDups(s, dir)
      val pairs = Dedup.embeddingPairs(e, "vec_id", "embedding",
        minCosine = 0.999, numPlanes = 8, dim = 64, tables = 8,
        targetBucketSize = 32,
        corpusSizeHint = 2L * t(s, dir, "embeddings").count())
        .select(col("idA"), col("idB"))
      val scored = e.select(col("vec_id"), (col("vec_id") % 97).as("score"))
      ordered(Dedup.bestSurvivors(scored, "vec_id", "score", pairs)
        .select(col("vec_id"), col("cluster"), col("score")))
    }),
    // snapshot diff: the new snapshot is built in-query from the old one
    // (drop %11 ids, append a suffix to %13 texts, add %17 clones under new
    // ids), so the oracle's full-outer fingerprint join must find EXACTLY
    // the planted delta — adds, removes, and changes — and nothing else
    "d13_corpus_diff" -> ((s, dir) => {
      val old = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val newSnap = old.where(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(old.where(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      ordered(Dedup.corpusDiff(old, newSnap, "doc_id", "text")
        .select(col("id").as("doc_id"), col("status")))
    }),
    // CDC-style snapshot MERGE — the other half of corpus maintenance
    // (d13 detects a delta; d15 applies one): a deterministic batch of
    // updates (every 10th doc, text prefixed), inserts (every 13th doc
    // cloned to a high-id range), and tombstones (every 17th doc) is
    // merged into the documents snapshot by key. Last-writer-wins upsert
    // semantics, duplicate delta keys rejected loudly. One left_anti
    // equi-join + union — the oracle reproduces the merge relationally
    // and pins every surviving row and value.
    "d15_corpus_merge" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val updates = docs.where(col("doc_id") % 10 === 0)
        .withColumn("text", concat(lit("u:"), col("text")))
        .withColumn("op", lit("upsert"))
      val inserts = docs.where(col("doc_id") % 13 === 1)
        .withColumn("doc_id", col("doc_id") + 5000000L)
        .withColumn("text", concat(lit("n:"), col("text")))
        .withColumn("op", lit("upsert"))
      val deletes = docs.where(col("doc_id") % 17 === 3 && col("doc_id") % 10 =!= 0)
        .withColumn("op", lit("delete"))
      val delta = updates.unionByName(inserts).unionByName(deletes)
      ordered(Dedup.mergeSnapshot(docs, delta, "doc_id")
        .select("doc_id", "text", "lang", "source", "n_chars"))
    }),
    // INCREMENTAL ingest dedup — the daily-batch shape: an arriving batch
    // (near-dup mutations of existing docs at +1e6, genuinely-new
    // token-salted docs at +2e6) is deduped against the EXISTING corpus
    // and against its own earlier rows, without ever pairing old x old
    // (the candidate join's A side is batch-only — cost O(batch x
    // occupancy) at any corpus size). Output: the batch's survivors.
    // Oracle: DuckDB brute-force jaccard over new x (old + earlier-new)
    // with the d05 shingle construction — a candidate-stage miss, a wrong
    // asymmetry (old x old pairs, or new-new in the wrong direction), or
    // a verify divergence each changes the survivor set.
    "d17_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mut = docs.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val freshNew = docs.where(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          array_join(transform(split(col("text"), " "), t => concat(t, lit("_xq"))),
            " ").as("text"))
      val batch = mut.unionByName(freshNew)
      // the old side comes from the PERSISTED ingest index (build-once per
      // fixture) — the batch is the only text that gets shingled here; the
      // oracle is unchanged, pinning indexed == inline semantics
      val (bandTable, shTable) = d17IngestIndex(s, dir, docs)
      val pairs = Dedup.incrementalJaccardPairsIndexed(s, bandTable, shTable,
        batch, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
      ordered(batch.join(pairs.select(col("idA").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .select("doc_id"))
    }),
    // SUB-document exact-span dedup (corpus rewrite; Lee et al. 2022's
    // exact-substring dedup on a 100-char non-overlapping grid). Planted:
    // every 4th doc re-appears at +1e6 as original text + a salted tail
    // (its full leading grid spans dedupe away, the mixed boundary span +
    // tail survive), every 10th doc re-appears VERBATIM at +3e6 (every
    // span loses to the lower-id original — the whole copy drops). Oracle:
    // the same grid + first-occurrence window + ordered reassembly in SQL
    // — a wrong winner order, a grid misalignment, or a lost/extra span
    // each changes the rewritten text hash.
    "d18_span_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val salted = d.where(col("doc_id") % 4 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" salt_"), col("doc_id").cast("string")).as("text"))
      val verbatim = d.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      ordered(Dedup.spanDedup(
          d.unionByName(salted).unionByName(verbatim), "doc_id", "text",
          spanChars = 100)
        .withColumnRenamed("id", "doc_id"))
    }),
    // Alignment-robust sub-document dedup: d18 with CONTENT-DEFINED span
    // boundaries (CdcSpans rolling-hash chunking). Planted: every 4th doc
    // re-appears at +1e6 behind a fixed 37-char prefix — OFF any fixed
    // 100-char grid, the duplicate d18's spanDedup provably misses
    // (spec-pinned) — plus a salted tail; the chunker re-synchronizes
    // inside the copied text, so every interior chunk dedupes away. Every
    // 10th doc re-appears verbatim at +3e6: identical chunks all lose to
    // the lower id and the copy drops entirely. Oracle: the identical
    // rolling polynomial + cut rule + first-occurrence window recomputed
    // with a per-char explode in SQL — a boundary off by one char, a
    // wrong winner, or a lost span each changes the rewritten text hash.
    "d20_cdc_span_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val offgrid = d.where(col("doc_id") % 4 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit(cdcOffGridPrefix), col("text"),
            lit(" tail_"), col("doc_id").cast("string")).as("text"))
      val verbatim = d.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      ordered(Dedup.cdcSpanDedup(
          d.unionByName(offgrid).unionByName(verbatim), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"))
    }),
    // Alignment-robust decontamination: d11 with CONTENT-DEFINED windows.
    // d11's eval slices MUST start at a stride-aligned offset (65) or its
    // grid misses them — its own documented caveat. Here every 7th doc's
    // eval slice starts at the OFF-GRID offset 38 and is still caught,
    // because both sides chunk on content (the d20 re-synchronization
    // argument applied to detection). Oracle: the identical per-char CDC
    // chunking over train + eval, train collapsed to a distinct >=20-char
    // span-hash set, eval spans membership-checked.
    "d21_cdc_contamination" -> ((s, dir) => {
      val train = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val eval = train.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 38)").as("text"))
      ordered(Dedup.cdcContamination(train, eval, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_spans"), col("n_contaminated")))
    }),
    // URL/source-level dedup + blocklist (round-14 verdict ask #5) — the
    // cheapest high-value curation step in public pipelines (RefinedWeb/C4
    // dedupe by normalized URL before any content pass). The fixture's
    // `source` is a bare label, so URLs are synthesized from it and the
    // planted variants exercise every RFC 3986 normalization rule: every
    // 6th doc re-appears (+5e6) with upper-cased scheme/host, an explicit
    // default port, a trailing slash, and utm_* tracking params — at
    // HIGHER quality, so the planted row must WIN the survivor pick (a
    // normalizer that misses any rule forfeits the collision and the
    // id-ordered hash flips); every 6th-offset-4 doc re-appears (+6e6)
    // with a fragment and a mixed utm/real query string — the fragment and
    // the utm param must be stripped while the real param survives, all
    // hash-observable in its url_norm. Hosts are filtered against a BROADCAST
    // blocklist frame (left_anti — the shape a multi-million-host
    // blocklist needs; isin would compile the list into the plan).
    // Survivor pick is the rank-limit window (row_number=1 over the
    // normalized URL, quality desc, id asc) — map-side WindowGroupLimit,
    // one shuffle, no UDF anywhere: all string surgery is substring_index/
    // split/filter/array_join, codegen'd and mirrored 1:1 in the oracle.
    "d22_url_dedup" -> ((s, dir) => {
      // planted corpus / normalization / blocklist all live in the shared
      // helpers (d22Corpus/urlNormalized/urlAllowed — ONE definition with
      // st20's streaming admission); the one-shot picks the global
      // per-URL best with the rank-limit window (map-side
      // WindowGroupLimit, one shuffle, no UDF anywhere)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("url_norm"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      ordered(urlAllowed(s, d22Corpus(s, dir))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") === 1)
        .select(col("doc_id"), col("url_norm"), col("n_chars")))
    }),
    // URL admission AT INGEST (d22's streaming twin): per-batch
    // normalization + blocklist + per-URL best, merged into a persisted
    // best-per-URL index by the same argmax — associative, so the final
    // index hash-equals d22's one-shot survivors (ONE oracle pins batch ==
    // streaming). The split puts every planted collision group ACROSS the
    // boundary, so batch 2 genuinely replaces and loses against admitted
    // batch-1 state; redelivery skips on the version marker. See
    // st20UrlIngest.
    "st20_streaming_url_dedup" -> ((s, dir) => st20UrlIngest(s, dir)),
    // BM25 postings maintained incrementally at ingest; the final merged
    // index serves the REAL t36 probe and t36's oracle pins batch ==
    // one-shot (see st21Bm25Maintain)
    "st21_streaming_bm25" -> ((s, dir) => st21Bm25Maintain(s, dir)),
    // positional index maintenance at ingest: the maintained phrase index
    // serves the REAL t39 probe and t39's oracle pins batch == one-shot
    // (see st22PhraseMaintain)
    "st22_streaming_phrase" -> ((s, dir) => st22PhraseMaintain(s, dir)),
    // cluster-closure maintenance at ingest: three micro-batches, labels
    // maintained incrementally (stored append-only + merge-bounded
    // remap), final read-side labels == the one-shot d09 closure — the
    // same recursive-CTE oracle pins batch == streaming verbatim
    // (see st23ClosureMaintain)
    "st23_streaming_closure" -> ((s, dir) => st23ClosureMaintain(s, dir)),
    // perceptual dedup at ingest: batches dHashed alone and probed
    // against the persisted band index (the corpus is never re-decoded);
    // pair union over batches == one-shot m05 — the same brute-force
    // oracle pins batch == streaming (see st24PerceptualIngest)
    "st24_streaming_perceptual" -> ((s, dir) => st24PerceptualIngest(s, dir)),
    // ANN index maintenance under CDC (round-10 verdict #2) — d15's merge
    // applied to s14's serving index: the delta deletes each query's two
    // lowest-id planted copies, inserts two fresh copies at new ids, and
    // MOVES one (same id, content becomes the NEXT query's vector — so the
    // upsert must re-assign its coarse cell or the probe misses it). The
    // delta is encoded with the FROZEN models (the ingest-side contract:
    // maintenance never retrains), merged into the slim code table by the
    // same mergeSnapshot d15 uses — the float corpus is never read — and
    // rewritten bucketed so SelectedBucketsCount still prunes (gated
    // in-query). Oracle: brute force over the merged corpus hash-checks
    // the SERVED post-merge ranking — a missed delete, a lost insert, or a
    // stale cell assignment each lands distinct wrong ids in the top-5.
    "d16_ann_index_cdc" -> ((s, dir) => {
      import graft.operators.{IvfIndex, PqIndex}
      val (corpus0, qs) = embWithPlantedDups(s, dir)
      val (baseTable, ivf, pq) = s14ServeIndex(s, dir, corpus0)
      val vecT = corpus0.schema("embedding").dataType
      val del = qs.select(col("vec_id"), explode(sequence(lit(0), lit(1))).as("j"))
        .select((lit(100000L) + col("vec_id") * 10 + col("j")).as("vec_id"),
          lit(null).cast(vecT).as("embedding"), lit("delete").as("op"))
      val news = qs
        .select(col("vec_id"), col("embedding"), explode(sequence(lit(0), lit(1))).as("j"))
        .select((lit(200000L) + col("vec_id") * 10 + col("j")).as("vec_id"),
          col("embedding"), lit("upsert").as("op"))
      val moved = qs.select(col("vec_id").as("q"))
        .join(qs.select(((col("vec_id") + 9) % 10).as("q"), col("embedding")), Seq("q"))
        .select((lit(100000L) + col("q") * 10 + lit(2)).as("vec_id"),
          col("embedding"), lit("upsert").as("op"))
      val delta = del.unionByName(news).unionByName(moved).localCheckpoint()
      val mergedTable = s"d16_ivfpq_merged_${java.lang.Integer.toHexString(dir.hashCode)}"
      // retention sweep at maintenance entry (round-11 verdict #6): a
      // crashed run's merged tables — ANY key, not just this one — are
      // ownerless litter; sweep them all before building this invocation's
      graft.util.TableRetention.sweep(s, "d16_ivfpq_merged_", keep = Set.empty)
      PqIndex.mergeAssigned(s, baseTable,
        PqIndex.encodeDelta(delta, "vec_id", "embedding", ivf, pq),
        "vec_id", mergedTable, buckets = 8)
      try {
        val cand0 = PqIndex.adcCandidatesAssigned(s, mergedTable, qs, "vec_id",
          "embedding", ivf, pq, nprobe = 1, candidates = 50)
        // maintenance must PRESERVE the serving contract: the post-merge
        // probe still reads only the probed cells' buckets
        val probedCells = qs
          .select(explode(VF.nearestCells(col("embedding"), ivf.centroids, 1)).as("c"))
          .distinct().count()
        val plan = cand0.queryExecution.executedPlan.toString
        val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
        require(sel.isDefined, "d16: post-merge probe lost bucket pruning at the ADC scan")
        require(sel.get.group(1).toLong <= probedCells,
          s"d16: post-merge probe read ${sel.get.group(1)}/${sel.get.group(2)} " +
            s"buckets for $probedCells probed cells")
        val cand = cand0.localCheckpoint()
        val sizes = cand.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
        require(sizes.length == 10 && sizes.forall { r =>
          r.getLong(1) >= 5L && r.getLong(1) <= 50L },
          "d16: each query must hand 5..50 post-merge ADC candidates to the re-rank")
        // float-side merged corpus for the exact re-rank — the SAME
        // mergeSnapshot applied to the vectors, so index and corpus
        // maintenance share one merge semantics by construction
        val mergedCorpus = Dedup.mergeSnapshot(corpus0, delta, "vec_id")
        val rerank = cand
          .join(mergedCorpus.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("nv")), Seq("neighbor_id"))
          .join(broadcast(qs.select(col("vec_id").as("query_id"),
            col("embedding").as("qv"))), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            VF.cosine(col("qv"), col("nv")).as("cosine"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        rerank.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
          .orderBy(col("query_id").asc, col("rank").asc)
          // the result must OUTLIVE the finally-dropped merged table
          .localCheckpoint()
      } finally s.sql(s"DROP TABLE IF EXISTS $mergedTable")
    }),
    // Streaming CDC upsert — the lakehouse maintenance loop d15 runs once:
    // a stream of delta batches applied to a parquet snapshot via
    // foreachBatch, the micro-batch sink idiom for transactional writes to
    // targets no built-in sink covers. The SAME delta as d15 arrives as
    // two pinned micro-batches (updates+tombstones, then inserts —
    // disjoint key ranges, so final state is batch-order-free by
    // construction); each foreachBatch merges into the snapshot tree and
    // promotes with the staged-rename discipline the sink/compact use. The
    // final snapshot shares d15's oracle, pinning streaming == batch merge
    // semantics end to end.
    "st11_streaming_merge" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"st11_merge_${java.lang.Integer.toHexString(dir.hashCode)}")
      deleteRecursively(base)
      val deltaDir = base.resolve("delta")
      java.nio.file.Files.createDirectories(deltaDir)
      val snap = base.resolve("snapshot")
      docs.write.parquet(snap.toString)
      val updates = docs.where(col("doc_id") % 10 === 0)
        .withColumn("text", concat(lit("u:"), col("text")))
        .withColumn("op", lit("upsert"))
      val deletes = docs.where(col("doc_id") % 17 === 3 && col("doc_id") % 10 =!= 0)
        .withColumn("op", lit("delete"))
      val inserts = docs.where(col("doc_id") % 13 === 1)
        .withColumn("doc_id", col("doc_id") + 5000000L)
        .withColumn("text", concat(lit("n:"), col("text")))
        .withColumn("op", lit("upsert"))
      val stream = s.readStream.schema(updates.schema).parquet(deltaDir.toString)
      val applyBatch: (DataFrame, Long) => Unit = (batch, _) =>
        if (!batch.isEmpty) {
          // crash inside a previous promote leaves the contract path empty
          // with the complete tree at .next (or .old) — recover FIRST, so
          // the merge always reads a complete snapshot
          graft.util.Fs.recoverStaged(snap)
          val staged = java.nio.file.Paths.get(snap.toString + ".next")
          Dedup.mergeSnapshot(s.read.parquet(snap.toString), batch, "doc_id")
            .write.mode("overwrite").parquet(staged.toString)
          // promote: old aside -> staged in -> old swept; every crash
          // state recoverable by recoverStaged (see its contract)
          graft.util.Fs.promoteStaged(snap)
        }
      val q = stream.writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
      try {
        addStreamFile(updates.unionByName(deletes), deltaDir, "b1")
        q.processAllAvailable()
        addStreamFile(inserts, deltaDir, "b2")
        q.processAllAvailable()
      } finally q.stop()
      ordered(s.read.parquet(snap.toString)
        .select("doc_id", "text", "lang", "source", "n_chars"))
    }),
    // Streaming ANN index maintenance — d16's delta arriving as TWO
    // micro-batches (deletes+moved, then inserts — disjoint key ranges,
    // so final state is batch-order-free by construction) applied to
    // s14's serving index through foreachBatch: each batch is encoded
    // with the frozen models and merged into a NEW bucketed table
    // version (the snapshot-versioned maintenance loop — the float
    // corpus is never read, and readers of version N are never torn by
    // the write of N+1). The final version is served with the same
    // pruning + candidate gates as d16 and shares its oracle: one hash
    // pins streaming == batch index maintenance, the st11/d15 discipline.
    "st12_ann_index_stream" -> ((s, dir) => {
      import graft.operators.PqIndex
      val (corpus0, qs) = embWithPlantedDups(s, dir)
      val (baseTable, ivf, pq) = s14ServeIndex(s, dir, corpus0)
      val vecT = corpus0.schema("embedding").dataType
      val del = qs.select(col("vec_id"), explode(sequence(lit(0), lit(1))).as("j"))
        .select((lit(100000L) + col("vec_id") * 10 + col("j")).as("vec_id"),
          lit(null).cast(vecT).as("embedding"), lit("delete").as("op"))
      val moved = qs.select(col("vec_id").as("q"))
        .join(qs.select(((col("vec_id") + 9) % 10).as("q"), col("embedding")), Seq("q"))
        .select((lit(100000L) + col("q") * 10 + lit(2)).as("vec_id"),
          col("embedding"), lit("upsert").as("op"))
      val news = qs
        .select(col("vec_id"), col("embedding"), explode(sequence(lit(0), lit(1))).as("j"))
        .select((lit(200000L) + col("vec_id") * 10 + col("j")).as("vec_id"),
          col("embedding"), lit("upsert").as("op"))
      val key = java.lang.Integer.toHexString(dir.hashCode)
      val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"st12_annidx_$key")
      deleteRecursively(base)
      val deltaDir = base.resolve("delta")
      java.nio.file.Files.createDirectories(deltaDir)
      // version tables are keyed by the sink's BATCH ID — the foreachBatch
      // exactly-once idiom: a batch redelivered after a crash-restart
      // rewrites ITS OWN table (mode overwrite), so replay is idempotent
      // instead of minting a phantom version
      def versionTable(batchId: Long) = s"st12_ivfpq_b${batchId}_$key"
      // retention sweep at maintenance entry (round-11 verdict #6): the old
      // per-key pre-drop only covered THIS run's rerun; a crashed run with
      // a different fixture key (or a batch id outside the expected range)
      // left versions behind forever. Sweep the whole version-table prefix
      // — this run creates its versions after this point.
      graft.util.TableRetention.sweep(s, "st12_ivfpq_", keep = Set.empty)
      var current = baseTable
      val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stream = s.readStream.schema(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding", vecT),
          org.apache.spark.sql.types.StructField("op",
            org.apache.spark.sql.types.StringType))))
        .parquet(deltaDir.toString)
      val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) =>
        if (!batch.isEmpty) {
          val next = versionTable(batchId)
          PqIndex.mergeAssigned(s, current,
            PqIndex.encodeDelta(batch, "vec_id", "embedding", ivf, pq),
            "vec_id", next, buckets = 8)
          current = next
          applied += batchId
        }
      val q = stream.writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch(applyBatch: (DataFrame, Long) => Unit).start()
      try {
        addStreamFile(del.unionByName(moved), deltaDir, "b1")
        q.processAllAvailable()
        addStreamFile(news, deltaDir, "b2")
        q.processAllAvailable()
      } finally q.stop()
      try {
        require(applied.size == 2 && current == versionTable(applied.last),
          s"st12: expected 2 delta micro-batches, applied ${applied.size}")
        val cand0 = PqIndex.adcCandidatesAssigned(s, current, qs, "vec_id",
          "embedding", ivf, pq, nprobe = 1, candidates = 50)
        val probedCells = qs
          .select(explode(VF.nearestCells(col("embedding"), ivf.centroids, 1)).as("c"))
          .distinct().count()
        val plan = cand0.queryExecution.executedPlan.toString
        val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
        require(sel.isDefined, "st12: post-stream probe lost bucket pruning at the ADC scan")
        require(sel.get.group(1).toLong <= probedCells,
          s"st12: probe read ${sel.get.group(1)}/${sel.get.group(2)} buckets " +
            s"for $probedCells probed cells")
        val cand = cand0.localCheckpoint()
        val sizes = cand.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
        require(sizes.length == 10 && sizes.forall { r =>
          r.getLong(1) >= 5L && r.getLong(1) <= 50L },
          "st12: each query must hand 5..50 post-stream ADC candidates to the re-rank")
        val mergedCorpus = Dedup.mergeSnapshot(corpus0,
          del.unionByName(moved).unionByName(news), "vec_id")
        val rerank = cand
          .join(mergedCorpus.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("nv")), Seq("neighbor_id"))
          .join(broadcast(qs.select(col("vec_id").as("query_id"),
            col("embedding").as("qv"))), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            VF.cosine(col("qv"), col("nv")).as("cosine"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        rerank.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
          .orderBy(col("query_id").asc, col("rank").asc)
          // the result must OUTLIVE the finally-dropped version tables
          .localCheckpoint()
      } finally (0L to 3L).map(versionTable)
        .foreach(tbl => s.sql(s"DROP TABLE IF EXISTS $tbl"))
    }),
    // Streaming corpus ingestion with online near-dup rejection — d17's
    // probe + the ingest-index APPEND run as a foreachBatch loop: each
    // micro-batch is deduped against the index (corpus + every EARLIER
    // batch's survivors + its own smaller-id rows), its ADMITTED rows are
    // appended to the index, and the next batch blocks against them.
    // Batch order is pinned by the harness (one file per
    // processAllAvailable), because the semantics genuinely depend on it:
    // survivors-only admission differs from d17's one-shot "pairs against
    // all earlier rows". The fixture makes that difference
    // hash-observable with a jaccard CHAIN of salted token windows of the
    // same docs (shingle-start spans: A=1..18, B=6..23, C=11..28,
    // D=2..18): batch 1 admits A and blocks B on it (J(A,B)=13/23=0.57);
    // batch 2's C pairs only B (J=0.57) — B was REJECTED, never appended,
    // so C must be ADMITTED (J(A,C)=8/28=0.29 < 0.5); a one-shot
    // all-earlier-rows dedup would block C. D (J(A,D)=17/18=0.94) must be
    // BLOCKED by the batch-1 append — proof the append is load-bearing.
    // Unsalted corpus mutations (m1) and salted fresh docs (n2) pin the
    // corpus leg both ways. Oracle: the two-level cascade in SQL — batch-1
    // admission vs corpus + smaller-id batch-1 rows, batch-2 admission vs
    // corpus + batch-1 SURVIVORS + smaller-id batch-2 rows. Index tables
    // are per-invocation (appends mutate them — never d17's shared
    // fixture index); a batch's admitted rows are materialized to parquet
    // BEFORE the append so the probe never re-evaluates against its own
    // appended rows, and the per-batch marker directory makes a fully
    // applied batch's redelivery a skip (a crash BETWEEN append and
    // marker is refused loudly on replay by the append's duplicate-id
    // guard — never silently double-applied).
    "st13_streaming_ingest_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      st13Ingest(s, docs, docs, java.lang.Integer.toHexString(dir.hashCode))
    }),
    // STATE-STORE INTROSPECTION (Spark 4 state data source): run a keyed
    // streaming aggregation to completion, then read its CHECKPOINTED
    // STATE back as a table — the ops surface a 100 TB pipeline needs
    // (inspect a deployment's live state offline: skewed keys, stuck
    // watermarks, state bloat) without touching the pipeline itself. The
    // output is the state contents, NOT the sink's, so the oracle — the
    // same aggregation in SQL over what the stream consumed — pins that
    // the store holds exactly the semantic aggregate: a lost update, a
    // double-applied batch, or a key corrupted across the store's
    // serialization round trip each breaks the hash. sum(event_id), not
    // sum(value): long accumulation is order-independent, double is not.
    "st14_state_introspection" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val agg = stream.groupBy("event_type")
        .agg(count(lit(1)), sum("event_id"))
      val ckpt = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"st14_ckpt_${java.lang.Integer.toHexString(dir.hashCode)}")
      // invocation-fresh checkpoint: a stale one from another fixture at
      // the same path would serve that fixture's state
      deleteRecursively(ckpt)
      val q = agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
        .start()
      try { q.processAllAvailable() } finally q.stop()
      // the state source returns (key struct, value struct, partition_id);
      // value field names are the canonical agg names (count, sum)
      ordered(s.read.format("statestore").load(ckpt.toString)
        .select(col("key.event_type").as("event_type"),
          col("value.count").as("n_events"),
          col("value.sum").as("id_sum")))
    }),
    // TRAIN-vs-EVAL decontamination: every 7th doc contributes a VERBATIM
    // tail slice starting at a stride-aligned offset (65 = 2*32 + 1), so
    // its windows land exactly on the train grid — the planted
    // contamination the operator must find; ids offset to a disjoint range
    "d11_cross_contamination" -> ((s, dir) => {
      val train = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val eval = train.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 65)").as("text"))
      ordered(Dedup.crossContamination(train, eval, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_windows"), col("n_contaminated")))
    }),
    // d11 through a PERSISTED train index (build-once per fixture, like
    // d17's): the probe windows only the EVAL side and joins the slim
    // bucketed hash table — the train corpus text is read once at build,
    // never per probe. Identical output to d11's inline path by
    // construction, so d11's oracle (verbatim tail slices on the stride
    // grid) pins the indexed path too; indexed == inline is spec-pinned,
    // and the spec asserts the probe plan scans documents exactly once
    // (the eval side), never the train side.
    "d19_decontamination_index" -> ((s, dir) => {
      val train = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val eval = train.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 65)").as("text"))
      val table = d19ContaminationIndex(s, dir, train)
      ordered(Dedup.crossContaminationIndexed(s, table, eval, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_windows"), col("n_contaminated")))
    }),
    // STREAMING decontamination (round-13 verdict ask #4): the same eval
    // set arrives as two micro-batches and each is probed inside
    // foreachBatch against d19's persisted train-hash table — the
    // build-once/probe-streaming pairing d17/st13 already have. Idempotent
    // per-batch parquet output + redelivery marker; union over batches ==
    // the one-shot d19 output by construction, so d11's oracle pins this
    // path too.
    "st15_streaming_decontamination" -> ((s, dir) => st15Probe(s, dir, dir)),
    // Overlap-FRACTION decontamination (round-15 verdict ask #3): d11/d19
    // flag ANY shared window — membership can't tell an eval doc that
    // QUOTES one sentence from a LEAKED one. The published discipline
    // (GPT-3 appendix C, Llama) scores the per-eval-doc overlap fraction
    // and thresholds it. Two planted populations make both branches
    // hash-observable: d11's leaked tails (every full window lands on the
    // train grid -> frac 1, flagged) and QUOTED docs embedding exactly one
    // train window (a 32-char unique prefix grid-aligns the 64-char quote;
    // unique filler pushes n_windows up -> frac ~1/7, unflagged). The
    // threshold is an integer cross-multiply (no float compare); same
    // scan/join/groupBy shape as d11 — the fraction is a projection.
    "d23_contamination_fraction" -> ((s, dir) => {
      val train = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val leaked = train.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 65)").as("text"))
      val quoted = train.where(col("doc_id") % 7 === 3 && length(col("text")) >= 64)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(
            rpad(concat(lit("q"), col("doc_id").cast("string")), 32, "x"),
            expr("substring(text, 1, 64)"),
            expr("repeat(concat(' unique-', cast(doc_id as string), '-filler'), 8)"))
            .as("text"))
      ordered(Dedup.contaminationFraction(train, leaked.unionByName(quoted),
        "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_windows"), col("n_contaminated"),
          col("contamination_frac"), col("flagged")))
    }),
    // Profile DRIFT between snapshots (round-15 verdict ask #6): compose
    // t19's per-column profile (shared columnProfile — one definition)
    // with d13's two-sided discipline. Corpus v2 simulates the next drop:
    // rows removed (doc_id % 11), text degraded to NULL (doc_id % 13), a
    // column dropped (n_chars) and one added (rev) — the full-outer join
    // on column name surfaces schema drift as added/removed rows and value
    // drift as (rows/nulls/distinct) deltas, which is the ops check a
    // pipeline runs before promoting a new corpus version. Scale shape:
    // two one-pass profile aggs (each one Expand + one shuffle, output
    // O(columns)) + a trivial O(columns) join — the 100 TB promotion gate
    // costs two scans regardless of row count.
    "d24_profile_drift" -> ((s, dir) => {
      val v1 = t(s, dir, "documents")
      val v2 = v1.where(!coalesce(col("doc_id") % 11 === 0, lit(false)))
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, lit(null).cast("string"))
            .otherwise(col("text")).as("text"),
          col("lang"), col("source"),
          (col("doc_id") % 5).as("rev"))
      val p1 = columnProfile(v1, Seq("doc_id", "text", "lang", "source", "n_chars"))
        .select(col("col_name"), col("n_rows").as("rows1"),
          col("n_nulls").as("nulls1"), col("n_distinct").as("dist1"))
      val p2 = columnProfile(v2, Seq("doc_id", "text", "lang", "source", "rev"))
        .select(col("col_name"), col("n_rows").as("rows2"),
          col("n_nulls").as("nulls2"), col("n_distinct").as("dist2"))
      ordered(p1.join(p2, Seq("col_name"), "full_outer")
        .select(col("col_name"),
          when(col("rows1").isNull, "added")
            .when(col("rows2").isNull, "removed")
            .otherwise("common").as("status"),
          (col("rows2") - col("rows1")).as("rows_delta"),
          (col("nulls2") - col("nulls1")).as("nulls_delta"),
          (col("dist2") - col("dist1")).as("distinct_delta")))
    }),
    // Contamination SPAN INVENTORY (the excision artifact): d11/d23 say
    // WHETHER a doc is contaminated; d26 says WHICH CHARACTERS — the
    // merged grid-window ranges an excision pass blanks when the leaked
    // passage is a fraction of an otherwise-good document (the published
    // remediation that beats dropping the doc). Same two-population eval
    // fixture as d23, producing BOTH span shapes: leaked tails cover a
    // %7==0 doc's grid from char 64 to its end (one long merged span),
    // while the grid-aligned quotes mark exactly [0, 64) of %7==3 docs
    // (one single-window span). Merging is q56's gaps-and-islands
    // machinery on character offsets; the hash join is d11's slim
    // distinct-set equi-join — no new shuffle shape.
    "d26_contamination_spans" -> ((s, dir) => {
      val train = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val leaked = train.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 65)").as("text"))
      val quoted = train.where(col("doc_id") % 7 === 3 && length(col("text")) >= 64)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(
            rpad(concat(lit("q"), col("doc_id").cast("string")), 32, "x"),
            expr("substring(text, 1, 64)"),
            expr("repeat(concat(' unique-', cast(doc_id as string), '-filler'), 8)"))
            .as("text"))
      ordered(Dedup.contaminationSpans(train, leaked.unionByName(quoted),
        "doc_id", "text")
        .select(col("id").as("doc_id"), col("span_idx"),
          col("span_start"), col("span_end")))
    }),
    // Per-cluster QUOTA retention ("soft dedup"): d12 keeps exactly one
    // doc per near-dup cluster; real curation pipelines keep the best N
    // and UPWEIGHT them so retained rows still represent the cluster's
    // mass. Three-member families make the quota observable: original ->
    // first-token-dropped -> first-TWO-tokens-dropped chain-merge into one
    // cluster (d09's closure), score = length keeps the original and the
    // 1-drop mutation (ranks 1-2) and drops the 2-drop tail — while docs
    // whose mutations fall under J=0.5 stay singleton clusters, kept at
    // rank 1 with n_kept 1 (both branches hash-observable). The upweight
    // is emitted as the exact integer pair (cluster_size, n_kept), never a
    // float ratio.
    "d25_cluster_quota" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val drop1 = d.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val drop2 = drop1.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val docs = d.unionByName(drop1).unionByName(drop2)
        .withColumn("score", length(col("text")))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
      ordered(Dedup.quotaSurvivors(docs, "doc_id", "score", pairs, quota = 2)
        .select(col("doc_id"), col("cluster"), col("rank"),
          col("cluster_size"), col("n_kept")))
    }),
    // the t28 funnel applied AT INGEST: documents arrive as micro-batches
    // and each batch is decided inside foreachBatch with NO corpus-wide
    // state — every funnel gate is row-local, so union-over-batches equals
    // the one-shot t28 output BY CONSTRUCTION (NULL ids explicitly routed
    // — see st16Funnel) and t28's oracle pins batch == streaming exactly
    // (the d11/d19/st15 triangulation discipline applied to curation).
    // Results land as one idempotent parquet dir per batch id via the
    // shared twoBatchIngestLoop (redelivery overwrites its own output, a
    // marker skips re-work); the decision itself is exchange-free, so the
    // per-batch cost is the scan + projection + write.
    "st16_streaming_curation" -> ((s, dir) => st16Funnel(s, dir)),
    // Token-budget packing AT INGEST (round-15 verdict ask #1): t27's
    // greedy token walk + prefix-sum binning continued ACROSS micro-batches
    // via transformWithState — the first genuinely cross-batch-stateful
    // LLM op in the st family (st16's gates are row-local; here the batch
    // boundary cuts a running sum, and only the per-lang ValueState makes
    // union-over-batches equal the one-shot t27, whose oracle pins this
    // path). The query restarts between its two batches, so the state's
    // checkpoint durability is exercised, not assumed. See st17Pack.
    "st17_streaming_packing" -> ((s, dir) => st17Pack(s, dir)),
    // Last-touch funnel attribution AT INGEST (q55's streaming twin, st19):
    // the per-user most-recent-view / most-recent-click(+its view) state
    // lives in transformWithState, so a view in one micro-batch attributes
    // a purchase in a LATER one — genuinely cross-batch state on an EVENT
    // HISTORY (st17 carries a running sum; this carries a chain), with the
    // query restarted between batches so the checkpoint carry is proven.
    // The corpus splits per-user evenly (each user's history cut
    // mid-activity — order preserved, chains straddle), per-purchase
    // decisions land via the idempotent marker discipline, and the final
    // per-user rollup over the union hash-equals q55's one-shot output —
    // ONE oracle pins batch == streaming for the whole attribution chain.
    // See st19Funnel.
    "st19_streaming_funnel" -> ((s, dir) => st19Funnel(s, dir)),
    // Profile DRIFT at ingest (d24's streaming twin): each micro-batch is
    // profiled with the mergeable stats and compared against the running
    // pre-batch profile, alerting the moment an upstream regression lands
    // (batch 2 plants one). Running state is event-sourced from the
    // committed batch outputs themselves — replay-safe with no side
    // table. See st18Profile.
    "st18_streaming_profile" -> ((s, dir) => st18Profile(s, dir)),
    "d08_curation_pipeline" -> ((s, dir) => {
      // end-to-end curation: length filter -> exact dedup (md5 fingerprint,
      // deterministic min-id survivor) -> per-doc text accounting
      val filtered = t(s, dir, "documents")
        .where(col("n_chars").between(100, 3000))
      val survivors = filtered
        .groupBy(md5(col("text").cast(BinaryType)).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      ordered(filtered.join(survivors, "doc_id")
        .select(col("doc_id"), col("lang"),
          TF.textStats(col("text")).getField("n_tokens").as("n_tokens")))
    }),
    // ---- training-set mechanics ----
    // deterministic train/val/test split: bucket by the first md5 byte of a
    // salted id rendering — stable across runs, engines, partitionings, and
    // data growth (a doc's split never changes when the corpus grows), the
    // property random() splits can't give a reproducible pipeline
    "t08_deterministic_split" -> ((s, dir) => {
      val fp = md5(concat(lit("split:"), col("doc_id").cast("string")))
      ordered(t(s, dir, "documents").select(
        col("doc_id"),
        when(substring(fp, 1, 2) < "cc", "train")
          .when(substring(fp, 1, 2) < "e6", "val")
          .otherwise("test").as("split")))
    }),
    // sequential packing into ~4000-char bins per language shard: pack_id =
    // floor(running-prefix-chars / budget) over (lang, doc_id) order. The
    // window partitions by lang, so packing parallelizes across shards at
    // scale instead of serializing through one global sort
    "t09_sequence_packing" -> ((s, dir) =>
      ordered(t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"),
        expr("coalesce(sum(n_chars) over (partition by lang order by doc_id " +
          "rows between unbounded preceding and 1 preceding), 0) div 4000").as("pack_id")))),
    // deterministic stratified sampling: rank by a salted hash within each
    // stratum (uniform pseudorandom order) and keep the first N — the
    // reproducible version of sampleBy(), and a partitioned window, so each
    // stratum samples in parallel at scale
    "t10_stratified_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rnd = md5(concat(lit("samp:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("lang")).orderBy(rnd.asc, col("doc_id").asc)
      ordered(t(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 50)
        .select(col("doc_id"), col("lang"), col("rk")))
    }),
    // PII scrubbing: email/phone redaction ahead of training. Patterns use
    // explicit ASCII classes so Java regex (Spark) and RE2 (DuckDB) agree;
    // a synthetic address+number is appended per doc so the redaction is
    // exercised on every row, and the md5 of the redacted text is compared
    "t11_pii_redact" -> ((s, dir) => {
      val aug = concat(col("text"), lit(" contact-"), col("doc_id").cast("string"),
        lit("@example.com ph 555-123-4567"))
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val redacted = regexp_replace(regexp_replace(aug, emailPat, "[EMAIL]"),
        phonePat, "[PHONE]")
      ordered(t(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(aug, lit(emailPat), lit(0))).as("n_emails"),
        md5(redacted.cast(BinaryType)).as("redacted_fp")))
    }),
    // PII v2 (round-15 verdict ask #5): IPs and credit cards, on top of
    // t11's email/phone. The card rule is the real one — a 16-digit run
    // redacts ONLY when its Luhn checksum validates (pure integer
    // arithmetic, so the same generated SQL text runs on both engines) —
    // because blanket digit-run redaction destroys order numbers and
    // timestamps a pipeline must keep. Plants make both branches
    // hash-observable PER ROW: a card whose check digit is DERIVED
    // in-query (valid by construction, varies with doc_id), its +1
    // lookalike (invalid), a real IP, and an octet-overflow lookalike
    // (999.1.2.3) the octet-precise pattern must ignore. Candidate
    // validation runs in array HOFs over regexp_extract_all hits — a few
    // candidates per row, so the CodegenFallback lambda is off the hot
    // path; everything else is one narrow projection.
    "t30_pii_luhn" -> ((s, dir) => {
      val df = t(s, dir, "documents")
        .withColumn("__pfx",
          expr("concat('4', lpad(cast(doc_id % 1000000 as string), 14, '3'))"))
        .withColumn("__chk", expr(s"(10 - (${luhnSumSql("__pfx", 15)}) % 10) % 10"))
        .withColumn("__aug", expr(
          "concat(text, ' card ', __pfx, cast(__chk as string), " +
            "' alt ', __pfx, cast((__chk + 1) % 10 as string), " +
            "' ip 192.168.', cast(doc_id % 256 as string), '.7 bogus 999.1.2.3')"))
        .withColumn("__cands", expr("regexp_extract_all(__aug, '[0-9]{16}', 0)"))
        .withColumn("__valid", expr(s"filter(__cands, x -> $luhnValidSql)"))
        .withColumn("__ipred", regexp_replace(col("__aug"), lit(ipv4Pat), lit("[IP]")))
      ordered(df.select(col("doc_id"),
        size(col("__cands")).as("n_digit16"),
        size(col("__valid")).as("n_cards_valid"),
        size(regexp_extract_all(col("__aug"), lit(ipv4Pat), lit(0))).as("n_ips"),
        md5(expr("aggregate(__valid, __ipred, (acc, x) -> replace(acc, x, '[CARD]'))")
          .cast(BinaryType)).as("redacted_fp")))
    }),
    // Deterministic corpus SHUFFLE (training order): a trainer must walk
    // 100 TB in a seed-stable pseudorandom order, reshuffled each epoch,
    // reproducible across reruns — rand() is none of those. The key is an
    // all-integer LCG+xorshift mix of doc_id (shuffleKeyExpr, one template
    // both engines replay), the order is (key, doc_id) — total even under
    // key collisions — and the output is sharded: pos is per (epoch,
    // shard), NOT a global row_number, because a single-partition global
    // window is the scale-killer; each data-loader rank reads its shard in
    // pos order, which IS the distributed-training read contract. Two
    // epochs pin that the permutation changes with the seed yet stays
    // reproducible. Scale shape: per-row codegen'd arithmetic + one
    // hash-partitioned sort per epoch/shard — no global coordination.
    "t31_corpus_shuffle" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id")
      def keyed(epoch: Int): DataFrame = docs.selectExpr(
        s"$epoch as epoch", "doc_id",
        s"${shuffleKeyExpr(epochSeed(epoch), (a, b) => s"$a ^ $b", "div")} as shuffle_key")
      val sharded = keyed(0).unionByName(keyed(1))
        .withColumn("shard", col("shuffle_key") % 8)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("epoch"), col("shard"))
        .orderBy(col("shuffle_key").asc, col("doc_id").asc)
      ordered(sharded.withColumn("pos", row_number().over(w))
        .select(col("epoch"), col("doc_id"), col("shuffle_key"),
          col("shard"), col("pos")))
    }),
    // Data-mixture PLANNING report — the artifact a training run is
    // configured FROM (Hoffmann-style budget planning): per-language
    // exact token mass via t27's tokenizer (ONE shared definition, Spark
    // expression + vocabTokenCtesSql), its corpus share, and the
    // repetition factor needed to hit a target mixture (epochs =
    // target_share * total / available). Engine-exact: shares and epochs
    // ship as BIGINT floor-divided MILLI-units, never a float ratio —
    // pct * total * 10 stays under 2^63 up to ~1e16-token corpora. One
    // narrow tokenizer pass + an O(langs) aggregate + two broadcast-size
    // joins; the report costs one scan at any corpus size.
    // UPWEIGHTED mixture accounting (round-16 verdict ask #4): d25's quota
    // retention emits cluster_size/n_kept as the exact integer upweight a
    // mixture sampler applies so retained rows still represent their
    // cluster's original mass — and until now nothing CONSUMED it. t34
    // composes the two single definitions: quotaSurvivors (d25's exact
    // planted construction, lang carried through) feeds per-lang mixture
    // mass where every kept row counts mass * cluster_size / n_kept — in
    // MILLIS via integer div, the t33 discipline, so the contract stays
    // engine-exact. Per lang: kept rows, represented rows (counting
    // upweights, ~cluster mass), raw kept mass, upweighted mass, and the
    // upweighted corpus share. The d25-vs-t34 contrast IS the point: a
    // sampler reading raw kept mass under-represents every quota-clipped
    // cluster; the upweighted column is what t22/t33-style planning must
    // consume after quota retention.
    "t34_upweighted_mixture" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      val drop1 = d.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"), col("lang"))
      val drop2 = drop1.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"), col("lang"))
      val docs = d.unionByName(drop1).unionByName(drop2)
        .withColumn("score", length(col("text")))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5, numHashes = 16, bandRows = 1)
      val kept = Dedup.quotaSurvivors(docs, "doc_id", "score", pairs, quota = 2)
        .withColumn("mass",
          coalesce(length(col("text")).cast("long"), lit(0L)))
      val byLang = kept.groupBy("lang").agg(
        count(lit(1)).as("kept_rows"),
        sum(expr("(cluster_size * 1000) div n_kept"))
          .as("represented_rows_millis"),
        sum("mass").as("raw_mass"),
        sum(expr("(mass * cluster_size * 1000) div n_kept"))
          .as("upweighted_mass_millis"))
      ordered(byLang
        .crossJoin(broadcast(
          byLang.agg(sum("upweighted_mass_millis").as("total_millis"))))
        .select(col("lang"), col("kept_rows"), col("represented_rows_millis"),
          col("raw_mass"), col("upweighted_mass_millis"),
          when(col("total_millis") > 0,
            expr("(upweighted_mass_millis * 1000) div total_millis"))
            .as("share_millis")))
    }),
    // Build-once BM25 lexical retrieval (round-17 verdict #8, optional
    // surface growth): the corpus is tokenized ONCE into a postings table
    // bucketed by term (VersionedTable fixture-keyed, d19/s12's staged-swap
    // discipline); the probe selects deterministic data-derived query
    // terms from the vocabulary-sized df table (highest-df tokens under an
    // n_docs/20 df cap — stopword-saturated terms score ~0 everywhere) and
    // ranks top-10 docs by Okapi BM25 (k1=1.2, b=0.75, Lucene's +1 idf
    // floor). Engine-exact per the t16 discipline: integer tf/df/dl/N,
    // per-(term,doc) components rounded to 6 dp then summed as exact
    // DECIMAL, ranking by (rounded score DESC, doc_id ASC). In-query
    // gates: the probe's term IN-list must prune buckets at the postings
    // scan (SelectedBucketsCount), and the probe plan must never re-read
    // document text — the build-once contract, lexical edition.
    "t36_bm25_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = fixtureKey(dir, "documents")
      val idx = graft.util.VersionedTable.ensure(s, "t36_", s"t36_bm25_$key",
        build = name =>
          graft.operators.Bm25Index.build(docs, "doc_id", "text", name),
        usable = n => s.catalog.tableExists(n) &&
          s.catalog.tableExists(n + "_df") &&
          s.catalog.tableExists(n + "_stats"),
        siblings = graft.operators.Bm25Index.siblings)
      // selectTerms refuses loudly on empty/stopword-saturated indexes
      val terms = graft.operators.Bm25Index.selectTerms(s, idx)
      val top = graft.operators.Bm25Index.topK(s, idx, terms)
      val plan = top.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      require(sel.exists(m => m.group(1).toInt < m.group(2).toInt),
        s"t36: probe scan did not prune buckets " +
          s"(${sel.map(_.matched).getOrElse("no bucket pruning in plan")})")
      require(!plan.contains("documents.parquet"),
        "t36: probe plan re-reads document text — the build-once contract " +
          "requires probes to touch only the postings index")
      ordered(top.select(col("doc_id"), col("n_terms"), col("score")))
    }),
    // Hybrid retrieval by reciprocal-rank fusion (Cormack/Clarke/Buettcher
    // 2009 — the standard way heterogeneous rankers combine in a serving
    // stack): BM25 (length-normalized, saturating tf) and plain TF-IDF
    // (raw tf) rank the SAME bucket-pruned probe, each cut to top-20 by
    // (rounded score DESC, doc_id ASC), fused as sum of
    // floor(1e6/(60+rank)) — exact INTEGER micro-units, so the fusion
    // layer is engine-exact by construction and the only float discipline
    // needed is the component rankings' (t36's). The two rankers
    // genuinely disagree (BM25 demotes long docs TF-IDF promotes), so
    // the fusion is observable, and the nullable per-ranker ranks in the
    // output make each contribution auditable. Same build-once index and
    // gates as t36.
    "t37_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = fixtureKey(dir, "documents")
      val idx = graft.util.VersionedTable.ensure(s, "t36_", s"t36_bm25_$key",
        build = name =>
          graft.operators.Bm25Index.build(docs, "doc_id", "text", name),
        usable = n => s.catalog.tableExists(n) &&
          s.catalog.tableExists(n + "_df") &&
          s.catalog.tableExists(n + "_stats"),
        siblings = graft.operators.Bm25Index.siblings)
      // selectTerms refuses loudly on empty/stopword-saturated indexes
      val terms = graft.operators.Bm25Index.selectTerms(s, idx)
      val top = graft.operators.Bm25Index.hybridRrfTopK(s, idx, terms)
      val plan = top.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      require(sel.exists(m => m.group(1).toInt < m.group(2).toInt),
        s"t37: probe scan did not prune buckets " +
          s"(${sel.map(_.matched).getOrElse("no bucket pruning in plan")})")
      require(!plan.contains("documents.parquet"),
        "t37: probe plan re-reads document text — probes touch only the index")
      ordered(top.select(col("doc_id"),
        col("rrf_micros").cast("long").as("rrf_micros"),
        col("bm25_rank").cast("long").as("bm25_rank"),
        col("tfidf_rank").cast("long").as("tfidf_rank")))
    }),
    // BATCH multi-query retrieval (round-18 verdict #2): the production
    // serving/eval-leak-audit shape runs MANY queries per pass, never a
    // per-query loop. Four deterministic data-derived queries (the 12
    // highest-df under-cap terms, term i -> query q(i%4)) probe t36's
    // index as ONE plan: the postings scan prunes buckets for the UNION
    // of all query terms, the request-sized (query_id, token) frame joins
    // broadcast, scores aggregate per (query_id, doc_id) with t36's
    // ROUND(,6)+DECIMAL discipline, and per-query top-10 lands via the
    // rank-limit window (map-side WindowGroupLimit — the d22 pattern,
    // gated in-plan here). DuckDB replays the whole pipeline from the raw
    // table including the term->query assignment.
    "t38_batch_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = fixtureKey(dir, "documents")
      val idx = graft.util.VersionedTable.ensure(s, "t36_", s"t36_bm25_$key",
        build = name =>
          graft.operators.Bm25Index.build(docs, "doc_id", "text", name),
        usable = n => s.catalog.tableExists(n) &&
          s.catalog.tableExists(n + "_df") &&
          s.catalog.tableExists(n + "_stats"),
        siblings = graft.operators.Bm25Index.siblings)
      // dfCapDenom = 1 (admit the whole vocabulary): the synthetic fixture
      // corpus is stopword-saturated by construction (~30 tokens, each in
      // ~77% of docs — exactly ONE passes t36's n/20 cap), and a 1-term
      // "batch" would not exercise the multi-query shape. Common terms
      // score near-tied, which the ROUND(,6) + doc_id tie discipline
      // resolves identically on both engines; a production corpus keeps
      // the default cap.
      val terms = graft.operators.Bm25Index.selectTerms(s, idx, nTerms = 12,
        dfCapDenom = 1)
      require(terms.size == 12, s"t38: expected 12 terms, got ${terms.size}")
      val queries = terms.zipWithIndex
        .groupBy { case (_, i) => i % 4 }.toSeq
        .map { case (q, ts) => (s"q$q", ts.map(_._1)) }
      val top = graft.operators.Bm25Index.batchTopK(s, idx, queries)
      val plan = top.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      require(sel.exists(m => m.group(1).toInt < m.group(2).toInt),
        s"t38: probe scan did not prune buckets for the term union " +
          s"(${sel.map(_.matched).getOrElse("no bucket pruning in plan")})")
      require(plan.contains("WindowGroupLimit"),
        "t38: per-query top-k did not plan as a map-side rank-limit window")
      require(!plan.contains("documents.parquet"),
        "t38: probe plan re-reads document text — probes touch only the index")
      ordered(top)
    }),
    // BATCH hybrid retrieval (round-19 verdict #3): t38's many-query
    // shape x t37's two-ranker fusion in ONE plan — the production
    // serving regime. The same four deterministic data-derived queries
    // as t38 probe the index once (bucket pruning for the term union,
    // broadcast request frame); ONE aggregate carries BOTH component
    // sums per (query_id, doc_id), both per-query ranks are windows over
    // that one frame (no self-join, no cache boundary — the solo path's
    // double-scan hazard is structurally absent), docs outside both
    // rankers' top-20 drop, integer RRF fuses, and per-query top-10
    // lands via the rank-limit window. Per-query slices are verbatim the
    // solo t37 fusion for that query's terms (Bm25Spec pins it); DuckDB
    // replays the whole pipeline from the raw table.
    "t40_batch_hybrid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = fixtureKey(dir, "documents")
      val idx = graft.util.VersionedTable.ensure(s, "t36_", s"t36_bm25_$key",
        build = name =>
          graft.operators.Bm25Index.build(docs, "doc_id", "text", name),
        usable = n => s.catalog.tableExists(n) &&
          s.catalog.tableExists(n + "_df") &&
          s.catalog.tableExists(n + "_stats"),
        siblings = graft.operators.Bm25Index.siblings)
      // t38's derivation verbatim (dfCapDenom = 1 — see t38's note on the
      // stopword-saturated synthetic fixture)
      val terms = graft.operators.Bm25Index.selectTerms(s, idx, nTerms = 12,
        dfCapDenom = 1)
      require(terms.size == 12, s"t40: expected 12 terms, got ${terms.size}")
      val queries = terms.zipWithIndex
        .groupBy { case (_, i) => i % 4 }.toSeq
        .map { case (q, ts) => (s"q$q", ts.map(_._1)) }
      val top = graft.operators.Bm25Index.batchHybridRrfTopK(s, idx, queries)
      val plan = top.queryExecution.executedPlan.toString
      val sels = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findAllMatchIn(plan).toSeq
      require(sels.size == 1 && sels.forall(m => m.group(1).toInt < m.group(2).toInt),
        s"t40: expected ONE bucket-pruned postings scan, saw " +
          s"${sels.map(_.matched).mkString("[", ", ", "]")}")
      require(plan.contains("WindowGroupLimit"),
        "t40: per-query top-k did not plan as a map-side rank-limit window")
      require(!plan.contains("documents.parquet"),
        "t40: probe plan re-reads document text — probes touch only the index")
      ordered(top.select(col("query_id"), col("doc_id"), col("rank"),
        col("rrf_micros"),
        col("bm25_rank").cast("long").as("bm25_rank"),
        col("tfidf_rank").cast("long").as("tfidf_rank")))
    }),
    // Positional / phrase search (round-18 verdict #8, optional depth):
    // the corpus tokenizes ONCE into a positional postings index (token,
    // doc_id, tf, sorted 0-based positions — Lucene's proximity data) plus
    // a slim aggregated bigram-statistics sibling; the probe derives the
    // most frequent bigram from that sibling (count desc, gram asc —
    // never re-reading text, the selectTerms discipline applied to
    // adjacency) and finds every EXACT occurrence via the aligned-offset
    // intersection: each phrase slot's postings vote for candidate start
    // pos - slot, and starts with all slots voting match — one
    // bucket-pruned scan + one groupBy, never an n-way self-join.
    // Overlapping occurrences each count. DuckDB replays tokenize →
    // bigram stats → top gram → positional adjacency from the raw table.
    "t39_phrase_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = fixtureKey(dir, "documents")
      val idx = graft.util.VersionedTable.ensure(s, "t39_", s"t39_pos_$key",
        build = name =>
          graft.operators.Bm25Index.buildPositional(docs, "doc_id", "text", name),
        usable = n => s.catalog.tableExists(n) &&
          s.catalog.tableExists(n + "_2g"),
        siblings = graft.operators.Bm25Index.siblingsPositional)
      val phrase = graft.operators.Bm25Index.derivePhrase(s, idx)
      val hits = graft.operators.Bm25Index.phraseHits(s, idx, phrase)
      val plan = hits.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      require(sel.exists(m => m.group(1).toInt < m.group(2).toInt),
        s"t39: phrase probe did not prune buckets " +
          s"(${sel.map(_.matched).getOrElse("no bucket pruning in plan")})")
      require(!plan.contains("documents.parquet"),
        "t39: probe plan re-reads document text — probes touch only the index")
      ordered(hits.select(col("doc_id"), col("n_hits"), col("first_pos")))
    }),
    // Proximity (sloppy-phrase) search (round-19 verdict #4): t39's
    // aligned-offset vote with slot tolerance — each phrase term may sit
    // up to slop=2 positions right of its nominal slot, matches span at
    // most n-1+slop tokens, still ONE bucket-pruned scan + one groupBy
    // (slop+1 votes per occurrence instead of 1, count DISTINCT slots
    // per anchor). The probe phrase is the most frequent DISTINCT-term
    // bigram from the build-time statistics sibling (repeated-term
    // phrases are refused by the operator — a phantom-match hazard);
    // slop=0 == phraseHits is Bm25Spec-pinned. DuckDB replays tokenize →
    // distinct-term bigram stats → top gram → the same slot-displacement
    // votes from the raw table.
    "t41_proximity_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = fixtureKey(dir, "documents")
      val idx = graft.util.VersionedTable.ensure(s, "t39_", s"t39_pos_$key",
        build = name =>
          graft.operators.Bm25Index.buildPositional(docs, "doc_id", "text", name),
        usable = n => s.catalog.tableExists(n) &&
          s.catalog.tableExists(n + "_2g"),
        siblings = graft.operators.Bm25Index.siblingsPositional)
      val phrase = graft.operators.Bm25Index.derivePhrase(s, idx,
        distinctTerms = true)
      val hits = graft.operators.Bm25Index.proximityHits(s, idx, phrase,
        slop = 2)
      val plan = hits.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      require(sel.exists(m => m.group(1).toInt < m.group(2).toInt),
        s"t41: proximity probe did not prune buckets " +
          s"(${sel.map(_.matched).getOrElse("no bucket pruning in plan")})")
      require(!plan.contains("documents.parquet"),
        "t41: probe plan re-reads document text — probes touch only the index")
      ordered(hits.select(col("doc_id"), col("n_hits"), col("first_pos")))
    }),
    "t33_mixture_plan" -> ((s, dir) => {
      import s.implicits._
      val targets = Seq(("en", 40), ("de", 15), ("es", 15), ("fr", 15),
        ("zh", 15)).toDF("lang", "target_pct")
      val byLang = t(s, dir, "documents")
        .select(col("lang"),
          coalesce(TF.vocabTokenCount(col("text")), lit(0L)).as("nt"))
        .groupBy("lang").agg(sum("nt").as("tokens"))
      ordered(byLang
        .join(broadcast(targets), Seq("lang"), "left")
        .crossJoin(broadcast(byLang.agg(sum("tokens").as("total"))))
        .select(col("lang"), col("tokens"), col("total"),
          expr("(tokens * 1000) div total").as("share_millis"),
          coalesce(col("target_pct"), lit(0)).as("target_pct"),
          when(col("tokens") > 0,
            expr("(coalesce(target_pct, 0) * total * 10) div tokens"))
            .as("epochs_millis")))
    }),
    // The DISPOSITION LEDGER — "where did my data go": every document's
    // final fate across the WHOLE curation chain (funnel gates -> exact
    // dedup -> decontamination), the first question an ops review asks of
    // a 100 TB curation run. Composes ONLY single-definition pieces:
    // curationDecision (t28's gates), d02's md5 min-id survivor window,
    // and crossContamination with sides swapped (flag TRAINING survivors
    // that contain benchmark passages — the published decontamination
    // direction for a train-side ledger). Planted structure populates
    // every stage: exact clones of every 10th doc lose dedup
    // ('duplicate'), every 7th doc's leaked tail forms the benchmark set
    // so kept originals flag 'contaminated', funnel drops keep their
    // first-failing gate as the disposition. Scale shape: the funnel is
    // one projection, dedup is one fingerprint-partitioned rank-limit
    // window, decontamination is the slim distinct-hash equi-join — no
    // stage adds a shape the standalone operators don't already have.
    "t32_disposition_ledger" -> ((s, dir) => {
      val base = t(s, dir, "documents").select("doc_id", "text", "source")
      val clones = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source"))
      val docs = base.unionByName(clones)
      val decided = docs.join(curationDecision(docs), Seq("doc_id"))
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy("__fp").orderBy(col("doc_id").asc)
      val ranked = decided.where(col("keep"))
        .withColumn("__fp", md5(col("text").cast(BinaryType)))
        .withColumn("__rn", row_number().over(wFp))
      val evalSet = base.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 65)").as("text"))
      val survivors = ranked.where(col("__rn") === 1).select("doc_id", "text")
      val flagged = Dedup.crossContamination(evalSet, survivors, "doc_id", "text")
        .select(col("id").as("doc_id"),
          (col("n_contaminated") > 0).as("__cont"))
      ordered(decided.select(col("doc_id"), col("reason"))
        .join(ranked.select(col("doc_id"), col("__rn")), Seq("doc_id"), "left")
        .join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("reason") =!= "kept", col("reason"))
            .when(col("__rn") > 1, lit("duplicate"))
            .when(coalesce(col("__cont"), lit(false)), lit("contaminated"))
            .otherwise(lit("kept")).as("disposition"),
          when(col("reason") =!= "kept", lit("funnel"))
            .when(col("__rn") > 1, lit("dedup"))
            .when(coalesce(col("__cont"), lit(false)), lit("decontamination"))
            .otherwise(lit("kept")).as("stage")))
    }),
    // context-window chunking: split long documents into 1000-char chunks
    // with 100-char overlap (stride 900), stable (doc_id, chunk_idx) keys —
    // the explode-side counterpart of t09's packing. Narrow (no shuffle
    // until the output sort); chunk count derives from length so the last
    // partial chunk is kept iff it has content beyond the previous stride
    "t12_doc_chunking" -> ((s, dir) => {
      val chunk = 1000
      val stride = 900
      val n = length(col("text"))
      // chunks start at 0, stride, 2*stride...; count = ceil(max(len-chunk,0)/stride)+1
      val nChunks =
        ceil(greatest(n - chunk, lit(0)).cast("double") / stride).cast("int") + 1
      ordered(t(s, dir, "documents")
        .select(col("doc_id"), col("text"), nChunks.as("__nc"))
        .select(col("doc_id"), col("text"), posexplode(sequence(lit(0), col("__nc") - 1)))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          length(expr(s"substring(text, pos * $stride + 1, $chunk)")).as("chunk_chars"),
          md5(expr(s"substring(text, pos * $stride + 1, $chunk)").cast(BinaryType)).as("chunk_fp")))
    }),
    // the UDTF surface end-to-end: chunk_spans — a custom Catalyst
    // Generator registered through GraftExtensions, callable from SQL as a
    // table function — replaces t12's posexplode+substring composition.
    // Same windowing arithmetic (ChunkSpans documents the equivalence), so
    // the two formulations share one oracle; a drift between the generator
    // and the relational spelling surfaces as a hash mismatch.
    "t15_chunk_udtf" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      ordered(t(s, dir, "documents")
        .select(col("doc_id"), expr("chunk_spans(text, 1000, 900)"))
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk_text")).as("chunk_chars"),
          md5(col("chunk_text").cast(BinaryType)).as("chunk_fp")))
    }),
    // TF-IDF weighting — the classic relevance/feature transform of a text
    // pipeline. Shape at 100 TB: ONE tokenize+explode pass feeds the
    // (doc, token) partial-agg shuffle, and document frequency attaches via
    // a token-partitioned window over the already-unique (doc, token) rows
    // — one more shuffle, NO self-join diamond (a tf⟕df join re-scans the
    // corpus per branch: column pruning specializes each branch's partial
    // aggregate, defeating ReuseExchange — measured, not guessed). The
    // corpus size joins in as a broadcast 1-row aggregate from a second
    // NARROW scan (text only, no explode; no driver collect). The idf log
    // runs on both engines' libm; round(…,6) absorbs any last-ulp skew
    // (no double is an exact 6-dp tie, so the rounding itself is portable).
    "t16_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").where(col("text").isNotNull)
      // ONE tokenize pass (round-11 verdict #7): tf is materialized via
      // localCheckpoint — it is the AGGREGATED (doc, token, tf) table,
      // far smaller than the text it came from — and both consumers (the
      // df window and the n_docs count) read the materialization. The
      // previous shape re-ran tokensFast over the whole corpus for a
      // 1-row count (the soak matrix's 4.9x-at-x16 two-scan cost);
      // column pruning blocks exchange reuse between the two branches
      // (they prune tf differently), so materializing is the reliable way
      // to make the text walk single-pass.
      val tf = docs
        .select(col("doc_id"), explode(TF.tokensFast(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      // n_docs = docs with >= 1 token = distinct doc_id in tf
      val nDocs = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
      ordered(withDf.crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6)
            .as("tfidf")))
    }),
    // ---- similarity search ----
    "s01_knn_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      // cosine itself is float-precision-fragile across engines; the
      // oracle-checked surface is the exact neighbor ranking
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // Attribute-filtered ANN — the vector-DB pattern: top-k among ONLY the
    // corpus rows matching a metadata predicate (here label parity). The
    // filter applies BEFORE the distance pass (prefilter, exact recall),
    // not as a post-filter of an unfiltered top-k (which silently returns
    // < k or misses matches) — the semantic difference the oracle pins:
    // every returned neighbor must carry the label predicate AND be the
    // true rank among the filtered corpus. Same broadcast-queries narrow
    // corpus pass as s01; the filter prunes the corpus side first.
    "s10_filtered_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.where(col("label") % 2 === 0).select("vec_id", "embedding")
      val qs = e.where(col("vec_id") < 10).select("vec_id", "embedding")
      Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // Two-stage retrieval — the serving pattern that makes 100 TB ANN
    // cheap: a COARSE pass scores int8-quantized vectors (4x less memory
    // bandwidth; cosine is per-vector-scale-invariant, so quantization
    // preserves ranking to first order) and keeps top-100 candidates; an
    // EXACT re-rank touches full floats only for those 100 rows/query.
    // The final top-5 must equal s01's exact ranking — the DuckDB oracle
    // is the plain brute-force ranking, so a coarse stage that drops a
    // true neighbor outside its candidate set breaks the hash. The
    // candidate-set size is asserted in-query (bounded re-rank is the
    // point).
    "s11_two_stage_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val qs = e.where(col("vec_id") < 10)
      def q8(df: DataFrame) = df.select(col("vec_id"),
        transform(VF.quantizeI8(col("embedding")), x => x.cast("float")).as("embedding"))
      // localCheckpoint: the gate's collect AND the re-rank both consume
      // the candidate set; without it the corpus-wide coarse scan (the
      // dominant cost) would execute twice. The materialized set is tiny
      // (queries x 100 rows).
      val coarse = Similarity.bruteForceTopK(q8(e), q8(qs), "vec_id", "embedding", k = 100)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint()
      val sizes = coarse.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
      require(sizes.length == 10 && sizes.forall(_.getLong(1) == 100L),
        s"s11: coarse stage must hand exactly 100 candidates per query")
      val rerank = coarse
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), Seq("neighbor_id"))
        .join(broadcast(qs.select(col("vec_id").as("query_id"), col("embedding").as("qv"))), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), VF.cosine(col("qv"), col("nv")).as("cosine"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      rerank.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    "s02_knn_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val qs = e.where(col("vec_id") < 10)
      // parameters sized for the fixture's neighbor distances (true top-5
      // sit at cosine 0.26-0.39 -> per-plane agreement p~0.6): 4 planes x
      // 6 tables with Hamming-1 multi-probe gives expected recall@5 ~0.97.
      // recall@5 vs the exact ranking is checked INLINE: the driver can
      // only rows-check approximate results, so a recall collapse must
      // surface as a hard err, not a silently-green row
      val approx = Similarity.lshTopK(e, qs, "vec_id", "embedding",
        k = 5, numPlanes = 4, tables = 6, dim = 64, probes = 4)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
      Similarity.requireRecall(approx, exact, Similarity.AnnRecallGate, "s02_knn_lsh")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // int8 scalar quantization of the embedding corpus: per-vector integer
    // stats hash-check the exact quantized values against the same formula
    // in DuckDB (floor(x*127/max|x| + 0.5) — engine-portable rounding)
    "s04_quantize_i8" -> ((s, dir) =>
      ordered(t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(VF.quantizeI8(col("embedding"))))
        .groupBy("vec_id")
        // elements are int8 (the storage contract); the check casts the
        // min/max stats to int to line up with the oracle's INTEGER column
        .agg(count(lit(1)).as("dim"), sum(col("col")).as("qsum"),
          min(col("col")).cast("int").as("qmin"),
          max(col("col")).cast("int").as("qmax")))),
    "s03_knn_ivf" -> ((s, dir) => {
      import graft.operators.IvfIndex
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val qs = e.where(col("vec_id") < 10)
      val model = IvfIndex.train(e, "vec_id", "embedding", k = 8)
      // recall checked inline against the exact ranking — see s02.
      // nprobe sized for the fixture: its vectors are UNCLUSTERED (random
      // unit vectors — random-pair cosine ~0), so recall ≈ probed-mass
      // fraction + locality lift, and 6/8 cells is what holds the 0.9 gate
      // robustly (4/8 sat at ~0.72-0.92 depending on init luck). A real
      // clustered corpus probes nprobe << k; the operator shape is the same.
      val approx = IvfIndex.topK(e, qs, "vec_id", "embedding",
        model, k = 5, nprobe = 6)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
      Similarity.requireRecall(approx, exact, Similarity.AnnRecallGate, "s03_knn_ivf")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the PRODUCTION IVF path at 100 TB: corpus assigned once and persisted
    // bucketed by ivf_cell (saveAssigned), probes read only the probed
    // cells' buckets (topKAssigned). Two inline gates turn any regression
    // into a hard driver err: (1) the corpus scan's SelectedBucketsCount
    // must not exceed the number of distinct probed cells (bucket pruning
    // reached the scan), (2) recall@5 >= 0.9 vs the exact brute-force
    // ranking, as in s02/s03. (Bit-exact bucketed-vs-direct equality is
    // asserted in DedupSimilaritySpec — re-running the whole direct IVF
    // pipeline here would double the query's cost for a check the recall
    // gate already bounds.)
    "s05_knn_ivf_bucketed" -> ((s, dir) => {
      import graft.operators.IvfIndex
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val qs = e.where(col("vec_id") < 10)
      val model = IvfIndex.train(e, "vec_id", "embedding", k = 8)
      val table = s"s05_ivf_assigned_${math.abs(dir.hashCode)}"
      IvfIndex.saveAssigned(e, "vec_id", "embedding", model, table, buckets = 8)
      try {
        // nprobe=6: fixture-sized like s03 (unclustered vectors, see there)
        val approx = IvfIndex.topKAssigned(s, table, qs, "vec_id", "embedding",
          model, k = 5, nprobe = 6)
        val probedCells = qs
          .select(explode(VF.nearestCells(col("embedding"), model.centroids, 6)).as("c"))
          .distinct().count()
        val plan = approx.queryExecution.executedPlan.toString
        val sel = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
        require(sel.isDefined, "bucketed IVF probe lost bucket pruning at the scan")
        require(sel.get.group(1).toLong <= probedCells,
          s"probe read ${sel.get.group(1)} buckets for $probedCells probed cells")
        val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
        Similarity.requireRecall(approx, exact, Similarity.AnnRecallGate, "s05_knn_ivf_bucketed")
          .orderBy(col("query_id").asc, col("rank").asc)
      } finally s.sql(s"DROP TABLE IF EXISTS $table")
    }),
    // the FULL-ORACLE ANN proofs: s02/s03/s05 run the approximate paths in a
    // realistic regime where recall is gated (>= 0.9) but not 1, so the
    // driver can only rows-check them. s06/s07 run the SAME operators over a
    // corpus with planted exact-duplicate neighbors (embWithPlantedDups)
    // where recall is provably 1 — so the DuckDB brute-force ranking oracle
    // hash-checks the approximate pipeline end to end, candidate stage
    // included: a broken bucket join / cell assignment surfaces as a hash
    // mismatch, not a silently-green rows-only row.
    "s06_knn_lsh_planted" -> ((s, dir) => {
      val (corpus, qs) = embWithPlantedDups(s, dir)
      // probes=0: the planted collisions are deterministic, so the proof
      // covers the pure bucket-join path with no multi-probe widening
      Similarity.lshTopK(corpus, qs, "vec_id", "embedding",
          k = 5, numPlanes = 4, tables = 6, dim = 64, probes = 0)
        .select("query_id", "neighbor_id", "rank")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    "s07_knn_ivf_planted" -> ((s, dir) => {
      import graft.operators.IvfIndex
      val (corpus, qs) = embWithPlantedDups(s, dir)
      val model = IvfIndex.train(corpus, "vec_id", "embedding", k = 8)
      // nprobe=1 — maximal pruning: a planted duplicate's assigned cell IS
      // the query's first probed cell (same bits through the same
      // NearestCells expression), so even the single-cell probe provably
      // finds all five
      IvfIndex.topK(corpus, qs, "vec_id", "embedding", model, k = 5, nprobe = 1)
        .select("query_id", "neighbor_id", "rank")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the SERVING split of the bucketed IVF path (round-9 verdict #3): s05
    // re-trains and re-writes its bucketed table per invocation, so its
    // bench number measures index BUILD + probe together and the serving
    // path's real latency is invisible. s12 builds the index ONCE per
    // fixture — bucketed table + persisted centroids, keyed by the
    // fixture's identity, reused across invocations — and the
    // declared query pays only the serving path: centroid load, driver-side
    // probe-cell resolution, bucket-pruned scan of the probed cells
    // (SelectedBucketsCount gated in-query, as in s05). Runs in the PLANTED
    // regime (nprobe=1 provably finds the five exact duplicates — see s07),
    // so the DuckDB brute-force oracle hash-checks the SERVED ranking end
    // to end: probe-only wall AND full-coverage oracle, where s05 keeps the
    // realistic-regime recall-gate shape.
    "s12_knn_ivf_serve" -> ((s, dir) => {
      import graft.operators.IvfIndex
      val (corpus, qs) = embWithPlantedDups(s, dir)
      val (table, model) = s12ServeIndex(s, dir, corpus)
      val approx = IvfIndex.topKAssigned(s, table, qs, "vec_id", "embedding",
        model, k = 5, nprobe = 1)
      // same gate semantics as s05: buckets read must not exceed the
      // distinct probed cells (10 queries at nprobe=1 CAN legitimately
      // cover all 8 cells on an unlucky centroid draw — `selected < total`
      // would flake there; `selected <= probed` is the actual contract)
      val probedCells = qs
        .select(explode(VF.nearestCells(col("embedding"), model.centroids, 1)).as("c"))
        .distinct().count()
      val plan = approx.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      require(sel.isDefined, "s12: serving probe lost bucket pruning at the scan")
      require(sel.get.group(1).toLong <= probedCells,
        s"s12: probe read ${sel.get.group(1)}/${sel.get.group(2)} buckets " +
          s"for $probedCells probed cells")
      approx.select("query_id", "neighbor_id", "rank")
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // Product-quantization retrieval (round-9 verdict #7) — the compressed
    // serving shape beyond s11's int8: vectors L2-normalized, split into 16
    // subvectors, each stored as a byte-sized codebook id (16x compression
    // vs float32). The COARSE pass scores candidates by m table lookups
    // (asymmetric distance) over the slim codes table — never touching the
    // float vectors — and keeps top-100; the EXACT re-rank touches full
    // floats for only those 100 rows/query. Final top-5 must equal s01's
    // exact brute-force ranking (same oracle), so a codebook/encode/ADC
    // regression that drops a true neighbor out of the candidate set breaks
    // the hash. Candidate-set size is asserted in-query, as in s11. (IVF
    // cell pruning composes orthogonally: bucket the codes table by
    // ivf_cell as s12 buckets the floats — full IVF-PQ.)
    "s13_knn_pq_adc" -> ((s, dir) => {
      import graft.operators.PqIndex
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val qs = e.where(col("vec_id") < 10)
      val model = PqIndex.train(e, "vec_id", "embedding", m = 16, k = 256,
        sampleSize = 4096)
      // localCheckpoint: the size gate and the re-rank both consume the
      // candidate set; the corpus-wide ADC scan must not run twice
      val cand = PqIndex.adcCandidates(e, qs, "vec_id", "embedding",
        model, candidates = 100).localCheckpoint()
      val sizes = cand.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
      require(sizes.length == 10 && sizes.forall(_.getLong(1) == 100L),
        "s13: ADC stage must hand exactly 100 candidates per query")
      val rerank = cand
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), Seq("neighbor_id"))
        .join(broadcast(qs.select(col("vec_id").as("query_id"), col("embedding").as("qv"))), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), VF.cosine(col("qv"), col("nv")).as("cosine"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      rerank.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // FULL IVF-PQ serving (round-10 verdict #1) — the composition of s12
    // and s13 into *the* production ANN serving shape: the build-once index
    // table carries (id, ivf_cell, 16 PQ codes) bucketed by cell — no float
    // vectors — so a probe (a) reads ONLY its probed cells' buckets
    // (SelectedBucketsCount gated in-query) and (b) scores those rows by 16
    // table lookups each (ADC) at 16x less scan bytes than the float
    // layout. Exact re-rank touches full floats for only the top-50
    // candidate rows per query. Runs in the PLANTED regime (nprobe=1
    // provably probes the planted duplicates' cell — see s07), so the
    // DuckDB brute-force oracle hash-checks the SERVED ranking end to end:
    // probe-only wall, compressed scan, full-coverage oracle.
    "s14_knn_ivfpq_serve" -> ((s, dir) => {
      import graft.operators.PqIndex
      val (corpus, qs) = embWithPlantedDups(s, dir)
      val (table, ivf, pq) = s14ServeIndex(s, dir, corpus)
      val cand0 = PqIndex.adcCandidatesAssigned(s, table, qs, "vec_id",
        "embedding", ivf, pq, nprobe = 1, candidates = 50)
      // gate BEFORE checkpointing (the checkpointed plan is a LogicalRDD
      // and no longer shows the scan): buckets read must not exceed the
      // distinct probed cells — same contract as s05/s12
      val probedCells = qs
        .select(explode(VF.nearestCells(col("embedding"), ivf.centroids, 1)).as("c"))
        .distinct().count()
      val plan = cand0.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      require(sel.isDefined, "s14: IVF-PQ probe lost bucket pruning at the ADC scan")
      require(sel.get.group(1).toLong <= probedCells,
        s"s14: probe read ${sel.get.group(1)}/${sel.get.group(2)} buckets " +
          s"for $probedCells probed cells")
      // localCheckpoint: the size gate and the re-rank both consume the
      // candidate set; the pruned ADC scan must not run twice
      val cand = cand0.localCheckpoint()
      val sizes = cand.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
      require(sizes.length == 10 && sizes.forall { r =>
        r.getLong(1) >= 5L && r.getLong(1) <= 50L },
        "s14: each query must hand 5..50 ADC candidates to the re-rank")
      val rerank = cand
        .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv")), Seq("neighbor_id"))
        .join(broadcast(qs.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VF.cosine(col("qv"), col("nv")).as("cosine"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      rerank.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // FILTERED vector search over the served IVF-PQ index — s10's
    // pre-filter contract composed with s14's serving layout (the shape
    // real retrieval services need: "nearest neighbors WHERE tenant/lang/
    // split = X" without post-filter recall loss). The label predicate is
    // applied INSIDE the bucket-pruned scan (PushedFilters gated in-query
    // alongside SelectedBucketsCount), so filtered-out rows never reach
    // ADC scoring. Hash-observable by construction: each query gets FIVE
    // exact copies — the two LOWEST ids labeled out of the filter — so an
    // implementation that ignored the predicate would return ids +0,+1,+2
    // (tie-break id asc) where the oracle demands +2,+3,+4.
    "s15_knn_ivfpq_filtered" -> ((s, dir) => {
      import graft.operators.PqIndex
      val e = t(s, dir, "embeddings").select("vec_id", "embedding", "label")
      val qs = e.where(col("vec_id") < 10).select("vec_id", "embedding")
      val planted = qs
        .select(col("vec_id"), col("embedding"), explode(sequence(lit(0), lit(4))).as("j"))
        .select((lit(300000L) + col("vec_id") * 10 + col("j")).as("vec_id"),
          col("embedding"),
          when(col("j") < 2, lit(1)).otherwise(lit(0)).as("label"))
      val corpus = e.unionByName(planted)
      val (table, ivf, pq) = s15ServeIndex(s, dir, corpus)
      val cand0 = PqIndex.adcCandidatesAssigned(s, table, qs, "vec_id",
        "embedding", ivf, pq, nprobe = 1, candidates = 50,
        attrFilter = Some(col("label") === 0))
      val probedCells = qs
        .select(explode(VF.nearestCells(col("embedding"), ivf.centroids, 1)).as("c"))
        .distinct().count()
      val plan = cand0.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      require(sel.isDefined, "s15: filtered probe lost bucket pruning at the ADC scan")
      require(sel.get.group(1).toLong <= probedCells,
        s"s15: probe read ${sel.get.group(1)}/${sel.get.group(2)} buckets " +
          s"for $probedCells probed cells")
      require(plan.contains("EqualTo(label,0)"),
        s"s15: label predicate did not reach the scan as a pushed filter:\n${plan.take(600)}")
      val cand = cand0.localCheckpoint()
      val sizes = cand.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
      require(sizes.length == 10 && sizes.forall { r =>
        r.getLong(1) >= 3L && r.getLong(1) <= 50L },
        "s15: each query must hand 3..50 filtered ADC candidates to the re-rank")
      val rerank = cand
        .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv")), Seq("neighbor_id"))
        .join(broadcast(qs.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VF.cosine(col("qv"), col("nv")).as("cosine"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      rerank.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // SemDeDup-style semantic dedup: k-means cells bound the pairwise
    // cosine comparisons (sum of O(cell^2), nlist ~ sqrt(n)); survivors
    // keep the lowest id of every >= 0.999-cosine group. Planted EXACT
    // copies (+1e6 ids) make the within-cell approximation invisible to
    // the oracle — identical vectors always share a cell, and at 0.999 no
    // organic pair qualifies — so DuckDB's brute-force all-pairs survivor
    // set hash-pins the operator end to end: a cross-cell false negative,
    // a verify threshold drift, or a wrong keep-lowest tie-break each
    // changes the survivor set.
    // MMR-diversified rerank (Carbonell & Goldstein 1998) — the serving
    // pattern when the top-k is full of near-duplicates: greedily pick
    // argmax of rel(q,c) - max_{s in selected} sim(c,s) (lambda = 0.5)
    // from a bounded candidate set. Everything is INTEGER-exact: vectors
    // are int8-quantized (s04's proven-equal quantization) and both rel
    // and the pairwise penalty are integer dot products, so the greedy
    // walk replays identically on both engines (a float MMR would let
    // summation-order noise flip a pick). Max-abs quantization keeps
    // direction but drops per-vector scale, so the quantized dot is not
    // strictly cosine-ordered — the same trade s11's coarse stage makes,
    // and the exact-walk contract is unaffected. Planted structure per query: a
    // TIGHT cluster of 3 near-copies (10q + i/16 * u — the crawl-duplicate
    // class) and 2 moderately-relevant distinct vectors (2q + w) whose
    // mmr margins straddle the int8 resolution — some queries interleave
    // a diverse pick at step 2, others exhaust the tight cluster first,
    // and the oracle's recursive-CTE greedy walk pins every pick either
    // way. Scale shape: candidate top-m is s11's broadcast-queries narrow
    // corpus pass; everything after (pairwise sims, k greedy rounds) is
    // bounded by m*queries rows, never corpus-sized.
    "s17_mmr_rerank" -> ((s, dir) => {
      val m = 20
      val k = 5
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val asD = (c: Column) => transform(c, v => v.cast("double"))
      val qs = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      def noise(off: Int, name: String) =
        e.where(col("vec_id") >= (10 + off) && col("vec_id") < (20 + off))
          .select((col("vec_id") - (10 + off)).as("qid"), col("embedding").as(name))
      val dirs = qs.join(noise(0, "u"), "qid")
        .join(noise(10, "w"), "qid").join(noise(20, "x"), "qid")
      val aRows = dirs
        .select(col("qid"), col("qv"), col("u"),
          explode(sequence(lit(0), lit(2))).as("i"))
        .select((lit(100000L) + col("qid") * 10 + col("i")).as("vec_id"),
          zip_with(asD(col("qv")), asD(col("u")),
            (a, b) => lit(10.0) * a +
              ((col("i") + 1).cast("double") / lit(16.0)) * b).as("vd"))
      def bRow(offset: Int, dcol: String) = dirs
        .select((lit(200000L) + col("qid") * 10 + offset).as("vec_id"),
          zip_with(asD(col("qv")), asD(col(dcol)),
            (a, b) => lit(2.0) * a + b).as("vd"))
      val corpus = e.where(col("vec_id") >= 10)
        .select(col("vec_id"), asD(col("embedding")).as("vd"))
        .unionByName(aRows).unionByName(bRow(0, "w")).unionByName(bRow(1, "x"))
      // int8 quantize both sides; float-cast so the dot expression applies
      // (products <= 127^2, dim 64 -> sums exact in double)
      val q8 = (c: Column) => transform(VF.quantizeI8(c), v => v.cast("float"))
      val cq = corpus.select(col("vec_id").as("cand_id"), q8(col("vd")).as("cz"))
      val qq = qs.select(col("qid").as("query_id"), q8(asD(col("qv"))).as("qz"))
      val scored = cq.crossJoin(broadcast(qq))
        .select(col("query_id"), col("cand_id"),
          VF.dot(col("qz"), col("cz")).cast("long").as("rel"), col("cz"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("rel").desc, col("cand_id").asc)
      val cand = scored.withColumn("__rn", row_number().over(wTop))
        .where(col("__rn") <= m).drop("__rn")
      // the greedy walk runs as ONE mapGroups pass (round-16 advisor
      // refinement: the previous k-round driver loop launched k jobs +
      // a queries*m*(m-1) pairwise-sim join — correct but k sequential
      // barriers): each query's m candidates fit one group, pairwise
      // integer dots compute locally, and the walk replays the exact
      // argmax-with-(mmr desc, cand_id asc)-tie-break the oracle's
      // recursive CTE pins. All arithmetic stays INTEGER (int8 values
      // carried as floats; products summed in Long — identical to
      // VF.dot's exact double sum cast to long at these magnitudes).
      import s.implicits._
      val selected = cand
        .select(col("query_id"), col("cand_id"), col("rel"), col("cz"))
        .as[(Long, Long, Long, Seq[Float])]
        .groupByKey(_._1)
        .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Seq[Float])]) =>
          val cs = it.map { case (_, id, rel, cz) =>
            (id, rel, cz.map(_.toLong).toArray)
          }.toArray.sortBy { case (id, rel, _) => (-rel, id) }
          def dot(a: Array[Long], b: Array[Long]): Long = {
            var acc = 0L; var i = 0
            while (i < a.length) { acc += a(i) * b(i); i += 1 }
            acc
          }
          val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          var step = 1
          while (step <= k && sel.length < cs.length) {
            var bestIdx = -1; var bestMmr = Long.MinValue; var bestId = Long.MaxValue
            var i = 0
            while (i < cs.length) {
              if (!sel.contains(i)) {
                var pen = 0L
                var j = 0
                while (j < sel.length) {
                  val d = dot(cs(i)._3, cs(sel(j))._3)
                  if (j == 0 || d > pen) pen = d
                  j += 1
                }
                val mmr = cs(i)._2 - (if (sel.isEmpty) 0L else pen)
                if (mmr > bestMmr || (mmr == bestMmr && cs(i)._1 < bestId)) {
                  bestMmr = mmr; bestId = cs(i)._1; bestIdx = i
                }
              }
              i += 1
            }
            sel += bestIdx
            out += ((qid, cs(bestIdx)._1, step))
            step += 1
          }
          out.iterator
        }
        .toDF("query_id", "selected_id", "step")
      ordered(selected)
    }),
    "s16_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val corpus = e.unionByName(
        e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      // hint = 2x the fixture row count (a metadata-only count on the
      // parquet scan) — the derived union would otherwise pay a real
      // count job just to size nlist
      ordered(Dedup.semanticDedup(corpus, "vec_id", "embedding",
        minCosine = 0.999, corpusSizeHint = 2L * e.count())
        .select("vec_id"))
    }),
    // the UDAF surface, driver-checked: s01's ranking re-expressed through
    // the typed TopKAggregator registered via functions.udaf — map-side
    // partial top-k means the shuffle carries at most k pairs per group per
    // partition instead of every scored candidate (the at-scale win over the
    // window/row_number formulation). Oracled by the same brute-force
    // ranking SQL as s01, so the aggregator's ordering contract (score desc,
    // id asc) is hash-pinned cross-engine.
    "s08_knn_topk_udaf" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAggregator(5))
      s.udf.register("top_k_pairs", topk) // SQL-facing door, like GraftExtensions
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val q = broadcast(e.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .crossJoin(q)
        .where(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), VF.cosine(col("qv"), col("cv")).as("score"),
          col("neighbor_id").cast("long").as("id"))
      scored.groupBy("query_id")
        .agg(call_udf("top_k_pairs", col("score"), col("id")).as("topk"))
        .select(col("query_id"), posexplode(col("topk")))
        .select(col("query_id"), col("col._2").as("neighbor_id"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // per-label embedding centroids — the aggregation half of k-means /
    // class-prototype computation over an embedding column. posexplode to
    // slim (label, pos, v) triples, then ONE map-side-combinable shuffle on
    // (label, pos): output cardinality is labels x dim regardless of corpus
    // size, the scale-invariant shape. The mean goes through exact
    // DECIMAL(18,6) accumulation (see Q.dsum) so it is independent of
    // partitioning/addition order on either engine — float sums are not.
    "s09_embed_centroids" -> ((s, dir) =>
      ordered(t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"), davg(col("v").cast("double")).as("centroid")))),
    // ---- multimodal ----
    "m01_media_meta" -> ((s, dir) =>
      ordered(Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text")
        .select(col("media_id"), col("meta.mime").as("mime"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.duration_ms").as("duration_ms"),
          length(col("payload")).as("n_bytes")))),
    // REAL codec pass: payloads are genuine PNGs (rendered from the text)
    // and extractFeatures decodes them with javax.imageio. PNG is lossless,
    // so the decoded gray levels equal the text bytes the renderer sampled,
    // and the DuckDB oracle — which has no PNG codec — recomputes the same
    // pixel-lane feature from the hex-decoded text: a broken encode OR
    // decode breaks the hash, as does a wrong decoded width/height.
    "m02_media_features" -> ((s, dir) =>
      ordered(Multimodal.extractFeatures(
        Multimodal.fromTextPng(t(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1), 6).as("f0")))),
    "m03_frame_sample" -> ((s, dir) =>
      ordered(Multimodal.sampleFrames(
        Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text"), n = 4)
        .select(col("media_id"), col("frame_idx"), length(col("frame")).as("frame_bytes")))),
    // PERCEPTUAL image near-dup (round-13 verdict ask #2): m04 dedups
    // exact payload bytes, so a re-encoded or brightness-shifted copy of
    // the same image — the common multimodal duplicate — passes it. m05
    // decodes payloads (real javax.imageio pass), computes a 64-bit dHash
    // over the pixels, and pairs within Hamming<=4 via d04's
    // combination-key banding (blocks=8: C(8,4)=70 keys of 32 bits,
    // pigeonhole-EXACT, so the brute-force DuckDB oracle reproduces the
    // banded output bit-for-bit). Planted: every 7th doc's image re-appears
    // brightness-shifted (+16, clamped), every 9th re-encoded through an
    // RGB raster (different PNG bytes, identical gray levels) — both
    // invisible to m04, both hamming-0-or-near here. The oracle recomputes
    // the dHash from the text bytes the pixels encode (the m02 trick) and
    // brute-forces all pairs.
    // v2 (round-15): identical dHashes — exact-pixel copies, the dominant
    // image-duplicate class — collapse to one representative BEFORE the
    // banding (Dedup.simhashPairsCollapsed), so the C(8,4)=70 combination
    // keys band one row per DISTINCT hash: a mega-cluster of exact copies
    // pairs once through a single group self-join (its own output mass, no
    // 70x banding multiplicity, no pair-dedup shuffle) and can no longer
    // overflow the bucket cap. Output (and the brute-force oracle) is
    // unchanged — the pair VIEW is still O(cluster^2) rows by contract;
    // m06 below is the linear production shape.
    "m05_perceptual_dedup" -> ((s, dir) =>
      ordered(Dedup.simhashPairsCollapsed(m05Sigs(s, dir), "media_id", "dhash",
          maxHamming = 4, bits = 64, sigFn = c => c, blocks = 8)
        .select(col("idA"), col("idB"), col("hamming").cast("int").as("hamming")))),
    // m05's pairs closed into connected components (d09's exact min-label
    // propagation) — the PRODUCTION shape for perceptual dedup: LINEAR in
    // images end-to-end (v2): identical-dHash groups collapse to their
    // min-id rep, only rep pairs feed the closure, and members inherit the
    // rep's cluster label afterwards. Exactness: a member's neighbors are
    // exactly its rep's neighbors (identical signature), so components of
    // the full graph = components of the rep graph with each group attached
    // to its rep; and min-id-per-component is preserved because each rep IS
    // the min id of its group. A curation pipeline keeps min-id survivors
    // from this table. Oracle: brute-force pairs + a recursive-CTE
    // reachability closure over the FULL graph (d09's oracle pattern) —
    // unchanged from v1, pinning the collapse's exactness.
    "m06_perceptual_clusters" -> ((s, dir) => {
      val members = Dedup.collapseExactSigs(m05Sigs(s, dir), "media_id", "dhash")
        .localCheckpoint() // used by both the rep pairing and the final attach
      val reps = members.where(col("id") === col("rep")).select("id", "sig")
      val repPairs = Dedup.simhashPairs(reps, "id", "sig",
        maxHamming = 4, bits = 64, sigFn = c => c, blocks = 8)
      val repClusters = Dedup.clusters(reps, "id", repPairs)
        .select(col("id").as("rep"), col("cluster"))
      ordered(members.join(repClusters, Seq("rep"))
        .select(col("id").as("media_id"), col("cluster")))
    }),
    // Media decode ROBUSTNESS (round-15 verdict ask #9): the m-family's
    // synthesized media are always well-formed, so the decode path's
    // null-row contract never met adversarial bytes in the driver sweep.
    // m07 builds the crawl-reality variants IN-QUERY from every 50th doc
    // (truncated PNG header -> codec throws, mislabeled non-image bytes ->
    // unrecognized, a real 1x16 PNG -> decodes but sits under the dHash
    // grid, palette PNG -> decodes and hashes) and runs them through the
    // SAME extractFeatures/withDHash operators m02/m05 use. The outcome
    // per variant is STRUCTURAL (decoded? dimensions? hash present?) and
    // fully determined by the variant — the oracle pins it as literals, so
    // a decode-path regression (a throw escaping, a thin image hashing, a
    // null row lost) breaks the hash. Runs on the hostile corpus too:
    // hostile text bytes become the PNG pixel source and the mislabeled
    // payload body.
    "m07_media_robustness" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") % 50 === 0)
      // localCheckpoint: BOTH decode operators consume adv — without it the
      // PNG encode+corrupt pass runs twice (the m05Sigs lesson)
      val adv = Multimodal.adversarialMedia(docs, "doc_id", "text").localCheckpoint()
      val f = Multimodal.extractFeatures(adv)
      val d = Multimodal.withDHash(adv)
      // pmod + exact division, NOT div/%: for a negative doc_id Spark's %
      // follows the dividend's sign and div truncates toward zero, which
      // would mislabel the variant and shift the id while the oracle
      // carries doc_id verbatim (review catch — latent until a fixture
      // plants negative ids)
      ordered(f.join(d, Seq("media_id"))
        .select(expr("(media_id - pmod(media_id, 8)) div 8").as("doc_id"),
          expr("CASE pmod(media_id, 8) WHEN 0 THEN 'valid' WHEN 1 THEN 'truncated' " +
            "WHEN 2 THEN 'mislabeled' WHEN 3 THEN 'thin' ELSE 'palette' END")
            .as("variant"),
          col("features").isNotNull.as("decoded"),
          col("width"), col("height"),
          col("dhash").isNotNull.as("has_dhash")))
    }),
    // stateful streaming: running per-user counts via mapGroupsWithState;
    // the FINAL state per user must equal the batch GROUP BY — checked
    // against the DuckDB oracle
    "st02_stateful_counts" -> ((s, dir) => withShufflePartitions(s, 8) {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      // null-keyed events can't hold per-user state (the typed Long key
      // asserts non-null and a NULL "user" is not an identity) — they are
      // excluded HERE and in the oracle; production routes them to a
      // dead-letter lane (found by the round-15 hostile-events probe:
      // one NULL user_id killed the whole stream with
      // NOT_NULL_ASSERT_VIOLATION)
      val counts = stream.where(col("user_id").isNotNull)
        .select(col("user_id").as[Long])
        .groupByKey(identity)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (user: Long, it: Iterator[Long], state: GroupState[Long]) =>
            val n = state.getOption.getOrElse(0L) + it.size
            state.update(n)
            (user, n)
        }.toDF("user_id", "n_events")
      // update-mode emits one row per state change; the final state per user
      // is the max running count
      ordered(drainToMemory(s, counts, "st02", dir, "update")
        .groupBy("user_id").agg(max("n_events").as("n_events")))
    }),
    // watermark + append-mode semantics: only FINALIZED windows (window.end
    // <= watermark = max event time - 30 min) are emitted; the trailing
    // windows stay open and never reach the sink. The no-data micro-batch
    // after the last file flushes the closed state, which is what makes the
    // output deterministic and equal to the batch-computable oracle.
    // arbitrary-state streaming via transformWithState (Spark 4's successor
    // to mapGroupsWithState): typed ValueState + MapState on the RocksDB
    // state store. Running per-user aggregates (count, exact micro-unit
    // sum, distinct event types); the FINAL emission per user must equal
    // the batch GROUP BY the oracle computes. Sums are pre-scaled to exact
    // DECIMAL(18,6) micro longs in the plan, so state only ever adds longs.
    "st07_transform_with_state" -> ((s, dir) => withShufflePartitions(s, 8) {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // transformWithState requires the RocksDB provider; scope it — the
      // query starts AND drains inside this block, and other st queries in
      // the same session keep the default HDFS-backed provider
      withConf(s, "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        // null user_ids excluded on both sides (st02's dead-letter rule);
        // a NULL value coalesces to 0 micros — SQL SUM skips nulls, which
        // is the same arithmetic — so n_events still counts the row
        val typed = stream.where(col("user_id").isNotNull)
          .select(col("user_id"),
            coalesce((col("value").cast(DecimalType(18, 6)) * 1000000)
              .cast(LongType), lit(0L)).as("micros"),
            col("event_type"))
          .as[(Long, Long, String)]
        val stats = typed.groupByKey(_._1)
          .transformWithState(new graft.streaming.UserStatsProcessor(),
            TimeMode.None(), OutputMode.Update(),
            org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
          .toDF("user_id", "n_events", "total_micros", "n_types")
        // update-mode emits one row per state change; n_events is strictly
        // increasing per user, so the final state is the max-n row
        ordered(drainToMemory(s, stats, "st07", dir, "update")
          .groupBy("user_id")
          .agg(max("n_events").as("n_events"),
            expr("max_by(total_micros, n_events)").as("total_micros"),
            expr("max_by(n_types, n_events)").as("n_types")))
      }
    }),
    // stream-stream inner join with watermarks + a time-range condition —
    // the bounded-join-state mechanics: the watermarks plus the range
    // bound let Spark evict purchase state once the error-side watermark
    // passes p_ts + 1h. The 35-day delay EXCEEDS the fixture's 30-day
    // span (same contract as st05), so no state evicts before the last
    // row arrives and the appended set provably equals the batch range
    // join the oracle computes — even if the source were ever delivered
    // across multiple micro-batches. At production scale the delay is the
    // knob that bounds state; here it's sized for exactness.
    "st08_stream_stream_join" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src() = normalizeTs(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val errors = src().where(col("event_type") === "error")
        .select(col("user_id"), col("ts"))
        .withWatermark("ts", "35 days")
      val purchases = src().where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
          col("value").as("p_value"))
        .withWatermark("p_ts", "35 days")
      val joined = errors.join(purchases,
        expr("""user_id = p_user_id AND
                ts >= p_ts AND ts <= p_ts + INTERVAL 1 HOUR"""))
        .select(col("user_id"), fmtTs(col("ts")).as("error_ts"),
          fmtTs(col("p_ts")).as("purchase_ts"), col("p_value"))
      ordered(drainToMemory(s, joined, "st08", dir, "append"))
    }),
    // stream-static join: the enrichment pattern — a stream joined to a
    // broadcastable static dimension (per-user event counts here), no
    // streaming state at all (the static side is just re-read per batch)
    "st09_stream_static_join" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val dim = t(s, dir, "events").groupBy(col("user_id").as("d_user_id"))
        .agg(count(lit(1)).as("user_total"))
      val enriched = stream.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"))
        .join(broadcast(dim), col("user_id") === col("d_user_id"))
        .select(col("event_id"), col("user_id"), col("user_total"))
      ordered(drainToMemory(s, enriched, "st09", dir, "append"))
    }),
    "st03_watermark_append" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val agg = normalizeTs(stream)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"))
      ordered(drainToMemory(s, agg, "st03", dir, "append"))
    }),
    // streaming SESSION windows: unlike fixed windows, session state merges
    // adjacent windows as events arrive (gap-based), and append mode emits a
    // session only once the watermark passes its end (last event + gap) —
    // the sessionization a clickstream/usage pipeline runs continuously at
    // scale. State is bounded by the watermark like any windowed agg.
    "st10_streaming_session" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val agg = normalizeTs(stream)
        .withWatermark("ts", "30 minutes")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
      ordered(drainToMemory(s, agg, "st10", dir, "append"))
    }),
    // streaming exact dedup: unbounded dropDuplicates state — every distinct
    // (user_id, event_type) survives exactly once across micro-batches,
    // equal to the batch DISTINCT the oracle computes
    "st04_streaming_dedup" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val deduped = stream.select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      ordered(drainToMemory(s, deduped, "st04", dir, "append"))
    }),
    // streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    // keeps a key's state only until the watermark passes its event time +
    // the dedup horizon — the scale-safe variant of st04's unbounded
    // dropDuplicates (whose state grows with every distinct key forever).
    // The 35-day horizon exceeds the fixture's 30-day span, so no state
    // evicts mid-run and the result is exactly the batch DISTINCT the
    // oracle computes; at production scale the horizon is the knob that
    // bounds the state store. Events split by ts parity into two files, so
    // the SAME user's duplicates cross the micro-batch boundary and must be
    // caught by the state store, not intra-batch dedup.
    "st05_streaming_dedup_watermark" -> ((s, dir) => withShufflePartitions(s, 8) {
      // normalize BEFORE the split: the parity is on the microsecond value,
      // which exists for every fixture vintage after normalizeTs
      val ev = normalizeTs(s.read.parquet(s"$dir/events.parquet"))
      val srcDir = java.nio.file.Files.createTempDirectory("st05_src")
      addStreamFile(ev.where(pmod(unix_micros(col("ts")), lit(2)) === 0), srcDir, "f1")
      val stream = s.readStream.schema(ev.schema).parquet(srcDir.toString)
      val deduped = stream
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      val sinkName = s"st05_sink_${math.abs(dir.hashCode)}"
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName(sinkName).start()
      try {
        q.processAllAvailable() // batch 1; watermark = max(f1 ts) - 35d < min(ts)
        addStreamFile(ev.where(pmod(unix_micros(col("ts")), lit(2)) === 1), srcDir, "f2")
        q.processAllAvailable() // batch 2: cross-batch dups hit live state
      } finally { q.stop(); deleteRecursively(srcDir) }
      ordered(s.table(sinkName))
    }),
    // late-data DROP proof: after file1 establishes the watermark
    // (max event time - 30 min), file2 replays a copy of EVERY event
    // shifted 30 days into the past — all far below the watermark, so the
    // stateful aggregation must exclude them. If late rows leaked in, their
    // ancient one-hour windows (long since closed) would be emitted by the
    // final flush and break the hash against the batch oracle, which only
    // sees the original events.
    "st06_late_data_drop" -> ((s, dir) => withShufflePartitions(s, 8) {
      val ev = normalizeTs(s.read.parquet(s"$dir/events.parquet"))
      val srcDir = java.nio.file.Files.createTempDirectory("st06_src")
      addStreamFile(ev, srcDir, "f1")
      val stream = s.readStream.schema(ev.schema).parquet(srcDir.toString)
      val agg = stream
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"))
      val sinkName = s"st06_sink_${math.abs(dir.hashCode)}"
      val q = agg.writeStream.outputMode("append").format("memory")
        .queryName(sinkName).start()
      try {
        q.processAllAvailable() // watermark = max(ts) - 30 min
        // every replay is 30 days early: far below the watermark
        addStreamFile(ev.withColumn("ts", col("ts") - expr("INTERVAL 30 DAYS")), srcDir, "f2")
        q.processAllAvailable() // late rows dropped; no-data batch flushes
      } finally { q.stop(); deleteRecursively(srcDir) }
      ordered(s.table(sinkName))
    }),
    // ---- structured streaming (memory sink, drained synchronously) ----
    "st01_streaming_hourly" -> ((s, dir) => withShufflePartitions(s, 8) {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // file-source wants a directory; select the one file via glob filter
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
      val agg = normalizeTs(stream)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      ordered(drainToMemory(s, agg, "st01", dir, "complete"))
    }))

  /** The deterministic upsert/insert/tombstone delta merged into documents
    * — shared by d15 (one-shot batch merge) and st11 (the same delta
    * applied through streaming foreachBatch): both must land on this exact
    * snapshot, so one oracle text pins batch == streaming semantics.
    */
  private val mergeOracle: String =
    s"""WITH docs AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
       |delta AS (
       |  SELECT doc_id, 'u:' || text AS text, lang, source, n_chars, 'upsert' AS op
       |  FROM docs WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 5000000, 'n:' || text, lang, source, n_chars, 'upsert'
       |  FROM docs WHERE doc_id % 13 = 1
       |  UNION ALL
       |  SELECT doc_id, text, lang, source, n_chars, 'delete'
       |  FROM docs WHERE doc_id % 17 = 3 AND doc_id % 10 <> 0),
       |merged AS (
       |  SELECT d.* FROM docs d
       |  WHERE NOT EXISTS (SELECT 1 FROM delta x WHERE x.doc_id = d.doc_id)
       |  UNION ALL
       |  SELECT doc_id, text, lang, source, n_chars FROM delta WHERE op = 'upsert')
       |SELECT doc_id, text, lang, source, n_chars FROM merged
       |${orderSql("doc_id", "text", "lang", "source", "n_chars")}""".stripMargin

  /** Brute-force cosine top-5 ranking over the raw embeddings — shared by
    * s01 (window formulation) and s08 (UDAF formulation): both must
    * reproduce this exact ranking, so one oracle text pins both.
    */
  private val knnRankingOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
       |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |  ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
       |FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
       |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Brute-force ranking over embeddings + the planted exact duplicates
    * (the SQL mirror of [[embWithPlantedDups]]) — the full-coverage oracle
    * for the approximate ANN paths s06/s07.
    */
  private val plantedKnnOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
       |planted AS (
       |  SELECT 100000 + vec_id * 10 + CAST(j AS BIGINT) AS vec_id, v
       |  FROM (SELECT vec_id, v, unnest(range(0, 5)) AS j FROM q)),
       |c AS (SELECT * FROM e UNION ALL SELECT * FROM planted)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
       |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |  ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
       |FROM q JOIN c ON q.vec_id <> c.vec_id
       |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Brute-force ranking over the CDC-merged planted corpus (the SQL
    * mirror of d16's delta) — shared by d16 (batch maintenance) and st12
    * (streaming maintenance), pinning streaming == batch semantics.
    */
  private val annCdcOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
       |planted AS (
       |  SELECT 100000 + vec_id * 10 + CAST(j AS BIGINT) AS vec_id, v
       |  FROM (SELECT vec_id, v, unnest(range(0, 5)) AS j FROM q)),
       |base AS (SELECT * FROM e UNION ALL SELECT * FROM planted),
       |kept AS (SELECT * FROM base
       |  WHERE NOT (vec_id BETWEEN 100000 AND 100099 AND vec_id % 10 IN (0, 1))),
       |merged AS (
       |  SELECT k.vec_id,
       |    CASE WHEN k.vec_id BETWEEN 100000 AND 100099 AND k.vec_id % 10 = 2
       |      THEN (SELECT v FROM q
       |            WHERE q.vec_id = ((k.vec_id - 100000) // 10 + 1) % 10)
       |      ELSE k.v END AS v
       |  FROM kept k
       |  UNION ALL
       |  SELECT 200000 + vec_id * 10 + CAST(j AS BIGINT) AS vec_id, v
       |  FROM (SELECT vec_id, v, unnest(range(0, 2)) AS j FROM q))
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id,
       |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |    ORDER BY list_cosine_similarity(q.v, m.v) DESC, m.vec_id ASC) AS rank
       |  FROM q JOIN merged m ON q.vec_id <> m.vec_id
       |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Overlapping-chunk explosion (chunk 1000, stride 900) — shared by t12
    * (posexplode+substring) and t15 (the chunk_spans generator): the two
    * formulations are defined to be row-for-row equal.
    */
  private val decontaminationOracle: String =
    s"""WITH train AS (SELECT doc_id, text FROM documents),
         |ev AS (SELECT doc_id + 2000000 AS doc_id, substr(text, 65) AS text
         |       FROM documents WHERE doc_id % 7 = 0),
         |tw AS (
         |  SELECT DISTINCT md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) AS wh
         |  FROM (SELECT text, unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM train)
         |  WHERE length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0),
         |ew AS (
         |  SELECT doc_id,
         |    CASE WHEN length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0
         |         THEN md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) END AS wh
         |  FROM (SELECT doc_id, text,
         |          unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM ev)),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_windows FROM ew GROUP BY doc_id),
         |hit AS (SELECT ew.doc_id, COUNT(*) AS n_contaminated
         |        FROM ew JOIN tw USING (wh) GROUP BY ew.doc_id)
         |SELECT c.doc_id AS doc_id, c.n_windows, COALESCE(h.n_contaminated, 0) AS n_contaminated
         |FROM cnt c LEFT JOIN hit h ON c.doc_id = h.doc_id
         |${orderSql("doc_id", "n_windows", "n_contaminated")}""".stripMargin

  /** t27's packing replay: the recursive-CTE greedy longest-prefix token
    * walk + the per-lang exclusive prefix-sum window. Shared by t27 (batch)
    * and st17 (streaming) — one oracle pins batch == streaming exactly.
    */
  /** t27's greedy vocab-walk CTE chain over `documents`, ending in
    * `per_doc(doc_id, n_tokens)` — ONE definition of the tokenizer replay
    * shared by t27/st17's packing oracle and t33's mixture plan (the
    * curationDecidedCtesSql discipline applied to the token walk).
    */
  private val vocabTokenCtesSql: String =
    s"""vocab(v) AS (
       |  SELECT unnest(['customer','column','stream','filter','window','vector',
       |    'batch','spark','merge','query','small','value','order',
       |    'group','table','scan','hash','line','part','slow','sort',
       |    'fast','data','join','big','key','agg','row','the',
       |    'er','ing','an','st','on'])),
       |words AS (
       |  SELECT doc_id, w, row_number() OVER (ORDER BY doc_id) AS wid
       |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0),
       |walk(wid, doc_id, rest, cnt) AS (
       |  SELECT wid, doc_id, w, 0 FROM words
       |  UNION ALL
       |  SELECT wid, doc_id,
       |    substr(rest, 1 + COALESCE((SELECT max(length(v)) FROM vocab
       |      WHERE substr(rest, 1, length(v)) = v), 1)),
       |    cnt + 1
       |  FROM walk WHERE length(rest) > 0),
       |tok AS (
       |  SELECT doc_id, wid, max(cnt) AS cnt FROM walk GROUP BY 1, 2),
       |per_doc AS (
       |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM tok GROUP BY 1)""".stripMargin

  /** t36's full replay from the raw table — ONE definition shared by the
    * one-shot t36 and the incrementally-maintained st21 (whose merged
    * index equals the one-shot build by associativity of the
    * postings/df/stats merges over doc-disjoint batches).
    */
  private val bm25RetrievalOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS token
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
       |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
       |terms AS (
       |  SELECT token, df FROM df, n WHERE df * 20 <= n.n_docs
       |  ORDER BY df DESC, token ASC LIMIT 5),
       |comp AS (
       |  SELECT tf.doc_id,
       |    ROUND(LN(1.0 + (n.n_docs - terms.df + 0.5) / (terms.df + 0.5))
       |      * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * n.n_docs) / CAST(n.sum_dl AS DOUBLE))),
       |      6) AS comp
       |  FROM tf JOIN terms USING (token) JOIN dl USING (doc_id) CROSS JOIN n),
       |top AS (
       |  SELECT doc_id, COUNT(*) AS n_terms,
       |    CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS score
       |  FROM comp GROUP BY doc_id
       |  ORDER BY score DESC, doc_id ASC LIMIT 10)
       |SELECT doc_id, n_terms, score FROM top
       |${orderSql("doc_id", "n_terms", "score")}""".stripMargin

  /** d09's full replay from the raw table — exact reachability clusters:
    * a recursive CTE floods every component and labels each member with
    * the minimum reachable id, the ground truth the iterative min-label
    * propagation must converge to. ONE definition shared by the one-shot
    * d09 and the incrementally-maintained st23 (whose per-batch
    * closureMerge transitions compose to the same components for any
    * batch split — the union-find induction in its doc).
    */
  private val clusterClosureOracle: String =
    s"""WITH RECURSIVE docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents),
       |tk AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
       |  FROM docs),
       |sh AS (SELECT doc_id,
       |  -- COALESCE: DuckDB's array_to_string([], ' ') is NULL, but the
       |  -- Spark fallback shingle for a zero-token doc is '' — without it
       |  -- every empty/whitespace-only doc loses its shingle and the
       |  -- J=1 clique among such docs silently vanishes from the oracle
       |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
       |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
       |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |  END AS s FROM tk),
       |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
       |pairs AS (
       |  SELECT a.doc_id AS idA, b.doc_id AS idB
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING CAST(COUNT(*) AS DOUBLE) / (any_value(a.n) + any_value(b.n) - COUNT(*)) >= 0.5),
       |edges AS (
       |  SELECT idA AS src, idB AS dst FROM pairs
       |  UNION ALL SELECT idB, idA FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM docs
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
       |SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id
       |${orderSql("doc_id", "cluster")}""".stripMargin

  /** t39's full replay from the raw table — ONE definition shared by the
    * one-shot t39 and the incrementally-maintained st22 (whose merged
    * positional index equals the one-shot build by associativity of the
    * segment/bigram merges over doc-disjoint batches).
    */
  private val phraseSearchOracle: String =
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
       |  FROM documents WHERE text IS NOT NULL),
       |bg AS (
       |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
       |  FROM tk WHERE len(t) >= 2),
       |top AS (SELECT gram FROM bg GROUP BY gram ORDER BY COUNT(*) DESC, gram ASC LIMIT 1),
       |ph AS (SELECT split_part(gram, ' ', 1) AS t0, split_part(gram, ' ', 2) AS t1 FROM top),
       |pos AS (SELECT doc_id, unnest(t) AS token, unnest(range(0, len(t))) AS pos FROM tk),
       |a AS (SELECT doc_id, pos FROM pos, ph WHERE token = ph.t0),
       |b AS (SELECT doc_id, pos FROM pos, ph WHERE token = ph.t1),
       |hits AS (
       |  SELECT a.doc_id, a.pos AS start
       |  FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       |  CAST(MIN(start) AS BIGINT) AS first_pos
       |FROM hits GROUP BY doc_id
       |${orderSql("doc_id", "n_hits", "first_pos")}""".stripMargin

  private val tokenPackingOracle: String =
    s"""WITH RECURSIVE $vocabTokenCtesSql
       |SELECT d.doc_id, d.lang, COALESCE(p.n_tokens, 0) AS n_tokens,
       |  CAST(COALESCE(SUM(COALESCE(p.n_tokens, 0)) OVER (PARTITION BY d.lang
       |    ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) // 1024 AS pack_id
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |${orderSql("doc_id", "lang", "n_tokens", "pack_id")}""".stripMargin

  /** d22's full replay: planted URL corpus, the RFC 3986 normalization
    * chain CTE-by-CTE (one rule per CTE, mirroring urlNormalized's staged
    * columns), blocklist NOT IN (null hosts pre-coalesced on both sides),
    * and the (n_chars DESC, doc_id ASC) argmax. ONE definition shared by
    * d22 (batch) and st20 (streaming admission): argmax over batches is
    * associative, so the same SQL pins batch == streaming exactly.
    */
  private val urlDedupOracle: String =
    s"""WITH src AS (
       |  SELECT doc_id, COALESCE(source, 'nosrc') AS source, n_chars FROM documents),
       |corpus AS (
       |  SELECT doc_id,
       |    'https://www.' || source || '.example.com/p/' || CAST(doc_id % 500 AS VARCHAR) AS url,
       |    n_chars FROM src
       |  UNION ALL SELECT doc_id + 5000000,
       |    'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM:443/p/'
       |      || CAST(doc_id % 500 AS VARCHAR) || '/?utm_source=feed&utm_campaign=x',
       |    n_chars + 100000 FROM src WHERE doc_id % 6 = 1
       |  UNION ALL SELECT doc_id + 6000000,
       |    'https://www.' || source || '.example.com/p/'
       |      || CAST(doc_id % 500 AS VARCHAR) || '?utm_medium=z&id=7#frag',
       |    0 FROM src WHERE doc_id % 6 = 4),
       |n1 AS (
       |  SELECT doc_id, n_chars,
       |    split_part(url, '#', 1) AS nofrag FROM corpus),
       |n2 AS (
       |  SELECT doc_id, n_chars, nofrag,
       |    CASE WHEN contains(nofrag, '?')
       |         THEN substr(nofrag, instr(nofrag, '?') + 1) ELSE '' END AS qs,
       |    split_part(nofrag, '?', 1) AS pre FROM n1),
       |n3 AS (
       |  SELECT doc_id, n_chars, qs,
       |    lower(split_part(pre, '://', 1)) AS scheme,
       |    substr(pre, length(split_part(pre, '://', 1)) + 4) AS rest FROM n2),
       |n4 AS (
       |  SELECT doc_id, n_chars, qs, scheme,
       |    lower(split_part(rest, '/', 1)) AS hostport,
       |    substr(rest, length(split_part(rest, '/', 1)) + 1) AS path FROM n3),
       |n5 AS (
       |  SELECT doc_id, n_chars, qs, scheme, path,
       |    CASE WHEN scheme = 'https' AND hostport LIKE '%:443'
       |           THEN substr(hostport, 1, length(hostport) - 4)
       |         WHEN scheme = 'http' AND hostport LIKE '%:80'
       |           THEN substr(hostport, 1, length(hostport) - 3)
       |         ELSE hostport END AS host FROM n4),
       |n6 AS (
       |  SELECT doc_id, n_chars, host,
       |    scheme || '://' || host ||
       |    CASE WHEN path = '' THEN '/'
       |         WHEN length(path) > 1 AND path LIKE '%/'
       |           THEN substr(path, 1, length(path) - 1)
       |         ELSE path END ||
       |    CASE WHEN len(list_filter(str_split(qs, '&'),
       |             p -> NOT starts_with(p, 'utm_') AND p <> '')) = 0 THEN ''
       |         ELSE '?' || array_to_string(list_filter(str_split(qs, '&'),
       |             p -> NOT starts_with(p, 'utm_') AND p <> ''), '&') END AS url_norm
       |  FROM n5),
       |allowed AS (
       |  SELECT * FROM n6 WHERE host NOT IN
       |    ('www.src3.example.com', 'www.src7.example.com', 'www.src13.example.com')),
       |ranked AS (
       |  SELECT doc_id, url_norm, n_chars,
       |    row_number() OVER (PARTITION BY url_norm
       |      ORDER BY n_chars DESC, doc_id ASC) AS rk FROM allowed)
       |SELECT doc_id, url_norm, n_chars FROM ranked WHERE rk = 1
       |${orderSql("doc_id", "url_norm", "n_chars")}""".stripMargin

  private val chunkingOracle: String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |c AS (
       |  SELECT doc_id, text,
       |    unnest(range(0, CAST(ceil(greatest(n - 1000, 0) / 900.0) AS INTEGER) + 1)) AS chunk_idx
       |  FROM d)
       |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       |  CAST(length(substr(text, CAST(chunk_idx * 900 + 1 AS INTEGER), 1000)) AS INTEGER) AS chunk_chars,
       |  md5(substr(text, CAST(chunk_idx * 900 + 1 AS INTEGER), 1000)) AS chunk_fp
       |FROM c ${orderSql("doc_id", "chunk_idx", "chunk_chars", "chunk_fp")}""".stripMargin

  // ---- shared ORACLE fragments for the curation gates (one SQL
  // definition per gate, mirrored 1:1 by the Spark helpers above —
  // t20/t23/t25/t26 each use their fragment standalone and t28's funnel
  // composes the same strings, so the mirrors cannot drift apart) ----

  /** t26's marker-n-gram scores (s_de..s_zh) from `$from(doc_id, text)`. */
  private def langScoresSelectSql(from: String): String =
    s"""SELECT doc_id,
       |    (length(text) - length(replace(text, ' der ', ''))) // 5
       |      + (length(text) - length(replace(text, ' und ', ''))) // 5
       |      + (length(text) - length(replace(text, ' das ', ''))) // 5
       |      + (length(text) - length(replace(text, ' nicht ', ''))) // 7 AS s_de,
       |    (length(text) - length(replace(text, ' the ', ''))) // 5
       |      + (length(text) - length(replace(text, ' a ', ''))) // 3
       |      + (length(text) - length(replace(text, ' of ', ''))) // 4
       |      + (length(text) - length(replace(text, ' and ', ''))) // 5
       |      + (length(text) - length(replace(text, ' is ', ''))) // 4 AS s_en,
       |    (length(text) - length(replace(text, ' el ', ''))) // 4
       |      + (length(text) - length(replace(text, ' los ', ''))) // 5
       |      + (length(text) - length(replace(text, ' que ', ''))) // 5
       |      + (length(text) - length(replace(text, ' y ', ''))) // 3 AS s_es,
       |    (length(text) - length(replace(text, ' le ', ''))) // 4
       |      + (length(text) - length(replace(text, ' les ', ''))) // 5
       |      + (length(text) - length(replace(text, ' est ', ''))) // 5
       |      + (length(text) - length(replace(text, ' une ', ''))) // 5 AS s_fr,
       |    (length(text) - length(replace(text, '的', '')))
       |      + (length(text) - length(replace(text, '了', '')))
       |      + (length(text) - length(replace(text, '是', '')))
       |      + (length(text) - length(replace(text, '在', ''))) AS s_zh
       |  FROM $from""".stripMargin

  /** The argmax label over s_de..s_zh — alphabetical tie-break, 'und' at
    * zero, NULL text stays NULL (mirrors [[graft.expressions.LangId]]).
    */
  private val langPredCaseSql: String =
    """CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) IS NULL THEN NULL
      |         WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
      |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
      |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
      |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
      |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
      |         ELSE 'zh' END""".stripMargin

  /** t23's z over an `m` CTE exposing (nt, tls, punct, n_chars, stop_en,
    * alpha_tokens, bpe) — left-to-right fold, mirrors [[qualityModelScore]].
    */
  private val qualityZExprSql: String =
    """-1.1 + 1.2 * least(CAST(nt AS DOUBLE) / 100.0, 1.0)
      |      + 0.8 * (CASE WHEN nt = 0 THEN 0.0 ELSE least(CAST(tls AS DOUBLE) / nt / 10.0, 1.0) END)
      |      - 2.5 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE punct / CAST(n_chars AS DOUBLE) END)
      |      + 3.0 * (CASE WHEN nt = 0 THEN 0.0 ELSE stop_en / CAST(nt AS DOUBLE) END)
      |      + 1.5 * (CASE WHEN nt = 0 THEN 0.0 ELSE alpha_tokens / CAST(nt AS DOUBLE) END)
      |      - 0.4 * (CASE WHEN nt = 0 THEN 0.0 ELSE least(CAST(bpe AS DOUBLE) / nt / 3.0, 1.0) END)""".stripMargin

  /** t20's Gopher pass over (mean_word_len, alpha_ratio, stop_hits) with
    * the token count column and floors parameterized (mirrors
    * [[gopherGates]]).
    */
  private def gopherPassSql(nt: String, tokenFloor: Int, stopFloor: Int): String =
    s"""COALESCE($nt BETWEEN $tokenFloor AND 100000 AND mean_word_len BETWEEN 3 AND 10
       |   AND alpha_ratio >= 0.8 AND stop_hits >= $stopFloor, FALSE)""".stripMargin

  /** t25's duplicate-line counters over `$docs(doc_id, text)` (CTEs
    * lf/lg/la).
    */
  private def repLineCtesSql(docs: String): String =
    s"""lf AS (SELECT doc_id, unnest(str_split(text, chr(10))) AS ln FROM $docs),
       |lg AS (SELECT doc_id, ln, COUNT(*) AS c FROM lf
       |       WHERE length(ln) > 0 GROUP BY 1, 2),
       |la AS (SELECT doc_id,
       |    CAST(SUM(c) AS INTEGER) AS n_lines,
       |    CAST(SUM(c - 1) AS INTEGER) AS dle,
       |    CAST(SUM(c * length(ln)) AS BIGINT) AS lc,
       |    CAST(SUM((c - 1) * length(ln)) AS BIGINT) AS dlce
       |  FROM lg GROUP BY doc_id)""".stripMargin

  /** t25's n-gram mass counters over `$tbl`'s token-list column `$toks`
    * (CTEs g2a/t2/g3a/t3).
    */
  private def repGramCtesSql(tbl: String, toks: String): String =
    s"""g2a AS (SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len($toks)),
       |      i -> $toks[CAST(i AS INTEGER)] || ' ' || $toks[CAST(i + 1 AS INTEGER)])) AS g
       |    FROM $tbl WHERE len($toks) >= 2) GROUP BY 1, 2),
       |t2 AS (SELECT doc_id, CAST(MAX(c * length(g)) AS BIGINT) AS top2 FROM g2a GROUP BY doc_id),
       |g3a AS (SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len($toks) - 1),
       |      i -> $toks[CAST(i AS INTEGER)] || ' ' || $toks[CAST(i + 1 AS INTEGER)] || ' ' || $toks[CAST(i + 2 AS INTEGER)])) AS g
       |    FROM $tbl WHERE len($toks) >= 3) GROUP BY 1, 2),
       |t3 AS (SELECT doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * length(g) END), 0) AS BIGINT) AS dup3
       |  FROM g3a GROUP BY doc_id)""".stripMargin

  /** t25's four repetition fractions over joined la/t2/t3, the char-count
    * expression parameterized.
    */
  private def repFracColsSql(nChars: String): String =
    s"""CASE WHEN COALESCE(la.n_lines, 0) = 0 THEN NULL
       |         ELSE ROUND(la.dle / CAST(la.n_lines AS DOUBLE), 6) END AS dup_line_frac,
       |    CASE WHEN COALESCE(la.lc, 0) = 0 THEN NULL
       |         ELSE ROUND(la.dlce / CAST(la.lc AS DOUBLE), 6) END AS dup_line_char_frac,
       |    CASE WHEN COALESCE($nChars, 0) = 0 THEN NULL
       |         ELSE ROUND(COALESCE(t2.top2, 0) / CAST($nChars AS DOUBLE), 6) END AS top2gram_frac,
       |    CASE WHEN COALESCE($nChars, 0) = 0 THEN NULL
       |         ELSE ROUND(COALESCE(t3.dup3, 0) / CAST($nChars AS DOUBLE), 6) END AS dup3gram_frac""".stripMargin

  /** t25's composite pass over the fraction columns (mirrors
    * [[repetitionGates]], applicability floor included).
    */
  private val repPassSql: String =
    """COALESCE(dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
      |    AND (n_2grams < 20 OR top2gram_frac <= 0.20)
      |    AND dup3gram_frac <= 0.18, FALSE)""".stripMargin

  /** The whole funnel decision as a CTE chain over relation
    * `rel(doc_id, text, source)`, ending in `decided(doc_id, reason)` —
    * ONE SQL definition shared by t28/st16's oracle and t32's ledger (the
    * same no-drift discipline the Spark side gets from curationDecision).
    */
  private def curationDecidedCtesSql(rel: String): String =
    s"""d AS (SELECT doc_id, text, source,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS toks,
         |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe,
         |    length(regexp_replace(text, '[^!-~]|[A-Za-z0-9]', '', 'g')) AS punct,
         |    length(text) AS n_chars
         |  FROM $rel),
         |m AS (SELECT doc_id, source, n_chars, bpe, punct, len(toks) AS nt,
         |    COALESCE(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT), 0) AS tls,
         |    len(list_filter(toks, x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','it','that','this','for','on','with','as','are','was','be','at','by','not','but'))) AS stop_en,
         |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_tokens,
         |    CAST(len(list_distinct(list_intersect(list_transform(toks, x -> lower(x)),
         |      ['the','be','to','of','and','that','have','with']))) AS INTEGER) AS stop_hits,
         |    CASE WHEN len(toks) = 0 THEN NULL ELSE
         |      ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6)
         |    END AS mean_word_len,
         |    CASE WHEN len(toks) = 0 THEN NULL ELSE
         |      ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks), 6)
         |    END AS alpha_ratio
         |  FROM d),
         |${repLineCtesSql(rel)},
         |${repGramCtesSql("d", "toks")},
         |rep AS (SELECT d.doc_id,
         |    greatest(len(d.toks) - 1, 0) AS n_2grams,
         |    ${repFracColsSql("d.n_chars")}
         |  FROM d LEFT JOIN la USING (doc_id) LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)),
         |li AS (${langScoresSelectSql(rel)}),
         |lang AS (SELECT doc_id, $langPredCaseSql AS lang_pred FROM li),
         |z AS (SELECT doc_id, n_chars,
         |    $qualityZExprSql AS zz
         |  FROM m),
         |gates AS (SELECT m.doc_id,
         |    COALESCE(m.source IN ('src3', 'src7', 'src13'), FALSE) AS g_block,
         |    COALESCE(lang.lang_pred = 'en', FALSE) AS g_lang,
         |    ${gopherPassSql("m.nt", 10, 1)} AS g_gopher,
         |    ($repPassSql) AS g_rep,
         |    COALESCE(z.n_chars IS NOT NULL
         |      AND 0.5 + 0.5 * z.zz / (1.0 + abs(z.zz)) >= 0.55, FALSE) AS g_qual
         |  FROM m JOIN lang USING (doc_id) JOIN rep USING (doc_id) JOIN z USING (doc_id)),
         |decided AS (SELECT doc_id,
         |    CASE WHEN g_block THEN 'blocklist'
         |         WHEN NOT g_lang THEN 'language'
         |         WHEN NOT g_gopher THEN 'gopher'
         |         WHEN NOT g_rep THEN 'repetition'
         |         WHEN NOT g_qual THEN 'quality'
         |         ELSE 'kept' END AS reason
         |  FROM gates)""".stripMargin

  /** t28's funnel oracle — also st16's (batch == streaming by
    * construction for row-local decisions).
    */
  private lazy val curationFunnelOracle: String =
    s"""WITH ${curationDecidedCtesSql("documents")}
       |SELECT doc_id, reason = 'kept' AS keep, reason FROM decided
       |${orderSql("doc_id", "keep", "reason")}""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "t01_text_stats" ->
      s"""SELECT doc_id, length(text) AS n_chars,
         |len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS n_tokens
         |FROM documents ${orderSql("doc_id", "n_chars", "n_tokens")}""".stripMargin,
    // full replication of the TextStatsExpr walk: whitespace tokens,
    // ASCII-run BPE segmentation ([A-Za-z]+ | [0-9]+ | one symbol), ASCII
    // punctuation (!..~ minus alnum), CJK codepoints, per-language stopword
    // votes with earliest-wins tie-break — same double arithmetic order as
    // qualityScoreFromStats so the rounded score is bit-identical
    "t02_text_quality" ->
      s"""WITH d AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS toks,
         |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe,
         |    length(regexp_replace(text, '[^!-~]|[A-Za-z0-9]', '', 'g')) AS punct,
         |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, n_chars, bpe, punct, cjk,
         |    len(toks) AS n_tokens,
         |    COALESCE(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT), 0) AS token_len_sum,
         |    len(list_filter(toks, x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','it','that','this','for','on','with','as','are','was','be','at','by','not','but'))) AS stop_en,
         |    len(list_filter(toks, x -> lower(x) IN ('the','and','of','to','in','is','that','it','for','with'))) AS lang_en,
         |    len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y','en','un','los','del','por'))) AS stop_es,
         |    len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ist','von','mit','den','ein','zu'))) AS stop_de,
         |    len(list_filter(toks, x -> lower(x) IN ('le','la','les','de','et','un','une','des','est','que'))) AS stop_fr
         |  FROM d),
         |q AS (
         |  SELECT doc_id, bpe,
         |    least(n_tokens / 50.0, 1.0) * 0.3
         |    + (CASE WHEN n_tokens = 0 THEN 0.0
         |            WHEN CAST(token_len_sum AS DOUBLE) / n_tokens BETWEEN 3 AND 10 THEN 1.0
         |            WHEN CAST(token_len_sum AS DOUBLE) / n_tokens > 0 THEN 0.5
         |            ELSE 0.0 END) * 0.3
         |    + (1.0 - least((CASE WHEN n_chars = 0 THEN 0.0 ELSE punct / CAST(n_chars AS DOUBLE) END) * 5.0, 1.0)) * 0.2
         |    + least((CASE WHEN n_tokens = 0 THEN 0.0 ELSE stop_en / CAST(n_tokens AS DOUBLE) END) * 5.0, 1.0) * 0.2 AS raw,
         |  -- NULL text: every vote is NULL, so every WHEN would be falsy and
         |  -- the CASE would fall through to the ELSE ('fr'); Spark's fold on
         |  -- a NULL stats struct lands in the 'und' otherwise-branch instead
         |  CASE WHEN n_chars IS NULL THEN 'und'
         |       WHEN cjk / CAST(greatest(n_chars, 1) AS DOUBLE) > 0.05 THEN 'zh'
         |       WHEN greatest(lang_en, stop_es, stop_de, stop_fr) = 0 THEN 'und'
         |       WHEN lang_en >= stop_es AND lang_en >= stop_de AND lang_en >= stop_fr THEN 'en'
         |       WHEN stop_es >= stop_de AND stop_es >= stop_fr THEN 'es'
         |       WHEN stop_de >= stop_fr THEN 'de'
         |       ELSE 'fr' END AS lang_guess
         |  FROM m)
         |SELECT doc_id,
         |  -- Spark round(double, 4) is BigDecimal.valueOf(d) = HALF_UP on the
         |  -- SHORTEST DECIMAL RENDERING; VARCHAR->DECIMAL(38,20) replicates
         |  -- that exactly (binary-value rounding differs at repr boundaries)
         |  CAST(round(CAST(CAST(raw AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) AS quality,
         |  lang_guess,
         |  CAST(bpe AS INTEGER) AS bpe_tokens
         |FROM q ${orderSql("doc_id", "quality", "lang_guess", "bpe_tokens")}""".stripMargin,
    "t08_deterministic_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
         |       WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ${orderSql("doc_id", "split")}""".stripMargin,
    "t09_sequence_packing" ->
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 4000 AS pack_id
         |FROM documents ${orderSql("doc_id", "lang", "n_chars", "pack_id")}""".stripMargin,
    "t03_fingerprint_md5" ->
      s"SELECT doc_id, md5(text) AS fp FROM documents ${orderSql("doc_id", "fp")}",
    // chr(769)=U+0301 combining acute, chr(776)=U+0308 combining diaeresis:
    // the planted row arrives decomposed and must recompose identically
    "t14_nfc_fingerprint" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT 9000001, 'cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769) ||
         |                  ' nai' || chr(776) || 've')
         |SELECT doc_id, length(nfc_normalize(text)) AS n_chars_nfc,
         |md5(nfc_normalize(text)) AS fp_nfc
         |FROM d ${orderSql("doc_id", "n_chars_nfc", "fp_nfc")}""".stripMargin,
    "t12_doc_chunking" -> chunkingOracle,
    // t15 is the UDTF (generator) formulation of the SAME chunking — one
    // oracle pins both spellings
    "t15_chunk_udtf" -> chunkingOracle,
    "t10_stratified_sample" ->
      s"""SELECT doc_id, lang, rk FROM (
         |  SELECT doc_id, lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INTEGER) AS rk
         |  FROM documents)
         |WHERE rk <= 50 ${orderSql("doc_id", "lang", "rk")}""".stripMargin,
    "t11_pii_redact" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    text || ' contact-' || CAST(doc_id AS VARCHAR) || '@example.com ph 555-123-4567' AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
         |  md5(regexp_replace(regexp_replace(aug,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_fp
         |FROM a ${orderSql("doc_id", "n_emails", "redacted_fp")}""".stripMargin,
    // the Luhn arithmetic is the SAME generated SQL text the Spark side
    // runs (luhnSumSql / luhnValidSql); ||-concat (not DuckDB's
    // null-skipping concat()) mirrors Spark concat's null propagation;
    // list_reduce has no init parameter, so the redacted text seeds the
    // fold via list_prepend
    // every LM lookup replayed relationally: tokens with positions, the
    // bigram context via lag() (COALESCE '<s>' at doc start — the
    // expression's prev-token convention), stupid-backoff via the
    // COALESCE(bigram, unigram + penalty, OOV) chain over VALUES tables
    // GENERATED from the fixture arrays; integer compare for passes
    "t29_lm_perplexity" ->
      s"""WITH uni(w, c) AS (SELECT * FROM (VALUES ${graft.expressions.NgramLm.uniSqlValues})),
         |bi(p, w, c) AS (SELECT * FROM (VALUES ${graft.expressions.NgramLm.biSqlValues})),
         |toks AS (
         |  SELECT doc_id, w, ord FROM (
         |    SELECT doc_id, unnest(str_split(text, ' ')) AS w,
         |           generate_subscripts(str_split(text, ' '), 1) AS ord
         |    FROM documents)
         |  WHERE length(w) > 0),
         |seq AS (
         |  SELECT doc_id, w,
         |    COALESCE(lag(w) OVER (PARTITION BY doc_id ORDER BY ord), '<s>') AS prev
         |  FROM toks),
         |cost AS (
         |  SELECT s.doc_id,
         |    COALESCE(b.c, u.c + ${graft.expressions.NgramLm.Backoff},
         |             ${graft.expressions.NgramLm.Oov}) AS c
         |  FROM seq s
         |  LEFT JOIN bi b ON b.p = s.prev AND b.w = s.w
         |  LEFT JOIN uni u ON u.w = s.w),
         |agg AS (SELECT doc_id, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS tot
         |        FROM cost GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(a.tot, 0) AS BIGINT) AS total_cost,
         |  CASE WHEN a.n > 0 THEN round(a.tot / a.n, 6) END AS avg_cost,
         |  COALESCE(a.n > 0 AND a.tot <= 700 * a.n, FALSE) AS passes
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |${orderSql("doc_id", "n_tokens", "total_cost", "avg_cost", "passes")}""".stripMargin,
    "t30_pii_luhn" ->
      s"""WITH a AS (
         |  SELECT doc_id, text,
         |    '4' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 14, '3') AS __pfx
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, text, __pfx,
         |    (10 - (${luhnSumSql("__pfx", 15)}) % 10) % 10 AS __chk
         |  FROM a),
         |c AS (
         |  SELECT doc_id,
         |    text || ' card ' || __pfx || CAST(__chk AS VARCHAR) ||
         |    ' alt ' || __pfx || CAST((__chk + 1) % 10 AS VARCHAR) ||
         |    ' ip 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.7 bogus 999.1.2.3' AS aug
         |  FROM b),
         |d AS (
         |  SELECT doc_id, aug,
         |    regexp_extract_all(aug, '[0-9]{16}') AS cands,
         |    regexp_replace(aug, '$ipv4Pat', '[IP]', 'g') AS ipred
         |  FROM c),
         |e AS (
         |  SELECT doc_id, aug, cands, ipred,
         |    list_filter(cands, x -> $luhnValidSql) AS valid
         |  FROM d)
         |SELECT doc_id,
         |  CAST(len(cands) AS INTEGER) AS n_digit16,
         |  CAST(len(valid) AS INTEGER) AS n_cards_valid,
         |  CAST(len(regexp_extract_all(aug, '$ipv4Pat')) AS INTEGER) AS n_ips,
         |  md5(list_reduce(list_prepend(ipred, valid),
         |    (acc, x) -> replace(acc, x, '[CARD]'))) AS redacted_fp
         |FROM e
         |${orderSql("doc_id", "n_digit16", "n_cards_valid", "n_ips", "redacted_fp")}""".stripMargin,
    // batch == streaming for the attribution chain: the midpoint-ts split
    // preserves per-user event order, the carried state replays q55's
    // frame walks, so the per-user rollup equals the one-shot q55 — whose
    // oracle this reuses verbatim
    "st19_streaming_funnel" -> RelationalQueries.oracleSql("q55_event_funnel"),
    // t36's full replay from the raw table: t16's token contract, exact
    // integer tf/df/dl/N, the identical BM25 expression token for token
    // (Lucene +1 idf floor, k1+1 = 2.2, 1-b = 0.25, dl/avgdl as the exact
    // (dl*n_docs)/sum_dl product), components ROUND(...,6)'d per row then
    // summed as exact DECIMAL(18,6), terms and ranking both decided by
    // integer/string/rounded comparisons so both engines agree bit-free
    "t36_bm25_retrieval" -> bm25RetrievalOracle,
    // st21's incrementally-merged index equals the one-shot build for any
    // batch split (postings/df/stats merges are associative over
    // doc-disjoint batches), so t36's oracle pins batch == streaming
    "st21_streaming_bm25" -> bm25RetrievalOracle,
    // t37: t36's CTE chain + a second scorer (t16's TF-IDF formula) +
    // the integer RRF fusion — ranks are BIGINTs, the fusion is exact
    // floor division in micro-units, so cross-engine agreement needs
    // only the component orderings t36 already pins
    "t37_hybrid_rrf" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
         |terms AS (
         |  SELECT token, df FROM df, n WHERE df * 20 <= n.n_docs
         |  ORDER BY df DESC, token ASC LIMIT 5),
         |bmc AS (
         |  SELECT tf.doc_id,
         |    ROUND(LN(1.0 + (n.n_docs - terms.df + 0.5) / (terms.df + 0.5))
         |      * tf.tf * 2.2
         |      / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * n.n_docs) / CAST(n.sum_dl AS DOUBLE))),
         |      6) AS comp
         |  FROM tf JOIN terms USING (token) JOIN dl USING (doc_id) CROSS JOIN n),
         |bm AS (SELECT doc_id, CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS score
         |       FROM bmc GROUP BY doc_id),
         |bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS bm25_rank
         |        FROM bm ORDER BY score DESC, doc_id ASC LIMIT 20),
         |tic AS (
         |  SELECT tf.doc_id,
         |    ROUND(tf.tf * LN((n.n_docs + 1.0) / (terms.df + 1.0)), 6) AS comp
         |  FROM tf JOIN terms USING (token) CROSS JOIN n),
         |ti AS (SELECT doc_id, CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS score
         |       FROM tic GROUP BY doc_id),
         |tir AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS tfidf_rank
         |        FROM ti ORDER BY score DESC, doc_id ASC LIMIT 20),
         |fused AS (
         |  SELECT doc_id,
         |    CAST(COALESCE(1000000 // (60 + bm25_rank), 0)
         |       + COALESCE(1000000 // (60 + tfidf_rank), 0) AS BIGINT) AS rrf_micros,
         |    bm25_rank, tfidf_rank
         |  FROM bmr FULL OUTER JOIN tir USING (doc_id)),
         |top AS (SELECT * FROM fused ORDER BY rrf_micros DESC, doc_id ASC LIMIT 10)
         |SELECT doc_id, rrf_micros, bm25_rank, tfidf_rank FROM top
         |${orderSql("doc_id", "rrf_micros", "bm25_rank", "tfidf_rank")}""".stripMargin,
    // t38: t36's CTE chain widened to MANY queries — the 12 highest-df
    // under-cap terms assigned term i -> query q(i%4) (replaying the
    // Spark side's deterministic derivation), components joined through
    // the (query_id, token) frame, per-query top-10 via the partitioned
    // row_number the engine plans as a map-side WindowGroupLimit
    "t38_batch_retrieval" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
         |terms AS (
         |  SELECT token, df,
         |    CAST(row_number() OVER (ORDER BY df DESC, token ASC) AS BIGINT) - 1 AS tix
         |  FROM df, n WHERE df * 1 <= n.n_docs
         |  ORDER BY df DESC, token ASC LIMIT 12),
         |q AS (SELECT 'q' || CAST(tix % 4 AS VARCHAR) AS query_id, token, df FROM terms),
         |comp AS (
         |  SELECT q.query_id, tf.doc_id,
         |    ROUND(LN(1.0 + (n.n_docs - q.df + 0.5) / (q.df + 0.5))
         |      * tf.tf * 2.2
         |      / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * n.n_docs) / CAST(n.sum_dl AS DOUBLE))),
         |      6) AS comp
         |  FROM tf JOIN q USING (token) JOIN dl USING (doc_id) CROSS JOIN n),
         |scored AS (
         |  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS score
         |  FROM comp GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rnk,
         |    n_terms, score
         |  FROM scored)
         |SELECT query_id, doc_id, rnk AS "rank", n_terms, score
         |FROM ranked WHERE rnk <= 10
         |${orderSql("query_id", "doc_id", "\"rank\"", "n_terms", "score")}""".stripMargin,
    // t40: t38's many-query CTE chain x t37's two-ranker fusion — both
    // component sums per (query_id, doc_id), per-query top-20 cuts, the
    // full-outer fusion in integer micro-units, per-query top-10 by
    // (rrf DESC, doc_id ASC). Replays the Spark side's term->query
    // derivation verbatim.
    "t40_batch_hybrid" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
         |terms AS (
         |  SELECT token, df,
         |    CAST(row_number() OVER (ORDER BY df DESC, token ASC) AS BIGINT) - 1 AS tix
         |  FROM df, n WHERE df * 1 <= n.n_docs
         |  ORDER BY df DESC, token ASC LIMIT 12),
         |q AS (SELECT 'q' || CAST(tix % 4 AS VARCHAR) AS query_id, token, df FROM terms),
         |bmc AS (
         |  SELECT q.query_id, tf.doc_id,
         |    ROUND(LN(1.0 + (n.n_docs - q.df + 0.5) / (q.df + 0.5))
         |      * tf.tf * 2.2
         |      / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * n.n_docs) / CAST(n.sum_dl AS DOUBLE))),
         |      6) AS comp
         |  FROM tf JOIN q USING (token) JOIN dl USING (doc_id) CROSS JOIN n),
         |bm AS (SELECT query_id, doc_id,
         |    CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS score
         |  FROM bmc GROUP BY query_id, doc_id),
         |bmr AS (SELECT query_id, doc_id, bm25_rank FROM (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS bm25_rank
         |  FROM bm) WHERE bm25_rank <= 20),
         |tic AS (
         |  SELECT q.query_id, tf.doc_id,
         |    ROUND(tf.tf * LN((n.n_docs + 1.0) / (q.df + 1.0)), 6) AS comp
         |  FROM tf JOIN q USING (token) CROSS JOIN n),
         |ti AS (SELECT query_id, doc_id,
         |    CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS score
         |  FROM tic GROUP BY query_id, doc_id),
         |tir AS (SELECT query_id, doc_id, tfidf_rank FROM (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS tfidf_rank
         |  FROM ti) WHERE tfidf_rank <= 20),
         |fused AS (
         |  SELECT query_id, doc_id,
         |    CAST(COALESCE(1000000 // (60 + bm25_rank), 0)
         |       + COALESCE(1000000 // (60 + tfidf_rank), 0) AS BIGINT) AS rrf_micros,
         |    bm25_rank, tfidf_rank
         |  FROM bmr FULL OUTER JOIN tir USING (query_id, doc_id)),
         |top AS (SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_micros DESC, doc_id ASC) AS BIGINT) AS rnk,
         |    rrf_micros, bm25_rank, tfidf_rank
         |  FROM fused)
         |SELECT query_id, doc_id, rnk AS "rank", rrf_micros, bm25_rank, tfidf_rank
         |FROM top WHERE rnk <= 10
         |${orderSql("query_id", "doc_id", "\"rank\"", "rrf_micros", "bm25_rank", "tfidf_rank")}""".stripMargin,
    // t39: positional adjacency replayed from the raw table — bigram
    // stats, the (count DESC, gram ASC) top gram, then the exact
    // aligned-offset intersection as a position join (the Spark side's
    // vote-group formulation is the same intersection). ONE definition
    // shared with st22 (the maintained positional index equals the
    // one-shot build by merge associativity over doc-disjoint batches)
    "t39_phrase_search" -> phraseSearchOracle,
    "st22_streaming_phrase" -> phraseSearchOracle,
    // t41: the slot-displacement proximity votes replayed from the raw
    // table — distinct-term bigram derivation, then each slot's
    // positions vote anchors pos - slot - j (j in 0..2), anchors with
    // both DISTINCT slots voting match
    "t41_proximity_search" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM documents WHERE text IS NOT NULL),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
         |  FROM tk WHERE len(t) >= 2),
         |top AS (SELECT gram FROM bg
         |  WHERE split_part(gram, ' ', 1) != split_part(gram, ' ', 2)
         |  GROUP BY gram ORDER BY COUNT(*) DESC, gram ASC LIMIT 1),
         |ph AS (SELECT split_part(gram, ' ', 1) AS t0, split_part(gram, ' ', 2) AS t1 FROM top),
         |pos AS (SELECT doc_id, unnest(t) AS token, unnest(range(0, len(t))) AS pos FROM tk),
         |js AS (SELECT unnest(range(0, 3)) AS j),
         |votes AS (
         |  SELECT doc_id, start, tix FROM (
         |    SELECT p.doc_id, p.pos - 0 - js.j AS start, 0 AS tix
         |    FROM pos p, ph, js WHERE p.token = ph.t0
         |    UNION ALL
         |    SELECT p.doc_id, p.pos - 1 - js.j AS start, 1 AS tix
         |    FROM pos p, ph, js WHERE p.token = ph.t1)
         |  WHERE start >= 0),
         |hits AS (
         |  SELECT doc_id, start FROM votes
         |  GROUP BY doc_id, start HAVING COUNT(DISTINCT tix) = 2)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         |  CAST(MIN(start) AS BIGINT) AS first_pos
         |FROM hits GROUP BY doc_id
         |${orderSql("doc_id", "n_hits", "first_pos")}""".stripMargin,
    // the same vocab walk (vocabTokenCtesSql — t27's tokenizer, one
    // definition), the same integer milli-unit floor divisions
    // d25's full CTE replay (planted corpus + shingle pairs + recursive
    // closure + quota window) with lang carried through, then the
    // integer-millis upweight math — DuckDB's // mirrors Spark's div
    "t34_upweighted_mixture" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1), lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |    substring(t1, instr(t1, ' ') + 1), lang
         |  FROM (SELECT doc_id, substring(text, instr(text, ' ') + 1) AS t1, lang
         |        FROM documents)),
         |tk AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (any_value(a.n) + any_value(b.n) - COUNT(*)) >= 0.5),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM pairs
         |  UNION ALL SELECT idB, idA FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id),
         |sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM lab GROUP BY cluster),
         |ranked AS (SELECT d.doc_id, d.lang, d.text, lab.cluster,
         |    row_number() OVER (PARTITION BY lab.cluster
         |      ORDER BY length(d.text) DESC NULLS LAST, d.doc_id ASC) AS rn
         |  FROM docs d JOIN lab USING (doc_id)),
         |kept AS (SELECT r.doc_id, r.lang,
         |    CAST(COALESCE(length(r.text), 0) AS BIGINT) AS mass,
         |    s.cluster_size, least(2, s.cluster_size) AS n_kept
         |  FROM ranked r JOIN sizes s USING (cluster) WHERE r.rn <= 2),
         |by_lang AS (SELECT lang,
         |    CAST(COUNT(*) AS BIGINT) AS kept_rows,
         |    CAST(SUM((cluster_size * 1000) // n_kept) AS BIGINT) AS represented_rows_millis,
         |    CAST(SUM(mass) AS BIGINT) AS raw_mass,
         |    CAST(SUM((mass * cluster_size * 1000) // n_kept) AS BIGINT) AS upweighted_mass_millis
         |  FROM kept GROUP BY lang),
         |tot AS (SELECT CAST(SUM(upweighted_mass_millis) AS BIGINT) AS total_millis FROM by_lang)
         |SELECT b.lang, b.kept_rows, b.represented_rows_millis, b.raw_mass,
         |  b.upweighted_mass_millis,
         |  CASE WHEN tot.total_millis > 0
         |    THEN (b.upweighted_mass_millis * 1000) // tot.total_millis END AS share_millis
         |FROM by_lang b CROSS JOIN tot
         |${orderSql("lang", "kept_rows", "represented_rows_millis", "raw_mass",
            "upweighted_mass_millis", "share_millis")}""".stripMargin,
    "t33_mixture_plan" ->
      s"""WITH RECURSIVE $vocabTokenCtesSql,
         |by_lang AS (
         |  SELECT d.lang, CAST(SUM(COALESCE(p.n_tokens, 0)) AS BIGINT) AS tokens
         |  FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |  GROUP BY d.lang),
         |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM by_lang),
         |tgt(lang, target_pct) AS (VALUES
         |  ('en', 40), ('de', 15), ('es', 15), ('fr', 15), ('zh', 15))
         |SELECT b.lang, b.tokens, tot.total,
         |  (b.tokens * 1000) // tot.total AS share_millis,
         |  COALESCE(t.target_pct, 0) AS target_pct,
         |  CASE WHEN b.tokens > 0
         |    THEN (COALESCE(t.target_pct, 0) * tot.total * 10) // b.tokens
         |  END AS epochs_millis
         |FROM by_lang b CROSS JOIN tot LEFT JOIN tgt t USING (lang)
         |${orderSql("lang", "tokens", "total", "share_millis", "target_pct",
            "epochs_millis")}""".stripMargin,
    // the full chain from shared fragments: the funnel's decided CTE over
    // the cloned corpus (curationDecidedCtesSql — t28's exact chain), the
    // d02 fingerprint window, and d11/d23's stride-grid window-hash join
    // with sides swapped (benchmark windows as the distinct set, survivor
    // windows probing it)
    "t32_disposition_ledger" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 10 = 0),
         |${curationDecidedCtesSql("corpus")},
         |kept AS (SELECT c.doc_id, c.text
         |  FROM corpus c JOIN decided USING (doc_id) WHERE decided.reason = 'kept'),
         |ranked AS (SELECT doc_id,
         |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
         |  FROM kept),
         |ev AS (SELECT doc_id + 2000000 AS doc_id, substr(text, 65) AS text
         |  FROM documents WHERE doc_id % 7 = 0),
         |tw AS (SELECT DISTINCT md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) AS wh
         |  FROM (SELECT text, unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM ev)
         |  WHERE length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0),
         |sw AS (SELECT k.doc_id,
         |    CASE WHEN length(substr(k.text, CAST(k.i * 32 + 1 AS INTEGER), 64)) > 0
         |         THEN md5(substr(k.text, CAST(k.i * 32 + 1 AS INTEGER), 64)) END AS wh
         |  FROM (SELECT kept.doc_id, kept.text,
         |          unnest(range(0, greatest(CAST(floor((COALESCE(length(kept.text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM kept JOIN ranked USING (doc_id) WHERE ranked.rn = 1) k),
         |cont AS (SELECT sw.doc_id,
         |    MAX(CASE WHEN tw.wh IS NOT NULL THEN 1 ELSE 0 END) AS hit
         |  FROM sw LEFT JOIN tw USING (wh) GROUP BY sw.doc_id)
         |SELECT decided.doc_id,
         |  CASE WHEN decided.reason <> 'kept' THEN decided.reason
         |       WHEN ranked.rn > 1 THEN 'duplicate'
         |       WHEN COALESCE(cont.hit, 0) = 1 THEN 'contaminated'
         |       ELSE 'kept' END AS disposition,
         |  CASE WHEN decided.reason <> 'kept' THEN 'funnel'
         |       WHEN ranked.rn > 1 THEN 'dedup'
         |       WHEN COALESCE(cont.hit, 0) = 1 THEN 'decontamination'
         |       ELSE 'kept' END AS stage
         |FROM decided
         |LEFT JOIN ranked USING (doc_id)
         |LEFT JOIN cont USING (doc_id)
         |${orderSql("doc_id", "disposition", "stage")}""".stripMargin,
    // the same batch split (planted text degradation in batch 2), the
    // same generated per-column profile, the same running merge and
    // drift compare — batch 1 is the baseline (drift FALSE by contract)
    "st18_streaming_profile" ->
      s"""WITH b1 AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  WHERE doc_id % 2 = 0 OR doc_id IS NULL),
         |b2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text END AS text,
         |    lang, source
         |  FROM documents WHERE doc_id % 2 <> 0),
         |p1 AS (${slimProfileSql("b1", Seq("doc_id", "text", "lang", "source"))}),
         |p2 AS (${slimProfileSql("b2", Seq("doc_id", "text", "lang", "source"))})
         |SELECT col_name, CAST(1 AS BIGINT) AS batch_seq, batch_rows,
         |  batch_nulls, batch_rows AS total_rows, batch_nulls AS total_nulls,
         |  FALSE AS null_drift
         |FROM p1
         |UNION ALL
         |SELECT p2.col_name, CAST(2 AS BIGINT), p2.batch_rows, p2.batch_nulls,
         |  p1.batch_rows + p2.batch_rows, p1.batch_nulls + p2.batch_nulls,
         |  CASE WHEN p1.batch_rows = 0 OR p2.batch_rows = 0 THEN FALSE
         |    ELSE abs(CAST(p2.batch_nulls AS DOUBLE) / p2.batch_rows -
         |             CAST(p1.batch_nulls AS DOUBLE) / p1.batch_rows) > 0.10
         |  END
         |FROM p2 JOIN p1 USING (col_name)
         |${orderSql("col_name", "batch_seq", "batch_rows", "batch_nulls",
            "total_rows", "total_nulls", "null_drift")}""".stripMargin,
    // the same shuffleKeyExpr template in DuckDB spelling (xor()/"//"),
    // same per-shard window — a global ORDER BY here would also pass, but
    // mirroring the sharded contract keeps the oracle honest about what
    // the engine promises (per-shard order, not one global sequence)
    "t31_corpus_shuffle" ->
      s"""WITH keyed AS (
         |  SELECT 0 AS epoch, doc_id,
         |    ${shuffleKeyExpr(epochSeed(0), (a, b) => s"xor($a, $b)", "//")} AS shuffle_key
         |  FROM documents
         |  UNION ALL
         |  SELECT 1, doc_id,
         |    ${shuffleKeyExpr(epochSeed(1), (a, b) => s"xor($a, $b)", "//")}
         |  FROM documents),
         |sharded AS (
         |  SELECT epoch, doc_id, shuffle_key, shuffle_key % 8 AS shard FROM keyed)
         |SELECT epoch, doc_id, shuffle_key, shard,
         |  CAST(row_number() OVER (PARTITION BY epoch, shard
         |    ORDER BY shuffle_key ASC, doc_id ASC) AS INTEGER) AS pos
         |FROM sharded
         |${orderSql("epoch", "doc_id", "shuffle_key", "shard", "pos")}""".stripMargin,
    "t04_token_freq" ->
      s"""SELECT token, COUNT(*) AS n FROM (
         |SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS token
         |FROM documents) GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,
    "t06_top_bigrams" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS tok,
         |    generate_subscripts(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0), 1) AS ord
         |  FROM documents)
         |SELECT a.tok || ' ' || b.tok AS bigram, COUNT(*) AS n
         |FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
         |GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 30""".stripMargin,
    "t05_lang_distribution" ->
      s"""SELECT lang, COUNT(*) AS n, ${dsumSql("n_chars")} AS total_chars
         |FROM documents GROUP BY lang ${orderSql("lang")}""".stripMargin,
    // same RE2-\s token contract as t06/t07; 3-grams built positionally so
    // the multiset (not the set) is counted. CASE guards NULL text
    // explicitly — DuckDB's greatest() skips NULLs rather than propagating
    "t13_dup_ngrams" ->
      s"""WITH d AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS toks,
         |  text FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN NULL
         |       ELSE list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
         |            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS grams
         |  FROM d)
         |SELECT doc_id, len(grams) AS n_grams3,
         |  len(grams) - len(list_distinct(grams)) AS n_dup3
         |FROM g ${orderSql("doc_id", "n_grams3", "n_dup3")}""".stripMargin,
    // RE2 \x{...} spells the same BMP blocks Java regex sees as \uXXXX;
    // NULL text -> NULL counts on both engines
    "t18_script_mix" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS INTEGER) AS n_latin,
         |  CAST(len(regexp_extract_all(text, '[\\x{0400}-\\x{04FF}]')) AS INTEGER) AS n_cyrillic,
         |  CAST(len(regexp_extract_all(text, '[\\x{0370}-\\x{03FF}]')) AS INTEGER) AS n_greek,
         |  CAST(len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]')) AS INTEGER) AS n_cjk,
         |  CAST(len(regexp_extract_all(text, '[\\x{3040}-\\x{30FF}]')) AS INTEGER) AS n_kana,
         |  CAST(len(regexp_extract_all(text, '[\\x{0600}-\\x{06FF}]')) AS INTEGER) AS n_arabic,
         |  CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS n_digit
         |FROM documents ${orderSql("doc_id")}""".stripMargin,
    // planted footers on even doc_ids (concat_ws skips NULL text on both
    // engines); boilerplate = a trimmed non-empty line present in >= 3
    // distinct docs, counted per doc
    "t17_boilerplate" ->
      s"""WITH aug AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN concat_ws(chr(10), text,
         |    'COPYRIGHT 2026 EXAMPLE CORP - ALL RIGHTS RESERVED',
         |    'subscribe to our newsletter for updates')
         |  ELSE text END AS text FROM documents),
         |l AS (SELECT doc_id, trim(x) AS line
         |  FROM aug, unnest(string_split(text, chr(10))) AS u(x)
         |  WHERE length(trim(x)) > 0),
         |p AS (SELECT doc_id, md5(line) AS h, COUNT(*) AS c FROM l GROUP BY 1, 2),
         |w AS (SELECT doc_id, c, COUNT(*) OVER (PARTITION BY h) AS nd FROM p)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
         |  CAST(SUM(CASE WHEN nd >= 3 THEN c ELSE 0 END) AS BIGINT) AS n_boiler
         |FROM w GROUP BY doc_id ${orderSql("doc_id", "n_lines", "n_boiler")}""".stripMargin,
    "t07_stopword_repetition" ->
      s"""WITH d AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS toks
         |  FROM documents)
         |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
         |CAST(len(list_filter(toks, x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','it'))) AS INTEGER) AS n_stopwords,
         |CAST(len(toks) - len(list_distinct(toks)) AS INTEGER) AS n_repeated
         |FROM d ${orderSql("doc_id")}""".stripMargin,
    // same token contract; list_distinct around list_intersect pins the
    // DISTINCT-hits semantics Spark's array_intersect applies
    "t20_gopher_filter" ->
      s"""WITH d AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS toks
         |  FROM documents),
         |m AS (SELECT doc_id, len(toks) AS n_tokens,
         |  CASE WHEN len(toks) = 0 THEN NULL ELSE
         |    ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6)
         |  END AS mean_word_len,
         |  CASE WHEN len(toks) = 0 THEN NULL ELSE
         |    ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks), 6)
         |  END AS alpha_ratio,
         |  CAST(len(list_distinct(list_intersect(list_transform(toks, x -> lower(x)),
         |    ['the','be','to','of','and','that','have','with']))) AS INTEGER) AS stop_hits
         |  FROM d)
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, mean_word_len, alpha_ratio, stop_hits,
         |  ${gopherPassSql("n_tokens", 50, 2)} AS passes
         |FROM m ${orderSql("doc_id")}""".stripMargin,
    // the linear scorer re-derived feature-by-feature from t02/t20's
    // proven textStats mirrors; the dot product folds in the same
    // left-to-right order and the squash is rational (no libm), so the
    // doubles are bit-identical before the 6-decimal round
    "t23_quality_model" ->
      s"""WITH d AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS toks,
         |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe,
         |    length(regexp_replace(text, '[^!-~]|[A-Za-z0-9]', '', 'g')) AS punct
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, n_chars, bpe, punct, len(toks) AS nt,
         |    COALESCE(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT), 0) AS tls,
         |    len(list_filter(toks, x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','it','that','this','for','on','with','as','are','was','be','at','by','not','but'))) AS stop_en,
         |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_tokens
         |  FROM d),
         |z AS (
         |  SELECT doc_id, n_chars,
         |    $qualityZExprSql AS zz
         |  FROM m)
         |SELECT doc_id,
         |  CASE WHEN n_chars IS NULL THEN NULL
         |       ELSE ROUND(0.5 + 0.5 * zz / (1.0 + abs(zz)), 6) END AS model_score,
         |  COALESCE(n_chars IS NOT NULL
         |    AND 0.5 + 0.5 * zz / (1.0 + abs(zz)) >= 0.55, FALSE) AS keep
         |FROM z ${orderSql("doc_id", "model_score", "keep")}""".stripMargin,
    // every score is a sum of replace()-count integers — exactly LangId's
    // non-overlapping left-to-right occurrence count — so the argmax,
    // tie-break (alphabetical: de,en,es,fr,zh) and margin land on the
    // same integers in both engines; planted corpora rebuilt verbatim
    "t26_language_id" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 4000000,
         |    repeat(' der und das nicht der und ', CAST(1 + doc_id % 3 AS INTEGER))
         |    FROM documents WHERE doc_id % 4 = 0
         |  UNION ALL SELECT doc_id + 4000000,
         |    repeat(' el los que y el que ', CAST(1 + doc_id % 3 AS INTEGER))
         |    FROM documents WHERE doc_id % 4 = 1
         |  UNION ALL SELECT doc_id + 4000000,
         |    repeat(' le les est une le est ', CAST(1 + doc_id % 3 AS INTEGER))
         |    FROM documents WHERE doc_id % 4 = 2
         |  UNION ALL SELECT doc_id + 4000000,
         |    repeat('的了是在的是', CAST(1 + doc_id % 3 AS INTEGER))
         |    FROM documents WHERE doc_id % 4 = 3),
         |sc AS (${langScoresSelectSql("corpus")}),
         |best AS (
         |  SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
         |    greatest(s_de, s_en, s_es, s_fr, s_zh) AS b
         |  FROM sc)
         |SELECT doc_id,
         |  $langPredCaseSql AS lang_pred,
         |  CAST(b AS INTEGER) AS score,
         |  CAST(b - CASE WHEN s_de = b THEN greatest(s_en, s_es, s_fr, s_zh)
         |       WHEN s_en = b THEN greatest(s_de, s_es, s_fr, s_zh)
         |       WHEN s_es = b THEN greatest(s_de, s_en, s_fr, s_zh)
         |       WHEN s_fr = b THEN greatest(s_de, s_en, s_es, s_zh)
         |       ELSE greatest(s_de, s_en, s_es, s_fr) END AS INTEGER) AS margin
         |FROM best ${orderSql("doc_id", "lang_pred", "score", "margin")}""".stripMargin,
    // the greedy longest-prefix walk replayed per word by a recursive CTE:
    // max(length(v)) over prefix-matching vocab entries IS the greedy
    // choice; substr advances one CHARACTER on no-match, matching the
    // expression's one-codepoint step
    "t27_token_packing" -> tokenPackingOracle,
    // the segmented form computes identical pack ids (prefix sums
    // decompose exactly) — one oracle pins both plans
    "t35_packing_segmented" -> tokenPackingOracle,
    // the same packing replay pins the STREAMING path: union over st17's
    // micro-batches == the one-shot t27 by the cross-batch running total
    "st17_streaming_packing" -> tokenPackingOracle,
    // the URL surgery mirrored step for step (split_part == substring_index
    // for these shapes); survivor = min doc_id among max n_chars per
    // normalized URL, i.e. the same (n_chars DESC, doc_id ASC) rank
    "d22_url_dedup" -> urlDedupOracle,
    // the SAME oracle pins streaming == batch: st20's final index is the
    // argmax d22's window computes, whatever the batch split
    "st20_streaming_url_dedup" -> urlDedupOracle,
    // the repetition counters via line/gram explodes (the per-row
    // expression's excess convention: repeated mass = total - distinct);
    // all fractions are single exact divisions of integers, rounded 6
    "t25_repetition_filter" ->
      s"""WITH aug AS (
         |  SELECT doc_id, CASE WHEN doc_id % 6 = 2
         |    THEN text || chr(10) || text ELSE text END AS text
         |  FROM documents),
         |${repLineCtesSql("aug")},
         |tk AS (SELECT doc_id, length(text) AS n_chars,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM aug),
         |${repGramCtesSql("tk", "t")},
         |f AS (
         |  SELECT a.doc_id, a.text,
         |    COALESCE(la.n_lines, 0) AS n_lines,
         |    greatest(len(tk.t) - 1, 0) AS n_2grams,
         |    ${repFracColsSql("tk.n_chars")}
         |  FROM aug a
         |  LEFT JOIN la USING (doc_id) LEFT JOIN tk USING (doc_id)
         |  LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id))
         |SELECT doc_id,
         |  CASE WHEN text IS NULL THEN NULL ELSE n_lines END AS n_lines,
         |  dup_line_frac, dup_line_char_frac, top2gram_frac, dup3gram_frac,
         |  $repPassSql AS passes
         |FROM f
         |${orderSql("doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
                     "top2gram_frac", "dup3gram_frac", "passes")}""".stripMargin,
    // the funnel's gates are the t20/t23/t25/t26 mirrors verbatim (t25's
    // explodes on RAW text, t26's scores without the planted union), then
    // one CASE picks the first failing gate — both engines fold the same
    // total (coalesced) booleans, so the decision column hashes exactly
    "t28_curation_funnel" -> curationFunnelOracle,
    // batch == streaming for the funnel: row-local decisions make the
    // union over micro-batches equal the one-shot output by construction,
    // so ONE oracle pins both paths
    "st16_streaming_curation" -> curationFunnelOracle,
    // per-codepoint counts via a char explode; the Gini inputs are exact
    // integers, so the single division reproduces Spark's double exactly
    "t24_char_distribution" ->
      s"""WITH ch AS (
         |  SELECT doc_id,
         |    substr(text, CAST(unnest(range(1, length(text) + 1)) AS INTEGER), 1) AS c
         |  FROM documents WHERE length(text) > 0),
         |g AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total,
         |        CAST(COUNT(*) AS INTEGER) AS nd, CAST(SUM(n * n) AS BIGINT) AS ss
         |      FROM g GROUP BY doc_id)
         |SELECT doc_id,
         |  CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(a.nd, 0) END AS n_distinct_chars,
         |  CASE WHEN a.total IS NULL THEN NULL
         |       ELSE ROUND(1.0 - a.ss / (CAST(a.total AS DOUBLE) * a.total), 6)
         |  END AS char_gini
         |FROM documents d LEFT JOIN a USING (doc_id)
         |${orderSql("doc_id", "n_distinct_chars", "char_gini")}""".stripMargin,
    // same RE2-\s token contract as t04/t07; n_docs is counted over tf so
    // token-less documents drop out on both engines
    "t16_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf)
         |SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |  ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
         |FROM tf JOIN df USING (token) CROSS JOIN n
         |${orderSql("doc_id", "token")}""".stripMargin,
    "s09_embed_centroids" ->
      s"""WITH d AS (SELECT label,
         |  CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
         |  CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings)
         |SELECT label, pos, COUNT(*) AS n, ${davgSql("v")} AS centroid
         |FROM d GROUP BY label, pos ${orderSql("label", "pos")}""".stripMargin,
    "d01_dedup_exact" ->
      s"""SELECT min(doc_id) AS doc_id FROM (
         |SELECT doc_id, text FROM documents
         |UNION ALL SELECT doc_id + 1000000, text FROM documents)
         |GROUP BY text ${orderSql("doc_id")}""".stripMargin,
    "d02_dedup_fingerprint" ->
      s"""SELECT md5(text) AS fp, min(doc_id) AS doc_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY md5(text) ${orderSql("fp", "doc_id")}""".stripMargin,
    // exact recomputation of the PORTABLE minhash signatures (same md5
    // family as MinHashSigMd5 — see expressions/TextSignatures.scala), then
    // brute-force all pairs: a pair is in the output iff some band's 4-slice
    // is fully equal (the LSH candidate condition — band keys only hash the
    // slice, so slice equality IS bucket collision) AND >=32 of 64 positions
    // agree (est_jaccard >= 0.5). Checks signatures, banding, and the
    // estimate end-to-end.
    "d03_minhash_pairs" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents),
         |tk AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id,
         |  -- COALESCE: DuckDB's array_to_string([], ' ') is NULL, but the
         |  -- Spark fallback shingle for a zero-token doc is '' — without it
         |  -- every empty/whitespace-only doc loses its shingle and the
         |  -- J=1 clique among such docs silently vanishes from the oracle
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |xs AS (SELECT doc_id,
         |  list_transform(s, g -> CAST(md5_number_upper(g) % 2147483647 AS BIGINT)) AS x FROM sh),
         |sig AS (SELECT doc_id,
         |  list_transform(range(0, 64), i ->
         |    list_min(list_transform(x, v ->
         |      ((1 + ((2654435761 * (i + 1)) % 2147483646)) * v
         |        + ((2246822519 * (i + 1)) % 2147483647)) % 2147483647))) AS sg
         |  FROM xs),
         |pairs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB,
         |    len(list_filter(range(0, 64), i -> a.sg[i + 1] = b.sg[i + 1])) AS neq,
         |    len(list_filter(range(0, 16), bb ->
         |      a.sg[4*bb + 1] = b.sg[4*bb + 1] AND a.sg[4*bb + 2] = b.sg[4*bb + 2]
         |      AND a.sg[4*bb + 3] = b.sg[4*bb + 3] AND a.sg[4*bb + 4] = b.sg[4*bb + 4])) AS nbands
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT idA, idB, neq / 64.0 AS est_jaccard
         |FROM pairs WHERE nbands > 0 AND neq >= 32
         |${orderSql("idA", "idB", "est_jaccard")}""".stripMargin,
    // exact recomputation of the portable 60-bit md5 simhash (SimHashMd5),
    // then brute-force all-pairs Hamming <= 2: banding recall is exactly 1
    // by pigeonhole (2 differing bits cannot touch all 4 chunks), so the
    // brute-force set equals the banded set
    "d04_simhash_pairs" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents),
         |tk AS (SELECT doc_id,
         |  list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS t
         |  FROM docs),
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM tk),
         |votes AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN CAST((md5_number_upper(tok) >> CAST(b AS INTEGER)) & 1 AS BIGINT) = 1
         |        THEN 1 ELSE -1 END) AS v
         |  FROM tok CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bits
         |  GROUP BY doc_id, b),
         |sig0 AS (SELECT doc_id,
         |  SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS s
         |  FROM votes GROUP BY doc_id),
         |-- NULL text -> NULL sig, matching SimHashMd5's null propagation
         |-- (a NULL-sig doc pairs with NOTHING — the hamming filter drops
         |-- NULL); only an EMPTY-token doc coalesces to sig 0. COALESCE(s,0)
         |-- for NULL text would instead alias NULL-text docs onto the
         |-- empty-doc signature and emit pairs Spark never produces.
         |sig AS (SELECT d.doc_id,
         |  CASE WHEN d.text IS NOT NULL THEN CAST(COALESCE(s, 0) AS BIGINT) END AS s
         |  FROM (SELECT doc_id, text FROM docs) d LEFT JOIN sig0 USING (doc_id))
         |SELECT a.doc_id AS idA, b.doc_id AS idB,
         |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 2
         |${orderSql("idA", "idB", "hamming")}""".stripMargin,
    // brute-force exact word-3-gram Jaccard: shingle-explode + equi-join on
    // the shingle gives every pair with intersection>0 (superset of J>=0.5),
    // |A u B| = |A| + |B| - |A n B|. Mirrors ShingleHashes semantics: distinct
    // shingles, whole-doc fallback shingle for docs shorter than n tokens.
    "d05_ngram_jaccard_pairs" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents),
         |tk AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id,
         |  -- COALESCE: DuckDB's array_to_string([], ' ') is NULL, but the
         |  -- Spark fallback shingle for a zero-token doc is '' — without it
         |  -- every empty/whitespace-only doc loses its shingle and the
         |  -- J=1 clique among such docs silently vanishes from the oracle
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB,
         |         COUNT(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT idA, idB,
         |  -- VARCHAR->DECIMAL like t02: jaccard is p/q with q often 2^k*5*m
         |  -- (e.g. 1/640 = 0.0015625 — renders to 7 digits ending in 5 but
         |  -- is NOT binary-exact), where DuckDB's binary round and Spark's
         |  -- rendering-based HALF_UP can split
         |  CAST(round(CAST(CAST(CAST(inter AS DOUBLE) / (na + nb - inter) AS VARCHAR)
         |                  AS DECIMAL(38,20)), 6) AS DOUBLE) AS jaccard
         |FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
         |${orderSql("idA", "idB", "jaccard")}""".stripMargin,
    // brute-force exact cosine over the planted-near-dup corpus: the LSH
    // path must find exactly the pairs the all-pairs scan finds (recall-1
    // regime — see the d06 query comment). Cosine computed in double over
    // float inputs on both engines; the planted pairs sit at ~1.0, far from
    // the 0.999 threshold, so float-ulp differences in the mutation can't
    // flip membership or the 4-dp rounding.
    "d06_embed_near_dup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |         CAST(list_transform(embedding, x -> CAST(x * 1.01 AS FLOAT)) AS DOUBLE[])
         |  FROM embeddings)
         |SELECT a.vec_id AS idA, b.vec_id AS idB,
         |       round(list_cosine_similarity(a.v, b.v), 4) AS cosine
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.v, b.v) >= 0.999
         |${orderSql("idA", "idB", "cosine")}""".stripMargin,
    // the MMR greedy walk replayed exactly: same planted mixes (power-of-
    // two coefficients — every double is exact), the s04 quantization
    // fragment, integer dots, and a recursive CTE whose correlated
    // ORDER-BY-LIMIT subquery picks each round's argmax (rel - max sim to
    // the carried selected list, tie by candidate id — t27's recursive-
    // replay discipline applied to a 2-D greedy)
    "s17_mmr_rerank" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |dirs AS (SELECT q.qid, q.qv AS qd, u.v AS ud, w.v AS wd, x.v AS xd
         |  FROM q JOIN e u ON u.vec_id = q.qid + 10
         |         JOIN e w ON w.vec_id = q.qid + 20
         |         JOIN e x ON x.vec_id = q.qid + 30),
         |a_rows AS (SELECT 100000 + qid*10 + i AS vec_id,
         |    list_transform(range(1, len(qd)+1),
         |      j -> 10.0*qd[j] + ((i+1)/16.0)*ud[j]) AS vd
         |  FROM (SELECT qid, qd, ud, unnest(range(0,3)) AS i FROM dirs)),
         |b_rows AS (
         |  SELECT 200000 + qid*10 AS vec_id,
         |    list_transform(range(1, len(qd)+1), j -> 2.0*qd[j] + wd[j]) AS vd
         |  FROM dirs
         |  UNION ALL
         |  SELECT 200000 + qid*10 + 1,
         |    list_transform(range(1, len(qd)+1), j -> 2.0*qd[j] + xd[j])
         |  FROM dirs),
         |corpus AS (
         |  SELECT vec_id, v AS vd FROM e WHERE vec_id >= 10
         |  UNION ALL SELECT vec_id, vd FROM a_rows
         |  UNION ALL SELECT vec_id, vd FROM b_rows),
         |cqz AS (SELECT vec_id,
         |    list_transform(vd, x -> CASE WHEN ma > 0
         |      THEN CAST(floor(x * (127.0 / ma) + 0.5) AS INTEGER) ELSE 0 END) AS qz
         |  FROM (SELECT vec_id, vd,
         |          list_max(list_transform(vd, x -> abs(x))) AS ma FROM corpus)),
         |qq AS (SELECT qid,
         |    list_transform(qv, x -> CASE WHEN ma > 0
         |      THEN CAST(floor(x * (127.0 / ma) + 0.5) AS INTEGER) ELSE 0 END) AS qz
         |  FROM (SELECT qid, qv,
         |          list_max(list_transform(qv, x -> abs(x))) AS ma FROM q)),
         |scored AS (SELECT qq.qid AS query_id, c.vec_id AS cand_id,
         |    CAST(list_sum(list_transform(range(1, len(qq.qz)+1),
         |      j -> qq.qz[j] * c.qz[j])) AS BIGINT) AS rel
         |  FROM qq JOIN cqz c ON true),
         |cand AS (SELECT query_id, cand_id, rel FROM (
         |    SELECT query_id, cand_id, rel,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, cand_id ASC) AS rn
         |    FROM scored) WHERE rn <= 20),
         |ps AS (SELECT a.query_id, a.cand_id AS a, b.cand_id AS b,
         |    CAST(list_sum(list_transform(range(1, len(av.qz)+1),
         |      j -> av.qz[j] * bv.qz[j])) AS BIGINT) AS sim
         |  FROM cand a JOIN cand b
         |    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
         |  JOIN cqz av ON av.vec_id = a.cand_id
         |  JOIN cqz bv ON bv.vec_id = b.cand_id),
         |sel(query_id, sel_list, step) AS (
         |  SELECT query_id, [cand_id], 1 FROM (
         |    SELECT query_id, cand_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, cand_id ASC) AS rn
         |    FROM cand) WHERE rn = 1
         |  UNION ALL
         |  SELECT s.query_id, list_append(s.sel_list, (
         |      SELECT c.cand_id FROM cand c
         |      WHERE c.query_id = s.query_id
         |        AND NOT list_contains(s.sel_list, c.cand_id)
         |      ORDER BY (c.rel - COALESCE((SELECT max(p.sim) FROM ps p
         |          WHERE p.query_id = s.query_id AND p.a = c.cand_id
         |            AND list_contains(s.sel_list, p.b)), 0)) DESC,
         |        c.cand_id ASC
         |      LIMIT 1)), s.step + 1
         |  FROM sel s WHERE s.step < 5)
         |SELECT query_id, unnest(sel_list) AS selected_id,
         |  CAST(unnest(range(1, 6)) AS INTEGER) AS step
         |FROM sel WHERE step = 5
         |${orderSql("query_id", "selected_id", "step")}""".stripMargin,
    // brute-force all-pairs survivor set — ignores the operator's cell
    // structure entirely (planted exact copies make it invisible; see the
    // query comment): keep every id with no smaller-id >= 0.999 neighbor
    "s16_semantic_dedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) FROM embeddings),
         |blocked AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM e a JOIN e b ON b.vec_id < a.vec_id
         |  WHERE list_cosine_similarity(a.v, b.v) >= 0.999)
         |SELECT vec_id FROM e
         |WHERE NOT EXISTS (SELECT 1 FROM blocked bl WHERE bl.vec_id = e.vec_id)
         |${orderSql("vec_id")}""".stripMargin,
    // exact reachability clusters (shared with st23: the incrementally
    // maintained closure equals the one-shot labels for any batch split)
    "d09_dedup_clusters" -> clusterClosureOracle,
    "st23_streaming_closure" -> clusterClosureOracle,
    // keep-first survivors of the exact-Jaccard near-dup pairs: every id
    // that is the LARGER member of any J>=0.5 pair is dropped
    "d07_dedup_survivors" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents),
         |tk AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id,
         |  -- COALESCE: DuckDB's array_to_string([], ' ') is NULL, but the
         |  -- Spark fallback shingle for a zero-token doc is '' — without it
         |  -- every empty/whitespace-only doc loses its shingle and the
         |  -- J=1 clique among such docs silently vanishes from the oracle
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
         |losers AS (
         |  SELECT DISTINCT b.doc_id AS doc_id
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (any_value(a.n) + any_value(b.n) - COUNT(*)) >= 0.5)
         |SELECT doc_id FROM docs WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         |${orderSql("doc_id")}""".stripMargin,
    // same window grid (64 chars, stride 32), shared = hash seen in more
    // than one doc (min<>max id per hash group)
    // d09's reachability CTE + a per-cluster best pick (score DESC NULLS
    // LAST, id ASC), mirroring bestSurvivors' window exactly
    "d12_best_survivors" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents),
         |tk AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (any_value(a.n) + any_value(b.n) - COUNT(*)) >= 0.5),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM pairs
         |  UNION ALL SELECT idB, idA FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id),
         |scored AS (SELECT d.doc_id, lab.cluster,
         |    CAST(length(d.text) AS INTEGER) AS score,
         |    row_number() OVER (PARTITION BY lab.cluster
         |      ORDER BY length(d.text) DESC NULLS LAST, d.doc_id ASC) AS rn
         |  FROM docs d JOIN lab USING (doc_id))
         |SELECT doc_id, cluster, score FROM scored WHERE rn = 1
         |${orderSql("doc_id", "cluster", "score")}""".stripMargin,
    // d09's reachability CTE over the THREE-member mutation families +
    // the quota window (rank <= 2) and exact per-cluster size counts —
    // mirrors quotaSurvivors' window and integer upweight pair exactly
    "d25_cluster_quota" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |    substring(t1, instr(t1, ' ') + 1)
         |  FROM (SELECT doc_id, substring(text, instr(text, ' ') + 1) AS t1
         |        FROM documents)),
         |tk AS (SELECT doc_id,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id,
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (any_value(a.n) + any_value(b.n) - COUNT(*)) >= 0.5),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM pairs
         |  UNION ALL SELECT idB, idA FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id),
         |sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM lab GROUP BY cluster),
         |ranked AS (SELECT d.doc_id, lab.cluster,
         |    row_number() OVER (PARTITION BY lab.cluster
         |      ORDER BY length(d.text) DESC NULLS LAST, d.doc_id ASC) AS rn
         |  FROM docs d JOIN lab USING (doc_id))
         |SELECT r.doc_id, r.cluster, CAST(r.rn AS INTEGER) AS rank,
         |  s.cluster_size,
         |  least(2, s.cluster_size) AS n_kept
         |FROM ranked r JOIN sizes s USING (cluster) WHERE r.rn <= 2
         |${orderSql("doc_id", "cluster", "rank", "cluster_size", "n_kept")}""".stripMargin,
    // the embedding-space curation chain: brute-force cosine pairs at the
    // same recall-1 threshold, recursive-CTE closure, same window pick
    "d14_semantic_curation" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |         CAST(list_transform(embedding, x -> CAST(x * 1.01 AS FLOAT)) AS DOUBLE[])
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS idA, b.vec_id AS idB
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.v, b.v) >= 0.999),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM pairs
         |  UNION ALL SELECT idB, idA FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM e
         |  UNION
         |  SELECT ed.dst, r.lbl FROM reach r JOIN edges ed ON ed.src = r.id),
         |lab AS (SELECT id AS vec_id, min(lbl) AS cluster FROM reach GROUP BY id),
         |scored AS (SELECT e.vec_id, lab.cluster, e.vec_id % 97 AS score,
         |    row_number() OVER (PARTITION BY lab.cluster
         |      ORDER BY e.vec_id % 97 DESC NULLS LAST, e.vec_id ASC) AS rn
         |  FROM e JOIN lab ON e.vec_id = lab.vec_id)
         |SELECT vec_id, cluster, CAST(score AS BIGINT) AS score
         |FROM scored WHERE rn = 1
         |${orderSql("vec_id", "cluster", "score")}""".stripMargin,
    // same planted construction; IS DISTINCT FROM mirrors Spark's <=> so a
    // NULL-text doc present in both snapshots stays 'unchanged'
    "d13_corpus_diff" ->
      s"""WITH old AS (SELECT doc_id, md5(text) AS fp, 1 AS present FROM documents),
         |new AS (
         |  SELECT doc_id,
         |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS fp,
         |    1 AS present
         |  FROM documents WHERE doc_id % 11 <> 0
         |  UNION ALL
         |  SELECT doc_id + 3000000, md5(text), 1 FROM documents WHERE doc_id % 17 = 0),
         |d AS (
         |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |    CASE WHEN o.present IS NULL THEN 'added'
         |         WHEN n.present IS NULL THEN 'removed'
         |         WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
         |SELECT doc_id, status FROM d WHERE status <> 'unchanged'
         |${orderSql("doc_id", "status")}""".stripMargin,
    // the same deterministic delta applied relationally: NOT EXISTS is the
    // left_anti, upserts re-enter via UNION ALL — every surviving row and
    // value is pinned
    "d15_corpus_merge" -> mergeOracle,
    // the SQL mirror of d16's CDC delta applied to the planted corpus,
    // then brute-force ranking: deletes (planted j=0,1), a moved vector
    // (planted j=2 takes the NEXT query's vector), inserts (200000-range
    // fresh copies). Hash-pins the SERVED post-maintenance ranking.
    // st12 replays the SAME delta as micro-batches — one oracle pins
    // streaming == batch index maintenance, the st11/d15 discipline.
    "d16_ann_index_cdc" -> annCdcOracle,
    "st12_ann_index_stream" -> annCdcOracle,
    // brute-force jaccard (d05's shingle construction) over new x
    // (old + smaller-id new); survivors = batch minus blocked
    "d17_incremental_dedup" ->
      s"""WITH oldd AS (SELECT doc_id, text, FALSE AS isnew FROM documents),
         |newd AS (
         |  SELECT doc_id + 1000000 AS doc_id,
         |         substring(text, instr(text, ' ') + 1) AS text, TRUE AS isnew
         |  FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |         array_to_string(list_transform(str_split(text, ' '), t -> t || '_xq'), ' '),
         |         TRUE
         |  FROM documents WHERE doc_id % 5 = 1),
         |docs AS (SELECT * FROM oldd UNION ALL SELECT * FROM newd),
         |tk AS (SELECT doc_id, isnew,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id, isnew,
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, isnew, unnest(s) AS g, len(s) AS n FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS idA, COUNT(*) AS inter,
         |         any_value(a.n) AS na, any_value(b.n) AS nb
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.isnew
         |    AND (NOT b.isnew OR b.doc_id < a.doc_id) AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |blocked AS (SELECT DISTINCT idA FROM pairs
         |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5)
         |SELECT n.doc_id FROM newd n
         |WHERE NOT EXISTS (SELECT 1 FROM blocked b WHERE b.idA = n.doc_id)
         |${orderSql("doc_id")}""".stripMargin,
    // the semantic aggregate the state store must hold after consuming
    // everything — index/store/serialization-blind
    "st14_state_introspection" ->
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM events GROUP BY event_type
         |${orderSql("event_type", "n_events", "id_sum")}""".stripMargin,
    // the span grid + first-occurrence window + ordered reassembly,
    // ignorant of the engine's window/groupBy split
    "d18_span_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' salt_' || CAST(doc_id AS VARCHAR)
         |  FROM documents WHERE doc_id % 4 = 1
         |  UNION ALL
         |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 10 = 3),
         |sp AS (
         |  SELECT doc_id, text,
         |    CAST(unnest(range(0, CAST(ceil(length(text) / 100.0) AS INTEGER))) AS INTEGER) AS span_idx
         |  FROM corpus WHERE length(text) > 0),
         |w AS (
         |  SELECT doc_id, span_idx,
         |    substr(text, span_idx * 100 + 1, 100) AS span,
         |    row_number() OVER (PARTITION BY md5(substr(text, span_idx * 100 + 1, 100))
         |      ORDER BY doc_id, span_idx) AS rk
         |  FROM sp)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(count(*) FILTER (WHERE rk = 1) AS BIGINT) AS n_kept,
         |  string_agg(CASE WHEN rk = 1 THEN span END, '' ORDER BY span_idx) AS text
         |FROM w GROUP BY doc_id
         |HAVING count(*) FILTER (WHERE rk = 1) > 0
         |${orderSql("doc_id", "n_spans", "n_kept", "text")}""".stripMargin,
    // the CdcSpans chunker recomputed per-char: the same stepwise-mod
    // rolling polynomial over the last 8 codepoints decides each cut, a
    // prefix-sum window assigns chars to spans, and the d18 tail (first
    // occurrence by (doc_id, span_idx), ordered reassembly) rewrites
    "d20_cdc_span_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000,
         |    '$cdcOffGridPrefix' || text || ' tail_' || CAST(doc_id AS VARCHAR)
         |  FROM documents WHERE doc_id % 4 = 1
         |  UNION ALL
         |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 10 = 3),
         |ch AS (
         |  SELECT doc_id, text,
         |    CAST(unnest(range(1, length(text) + 1)) AS INTEGER) AS i
         |  FROM corpus WHERE length(text) > 0),
         |cut AS (
         |  SELECT doc_id, i, substr(text, i, 1) AS c,
         |    CASE WHEN i >= 8 AND $cdcPolySql % 64 = 0 THEN 1 ELSE 0 END AS x
         |  FROM ch),
         |idx AS (
         |  SELECT doc_id, i, c,
         |    COALESCE(SUM(x) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS span_idx
         |  FROM cut),
         |sp AS (
         |  SELECT doc_id, CAST(span_idx AS INTEGER) AS span_idx,
         |    string_agg(c, '' ORDER BY i) AS span
         |  FROM idx GROUP BY doc_id, span_idx),
         |spn AS (
         |  SELECT doc_id, span_idx, span,
         |    COUNT(*) OVER (PARTITION BY doc_id) AS ns
         |  FROM sp),
         |w AS (
         |  -- spans under 20 chars are EXEMPT from dedup (min-match-length):
         |  -- a per-row-unique fingerprint puts each alone in its partition
         |  SELECT doc_id, span_idx, span, ns,
         |    row_number() OVER (PARTITION BY
         |      CASE WHEN length(span) >= 20 THEN md5(span)
         |           ELSE '#' || CAST(doc_id AS VARCHAR) || ':' || CAST(span_idx AS VARCHAR) END
         |      ORDER BY doc_id, span_idx) AS rk
         |  FROM spn)
         |SELECT doc_id, CAST(max(ns) AS BIGINT) AS n_spans,
         |  CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(span, '' ORDER BY span_idx) AS text
         |FROM w WHERE rk = 1 GROUP BY doc_id
         |${orderSql("doc_id", "n_spans", "n_kept", "text")}""".stripMargin,
    // the d20 chunker over BOTH corpora (side-tagged), train collapsed to
    // a distinct span-hash set, eval spans membership-checked — catching
    // the off-grid (offset 38) inclusions d11's stride grid cannot
    "d21_cdc_contamination" ->
      s"""WITH corpus AS (
         |  SELECT 't' AS side, doc_id, text FROM documents
         |  UNION ALL
         |  SELECT 'e', doc_id + 2000000, substring(text, 38)
         |  FROM documents WHERE doc_id % 7 = 0),
         |ch AS (
         |  SELECT side, doc_id, text,
         |    CAST(unnest(range(1, length(text) + 1)) AS INTEGER) AS i
         |  FROM corpus WHERE length(text) > 0),
         |cut AS (
         |  SELECT side, doc_id, i, substr(text, i, 1) AS c,
         |    CASE WHEN i >= 8 AND $cdcPolySql % 64 = 0 THEN 1 ELSE 0 END AS x
         |  FROM ch),
         |idx AS (
         |  SELECT side, doc_id, i, c,
         |    COALESCE(SUM(x) OVER (PARTITION BY side, doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS span_idx
         |  FROM cut),
         |sp AS (
         |  SELECT side, doc_id, span_idx, string_agg(c, '' ORDER BY i) AS span
         |  FROM idx GROUP BY 1, 2, 3),
         |tset AS (
         |  SELECT DISTINCT md5(span) AS h FROM sp
         |  WHERE side = 't' AND length(span) >= 20)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(SUM(CASE WHEN length(span) >= 20
         |    AND md5(span) IN (SELECT h FROM tset) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated
         |FROM sp WHERE side = 'e' GROUP BY doc_id
         |${orderSql("doc_id", "n_spans", "n_contaminated")}""".stripMargin,
    // the streaming-admission cascade, ignorant of the index/append
    // machinery: batch-1 admission vs corpus + smaller-id batch-1 rows;
    // batch-2 admission vs corpus + batch-1 SURVIVORS (adm1 — the
    // survivors-only semantics the one-shot d17 oracle doesn't have) +
    // smaller-id batch-2 rows. The C-window rows (+6e6) pair only the
    // REJECTED B-windows, so they appear in the output iff the engine
    // blocks against survivors rather than all earlier rows.
    "st13_streaming_ingest_dedup" ->
      s"""WITH wd AS (
         |  SELECT doc_id, str_split(text, ' ') AS wt FROM documents
         |  WHERE len(str_split(text, ' ')) >= 30 AND doc_id % 4 = 0),
         |b1 AS (
         |  SELECT doc_id + 1000000 AS doc_id,
         |         substring(text, instr(text, ' ') + 1) AS text
         |  FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 4000000,
         |    array_to_string(list_transform(wt[1:20], x -> x || '_w'), ' ') FROM wd
         |  UNION ALL
         |  SELECT doc_id + 5000000,
         |    array_to_string(list_transform(wt[6:25], x -> x || '_w'), ' ') FROM wd),
         |b2 AS (
         |  SELECT doc_id + 6000000 AS doc_id,
         |    array_to_string(list_transform(wt[11:30], x -> x || '_w'), ' ') AS text FROM wd
         |  UNION ALL
         |  SELECT doc_id + 7000000,
         |    array_to_string(list_transform(wt[2:20], x -> x || '_w'), ' ') FROM wd
         |  UNION ALL
         |  SELECT doc_id + 2000000,
         |    array_to_string(list_transform(str_split(text, ' '), t -> t || '_xr'), ' ')
         |  FROM documents WHERE doc_id % 5 = 2),
         |docs AS (
         |  SELECT doc_id, text, 0 AS batch FROM documents
         |  UNION ALL SELECT doc_id, text, 1 FROM b1
         |  UNION ALL SELECT doc_id, text, 2 FROM b2),
         |tk AS (SELECT doc_id, batch,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0) AS t
         |  FROM docs),
         |sh AS (SELECT doc_id, batch,
         |  CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
         |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  END AS s FROM tk),
         |ex AS (SELECT doc_id, batch, unnest(s) AS g, len(s) AS n FROM sh),
         |p1 AS (
         |  SELECT a.doc_id AS idA, COUNT(*) AS inter,
         |         any_value(a.n) AS na, any_value(b.n) AS nb
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.batch = 1
         |    AND (b.batch = 0 OR (b.batch = 1 AND b.doc_id < a.doc_id))
         |  GROUP BY a.doc_id, b.doc_id),
         |blocked1 AS (SELECT DISTINCT idA FROM p1
         |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
         |adm1 AS (SELECT doc_id FROM b1
         |  WHERE NOT EXISTS (SELECT 1 FROM blocked1 x WHERE x.idA = b1.doc_id)),
         |p2 AS (
         |  SELECT a.doc_id AS idA, COUNT(*) AS inter,
         |         any_value(a.n) AS na, any_value(b.n) AS nb
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.batch = 2
         |    AND (b.batch = 0
         |         OR (b.batch = 1 AND b.doc_id IN (SELECT doc_id FROM adm1))
         |         OR (b.batch = 2 AND b.doc_id < a.doc_id))
         |  GROUP BY a.doc_id, b.doc_id),
         |blocked2 AS (SELECT DISTINCT idA FROM p2
         |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
         |adm2 AS (SELECT doc_id FROM b2
         |  WHERE NOT EXISTS (SELECT 1 FROM blocked2 x WHERE x.idA = b2.doc_id))
         |SELECT doc_id FROM adm1 UNION ALL SELECT doc_id FROM adm2
         |${orderSql("doc_id")}""".stripMargin,
    // the streaming foreachBatch application of the SAME delta (split into
    // two disjoint-key micro-batches) must land on the identical snapshot —
    // one oracle pins streaming == batch merge semantics
    "st11_streaming_merge" -> mergeOracle,
    // exact per-column profile — COUNT(DISTINCT) semantics (null-ignoring)
    // agree across engines
    "t19_profile" ->
      s"""SELECT col_name, n_rows, n_nulls, n_distinct FROM (
         |  SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
         |    CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |    COUNT(DISTINCT doc_id) AS n_distinct FROM documents
         |  UNION ALL
         |  SELECT 'text', COUNT(*),
         |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT text) FROM documents
         |  UNION ALL
         |  SELECT 'lang', COUNT(*),
         |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT lang) FROM documents
         |  UNION ALL
         |  SELECT 'source', COUNT(*),
         |    CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT source) FROM documents
         |  UNION ALL
         |  SELECT 'n_chars', COUNT(*),
         |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT n_chars) FROM documents)
         |${orderSql("col_name", "n_rows", "n_nulls", "n_distinct")}""".stripMargin,
    // the per-source mixture rates replayed relationally; unknown sources
    // (null weight) drop on both engines via NULL comparison semantics
    "t22_mixture_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    TRY_CAST(substr(source, 4) AS INTEGER) % 4 AS bucket,
         |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS fp
         |  FROM documents)
         |SELECT doc_id, source,
         |  CAST(bucket + 1 AS DOUBLE) / 4.0 AS keep_rate
         |FROM d
         |WHERE bucket = 3 OR substr(fp, 1, 2) <
         |  CASE bucket WHEN 0 THEN '40' WHEN 1 THEN '80' WHEN 2 THEN 'c0' END
         |${orderSql("doc_id", "source", "keep_rate")}""".stripMargin,
    // the approx variant: exact figures + the in-query-verified envelope
    // bool (DuckDB's own HLL differs bit-wise, so the SKETCH value itself
    // is gated Spark-side, never hashed cross-engine — q17's discipline)
    "t21_profile_approx" ->
      s"""SELECT col_name, n_rows, n_nulls, n_distinct, TRUE AS approx_ok FROM (
         |  SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
         |    CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |    COUNT(DISTINCT doc_id) AS n_distinct FROM documents
         |  UNION ALL
         |  SELECT 'text', COUNT(*),
         |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT text) FROM documents
         |  UNION ALL
         |  SELECT 'lang', COUNT(*),
         |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT lang) FROM documents
         |  UNION ALL
         |  SELECT 'source', COUNT(*),
         |    CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT source) FROM documents
         |  UNION ALL
         |  SELECT 'n_chars', COUNT(*),
         |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    COUNT(DISTINCT n_chars) FROM documents)
         |${orderSql("col_name", "n_rows", "n_nulls", "n_distinct")}""".stripMargin,
    // same window CTE family as d10, split into the train hash set and the
    // eval window stream (semi-join instead of shared-hash window)
    "d11_cross_contamination" -> decontaminationOracle,
    // same admission semantics, index-blind: one oracle pins the inline
    // AND the persisted-index path (the t12/t15 shared-oracle convention)
    "d19_decontamination_index" -> decontaminationOracle,
    // streaming probe of the same index over the same eval set, batch
    // union == one-shot output by construction
    "st15_streaming_decontamination" -> decontaminationOracle,
    // the decontamination window CTEs over the two-population eval set
    // (leaked tails + one-quote plants); fraction = one float division,
    // flagged = the integer cross-multiply (no float threshold compare)
    "d23_contamination_fraction" ->
      s"""WITH train AS (SELECT doc_id, text FROM documents),
         |ev AS (
         |  SELECT doc_id + 2000000 AS doc_id, substr(text, 65) AS text
         |  FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 3000000 AS doc_id,
         |    rpad('q' || CAST(doc_id AS VARCHAR), 32, 'x') || substr(text, 1, 64) ||
         |    repeat(' unique-' || CAST(doc_id AS VARCHAR) || '-filler', 8) AS text
         |  FROM documents WHERE doc_id % 7 = 3 AND length(text) >= 64),
         |tw AS (
         |  SELECT DISTINCT md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) AS wh
         |  FROM (SELECT text, unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM train)
         |  WHERE length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0),
         |ew AS (
         |  SELECT doc_id,
         |    CASE WHEN length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0
         |         THEN md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) END AS wh
         |  FROM (SELECT doc_id, text,
         |          unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM ev)),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_windows FROM ew GROUP BY doc_id),
         |hit AS (SELECT ew.doc_id, COUNT(*) AS n_contaminated
         |        FROM ew JOIN tw USING (wh) GROUP BY ew.doc_id)
         |SELECT c.doc_id AS doc_id, c.n_windows,
         |  COALESCE(h.n_contaminated, 0) AS n_contaminated,
         |  round(COALESCE(h.n_contaminated, 0) / c.n_windows, 6) AS contamination_frac,
         |  COALESCE(h.n_contaminated, 0) * 2 >= c.n_windows AS flagged
         |FROM cnt c LEFT JOIN hit h ON c.doc_id = h.doc_id
         |${orderSql("doc_id", "n_windows", "n_contaminated", "contamination_frac", "flagged")}""".stripMargin,
    // d23's eval populations and window-hash set, train windows kept WITH
    // their grid index, q56's lag + explicit-ROWS island merge on the
    // character offsets, one span per island clamped to the doc length
    "d26_contamination_spans" ->
      s"""WITH train AS (SELECT doc_id, text FROM documents),
         |ev AS (
         |  SELECT doc_id + 2000000 AS doc_id, substr(text, 65) AS text
         |  FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 3000000 AS doc_id,
         |    rpad('q' || CAST(doc_id AS VARCHAR), 32, 'x') || substr(text, 1, 64) ||
         |    repeat(' unique-' || CAST(doc_id AS VARCHAR) || '-filler', 8) AS text
         |  FROM documents WHERE doc_id % 7 = 3 AND length(text) >= 64),
         |tw AS (
         |  SELECT DISTINCT md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) AS wh
         |  FROM (SELECT text, unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM ev)
         |  WHERE length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0),
         |sw AS (
         |  SELECT doc_id, CAST(i * 32 AS INTEGER) AS start,
         |    CASE WHEN length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0
         |         THEN md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) END AS wh
         |  FROM (SELECT doc_id, text,
         |          unnest(range(0, greatest(CAST(floor((COALESCE(length(text), 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM train)),
         |hits AS (SELECT sw.doc_id, sw.start FROM sw JOIN tw USING (wh)),
         |f AS (
         |  SELECT *, CASE WHEN lag(start) OVER w IS NULL
         |      OR start > lag(start) OVER w + 64 THEN 1 ELSE 0 END AS newi
         |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY start ASC)),
         |isl AS (
         |  SELECT doc_id, start,
         |    SUM(newi) OVER (PARTITION BY doc_id ORDER BY start ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM f),
         |spans AS (
         |  SELECT doc_id, island, MIN(start) AS span_start,
         |    MAX(start) + 64 AS raw_end
         |  FROM isl GROUP BY doc_id, island)
         |SELECT s.doc_id, CAST(s.island - 1 AS INTEGER) AS span_idx,
         |  s.span_start,
         |  CAST(least(s.raw_end, length(t.text)) AS INTEGER) AS span_end
         |FROM spans s JOIN train t USING (doc_id)
         |${orderSql("doc_id", "span_idx", "span_start", "span_end")}""".stripMargin,
    // t19's profile SQL on both snapshots + a full join on column name;
    // the v2 CTE mirrors the Spark-side planted drift step for step
    "d24_profile_drift" -> {
      def profileSql(from: String, cs: Seq[String]): String =
        cs.map(c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |    CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |    COUNT(DISTINCT $c) AS n_distinct FROM $from""".stripMargin)
          .mkString("\n  UNION ALL\n  ")
      s"""WITH v2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text,
         |    lang, source, doc_id % 5 AS rev
         |  FROM documents WHERE NOT COALESCE(doc_id % 11 = 0, FALSE)),
         |p1 AS (
         |  ${profileSql("documents", Seq("doc_id", "text", "lang", "source", "n_chars"))}),
         |p2 AS (
         |  ${profileSql("v2", Seq("doc_id", "text", "lang", "source", "rev"))})
         |SELECT COALESCE(p1.col_name, p2.col_name) AS col_name,
         |  CASE WHEN p1.col_name IS NULL THEN 'added'
         |       WHEN p2.col_name IS NULL THEN 'removed'
         |       ELSE 'common' END AS status,
         |  p2.n_rows - p1.n_rows AS rows_delta,
         |  p2.n_nulls - p1.n_nulls AS nulls_delta,
         |  p2.n_distinct - p1.n_distinct AS distinct_delta
         |FROM p1 FULL OUTER JOIN p2 ON p1.col_name = p2.col_name
         |${orderSql("col_name", "status", "rows_delta", "nulls_delta", "distinct_delta")}""".stripMargin
    },
    "d10_substring_contamination" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000,
         |    substr(text, 1, 199) || 'X' || substr(text, 201) FROM documents),
         |d AS (SELECT doc_id, text, length(text) AS n FROM docs),
         |w AS (
         |  -- empty/null window content -> NULL, never md5(''), mirroring
         |  -- the Spark side exactly (two contentless docs share NOTHING);
         |  -- COALESCE(n, 0) keeps a NULL-text doc at one window row
         |  -- regardless of the engine's greatest(NULL, 1) convention
         |  SELECT doc_id,
         |    CASE WHEN length(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) > 0
         |         THEN md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 64)) END AS wh
         |  FROM (SELECT doc_id, text,
         |          unnest(range(0, greatest(CAST(floor((COALESCE(n, 0) - 64) / 32.0) + 1 AS INTEGER), 1))) AS i
         |        FROM d)),
         |shared AS (SELECT wh FROM w WHERE wh IS NOT NULL
         |           GROUP BY wh HAVING min(doc_id) <> max(doc_id)),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id),
         |sh AS (SELECT w.doc_id, COUNT(*) AS n_shared FROM w JOIN shared USING (wh) GROUP BY w.doc_id)
         |SELECT c.doc_id AS doc_id, c.n_windows, COALESCE(s.n_shared, 0) AS n_shared
         |FROM cnt c LEFT JOIN sh s ON c.doc_id = s.doc_id
         |ORDER BY c.doc_id NULLS FIRST, n_windows NULLS FIRST, n_shared NULLS FIRST""".stripMargin,
    "d08_curation_pipeline" ->
      s"""SELECT d.doc_id AS doc_id, d.lang,
         |len(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> length(x) > 0)) AS n_tokens
         |FROM documents d
         |JOIN (SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM documents
         |      WHERE n_chars BETWEEN 100 AND 3000 GROUP BY md5(text)) k
         |ON d.doc_id = k.doc_id
         |ORDER BY d.doc_id NULLS FIRST, d.lang NULLS FIRST, n_tokens NULLS FIRST""".stripMargin,
    // recompute the decoded PNG's lane-0 pixel feature without a PNG codec:
    // pixel i of the 16x16 grayscale image is utf-8 byte (i mod len) of the
    // text, so lane 0 = integer sum of pixels at i % 8 == 0 over i in
    // 0..255, one double division at the end — exact on both engines
    // regardless of row or addition order
    "m02_media_features" ->
      s"""WITH h AS (
         |  -- COALESCE: a NULL text must behave like the Spark side's
         |  -- encodePng(null) = all-zero pixels (len 0 -> px 0), not
         |  -- propagate NULL through octet_length into SUM
         |  SELECT doc_id, COALESCE(octet_length(encode(text)), 0) AS len,
         |         COALESCE(hex(encode(text)), '') AS hx
         |  FROM documents),
         |e AS (SELECT doc_id, len, hx, unnest(range(0, 256)) AS i FROM h),
         |v AS (
         |  SELECT doc_id,
         |    CASE WHEN len = 0 THEN 0 ELSE
         |      (instr('0123456789ABCDEF', substr(hx, CAST(2*(i % len)+1 AS INTEGER), 1)) - 1) * 16 +
         |      (instr('0123456789ABCDEF', substr(hx, CAST(2*(i % len)+2 AS INTEGER), 1)) - 1)
         |    END AS px
         |  FROM e WHERE i % 8 = 0),
         |s AS (SELECT doc_id, SUM(px) AS s0 FROM v GROUP BY doc_id)
         |SELECT h.doc_id AS media_id,
         |  CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
         |  floor(CAST(s.s0 AS DOUBLE) / 255.0 / 256.0 * 1e6 + 0.5) / 1e6 AS f0
         |FROM h JOIN s ON h.doc_id = s.doc_id
         |${orderSql("media_id", "width", "height", "f0")}""".stripMargin,
    // frame windowing arithmetic (stride, tail clamping) replicated exactly;
    // the frame bytes themselves are substrings of the payload, covered by
    // n_bytes + m01's payload-length check
    "m03_frame_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id AS media_id, octet_length(encode(text)) AS len FROM documents),
         |f AS (
         |  SELECT media_id, len, greatest(CAST(len // 4 AS INTEGER), 1) AS stride,
         |         unnest(range(0, 4)) AS frame_idx
         |  FROM b)
         |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
         |  -- NULL text -> NULL frames on the Spark side (substr of a NULL
         |  -- payload); DuckDB's greatest/least SKIP nulls and would coerce
         |  -- to 0, so the NULL must be preserved explicitly
         |  CAST(CASE WHEN len IS NOT NULL
         |    THEN least(16, greatest(len - frame_idx * stride, 0))
         |  END AS INTEGER) AS frame_bytes
         |FROM f ${orderSql("media_id", "frame_idx", "frame_bytes")}""".stripMargin,
    // frames slice the hex rendering (2 chars/byte, DuckDB cannot slice a
    // BLOB); hex() is uppercase on both engines and md5 of the ASCII hex
    // slice is engine-portable even at mid-codepoint byte boundaries
    "m04_frame_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         |         octet_length(encode(text)) AS len
         |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         |f AS (
         |  SELECT media_id, md5(substring(hx, CAST(i * 128 + 1 AS INTEGER), 128)) AS fhash
         |  FROM m, unnest(range(0, CAST(ceil(len / 64.0) AS INTEGER))) AS u(i)),
         |p AS (SELECT media_id, fhash, COUNT(*) AS c FROM f GROUP BY 1, 2),
         |w AS (SELECT media_id, c, COUNT(*) OVER (PARTITION BY fhash) AS nd FROM p)
         |SELECT media_id, CAST(SUM(c) AS BIGINT) AS n_frames,
         |  CAST(SUM(CASE WHEN nd >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_shared
         |FROM w GROUP BY media_id ${orderSql("media_id", "n_frames", "n_shared")}""".stripMargin,
    // the dHash recomputed from the text bytes the PNG pixels encode (m02's
    // trick: pixel i = utf-8 byte i mod len; shifted copies add 16 clamped
    // at 255, RGB re-encodes change no pixel), then brute-force all-pairs
    // Hamming — the banded Spark output is pigeonhole-exact at
    // maxHamming=4 < blocks=8, so the two agree row-for-row
    "m05_perceptual_dedup" -> perceptualPairsOracle,
    // shared with m05: the incrementally-maintained band index's pair
    // union over batches equals the one-shot banded pairs for any batch
    // split (orientation-normalized, min-hamming deduped)
    "st24_streaming_perceptual" -> perceptualPairsOracle,
    // m05's pairs closed by d09's recursive-CTE reachability: every image
    // labeled with the min id reachable through the hamming<=4 graph
    "m06_perceptual_clusters" ->
      s"""WITH RECURSIVE $m05SigCtes,
         |p AS (SELECT idA, idB FROM ($m05PairsSql) WHERE hamming <= 4),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM p
         |  UNION ALL SELECT idB, idA FROM p),
         |reach(id, lbl) AS (
         |  SELECT media_id, media_id FROM sig
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
         |SELECT id AS media_id, min(lbl) AS cluster FROM reach GROUP BY id
         |${orderSql("media_id", "cluster")}""".stripMargin,
    // each variant's structural outcome is a LITERAL of the variant alone
    // (never of the content) — that invariance IS the decode contract
    "m07_media_robustness" ->
      s"""WITH v(idx, variant, decoded, width, height, has_dhash) AS (
         |  SELECT * FROM (VALUES
         |    (0, 'valid',      TRUE,  16,   16,   TRUE),
         |    (1, 'truncated',  FALSE, NULL, NULL, FALSE),
         |    (2, 'mislabeled', FALSE, NULL, NULL, FALSE),
         |    (3, 'thin',       TRUE,  1,    16,   FALSE),
         |    (4, 'palette',    TRUE,  16,   16,   TRUE)))
         |SELECT d.doc_id, v.variant, v.decoded,
         |  CAST(v.width AS INTEGER) AS width, CAST(v.height AS INTEGER) AS height,
         |  v.has_dhash
         |FROM documents d CROSS JOIN v WHERE d.doc_id % 50 = 0
         |${orderSql("doc_id", "variant", "decoded", "width", "height", "has_dhash")}""".stripMargin,
    "m01_media_meta" ->
      s"""SELECT doc_id AS media_id, 'application/octet-stream' AS mime,
         |CAST(length(text) % 1920 AS INTEGER) AS width,
         |CAST(length(text) % 1080 AS INTEGER) AS height,
         |CAST(length(text) AS BIGINT) AS duration_ms,
         |CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
         |FROM documents ${orderSql("media_id")}""".stripMargin,
    // CAST to DOUBLE[] like d06: Spark's CosineSim widens each float to
    // double before accumulating, so the oracle must too — float-precision
    // accumulation can rank-swap near-tie neighbors as the corpus grows
    "s01_knn_brute" -> knnRankingOracle,
    // two-stage = exact by construction when the coarse net holds: one
    // oracle (s01's exact ranking) pins the whole retrieval pipeline
    "s11_two_stage_knn" -> knnRankingOracle,
    // PQ-ADC + exact re-rank: same trick, same oracle — the compressed
    // coarse stage must keep every true top-5 neighbor in its top-100
    "s13_knn_pq_adc" -> knnRankingOracle,
    // the filtered variant: corpus restricted by the label predicate
    // BEFORE ranking (query rows may or may not satisfy it themselves)
    "s10_filtered_knn" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
         |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |  ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
         |FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id AND c.label % 2 = 0
         |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // s08 is the UDAF formulation of the SAME ranking — one oracle pins both
    "s08_knn_topk_udaf" -> knnRankingOracle,
    // brute-force ranking over the PLANTED corpus (embWithPlantedDups
    // mirrored in SQL): since the planted duplicates make approximate
    // recall provably 1, this exact oracle hash-checks the LSH and IVF
    // pipelines end to end
    "s06_knn_lsh_planted" -> plantedKnnOracle,
    "s07_knn_ivf_planted" -> plantedKnnOracle,
    // s12 serves the same planted ranking through the build-once bucketed
    // index — the exact oracle pins the SERVED result end to end
    "s12_knn_ivf_serve" -> plantedKnnOracle,
    // s14 serves it through the composed IVF-PQ index (bucket-pruned ADC
    // scan + exact re-rank) — same exact oracle pins the full composition
    "s14_knn_ivfpq_serve" -> plantedKnnOracle,
    // s15: filtered ranking over the served index — the label predicate
    // restricts CANDIDATES (not queries); the two lowest-id planted copies
    // per query are labeled out, so a filter-ignoring implementation
    // hash-mismatches on the tie-break order
    "s15_knn_ivfpq_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
         |planted AS (
         |  SELECT 300000 + vec_id * 10 + CAST(j AS BIGINT) AS vec_id,
         |         CASE WHEN j < 2 THEN 1 ELSE 0 END AS label, v
         |  FROM (SELECT vec_id, v, unnest(range(0, 5)) AS j FROM q)),
         |c AS (SELECT vec_id, label, v FROM e
         |      UNION ALL SELECT vec_id, label, v FROM planted)
         |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |    ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
         |  FROM q JOIN c ON q.vec_id <> c.vec_id AND c.label = 0
         |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "s04_quantize_i8" ->
      s"""WITH m AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    unnest(list_transform(embedding,
         |      x -> CASE WHEN ma > 0 THEN CAST(floor(x * (127.0 / ma) + 0.5) AS INTEGER)
         |                ELSE 0 END)) AS qi
         |  FROM m)
         |SELECT vec_id, COUNT(*) AS dim, CAST(SUM(qi) AS BIGINT) AS qsum,
         |  min(qi) AS qmin, max(qi) AS qmax
         |FROM q GROUP BY vec_id ${orderSql("vec_id", "dim", "qsum", "qmin", "qmax")}""".stripMargin,
    // user_id IS NOT NULL on both sides: per-user state needs a user (see
    // the query's dead-letter note)
    "st02_stateful_counts" ->
      s"""SELECT user_id, COUNT(*) AS n_events FROM events
         |WHERE user_id IS NOT NULL GROUP BY user_id
         |${orderSql("user_id", "n_events")}""".stripMargin,
    // the full matched-pair set of the streaming range join; CAST(ts AS
    // TIMESTAMP) mirrors Q.normalizeTs's truncation on old ns fixtures
    "st08_stream_stream_join" ->
      s"""SELECT e.user_id,
         |strftime(CAST(e.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS error_ts,
         |strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         |p.value AS p_value
         |FROM events e JOIN events p
         |  ON e.user_id = p.user_id
         | AND e.event_type = 'error' AND p.event_type = 'purchase'
         | AND CAST(e.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
         | AND CAST(e.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP) + INTERVAL 1 HOUR
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "st09_stream_static_join" ->
      s"""WITH dim AS (SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY user_id)
         |SELECT e.event_id, e.user_id, dim.user_total
         |FROM events e JOIN dim ON e.user_id = dim.user_id
         |WHERE e.event_type = 'purchase'
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // micro-unit longs on both sides: SUM over exact DECIMAL(18,6) values
    // scaled by 1e6 is an integer — no float addition order anywhere
    // user_id IS NOT NULL (the dead-letter rule); SUM's null-skip and
    // COUNT(DISTINCT)'s null-skip match the processor's coalesce-to-0
    // micros and skip-null-type updates
    "st07_transform_with_state" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0) * 1000000 AS BIGINT) AS total_micros,
         |COUNT(DISTINCT event_type) AS n_types
         |FROM events WHERE user_id IS NOT NULL GROUP BY user_id
         |${orderSql("user_id", "n_events", "total_micros", "n_types")}""".stripMargin,
    "st01_streaming_hourly" ->
      s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00:00') AS hour,
         |event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events GROUP BY 1, 2 ${orderSql("hour", "event_type", "n")}""".stripMargin,
    "st04_streaming_dedup" ->
      s"""SELECT DISTINCT user_id, event_type FROM events
         |${orderSql("user_id", "event_type")}""".stripMargin,
    // the 35-day dedup horizon covers the fixture's full 30-day span, so
    // the watermarked dedup equals the plain DISTINCT (no state evicted,
    // no late rows — see the query comment)
    "st05_streaming_dedup_watermark" ->
      s"""SELECT DISTINCT user_id, event_type FROM events
         |${orderSql("user_id", "event_type")}""".stripMargin,
    // batch replay of st06: the oracle sees ONLY the original events —
    // the 30-day-early replays the streaming side receives must be dropped
    // by the watermark for the hashes to agree
    "st06_late_data_drop" ->
      s"""WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
         |-- Spark's event-time watermark truncates max event time to MILLIseconds
         |-- before subtracting the delay; an untruncated max(ts) here could
         |-- close an hour window Spark leaves open when max(ts) lands within
         |-- 1 ms past a window-boundary + delay point
         |wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w FROM ev)
         |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
         |  event_type, COUNT(*) AS n
         |FROM ev, wm
         |GROUP BY date_trunc('hour', ts), event_type, wm.w
         |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
         |${orderSql("win_start", "event_type", "n")}""".stripMargin,
    // append-mode watermark replay: a window is emitted iff it was closed by
    // the final watermark (max event time - 30 min)
    // q20's sessionization CTE + st03's watermark closure: only sessions
    // whose end (last event + 30 min gap) the final watermark passed are
    // emitted in append mode
    "st10_streaming_session" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w FROM e),
         |f AS (SELECT user_id, ts,
         |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST) IS NULL
         |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST) >= INTERVAL 30 MINUTE
         |  THEN 1 ELSE 0 END AS ns FROM e),
         |g AS (SELECT user_id, ts,
         |  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM f)
         |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |COUNT(*) AS n_events
         |FROM g, wm
         |GROUP BY user_id, sid, wm.w
         |HAVING MAX(ts) + INTERVAL 30 MINUTE <= wm.w
         |${orderSql("user_id", "session_start", "n_events")}""".stripMargin,
    "st03_watermark_append" ->
      s"""WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
         |-- Spark's event-time watermark truncates max event time to MILLIseconds
         |-- before subtracting the delay; an untruncated max(ts) here could
         |-- close an hour window Spark leaves open when max(ts) lands within
         |-- 1 ms past a window-boundary + delay point
         |wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w FROM ev)
         |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
         |  event_type, COUNT(*) AS n
         |FROM ev, wm
         |GROUP BY date_trunc('hour', ts), event_type, wm.w
         |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
         |${orderSql("win_start", "event_type", "n")}""".stripMargin)
}

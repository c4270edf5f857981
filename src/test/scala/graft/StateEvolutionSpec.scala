package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** V1 of the evolution probe's state: a per-key running sum. */
case class EvoStateV1(sum: Long)

/** V2 adds a field. It is `Option[Long]` deliberately: Avro value-state
  * evolution fills ADDED fields from their schema default, and only a
  * nullable field carries one (a required bigint has no default, so adding
  * it would be an invalid evolution even under Avro).
  */
case class EvoStateV2(sum: Long, n: Option[Long])

case class EvoIn(k: Long, v: Long)
case class EvoOut(k: Long, sum: Long, n: Long)

/** Destructive evolutions of the same "evo" state var: V2 minus a field
  * (the remove case) and V1 with `sum` RETYPED long -> double.
  */
case class EvoStateRetyped(sum: Double)

/** MapState value struct, v1/v2: the map VALUE gains a nullable field —
  * st07's `UserStatsProcessor` shape (per-key payload in a MapState, not
  * one opaque blob), evolved the way a real pipeline evolves it.
  */
case class MapValV1(count: Long)
case class MapValV2(count: Long, extra: Option[Long])

/** The probe pair: same key/row/output types, state struct differs. */
class EvoProcV1 extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var st: ValueState[EvoStateV1] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV1](
      "evo", Encoders.product[EvoStateV1], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      timerValues: TimerValues): Iterator[EvoOut] = {
    var s = if (st.exists()) st.get() else EvoStateV1(0L)
    rows.foreach(r => s = EvoStateV1(s.sum + r.v))
    st.update(s)
    Iterator.single(EvoOut(key, s.sum, -1L))
  }
}

class EvoProcV2 extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var st: ValueState[EvoStateV2] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV2](
      "evo", Encoders.product[EvoStateV2], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      timerValues: TimerValues): Iterator[EvoOut] = {
    var s = if (st.exists()) st.get() else EvoStateV2(0L, Some(0L))
    rows.foreach(r => s = EvoStateV2(s.sum + r.v,
      Some(s.n.getOrElse(0L) + 1L)))
    st.update(s)
    Iterator.single(EvoOut(key, s.sum, s.n.getOrElse(-1L)))
  }
}

/** A processor whose V1 state has `sum` retyped to double — the
  * type-changed destructive case. Same state var name ("evo"), same
  * key/row/output types, so ONLY the struct field's type differs.
  */
class EvoProcRetyped extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var st: ValueState[EvoStateRetyped] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EvoStateRetyped](
      "evo", Encoders.product[EvoStateRetyped], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      timerValues: TimerValues): Iterator[EvoOut] = {
    var s = if (st.exists()) st.get() else EvoStateRetyped(0.0)
    rows.foreach(r => s = EvoStateRetyped(s.sum + r.v))
    st.update(s)
    Iterator.single(EvoOut(key, s.sum.toLong, -2L))
  }
}

/** st07's MapState shape, v1: per-map-key counts; output = total count. */
class MapEvoProcV1 extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var m: org.apache.spark.sql.streaming.MapState[String, MapValV1] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    m = getHandle.getMapState[String, MapValV1](
      "m", Encoders.STRING, Encoders.product[MapValV1], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      timerValues: TimerValues): Iterator[EvoOut] = {
    rows.foreach { r =>
      val mk = "t" + (r.v % 3)
      val cur = if (m.containsKey(mk)) m.getValue(mk) else MapValV1(0L)
      m.updateValue(mk, MapValV1(cur.count + 1))
    }
    var total = 0L
    val it = m.values()
    while (it.hasNext) total += it.next().count
    Iterator.single(EvoOut(key, total, -1L))
  }
}

/** v2: the map value gained a nullable field (running sum of v). */
class MapEvoProcV2 extends StatefulProcessor[Long, EvoIn, EvoOut] {
  @transient private var m: org.apache.spark.sql.streaming.MapState[String, MapValV2] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    m = getHandle.getMapState[String, MapValV2](
      "m", Encoders.STRING, Encoders.product[MapValV2], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvoIn],
      timerValues: TimerValues): Iterator[EvoOut] = {
    rows.foreach { r =>
      val mk = "t" + (r.v % 3)
      val cur = if (m.containsKey(mk)) m.getValue(mk) else MapValV2(0L, Some(0L))
      m.updateValue(mk, MapValV2(cur.count + 1, Some(cur.extra.getOrElse(0L) + r.v)))
    }
    var total = 0L
    var extra = 0L
    val it = m.values()
    while (it.hasNext) { val v = it.next(); total += v.count; extra += v.extra.getOrElse(0L) }
    Iterator.single(EvoOut(key, total, extra))
  }
}

/** Pins the PRODUCTION UPGRADE PATH for the `transformWithState` operators
  * (st17 `TokenPackProcessor`, st19 `FunnelAttributionProcessor`): what
  * happens when a query restarts from an existing checkpoint after the
  * state struct gained a field (round-16 verdict ask #2), plus the
  * funnel processor's now-ENFORCED cross-batch ordering contract
  * (round-16 advice).
  *
  * The evolution contract this pins (and BENCH_NOTES records), across
  * ValueState AND MapState (st07's shape), additive AND destructive:
  *  - default encoding (`unsaferow`): ANY struct change — ValueState or
  *    MapState value — REFUSES loudly with a state-schema-compatibility
  *    error; never silent corruption;
  *  - `spark.sql.streaming.stateStore.encodingFormat=avro` set from the
  *    FIRST run: add-nullable-field migrates (existing rows surface the
  *    default), removed-field migrates (the dropped data is discarded —
  *    re-adding later reads defaults, not history), long->double widening
  *    migrates (legal Avro promotion), double->long NARROWING refuses
  *    loudly (STATE_STORE_INVALID_VALUE_SCHEMA_EVOLUTION).
  * So: ship stateful processors under Avro encoding if zero-downtime
  * state upgrades are required; under the default encoding an upgrade is
  * a new checkpoint (replay or state rebuild); never narrow a field in
  * place — add the new field, backfill, then remove.
  */
class StateEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val inSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  /** Run one micro-batch (one new source file) through `proc` against
    * `ckpt`, collecting the processor output. RocksDB provider scoped
    * per-call (transformWithState requires it).
    */
  private def runBatch(srcDir: java.nio.file.Path, ckpt: String,
      file: String, rows: Seq[(Long, Long)],
      proc: StatefulProcessor[Long, EvoIn, EvoOut],
      encoding: String): Seq[(Long, Long, Long)] = {
    rows.toDF("k", "v").coalesce(1)
      .write.parquet(srcDir.resolve(file).toString)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevEnc = spark.conf.getOption("spark.sql.streaming.stateStore.encodingFormat")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", encoding)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    try {
      val q = spark.readStream.schema(inSchema).parquet(srcDir.toString + "/*")
        .as[EvoIn].groupByKey(_.k)
        .transformWithState(proc, TimeMode.None(), OutputMode.Update(),
          Encoders.product[EvoOut])
        .toDF("k", "sum", "n")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          got ++= b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      prevEnc.fold(spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat"))(
        spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", _))
    }
    got.toSeq
  }

  test("state evolution: default unsaferow encoding REFUSES a restart with an evolved struct") {
    val dir = tmpDir("evo_unsafe")
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = dir.resolve("ckpt").toString
    val b1 = runBatch(src, ckpt, "f1", Seq((1L, 10L), (2L, 5L)),
      new EvoProcV1, "unsaferow")
    assert(b1.toSet == Set((1L, 10L, -1L), (2L, 5L, -1L)), b1)
    // upgrade: same checkpoint, state struct gained a field
    val ex = intercept[Exception] {
      runBatch(src, ckpt, "f2", Seq((1L, 1L)), new EvoProcV2, "unsaferow")
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(chain.toLowerCase.matches("(?s).*schema.*(incompatible|not compatible|evolution).*"),
      s"expected a loud state-schema refusal, got:\n$chain")
  }

  test("state evolution: avro encoding migrates existing state (added field -> default)") {
    val dir = tmpDir("evo_avro")
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = dir.resolve("ckpt").toString
    val b1 = runBatch(src, ckpt, "f1", Seq((1L, 10L), (2L, 5L)),
      new EvoProcV1, "avro")
    assert(b1.toSet == Set((1L, 10L, -1L), (2L, 5L, -1L)), b1)
    // same checkpoint, evolved struct: key 1's carried sum must survive,
    // its added field reads as the Avro default (None -> getOrElse(0)+1)
    val b2 = runBatch(src, ckpt, "f2", Seq((1L, 1L)), new EvoProcV2, "avro")
    assert(b2 == Seq((1L, 11L, 1L)),
      s"avro evolution must carry v1 state into the v2 struct: $b2")
    // and the evolved query keeps running: a third batch accumulates
    val b3 = runBatch(src, ckpt, "f3", Seq((1L, 2L), (2L, 3L)), new EvoProcV2, "avro")
    assert(b3.toSet == Set((1L, 13L, 2L), (2L, 8L, 1L)), b3)
  }

  test("state evolution at volume: 50k carried states all migrate across the evolved restart") {
    // the soak-shaped form of the avro contract: evolution must hold for
    // EVERY existing state row, not just a toy key — a per-row migration
    // bug (bad default fill, torn value decode) surfaces as a wrong sum
    // or a lost key at volume, not on two keys
    val n = 50000L
    val dir = tmpDir("evo_volume")
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = dir.resolve("ckpt").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevEnc = spark.conf.getOption("spark.sql.streaming.stateStore.encodingFormat")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
    def run(proc: org.apache.spark.sql.streaming.StatefulProcessor[Long, EvoIn, EvoOut],
        file: String, rows: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      rows.write.parquet(src.resolve(file).toString)
      var agg = (0L, 0L, 0L) // rows, sum(sum), sum(n where n >= 0)
      val q = spark.readStream.schema(inSchema).parquet(src.toString + "/*")
        .as[EvoIn].groupByKey(_.k)
        .transformWithState(proc, org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          Encoders.product[EvoOut])
        .toDF("k", "sum", "n")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val r = b.agg(count(lit(1)), sum("sum"), sum(when(col("n") >= 0, col("n")))).head()
          agg = (agg._1 + r.getLong(0), agg._2 + (if (r.isNullAt(1)) 0L else r.getLong(1)),
            agg._3 + (if (r.isNullAt(2)) 0L else r.getLong(2)))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      agg
    }
    try {
      // batch 1 seeds 50k distinct states under V1
      val b1 = run(new EvoProcV1, "f1",
        spark.range(n).select(col("id").as("k"),
          (col("id") % 1000 + 1).as("v")))
      assert(b1._1 == n, s"v1 run emitted ${b1._1} of $n keys")
      // ...and the evolved restart touches EVERY key again: each carried
      // sum must be (id % 1000) + 1 + 2, and each added field reads its
      // default then counts exactly this batch's row
      val b2 = run(new EvoProcV2, "f2",
        spark.range(n).select(col("id").as("k"), lit(2L).as("v")))
      val expectedSum = (0L until n).map(_ % 1000).sum + n * 3L
      assert(b2._1 == n, s"evolved run emitted ${b2._1} of $n keys")
      assert(b2._2 == expectedSum,
        s"carried sums lost in migration: ${b2._2} != $expectedSum")
      assert(b2._3 == n, s"added-field defaults wrong: ${b2._3} != $n")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      prevEnc.fold(spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat"))(
        spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", _))
    }
  }

  /** Collapse a run to Right(output) or Left(full cause chain). */
  private def outcome(f: => Seq[(Long, Long, Long)]): Either[String, Seq[(Long, Long, Long)]] =
    try Right(f) catch {
      case e: Exception =>
        Left(Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.toString).mkString("\n"))
    }

  test("state evolution: MapState value struct gains a field — avro migrates, unsaferow refuses") {
    // st07's UserStatsProcessor shape (per-key payload in MapState):
    // carried map entries must surface the added field as its default
    val dir = tmpDir("evo_map_avro")
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = dir.resolve("ckpt").toString
    val b1 = runBatch(src, ckpt, "f1", Seq((1L, 0L), (1L, 1L), (2L, 2L)),
      new MapEvoProcV1, "avro")
    assert(b1.toSet == Set((1L, 2L, -1L), (2L, 1L, -1L)), b1)
    // key 1 carried two map entries (t0, t1); the restart's row lands in
    // t1 -> total 3, and extra counts ONLY the new row's v (defaults 0)
    val b2 = runBatch(src, ckpt, "f2", Seq((1L, 4L)), new MapEvoProcV2, "avro")
    assert(b2 == Seq((1L, 3L, 4L)),
      s"avro MapState evolution must carry v1 map entries into v2: $b2")
    // ...and under the default encoding the same MapState evolution is a
    // LOUD refusal, exactly like the ValueState case
    val dirU = tmpDir("evo_map_unsafe")
    val srcU = dirU.resolve("src"); java.nio.file.Files.createDirectories(srcU)
    val ckptU = dirU.resolve("ckpt").toString
    runBatch(srcU, ckptU, "f1", Seq((1L, 0L)), new MapEvoProcV1, "unsaferow")
    val refusal = outcome(runBatch(srcU, ckptU, "f2", Seq((1L, 4L)),
      new MapEvoProcV2, "unsaferow"))
    assert(refusal.isLeft &&
        refusal.left.exists(_.contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE")),
      s"expected the unsaferow schema refusal, got: $refusal")
  }

  test("state evolution: destructive cases — avro migrates remove/widen, REFUSES narrowing") {
    // removed field (V2 seeds, V1 restarts): Avro reads with a subset
    // reader schema — the dropped field's data is discarded, the carried
    // sum survives. A remove is therefore NOT protected: re-adding the
    // field later reads defaults, not history (document, don't assume).
    val dirR = tmpDir("evo_remove_avro")
    val srcR = dirR.resolve("src"); java.nio.file.Files.createDirectories(srcR)
    val ckptR = dirR.resolve("ckpt").toString
    runBatch(srcR, ckptR, "f1", Seq((1L, 10L)), new EvoProcV2, "avro")
    val rRemove = runBatch(srcR, ckptR, "f2", Seq((1L, 1L)), new EvoProcV1, "avro")
    assert(rRemove == Seq((1L, 11L, -1L)),
      s"avro removed-field restart must carry the surviving fields: $rRemove")
    // widened type long -> double: a legal Avro reader promotion — the
    // carried long sum surfaces as its double value
    val dirW = tmpDir("evo_widen_avro")
    val srcW = dirW.resolve("src"); java.nio.file.Files.createDirectories(srcW)
    val ckptW = dirW.resolve("ckpt").toString
    runBatch(srcW, ckptW, "f1", Seq((1L, 10L)), new EvoProcV1, "avro")
    val rWiden = runBatch(srcW, ckptW, "f2", Seq((1L, 1L)), new EvoProcRetyped, "avro")
    assert(rWiden == Seq((1L, 11L, -2L)),
      s"avro long->double widening must carry the value: $rWiden")
    // NARROWED type double -> long: not a legal Avro promotion — the
    // restart REFUSES loudly instead of truncating values
    val dirN = tmpDir("evo_narrow_avro")
    val srcN = dirN.resolve("src"); java.nio.file.Files.createDirectories(srcN)
    val ckptN = dirN.resolve("ckpt").toString
    runBatch(srcN, ckptN, "f1", Seq((1L, 10L)), new EvoProcRetyped, "avro")
    val refusal = outcome(runBatch(srcN, ckptN, "f2", Seq((1L, 1L)),
      new EvoProcV1, "avro"))
    assert(refusal.isLeft &&
        refusal.left.exists(_.contains("STATE_STORE_INVALID_VALUE_SCHEMA_EVOLUTION")),
      s"expected the avro narrowing refusal, got: $refusal")
  }

  test("funnel processor: out-of-order per-user delivery fails loudly (contract enforced)") {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts_us", LongType), StructField("event_type", StringType)))
    def mkDirs(tag: String): (java.nio.file.Path, String) = {
      val dir = tmpDir(tag)
      val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
      (src, dir.resolve("ckpt").toString)
    }
    def run(src: java.nio.file.Path, ckpt: String,
        file: String, rows: Seq[(Long, Long, Long, String)]): Seq[(Long, Long, Boolean)] = {
      rows.toDF("user_id", "event_id", "ts_us", "event_type").coalesce(1)
        .write.parquet(src.resolve(file).toString)
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
      try {
        val q = spark.readStream.schema(schema).parquet(src.toString + "/*")
          .as[graft.streaming.FunnelIn].groupByKey(_.user_id)
          .transformWithState(new graft.streaming.FunnelAttributionProcessor(),
            TimeMode.None(), OutputMode.Update(),
            Encoders.product[graft.streaming.FunnelOut])
          .toDF("user_id", "event_id", "converted")
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, _: Long) =>
            got ++= b.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getBoolean(2)))
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally prev.fold(
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      got.toSeq
    }
    // batch 1 advances user 7 to ts 2500; batch 2 delivers ts 1000 — a
    // violation of the per-user non-decreasing contract that used to be
    // silently mis-attributed and now fails the batch
    val (srcA, ckptA) = mkDirs("funnel_order_bad")
    run(srcA, ckptA, "f1", Seq((7L, 1L, 2000L, "view"), (7L, 2L, 2500L, "click")))
    val ex = intercept[Exception] {
      run(srcA, ckptA, "f2", Seq((7L, 3L, 1000L, "purchase")))
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(chain.contains("non-decreasing (ts, event_id) order"),
      s"expected the ordering-contract refusal, got:\n$chain")
    // equal-instant redelivery of the boundary event stays tolerated (a
    // FRESH checkpoint: the poisoned batch above stays pending in srcA's
    // offset log and would be retried before any new file)
    val (srcB, ckptB) = mkDirs("funnel_order_ok")
    run(srcB, ckptB, "f1", Seq((7L, 1L, 2000L, "view"), (7L, 2L, 2500L, "click")))
    run(srcB, ckptB, "f2", Seq((7L, 2L, 2500L, "click"), (7L, 4L, 2600L, "purchase")))
    // ...and tolerated means SKIPPED, not reprocessed (round-17 advice): a
    // redelivered boundary PURCHASE must not emit a duplicate FunnelOut
    // row — views/clicks are idempotent state writes, purchases are not
    val (srcC, ckptC) = mkDirs("funnel_redeliver_purchase")
    val b1 = run(srcC, ckptC, "f1", Seq(
      (7L, 1L, 2000L, "view"), (7L, 2L, 2500L, "click"),
      (7L, 3L, 2600L, "purchase")))
    assert(b1 == Seq((7L, 3L, true)), s"batch 1 emitted $b1")
    val b2 = run(srcC, ckptC, "f2", Seq(
      (7L, 3L, 2600L, "purchase"), // at-least-once redelivery of the boundary
      (7L, 5L, 2700L, "purchase")))
    assert(b2 == Seq((7L, 5L, true)),
      s"redelivered boundary purchase must be skipped, not re-emitted: $b2")
  }
}

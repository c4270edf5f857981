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

/** Pins the PRODUCTION UPGRADE PATH for the `transformWithState` operators
  * (st17 `TokenPackProcessor`, st19 `FunnelAttributionProcessor`): what
  * happens when a query restarts from an existing checkpoint after the
  * state struct gained a field (round-16 verdict ask #2), plus the
  * funnel processor's now-ENFORCED cross-batch ordering contract
  * (round-16 advice).
  *
  * The evolution contract this pins (and BENCH_NOTES records):
  *  - default encoding (`unsaferow`): the restart REFUSES loudly with a
  *    state-schema-compatibility error — never silent corruption;
  *  - `spark.sql.streaming.stateStore.encodingFormat=avro` set from the
  *    FIRST run: the restart with the evolved struct SUCCEEDS, existing
  *    state rows surface the added field as its default (None).
  * So: ship stateful processors under Avro encoding if zero-downtime
  * state upgrades are required; under the default encoding an upgrade is
  * a new checkpoint (replay or state rebuild).
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
        file: String, rows: Seq[(Long, Long, Long, String)]): Unit = {
      rows.toDF("user_id", "event_id", "ts_us", "event_type").coalesce(1)
        .write.parquet(src.resolve(file).toString)
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val q = spark.readStream.schema(schema).parquet(src.toString + "/*")
          .as[graft.streaming.FunnelIn].groupByKey(_.user_id)
          .transformWithState(new graft.streaming.FunnelAttributionProcessor(),
            TimeMode.None(), OutputMode.Update(),
            Encoders.product[graft.streaming.FunnelOut])
          .toDF("user_id", "event_id", "converted")
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch((b: DataFrame, _: Long) => { b.count(); () })
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally prev.fold(
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
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
  }
}

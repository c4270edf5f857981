package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary-state streaming via Spark 4's `transformWithState` — the
  * production successor to `mapGroupsWithState` (st02): typed state
  * variables (ValueState + MapState here) on the RocksDB state store, with
  * per-variable TTL and timer support. The reference has no analog (its
  * "state" is the resume ledger, `/root/reference/src/state.rs:10-169`);
  * this is the operator a 100 TB streaming curation pipeline keys on —
  * MapState keeps the per-key payload (here: seen event types) OUT of a
  * single opaque blob, so one update touches one store key instead of
  * rewriting the whole value.
  *
  * Input rows: (user_id, value_micros, event_type). Output per batch and
  * key: (user_id, n_events, total_micros, n_types) — the running
  * aggregates, whose FINAL emission must equal the batch GROUP BY the
  * DuckDB oracle computes. Sums travel as exact micro-unit longs (the
  * plan pre-scales value via DECIMAL(18,6)), so no float addition-order
  * divergence is possible.
  */
class UserStatsProcessor
    extends StatefulProcessor[Long, (Long, Long, String), (Long, Long, Long, Long)] {

  @transient private var agg: ValueState[(Long, Long)] = _ // (n_events, total_micros)
  @transient private var seenTypes: MapState[String, Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState[(Long, Long)](
      "agg", Encoders.product[(Long, Long)], TTLConfig.NONE)
    seenTypes = getHandle.getMapState[String, Boolean](
      "seenTypes", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, micros) = if (agg.exists()) agg.get() else (0L, 0L)
    rows.foreach { case (_, m, eventType) =>
      n += 1
      micros += m
      // null types don't enter the distinct set — SQL COUNT(DISTINCT)
      // skips nulls, and MapState would refuse a null key anyway
      if (eventType != null && !seenTypes.containsKey(eventType))
        seenTypes.updateValue(eventType, true)
    }
    agg.update((n, micros))
    var nTypes = 0L
    val it = seenTypes.keys()
    while (it.hasNext) { it.next(); nTypes += 1 }
    Iterator.single((key, n, micros, nTypes))
  }
}

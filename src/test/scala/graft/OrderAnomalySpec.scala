package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.OrderAnomalyDetector
import graft.streaming.OrderAnomalyDetector.{ConsecutivePair, UserEvent}

/** Stage-3 anomaly CEP: large orders, frequent ordering, consecutive
  * same-user orders (batch + streaming state). */
class OrderAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("large and frequent alerts share the normalized schema") {
    val flat = Seq(
      ("u1@x", BigDecimal(500.50), "2024-01-01 10:00:05"),
      ("u1@x", BigDecimal(10.00), "2024-01-01 10:00:20"),
      ("u1@x", BigDecimal(20.00), "2024-01-01 10:00:40"),
      ("u2@x", BigDecimal(30.00), "2024-01-01 10:01:00"))
      .toDF("customerEmailId", "chargeAmount", "orderDate_formatted")
      .withColumn("orderDate_formatted",
        org.apache.spark.sql.functions.to_timestamp($"orderDate_formatted"))
    val large = OrderAnomalyDetector.largeOrders(flat, 400.0).collect()
    assert(large.map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSeq ==
      Seq(("LARGE", "u1@x", 500.5)))
    val freq = OrderAnomalyDetector.frequentOrders(flat, maxPerMinute = 2).collect()
    assert(freq.map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSeq ==
      Seq(("FREQUENT", "u1@x", 3.0))) // 3 orders in minute 10:00
  }

  test("batch consecutive pairs respect the gap and user boundary") {
    val ev = Seq(
      (1L, 10L, t(0)), (1L, 11L, t(100)), (1L, 12L, t(600)), // 11 within 300s of 10; 12 not
      (2L, 20L, t(90))) // different user, no pair
      .toDF("user_id", "event_id", "ts")
    val out = OrderAnomalyDetector.consecutivePairs(ev, 300).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 10L, 11L, 100L)))
  }

  test("frequent-orders is an append-mode streaming alert under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    final case class Order(customerEmailId: String, chargeAmount: Double,
                           orderDate_formatted: Timestamp)
    // minute-aligned base so all three u1 orders land in one window
    def ta(sec: Int) = new Timestamp(1700000040000L + sec * 1000L)
    val mem = MemoryStream[(String, Double, Timestamp)]
    val flat = mem.toDS()
      .toDF("customerEmailId", "chargeAmount", "orderDate_formatted")
      .withWatermark("orderDate_formatted", "0 seconds")
    val q = OrderAnomalyDetector.frequentOrders(flat, maxPerMinute = 2)
      .writeStream.format("memory").queryName("freq_out")
      .outputMode("append").start()
    try {
      // 3 orders from u1 inside minute 0; u2 only 1
      mem.addData(("u1@x", 1.0, ta(5)), ("u1@x", 2.0, ta(20)),
        ("u1@x", 3.0, ta(40)), ("u2@x", 4.0, ta(50)))
      q.processAllAvailable()
      // window [0,60) not closed yet — append emits nothing
      assert(spark.table("freq_out").count() == 0)
      // advance the watermark past the minute boundary
      mem.addData(("u3@x", 5.0, ta(130)))
      q.processAllAvailable()
      val rows = spark.table("freq_out")
        .select("kind", "user_or_email", "metric").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set(("FREQUENT", "u1@x", 3.0)))
    } finally q.stop()
  }

  test("streaming consecutive pairs keep one last-event per user across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = OrderAnomalyDetector.consecutivePairsStream(mem.toDS(), gapSeconds = 300)
      .writeStream.format("memory").queryName("ccp_out")
      .outputMode("append").start()
    try {
      mem.addData(UserEvent(1L, 10L, t(0)), UserEvent(2L, 20L, t(10)))
      q.processAllAvailable()
      assert(spark.table("ccp_out").count() == 0)
      // next batch: user 1 continues within gap, user 2 after gap
      mem.addData(UserEvent(1L, 11L, t(120)), UserEvent(2L, 21L, t(400)))
      q.processAllAvailable()
      val rows = spark.table("ccp_out").as[ConsecutivePair].collect().toSet
      assert(rows == Set(ConsecutivePair(1L, 10L, 11L, 120L)))
      // state updated: 21 pairs with a later event even though 20-21 didn't
      mem.addData(UserEvent(2L, 22L, t(450)))
      q.processAllAvailable()
      val rows2 = spark.table("ccp_out").as[ConsecutivePair].collect().toSet
      assert(rows2 == Set(ConsecutivePair(1L, 10L, 11L, 120L),
        ConsecutivePair(2L, 21L, 22L, 50L)))
    } finally q.stop()
  }
}

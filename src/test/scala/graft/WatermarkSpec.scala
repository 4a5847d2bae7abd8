package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** W6/W10: watermark semantics — windowed aggregates only finalize
  * when the watermark passes the window end, and data later than the
  * watermark delay is dropped from finalized windows. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked tumbling aggregate drops late rows and finalizes windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "v")
    val agg = StreamOps.tumblingAgg(
      StreamOps.withWatermark(events, "ts", "10 seconds"),
      "ts", "1 minute", keys = Nil, aggs = Seq(count(lit(1)).as("n")))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two events in window [00:00, 00:01)
    mem.addData((t("2024-01-01 00:00:05"), 1L), (t("2024-01-01 00:00:20"), 2L))
    q.processAllAvailable()
    // batch 2: event far ahead pushes the watermark past 00:01 + 10s
    mem.addData((t("2024-01-01 00:05:00"), 3L))
    q.processAllAvailable()
    // batch 3: a LATE event for the already-finalized first window -> dropped
    mem.addData((t("2024-01-01 00:00:59"), 4L))
    q.processAllAvailable()
    // batch 4: advance watermark far enough to finalize the 00:05 window
    mem.addData((t("2024-01-01 00:10:00"), 5L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_out")
      .select(date_format(col("ws"), "HH:mm").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(rows("00:00") == 2, s"late row must not be counted: $rows")
    assert(rows("00:05") == 1)
  }
}

class JsonFilesSpec extends SparkSpec {

  test("fromJsonFiles reads whole-file order dumps and unions multi-day files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_days")
    val d1 = dir.resolve("day1.json")
    val d2 = dir.resolve("day2.json")
    // each daily dump = one JSON array of orders (reference data shape)
    java.nio.file.Files.writeString(d1, OrderFixtures.listMessage) // 2 orders / 2 lines
    java.nio.file.Files.writeString(d2, s"[${OrderFixtures.twoLineOrder}]") // 1 order / 2 lines
    val flat = graft.pipelines.WalmartOrderPipeline.fromJsonFiles(
      spark, Seq(d1.toString, d2.toString))
    assert(flat.count() == 4)
    assert(flat.select("source_file").distinct().collect()(0).getString(0) == "file")
    assert(flat.select("purchaseOrderId").distinct().count() == 3)
  }
}

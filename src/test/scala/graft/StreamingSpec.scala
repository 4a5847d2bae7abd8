package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipelines.WalmartOrderPipeline
import graft.sinks.JdbcUpsertSink
import graft.streaming.{CountWindows, StreamOps}

class CountWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling count window fires every N elements per key") {
    val ds = Seq(("a", 1), ("a", 2), ("b", 10), ("a", 3), ("a", 4), ("b", 20), ("a", 5))
      .toDS()
    val out = CountWindows.tumbling[String, (String, Int), (String, Int)](
      ds, _._1, size = 2, (k, vs) => (k, vs.map(_._2).sum))
      .collect().toSet
    // a: (1,2)->3, (3,4)->7; 5 buffered. b: (10,20)->30
    assert(out == Set(("a", 3), ("a", 7), ("b", 30)))
  }

  test("sliding count window fires every slide elements, partials included (Flink parity)") {
    val ds = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5)).toDS()
    val out = CountWindows.sliding[String, (String, Int), (String, Int)](
      ds, _._1, size = 3, slide = 1, (k, vs) => (k, vs.map(_._2).sum))
      .collect().toSet
    // CountTrigger(1)+CountEvictor(3): (1)=1, (1,2)=3, (1,2,3)=6, (2,3,4)=9, (3,4,5)=12
    assert(out == Set(("a", 1), ("a", 3), ("a", 6), ("a", 9), ("a", 12)))
  }

  test("sliding count window with slide > 1 fires at every slide boundary") {
    val ds = Seq.tabulate(6)(i => ("a", i + 1)).toDS() // 1..6
    val out = CountWindows.sliding[String, (String, Int), (String, Int)](
      ds, _._1, size = 4, slide = 2, (k, vs) => (k, vs.map(_._2).sum))
      .collect().toSet
    // fires at element 2, 4, 6: (1,2)=3, (1,2,3,4)=10, (3,4,5,6)=18
    assert(out == Set(("a", 3), ("a", 10), ("a", 18)))
  }

  test("tumbling count window works over a structured stream with state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val out = CountWindows.tumbling[String, (String, Int), (String, Int)](
      mem.toDS(), _._1, size = 2, (k, vs) => (k, vs.map(_._2).sum))
    val q = out.writeStream.format("memory").queryName("cw_out")
      .outputMode("append").start()
    mem.addData(("a", 1), ("a", 2), ("a", 3))
    q.processAllAvailable()
    // 3 is buffered in state; next batch completes the second window
    mem.addData(("a", 4))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cw_out").as[(String, Int)].collect().toSet
    assert(rows == Set(("a", 3), ("a", 7))) // windows (1,2) and (3,4)
  }
}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("window join pairs records in the same tumbling window only") {
    val l = Seq(("k1", "2024-01-01 00:00:10"), ("k1", "2024-01-01 00:02:10"))
      .toDF("k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val r = Seq(("k1", "2024-01-01 00:00:50"), ("k1", "2024-01-01 00:03:10"))
      .toDF("k2", "ts2").withColumn("ts2", to_timestamp(col("ts2")))
    val joined = StreamOps.windowJoin(l, r, col("k"), col("k2"),
      col("ts"), col("ts2"), "60 seconds")
    // only (00:00:10, 00:00:50) share the [00:00, 00:01) window
    assert(joined.count() == 1)
  }

  test("lookup join enriches stream rows from a broadcast dim") {
    val stream = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("uid", "amount")
    val dim = Seq((1, "gold"), (2, "silver")).toDF("uid", "tier")
    val out = StreamOps.lookupJoin(stream, dim, stream("uid") === dim("uid"))
    assert(out.count() == 3) // left join keeps unmatched
    assert(out.where(col("tier").isNull).count() == 1)
  }

  private val aggSelects = Seq("COUNT(*) AS event_count",
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value")

  test("generated HOP SQL reproduces the q09 sliding-window results") {
    Tables.load(spark, sf, "events").createOrReplaceTempView("events_hop")
    val sql = StreamOps.hopSql("events_hop", "ts", "2 hours", "1 hour",
      keys = Nil, aggSelects = aggSelects)
    val got = spark.sql(sql)
      .select("window_start", "window_end", "event_count", "total_value")
      .orderBy("window_start").collect().toSeq
    val want = graft.operators.WindowOps.sliding(spark, sf)
      .select("window_start", "window_end", "event_count", "total_value")
      .orderBy("window_start").collect().toSeq
    assert(got == want)
  }

  test("generated SESSION SQL reproduces the q10 session-window results") {
    Tables.load(spark, sf, "events").createOrReplaceTempView("events_sess")
    val sql = StreamOps.sessionSql("events_sess", "ts", "30 minutes",
      keys = Seq("user_id"), aggSelects = aggSelects)
    val got = spark.sql(sql)
      .selectExpr("window_start AS session_start", "window_end AS session_end",
        "user_id", "event_count", "total_value")
      .orderBy("user_id", "session_start").collect().toSeq
    val want = graft.operators.WindowOps.session(spark, sf)
      .select("session_start", "session_end", "user_id", "event_count", "total_value")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(got == want)
  }

  test("streaming stream-stream window join: watermarked inputs join within windows and state is cleaned") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String)]
    val rMem = MemoryStream[(String, String)]
    val l = lMem.toDF().toDF("k", "lts")
      .withColumn("lts", to_timestamp(col("lts"))).withWatermark("lts", "1 minute")
    val r = rMem.toDF().toDF("k2", "rts")
      .withColumn("rts", to_timestamp(col("rts"))).withWatermark("rts", "1 minute")
    val joined = StreamOps.windowJoin(l, r, col("k"), col("k2"),
      col("lts"), col("rts"), "60 seconds")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // window [00:00, 00:01): k1 matches; k2 has no right-side partner
      lMem.addData(("k1", "2024-01-01 00:00:10"), ("k2", "2024-01-01 00:00:20"))
      rMem.addData(("k1", "2024-01-01 00:00:50"))
      q.processAllAvailable()
      assert(spark.table("ssj_out").count() == 1)
      val peak = q.lastProgress.stateOperators(0).numRowsTotal
      assert(peak >= 3, s"expected all 3 first-window rows buffered, got $peak")
      // different window -> no join even with equal keys; advancing the
      // watermark past [00:00, 00:01) + delay must evict its state
      lMem.addData(("k1", "2024-01-01 00:05:10"))
      rMem.addData(("k1", "2024-01-01 00:06:20"))
      q.processAllAvailable()
      assert(spark.table("ssj_out").count() == 1)
      val after = q.lastProgress.stateOperators(0).numRowsTotal
      assert(after < peak,
        s"watermark advance must evict join state (peak=$peak, after=$after)")
      // the still-open 00:05/00:06 windows remain buffered
      assert(after >= 2, s"open-window rows must stay buffered, got $after")
    } finally q.stop()
  }
}

class WalmartPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftpipe;create=true"

  test("end-to-end: memory stream of order JSON -> parse -> jdbc upsert") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE wmt (purchaseOrderId BIGINT NOT NULL, sku VARCHAR(50) NOT NULL,
        | orderLineStatus VARCHAR(50), chargeAmount DECIMAL(10,2),
        | PRIMARY KEY (purchaseOrderId, sku))""".stripMargin)
    conn.close()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val raw = mem.toDF().toDF("value")
    val parsed = WalmartOrderPipeline.parse(raw)
      .select("purchaseOrderId", "sku", "orderLineStatus", "chargeAmount")
    val sink = new JdbcUpsertSink(url, "wmt", JdbcUpsertSink.UpdateInsert(Seq("purchaseOrderId", "sku")),
      batchSize = 10)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    mem.addData(OrderFixtures.twoLineOrder, OrderFixtures.dictLineOrder,
      OrderFixtures.listMessage, OrderFixtures.malformed)
    val q = parsed.writeStream
      .foreachBatch(sink.asForeachBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()

    val c = DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM wmt")
    rs.next()
    assert(rs.getInt(1) == 5) // 2 + 1 + 2 lines, malformed dropped
    c.close()
  }

  test("stage-2 stats queries aggregate the flat table") {
    val flat = WalmartOrderPipeline.parse(
      Seq(OrderFixtures.twoLineOrder, OrderFixtures.listMessage).toDF("value"))
    assert(WalmartOrderPipeline.statsMinute(flat).count() >= 1)
    assert(WalmartOrderPipeline.statsUser(flat)
      .select("user_or_email").distinct().count() >= 1)
    assert(WalmartOrderPipeline.statsItem(flat).count() >= 3)
    assert(WalmartOrderPipeline.statsStatus(flat)
      .agg(sum("cnt")).collect()(0).getLong(0) == 4)
  }
}

class TransformsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Transforms

  test("errorSplit routes failed rows to the error output") {
    val df = Seq("1", "2", "oops", "4").toDF("v")
    val (main, errors) = Transforms.errorSplit(df, col("v").try_cast("int"))
    assert(main.count() == 3)
    assert(errors.count() == 1)
    assert(errors.collect()(0).getAs[String]("v") == "oops")
    assert(errors.columns.contains("error"))
  }

  test("parseJsonMessages keeps raw payload for unparseable values") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("order_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.DoubleType)))
    val df = Seq("""{"order_id":"o1","amount":5.0}""", "garbage").toDF("value")
    val out = Transforms.parseJsonMessages(df, schema)
    assert(out.where(col("order_id") === "o1").count() == 1)
    assert(out.where(col("raw_data").isNotNull).count() == 1)
  }

  test("keyed reduce folds all elements per key (A6)") {
    val ds = Seq(("a", 1), ("a", 5), ("b", 2), ("a", 3)).toDS()
    val out = Transforms.reduceByKey[(String, Int), String](
      ds, _._1, (x, y) => if (x._2 >= y._2) x else y).collect().toSet
    assert(out == Set(("a", ("a", 5)), ("b", ("b", 2))))
    // associative fold: sum variant
    val sums = Transforms.reduceByKey[(String, Int), String](
      ds, _._1, (x, y) => (x._1, x._2 + y._2)).collect().toSet
    assert(sums == Set(("a", ("a", 9)), ("b", ("b", 2))))
  }

  test("dropNulls and validate filter as the reference wrappers do") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("id", "name")
    assert(Transforms.dropNulls(df).count() == 1)
    assert(Transforms.dropNulls(df, Seq("id")).count() == 2)
    assert(Transforms.validate(df, col("id") > 1).count() == 1)
  }
}

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("CountSumAvg matches built-in avg and handles empty") {
    graft.functions.Aggregators.register(spark)
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    df.createOrReplaceTempView("agg_in")
    val got = spark.sql("SELECT k, count_sum_avg(v) AS a FROM agg_in GROUP BY k ORDER BY k")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 1.5), ("b", 5.0)))
    assert(graft.functions.Aggregators.CountSumAvg.finish((0L, 0.0)) == 0.0)
  }
}

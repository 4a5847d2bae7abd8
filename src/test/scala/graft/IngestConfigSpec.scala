package graft

import java.time.LocalDateTime
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.OrderApiIngest
import graft.sources.OrderApiIngest._

class OrderApiIngestSpec extends AnyFunSuite {

  private def mkApi(counts: Map[String, Int] = Map.empty,
                    tokenCounter: AtomicInteger = new AtomicInteger()): Api = Api(
    listUrl = (f, t, nodeType, limit) => s"http://api.test/orders?from=$f&to=$t&type=$nodeType&limit=$limit",
    fetchToken = () => s"tok${tokenCounter.incrementAndGet()}",
    parsePage = body => {
      // body format: "total;id1,id2,..."
      val parts = body.split(";", 2)
      val total = parts(0).toInt
      val orders = parts.lift(1).filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil)
        .map(id => Order(id, s"""{"purchaseOrderId":"$id"}"""))
      (total, orders)
    })

  test("fetches hourly windows and dedups across them") {
    val api = mkApi()
    val transport: Transport = req => {
      // same order 'A' in both hours + one distinct per hour
      if (req.url.contains("from=2025-10-01T00")) HttpResp(200, "2;A,B")
      else HttpResp(200, "2;A,C")
    }
    val out = fetchWindow(transport, api,
      LocalDateTime.parse("2025-10-01T00:00:00"),
      LocalDateTime.parse("2025-10-01T02:00:00"), "SellerFulfilled")
    assert(out.map(_.purchaseOrderId) == Seq("A", "B", "C"))
  }

  test("auto-splits an over-limit hour into 10-minute windows") {
    val calls = scala.collection.mutable.ListBuffer.empty[String]
    val api = mkApi()
    val transport: Transport = req => {
      calls += req.url
      if (req.url.contains("limit=2") && req.url.contains("from=2025-10-01T00:00:00&to=2025-10-01T01:00:00"))
        HttpResp(200, "5;X,Y") // over limit -> caller must split
      else HttpResp(200, s"1;m${calls.size}")
    }
    val out = fetchWindow(transport, api,
      LocalDateTime.parse("2025-10-01T00:00:00"),
      LocalDateTime.parse("2025-10-01T01:00:00"), "WFS", limit = 2)
    // 1 hourly probe + 6 ten-minute windows
    assert(calls.size == 7)
    assert(out.size == 6) // six distinct sub-window orders, X/Y discarded for the split fetch
  }

  test("retries on 429 and refreshes token on 401") {
    val attempts = new AtomicInteger()
    val tokens = new AtomicInteger()
    val api = mkApi(tokenCounter = tokens)
    val transport: Transport = req => {
      attempts.incrementAndGet() match {
        case 1 => HttpResp(429, "")
        case 2 => HttpResp(401, "") // expired -> refresh
        case _ =>
          assert(req.headers("Authorization") == "Bearer tok2") // refreshed token in use
          HttpResp(200, "1;Z")
      }
    }
    val out = fetchWindow(transport, api,
      LocalDateTime.parse("2025-10-01T00:00:00"),
      LocalDateTime.parse("2025-10-01T01:00:00"), "S", pauseMs = 1)
    assert(out.map(_.purchaseOrderId) == Seq("Z"))
    assert(tokens.get() == 2)
  }

  test("gives up after max retries with an informative error") {
    val api = mkApi()
    val transport: Transport = _ => HttpResp(429, "")
    val e = intercept[RuntimeException] {
      fetchWindow(transport, api,
        LocalDateTime.parse("2025-10-01T00:00:00"),
        LocalDateTime.parse("2025-10-01T01:00:00"), "S", maxRetries = 2, pauseMs = 1)
    }
    assert(e.getMessage.contains("429"))
  }

  test("fetchAll fans out over ship node types and dedups") {
    val api = mkApi()
    val transport: Transport = req =>
      if (req.url.contains("type=A")) HttpResp(200, "2;P1,P2")
      else HttpResp(200, "2;P2,P3")
    val out = fetchAll(transport, api,
      LocalDateTime.parse("2025-10-01T00:00:00"),
      LocalDateTime.parse("2025-10-01T01:00:00"), shipNodeTypes = Seq("A", "B"))
    assert(out.map(_.purchaseOrderId) == Seq("P1", "P2", "P3"))
  }
}

class GraftConfigSpec extends AnyFunSuite {

  test("parses flat yaml subset with sections, comments, quotes") {
    val conf = GraftConfig.parse(
      """# top comment
        |app_name: graft
        |kafka:
        |  bootstrap_servers: "localhost:9092"   # trailing comment
        |  topic: 'walmart_order_raw'
        |mysql:
        |  port: 3306
        |""".stripMargin)
    assert(conf("app_name") == "graft")
    assert(conf("kafka.bootstrap_servers") == "localhost:9092")
    assert(conf("kafka.topic") == "walmart_order_raw")
    assert(conf.getInt("mysql.port", 0) == 3306)
    assert(conf.section("kafka") == Map(
      "bootstrap_servers" -> "localhost:9092", "topic" -> "walmart_order_raw"))
  }

  test("merge semantics: later wins, env overlay maps prefix to dotted key") {
    val base = GraftConfig.parse("kafka:\n  topic: t1\n  acks: all\n")
    val over = GraftConfig.parse("kafka:\n  topic: t2\n")
    val merged = base ++ over
    assert(merged("kafka.topic") == "t2" && merged("kafka.acks") == "all")
    val conf = GraftConfig.resolve(env = Map("GRAFT_KAFKA_TOPIC" -> "t3"))
    assert(conf("kafka.topic") == "t3")
  }
}

class PipelineConfigProbe extends org.scalatest.funsuite.AnyFunSuite {
  test("fromConfig surfaces a missing required key by name") {
    val conf = GraftConfig.parse("mysql:\n  url: jdbc:derby:memory:x\n")
    val e = intercept[NoSuchElementException] {
      graft.pipelines.WalmartOrderPipeline.fromConfig(TestSession.spark, conf)
    }
    assert(e.getMessage.contains("kafka.bootstrap_servers"))
  }
}

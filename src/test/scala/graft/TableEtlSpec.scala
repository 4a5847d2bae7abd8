package graft

import java.nio.file.Files

import graft.pipelines.TableEtl
import graft.sinks.JdbcUpsertSink
import graft.sources.FileKafka
import graft.tools.JdbcAdmin

/** §3.2 one-call Table-API ETL lifecycle: FileKafka envelope →
  * SQL transform view → Derby upsert, streaming and batch. */
class TableEtlSpec extends SparkSpec {

  private val transformSql =
    """SELECT
      |  CAST(get_json_object(CAST(value AS STRING), '$.order_id') AS BIGINT) AS order_id,
      |  get_json_object(CAST(value AS STRING), '$.user_id') AS user_id,
      |  CAST(get_json_object(CAST(value AS STRING), '$.amount') AS DECIMAL(10,2)) AS amount
      |FROM order_source
      |WHERE CAST(get_json_object(CAST(value AS STRING), '$.amount') AS DECIMAL(10,2)) > 0
      |""".stripMargin // the reference's documented example: filter amount > 0

  private def orderJson(id: Long, user: String, amount: String): String =
    s"""{"order_id":$id,"user_id":"$user","amount":$amount}"""

  test("streaming lifecycle: filekafka -> transform view -> derby upsert, idempotent replay") {
    val broker = Files.createTempDirectory("graft_etl_broker").toString
    val ckpt = Files.createTempDirectory("graft_etl_ckpt").toString
    val url = "jdbc:derby:memory:graftetl;create=true"
    val admin = new JdbcAdmin(url)
    admin.execute(
      "CREATE TABLE etl_orders (order_id BIGINT NOT NULL PRIMARY KEY, user_id VARCHAR(20), amount DECIMAL(10,2))")

    FileKafka.produceStrings(broker, "orders-raw", 0, Seq(
      orderJson(1, "u1", "30.00"),
      orderJson(2, "u2", "-5.00"), // filtered by the transform
      orderJson(3, "u3", "12.50")))

    val sink = new JdbcUpsertSink(url, "etl_orders",
      JdbcUpsertSink.UpdateInsert(Seq("order_id")), batchSize = 10)
    val p = TableEtl.build(spark,
      FileKafka.stream(spark, broker, "orders-raw"), sink,
      transformSql = Some(transformSql))
    assert(p.cleaned.isStreaming, "transform view over a stream stays streaming")

    val q = p.insertStreaming(ckpt, triggerMs = 100L)
    try {
      q.processAllAvailable()
      assert(admin.countRows("etl_orders") == 2) // negative amount filtered
      // replay the same key with a new amount + one new record: upsert, not dup
      FileKafka.produceStrings(broker, "orders-raw", 0, Seq(
        orderJson(1, "u1", "99.99"),
        orderJson(4, "u4", "7.00")))
      q.processAllAvailable()
      assert(admin.countRows("etl_orders") == 3)
      val amt = admin.query(spark, "SELECT amount FROM etl_orders WHERE order_id = 1")
        .collect()(0).getDecimal(0)
      assert(amt.doubleValue == 99.99)
    } finally q.stop()
  }

  test("batch lifecycle + no-transform passthrough insert") {
    val broker = Files.createTempDirectory("graft_etl_b").toString
    val url = "jdbc:derby:memory:graftetl2;create=true"
    val admin = new JdbcAdmin(url)
    admin.execute(
      "CREATE TABLE etl_b (order_id BIGINT NOT NULL PRIMARY KEY, user_id VARCHAR(20), amount DECIMAL(10,2))")
    FileKafka.produceStrings(broker, "t", 0,
      Seq(orderJson(10, "u", "1.00"), orderJson(11, "v", "2.00")))

    val sink = new JdbcUpsertSink(url, "etl_b",
      JdbcUpsertSink.UpdateInsert(Seq("order_id")), batchSize = 10)
    val p = TableEtl.build(spark,
      FileKafka.batch(spark, broker, "t"), sink, Some(transformSql))
    p.insertBatch()
    assert(admin.countRows("etl_b") == 2)

    // transformSql = None: INSERT INTO sink SELECT * FROM source verbatim
    val p2 = TableEtl.build(spark,
      spark.sql("SELECT order_id + 100 AS order_id, user_id, amount FROM order_cleaned"),
      sink, None, sourceView = "etl_passthrough")
    assert(p2.cleaned eq p2.source)
    p2.insertBatch()
    assert(admin.countRows("etl_b") == 4)
  }
}

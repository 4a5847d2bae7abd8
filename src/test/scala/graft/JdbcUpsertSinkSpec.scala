package graft

import java.sql.DriverManager

import graft.sinks.JdbcUpsertSink
import graft.sinks.JdbcUpsertSink._

class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("REPLACE INTO sql matches the reference sink shape") {
    val sql = buildSql("ods.walmart_order", Seq("purchaseOrderId", "sku", "qty"), Replace)
    assert(sql == "REPLACE INTO ods.walmart_order (purchaseOrderId, sku, qty) VALUES (?, ?, ?)")
  }

  test("ON DUPLICATE KEY UPDATE sql lists every column") {
    val sql = buildSql("t", Seq("a", "b"), OnDuplicate)
    assert(sql == "INSERT INTO t (a, b) VALUES (?, ?) " +
      "ON DUPLICATE KEY UPDATE a = VALUES(a), b = VALUES(b)")
  }

  test("MERGE sql keys on the PK and updates non-keys") {
    val sql = buildSql("t", Seq("id", "v"), Merge(Seq("id")))
    assert(sql.contains("MERGE INTO t t USING"))
    assert(sql.contains("ON t.id = s.id"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET t.v = s.v"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"))
  }

  private val url = "jdbc:derby:memory:graftsink;create=true"

  test("derby integration: append, upsert idempotence, batch flush") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE orders_t (id BIGINT NOT NULL PRIMARY KEY, name VARCHAR(50), amount DOUBLE)")
    conn.close()

    val sink = new JdbcUpsertSink(url, "orders_t", UpdateInsert(Seq("id")), batchSize = 2)
    val df1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
    sink.write(df1)

    def all(): Map[Long, (String, Double)] = {
      val c = DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery("SELECT id, name, amount FROM orders_t")
      val b = scala.collection.mutable.Map[Long, (String, Double)]()
      while (rs.next()) b += rs.getLong(1) -> (rs.getString(2), rs.getDouble(3))
      c.close(); b.toMap
    }
    assert(all() == Map(1L -> ("a", 10.0), 2L -> ("b", 20.0), 3L -> ("c", 30.0)))

    // replay the same batch plus an update — upsert must be idempotent
    val df2 = Seq((1L, "a", 10.0), (2L, "B2", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "amount")
    sink.write(df2)
    sink.write(df2) // second replay: microbatch retry simulation
    assert(all() == Map(1L -> ("a", 10.0), 2L -> ("B2", 99.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("derby integration: nulls and timestamps bind correctly") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE typed_t (id BIGINT NOT NULL PRIMARY KEY, s VARCHAR(10), ts TIMESTAMP, d DECIMAL(10,2))")
    conn.close()
    val sink = new JdbcUpsertSink(url, "typed_t", UpdateInsert(Seq("id")))
    val df = Seq(
      (1L, Some("x"), Some(java.sql.Timestamp.valueOf("2025-10-01 05:00:00")), Some(BigDecimal("12.34"))),
      (2L, None, None, None))
      .toDF("id", "s", "ts", "d")
      .selectExpr("id", "s", "ts", "cast(d as decimal(10,2)) as d")
    sink.write(df)
    val c = DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery("SELECT s, ts, d FROM typed_t WHERE id = 2")
    rs.next()
    assert(rs.getString(1) == null && rs.getTimestamp(2) == null && rs.getBigDecimal(3) == null)
    val rs2 = c.createStatement().executeQuery("SELECT d FROM typed_t WHERE id = 1")
    rs2.next()
    assert(rs2.getBigDecimal(1).doubleValue() == 12.34)
    c.close()
  }
}

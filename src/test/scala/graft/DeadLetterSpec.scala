package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sinks.{JdbcUpsertSink, Sinks}

/** T7 dead-letter routing landed at the sink: good rows to the main
  * JDBC table, bad rows to an error table, in one foreachBatch. */
class DeadLetterSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdlq;create=true"

  test("foreachBatch splits good rows and dead-letters unparseable ones") {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE good_t (id BIGINT NOT NULL PRIMARY KEY, amount DOUBLE)")
    conn.createStatement().execute(
      "CREATE TABLE dlq_t (id BIGINT NOT NULL PRIMARY KEY, raw VARCHAR(200))")
    conn.close()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val parsed = mem.toDF().toDF("id", "payload")
      .withColumn("amount", col("payload").try_cast("double"))

    val goodSink = new JdbcUpsertSink(url, "good_t", JdbcUpsertSink.UpdateInsert(Seq("id")))
    val dlqSink = new JdbcUpsertSink(url, "dlq_t", JdbcUpsertSink.UpdateInsert(Seq("id")))
    val route = Sinks.withDeadLetter(
      df => goodSink.write(df.select("id", "amount")),
      df => dlqSink.write(df.select(col("id"), col("payload").as("raw"))),
      errCond = col("amount").isNull)

    mem.addData((1L, "10.5"), (2L, "not-a-number"), (3L, "7"), (4L, "NaN?no"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dlq").toString
    val q = parsed.writeStream.foreachBatch(route)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val c = DriverManager.getConnection(url)
    val good = c.createStatement().executeQuery("SELECT COUNT(*) FROM good_t")
    good.next()
    val goodCount = good.getInt(1)
    val bad = c.createStatement().executeQuery("SELECT id, raw FROM dlq_t ORDER BY id")
    val badRows = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    while (bad.next()) badRows += bad.getLong(1) -> bad.getString(2)
    c.close()
    assert(goodCount == 2)
    assert(badRows.toList == List(2L -> "not-a-number", 4L -> "NaN?no"))
  }
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Sink builders (SURVEY.md §2.2 K1-K5, K7) — Kafka / file / console
  * writers over writeStream / write. The JDBC upsert path (K6/K9) is
  * [[JdbcUpsertSink]].
  */
object Sinks {

  /** K1/K2: Kafka sink — serializes all columns to a JSON value
    * (to_json(struct(*)), the reference's JSON value serializer,
    * kafka_producer_utils.py:69). Optional key column. */
  def kafkaJson(df: DataFrame, topic: String, bootstrapServers: String,
                keyCol: Option[String] = None,
                checkpointLocation: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] = {
    val valued = keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      case None => df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    }
    val w = valued.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
    checkpointLocation.fold(w)(c => w.option("checkpointLocation", c))
  }

  /** Batch Kafka write. */
  def kafkaJsonBatch(df: DataFrame, topic: String, bootstrapServers: String,
                     keyCol: Option[String] = None): Unit = {
    val valued = keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      case None => df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    }
    valued.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic).save()
  }

  /** K5: file sink (csv/text/json/parquet), streaming. */
  def fileStream(df: DataFrame, path: String, format: String,
                 checkpointLocation: String,
                 triggerMs: Long = 1000): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format(format)
      .option("path", path)
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(triggerMs))

  /** K5 batch variant. */
  def fileBatch(df: DataFrame, path: String, format: String,
                mode: String = "overwrite"): Unit =
    df.write.format(format).mode(mode).save(path)

  /** K7: console/debug sink. */
  def console(df: DataFrame, numRows: Int = 20): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("console").option("numRows", numRows)

  /** Dead-letter routing in foreachBatch: main rows through `writeMain`,
    * error rows (per `errCond`) to `writeErrors` — the T7 side-output
    * pattern landed at the sink (stage1 dead-letter table analogue). */
  def withDeadLetter(writeMain: DataFrame => Unit, writeErrors: DataFrame => Unit,
                     errCond: org.apache.spark.sql.Column)
      : (DataFrame, Long) => Unit = { (df, _) =>
    val cached = df.persist()
    try {
      writeMain(cached.where(!coalesce(errCond, lit(true))))
      writeErrors(cached.where(coalesce(errCond, lit(true))))
    } finally { cached.unpersist(); () }
  }
}

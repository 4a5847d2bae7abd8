package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.JdbcUpsertSink

/** One-call Table-API ETL lifecycle (SURVEY.md §3.2,
  * utils/flink_kafka_to_mysql_utils.py:225-259): the reference
  * assembles source DDL + sink DDL + `CREATE TEMPORARY VIEW` transform
  * + `INSERT INTO` in a single builder. Spark-first equivalent:
  *
  *   - the source DataFrame (Kafka/FileKafka/file/rate, batch or
  *     streaming) registers as the `order_source` temp view,
  *   - the optional `transform_sql` (full SELECT text over that view)
  *     becomes the `order_cleaned` temp view via `spark.sql`,
  *   - the `INSERT INTO order_sink` step is the JDBC upsert sink —
  *     `insertBatch()` for bounded sources, `insertStreaming()`
  *     (foreachBatch + checkpoint, ST5 idempotent replay) for streams.
  *
  * All three names are overridable, matching the reference's fixed
  * view names as defaults.
  */
object TableEtl {

  final case class Pipeline(
      spark: SparkSession,
      source: DataFrame, sourceView: String,
      cleaned: DataFrame, cleanedView: String,
      sink: JdbcUpsertSink) {

    /** `INSERT INTO order_sink SELECT * FROM order_cleaned` — bounded. */
    def insertBatch(): Unit = sink.write(cleaned)

    /** Streaming insert: every micro-batch upserts through the sink;
      * checkpoint + idempotent upsert = effectively exactly-once. */
    def insertStreaming(checkpointDir: String, triggerMs: Long = 1000L): StreamingQuery =
      cleaned.writeStream
        .foreachBatch(sink.asForeachBatch)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.ProcessingTime(triggerMs))
        .start()
  }

  /** Assemble source view + transform view + sink in one call
    * (create_etl_pipeline_table_api parity: transformSql None means
    * `INSERT INTO sink SELECT * FROM source`). */
  def build(spark: SparkSession, source: DataFrame, sink: JdbcUpsertSink,
            transformSql: Option[String] = None,
            sourceView: String = "order_source",
            cleanedView: String = "order_cleaned"): Pipeline = {
    source.createOrReplaceTempView(sourceView)
    val cleaned = transformSql.fold(source) { sql =>
      val df = spark.sql(sql)
      df.createOrReplaceTempView(cleanedView)
      df
    }
    Pipeline(spark, source, sourceView, cleaned, cleanedView, sink)
  }
}

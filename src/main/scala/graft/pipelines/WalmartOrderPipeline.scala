package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.model.OrderParser
import graft.sinks.JdbcUpsertSink
import graft.sources.Sources

/** The reference's production pipeline (SURVEY.md §3.1,
  * flink6_walmart_order_pipeline.py): Kafka order JSON → parse/flatten
  * to 52 columns → batched JDBC upsert, with checkpointing.
  *
  * Structural win vs the reference: the parse chain is pure Catalyst
  * (no Python worker boundary), and exactly-once = checkpointed Kafka
  * offsets + idempotent upsert (ST5) — identical recipe, engine-native.
  */
object WalmartOrderPipeline {

  /** Streaming: Kafka → parse → JDBC upsert. Returns the started query.
    *
    * @param triggerMs  micro-batch interval ≈ the reference's JDBC
    *                   batch_interval_ms (1000 reliability preset)
    */
  def fromKafka(spark: SparkSession, topic: String, bootstrapServers: String,
                sink: JdbcUpsertSink, checkpointDir: String,
                startingOffsets: String = "latest",
                triggerMs: Long = 1000L): StreamingQuery =
    Sources.kafkaStream(spark, topic, bootstrapServers, startingOffsets = startingOffsets)
      .selectExpr("CAST(value AS STRING) AS value")
      .transform(parse(_))
      .writeStream
      .foreachBatch(sink.asForeachBatch)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  /** Streaming over the file-backed Kafka harness
    * (graft.sources.FileKafka) — identical topology to [[fromKafka]]:
    * envelope → value string → parse → upsert, with offset seek and
    * per-trigger admission. Swap in fromKafka unchanged once a broker
    * and the kafka connector are present. */
  def fromFileKafka(spark: SparkSession, dir: String, topic: String,
                    sink: JdbcUpsertSink, checkpointDir: String,
                    startingOffsets: String = "earliest",
                    maxOffsetsPerTrigger: Option[Long] = None,
                    triggerMs: Long = 1000L): StreamingQuery =
    graft.sources.FileKafka.stream(spark, dir, topic, startingOffsets, maxOffsetsPerTrigger)
      .selectExpr("CAST(value AS STRING) AS value")
      .transform(parse(_))
      .writeStream
      .foreachBatch(sink.asForeachBatch)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  /** Streaming from any source that exposes a `value` JSON string
    * column (tests use MemoryStream). */
  def fromStream(raw: DataFrame, sink: JdbcUpsertSink, checkpointDir: String,
                 triggerMs: Long = 1000L): StreamingQuery =
    parse(raw)
      .writeStream
      .foreachBatch(sink.asForeachBatch)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  /** Config-driven assembly — the reference's YAML→pipeline wiring
    * (flink6_walmart_order_pipeline.py:76-95 + config/config.py).
    * Expected keys (graft.GraftConfig dotted form):
    * kafka.bootstrap_servers, kafka.topic, kafka.starting_offsets,
    * mysql.url, mysql.table, mysql.user, mysql.password,
    * sink.batch_size, sink.max_retries, pipeline.checkpoint_dir,
    * pipeline.trigger_ms. */
  def fromConfig(spark: SparkSession, conf: graft.GraftConfig): StreamingQuery = {
    val props = Seq("user" -> conf.get("mysql.user"), "password" -> conf.get("mysql.password"))
      .collect { case (k, Some(v)) => k -> v }.toMap
    val sink = new JdbcUpsertSink(
      conf("mysql.url"),
      conf.getOrElse("mysql.table", "ods.walmart_order"),
      JdbcUpsertSink.Replace,
      batchSize = conf.getInt("sink.batch_size", 100),
      maxRetries = conf.getInt("sink.max_retries", 3),
      props = props)
    fromKafka(spark,
      conf.getOrElse("kafka.topic", "walmart_order_raw"),
      conf("kafka.bootstrap_servers"),
      sink,
      conf("pipeline.checkpoint_dir"),
      startingOffsets = conf.getOrElse("kafka.starting_offsets", "latest"),
      triggerMs = conf.getLong("pipeline.trigger_ms", 1000L))
  }

  /** Batch: daily order-JSON dump files (each file one order array —
    * S8, flink5_parse_walmart_order.py:18-205). Multi-file reads
    * union for free. */
  def fromJsonFiles(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(paths: _*)
    parse(raw.withColumnRenamed("value", "value"), sourceTag = "file")
  }

  def parse(raw: DataFrame, sourceTag: String = "kafka_stream"): DataFrame =
    OrderParser.parse(raw, "value", sourceTag)

  // ---- stage-2 statistics (SURVEY §2.6 A8, FIXTURES.md §5) ----------
  // Totals use DECIMAL(20,2), wider than the reference's sink column
  // (10,2): the sum of (10,2) values overflows the narrow type at
  // realistic aggregate revenue and would silently null out.

  /** Per-minute order count + amount (order_statistics_minute). */
  def statsMinute(flat: DataFrame): DataFrame =
    flat.groupBy(window(col("orderDate_formatted"), "1 minute"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("chargeAmount")).cast("decimal(20,2)").as("total_amount"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("order_count"), col("total_amount"))

  /** Streaming form of the per-minute stats: watermark on event time
    * so windows finalize and state is bounded (append output mode). */
  def statsMinuteStream(flatStream: DataFrame, maxDelay: String = "1 minute"): DataFrame =
    statsMinute(flatStream.withWatermark("orderDate_formatted", maxDelay))

  /** Per-hour variant (order_statistics_hour). */
  def statsHour(flat: DataFrame): DataFrame =
    flat.groupBy(window(col("orderDate_formatted"), "1 hour"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("chargeAmount")).cast("decimal(20,2)").as("total_amount"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("order_count"), col("total_amount"))

  /** Per-user (customerEmailId) hourly stats. */
  def statsUser(flat: DataFrame): DataFrame =
    flat.groupBy(window(col("orderDate_formatted"), "1 hour"),
        col("customerEmailId").as("user_or_email"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("chargeAmount")).cast("decimal(20,2)").as("total_amount"))
      .select(col("user_or_email"), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("order_count"), col("total_amount"))

  /** Per-item (sku) hourly quantity + revenue. */
  def statsItem(flat: DataFrame): DataFrame =
    flat.groupBy(window(col("orderDate_formatted"), "1 hour"), col("sku"))
      .agg(sum(col("quantity")).as("qty_sold"),
        sum(col("chargeAmount")).cast("decimal(20,2)").as("revenue"))
      .select(col("sku"), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("qty_sold"), col("revenue"))

  /** Order-line status distribution per hour. */
  def statsStatus(flat: DataFrame): DataFrame =
    flat.groupBy(window(col("orderDate_formatted"), "1 hour"), col("orderLineStatus"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("orderLineStatus"), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("cnt"))

  // ---- oracle-checked stage-2 queries (q34-q37) ---------------------
  // The stage-2 README names these THE acceptance queries
  // (stage2_window_statistics/README.md:7-11). The driver fixtures have
  // no Walmart order dump, so a deterministic flat-order stand-in is
  // derived from the events table; the SAME production stats functions
  // run over it and are value-checked against DuckDB. Decimal sums are
  // exact; the query wrappers cast to double for the cross-engine hash.

  /** events → the flat-order column subset the stats consume. */
  def flatFromEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir).select(
      col("ts").as("orderDate_formatted"),
      col("value").cast("decimal(10,2)").as("chargeAmount"),
      concat(lit("sku-"), (col("event_id") % 100).cast("string")).as("sku"),
      concat(col("user_id").cast("string"), lit("@example.com")).as("customerEmailId"),
      ((col("event_id") % 5) + 1).cast("int").as("quantity"),
      col("event_type").as("orderLineStatus"))

  private[graft] val flatCte =
    """WITH flat AS (
      |  SELECT ts AS odate, CAST(value AS DECIMAL(10,2)) AS amount,
      |    'sku-' || CAST(event_id % 100 AS VARCHAR) AS sku,
      |    CAST(user_id AS VARCHAR) || '@example.com' AS email,
      |    CAST(event_id % 5 + 1 AS INT) AS quantity,
      |    event_type AS status
      |  FROM events)""".stripMargin

  def statsMinuteQuery(spark: SparkSession, sfDir: String): DataFrame =
    statsMinute(flatFromEvents(spark, sfDir))
      .select(col("window_start"), col("window_end"), col("order_count"),
        col("total_amount").cast("double").as("total_amount"))
      .orderBy("window_start")

  val statsMinuteQuerySql: String =
    s"""$flatCte
       |SELECT date_trunc('minute', odate) AS window_start,
       |  date_trunc('minute', odate) + INTERVAL 1 MINUTE AS window_end,
       |  COUNT(*) AS order_count, CAST(SUM(amount) AS DOUBLE) AS total_amount
       |FROM flat GROUP BY 1, 2 ORDER BY window_start""".stripMargin

  def statsUserQuery(spark: SparkSession, sfDir: String): DataFrame =
    statsUser(flatFromEvents(spark, sfDir))
      .select(col("user_or_email"), col("window_start"), col("window_end"),
        col("order_count"), col("total_amount").cast("double").as("total_amount"))
      .orderBy("user_or_email", "window_start")

  val statsUserQuerySql: String =
    s"""$flatCte
       |SELECT email AS user_or_email,
       |  date_trunc('hour', odate) AS window_start,
       |  date_trunc('hour', odate) + INTERVAL 1 HOUR AS window_end,
       |  COUNT(*) AS order_count, CAST(SUM(amount) AS DOUBLE) AS total_amount
       |FROM flat GROUP BY 1, 2, 3 ORDER BY user_or_email, window_start""".stripMargin

  def statsItemQuery(spark: SparkSession, sfDir: String): DataFrame =
    statsItem(flatFromEvents(spark, sfDir))
      .select(col("sku"), col("window_start"), col("window_end"),
        col("qty_sold"), col("revenue").cast("double").as("revenue"))
      .orderBy("sku", "window_start")

  val statsItemQuerySql: String =
    s"""$flatCte
       |SELECT sku, date_trunc('hour', odate) AS window_start,
       |  date_trunc('hour', odate) + INTERVAL 1 HOUR AS window_end,
       |  CAST(SUM(quantity) AS BIGINT) AS qty_sold,
       |  CAST(SUM(amount) AS DOUBLE) AS revenue
       |FROM flat GROUP BY 1, 2, 3 ORDER BY sku, window_start""".stripMargin

  def statsStatusQuery(spark: SparkSession, sfDir: String): DataFrame =
    statsStatus(flatFromEvents(spark, sfDir))
      .select(col("orderLineStatus"), col("window_start"), col("window_end"), col("cnt"))
      .orderBy("orderLineStatus", "window_start")

  val statsStatusQuerySql: String =
    s"""$flatCte
       |SELECT status AS orderLineStatus,
       |  date_trunc('hour', odate) AS window_start,
       |  date_trunc('hour', odate) + INTERVAL 1 HOUR AS window_end,
       |  COUNT(*) AS cnt
       |FROM flat GROUP BY 1, 2, 3 ORDER BY orderLineStatus, window_start""".stripMargin
}

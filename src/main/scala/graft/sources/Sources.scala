package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source builders (SURVEY.md §2.1 S1-S6) — the reference's
  * KafkaSource / file / JDBC / socket source factories
  * (utils/flink_source_utils.py) re-expressed over spark.read /
  * spark.readStream.
  *
  * All of these return lazy DataFrames; Catalyst prunes columns and
  * pushes filters into the scans. The Kafka builders emit the
  * standard envelope (key, value, topic, partition, offset,
  * timestamp) — identical shape to the reference's consumer-visible
  * record (kafka_consumer_utils.py:204-212).
  */
object Sources {

  /** S1: streaming Kafka source. `startingOffsets` accepts
    * "earliest" / "latest" / per-partition JSON — the offset-seek
    * analogue (kafka_load_to_mysql.py:624-642). Requires the
    * spark-sql-kafka connector on the classpath at runtime. */
  def kafkaStream(spark: SparkSession, topic: String, bootstrapServers: String,
                  groupId: String = "graft", startingOffsets: String = "latest",
                  maxOffsetsPerTrigger: Option[Long] = None,
                  extra: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("kafka.group.id", groupId)
    val r2 = maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n))
    extra.foldLeft(r2) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** S1 batch variant (bounded read of a topic). */
  def kafkaBatch(spark: SparkSession, topic: String, bootstrapServers: String,
                 startingOffsets: String = "earliest",
                 endingOffsets: String = "latest"): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .load()

  /** S2 analogue: Kafka topic registered as a queryable temp view
    * with the value decoded to string (SimpleStringSchema semantics,
    * flink_source_utils.py:107-115). */
  def kafkaTableSource(spark: SparkSession, tableName: String, topic: String,
                       bootstrapServers: String,
                       startingOffsets: String = "latest"): DataFrame = {
    val df = kafkaStream(spark, topic, bootstrapServers, startingOffsets = startingOffsets)
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "topic", "partition", "offset", "timestamp")
    df.createOrReplaceTempView(tableName)
    df
  }

  /** S3: file sources — text/csv/json/parquet, batch or streaming
    * (streaming requires an explicit schema). */
  def file(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None, streaming: Boolean = false,
           options: Map[String, String] = Map.empty): DataFrame =
    if (streaming) {
      val r = spark.readStream.format(format).options(options)
      schema.fold(r)(s => r.schema(s)).load(path)
    } else {
      val r = spark.read.format(format).options(options)
      schema.fold(r)(s => r.schema(s)).load(path)
    }

  /** S4: JDBC table source; `partitionColumn`/bounds enable parallel
    * reads at scale (numPartitions concurrent range scans). */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty,
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0, upperBound: Long = 0,
           numPartitions: Int = 1): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val r2 = props.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }
    val r3 = partitionColumn.fold(r2) { c =>
      r2.option("partitionColumn", c)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    r3.load()
  }

  /** S5: socket test source. */
  def socket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** S6: rate source — the custom-source stand-in for tests
    * (rows: timestamp, value). */
  def rate(spark: SparkSession, rowsPerSecond: Long = 10): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
}

package graft.operators

import scala.reflect.runtime.universe.TypeTag
import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Thin, typed equivalents of the reference's generic transform
  * wrappers (SURVEY.md §2.3 T1-T13,
  * utils/flink_transform_utils.py:92-375). Spark natives are
  * one-liners; these exist to pin the parity surface and carry the
  * semantics that are NOT one-liners (error side-output, null
  * filtering of tuple fields).
  *
  * Prefer the Column-based variants — they stay in Catalyst/codegen.
  * The lambda variants mirror the reference's user-function API but
  * break codegen; documented, deliberate trade-off.
  */
object Transforms {

  /** T1 map — 1→1 via user function (lambda variant). */
  def map[T, U: Encoder](ds: Dataset[T], fn: T => U): Dataset[U] = ds.map(fn)

  /** T2 filter — predicate via SQL text or Column (Catalyst path). */
  def filter[T](ds: Dataset[T], predicate: String): Dataset[T] = ds.filter(predicate)
  def filter[T](ds: Dataset[T], predicate: Column): Dataset[T] = ds.filter(predicate)

  /** T3 flatMap — 1→N via user function. */
  def flatMap[T, U: Encoder](ds: Dataset[T], fn: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(fn)

  /** T4 keyBy — returns the grouped handle (partitioning happens at
    * the shuffle of whatever aggregation follows). */
  def keyBy[T, K: Encoder](ds: Dataset[T], key: T => K) = ds.groupByKey(key)

  /** A6 keyed reduce — Flink's keyed `reduce()` (the running-fold
    * semantics collapse to the final fold per key in bounded mode):
    * groupByKey + reduceGroups, a partial-aggregating shuffle of one
    * row per key. */
  def reduceByKey[T, K: Encoder](ds: Dataset[T], key: T => K,
                                 reduce: (T, T) => T): Dataset[(K, T)] =
    ds.groupByKey(key).reduceGroups(reduce)

  /** T5 filter_null_values — drop rows where any (or the listed)
    * columns are null (utils/flink_transform_utils.py:202-227). */
  def dropNulls(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.na.drop() else df.na.drop(cols)

  /** T6 validate_data_format — filter by a validation expression
    * (e.g. "amount > 0", :247-252). */
  def validate(df: DataFrame, validation: Column): DataFrame = df.where(validation)

  /** T7 error side-output: apply `result` per row; rows where it
    * evaluates (non-null) go to the main output, rows where it nulls
    * out or fail `errCond` go to the error output with the raw value
    * retained — the dead-letter pattern. Spark has no side outputs;
    * the split is two filters over one cached/computed plan, which
    * Catalyst executes as a shared subplan in batch or two passes of
    * the same source in streaming.
    *
    * Returns (main, errors). */
  def errorSplit(df: DataFrame, result: Column, errCond: Column => Column = _.isNull)
      : (DataFrame, DataFrame) = {
    val withRes = df.withColumn("__result", result)
    val bad = errCond(col("__result"))
    val main = withRes.where(!coalesce(bad, lit(true))).drop("__result")
    val errors = withRes.where(coalesce(bad, lit(true)))
      .withColumn("error", lit("result_evaluation_failed"))
      .drop("__result")
    (main, errors)
  }

  /** T8 select — projection by field names (:322-350). */
  def select(df: DataFrame, fields: Seq[String]): DataFrame =
    df.select(fields.map(col): _*)

  /** T9 where — SQL-string predicate, same text the reference passes
    * (e.g. "amount > 100 AND user_id IS NOT NULL", :352-375). */
  def where(df: DataFrame, sqlPredicate: String): DataFrame = df.where(sqlPredicate)

  /** T10 DataStream→Table: register as temp view (with optional
    * rename), enabling spark.sql over it (:472-507). */
  def toTable(df: DataFrame, viewName: String, fieldNames: Seq[String] = Nil): DataFrame = {
    val renamed = if (fieldNames.isEmpty) df else df.toDF(fieldNames: _*)
    renamed.createOrReplaceTempView(viewName)
    renamed
  }

  /** T11 Table→DataStream: typed view of a DataFrame (:509-538). */
  def toStream[T: Encoder](df: DataFrame): Dataset[T] = df.as[T]

  /** T12/T13 JSON message transform: parse a JSON string column with
    * a permissive schema; unparseable payloads keep the raw value in
    * `raw_data` (kafka_load_to_mysql.py:183-190 fallback). A payload
    * is treated as unparseable when every schema field comes back
    * null (Spark's PERMISSIVE mode yields an all-null struct rather
    * than a null row for malformed JSON). */
  def parseJsonMessages(df: DataFrame, schema: org.apache.spark.sql.types.StructType,
                        jsonCol: String = "value"): DataFrame = {
    val parsed = from_json(col(jsonCol), schema)
    val failed = parsed.isNull ||
      schema.fieldNames.map(f => parsed.getField(f).isNull).reduce(_ && _)
    df.withColumn("parsed", parsed)
      .withColumn("raw_data", when(failed, col(jsonCol)))
      .select(col("raw_data") +: schema.fieldNames.map(f => col(s"parsed.$f")).toSeq: _*)
  }
}

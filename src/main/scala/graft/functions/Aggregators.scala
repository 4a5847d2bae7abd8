package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDAF extension point (SURVEY.md §2.11) — the reference's
  * AggregateFunction shape (create_accumulator / add / merge /
  * get_result, utils/flink_window_utils.py:328-395) maps to Spark's
  * `Aggregator[IN, BUF, OUT]`. One concrete implementation proves the
  * surface; built-ins cover every actual reference use.
  */
object Aggregators {

  /** (count, sum) average — the reference's AvgAggregate
    * (utils/flink_window_utils.py:369-395): accumulator is a
    * (count, sum) pair, merge adds pairwise, result sum/count with
    * 0.0 for empty — identical semantics. */
  object CountSumAvg extends Aggregator[Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      (b._1 + 1, b._2 + a)
    override def merge(b1: (Long, Double), b2: (Long, Double)): (Long, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Long, Double)): Double =
      if (r._1 == 0) 0.0 else r._2 / r._1
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register for SQL use: SELECT count_sum_avg(value) ... —
    * the reference's create_temporary_function analogue
    * (flink_learning/flink_typora.md:813-824). */
  def register(spark: SparkSession, name: String = "count_sum_avg"): Unit =
    spark.udf.register(name, udaf(CountSumAvg))
}

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

  /** Bounded per-group top-k as a TWO-PHASE aggregate: each partition
    * keeps at most k (score, id) pairs (score desc, id asc) and
    * partial buffers merge map-side — the shuffle carries k rows per
    * (partition, group), never the group's full membership. The
    * window row_number() alternative must shuffle and SORT every row
    * of every group; for small k over large groups this is the shape
    * a 100 TB engine wants. IN = (group, score, id). */
  final class TopKByScore(k: Int)
      extends Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, s"k must be positive, got $k")
    private def bound(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
      xs.sortBy(t => (-t._1, t._2)).take(k)
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)], a: (Long, Double, Long)): Seq[(Double, Long)] =
      // admission check first: most rows lose to a full buffer's
      // minimum without paying the sort
      if (b.length == k && {
        val last = b.last
        a._2 < last._1 || (a._2 == last._1 && a._3 > last._2)
      }) b
      else bound(b :+ ((a._2, a._3)))
    override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      bound(b1 ++ b2)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }
}

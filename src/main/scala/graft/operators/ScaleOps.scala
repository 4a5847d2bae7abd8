package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew-salted joins, bucketed co-located joins,
  * approximate distinct counting, streaming dedup. These are the
  * knobs a 100 TB deployment reaches for when the default shuffle
  * topology hits a wall.
  */
object ScaleOps {

  /** Skew-salted equi-join: replicate each right-side row `saltFactor`
    * times and scatter left-side rows across the replicas, so a hot
    * key spreads over `saltFactor` reducers instead of one straggler.
    * Semantically identical to `left.join(right, keys)` (inner).
    *
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological key that exceeds a single
    * executor's memory. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      pmod(hash(col(keys.head), monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Register two DataFrames as bucketed tables on the join key: a
    * subsequent equi-join on that key shuffles NEITHER side (bucket
    * co-location). This is the persistent-table form of
    * pre-partitioning for repeatedly-joined 100 TB facts. Returns the
    * co-located join. */
  def bucketedJoin(left: DataFrame, right: DataFrame, key: String,
                   buckets: Int, leftName: String, rightName: String): DataFrame = {
    val spark = left.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $leftName")
    spark.sql(s"DROP TABLE IF EXISTS $rightName")
    left.write.mode("overwrite").bucketBy(buckets, key)
      .sortBy(key).format("parquet").saveAsTable(leftName)
    right.write.mode("overwrite").bucketBy(buckets, key)
      .sortBy(key).format("parquet").saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), key)
  }

  /** Approximate distinct count (HLL) — the 100 TB substitute for
    * exact COUNT(DISTINCT): one pass, bounded memory, mergeable
    * sketches (no giant shuffle of distinct values). */
  def approxDistinct(df: DataFrame, col0: String, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(col(col0), rsd).as(s"approx_distinct_$col0"))

  /** Streaming dedup bounded by a watermark: drops duplicates of
    * `keys` arriving within the watermark delay, and expires state
    * beyond it (A7 streaming form; the unbounded-state
    * dropDuplicates is a memory leak on an infinite stream). */
  def streamingDedup(df: DataFrame, tsCol: String, delay: String,
                     keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}

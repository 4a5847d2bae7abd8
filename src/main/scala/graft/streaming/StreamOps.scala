package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming window/watermark builders (SURVEY.md §2.7 W1-W3, W6-W8;
  * §2.6 A5/A8) — the reference's window_utils surface over
  * Structured Streaming. The same expressions work on batch
  * DataFrames (used by the oracle-checked batch queries in
  * [[graft.operators.WindowOps]]).
  */
object StreamOps {

  /** W6: bounded-out-of-orderness watermark; maxDelay "0 seconds" ==
    * monotonic strategy (utils/flink_window_utils.py:399-465). */
  def withWatermark(df: DataFrame, tsCol: String, maxDelay: String): DataFrame =
    df.withWatermark(tsCol, maxDelay)

  /** W1: tumbling event-time window aggregation. */
  def tumblingAgg(df: DataFrame, tsCol: String, size: String,
                  keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), size) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** W2: sliding (HOP) window aggregation. */
  def slidingAgg(df: DataFrame, tsCol: String, size: String, slide: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), size, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** W3: session window aggregation (gap-based). */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** A5/W8: generated SQL text for a tumbling-window aggregate —
    * parity with the reference's SQL generators
    * (utils/flink_window_utils.py:467-514). TUMBLE_START/TUMBLE_END ≡
    * window.start / window.end. */
  def tumbleSql(table: String, tsCol: String, size: String,
                keys: Seq[String] = Nil,
                aggSelects: Seq[String] = Seq("COUNT(*) AS cnt")): String = {
    val keyList = if (keys.isEmpty) "" else keys.mkString(", ") + ","
    s"""SELECT $keyList ${aggSelects.mkString(", ")},
       |  window(`$tsCol`, '$size').start AS window_start,
       |  window(`$tsCol`, '$size').end AS window_end
       |FROM $table
       |GROUP BY ${if (keys.isEmpty) "" else keys.mkString(", ") + ","} window(`$tsCol`, '$size')""".stripMargin
  }

  /** A5/W8: generated SQL for a sliding-window (HOP) aggregate —
    * parity with the reference's HOP generator
    * (utils/flink_window_utils.py:516-564). Flink's
    * HOP(ts, slide, size) ≡ Spark `window(ts, size, slide)`;
    * HOP_START/HOP_END ≡ window.start / window.end. */
  def hopSql(table: String, tsCol: String, size: String, slide: String,
             keys: Seq[String] = Nil,
             aggSelects: Seq[String] = Seq("COUNT(*) AS cnt")): String = {
    val keyList = if (keys.isEmpty) "" else keys.mkString(", ") + ","
    val win = s"window(`$tsCol`, '$size', '$slide')"
    s"""SELECT $keyList ${aggSelects.mkString(", ")},
       |  $win.start AS window_start,
       |  $win.end AS window_end
       |FROM $table
       |GROUP BY ${if (keys.isEmpty) "" else keys.mkString(", ") + ","} $win""".stripMargin
  }

  /** A5/W8: generated SQL for a session-window aggregate — parity with
    * the reference's SESSION generator
    * (utils/flink_window_utils.py:566-611). SESSION(ts, gap) ≡ Spark
    * `session_window(ts, gap)`; SESSION_START/SESSION_END ≡
    * session_window.start / session_window.end. */
  def sessionSql(table: String, tsCol: String, gap: String,
                 keys: Seq[String] = Nil,
                 aggSelects: Seq[String] = Seq("COUNT(*) AS cnt")): String = {
    val keyList = if (keys.isEmpty) "" else keys.mkString(", ") + ","
    val win = s"session_window(`$tsCol`, '$gap')"
    s"""SELECT $keyList ${aggSelects.mkString(", ")},
       |  $win.start AS window_start,
       |  $win.end AS window_end
       |FROM $table
       |GROUP BY ${if (keys.isEmpty) "" else keys.mkString(", ") + ","} $win""".stripMargin
  }

  /** JN1: stream-stream window equi-join — pairs records with equal
    * keys in the same tumbling window, the reference's join semantics
    * (utils/flink_transform_utils.py:377-428): bucketized time
    * condition on top of the equi-key (SURVEY §7.4 risk 5). Apply
    * watermarks on both inputs first for streaming state cleanup. */
  def windowJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 leftTs: Column, rightTs: Column,
                 windowSize: String = "60 seconds"): DataFrame = {
    // window() must be materialized as a column before it can appear in
    // a join condition; struct equality then buckets both sides. The
    // raw ts columns are dropped pre-join: under watermarks the window
    // inherits the event-time tag, and Structured Streaming allows only
    // ONE event-time column per input — keeping both breaks the
    // streaming plan. The bucket window is returned as `window`.
    val lw = left.withColumn("__wl", window(leftTs, windowSize)).drop(leftTs)
    val rw = right.withColumn("__wr", window(rightTs, windowSize)).drop(rightTs)
    lw.join(rw, leftKey === rightKey && col("__wl") === col("__wr"), "inner")
      .withColumnRenamed("__wl", "window")
      .drop("__wr")
  }

  /** JN2: lookup (dimension) join — stream enriched against a batch
    * dimension table, broadcast when small. For per-trigger dim
    * refresh, rebuild the dim DataFrame inside foreachBatch. */
  def lookupJoin(stream: DataFrame, dim: DataFrame, cond: Column,
                 broadcastDim: Boolean = true,
                 joinType: String = "left"): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, cond, joinType)
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stage-3 anomaly detection (SURVEY.md §2.10 ST6) — the reference
  * plans three CEP scenarios it never built
  * (flink_order_real_time_plan.md:115-157: 大额订单预警 large-order
  * alert > threshold, 频繁下单检测 frequent ordering per minute,
  * 同一用户连续订单 consecutive-order correlation). All three here,
  * Spark-first:
  *
  *   - large orders: a stateless codegen filter — runs identically on
  *     batch and streams, no state at any scale
  *   - frequent ordering: per-(user, minute-window) count above a
  *     threshold — a two-phase windowed hash agg; under watermarks the
  *     same expression is an append-mode streaming alert
  *   - consecutive orders: same-user successive events within a gap —
  *     batch via a lag window; streaming via keyed state holding ONE
  *     last-event tuple per user (state bounded by users, cleaned by
  *     idle timeout)
  */
object OrderAnomalyDetector {

  /** Large-order alert rows: (kind, user_or_email, window_start,
    * metric) — normalized alert schema shared by all detectors. */
  def largeOrders(flat: DataFrame, threshold: Double,
                  amountCol: String = "chargeAmount",
                  emailCol: String = "customerEmailId",
                  tsCol: String = "orderDate_formatted"): DataFrame =
    flat.where(col(amountCol) > threshold)
      .select(lit("LARGE").as("kind"), col(emailCol).as("user_or_email"),
        date_trunc("minute", col(tsCol)).as("window_start"),
        col(amountCol).cast("double").as("metric"))

  /** Frequent-ordering alert: more than `maxPerMinute` orders from one
    * user inside a tumbling minute. Watermark the input for streaming
    * append mode. */
  def frequentOrders(flat: DataFrame, maxPerMinute: Long,
                     emailCol: String = "customerEmailId",
                     tsCol: String = "orderDate_formatted"): DataFrame =
    flat.groupBy(window(col(tsCol), "1 minute"), col(emailCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > maxPerMinute)
      .select(lit("FREQUENT").as("kind"), col(emailCol).as("user_or_email"),
        col("window.start").as("window_start"),
        col("cnt").cast("double").as("metric"))

  /** Batch correlation: consecutive events of the same user within
    * `gapSeconds` — the "same-user successive orders" analysis. Output
    * is one row per adjacent pair with the gap. */
  def consecutivePairs(events: DataFrame, gapSeconds: Long,
                       userCol: String = "user_id",
                       idCol: String = "event_id",
                       tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    // gap in whole seconds = floor of elapsed microseconds — elapsed
    // time, not second-boundary crossings (DuckDB date_diff counts
    // crossings; with sub-second timestamps the two disagree). The
    // oracle mirrors this as (epoch_us(a)-epoch_us(b))//1000000.
    // timestampdiff, unlike unix_millis, accepts TIMESTAMP_NTZ.
    val gap = expr(s"timestampdiff(MICROSECOND, prev_ts, $tsCol) div 1000000")
    events
      .withColumn("prev_id", lag(col(idCol), 1).over(w))
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .where(col("prev_ts").isNotNull && gap <= gapSeconds)
      .select(col(userCol), col("prev_id"), col(idCol).as("next_id"),
        gap.as("gap_seconds"))
  }

  // ---- oracle-checked queries (q38/q39) -----------------------------

  /** q38: LARGE (amount > 400) + FREQUENT (>1 order in a minute)
    * alerts over the flat-order stand-in, normalized alert schema. */
  def anomalyQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val flat = graft.pipelines.WalmartOrderPipeline.flatFromEvents(spark, sfDir)
    largeOrders(flat, threshold = 400.0)
      .union(frequentOrders(flat, maxPerMinute = 1L))
      .orderBy("kind", "user_or_email", "window_start", "metric")
  }

  val anomalyQuerySql: String =
    s"""${graft.pipelines.WalmartOrderPipeline.flatCte}
       |SELECT * FROM (
       |  SELECT 'LARGE' AS kind, email AS user_or_email,
       |    date_trunc('minute', odate) AS window_start,
       |    CAST(amount AS DOUBLE) AS metric
       |  FROM flat WHERE amount > 400
       |  UNION ALL
       |  SELECT 'FREQUENT', email, mi, CAST(c AS DOUBLE)
       |  FROM (SELECT email, date_trunc('minute', odate) AS mi, count(*) AS c
       |        FROM flat GROUP BY 1, 2) t
       |  WHERE c > 1) u
       |ORDER BY kind, user_or_email, window_start, metric""".stripMargin

  /** q39: consecutive same-user events within 5 minutes. */
  def consecutiveQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    consecutivePairs(graft.Tables.events(spark, sfDir), gapSeconds = 300L)
      .orderBy("user_id", "prev_id", "next_id")

  val consecutiveQuerySql: String =
    """SELECT user_id, prev_id, event_id AS next_id,
      |  (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS gap_seconds
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events) t
      |WHERE prev_ts IS NOT NULL AND (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 <= 300
      |ORDER BY user_id, prev_id, next_id""".stripMargin

  final case class UserEvent(userId: Long, eventId: Long, ts: Timestamp)
  final case class ConsecutivePair(userId: Long, prevId: Long, nextId: Long, gapSeconds: Long)
  final case class LastEvent(eventId: Long, tsMillis: Long)

  /** Streaming form of [[consecutivePairs]]: keyed state keeps only the
    * last event per user; each arrival emits a pair when within the
    * gap. `idleTimeoutMs > 0` clears abandoned users (long-running
    * streams) at the cost of continuous batch scheduling — same
    * trade-off as CountWindows. */
  def consecutivePairsStream(ds: Dataset[UserEvent], gapSeconds: Long,
                             idleTimeoutMs: Long = 0L): Dataset[ConsecutivePair] = {
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val outEnc = Encoders.product[ConsecutivePair]
    implicit val keyEnc = Encoders.scalaLong
    val timeoutConf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, ConsecutivePair](
        OutputMode.Append, timeoutConf) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption
            val out = events.toSeq.sortBy(e => (e.ts.getTime, e.eventId)).flatMap { e =>
              val pair = last.collect {
                case LastEvent(pid, pts)
                    if (e.ts.getTime - pts) <= gapSeconds * 1000L =>
                  ConsecutivePair(uid, pid, e.eventId, (e.ts.getTime - pts) / 1000L)
              }
              last = Some(LastEvent(e.eventId, e.ts.getTime))
              pair
            }
            last.foreach(state.update)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }
}

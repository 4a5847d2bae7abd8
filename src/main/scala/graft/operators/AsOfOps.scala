package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RelationalOps.decSum

/** Temporal as-of join and range joins — the canonical "operator Spark
  * lacks" extensions, composed from existing operators so Catalyst
  * keeps optimizing them (no custom physical plan needed).
  *
  * The reference's closest analogue is its interval join
  * (utils/flink_transform_utils.py:377-428, covered by q11/q31); an
  * as-of join is the degenerate "latest prior event" case that
  * training-data pipelines hit constantly (latest price before a
  * trade, latest profile snapshot before an impression).
  *
  * Scale design: the obvious formulation — join on key with
  * `l.ts >= r.ts` then keep the max — explodes to O(|L|·|R|) per key
  * before pruning. Instead we union the two sides and take a running
  * `last(payload ignore nulls)` over (key, ts): ONE shuffle, zero
  * join, linear in |L|+|R|, and the sort is the same sort a
  * sort-merge join would have paid anyway. A hot key serializes in
  * one partition (inherent to per-key ordering); at 100 TB the
  * mitigation is a coarse time-bucket pre-split carrying the last
  * right-row of the previous bucket forward, which this API admits
  * without semantic change.
  */
object AsOfOps {

  /** As-of join: for each left row, attach the single latest right row
    * of the same key with `right.ts <= left.ts` (or `<` when
    * `strict`). Inner semantics: left rows with no prior right row are
    * dropped.
    *
    * Right columns other than `keyCol`/`rightTsCol` must not collide
    * with left columns; the matched right timestamp is exposed as
    * `rightTsCol`. Ties on (key, ts) inside the right side are broken
    * arbitrarily — pre-aggregate the right side (e.g. `max_by` per
    * key+ts) when the input can contain them.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               strict: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == keyCol || c == rightTsCol)
    val collisions = payloadCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")
    require(!left.columns.contains(rightTsCol),
      s"rightTsCol '$rightTsCol' collides with a left column; alias it on the right side first")

    // at equal ts the right row must sort BEFORE the left row to be
    // visible (>= semantics); after it for strict <
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    // whole right row as one struct so all matched columns come from
    // the SAME right row even when some payload values are null
    val payload = struct((col(rightTsCol) +: payloadCols.map(col)): _*)

    val rightTagged = right.select(
      col(keyCol), col(rightTsCol).as("__asof_ts"),
      lit(rightSide).as("__asof_side"), payload.as("__asof_payload"))
    val leftTagged = left.select(
      (left.columns.map(col) :+ col(leftTsCol).as("__asof_ts") :+
        lit(leftSide).as("__asof_side") :+
        lit(null).cast(rightTagged.schema("__asof_payload").dataType)
          .as("__asof_payload")): _*)

    val w = Window.partitionBy(keyCol).orderBy(col("__asof_ts"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(
        rightTagged.select((left.columns.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightTagged.columns.map(col)): _*))
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .where(col("__asof_side") === leftSide && col("__asof_match").isNotNull)
      .select((left.columns.map(col) :+
        col(s"__asof_match.$rightTsCol").as(rightTsCol)) ++
        payloadCols.map(c => col(s"__asof_match.$c").as(c)): _*)
  }

  /** Generic range join: each fact row matched to the bin rows whose
    * [lo, hi) interval contains `valueCol`. The bins side is
    * broadcast — a BroadcastNestedLoopJoin that scans each fact row
    * against the (small) bin list, never shuffling the fact table.
    * For large bin tables use [[binByWidth]] or bucketize first. */
  def rangeBinJoin(facts: DataFrame, bins: DataFrame, valueCol: String,
                   loCol: String = "lo", hiCol: String = "hi"): DataFrame =
    facts.join(broadcast(bins),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** Zero-join fast path for uniform-width bins: bin id as a pure
    * codegen expression, usable as a groupBy key directly. */
  def binByWidth(value: Column, width: Double): Column =
    floor(value / lit(width)).cast("long")

  // ---- oracle-checked queries (q40/q41) -----------------------------

  /** q40: latest purchase at-or-before each click, per user. The
    * right side is pre-aggregated to one row per (user, ts) for
    * deterministic ties. */
  def asOfQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"),
        max_by(col("value"), col("event_id")).as("purchase_value"))
    asOfJoin(clicks, purchases, keyCol = "user_id",
        leftTsCol = "click_ts", rightTsCol = "ts")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_value"))
      .orderBy("user_id", "click_id")
  }

  val asOfQuerySql: String =
    """WITH r AS (
      |  SELECT user_id, ts, max(event_id) AS purchase_id,
      |         max_by(value, event_id) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |), l AS (
      |  SELECT user_id, event_id AS click_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT l.user_id AS user_id, l.click_id, l.click_ts, r.purchase_id, r.purchase_value
      |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.click_ts >= r.ts
      |ORDER BY user_id, click_id""".stripMargin

  /** q41: revenue histogram by quantity band — a broadcast range join
    * against an inline bins dim, then an ordinary two-phase hash agg. */
  def rangeBinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bins = Seq((1, 0.0, 10.0), (2, 10.0, 20.0), (3, 20.0, 30.0),
      (4, 30.0, 40.0), (5, 40.0, 51.0)).toDF("bin_id", "lo", "hi")
    rangeBinJoin(Tables.lineitem(spark, sfDir), bins, "l_quantity")
      .groupBy("bin_id", "lo", "hi")
      .agg(count(lit(1)).as("cnt"), decSum(col("l_extendedprice")).as("revenue"))
      .orderBy("bin_id")
  }

  val rangeBinQuerySql: String =
    """WITH bins(bin_id, lo, hi) AS (VALUES
      |  (1, 0.0, 10.0), (2, 10.0, 20.0), (3, 20.0, 30.0),
      |  (4, 30.0, 40.0), (5, 40.0, 51.0))
      |SELECT bin_id, lo, hi, count(*) AS cnt,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN bins ON l_quantity >= lo AND l_quantity < hi
      |GROUP BY 1, 2, 3 ORDER BY bin_id""".stripMargin
}

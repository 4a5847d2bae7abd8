package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfOps

/** As-of join (union+window, zero-join) and range-bin join. */
class AsOfOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private val left = Seq(
    (1L, 100L, t(10)), // after r1 → matches r1
    (1L, 101L, t(30)), // after r2 → matches r2 (latest, not r1)
    (1L, 102L, t(20)), // equal to r2's ts → matches r2 on >=, r1 on strict
    (2L, 200L, t(5)))  // user 2 has no prior right row → dropped
    .toDF("user_id", "click_id", "click_ts")

  private val right = Seq(
    (1L, t(0), 10L, Some(1.5)),
    (1L, t(20), 11L, None: Option[Double]), // null payload value
    (2L, t(50), 20L, Some(9.9)))
    .toDF("user_id", "ts", "purchase_id", "purchase_value")

  test("as-of picks the latest right row at-or-before each left row") {
    val out = AsOfOps.asOfJoin(left, right, "user_id", "click_ts", "ts")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 10L), (101L, 11L), (102L, 11L)))
  }

  test("strict mode excludes the equal-timestamp right row") {
    val out = AsOfOps.asOfJoin(left, right, "user_id", "click_ts", "ts", strict = true)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 10L), (101L, 11L), (102L, 10L)))
  }

  test("all matched columns come from the same right row even with null payload values") {
    val out = AsOfOps.asOfJoin(left, right, "user_id", "click_ts", "ts")
      .where($"click_id" === 101L)
      .select("purchase_id", "purchase_value").collect().head
    assert(out.getLong(0) == 11L && out.isNullAt(1)) // not 1.5 from r1
  }

  test("as-of plan has no join operator — one window over the union") {
    val plan = AsOfOps.asOfJoin(left, right, "user_id", "click_ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected zero-join plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("rightTsCol colliding with a left column fails fast") {
    val e = intercept[IllegalArgumentException] {
      AsOfOps.asOfJoin(left, right.withColumnRenamed("ts", "click_ts"),
        "user_id", "click_ts", "click_ts")
    }
    assert(e.getMessage.contains("click_ts"))
    assert(e.getMessage.contains("collides"))
  }

  test("range-bin join assigns facts to containing bins via broadcast") {
    val bins = Seq((1, 0.0, 10.0), (2, 10.0, 20.0)).toDF("bin_id", "lo", "hi")
    val facts = Seq(0.0, 5.0, 9.99, 10.0, 19.0, 25.0).toDF("v")
    val out = AsOfOps.rangeBinJoin(facts, bins, "v")
      .groupBy("bin_id").agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 3L, 2 -> 2L)) // 25.0 unmatched, bounds half-open
    val plan = AsOfOps.rangeBinJoin(facts, bins, "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("binByWidth matches the bin boundaries of an explicit uniform bins table") {
    val facts = Seq(0.0, 9.99, 10.0, 37.2).toDF("v")
    val out = facts.select(AsOfOps.binByWidth($"v", 10.0).as("b"))
      .as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 1L, 3L))
  }
}

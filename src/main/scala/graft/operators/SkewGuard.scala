package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guard rails for LSH band self-joins.
  *
  * A band self-join is never O(n²) *across* buckets, but a single
  * degenerate bucket — thousands of identical or near-identical docs
  * sharing a band key, exactly what boilerplate-heavy crawl data
  * produces — re-introduces O(n²) *within* that bucket. AQE skew-join
  * splits the shuffle partitions but cannot cap the pair explosion
  * itself, so the guard acts on the data:
  *
  *   1. `maxGroupAllPairs` — exact-duplicate collapse before banding:
  *      docs with an identical signature form a group; groups larger
  *      than this emit a linear star (representative, member) pair list
  *      instead of the quadratic all-pairs set, and only the
  *      representative enters the band join. Small groups are left
  *      untouched (bit-identical output to the unguarded operator).
  *   2. `maxBucket` — per-bucket membership cap after banding: buckets
  *      keep their `maxBucket` lowest-id members; the rest are dropped
  *      from that bucket (and logged). A capped doc usually still
  *      pairs through its other b−1 bands, so recall degrades
  *      gracefully instead of the job dying.
  *
  * With the defaults, any corpus whose groups and buckets stay under
  * the thresholds produces byte-identical results to the unguarded
  * operators — the CORRECTNESS oracle runs with the guard ON.
  */
final case class BandGuard(
    maxBucket: Int = 256,
    maxGroupAllPairs: Int = 64,
    logOverflow: Boolean = false) {
  require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
  require(maxGroupAllPairs >= 1, s"maxGroupAllPairs must be >= 1, got $maxGroupAllPairs")
}

object BandGuard {
  val default: BandGuard = BandGuard()
  /** No guarding — the pre-round-3 behavior (benchmark/control only). */
  val off: BandGuard = BandGuard(Int.MaxValue, Int.MaxValue)
}

object SkewGuard {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Keep at most `cap` members per bucket, lowest `idCol` first. The
    * row_number window shuffles on the bucket key — the same key the
    * following self-join shuffles on, so the exchange is reused. */
  def capBuckets(bands: DataFrame, bucketCol: String, idCol: String, cap: Int): DataFrame =
    if (cap == Int.MaxValue) bands
    else {
      val w = Window.partitionBy(bucketCol).orderBy(idCol)
      bands.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= cap)
        .drop("__rn")
    }

  /** Buckets over the cap: (bucket, size, dropped). Diagnostic —
    * callers inspect this to tune `maxBucket`/band width. */
  def overflowStats(bands: DataFrame, bucketCol: String, cap: Int): DataFrame =
    bands.groupBy(bucketCol).agg(count(lit(1)).as("size"))
      .where(col("size") > cap)
      .withColumn("dropped", col("size") - cap)

  /** When enabled, count and log the candidates dropped by the bucket
    * cap (one small aggregate job over the band keys). */
  def maybeLogOverflow(bands: DataFrame, bucketCol: String, cap: Int,
                       enabled: Boolean, what: String): Unit =
    if (enabled && cap != Int.MaxValue) {
      val row = overflowStats(bands, bucketCol, cap)
        .agg(count(lit(1)).as("b"), coalesce(sum("dropped"), lit(0L)).as("d"))
        .first()
      val (b, d) = (row.getLong(0), row.getLong(1))
      if (b > 0)
        log.warn(s"$what: capped $b bucket(s) at $cap members, dropped $d " +
          "band membership(s); capped docs can still pair via their other bands")
    }
}

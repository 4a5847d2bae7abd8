package graft.streaming

import org.apache.spark.sql.SparkSession

/** File-count-triggered compaction for the absorbing posting tables
  * (VERDICT r15 #6, PERF §41): the 100-batch admission soak measured
  * probe latency creeping +35% as appends grew the bucketed posting
  * table 2,048 → 5,248 files while bytes grew only 14% — per-file
  * open/footer cost, not data volume, is the creep mechanism. Each
  * append adds ~one file per touched bucket, so file count grows
  * linearly in batches absorbed and a production gate must compact on
  * a FILE-COUNT trigger, not a size one. This is that dial, shared by
  * [[StreamingDedup.compactAt]] (band postings, bucketed on `cbk`) and
  * [[StreamingSpanGate.compactAt]] (span postings, bucketed on `csh`).
  *
  * The rewrite preserves the bucketed layout (one bucketBy/sortBy pass
  * over the table — the same shape as the original staging write, cost
  * amortized over the ~N batches between triggers), swaps atomically
  * at the catalog level (write to a side table, drop the original,
  * rename into place) and keeps the caller's table NAME stable, so a
  * long-running admission loop never re-resolves anything. */
private[streaming] object PostingCompaction {

  private def location(spark: SparkSession, table: String): java.io.File = {
    val uri = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
    new java.io.File(uri.getPath)
  }

  /** Data files currently backing `table` (parquet part files). */
  def fileCount(spark: SparkSession, table: String): Int =
    Option(location(spark, table).listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith("part-"))

  /** The compaction rewrite itself, unconditionally: one bucketed
    * pass over `table`, swapped atomically at the catalog level. */
  def rewrite(spark: SparkSession, table: String, buckets: Int,
              bucketCol: String): Unit = {
    val side = table + "__compacting"
    spark.sql(s"DROP TABLE IF EXISTS $side"): Unit
    // repartition to `buckets` partitions on the bucket column
    // before the bucketed write: bounds the output at
    // (writer tasks × buckets-per-task) files — measured 72 → 16 at
    // 8 buckets on the probe — where an un-repartitioned rewrite
    // keeps the input's task count and can leave the file count
    // where it started
    spark.table(table)
      .repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(side)
    spark.sql(s"DROP TABLE $table"): Unit
    spark.sql(s"ALTER TABLE $side RENAME TO $table"): Unit
  }

  /** Rewrite `table` (bucketed on `bucketCol` into `buckets`) when its
    * file count exceeds `filesFactor` × `baselineFiles` — the staged
    * table's own file count, captured at stage time. Returns whether a
    * compaction ran.
    *
    * GEOMETRY TRAP (PERF §48, VERDICT r16 #1): the post-compaction
    * file count can sit well ABOVE the staged baseline (bucket layout
    * × writer tasks — the r16 soak measured a ~3,200-file floor over
    * a 2,048-file staged baseline), so a factor over the STAGED count
    * silently shrinks the effective headroom and fires far more often
    * than `filesFactor` suggests (every ~7 batches instead of ~20 in
    * the r16 soak). Long-running admission loops should use
    * [[CompactionDial]], which measures the floor after its first
    * compaction and re-keys the threshold off it; this stateless form
    * remains for one-shot callers that compact at most once. */
  def compactAt(spark: SparkSession, table: String, baselineFiles: Int,
                filesFactor: Double, buckets: Int,
                bucketCol: String): Boolean = {
    require(baselineFiles > 0, s"baselineFiles must be > 0, got $baselineFiles")
    require(filesFactor >= 1.0, s"filesFactor must be >= 1.0, got $filesFactor")
    val files = fileCount(spark, table)
    if (files <= filesFactor * baselineFiles) false
    else {
      rewrite(spark, table, buckets, bucketCol)
      true
    }
  }
}

/** FLOOR-KEYED compaction dial (VERDICT r16 #1) — the stateful form a
  * long-running admission loop should hold, one per posting table.
  *
  * The r16 soak's own geometry finding (PERF §48): a bucketed rewrite
  * cannot land below ~(writer tasks visited × buckets touched) files,
  * and that POST-COMPACTION FLOOR sits well above the staged baseline
  * (3,2xx measured vs 2,048 staged on the 100× corpus). A threshold of
  * `filesFactor` × staged-baseline therefore leaves only
  * (factor × staged − floor) files of real headroom — 384 files ≈ one
  * firing every ~7 batches in the soak, paying a full-table rewrite
  * each time for a table that was near its floor already.
  *
  * This dial starts from the staged baseline (the only number known
  * before any compaction), and after EVERY compaction re-keys its
  * threshold off the measured post-compaction count: the headroom
  * becomes (filesFactor − 1) × actual-floor regardless of layout
  * geometry, so `filesFactor = 2` genuinely means "compact when the
  * table carries twice its compacted self". The floor tracks the
  * latest measurement (never below the staged baseline): as the
  * corpus absorbs documents and its genuine floor grows, the
  * threshold grows with it instead of strangling headroom.
  *
  * Not thread-safe — one admission loop owns one dial, the same way
  * it owns the table. */
final class CompactionDial private[streaming] (
    val table: String, stagedBaseline: Int, val filesFactor: Double,
    buckets: Int, bucketCol: String) {
  require(stagedBaseline > 0, s"stagedBaseline must be > 0, got $stagedBaseline")
  require(filesFactor >= 1.0, s"filesFactor must be >= 1.0, got $filesFactor")

  private var floorFiles: Int = stagedBaseline

  /** The file count the threshold is currently keyed off: the staged
    * baseline until the first compaction, the latest measured
    * post-compaction count after. */
  def currentFloor: Int = floorFiles

  /** Files above which the next [[maybeCompact]] fires. */
  def threshold: Double = filesFactor * floorFiles

  private[graft] def shouldFire(files: Int): Boolean = files > threshold

  /** Re-key the floor from a measured post-compaction file count —
    * latest measurement wins, clamped at the staged baseline so a
    * freak low landing can't make the dial fire on a near-compact
    * table. */
  private[graft] def rekey(postCompactionFiles: Int): Unit =
    floorFiles = math.max(stagedBaseline, postCompactionFiles)

  /** Compact when the table's file count exceeds [[threshold]]; on a
    * compaction, measure the landing and [[rekey]]. Returns whether a
    * compaction ran. */
  def maybeCompact(spark: SparkSession): Boolean = {
    val files = PostingCompaction.fileCount(spark, table)
    if (!shouldFire(files)) false
    else {
      PostingCompaction.rewrite(spark, table, buckets, bucketCol)
      rekey(PostingCompaction.fileCount(spark, table))
      true
    }
  }
}

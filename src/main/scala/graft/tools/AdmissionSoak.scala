package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamingDedup

/** Long-run streaming-admission soak (VERDICT r14 #5): a production
  * admission gate is judged on p99 batch latency and on posting-table
  * growth as the corpus ABSORBS admitted batches — medians over a
  * handful of probes (PERF §14/§36) say nothing about either.
  *
  * Drive: stage the corpus band postings once (bucketed — the 100 TB
  * layout), then run N micro-batch probes back-to-back. Every batch
  * is half near-duplicates (mutation of existing corpus docs — the
  * REJECT load) and half decorrelated new documents (the ADMIT load);
  * after each probe the admitted half's postings are APPENDED to the
  * bucketed table, so batch i+1 probes a corpus that has absorbed
  * batches 1..i — including near-dups OF EARLIER ADMISSIONS, which a
  * static-corpus measurement never exercises. Appends keep the bucket
  * layout (bucketBy metadata checked by saveAsTable), so the probe
  * join stays exchange-free on the corpus side for the whole run; the
  * growth cost is file-count, reported below.
  *
  * Per batch: wall seconds, match rows, admitted rows, cumulative
  * appended postings; every 10th batch also the posting table's file
  * bytes + file count. Summary: p50 / p90 / p99 / max latency over
  * all batches, first-10 vs last-10 mean (drift under growth), and
  * the growth curve.
  *
  * Compaction runs through the ENGINE dial
  * ([[StreamingDedup.compactionDial]], VERDICT r15 #6 / r16 #1): after
  * each absorb the floor-keyed [[graft.streaming.CompactionDial]]
  * fires when the posting table's file count exceeds `filesFactor` ×
  * its current floor (staged baseline before the first compaction,
  * measured post-compaction landing after — the r16 soak's geometry
  * finding, PERF §48) — the soak demonstrates the production trigger,
  * not a probe-side batch-counting policy.
  *
  * Usage: runMain graft.tools.AdmissionSoak <sfDir> [nBatches]
  *          [batchSize] [filesFactor]   (defaults 100, 1000, 1.5)
  */
object AdmissionSoak {

  /** Heap-sizing tripwire (VERDICT r16 #6): the r16 soak's first
    * attempt ran at -Xmx100g and showed 40–131 s batch spikes from
    * batch ~86 on — G1 at oversized heaps grows multi-GB young
    * generations whose evacuation pauses land exactly like contention
    * spikes; the identical soak at the repo-standard 16 GiB was flat
    * (max 6.3 s over 431 batches, zero organic full GCs). PERF §48.
    * Admission-gate latency contracts assume a BOUNDED heap: warn at
    * startup when the JVM exceeds this documented bound. */
  private[graft] val maxRecommendedHeapBytes: Long = 32L << 30

  private[graft] def heapWarning(maxHeapBytes: Long): Option[String] =
    if (maxHeapBytes <= maxRecommendedHeapBytes) None
    else Some(f"max heap ${maxHeapBytes / (1L << 30)} GiB exceeds the " +
      f"${maxRecommendedHeapBytes / (1L << 30)} GiB admission-workload bound: " +
      "G1 young-gen evacuation pauses at oversized heaps land as " +
      "multi-10-s batch spikes (PERF §48); run admission JVMs at ~16 GiB")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AdmissionSoak <sfDir> [nBatches] [batchSize] [filesFactor]")
    val sfDir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(100)
    val batchSize = args.lift(2).map(_.toLong).getOrElse(1000L)
    val filesFactor = args.lift(3).map(_.toDouble).getOrElse(1.5)
    heapWarning(Runtime.getRuntime.maxMemory())
      .foreach(w => println(s"[soak][warn] $w"))
    val spark = graft.GraftSession.local("admission-soak")
    import spark.implicits._

    val table = "soak_corpus_bands"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the catalog is in-memory per JVM but managed-table LOCATIONS
    // persist in the warehouse dir — a previous soak's directories
    // would fail this run's CREATE with LOCATION_ALREADY_EXISTS
    val warehouse = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Option(warehouse.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(table))
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val baselineFiles = StreamingDedup.stageCorpusBands(spark,
      graft.operators.DedupOps.minhashSignaturesOf(docs), table)
    val dial = StreamingDedup.compactionDial(table, baselineFiles, filesFactor)
    println(f"[soak] staged $table from $nDocs docs in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"($baselineFiles files; floor-keyed compaction at ${filesFactor}x, " +
      f"initial threshold ${dial.threshold}%.0f files)")
    def locationOf(name: String): java.io.File = new java.io.File(
      spark.sql(s"DESCRIBE TABLE EXTENDED $name")
        .where(col("col_name") === "Location").select("data_type")
        .collect()(0).getString(0).stripPrefix("file:"))

    def tableFootprint(name: String): (Long, Int) = {
      val fs = Option(locationOf(name).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
      (fs.map(_.length).sum, fs.length)
    }

    // deterministic batch material: batch b draws its docs by
    // pmod(doc_id, m) == b % m — disjoint slices cycle through the
    // corpus; the near-dup half keeps the text (signature-identical to
    // its source → guaranteed match load), the admit half suffixes
    // every token with the batch id (shingles disjoint from everything
    // prior → admitted, and absorbed)
    val m = math.max(1L, nDocs / math.max(batchSize, 1L))
    val latencies = new Array[Double](nBatches)
    var appended = 0L
    val curTable = table // name stays stable: compactAt swaps in place
    var compactions = 0
    val growth = scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]()
    (0 until nBatches).foreach { b =>
      val slice = docs.where(pmod(col("doc_id"), lit(m)) === lit(b % m))
      // hash-split, not parity-split: with an even modulus every id in
      // the slice shares the parity of b, so doc_id%2 made whole
      // batches all-dup or all-new (first soak run's artifact)
      val dupHalf = slice.where(pmod(xxhash64(col("doc_id")), lit(2)) === 0)
        .select((col("doc_id") + lit(10000000000L) + lit(b) * 1000000L).as("doc_id"),
          col("text"))
      val newHalf = slice.where(pmod(xxhash64(col("doc_id")), lit(2)) === 1)
        .select((col("doc_id") + lit(20000000000L) + lit(b) * 1000000L).as("doc_id"),
          concat_ws(" ",
            expr(s"transform(split(text, ' '), t -> concat(t, '~b$b'))")).as("text"))
      val batch = dupHalf.unionByName(newHalf).localCheckpoint(true)
      val s0 = System.nanoTime()
      val matches = StreamingDedup.nearDupMatchesBucketed(batch, spark, curTable)
        .localCheckpoint(true)
      val nMatches = matches.count()
      latencies(b) = (System.nanoTime() - s0) / 1e9
      // absorb: admitted docs (no match) join the corpus posting
      // table — the ENGINE absorb since r20 (one writer per touched
      // bucket, the same append the composed AdmissionPipeline runs)
      val admitted = batch
        .join(matches.select(col("new_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      val p = graft.operators.DedupOps.defaultParams
      StreamingDedup.absorbPostings(spark, admitted, curTable, 64, p)
      val nAdm = admitted.count()
      appended += nAdm * p.numBands
      if (b % 10 == 0 || b == nBatches - 1) {
        val (bytes, files) = tableFootprint(curTable)
        growth += ((b, bytes, files))
        println(f"[soak] batch $b%3d wall=${latencies(b)}%.3f s matches=$nMatches " +
          f"admitted=$nAdm postings+=$appended table=${bytes / 1e6}%.1f MB/$files files")
      } else
        println(f"[soak] batch $b%3d wall=${latencies(b)}%.3f s matches=$nMatches admitted=$nAdm")
      // COMPACTION through the engine dial (VERDICT r15 #6 / r16 #1):
      // each append adds one file per touched bucket (~64/batch), and
      // the first soak run measured the probe latency creeping +35%
      // over 100 batches as the file count grew 2048 → 5248 — per-file
      // open/footer costs, not data volume (bytes grew 14%). The
      // FLOOR-KEYED dial fires on the file-count trigger and rewrites
      // in place, then re-keys its threshold off the measured landing
      // (rejecting a landing above half the threshold — the r17
      // ratchet guard, PERF §49). A healthy rewrite lands ≤ buckets
      // files, so cadence is ~(factor−1)×staged-baseline/64 batches.
      val c0 = System.nanoTime()
      if (dial.maybeCompact(spark)) {
        compactions += 1
        val (bytes, files) = tableFootprint(curTable)
        println(f"[soak] compaction $compactions after batch $b " +
          f"${(System.nanoTime() - c0) / 1e9}%.2f s -> ${bytes / 1e6}%.1f MB/$files files " +
          f"(floor ${dial.currentFloor}, next threshold ${dial.threshold}%.0f)")
      }
      spark.catalog.clearCache()
    }
    val sorted = latencies.sorted
    def pct(p: Double) = sorted(math.min(sorted.length - 1,
      math.ceil(p * sorted.length).toInt - 1))
    val first10 = latencies.take(10).sum / math.min(10, latencies.length)
    val last10 = latencies.takeRight(10).sum / math.min(10, latencies.length)
    println(f"[soak] summary n=$nBatches batchSize=$batchSize " +
      f"p50=${pct(0.50)}%.3f p90=${pct(0.90)}%.3f p99=${pct(0.99)}%.3f " +
      f"max=${sorted.last}%.3f s first10mean=$first10%.3f last10mean=$last10%.3f " +
      s"compactions=$compactions rejectedLandings=${dial.rejectedLandings} " +
      s"disarmed=${dial.disarmed}")
    // per-100-batch windows (VERDICT r15 stretch #9): a flat global
    // p99 can hide a drifting tail when n >> 100 — the windowed
    // series is the "production admission gate" evidence shape
    latencies.grouped(100).zipWithIndex.foreach { case (w, i) =>
      if (w.length >= 20) {
        val ws = w.sorted
        def wp(p: Double) = ws(math.min(ws.length - 1,
          math.ceil(p * ws.length).toInt - 1))
        println(f"[soak] window ${i * 100}%4d..${i * 100 + w.length - 1}%4d " +
          f"p50=${wp(0.50)}%.3f p90=${wp(0.90)}%.3f p99=${wp(0.99)}%.3f s")
      }
    }
    growth.foreach { case (b, bytes, files) =>
      println(f"[soak] growth batch=$b%3d bytes=${bytes / 1e6}%.1f MB files=$files") }
    spark.stop()
  }
}

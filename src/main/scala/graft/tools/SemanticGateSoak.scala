package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamingSemanticGate

/** Sustained ABSORBING soak for the semantic admission gate
  * (VERDICT r19 #3/#9): the lexical gate earned its real-scheduler
  * latency-under-absorption certification in r19 (PERF §56);
  * `StreamingSemanticGate`'s absorb→compact loop was spec-verified
  * but never run long, so its latency curve was asserted by analogy.
  * Same drive shape as [[AdmissionSoak]], on the QUANTIZED vector
  * corpus: every batch is half near-duplicates (exact copies of
  * corpus vectors under fresh ids — cosine 1, the REJECT load) and
  * half novel vectors (the source vector sign-flipped per dimension
  * by a PER-BATCH 64-bit-mixed pattern — decorrelated from the
  * corpus AND from every other batch's absorptions, so the ADMIT
  * path stays exercised for the whole run; a small-modulus pattern
  * family here would cycle and flag later batches as dups of earlier
  * ones). Admitted vectors absorb through the layout-keeping append
  * (`countAbsorbed=false` — the loop does its own reporting counts)
  * and the shared floor-keyed [[graft.streaming.CompactionDial]]
  * fires on the int8 table's file-count trigger — #9's question is
  * exactly whether the dial's cadence math holds on this table's
  * different bytes-per-file geometry.
  *
  * Reports per-batch wall, per-100-batch p50/p90/p99 windows, growth
  * curve, compactions, rejected landings — the §56 evidence shape.
  *
  * Usage: runMain graft.tools.SemanticGateSoak <sfDir> [nBatches]
  *          [batchSize] [filesFactor] [planeSets]
  *        (defaults 100, 1000, 1.5, 1; run with
  *        SPARK_GRAFT_MASTER=local-cluster[2,4,4096] for the
  *        real-scheduler certification)
  */
object SemanticGateSoak {

  /** Deterministic per-(batch, dim) sign — two avalanche rounds, so
    * every batch's flip pattern is independent of every other's. */
  private[tools] def flipSign(b: Int, d: Int): Double = {
    var h = d * 1103515245 + b * 747796405 + 0x51ed270b
    h = (h ^ (h >>> 15)) * 0x85ebca6b
    h = h ^ (h >>> 13)
    if ((h & 1) == 0) 1.0 else -1.0
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: SemanticGateSoak <sfDir> [nBatches] [batchSize] [filesFactor] [planeSets]")
    val sfDir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(100)
    val batchSize = args.lift(2).map(_.toLong).getOrElse(1000L)
    val filesFactor = args.lift(3).map(_.toDouble).getOrElse(1.5)
    val planeSets = args.lift(4).map(_.toInt).getOrElse(1)
    AdmissionSoak.heapWarning(Runtime.getRuntime.maxMemory())
      .foreach(w => println(s"[ssoak][warn] $w"))
    val spark = graft.GraftSession.local("semantic-gate-soak")

    val table = "ssoak_corpus_vec"
    spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
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

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val nVec = emb.count()
    val t0 = System.nanoTime()
    val baselineFiles = StreamingSemanticGate.stageCorpusVectors(
      spark, emb, table, planeSets = planeSets)
    val dial = StreamingSemanticGate.compactionDial(table, baselineFiles, filesFactor)
    println(f"[ssoak] staged $nVec vecs (planeSets=$planeSets) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s ($baselineFiles files; " +
      f"floor-keyed compaction at ${filesFactor}x, threshold ${dial.threshold}%.0f)")

    def tableFootprint(): (Long, Int) = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .where(col("col_name") === "Location").select("data_type")
        .collect()(0).getString(0).stripPrefix("file:")
      val fs = Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
      (fs.map(_.length).sum, fs.length)
    }

    val m = math.max(1L, nVec / math.max(batchSize, 1L))
    val latencies = new Array[Double](nBatches)
    var absorbed = 0L
    var compactions = 0
    val growth = scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]()
    (0 until nBatches).foreach { b =>
      val slice = emb.where(pmod(col("vec_id"), lit(m)) === lit(b % m))
      val dupHalf = slice.where(pmod(xxhash64(col("vec_id")), lit(2)) === 0)
        .select((col("vec_id") + lit(10000000000L) + lit(b) * 1000000L).as("vec_id"),
          col("embedding"))
      val flips = Array.tabulate(64)(d => flipSign(b, d))
      val novelHalf = slice.where(pmod(xxhash64(col("vec_id")), lit(2)) === 1)
        .select((col("vec_id") + lit(20000000000L) + lit(b) * 1000000L).as("vec_id"),
          zip_with(col("embedding").cast("array<double>"), lit(flips),
            (x, s) => x * s).as("embedding"))
      val batch = dupHalf.unionByName(novelHalf).localCheckpoint(true)
      val s0 = System.nanoTime()
      val matches = StreamingSemanticGate.semanticMatches(
          batch, spark, table, minCos = 0.8, planeSets = planeSets)
        .localCheckpoint(true)
      val nMatches = matches.count()
      latencies(b) = (System.nanoTime() - s0) / 1e9
      val admitted = batch.join(
        matches.select(col("new_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      StreamingSemanticGate.absorb(spark, admitted, table,
        planeSets = planeSets, countAbsorbed = false): Unit
      val nAdm = admitted.count()
      absorbed += nAdm
      if (b % 10 == 0 || b == nBatches - 1) {
        val (bytes, files) = tableFootprint()
        growth += ((b, bytes, files))
        println(f"[ssoak] batch $b%3d wall=${latencies(b)}%.3f s matches=$nMatches " +
          f"admitted=$nAdm absorbed=$absorbed table=${bytes / 1e6}%.1f MB/$files files")
      } else
        println(f"[ssoak] batch $b%3d wall=${latencies(b)}%.3f s matches=$nMatches admitted=$nAdm")
      val c0 = System.nanoTime()
      if (dial.maybeCompact(spark)) {
        compactions += 1
        val (bytes, files) = tableFootprint()
        println(f"[ssoak] compaction $compactions after batch $b " +
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
    println(f"[ssoak] summary n=$nBatches batchSize=$batchSize planeSets=$planeSets " +
      f"p50=${pct(0.50)}%.3f p90=${pct(0.90)}%.3f p99=${pct(0.99)}%.3f " +
      f"max=${sorted.last}%.3f s first10mean=$first10%.3f last10mean=$last10%.3f " +
      s"compactions=$compactions rejectedLandings=${dial.rejectedLandings} " +
      s"disarmed=${dial.disarmed}")
    latencies.grouped(100).zipWithIndex.foreach { case (w, i) =>
      if (w.length >= 20) {
        val ws = w.sorted
        def wp(p: Double) = ws(math.min(ws.length - 1,
          math.ceil(p * ws.length).toInt - 1))
        println(f"[ssoak] window ${i * 100}%4d..${i * 100 + w.length - 1}%4d " +
          f"p50=${wp(0.50)}%.3f p90=${wp(0.90)}%.3f p99=${wp(0.99)}%.3f s")
      }
    }
    growth.foreach { case (b, bytes, files) =>
      println(f"[ssoak] growth batch=$b%3d bytes=${bytes / 1e6}%.1f MB files=$files") }
    spark.stop()
  }
}

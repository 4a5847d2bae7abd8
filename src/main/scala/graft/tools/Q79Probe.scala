package graft.tools

import graft.operators.DedupOps

/** q79 stage attribution: staging (prefix+doc_sets), candidate
  * generation, and the full prefix-Jaccard pipeline, each timed 3×
  * in one JVM (run-to-run deltas within a run are JIT/page-cache
  * warm-up — compare matching run indices across code versions).
  * Usage: runMain graft.tools.Q79Probe [sfDir] [stagingRoot] [modes|natural] [k];
  * pass an existing staging root so repeated probes don't re-stage; a
  * third arg `modes` skips the stage-attribution rows and runs only
  * the end-to-end mode A/B (carried/broadcast/pair + past-ceiling);
  * `natural` runs ONLY the shipped entry point with zero overrides —
  * the VERDICT r15 #4 instrument: on a >2M-doc corpus the auto
  * dispatch must choose `carried` by itself (the choice is logged by
  * candidatesDispatch). On a MakeScaleData replica corpus, pass the
  * replication factor `k` after `natural` and the probe ASSERTS the
  * pair count is exactly 256·k in-run (VERDICT r16 #3: replica shards
  * never cross-match by construction — the base sf0.1 corpus yields
  * 256 prefix-Jaccard pairs, so any other count means a broken
  * dispatch or a broken corpus, previously checked by hand). */
object Q79Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("probe_q79").toString)
    val modesOnly = args.lift(2).contains("modes")
    val naturalOnly = args.lift(2).contains("natural")
    // the replication factor `k` only means something to the natural
    // tripwire — parse it there alone, and fail fast (not silently
    // ignore) if a 4th arg is passed to any other mode (ADVICE r17)
    val expectK = args.lift(3).map { a =>
      require(naturalOnly,
        s"4th arg '$a' (replica factor k) is only valid after 'natural'")
      a.toIntOption.getOrElse(
        sys.error(s"replica factor k must be an integer, got '$a'"))
    }
    val spark = graft.GraftSession.local("q79-probe")
    graft.SparkEntry.entry(spark).count() // warm-up
    DedupOps.withStagingRoot(Some(root)) {
      def t(name: String)(b: => Any): Unit = (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = b
        println(f"[q79] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
        spark.catalog.clearCache()
      }
      if (naturalOnly) {
        t("q79 full [natural]") {
          val n = graft.SparkEntry.queries("q79_prefix_jaccard")(spark, sf).count()
          expectK.foreach { k =>
            require(n == 256L * k,
              s"pair-count tripwire FAILED: expected ${256L * k} (256*$k), got $n")
          }
          s"$n pairs" + expectK.map(k => s" == 256*$k OK").getOrElse("")
        }
        spark.stop(); return
      }
      if (modesOnly) { modeAb(spark, sf, t); spark.stop(); return }
      val t0 = System.nanoTime()
      val prefix = DedupOps.prefixTable(spark, sf, DedupOps.prefixThreshold)
      prefix.count()
      DedupOps.docSetsTable(spark, sf).count()
      println(f"[q79] stage(prefix+sets)   ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      t("candidates")(DedupOps.candidatesFrom(prefix, DedupOps.prefixThreshold).count())
      // verify breakdown over PRE-MATERIALIZED candidates: how much of
      // the verify hand-off is the hash-bound pass vs the exact confirm
      // localCheckpoint (NOT persist): the per-rep clearCache() in t()
      // would evict a persisted input between reps and re-time its
      // recompute; checkpoint blocks survive it. They are only freed
      // when the frame is GC'd, so everything measured after this
      // point runs with both pair frames resident — fine since the
      // sketch-filtered q79 path no longer builds 58.7M-row sort
      // buffers (the r14c OOM was the PRE-filter path).
      val cand = DedupOps.candidatesFrom(prefix, DedupOps.prefixThreshold)
        .localCheckpoint(true)
      val sets = DedupOps.docSetsTable(spark, sf)
      t("verify hash-pass only")(
        DedupOps.verifyHashPass(cand, sets, DedupOps.prefixThreshold).count())
      t("verify full")(
        DedupOps.verifyPrefixPairs(cand, sets, DedupOps.prefixThreshold).count())
      // r14 sketch prefilter: bound-rejection in the candidate stage,
      // before any sort-exchange — survivors feed the same SMJ verify
      val candS = DedupOps.candidatesWithSizesFrom(prefix, DedupOps.prefixThreshold)
        .localCheckpoint(true)
      t("sketch prefilter only")(
        DedupOps.sketchPrefilter(candS, sets, DedupOps.prefixThreshold).count())
      // r14b: the same bound at enumeration grain, BEFORE the pair
      // aggregate — the whole candidate stage from the staged prefix
      t("cand sketch-filtered")(
        DedupOps.candidatesSketchFiltered(prefix, sets,
          DedupOps.prefixThreshold).count())
      // r15 CARRIED shape (PERF §44): the bound inline in the
      // enumeration join via prefix-row sketches — no broadcast,
      // no ceiling
      t("cand sketch-carried")(
        DedupOps.candidatesSketchCarried(prefix,
          DedupOps.prefixThreshold).count())
      t("verify w/ prefilter")(
        DedupOps.verifyPrefixPairs(
          DedupOps.sketchPrefilter(candS, sets, DedupOps.prefixThreshold),
          sets, DedupOps.prefixThreshold).count())
      // r15 PAST-CEILING shapes (PERF §38), same JVM, same staged
      // inputs — which bucketed fallback should own q79 beyond the
      // broadcast ceiling:
      t("pairgrain sk attach")(
        DedupOps.sketchPrefilterBucketed(candS, sets,
          DedupOps.prefixThreshold).count())
      t("verify pairgrain full")(
        DedupOps.verifyPrefixPairs(
          DedupOps.sketchPrefilterBucketed(candS, sets,
            DedupOps.prefixThreshold),
          sets, DedupOps.prefixThreshold).count())
      t("verify smjbound only")(
        DedupOps.verifyPrefixPairs(cand, sets, DedupOps.prefixThreshold)
          .count())
      t("q79 full")(graft.SparkEntry.queries("q79_prefix_jaccard")(spark, sf).count())
      modeAb(spark, sf, t)
    }
    spark.stop()
  }

  private def modeAb(spark: org.apache.spark.sql.SparkSession, sf: String,
                     t: String => (=> Any) => Unit): Unit = {
    // mode A/B through the shipped entry point (default `auto` =
    // broadcast under the ceiling, carried past it)
    for (m <- Seq("carried", "broadcast", "pair")) {
      sys.props("graft.q79.sketch") = m
      try t(s"q79 full [$m]")(
        graft.SparkEntry.queries("q79_prefix_jaccard")(spark, sf).count())
      finally sys.props.remove("graft.q79.sketch"): Unit
    }
    // past the broadcast ceiling the `broadcast` mode degrades to the
    // pair-grain bucketed prefilter; `carried` is ceiling-free
    sys.props("graft.sketch.maxdocs") = "0"
    sys.props("graft.q79.sketch") = "broadcast"
    try t("q79 full past-ceiling")(
      graft.SparkEntry.queries("q79_prefix_jaccard")(spark, sf).count())
    finally {
      sys.props.remove("graft.sketch.maxdocs")
      sys.props.remove("graft.q79.sketch"): Unit
    }
  }
}

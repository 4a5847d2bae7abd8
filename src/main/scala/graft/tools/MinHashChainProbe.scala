package graft.tools

import graft.operators.DedupOps

/** Phase attribution for the minhash staging chains — the wall-
  * dominant block of stage_dedup at every measured scale. Stages each
  * phase of one preset's chain SEQUENTIALLY into a fresh root so the
  * three phase walls (signatures, LSH banding, exact verify) are
  * separable, unlike the concurrent `[stage]` chain totals. Usage:
  * runMain graft.tools.MinHashChainProbe [sfDir] [numHashes]. */
object MinHashChainProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    // flags ('bandsonly', 'verifyab') are position-independent; the
    // numHashes arg is whichever argument is numeric
    val nh = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(128)
    val p = Seq(DedupOps.defaultParams, DedupOps.scaleParams)
      .find(_.numHashes == nh)
      .getOrElse(sys.error(
        s"no preset with numHashes=$nh (have ${DedupOps.defaultParams.numHashes}" +
          s" and ${DedupOps.scaleParams.numHashes})"))
    val spark = graft.GraftSession.local("minhash-chain-probe")
    graft.SparkEntry.entry(spark).count() // warm-up
    val root = java.nio.file.Files.createTempDirectory("probe_mh").toString
    DedupOps.withStagingRoot(Some(root)) {
      def t(name: String)(b: => Any): Unit = {
        val t0 = System.nanoTime()
        val r = b
        println(f"[mh] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      }
      val bandsOnly = args.contains("bandsonly")
      if (!bandsOnly) {
        t("signatures")(DedupOps.minhashSignatures(spark, sf, p).count())
        t("lsh banding")(DedupOps.lshCandidates(spark, sf, p).count())
        t("doc_sets")(DedupOps.docSetsTable(spark, sf).count())
        t("verify")(DedupOps.jaccardVerify(spark, sf, p).count())
      }
      if (args.contains("verifyab")) {
        // LSH-verify A/B at t=0.5: sketch-bound selectivity on the
        // est-candidate flood, then plain vs prefiltered verify
        val cand = DedupOps.lshCandidates(spark, sf, p)
          .select("doc_a", "doc_b").localCheckpoint(true)
        val sets = DedupOps.docSetsTable(spark, sf)
        t("v sketch only")(
          DedupOps.sketchPrefilterBare(cand, sets,
            DedupOps.jaccardThreshold).count())
        t("v plain")(
          DedupOps.verifyPrefixPairs(cand, sets,
            DedupOps.jaccardThreshold).count())
        t("v prefiltered")(
          DedupOps.verifyPrefixPairs(
            DedupOps.sketchPrefilterBare(cand, sets, DedupOps.jaccardThreshold),
            sets, DedupOps.jaccardThreshold).count())
      }
      // banding-internal attribution (unstaged path, sig recompute is
      // a constant ~5 s in each): default guard vs exact-dup collapse
      // disabled vs whole guard off
      val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      for (i <- 1 to (if (bandsOnly) 3 else 1)) {
        t(s"band g default r$i")(
          DedupOps.lshCandidatesOf(docs, p).count())
        t(s"band no-collapse r$i")(
          DedupOps.lshCandidatesOf(docs, p,
            graft.operators.BandGuard(256, Int.MaxValue)).count())
        t(s"band guard-off r$i")(
          DedupOps.lshCandidatesOf(docs, p,
            graft.operators.BandGuard.off).count())
      }
    }
    spark.stop()
  }
}

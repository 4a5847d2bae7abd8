package graft.tools

/** Staging-cost attribution: times each staged dedup/ANN table build
  * individually on a fresh root (the per-table breakdown Bench's single
  * `stage_dedup` number hides). Usage: runMain graft.tools.StageProbe
  * [sfDir]. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("stage-probe")
    graft.SparkEntry.entry(spark).count() // warm-up, like Bench
    val root = java.nio.file.Files.createTempDirectory("probe_stage").toString
    graft.operators.DedupOps.withStagingRoot(Some(root)) {
      def t(name: String)(b: => Any): Unit = {
        val t0 = System.nanoTime(); b
        println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      t("shingles+sig8")(graft.operators.DedupOps.minhashSignatures(spark, sf).count())
      t("simhash (q23)")(graft.SparkEntry.queries("q23_simhash")(spark, sf).count())
      t("cand8 (q21)")(graft.SparkEntry.queries("q21_lsh_candidates")(spark, sf).count())
      t("sig128 (q42)")(graft.SparkEntry.queries("q42_minhash_scale")(spark, sf).count())
      t("cand128 (q43)")(graft.SparkEntry.queries("q43_lsh_scale")(spark, sf).count())
      t("ivf (q33 model)")(graft.operators.EmbeddingOps.stageIvf(spark, sf))
    }
    spark.stop()
  }
}

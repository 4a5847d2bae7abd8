package graft.tools

import graft.operators.DedupOps

/** q79 stage attribution: staging (prefix+doc_sets), candidate
  * generation, and the full prefix-Jaccard pipeline, each timed 3×
  * in one JVM (run-to-run deltas within a run are JIT/page-cache
  * warm-up — compare matching run indices across code versions).
  * Usage: runMain graft.tools.Q79Probe [sfDir] [stagingRoot]; pass an
  * existing staging root so repeated probes don't re-stage. */
object Q79Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("probe_q79").toString)
    val spark = graft.GraftSession.local("q79-probe")
    graft.SparkEntry.entry(spark).count() // warm-up
    DedupOps.withStagingRoot(Some(root)) {
      def t(name: String)(b: => Any): Unit = (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = b
        println(f"[q79] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
        spark.catalog.clearCache()
      }
      val t0 = System.nanoTime()
      val prefix = DedupOps.prefixTable(spark, sf, DedupOps.prefixThreshold)
      prefix.count()
      DedupOps.docSetsTable(spark, sf).count()
      println(f"[q79] stage(prefix+sets)   ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      t("candidates")(DedupOps.candidatesFrom(prefix, DedupOps.prefixThreshold).count())
      t("q79 full")(graft.SparkEntry.queries("q79_prefix_jaccard")(spark, sf).count())
    }
    spark.stop()
  }
}

package graft.tools

import graft.operators.DedupOps

/** One-shot plan check (PERF §44 follow-up): on the broadcast q79
  * path the staged prefix scan must NOT read the carried `sk`
  * column — prints each parquet scan's ReadSchema for the candidate
  * plan so column pruning is verifiable from the formatted plan. */
object SkPruneProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local("sk-prune-probe")
    val root = java.nio.file.Files.createTempDirectory("probe_skprune").toString
    DedupOps.withStagingRoot(Some(root)) {
      val prefix = DedupOps.prefixTable(spark, sf, DedupOps.prefixThreshold)
      prefix.count() // materialize the staged table
      val sets = DedupOps.docSetsTable(spark, sf)
      sets.count()
      for ((name, df) <- Seq(
          "broadcast" -> DedupOps.candidatesSketchFiltered(prefix, sets, DedupOps.prefixThreshold),
          "carried" -> DedupOps.candidatesSketchCarried(prefix, DedupOps.prefixThreshold))) {
        val plan = df.queryExecution.executedPlan.toString
        val scans = plan.linesIterator.filter(_.contains("FileScan")).toList
        println(s"[skprune] $name: ${scans.size} parquet scans")
        scans.foreach(s => println(s"[skprune]   ${s.trim.take(200)}"))
        // the PREFIX scans are the unbucketed ones; doc_sets scans
        // (bucketed) legitimately read sk on the broadcast path
        val prefixWithSk = scans.count(s =>
          !s.contains("doc_sets") && s.contains("sk#"))
        println(s"[skprune] $name: prefix scans reading sk = $prefixWithSk" +
          (if (name == "broadcast" && prefixWithSk > 0) "  <-- PRUNING LOST" else ""))
      }
    }
    spark.stop()
  }
}

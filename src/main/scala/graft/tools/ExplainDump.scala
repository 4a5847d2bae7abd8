package graft.tools

import graft.{GraftSession, SparkEntry}

/** Writes each query's `.explain("formatted")` to `<outDir>/<name>_<tag>.txt`
  * under bench-identical staging (fresh staged root, stageAll first), so the
  * committed plan files show the plans the bench actually times.
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> [queryName...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r21")
    val tag = args.lift(2).getOrElse("before")
    val names =
      if (args.length > 3) args.drop(3).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain-dump")
    val stageDir =
      java.nio.file.Files.createTempDirectory("graft_explain_stage").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.operators.DedupOps.withStagingRoot(Some(stageDir)) {
      graft.operators.DedupOps.stageAll(spark, sfDir): Unit
      names.foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        // queryExecution.explainString mirrors df.explain("formatted")
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[explain] wrote $outDir/${n}_$tag.txt")
      }
    }
    spark.stop()
  }
}

package graft.tools

/** stageAll wall-clock spread probe: runs the full concurrent staging
  * DAG N times, each into a FRESH root (so every run pays every
  * chain), printing per-run wall + per-chain [stage] lines. Run 1
  * includes JIT warm-up; cross-run spread is runs 2..N. Usage:
  * runMain graft.tools.StageWall [sfDir] [nRuns]. */
object StageWall {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("stage-wall")
    graft.SparkEntry.entry(spark).count() // warm-up
    (1 to n).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory(s"wall_stage$i").toString
      val t0 = System.nanoTime()
      graft.operators.DedupOps.withStagingRoot(Some(root)) {
        graft.operators.DedupOps.stageAll(spark, sf)
      }
      println(f"[wall] stageAll run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      // drop the run's staged tables from the catalog so the next
      // fresh-root run rebuilds rather than reading this run's views
      spark.sessionState.catalog.listTables("default")
        .filter(_.table.startsWith("graft_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.table}"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspector: prints the formatted physical plan of selected
  * queries — used to keep pushdown/broadcast/codegen honest.
  * Usage: runMain graft.tools.Explain <sfDir> [queryName...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

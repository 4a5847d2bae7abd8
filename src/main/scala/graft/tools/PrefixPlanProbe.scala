package graft.tools

import graft.operators.DedupOps

/** Prints the staged-prefix BUILD plan's exchanges so the cost of the
  * r15 carried-sketch aggregate is verifiable: how many exchanges the
  * prefix compute carries with and without the sk carry. */
object PrefixPlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local("prefix-plan-probe")
    DedupOps.withStagingRoot(None) {
      val df = DedupOps.prefixTable(spark, sf, DedupOps.prefixThreshold)
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Sort ") ||
        l.contains("Window") || l.contains("Aggregate")).toList
      println(s"[prefixplan] ${ex.size} exchange/sort/window/agg nodes:")
      ex.foreach(l => println("[prefixplan]  " + l.trim.take(160)))
    }
    spark.stop()
  }
}

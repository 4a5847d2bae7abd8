package graft

/** Throwaway parity driver for the q56 A/B variants (deleted after the
  * A/B lands in PERF.md): asserts the agg-top-k variant reproduces the
  * shipped query's exact rows at sf0.1. */
object Q56ParityCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("q56-parity")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shipped = operators.CorpusOps.tfidfKeywords(spark, dir)
    val variant = PerfBench.q56AggTopKPublic(spark, dir)
    val a = shipped.count()
    val b = variant.count()
    val d1 = shipped.exceptAll(variant).count()
    val d2 = variant.exceptAll(shipped).count()
    println(s"[parity] shipped=$a variant=$b except=$d1/$d2")
    assert(a == b && d1 == 0 && d2 == 0, "q56 variant mismatch")
    spark.stop()
  }
}

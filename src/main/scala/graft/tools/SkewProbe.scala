package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Adversarial-skew audit probe (VERDICT r14 #6): runs the
  * lineitem-heavy joins (q67/q68/q77) against a Zipf-skewed scale dir
  * (`MakeScaleData ... tpch zipf` — mega-supplier l_suppkey, three
  * hot l_orderkey keys owning ~10% of the fact) and reports, per
  * query:
  *
  *   - whether AQE's skew-join split FIRED (the executed adaptive
  *     plan carries `skew=true` join nodes / `AQEShuffleRead` skewed
  *     readers), and
  *   - the per-stage task shuffle-read distribution (max vs
  *     mean + 4 sigma — the SkewAuditSpec bound) WITH the split, so
  *     the "survives a skewed generator" claim is empirical, not a
  *     conf assertion.
  *
  * The skew thresholds are lowered for the probe
  * (skewedPartitionThresholdInBytes / advisoryPartitionSizeInBytes,
  * args 2–3, default 8 MiB / 4 MiB): at the 10× test scale a hot key
  * carries tens of MB where the 256 MiB production default is tuned
  * for executor-memory-sized partitions — the MECHANISM under test is
  * identical, only the cut-in point is scaled with the data. A
  * cluster-scale corpus crosses the production default the same way.
  *
  * Usage: runMain graft.tools.SkewProbe <skewedSfDir> [uniformSfDir]
  *          [thresholdMiB] [advisoryMiB]
  * With a uniformSfDir the probe runs both dirs for contrast (the
  * uniform dir should show no skew split and a tight distribution).
  */
object SkewProbe {

  private val queries =
    Seq("q67_shipping_priority", "q68_local_supplier_volume",
      "q77_dominant_shippers")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: SkewProbe <skewedSfDir> [uniformSfDir] [thresholdMiB] [advisoryMiB]")
    val skewDir = args(0)
    val uniformDir = args.lift(1).filter(_ != "-")
    val thresholdMiB = args.lift(2).map(_.toInt).getOrElse(8)
    val advisoryMiB = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.local("skew-probe")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      s"${thresholdMiB}m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      s"${advisoryMiB}m")
    // the skew FACTOR default (5×) is kept: firing must come from the
    // data's shape, not from a degenerate factor

    val reads = mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) reads.synchronized {
          reads += ((t.stageId, t.taskMetrics.shuffleReadMetrics.totalBytesRead))
        }
    }

    def drained(): Vector[(Int, Long)] = {
      var last = -1; var same = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (same < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val n = reads.synchronized(reads.size)
        if (n == last) same += 1 else { same = 0; last = n }
      }
      reads.synchronized(reads.toVector)
    }

    def runOne(tag: String, dir: String, q: String): Unit = {
      reads.synchronized(reads.clear())
      val df: DataFrame = graft.SparkEntry.queries(q)(spark, dir)
      val t0 = System.nanoTime()
      // collect() executes THIS dataset's queryExecution, so the
      // adaptive plan below is the finalized one (count() would run a
      // separate execution); all three queries aggregate to small rows
      val n = df.collect().length
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val skewLines = plan.linesIterator
        .filter(l => l.contains("skew=true") || l.contains("skewed"))
        .map(_.trim.take(120)).toSeq
      val byStage = drained().groupBy(_._1).map { case (s, v) => s -> v.map(_._2) }
        .filter { case (_, v) => v.size >= 4 && v.sum >= 1L * 1024 * 1024 }
      val worst = byStage.map { case (stage, v) =>
        val mean = v.sum.toDouble / v.size
        val sigma = math.sqrt(v.map(b => (b - mean) * (b - mean)).sum / v.size)
        (stage, v.size, v.max, mean, sigma,
          v.max <= math.max(mean + 4 * sigma, mean * 2))
      }.toSeq.sortBy(-_._3)
      println(f"[skew-probe] $tag $q rows=$n wall=$secs%.2f s " +
        s"skewSplitFired=${skewLines.nonEmpty} (${skewLines.size} plan hits)")
      skewLines.take(4).foreach(l => println(s"[skew-probe]   plan: $l"))
      worst.take(5).foreach { case (stage, nt, max, mean, sigma, ok) =>
        println(f"[skew-probe]   stage $stage tasks=$nt maxRead=${max / 1e6}%.1f MB " +
          f"mean=${mean / 1e6}%.1f MB sigma=${sigma / 1e6}%.1f MB withinBound=$ok")
      }
      spark.catalog.clearCache()
    }

    spark.sparkContext.addSparkListener(listener)
    try {
      graft.SparkEntry.entry(spark).count(): Unit // warm-up
      for (q <- queries) runOne("skewed", skewDir, q)
      uniformDir.foreach(d => for (q <- queries) runOne("uniform", d, q))
    } finally spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}

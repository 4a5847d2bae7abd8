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
      "q77_dominant_shippers", "supp_volume")

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

    // The canonical SINGLE-key fact⋈dim shape (supplier volume by
    // supplier): the declared queries join l_suppkey only as part of
    // a composite key (q68 adds c_nationkey, which SPREADS the mega
    // supplier across 25 nations — an inherent skew defense worth
    // recording), so the mega-supplier key never concentrates in one
    // partition there. This probe is where the split mechanism itself
    // must fire on the adversarial generator.
    def suppVolume(dir: String): DataFrame = {
      import graft.Tables
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("volume"))
    }

    def runOne(tag: String, dir: String, q: String): Unit = {
      reads.synchronized(reads.clear())
      val df: DataFrame =
        if (q == "supp_volume") suppVolume(dir)
        else graft.SparkEntry.queries(q)(spark, dir)
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

    // Two passes per dir (VERDICT r14 #6 / first probe run's finding):
    // with AQE free to choose, the 10× dims and filtered orders fit
    // the broadcast threshold, so every probe-side join plans
    // broadcast-hash — which is skew-IMMUNE by construction (the fat
    // side never shuffles) and the split never needs to fire. That is
    // itself the first line of defense, but at cluster scale the
    // orders/customer sides outgrow broadcast, so the `smj` pass
    // disables broadcast to force the two-sided shuffle shape those
    // joins take at 100 TB — the shape the skew split exists for.
    // Third pass: forceOptimizeSkewedJoin. The probe's bisection
    // (PERF §40) found that a downstream aggregation ON THE JOIN KEY
    // suppresses the split — the agg reuses the join's partitioning,
    // so splitting would introduce an extra shuffle and AQE declines
    // by default. That is exactly the TPC-H Q3/q67 shape (join on
    // l_orderkey, group by l_orderkey), so a hot-key corpus needs
    // `force` there: pay one extra small exchange on the agg to stop
    // one straggler task owning 30% of the join.
    def passes(tag: String, dir: String): Unit = {
      for (q <- queries) runOne(s"$tag/aqe-free", dir, q)
      val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.forceOptimizeSkewedJoin")
        .map(k => k -> spark.conf.getOption(k))
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        for (q <- queries) runOne(s"$tag/smj", dir, q)
        // the force pass goes through the ENGINE dial (VERDICT r15 #5)
        // with the probe's scaled thresholds, so the knob itself is
        // what's exercised — not a probe-local conf set
        graft.GraftSession.skewHardened(spark,
          s"${thresholdMiB}m", s"${advisoryMiB}m"): Unit
        for (q <- queries) runOne(s"$tag/smj-force", dir, q)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.SparkEntry.entry(spark).count(): Unit // warm-up
      passes("skewed", skewDir)
      uniformDir.foreach(passes("uniform", _))
    } finally spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}

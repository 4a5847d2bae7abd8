package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.operators.{BandGuard, DedupOps}

/** Dissects the staged LSH candidate build (the `cand_h8_b4` write on
  * the minhash-h8 staging chain): MinHashChainProbe shows the STAGED
  * banding phase costing several times the identical computation as a
  * pure library `count()` — this probe separates plan-compute, the
  * final global sort, and the parquet write, with a per-job wall
  * listener so the expensive jobs are attributable from the log.
  *
  * Usage: runMain graft.tools.CandBuildProbe [sfDir]
  */
object CandBuildProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("cand-build-probe")
    spark.sparkContext.addSparkListener(new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""))): Unit
      private val taskDur = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskDur.computeIfAbsent(te.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(te.taskInfo.duration): Unit
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        if (secs > 1.0) {
          val m = si.taskMetrics
          val durs = Option(taskDur.remove(si.stageId))
            .map(q => q.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted)
            .getOrElse(Array.empty[Long])
          val p50 = if (durs.nonEmpty) durs(durs.length / 2) / 1e3 else 0.0
          val mx = if (durs.nonEmpty) durs.last / 1e3 else 0.0
          println(f"    [stage] ${si.stageId}%3d ${secs}%7.2f s tasks=${si.numTasks}%-4d " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%.0fMB sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB rows=${m.shuffleWriteMetrics.recordsWritten} " +
            f"taskP50=${p50}%.1f max=${mx}%.1f gc=${m.jvmGCTime / 1e3}%.1f cpu=${m.executorCpuTime / 1e9}%.0f run=${m.executorRunTime / 1e3}%.0f")
        } else taskDur.remove(si.stageId): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val s = (System.nanoTime() - t0) / 1e9
          if (s > 1.0) println(f"    [job] ${je.jobId}%3d ${s}%7.2f s  ${desc.take(80)}")
        }
      }
    })
    def t(name: String)(b: => Any): Unit = {
      val t0 = System.nanoTime(); val r = b
      println(f"[cand] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    // after an action, dump the final adaptive plan with per-operator
    // row counts and the operator-time metrics — names the expensive node
    def metrics(df: org.apache.spark.sql.DataFrame): Unit = {
      def finalPlan(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
        val interesting = p.metrics.collect {
          case (k, m) if m.value > 0 &&
            (k.contains("Time") || k.contains("time") || k == "numOutputRows") =>
            s"$k=${m.value}"
        }.mkString(" ")
        println("      " + ("  " * d) + p.nodeName + "  " + interesting)
        p.children.foreach(walk(_, d + 1))
        p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan, d + 1)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child, d + 1)
          case _ =>
        }
      }
      walk(finalPlan(df.queryExecution.executedPlan), 0)
    }
    locally { val _ = metrics _ } // silence unused when listener path is used
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        if (durationNs > 20e9) {
          println(f"      ==== executed plan of $funcName (${durationNs / 1e9}%.1f s) ====")
          def finalPlan(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
            case other => other
          }
          def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
            val interesting = p.metrics.collect {
              case (k, m) if m.value > 0 &&
                (k.contains("Time") || k.contains("time") || k == "numOutputRows") =>
                s"$k=${m.value}"
            }.mkString(" ")
            println("      " + ("  " * d) + p.nodeName + "  " + interesting)
            p.children.foreach(walk(_, d + 1))
            p match {
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan, d + 1)
              case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child, d + 1)
              case _ =>
            }
          }
          walk(finalPlan(qe.executedPlan), 0)
        }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    val root = java.nio.file.Files.createTempDirectory("probe_cand").toString
    val out = java.nio.file.Files.createTempDirectory("probe_cand_out").toString
    DedupOps.withStagingRoot(Some(root)) {
      val p = DedupOps.defaultParams
      t("stage sig")(DedupOps.minhashSignatures(spark, sf, p).count())
      val sig = DedupOps.minhashSignatures(spark, sf, p) // staged read, no sort
      val plan = DedupOps.lshCandidatesFrom(sig, p, BandGuard.default)
      t("count (sort elided)")(plan.count())
      t("write sorted")(plan.write.mode("overwrite").parquet(s"$out/sorted"))
      val unsorted = DedupOps.lshCandidatesFrom(sig, p, BandGuard.default, sort = false)
      t("write unsorted")(
        unsorted.write.mode("overwrite").parquet(s"$out/within"))
      // the staged entry itself, fresh dir (second run: staged read)
      t("staged lshCandidates")(DedupOps.lshCandidates(spark, sf, p).count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Fleet-wide interpreter sweep (VERDICT r16 stretch #8): PERF §47
  * found the engine's hottest operator hiding a 55× CPU tax behind a
  * CORRECT plan — the LSH est/recheck expressions were
  * HigherOrderFunctions, i.e. CodegenFallback, invisible to every
  * plan-shape assertion because the PLAN was the one we wanted; only
  * the expressions inside it were interpreted. This tool makes that
  * class of defect enumerable instead of discoverable: it executes
  * every `SparkEntry` query (staged, like the bench), then walks the
  * POST-EXECUTION adaptive plan — including materialized query
  * stages and subqueries — and reports every expression that falls
  * back to interpreted eval, with the plan node it lives in.
  *
  * A hit is not automatically a defect: a CodegenFallback in a
  * one-row aggregate or a tiny dimension projection costs nothing.
  * The judgment call stays with the reader — the tool's job is that
  * no interpreted expression is UNKNOWN. Each hit is either fixed
  * (as §47 fixed the candidate build) or justified in PERF §50.
  *
  * Usage: runMain graft.tools.CodegenSweep [sfDir]
  */
object CodegenSweep {

  /** All plan nodes reachable from `p`, descending through AQE's
    * executed plan, materialized query stages (the pre-execution
    * AdaptiveSparkPlan string hides both), and cached relations'
    * build plans (ADVICE r17: an InMemoryTableScan is a leaf whose
    * relation.cachedPlan is the plan that actually computed the
    * cache — a CodegenFallback there is exactly the 'interpreted but
    * plan looks right' class this tool exists to enumerate). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec        => p +: walk(q.plan)
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      p +: walk(c.relation.cachedPlan)
    case _                        => p +: p.children.flatMap(walk)
  }

  /** Distinct `expressionClass @ planNode` fallback hits in the plan
    * tree under `root`, subqueries included. */
  private[graft] def fallbackHits(root: SparkPlan): Set[String] = {
    val plans = walk(root)
    val withSubqueries = plans ++ plans.flatMap(_.subqueries.flatMap(walk))
    withSubqueries.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case e: CodegenFallback =>
          s"${e.getClass.getSimpleName} @ ${node.getClass.getSimpleName}"
      })
    }.toSet
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local("codegen-sweep")
    graft.SparkEntry.entry(spark).count() // warm-up
    val stageDir =
      java.nio.file.Files.createTempDirectory("graft_sweep_stage").toString
    val hits = scala.collection.mutable.LinkedHashMap[String, Set[String]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    graft.operators.DedupOps.withStagingRoot(Some(stageDir)) {
      graft.operators.DedupOps.stageAll(spark, sf)
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sf)
          df.count() // execute: AQE finalizes stages only at runtime
          val found = fallbackHits(df.queryExecution.executedPlan)
          if (found.nonEmpty) {
            hits(name) = found
            println(s"[sweep] $name  INTERPRETED: ${found.toSeq.sorted.mkString("; ")}")
          } else println(s"[sweep] $name  clean")
          spark.catalog.clearCache()
        } catch { case e: Throwable =>
          errors(name) = e.toString.take(160)
          println(s"[sweep] $name  ERROR ${errors(name)}")
        }
      }
    }
    println(s"[sweep] summary: ${hits.size} queries with fallback expressions, " +
      s"${errors.size} errors, ${graft.SparkEntry.queries.size - hits.size - errors.size} clean")
    hits.foreach { case (q, s) =>
      println(s"[sweep]   $q -> ${s.toSeq.sorted.mkString("; ")}") }
    spark.stop()
  }
}

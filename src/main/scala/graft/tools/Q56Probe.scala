package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** q56 (TF-IDF keywords) attribution + A/B of exact-ranking-preserving
  * variants. The canonical form computes tf (corpus explode + agg),
  * derives df FROM tf, and joins back — the tf subtree appears twice
  * in the DAG, so the decisive question is whether Catalyst's
  * ReuseExchange dedupes the corpus-wide tf shuffle or the explode
  * runs twice. Variants measured (all bit-identical output):
  *   A  canonical (tf ⋈ df, hint-free — production form)
  *   B  tf persisted (MEMORY_AND_DISK) before the df branch
  *   C  df via count() window over term partitions (join eliminated)
  * Usage: runMain graft.tools.Q56Probe [sfDir]. */
object Q56Probe {
  private val topK = 3

  private def tfOf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  private def rank(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_ppm").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select("doc_id", "term", "tf", "df", "score_ppm", "rank")
  }

  def variantA(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.CorpusOps.tfidfKeywords(spark, sfDir)

  def variantB(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = tfOf(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    rank(tf.join(df, "term")
        .withColumn("score_ppm", expr("tf * 1000000 div df")))
      .orderBy("doc_id", "rank")
  }

  def variantC(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = tfOf(spark, sfDir)
    val wTerm = Window.partitionBy("term")
    rank(tf.withColumn("df", count(lit(1)).over(wTerm))
        .withColumn("score_ppm", expr("tf * 1000000 div df")))
      .orderBy("doc_id", "rank")
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("q56-probe")
    graft.SparkEntry.entry(spark).count() // warm-up

    // count exchange reuse on the POST-execution adaptive plan — the
    // pre-execution AdaptiveSparkPlan string hides runtime stage reuse
    val dfA = variantA(spark, sf)
    dfA.count()
    val planA = dfA.queryExecution.executedPlan.toString
    println(s"[q56] variant A post-exec reused stages: " +
      planA.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ReusedQueryStage")) +
      ", document scans: " +
      planA.linesIterator.count(l =>
        l.contains("Scan parquet") && l.contains("documents")))

    def t(name: String)(b: => DataFrame): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = b.count()
      println(f"[q56] $name%-14s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
      spark.catalog.clearCache()
    }
    t("A canonical")(variantA(spark, sf))
    t("B tf-persisted")(variantB(spark, sf))
    t("C window-df")(variantC(spark, sf))
    spark.stop()
  }
}

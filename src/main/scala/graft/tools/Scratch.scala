package graft.tools

/** Throwaway profiling harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-scratch")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val t = 0.8
    val bg = graft.operators.DedupOps.sharedShingles(spark, sfDir)
      .select("doc_id", "s")
    def tm(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    tm("bg rows")(bg.count())
    val dfs = bg.groupBy("s").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
    val prefix = bg.join(dfs, "s")
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .where(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select("doc_id", "s", "rk", "n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tm("prefix rows")(prefix.count())
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .where(col("y.n") >= lit(t) * col("x.n") &&
             col("x.n") >= lit(t) * col("y.n"))
      .where(least(col("x.n") - col("x.rk"), col("y.n") - col("y.rk")) + 1 >=
             lit(t / (1 + t)) * (col("x.n") + col("y.n")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tm("cand pairs")(cand.count())
    tm("full q79")(graft.operators.DedupOps.prefixJaccardPairs(spark, sfDir).count())
    spark.stop()
  }
}

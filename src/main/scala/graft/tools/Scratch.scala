package graft.tools

import org.apache.spark.sql.DataFrame

/** Throwaway in-JVM A/B harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-scratch")
    import org.apache.spark.sql.functions._
    // worst-case stratum skew: ONE group holding every row; 10x union
    // of sf0.1 lineitem ~ 6M rows
    val li = (1 to 10).map(_ => graft.Tables.lineitem(spark, sfDir))
      .reduce(_ unionByName _)
      .withColumn("g", lit("all"))
      .select("g", "l_quantity", "l_extendedprice")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[scratch] rows = ${li.count()}")
    val qs = Seq(0.25, 0.5, 0.75, 1.0)
    def med(name: String)(body: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body.collect(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[scratch] $name: median ${ts(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val R = graft.operators.RelationalOps
    med("discrete  l_quantity       windowed ")(R.percentilesByWindowed(li, "g", "l_quantity", qs))
    med("discrete  l_quantity       two-phase")(R.percentilesBy(li, "g", "l_quantity", qs))
    med("continuous l_extendedprice windowed ")(R.percentilesByWindowed(li, "g", "l_extendedprice", qs))
    med("continuous l_extendedprice two-phase")(R.percentilesBy(li, "g", "l_extendedprice", qs))
    med("continuous l_extendedprice bucketed ")(R.percentilesByBucketed(li, "g", "l_extendedprice", qs))
    spark.stop()
  }
}

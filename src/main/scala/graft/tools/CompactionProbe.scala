package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.{PostingCompaction, StreamingDedup}

/** Root-cause probe for the compaction-rewrite landing (VERDICT r17
  * #1): the r17 soak's floor-keyed dial ratcheted itself off because
  * every [[PostingCompaction.rewrite]] landed ~0.83 × the INPUT's file
  * count (2,572 → 13,783 files across seven compactions while bytes
  * grew 26%) instead of ~`buckets`, and `rekey` adopted each inflated
  * landing as the new floor. This probe reproduces the landing on a
  * small posting table built exactly the soak's way (staged bucketed
  * write + N small bucketed appends) and A/Bs the rewrite forms — the
  * defective pre-r18 form, the pinned bucketed scan (shipped), a
  * path-based read that keeps the repartition, and the shipped
  * [[PostingCompaction.rewrite]] itself — so the fix stays measured,
  * not guessed. PERF §49 records the run and the root cause (the
  * elided repartition + reverted bucketed scan).
  *
  * Usage: runMain graft.tools.CompactionProbe [nAppends] [buckets]
  */
object CompactionProbe {

  def main(args: Array[String]): Unit = {
    val nAppends = args.lift(0).map(_.toInt).getOrElse(40)
    val buckets = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.local("compaction-probe")
    import spark.implicits._
    val table = "probe_postings"
    spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    spark.sql(s"DROP TABLE IF EXISTS ${table}__compacting"): Unit
    val warehouse = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Option(warehouse.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(table))
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }

    def docsFrom(ids: Range, tag: String): DataFrame =
      ids.toDF("i").select(col("i").cast("long").as("doc_id"),
        concat_ws(" ", (0 until 30).map(w =>
          concat(lit(s"w$tag"), pmod(col("i") * (w + 7), lit(997)))): _*).as("text"))

    val p = graft.operators.DedupOps.defaultParams
    def postingsOf(docs: DataFrame): DataFrame =
      graft.operators.DedupOps.minhashSignaturesOf(docs)
        .select(col("doc_id").as("corpus_id"),
          array((0 until p.numHashes).map(i => col(s"mh$i")): _*).as("__sig"))
        .withColumn("cbk", explode(expr(graft.operators.DedupOps.bandArrayExpr(p))))
        .select(col("cbk"), col("corpus_id"), col("__sig").as("__csig"))

    val staged = StreamingDedup.stageCorpusBands(spark,
      graft.operators.DedupOps.minhashSignaturesOf(docsFrom(0 until 2000, "c")),
      table, buckets)
    println(s"[cprobe] staged $table: $staged files (buckets=$buckets)")

    (0 until nAppends).foreach { b =>
      postingsOf(docsFrom(100000 + b * 100 until 100000 + b * 100 + 100, s"a$b"))
        .write.mode("append")
        .bucketBy(buckets, "cbk").sortBy("cbk")
        .format("parquet").saveAsTable(table)
    }
    val before = PostingCompaction.fileCount(spark, table)
    println(s"[cprobe] after $nAppends appends: $before files")

    // A/B the candidate rewrite forms on copies of the inflated table.
    // Variant A (shipped pre-r18): spark.table + repartition — the
    // repartition exchange is elided against the bucketed scan's
    // claimed HashPartitioning, then DisableUnnecessaryBucketedScan
    // reverts the scan to split-based (~input-files/32 partitions), so
    // each task writes one file per bucket → landing ∝ input files.
    // Variant B: pin the bucketed scan (autoBucketedScan=false around
    // the read) — one partition per bucket, zero exchange, one file
    // per task. Variant C: read the parquet files path-wise (no bucket
    // metadata → no claimed partitioning → the repartition survives).
    def copyTo(dst: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $dst"): Unit
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      spark.table(table).write.mode("overwrite")
        .bucketBy(buckets, "cbk").sortBy("cbk")
        .format("parquet").saveAsTable(dst)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      // re-inflate the copy to `before` files via the same appends
      (0 until nAppends).foreach { b =>
        postingsOf(docsFrom(100000 + b * 100 until 100000 + b * 100 + 100, s"a$b"))
          .write.mode("append")
          .bucketBy(buckets, "cbk").sortBy("cbk")
          .format("parquet").saveAsTable(dst)
      }
    }

    def run(tag: String)(body: => Unit): Unit = {
      // recompute the input count here, not from `before` (ADVICE r18):
      // variants B/C/D run on tables rebuilt by copyTo (compacted to
      // ~buckets files then re-appended), whose actual file count can
      // differ from the original inflated table's
      val input = PostingCompaction.fileCount(spark, table)
      val t0 = System.nanoTime()
      body
      println(f"[cprobe] $tag landed ${PostingCompaction.fileCount(spark, table)} files " +
        f"(buckets=$buckets, input=$input) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    run("A spark.table+repartition") {
      val side = table + "__compacting"
      spark.sql(s"DROP TABLE IF EXISTS $side"): Unit
      spark.table(table)
        .repartition(buckets, col("cbk"))
        .write.mode("overwrite")
        .bucketBy(buckets, "cbk").sortBy("cbk")
        .format("parquet").saveAsTable(side)
      spark.sql(s"DROP TABLE $table"): Unit
      spark.sql(s"ALTER TABLE $side RENAME TO $table"): Unit
    }

    copyTo(table + "_b"); spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    spark.sql(s"ALTER TABLE ${table}_b RENAME TO $table"): Unit
    run("B pinned bucketed scan") {
      val side = table + "__compacting"
      spark.sql(s"DROP TABLE IF EXISTS $side"): Unit
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try spark.table(table)
        .repartition(buckets, col("cbk"))
        .write.mode("overwrite")
        .bucketBy(buckets, "cbk").sortBy("cbk")
        .format("parquet").saveAsTable(side)
      finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql(s"DROP TABLE $table"): Unit
      spark.sql(s"ALTER TABLE $side RENAME TO $table"): Unit
    }

    copyTo(table + "_c"); spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    spark.sql(s"ALTER TABLE ${table}_c RENAME TO $table"): Unit
    run("C path read+repartition") {
      val side = table + "__compacting"
      spark.sql(s"DROP TABLE IF EXISTS $side"): Unit
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .where(col("col_name") === "Location").select("data_type")
        .collect()(0).getString(0)
      spark.read.parquet(loc)
        .repartition(buckets, col("cbk"))
        .write.mode("overwrite")
        .bucketBy(buckets, "cbk").sortBy("cbk")
        .format("parquet").saveAsTable(side)
      spark.sql(s"DROP TABLE $table"): Unit
      spark.sql(s"ALTER TABLE $side RENAME TO $table"): Unit
    }

    // D: the SHIPPED rewrite — must match variant B's landing
    copyTo(table + "_d"); spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    spark.sql(s"ALTER TABLE ${table}_d RENAME TO $table"): Unit
    run("D shipped rewrite") {
      PostingCompaction.rewrite(spark, table, buckets, "cbk")
    }
    spark.stop()
  }
}

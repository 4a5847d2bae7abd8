package graft

import org.apache.spark.sql.functions._

/** In-JVM perf harness (TEST scope — never ships in the library jar;
  * replaces the round-8 `tools/Scratch` throwaway). Sandbox wall-clock
  * varies ~1.7× run-to-run, so regressions are only ever concluded
  * from medians measured inside ONE JVM, ideally A/B-ing two variants
  * back-to-back (the q28/q40 noise-ruling discipline, PERF.md §10).
  *
  * Usage:
  *   sbt "Test/runMain graft.PerfBench <sfDir> <reps> <name,...>"
  * where each name is a SparkEntry query key or one of the
  * experimental variants below (e.g. `q79_r8_unstaged` — the round-8
  * shipped shape that recomputed the prefix subtree per reference).
  * Staging goes to a fresh temp dir; `stage_dedup` is timed first
  * when any staged query is requested (pass `nostage` to skip).
  */
object PerfBench {

  /** Round-8 q79 shape: prefix frame rebuilt per self-join side and
    * the shingle sets re-derived for verify — kept here as the A/B
    * baseline for the staged prefix/doc_sets path. */
  private def q79r8(spark: org.apache.spark.sql.SparkSession,
                    sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = operators.DedupOps.prefixThreshold
    val bg = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(functions.ShingleHashes.shingle_hashes(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh.s").as("s"))
    val dfs = bg.groupBy("s").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
    val prefix = bg.join(dfs, "s")
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .where(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select("doc_id", "s", "rk", "n")
    val larger = col("x.n") > col("y.n") ||
      (col("x.n") === col("y.n") && col("x.doc_id") > col("y.doc_id"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && larger &&
        col("y.rk") <= col("y.n") - ceil(lit(2 * t / (1 + t)) * col("y.n")) + 1)
      .where(col("x.n") <= col("y.n") / t)
      .where(least(col("x.n") - col("x.rk"), col("y.n") - col("y.rk")) + 1 >=
             lit(t / (1 + t)) * (col("x.n") + col("y.n")))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
              greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    val sets = bg.groupBy("doc_id")
      .agg(collect_list("s").as("ss"), count(lit(1)).as("n"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ss").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ss").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        round(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")), 6))
      .where(col("jaccard") >= t)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Round-8 LSH-verify shape: exploded candidates x shingles overlap
    * join (re-shuffles the full shingle table per verified-table
    * build) — the A/B baseline for routing the staging chains and q61
    * through the two-stage hash-bound verify. */
  private def lshVerifyR8(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): org.apache.spark.sql.DataFrame = {
    val D = operators.DedupOps
    val cand = D.lshCandidates(spark, sfDir, D.defaultParams)
      .select("doc_a", "doc_b")
    val bg = D.sharedShingles(spark, sfDir)
    val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cand
      .join(bg.as("__p"), col("__p.doc_id") === col("doc_a"))
      .join(bg.as("__q"), col("__q.doc_id") === col("doc_b") &&
        col("__q.s") === col("__p.s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")), 6))
      .where(col("jaccard") >= D.jaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The round-9 replacement measured against [[lshVerifyR8]]: same
    * staged candidates, verify via sorted-int64 hash upper bound +
    * exact confirm over the staged doc_sets table. */
  private def lshVerifyR9(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): org.apache.spark.sql.DataFrame = {
    val D = operators.DedupOps
    D.verifyPrefixPairs(
      D.lshCandidates(spark, sfDir, D.defaultParams).select("doc_a", "doc_b"),
      D.docSetsTable(spark, sfDir), D.jaccardThreshold)
  }

  /** q80 heavy phase, built-in shape: every window string assembled
    * via concat_ws before hashing — the A/B baseline for the native
    * one-pass SpanHashes expression. Output (candidate hash count) is
    * equivalent; only the hash function differs (xxhash64 vs M61
    * poly), which doesn't change the work shape. */
  private def q80Phase1Builtin(spark: org.apache.spark.sql.SparkSession,
                               sfDir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 8)
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 7),
          |  i -> xxhash64(concat_ws(' ', slice(toks, i, 8))))) AS sh"""
          .stripMargin)
      .groupBy("sh").agg(countDistinct("doc_id").as("df"))
      .where(col("df") >= 2).select("sh")

  /** q80 heavy phase, shipped shape: native one-pass window hashes. */
  private def q80Phase1Native(spark: org.apache.spark.sql.SparkSession,
                              sfDir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(functions.SpanHashes.span_hashes(col("text"), 8)).as("sh"))
      .groupBy("sh").agg(countDistinct("doc_id").as("df"))
      .where(col("df") >= 2).select("sh")

  /** The staged `doc_sets` table re-read as PLAIN parquet: byte-identical
    * files, bucket metadata dropped — the A/B baseline isolating what the
    * doc_id bucketing (r11, `Staging.bucketedReadThrough`) buys the verify
    * attach joins. Requires staging on (stageAll has run). */
  private def docSetsUnbucketed(spark: org.apache.spark.sql.SparkSession,
                                sfDir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(operators.Staging.tableDir(
      operators.Staging.root.get, sfDir, "doc_sets"))

  private def q79Verify(spark: org.apache.spark.sql.SparkSession,
                        sfDir: String, sets: org.apache.spark.sql.DataFrame) = {
    val D = operators.DedupOps
    val t = D.prefixThreshold
    D.verifyPrefixPairs(
      D.candidatesFrom(D.prefixTable(spark, sfDir, t), t), sets, t)
  }

  /** q56 A/B variants (verdict r10 #8, stretch). The shipped query's
    * df join is hint-free (AQE broadcasts while the vocabulary fits).
    * A bloom filter on the join is pointless here — df DERIVES from tf,
    * so the term sets are identical by construction; the measurable
    * alternatives are (a) forcing the broadcast vs letting AQE decide
    * and (b) replacing the per-doc row_number window (repartition +
    * sort) with a collect-and-slice aggregate (partial-agg shuffle, no
    * sort). Both keep the exact (score desc, term asc) top-k ranking. */
  private def q56Variant(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String, bcastDf: Boolean,
                         aggTopK: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df0 = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val df = if (bcastDf) broadcast(df0) else df0
    val scored = tf.join(df, "term")
      .withColumn("score_ppm", expr("tf * 1000000 div df"))
    if (!aggTopK) {
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_ppm").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score_ppm", "rank")
        .orderBy("doc_id", "rank")
    } else
      scored
        .groupBy("doc_id")
        .agg(slice(array_sort(collect_list(struct(
          (-col("score_ppm")).as("negScore"), col("term"), col("tf"),
          col("df"), col("score_ppm")))), 1, 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")))
        .select(col("doc_id"), col("col.term"), col("col.tf"),
          col("col.df"), col("col.score_ppm"),
          (col("pos") + 1).as("rank"))
        .orderBy("doc_id", "rank")
  }

  private[graft] def q56AggTopKPublic(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    q56Variant(spark, sfDir, bcastDf = true, aggTopK = true)

  private val variants: Map[String,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("q79_r8_unstaged" -> (q79r8 _),
      "q56_shipped" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        q56Variant(s, d, bcastDf = false, aggTopK = false)),
      "q56_bcast_df" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        q56Variant(s, d, bcastDf = true, aggTopK = false)),
      "q56_agg_topk" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        q56Variant(s, d, bcastDf = true, aggTopK = true)),
      // bucketed-vs-plain doc_sets A/B (verdict r10 #3): same staged
      // files, same candidates; only the bucket metadata differs, so
      // the delta is exactly the doc_sets-side exchange of the attach
      "q79_verify_bucketed" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        q79Verify(s, d, operators.DedupOps.docSetsTable(s, d))),
      "q79_verify_unbucketed" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        q79Verify(s, d, docSetsUnbucketed(s, d))),
      "q60_verify_bucketed" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        operators.DedupOps.containmentVerify(
          operators.DedupOps.containCandTable(s, d),
          operators.DedupOps.docSetsTable(s, d))),
      "q60_verify_unbucketed" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        operators.DedupOps.containmentVerify(
          operators.DedupOps.containCandTable(s, d),
          docSetsUnbucketed(s, d))),
      "lsh_verify_r8" -> (lshVerifyR8 _),
      "lsh_verify_r9" -> (lshVerifyR9 _),
      "q80_phase1_builtin" -> (q80Phase1Builtin _),
      "q80_phase1_native" -> (q80Phase1Native _),
      // the LOW-threshold regime (t=0.5): prefix = half of every doc,
      // the self-join explodes — measured to re-pin the division of
      // labor (LSH for 0.5, prefix join for 0.8+) at scale
      "q79_t05" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
        operators.DedupOps.prefixJaccardPairsOf(
          Tables.documents(s, dir).select("doc_id", "text"), 0.5)))

  /** Streaming-admission latency curve (verdict r8 #6): stage the
    * bucketed corpus band posting table once, then measure the
    * per-micro-batch probe at batch sizes ~1k and ~10k docs. The
    * batch frames are localCheckpoint-ed first so the measurement is
    * the signature + bucket-probe join, not the corpus re-scan that
    * carves the batch out. */
  private def streamAdmission(spark: org.apache.spark.sql.SparkSession,
                              sfDir: String, reps: Int): Unit = {
    val sig = operators.DedupOps.minhashSignatures(spark, sfDir)
    val table = "perf_corpus_bands"
    val t0 = System.nanoTime()
    streaming.StreamingDedup.stageCorpusBands(spark, sig, table)
    println(f"[perf] stage_corpus_bands: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val nDocs = Tables.documents(spark, sfDir).count()
    Seq(1000L, 10000L).foreach { size =>
      val m = math.max(1L, nDocs / size)
      val batch = Tables.documents(spark, sfDir)
        .where(pmod(col("doc_id"), lit(m)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(9000000000L))
        .select("doc_id", "text")
        .localCheckpoint(true)
      val runs = (1 to reps).map { _ =>
        val s0 = System.nanoTime()
        val matches = streaming.StreamingDedup
          .nearDupMatchesBucketed(batch, spark, table).count()
        ((System.nanoTime() - s0) / 1e9, matches)
      }
      val med = runs.map(_._1).sorted.apply(runs.size / 2)
      println(f"[perf] admission batch=${batch.count()} (target $size): " +
        f"median $med%.3f s of $reps, matches=${runs.head._2} " +
        runs.map(r => f"${r._1}%.3f").mkString("[", ", ", "]"))
    }
  }

  /** Span-gate latency curve: stage the corpus's distinct span hashes
    * once (bucketed), then measure the per-micro-batch gate at ~1k and
    * ~10k docs. Same discipline as [[streamAdmission]]. */
  private def spanGate(spark: org.apache.spark.sql.SparkSession,
                       sfDir: String, reps: Int): Unit = {
    val table = "perf_corpus_spans"
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
    val t0 = System.nanoTime()
    streaming.StreamingSpanGate.stageCorpusSpans(spark, corpus, table)
    println(f"[perf] stage_corpus_spans: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val nDocs = corpus.count()
    Seq(1000L, 10000L).foreach { size =>
      val m = math.max(1L, nDocs / size)
      val batch = corpus.where(pmod(col("doc_id"), lit(m)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(9000000000L))
        .localCheckpoint(true)
      val runs = (1 to reps).map { _ =>
        val s0 = System.nanoTime()
        val flagged = streaming.StreamingSpanGate
          .spanMatches(batch, spark, table)
          .where(col("matched_spans") > 0).count()
        ((System.nanoTime() - s0) / 1e9, flagged)
      }
      val med = runs.map(_._1).sorted.apply(runs.size / 2)
      println(f"[perf] span_gate batch=${batch.count()} (target $size): " +
        f"median $med%.3f s of $reps, flagged=${runs.head._2} " +
        runs.map(r => f"${r._1}%.3f").mkString("[", ", ", "]"))
    }
  }

  /** Sustained-ingest drive for the span gate (verdict r10 #7): stage
    * the corpus span posting once, then run `triggers` REAL micro-batch
    * triggers of ~2k docs each through a MemoryStream + foreachBatch
    * query — the deployment shape — recording per-trigger wall time
    * and the streaming state-store row count. Flat trigger times +
    * zero state rows = no per-trigger growth. */
  private def spanGateSustained(spark: org.apache.spark.sql.SparkSession,
                                sfDir: String, triggers: Int): Unit = {
    import spark.implicits._
    val table = "perf_corpus_spans_sustained"
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
    val t0 = System.nanoTime()
    streaming.StreamingSpanGate.stageCorpusSpans(spark, corpus, table)
    println(f"[perf] stage_corpus_spans: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
      f"(${spark.table(table).count()} distinct corpus spans)")
    val nDocs = corpus.count()
    val m = math.max(1L, nDocs / 2000L)
    val batchTexts = corpus.where(pmod(col("doc_id"), lit(m)) === 0)
      .as[(Long, String)].collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val times = scala.collection.mutable.ArrayBuffer[Double]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        streaming.StreamingSpanGate.spanMatches(b, spark, table).count(): Unit
      }.start()
    try {
      (1 to triggers).foreach { i =>
        val s0 = System.nanoTime()
        mem.addData(batchTexts.toSeq.map { case (id, t) =>
          (id + i * 100000000L, t) }: _*)
        q.processAllAvailable()
        times += (System.nanoTime() - s0) / 1e9
      }
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).sum
      def med3(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      println(f"[perf] span_gate_sustained: $triggers triggers x " +
        f"${batchTexts.length} docs, state_rows_total=$stateRows, " +
        f"first3_med=${med3(times.take(3).toSeq)}%.3f s " +
        f"last3_med=${med3(times.takeRight(3).toSeq)}%.3f s " +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("q40_asof_join"))
    val noStage = args.contains("nostage")
    val spark = GraftSession.local("graft-perfbench")
    val stageDir =
      java.nio.file.Files.createTempDirectory("graft_perf_stage").toString
    operators.DedupOps.withStagingRoot(
        if (noStage) None else Some(stageDir)) {
      try SparkEntry.entry(spark).count() // warm-up: JIT + codegen
      catch { case e: Throwable => println(s"[perf] warmup: $e") }
      if (!noStage) {
        val t0 = System.nanoTime()
        operators.DedupOps.stageAll(spark, sfDir)
        println(f"[perf] stage_dedup: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      names.filterNot(_ == "nostage").foreach {
        case "stream_admission" => streamAdmission(spark, sfDir, reps)
        case "span_gate" => spanGate(spark, sfDir, reps)
        case "span_gate_sustained" =>
          spanGateSustained(spark, sfDir, math.max(20, reps))
        case "sig128_ab" =>
          // Hypothesis: the h128 signature aggregate (128 min-agg
          // columns) exceeds spark.sql.codegen.maxFields=100, so
          // HashAggregate leaves whole-stage codegen and the staging
          // critical path pays interpreted evaluation. A/B the same
          // plan under 100 vs 256.
          val sh = operators.DedupOps
            .shinglesOf(Tables.documents(spark, sfDir))
            .select("doc_id", "h")
          def sig(n: Int) = {
            val P = 2305843009213693951L
            val aggs = (0 until n).map(i =>
              min(expr(s"(${2 * i + 1234567} * h + ${i * 987654 + 3}) % $P"))
                .as(s"mh$i"))
            sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
          }
          for (mf <- Seq("100", "256", "100"); n <- Seq(128)) {
            spark.conf.set("spark.sql.codegen.maxFields", mf)
            val runs = (1 to reps).map { _ =>
              val t0 = System.nanoTime(); sig(n).count()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            println(f"[perf] sig$n maxFields=$mf median ${runs(runs.size / 2)}%.3f s")
          }
        case "h128_probe" =>
          // Stage-by-stage wall time of the minhash-h128 chain (the
          // 100× staging critical path): sig write, band self-join +
          // cand write, hash-bound verify + write. Own fresh staging
          // root (run with `nostage` so main doesn't prestage).
          val D = operators.DedupOps
          val p = D.scaleParams
          val dir = java.nio.file.Files
            .createTempDirectory("graft_h128_probe").toString
          D.withStagingRoot(Some(dir)) {
            def tm(n: String)(b: => Long): Unit = {
              val t0 = System.nanoTime(); val x = b
              println(f"[perf] h128 $n: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$x)")
            }
            tm("shingles")(D.sharedShingles(spark, sfDir).count())
            tm("sig")(D.minhashSignatures(spark, sfDir, p).count())
            // sub-stages of the candidate build, cumulative (each
            // recomputes its prefix; deltas attribute the cost)
            val sig = D.minhashSignatures(spark, sfDir, p)
            val arr = sig.select(col("doc_id"),
              array((0 until p.numHashes).map(i => col(s"mh$i")): _*).as("__sig"))
            tm("  arr")(arr.count())
            val fp = arr.withColumn("__fp", xxhash64(col("__sig")))
            import org.apache.spark.sql.expressions.Window
            val wfp = Window.partitionBy("__fp")
            tm("  guard-window")(fp
              .withColumn("__gmin", min(col("doc_id")).over(wfp))
              .withColumn("__repv", min_by(col("__sig"), col("doc_id")).over(wfp))
              .count())
            val hashExpr =
              s"""transform(sequence(0, ${p.numBands - 1}), b ->
                 |  xxhash64(b, slice(__sig, b * ${p.rowsPerBand} + 1, ${p.rowsPerBand})))"""
                .stripMargin
            val bandsS = arr.select(col("doc_id"),
              explode(expr(D.bandArrayExpr(p))).as("bk"))
            tm("  bands-string")(bandsS.count())
            val bands0 = arr.select(col("doc_id"),
              explode(expr(hashExpr)).as("bk"))
            tm("  bands-hash")(bands0.count())
            tm("  band-join")(bands0.as("x").join(bands0.as("y"),
                col("x.bk") === col("y.bk") &&
                col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
              .count())
            tm("  band-join-distinct")(bands0.as("x").join(bands0.as("y"),
                col("x.bk") === col("y.bk") &&
                col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
              .distinct().count())
            val elems = (1 to p.rowsPerBand)
              .map(j => s"element_at(__sig, b * ${p.rowsPerBand} + $j)")
              .mkString(", ")
            val bandsE = arr.select(col("doc_id"), explode(expr(
              s"transform(sequence(0, ${p.numBands - 1}), b -> xxhash64(b, $elems))"))
              .as("bk"))
            tm("  bands-elem")(bandsE.count())
            val candD = bandsE.as("x").join(bandsE.as("y"),
                col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
              .distinct()
            tm("  est-attach")(candD
              .join(arr.select(col("doc_id").as("doc_a"), col("__sig").as("__sig_a")), "doc_a")
              .join(arr.select(col("doc_id").as("doc_b"), col("__sig").as("__sig_b")), "doc_b")
              .count())
            tm("cand")(D.lshCandidates(spark, sfDir, p).count())
            println("[perf] cand plan:\n" +
              D.lshCandidates(spark, sfDir, p).queryExecution.executedPlan
                .toString.linesIterator
                .filter(l => l.contains("Exchange") || l.contains("Scan") ||
                  l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin"))
                .map(_.take(140)).mkString("\n"))
            tm("doc_sets")(D.docSetsTable(spark, sfDir).count())
            tm("verified")(D.jaccardVerify(spark, sfDir, p).count())
          }
        case "q79_probe" =>
          def tm(n: String)(b: => Long): Unit = {
            val t0 = System.nanoTime(); val x = b
            println(f"[perf] q79 $n: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$x)")
          }
          val D = operators.DedupOps
          val t = D.prefixThreshold
          tm("prefix read")(D.prefixTable(spark, sfDir, t).count())
          val p = D.prefixTable(spark, sfDir, t)
          val cand = D.candidatesFrom(p, t)
          tm("cand")(cand.count())
          tm("sets read")(D.docSetsTable(spark, sfDir).count())
          tm("verify")(D.verifyPrefixPairs(cand,
            D.docSetsTable(spark, sfDir), t).count())
          tm("full")(SparkEntry.queries("q79_prefix_jaccard")(spark, sfDir).count())
        case name =>
        val fn = variants.getOrElse(name, SparkEntry.queries(name))
        val runs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = runs(runs.size / 2)
        println(f"[perf] $name: median $med%.3f s of $reps " +
          runs.map(r => f"$r%.3f").mkString("[", ", ", "]"))
      }
    }
    spark.stop()
  }
}

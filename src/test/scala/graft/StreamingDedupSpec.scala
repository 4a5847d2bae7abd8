package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("narrow per-row signature is bit-identical to the batch signature table") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val narrow = StreamingDedup.withSignature(docs)
      .select(col("doc_id"), col("__sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val batch = DedupOps.minhashSignaturesOf(docs)
    val p = DedupOps.defaultParams
    val wide = batch.select(col("doc_id"),
        array((0 until p.numHashes).map(i => col(s"mh$i")): _*))
      .as[(Long, Seq[Long])].collect().toMap
    assert(narrow.keySet == wide.keySet,
      "narrow path must keep exactly the docs the batch path signs")
    narrow.foreach { case (d, sig) =>
      assert(sig == wide(d), s"doc $d narrow signature diverges from batch")
    }
  }

  test("narrow signature drops only sub-bigram docs and never shuffles") {
    val tiny = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val out = StreamingDedup.withSignature(tiny)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow signature shuffled:\n$plan")
  }

  test("stream-static admission flags near-dups in flight, passes novel docs silently") {
    // static corpus: two docs
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (200L, "an entirely different corpus document about spark plans")
    ).toDF("doc_id", "text")
    val corpusSig = DedupOps.minhashSignaturesOf(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusSig.count()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupMatches(
        mem.toDF().toDF("doc_id", "text"), corpusSig)
      .writeStream.format("memory").queryName("sd_matches")
      .outputMode("append").start()
    try {
      mem.addData(
        // near-dup of corpus doc 100 (one word changed)
        (1L, "the quick brown fox leaps over the lazy dog again and again"),
        // novel document: must not match anything
        (2L, "completely unrelated text with no shared shingles at all"),
        // byte-identical to corpus doc 200: est_jaccard must be 1.0
        (3L, "an entirely different corpus document about spark plans"))
      q.processAllAvailable()
      val out = spark.table("sd_matches")
        .select("new_id", "corpus_id", "est_jaccard")
        .as[(Long, Long, Double)].collect()
      val byNew = out.groupBy(_._1)
      assert(byNew.contains(1L), s"near-dup not flagged: ${out.mkString(",")}")
      assert(byNew(1L).forall(_._2 == 100L))
      assert(!byNew.contains(2L), "novel doc must not match")
      assert(byNew(3L).exists(m => m._2 == 200L && m._3 == 1.0),
        s"exact twin must match with est 1.0: ${out.mkString(",")}")

      // stateful dedup: replaying the same docs must not re-emit pairs
      val before = spark.table("sd_matches").count()
      mem.addData((1L, "the quick brown fox leaps over the lazy dog again and again"))
      q.processAllAvailable()
      assert(spark.table("sd_matches").count() == before,
        "recurring pair re-emitted despite stateful dedup")
    } finally {
      q.stop()
      corpusSig.unpersist()
      spark.sql("DROP TABLE IF EXISTS sd_matches")
    }
  }

  test("bucketed corpus posting table: identical matches, zero corpus-side exchange") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = docs.where(expr("doc_id % 10 = 7"))
    val corpusSig = DedupOps.minhashSignaturesOf(
      docs.where(expr("NOT (doc_id % 10 = 7)")))
    val table = "sd_corpus_bands"
    StreamingDedup.stageCorpusBands(spark, corpusSig, table, buckets = 8)
    try {
      val bucketed = StreamingDedup.nearDupMatchesBucketed(batch, spark, table)
      val plain = StreamingDedup.nearDupMatches(batch, corpusSig)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("new_id", "corpus_id", "est_jaccard")
          .as[(Long, Long, Double)].collect().toSet
      assert(pairs(bucketed) == pairs(plain),
        "bucketed probe must reproduce the plain stream-static matches")
      // plan shape: force the sort-merge path (a broadcast would hide
      // the property under test) and require the corpus scan to be
      // bucket-aligned with NO exchange anywhere on its side — only
      // the probe (micro-batch) side may shuffle
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "-1")
      try {
        val plan = StreamingDedup.nearDupMatchesBucketed(batch, spark, table)
          .queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"),
          s"corpus posting scan must read its buckets:\n$plan")
        // the probe (stream) side shuffles into the bucket count; the
        // corpus side must join IN PLACE — no exchange on its key ever
        // (the only other exchange is dropDuplicates over the already-
        // filtered match set, which is fine at any corpus size)
        assert("Exchange hashpartitioning\\(bk#".r.findAllIn(plan).size == 1,
          s"probe side must shuffle to the corpus bucketing:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning(cbk"),
          s"corpus side must never be exchanged:\n$plan")
      } finally spark.conf.set(key, prev)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compaction dial fires on the file-count trigger, preserves matches and layout (r16)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = docs.where(expr("doc_id % 10 = 7"))
    val corpusSig = DedupOps.minhashSignaturesOf(
      docs.where(expr("NOT (doc_id % 10 = 7)")))
    val table = "sd_compact_bands"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val baseline = StreamingDedup.stageCorpusBands(spark, corpusSig, table, buckets = 8)
    try {
      assert(baseline > 0, "stageCorpusBands must report the staged file count")
      // absorb two admitted batches, the way the admission loop appends
      val p = DedupOps.defaultParams
      (1 to 2).foreach { i =>
        val extraSig = DedupOps.minhashSignaturesOf(
          docs.where(expr(s"doc_id % 10 = $i"))
            .select((col("doc_id") + lit(1000000L * i)).as("doc_id"), col("text")))
        extraSig.select(col("doc_id").as("corpus_id"),
            array((0 until p.numHashes).map(j => col(s"mh$j")): _*).as("__sig"))
          .withColumn("cbk", explode(expr(DedupOps.bandArrayExpr(p))))
          .select(col("cbk"), col("corpus_id"), col("__sig").as("__csig"))
          .write.mode("append").bucketBy(8, "cbk").sortBy("cbk")
          .format("parquet").saveAsTable(table)
      }
      val grown = StreamingDedup.postingFileCount(spark, table)
      assert(grown > baseline, "appends must grow the file count")
      def pairs() = StreamingDedup.nearDupMatchesBucketed(batch, spark, table)
        .select("new_id", "corpus_id", "est_jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val before = pairs()
      assert(before.nonEmpty, "fixture must produce matches")
      // injected threshold just below the current growth -> fires
      val factor = math.max(1.0, grown.toDouble / baseline * 0.9)
      assert(StreamingDedup.compactAt(spark, table, baseline, factor, buckets = 8),
        s"dial must fire at $grown files vs baseline $baseline, factor $factor")
      assert(StreamingDedup.postingFileCount(spark, table) < grown,
        "compaction must reduce the file count")
      assert(pairs() == before, "compaction must preserve match parity")
      // bucketed layout survives the rewrite: corpus side still reads
      // its buckets in place under forced sort-merge
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "-1")
      try {
        val plan = StreamingDedup.nearDupMatchesBucketed(batch, spark, table)
          .queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"), s"bucket layout lost:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning(cbk"),
          s"corpus side exchanged after compaction:\n$plan")
      } finally spark.conf.set(key, prev)
      // below threshold now -> no-op
      assert(!StreamingDedup.compactAt(spark, table, baseline, 1000.0, buckets = 8))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__compacting")
    }
  }

  test("admission agrees with the batch incremental verdicts at est level") {
    // run the batch-side q61 candidates through the streaming operator
    // in batch mode: every dup_exact/dup_near doc whose est clears the
    // threshold must surface, with the same corpus partner available
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = docs.where(expr("doc_id % 10 = 7"))
    val corpusSig = DedupOps.minhashSignaturesOf(
      docs.where(expr("NOT (doc_id % 10 = 7)")))
    val got = StreamingDedup.nearDupMatches(batch, corpusSig)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    val verdicts = DedupOps.incrementalDedup(spark, sf)
      .where(col("verdict") === "dup_exact")
      .select("doc_id", "match_id").as[(Long, Long)].collect()
    // exact dups agree on the partner at est level (est_jaccard = 1)
    verdicts.foreach { case (d, m) =>
      assert(got.contains((d, m)),
        s"batch dup_exact ($d,$m) missing from streaming admission")
    }
  }
}

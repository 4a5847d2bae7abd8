package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{AdmissionConfig, AdmissionPipeline, AdmissionTables}

/** Composed admission (VERDICT r19 stretch #8): one foreachBatch over
  * (doc_id, text, embedding) probing all three staged gates, one
  * verdict frame, shared absorb + dial set, ledger-checkpointed
  * exactly-once per batch. */
class AdmissionPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t = AdmissionTables("ap_bands", "ap_spans", "ap_vecs")
  private def dropAll(): Unit =
    Seq(t.bands, t.spans, t.vectors).foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  /** Corpus docs 100+ paired with embeddings 100+ on a shared id. */
  private def corpusDocs = Tables.documents(spark, sf)
    .where(col("doc_id") >= 100).select("doc_id", "text")
  private def corpusVecs = Tables.embeddings(spark, sf)
    .where(col("vec_id") >= 100)
    .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("embedding"))

  /** A batch planting one doc per verdict class. */
  private def fixtureBatch(idBase: Long): (org.apache.spark.sql.DataFrame, Map[Long, String]) = {
    val srcText = corpusDocs.where(col("doc_id") === 100)
      .select("text").as[String].collect().head
    val srcVec = corpusVecs.where(col("doc_id") === 142)
      .select("embedding").as[Seq[Double]].collect().head
    // decorrelated sign patterns, VARIED PER BATCH (k): an admitted
    // batch's vectors are absorbed, so a repeated pattern in the next
    // batch would — correctly — flag as a semantic dup of the earlier
    // admission rather than exercise the admit path
    val k = (idBase / 100000L % 7L).toInt
    val novelVec = Seq.tabulate(srcVec.length)(d => if ((d + k) % 2 == 0) 1.0 else -1.0)
    val novelVec2 = Seq.tabulate(srcVec.length)(d => if ((d + k) % 3 == 0) 1.0 else -1.0)
    val novelVec3 = Seq.tabulate(srcVec.length)(d => if ((d + k) % 5 == 0) 1.0 else -1.0)
    val srcTokens = srcText.split(" ")
    // 15 corpus tokens → 8 matched 8-token windows of 93 (~86 pm,
    // over the spec's 50 pm cap) while sharing only ~14 bigram
    // shingles — far under the lexical est threshold even though the
    // synthetic corpus text is repetitive (a 30-token prefix covered
    // enough of doc 100's DISTINCT shingles to trip minhash at 0.5)
    val spanDupText = (srcTokens.take(15) ++
      (1 to 85).map(i => s"novel$idBase~$i")).mkString(" ")
    val novelText = (1 to 50).map(i => s"fresh$idBase~$i").mkString(" ")
    val rows = Seq(
      (idBase + 1, srcText, novelVec),      // lexical twin of corpus 100
      (idBase + 2, spanDupText, novelVec2), // 8/93 windows reproduce corpus spans
      (idBase + 3, novelText, srcVec),      // semantic twin of corpus 142
      (idBase + 4, novelText.replace("fresh", "other"), novelVec3)) // novel
    (rows.toDF("doc_id", "text", "embedding"),
      Map(idBase + 1 -> "dup_lexical", idBase + 2 -> "dup_span",
        idBase + 3 -> "dup_semantic", idBase + 4 -> "admit"))
  }

  private val cfg = AdmissionConfig(maxSpanPm = 50, minCos = 0.8)

  test("composed verdicts: each gate fires on its own class, precedence holds") {
    dropAll()
    val dials = AdmissionPipeline.stageCorpus(spark, corpusDocs, corpusVecs, t, cfg)
    try {
      val (batch, expected) = fixtureBatch(9000000L)
      val got = AdmissionPipeline.verdicts(spark, batch, t, cfg)
        .as[(Long, String)].collect().toMap
      assert(got == expected, s"verdicts diverge: got $got expected $expected")
      assert(dials.all.forall(!_.disarmed))
    } finally dropAll()
  }

  test("processBatch is exactly-once per batch id: ledger short-circuits, store-hit replay never flips verdicts") {
    dropAll()
    val dials = AdmissionPipeline.stageCorpus(spark, corpusDocs, corpusVecs, t, cfg)
    val stateDir = java.nio.file.Files.createTempDirectory("ap_state").toString
    try {
      val (batch, expected) = fixtureBatch(9100000L)
      def postingCount(n: String): Long = spark.table(n).count()

      val v1 = AdmissionPipeline.processBatch(spark, batch, 0L, t, dials, stateDir, cfg)
        .as[(Long, String)].collect().toMap
      assert(v1 == expected)
      val (bands1, spans1, vecs1) =
        (postingCount(t.bands), postingCount(t.spans), postingCount(t.vectors))
      assert(vecs1 > 0 && spans1 > 0)

      // full replay (ledger hit): stored verdicts returned, zero writes
      val v2 = AdmissionPipeline.processBatch(spark, batch, 0L, t, dials, stateDir, cfg)
        .as[(Long, String)].collect().toMap
      assert(v2 == v1, "ledger replay must return the stored verdicts")
      assert(postingCount(t.bands) == bands1 && postingCount(t.spans) == spans1 &&
        postingCount(t.vectors) == vecs1, "ledger replay must absorb nothing")

      // mid-crash replay (store committed, ledger lost): the corpus
      // has ALREADY absorbed the batch — a recompute would flip the
      // admitted doc to a dup of its own absorbed copy; the store hit
      // must skip the recompute and only re-run the absorb
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(stateDir, "ledger", "batch-0"))
      val v3 = AdmissionPipeline.processBatch(spark, batch, 0L, t, dials, stateDir, cfg)
        .as[(Long, String)].collect().toMap
      assert(v3 == v1, "store-hit replay must not recompute (verdict flip)")
      assert(postingCount(t.spans) == spans1,
        "span re-absorb must be a no-op (anti-join idempotence)")
      // band/vector re-absorbs may append duplicates — bounded, and
      // match-invisible through the pair-level dedup:
      val (batch2, expected2) = fixtureBatch(9200000L)
      val v4 = AdmissionPipeline.processBatch(spark, batch2, 1L, t, dials, stateDir, cfg)
        .as[(Long, String)].collect().toMap
      assert(v4 == expected2, "duplicate postings must not change later verdicts")
      // the previously admitted doc is now corpus: its twin gets flagged
      val twinOfAdmitted = Seq((9999999L,
        batch.where(col("doc_id") === 9100004L).select("text").as[String].collect().head,
        Seq.tabulate(64)(d => if (d % 7 == 0) 1.0 else -1.0)))
        .toDF("doc_id", "text", "embedding")
      val v5 = AdmissionPipeline.verdicts(spark, twinOfAdmitted, t, cfg)
        .as[(Long, String)].collect().toMap
      assert(v5(9999999L) == "dup_lexical",
        "absorbed admissions must gate later twins (the absorbing property)")
    } finally dropAll()
  }

  test("streaming e2e: kill/resume on one checkpoint replays into the ledger, dials compact, verdicts exactly-once") {
    dropAll()
    // filesFactor 1.0: every absorb trips the dial — the compaction
    // path runs INSIDE the streaming loop, not just in batch tests
    val tightCfg = cfg.copy(filesFactor = 1.0)
    val dials = AdmissionPipeline.stageCorpus(spark, corpusDocs, corpusVecs, t, tightCfg)
    val stateDir = java.nio.file.Files.createTempDirectory("ap_state2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ap_ckpt").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val (b1, exp1) = fixtureBatch(9300000L)
      val rows1 = b1.as[(Long, String, Seq[Double])].collect().toSeq

      val mem1 = MemoryStream[(Long, String, Seq[Double])]
      val q1 = AdmissionPipeline.start(
        mem1.toDF().toDF("doc_id", "text", "embedding"),
        spark, t, dials, stateDir, ckpt, tightCfg)
      try { mem1.addData(rows1: _*); q1.processAllAvailable() } finally q1.stop()

      // resume on the SAME checkpoint with a fresh source (the
      // FileKafkaAdmissionSpec shape): the restarted query continues
      // the batch-id sequence; earlier ledger entries stay committed
      val (b2, exp2) = fixtureBatch(9400000L)
      val rows2 = b2.as[(Long, String, Seq[Double])].collect().toSeq
      val mem2 = MemoryStream[(Long, String, Seq[Double])]
      mem2.addData(rows1: _*) // re-offered input (at-least-once source)
      val q2 = AdmissionPipeline.start(
        mem2.toDF().toDF("doc_id", "text", "embedding"),
        spark, t, dials, stateDir, ckpt, tightCfg)
      try { mem2.addData(rows2: _*); q2.processAllAvailable() } finally q2.stop()

      val all = spark.read.parquet(s"$stateDir/verdicts")
        .select("doc_id", "verdict").as[(Long, String)].collect()
      // exactly one verdict row per doc across the restart — the
      // replayed first batch landed on its original batch directory
      assert(all.length == all.map(_._1).distinct.length,
        s"duplicate verdicts across restart: ${all.mkString(",")}")
      val byDoc = all.toMap
      exp1.foreach { case (id, v) => assert(byDoc(id) == v, s"doc $id: ${byDoc(id)} != $v") }
      exp2.foreach { case (id, v) => assert(byDoc(id) == v, s"doc $id: ${byDoc(id)} != $v") }
      // the tight dial compacted at least once and landed sane
      assert(dials.all.forall(d => !d.disarmed && d.rejectedLandings == 0))
      Seq(t.bands, t.spans, t.vectors).foreach { n =>
        val files = graft.streaming.StreamingDedup.postingFileCount(spark, n)
        assert(files <= 3 * tightCfg.buckets,
          s"$n at $files files after compaction — layout defect")
      }
    } finally dropAll()
  }
}

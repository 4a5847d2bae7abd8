package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{DedupOps, EmbeddingOps, MinHashParams}

/** The three corpus-side posting tables one composed admission
  * pipeline owns: minhash band postings ([[StreamingDedup]]), span
  * hashes ([[StreamingSpanGate]]), quantized vectors
  * ([[StreamingSemanticGate]]). */
final case class AdmissionTables(bands: String, spans: String, vectors: String)

/** One floor-keyed [[CompactionDial]] per posting table — the shared
  * dial set a long-running composed loop holds. */
final case class AdmissionDials(bands: CompactionDial, spans: CompactionDial,
                                vectors: CompactionDial) {
  def all: Seq[CompactionDial] = Seq(bands, spans, vectors)
  /** Fire whichever dials are over threshold; returns how many ran. */
  def maybeCompactAll(spark: SparkSession): Int = all.count(_.maybeCompact(spark))
}

/** Knobs for the three gates, bundled so stage and probe CANNOT
  * disagree (every layout parameter — presets, span length, planes —
  * is baked into the staged tables). */
final case class AdmissionConfig(
    p: MinHashParams = DedupOps.defaultParams,
    spanLen: Int = StreamingSpanGate.defaultSpanLen,
    maxSpanPm: Long = 500,
    minCos: Double = EmbeddingOps.nearDupCos,
    planes: Int = EmbeddingOps.numPlanes,
    planeSets: Int = 1,
    buckets: Int = 64,
    filesFactor: Double = 2.0)

/** COMPOSED training-data admission (VERDICT r19 stretch #8): the
  * lexical (minhash/LSH), span (substring-dup), and semantic
  * (quantized-embedding) gates ran as three separate streams until
  * r20; a real ingest wants ONE foreachBatch that reads each incoming
  * document once, probes all three staged corpus tables, and emits a
  * single verdict frame — `(doc_id, verdict)` with verdict ∈ admit |
  * dup_lexical | dup_span | dup_semantic — then absorbs the admitted
  * docs into all three tables under one shared dial set.
  *
  * Verdict PRECEDENCE is strongest-signal-first: `dup_lexical` (the
  * doc near-duplicates a whole corpus document — minhash agreement ≥
  * the est threshold), else `dup_span` (more than `maxSpanPm` per
  * mille of its k-token windows reproduce corpus spans — Lee et
  * al.-style substring duplication), else `dup_semantic` (an int8
  * quantized-cosine neighbor above `minCos` — the paraphrase case the
  * lexical gates can't see), else `admit`. Each gate keeps its own
  * blind spots: a sub-bigram or null text passes the lexical gate, a
  * doc under k tokens passes the span gate, a zero-norm embedding
  * passes the semantic gate — composition exists precisely so the
  * others still get a look.
  *
  * Scale shape: all three probes are the gates' own bucket-aligned
  * stream-static joins — per micro-batch, ONLY the batch side
  * shuffles (into each table's bucketing); the three corpus tables
  * are read in place, forever. The verdict assembly joins three
  * batch-sized flag frames back to the batch — broadcast-class work.
  *
  * EXACTLY-ONCE contract (the [[processBatch]] ledger): Spark's
  * foreachBatch is at-least-once — after a crash the last uncommitted
  * batch REPLAYS, and a naive replay would re-probe a corpus that
  * already absorbed the batch, flipping its own docs from admit to
  * dup (they'd match themselves). processBatch is therefore
  * checkpointed per batch id under `stateDir`:
  *
  *   1. ledger hit → the batch fully completed earlier; return the
  *      STORED verdicts, touch nothing.
  *   2. verdict store hit (parquet `_SUCCESS` present) → verdicts
  *      were computed and delivered before the crash; SKIP the
  *      recompute (this is what makes the mid-absorb crash window
  *      safe — stored verdicts can't flip) and re-run the absorb.
  *   3. otherwise compute verdicts against the current corpus, write
  *      them to the store (overwrite — idempotent delivery), absorb
  *      the admitted docs into all three tables, fire the dials, and
  *      commit the ledger entry last.
  *
  * Absorb replay (a crash between store-write and ledger-commit
  * re-runs step 3's absorb): the span absorb is a no-op by anti-join;
  * the band/vector absorbs append duplicate postings for the same
  * corpus ids — match-invisible (every probe ends in a pair-level
  * dedup) and storage-bounded by the next compaction. Self-pairs
  * (new_id = corpus_id) are excluded in the lexical and semantic
  * probes for the same window. */
object AdmissionPipeline {

  val Admit = "admit"
  val DupLexical = "dup_lexical"
  val DupSpan = "dup_span"
  val DupSemantic = "dup_semantic"

  /** ONE-TIME staging of all three corpus tables from the settled
    * corpus; returns the shared dial set, each dial floor-keyed off
    * its table's staged file count.
    *
    * @param corpusDocs frame with `doc_id`, `text`
    * @param corpusVecs frame with `doc_id`, `embedding` (the same id
    *                   space as corpusDocs — one embedding per doc) */
  def stageCorpus(spark: SparkSession, corpusDocs: DataFrame,
                  corpusVecs: DataFrame, t: AdmissionTables,
                  cfg: AdmissionConfig = AdmissionConfig()): AdmissionDials = {
    val bBands = StreamingDedup.stageCorpusBands(spark,
      DedupOps.minhashSignaturesOf(corpusDocs), t.bands, cfg.buckets, cfg.p)
    val bSpans = StreamingSpanGate.stageCorpusSpans(spark, corpusDocs,
      t.spans, cfg.buckets, cfg.spanLen)
    val bVecs = StreamingSemanticGate.stageCorpusVectors(spark, corpusVecs,
      t.vectors, cfg.buckets, idCol = "doc_id", vecCol = "embedding",
      planes = cfg.planes, planeSets = cfg.planeSets)
    AdmissionDials(
      StreamingDedup.compactionDial(t.bands, bBands, cfg.filesFactor, cfg.buckets),
      StreamingSpanGate.compactionDial(t.spans, bSpans, cfg.filesFactor, cfg.buckets),
      StreamingSemanticGate.compactionDial(t.vectors, bVecs, cfg.filesFactor, cfg.buckets))
  }

  /** One verdict row per batch document, by the precedence above.
    * Pure read — absorbs nothing; [[processBatch]] is the full loop.
    *
    * @param batch frame with `doc_id`, `text`, `embedding` */
  def verdicts(spark: SparkSession, batch: DataFrame, t: AdmissionTables,
               cfg: AdmissionConfig = AdmissionConfig()): DataFrame = {
    val docs = batch.select("doc_id", "text")
    val lex = StreamingDedup.nearDupMatchesBucketed(docs, spark, t.bands, cfg.p)
      .where(col("new_id") =!= col("corpus_id"))
      .select(col("new_id").as("doc_id")).distinct()
      .withColumn("__lex", lit(true))
    val span = StreamingSpanGate.admissionVerdicts(docs, spark, t.spans,
        cfg.maxSpanPm, cfg.spanLen)
      .where(col("verdict") === "reject_span_dup")
      .select("doc_id").withColumn("__span", lit(true))
    val sem = StreamingSemanticGate.semanticMatches(
        batch.select(col("doc_id"), col("embedding")), spark, t.vectors,
        cfg.minCos, idCol = "doc_id", vecCol = "embedding",
        planes = cfg.planes, planeSets = cfg.planeSets)
      .where(col("new_id") =!= col("corpus_id"))
      .select(col("new_id").as("doc_id")).distinct()
      .withColumn("__sem", lit(true))
    batch.select("doc_id")
      .join(lex, Seq("doc_id"), "left")
      .join(span, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("__lex"), lit(DupLexical))
          .when(col("__span"), lit(DupSpan))
          .when(col("__sem"), lit(DupSemantic))
          .otherwise(lit(Admit)))
      .select("doc_id", "verdict")
  }

  /** Absorb `admitted` (`doc_id`, `text`, `embedding`) into all three
    * posting tables. The vector absorb skips its count job — the
    * composed loop never reads it (VERDICT r19 #7). */
  def absorbAdmitted(spark: SparkSession, admitted: DataFrame,
                     t: AdmissionTables,
                     cfg: AdmissionConfig = AdmissionConfig()): Unit = {
    StreamingDedup.absorbPostings(spark, admitted.select("doc_id", "text"),
      t.bands, cfg.buckets, cfg.p)
    StreamingSpanGate.absorbSpans(spark, admitted.select("doc_id", "text"),
      t.spans, cfg.buckets, cfg.spanLen)
    StreamingSemanticGate.absorb(spark,
      admitted.select(col("doc_id"), col("embedding")), t.vectors,
      cfg.buckets, idCol = "doc_id", vecCol = "embedding",
      planes = cfg.planes, planeSets = cfg.planeSets,
      countAbsorbed = false): Unit
  }

  private def verdictDir(stateDir: String, batchId: Long): String =
    s"$stateDir/verdicts/batch=$batchId"
  private def ledgerPath(stateDir: String, batchId: Long): java.nio.file.Path =
    java.nio.file.Paths.get(stateDir, "ledger", s"batch-$batchId")
  private def storedOk(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  /** The full per-batch loop (the foreachBatch body): verdict →
    * store → absorb → compact → ledger, checkpointed per `batchId`
    * as documented on the object. Returns the batch's verdict frame
    * (read back from the store, so callers see exactly what was
    * delivered). */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   t: AdmissionTables, dials: AdmissionDials,
                   stateDir: String,
                   cfg: AdmissionConfig = AdmissionConfig()): DataFrame = {
    val store = verdictDir(stateDir, batchId)
    if (java.nio.file.Files.exists(ledgerPath(stateDir, batchId)))
      return spark.read.parquet(store) // fully committed earlier
    if (!storedOk(store)) {
      // pin the batch before the store write: the three probes and
      // the absorb would otherwise re-evaluate the source frame
      val pinned = batch.localCheckpoint(true)
      verdicts(spark, pinned, t, cfg)
        .repartition(1) // batch-sized; one delivery file
        .write.mode("overwrite").parquet(store)
      absorbFor(spark, pinned, store, t, cfg)
    } else {
      // replay after the store committed: verdicts are already
      // delivered and MUST NOT be recomputed against the (possibly
      // partially) absorbed corpus — re-run only the absorb, which
      // is replay-tolerant per gate (see the object doc)
      absorbFor(spark, batch.localCheckpoint(true), store, t, cfg)
    }
    dials.maybeCompactAll(spark): Unit
    val ledger = ledgerPath(stateDir, batchId)
    java.nio.file.Files.createDirectories(ledger.getParent)
    try java.nio.file.Files.createFile(ledger): Unit
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    spark.read.parquet(store)
  }

  private def absorbFor(spark: SparkSession, pinned: DataFrame, store: String,
                        t: AdmissionTables, cfg: AdmissionConfig): Unit = {
    val admitted = pinned.join(
      spark.read.parquet(store).where(col("verdict") === Admit).select("doc_id"),
      Seq("doc_id"))
    absorbAdmitted(spark, admitted, t, cfg)
  }

  /** Wire a streaming source of `(doc_id, text, embedding)` through
    * [[processBatch]] with a checkpoint — kill/resume replays the
    * uncommitted batch into the ledger logic above. The verdict
    * parquet under `stateDir/verdicts/` IS the exactly-once output
    * stream (one directory per batch id). */
  def start(stream: DataFrame, spark: SparkSession, t: AdmissionTables,
            dials: AdmissionDials, stateDir: String, checkpointDir: String,
            cfg: AdmissionConfig = AdmissionConfig()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(spark, b, id, t, dials, stateDir, cfg): Unit
      }
      .start()
}

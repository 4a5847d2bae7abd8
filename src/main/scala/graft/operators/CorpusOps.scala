package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and training: benchmark decontamination, deterministic
  * sampling, domain mixing, quality filtering, and sequence packing.
  *
  * Design rules shared by every operator here:
  *  - deterministic: membership decisions hash document IDENTITY
  *    (md5-based uniform hash), never Spark's partition-dependent
  *    `rand()` — a re-run, a retry, or a different cluster layout
  *    selects the identical sample;
  *  - integer decision arithmetic: thresholds compare `a * k < b * m`
  *    on BIGINTs, not floating ratios, so an independent engine (the
  *    DuckDB oracle) reproduces every flag bit-for-bit;
  *  - shuffle-light: per-document scoring is a narrow map; the only
  *    shuffles are the aggregates that are the operator's point, and
  *    small side tables (benchmark n-grams, per-domain counts) join by
  *    broadcast so the corpus never moves.
  */
object CorpusOps {

  /** 32-bit uniform hash of the doc id — the deterministic coin for
    * every sampling decision. */
  private val u32 =
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
  private val duckU32 =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"

  // ------------------------------------------------- decontamination

  /** Benchmark membership: a held-out eval slice of the corpus. In
    * production this is the benchmark suite's own n-gram table; here a
    * deterministic 5% of documents stands in for it. */
  private val benchPred = "doc_id % 20 = 0"

  /** q48: benchmark decontamination census — for every training
    * document, how many of its distinct word-bigram shingles appear in
    * ANY benchmark document. Training docs overlapping the eval set
    * must be dropped before training or the benchmark leaks.
    *
    * Scale shape: benchmark n-grams are tiny next to the corpus (eval
    * suites are fixed-size), so the membership probe is a BROADCAST
    * semi-join — the corpus-side shingles never shuffle; the only wide
    * stage is the per-doc overlap count, keyed by doc_id. Reuses the
    * staged shingle table from the dedup stack. */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = DedupOps.sharedShingles(spark, sfDir)
    val bench = bg.where(expr(benchPred)).select("s").distinct()
    val train = bg.where(expr(s"NOT ($benchPred)"))
    val sizes = train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val overlap = train.join(broadcast(bench), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    sizes.join(overlap, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("overlap_frac",
        round(col("n_overlap") * lit(1.0) / col("n_shingles"), 6))
      // contaminated = overlap >= 90% (near-total n-gram containment =
      // direct benchmark leakage; the synthetic corpus shares a small
      // vocabulary, so incidental bigram overlap is high and a low
      // threshold would not discriminate), in exact integer math
      .withColumn("contaminated",
        (col("n_overlap") * 10 >= col("n_shingles") * 9).cast("int"))
      .select("doc_id", "n_shingles", "n_overlap", "overlap_frac", "contaminated")
      .orderBy("doc_id")
  }

  val decontaminateSql: String = {
    val toks = "string_split(text, ' ')"
    val bigrams =
      s"""CASE WHEN len($toks) < 2 THEN []::VARCHAR[]
         |ELSE list_distinct(list_transform(generate_series(1, len($toks) - 1),
         |  i -> $toks[i] || ' ' || $toks[i + 1])) END""".stripMargin
    s"""WITH bg AS (
       |  SELECT doc_id, unnest($bigrams) AS s FROM documents),
       |bench AS (SELECT DISTINCT s FROM bg WHERE $benchPred),
       |train AS (SELECT * FROM bg WHERE NOT ($benchPred)),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
       |overlap AS (
       |  SELECT doc_id, count(*) AS n_overlap
       |  FROM train JOIN bench USING (s) GROUP BY doc_id)
       |SELECT s.doc_id, s.n_shingles,
       |  coalesce(o.n_overlap, 0) AS n_overlap,
       |  round(coalesce(o.n_overlap, 0) * 1.0 / s.n_shingles, 6) AS overlap_frac,
       |  CAST(coalesce(o.n_overlap, 0) * 10 >= s.n_shingles * 9 AS INT) AS contaminated
       |FROM sizes s LEFT JOIN overlap o ON o.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  // ------------------------------------------------ deterministic sampling

  /** Per-language keep rates in per-mille — the "downsample the
    * over-represented web language, keep the rare ones" shape of a
    * corpus-mixing config. */
  private val sampleRatesPm: Seq[(String, Int)] =
    Seq("en" -> 250, "es" -> 800, "de" -> 800, "fr" -> 800, "zh" -> 800)
  private val defaultRatePm = 500

  /** q49: deterministic stratified sample — keep a document iff its
    * identity-hash coin lands under its stratum's rate. Pure narrow
    * filter: no shuffle at all (the ORDER BY is presentation only);
    * re-running selects the identical documents, which is what makes
    * downstream caches and incremental reruns coherent at 100 TB. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rateCase = sampleRatesPm
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $defaultRatePm END")
    Tables.documents(spark, sfDir)
      .withColumn("rate_pm", expr(rateCase))
      .where(expr(s"$u32 % 1000") < col("rate_pm"))
      .select("doc_id", "lang", "source", "rate_pm")
      .orderBy("doc_id")
  }

  val stratifiedSampleSql: String = {
    val rateCase = sampleRatesPm
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $defaultRatePm END")
    s"""SELECT doc_id, lang, source, $rateCase AS rate_pm
       |FROM documents
       |WHERE $duckU32 % 1000 < ($rateCase)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- domain mixing

  /** q50: balanced domain mix — downsample every language to the size
    * of the smallest one (the uniform-mixture special case of
    * target-proportion mixing; the rate arithmetic generalizes to any
    * target weights). Two tiny aggregates (per-lang counts, global
    * min) broadcast back onto the corpus; the corpus itself never
    * shuffles — keep iff `hash % lang_count < min_count`, i.e. an
    * exact min_count/lang_count rate decided per document. */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val minCnt = counts.agg(min(col("cnt")).as("mn"))
    docs.join(broadcast(counts), "lang")
      .crossJoin(broadcast(minCnt))
      .where(expr(s"$u32 % cnt") < col("mn"))
      .select("doc_id", "lang", "cnt", "mn")
      .orderBy("doc_id")
  }

  val domainMixSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
       |m AS (SELECT min(cnt) AS mn FROM c)
       |SELECT doc_id, lang, cnt, mn
       |FROM documents JOIN c USING (lang) CROSS JOIN m
       |WHERE $duckU32 % cnt < mn
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- quality filter

  /** q51: composed quality filter with reject reasons — the C4/Gopher
    * pipeline stage that drops low-quality documents and KEEPS WHY
    * (reason strings drive the curation dashboards that tune
    * thresholds). Rules, all in exact integer arithmetic:
    *   too_short      n_tokens < 20
    *   low_diversity  type-token ratio < 0.35
    *   high_stopword  stopword ratio  > 0.18
    *   repetitive     duplicate-bigram mass >= 0.2 (Gopher §A1.1)
    * One narrow scoring map + one bigram aggregate (the repetition
    * rule's shuffle) joined back by doc_id. */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val stopPred = "x = 'the' OR x = 'a'"
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", expr("size(toks)"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))"))
      .withColumn("stop_cnt", expr(s"size(filter(toks, x -> $stopPred))"))
    val dup = base.where(expr("size(toks) >= 2"))
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS bg"""
          .stripMargin)
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_bigrams"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_cnt"))
    base.join(dup, Seq("doc_id"), "left")
      .withColumn("r_short", col("n_tokens") < 20)
      .withColumn("r_lowdiv", col("n_distinct") * 100 < col("n_tokens") * 35)
      .withColumn("r_stop", col("stop_cnt") * 100 > col("n_tokens") * 18)
      .withColumn("r_repet",
        coalesce(col("dup_cnt") * 5 >= col("n_bigrams"), lit(false)))
      .withColumn("reasons", concat_ws(",",
        when(col("r_short"), lit("too_short")),
        when(col("r_lowdiv"), lit("low_diversity")),
        when(col("r_stop"), lit("high_stopword")),
        when(col("r_repet"), lit("repetitive"))))
      .withColumn("pass", (col("reasons") === "").cast("int"))
      .select("doc_id", "n_tokens", "reasons", "pass")
      .orderBy("doc_id")
  }

  val qualityFilterSql: String = {
    val toks = "string_split(text, ' ')"
    s"""WITH base AS (
       |  SELECT doc_id,
       |    len($toks) AS n_tokens,
       |    len(list_distinct($toks)) AS n_distinct,
       |    len(list_filter($toks, x -> x = 'the' OR x = 'a')) AS stop_cnt
       |  FROM documents),
       |bgx AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len($toks) - 1),
       |    i -> $toks[i] || ' ' || $toks[i + 1])) AS bg
       |  FROM documents WHERE len($toks) >= 2),
       |cnts AS (SELECT doc_id, bg, count(*) AS cnt FROM bgx GROUP BY doc_id, bg),
       |dup AS (
       |  SELECT doc_id, sum(cnt) AS n_bigrams,
       |    sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_cnt
       |  FROM cnts GROUP BY doc_id)
       |SELECT b.doc_id, b.n_tokens,
       |  concat_ws(',',
       |    CASE WHEN b.n_tokens < 20 THEN 'too_short' END,
       |    CASE WHEN b.n_distinct * 100 < b.n_tokens * 35 THEN 'low_diversity' END,
       |    CASE WHEN b.stop_cnt * 100 > b.n_tokens * 18 THEN 'high_stopword' END,
       |    CASE WHEN coalesce(d.dup_cnt * 5 >= d.n_bigrams, false) THEN 'repetitive' END
       |  ) AS reasons,
       |  CAST(concat_ws(',',
       |    CASE WHEN b.n_tokens < 20 THEN 'too_short' END,
       |    CASE WHEN b.n_distinct * 100 < b.n_tokens * 35 THEN 'low_diversity' END,
       |    CASE WHEN b.stop_cnt * 100 > b.n_tokens * 18 THEN 'high_stopword' END,
       |    CASE WHEN coalesce(d.dup_cnt * 5 >= d.n_bigrams, false) THEN 'repetitive' END
       |  ) = '' AS INT) AS pass
       |FROM base b LEFT JOIN dup d ON d.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  // ---------------------------------------------------- sequence packing

  private val packShards = 32
  private val packCapacity = 2048 // tokens per training sequence

  /** q52: contiguous sequence packing — assign each document to the
    * training-sequence bin where its first token lands, packing
    * documents head-to-tail in doc_id order within a shard.
    *
    * Scale shape: packing is inherently sequential, so it is sharded —
    * each of the `packShards` hash shards packs independently (one
    * running-sum window PER SHARD, all shards in parallel). At cluster
    * scale the shard count scales with executors; no global sort, no
    * single-partition window anywhere. */
  def packBins(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", expr("size(split(text, ' '))"))
      .withColumn("shard", col("doc_id") % packShards)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $packCapacity"))
      .select("doc_id", "shard", "n_tokens", "bin")
      .orderBy("doc_id")
  }

  // CAST the bin to BIGINT: DuckDB's windowed sum(BIGINT) is HUGEINT,
  // which the driver's pandas bridge renders as float64 ("0.0" vs "0")
  // and the value hash diverges even though every value is equal.
  val packBinsSql: String =
    s"""SELECT doc_id, doc_id % $packShards AS shard,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  CAST((sum(len(string_split(text, ' '))) OVER (
       |     PARTITION BY doc_id % $packShards ORDER BY doc_id
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |   - len(string_split(text, ' '))) // $packCapacity AS BIGINT) AS bin
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- rare-token (OOV) filter

  /** q54: rare-token census — per document, how many token OCCURRENCES
    * are "rare" (corpus frequency below half the mean type frequency,
    * `c * vocab * 2 < total` in exact integer math). A high rare mass
    * is the classic OOV/garbled-text signal tokenizer-fertility
    * dashboards key on.
    *
    * Scale shape: under Zipf the RARE types are most of the
    * vocabulary, so the broadcastable side is the COMMON head (few
    * types, most of the mass) — rare counts come from
    * `n_tokens - n_common` after a broadcast semi-join against the
    * head, never from materializing the rare tail. The frequency table
    * itself is one partial-agg shuffle over the token stream. */
  def rareTokenFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum("c").as("total"), count(lit(1)).as("vocab"))
    val common = freq.crossJoin(broadcast(tot))
      .where(col("c") * col("vocab") * 2 >= col("total")).select("t")
    val perDoc = tok.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val commonCnt = tok.join(broadcast(common), Seq("t"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
    perDoc.join(commonCnt, Seq("doc_id"), "left")
      .withColumn("n_rare", col("n_tokens") - coalesce(col("n_common"), lit(0L)))
      .withColumn("rare_pm", expr("n_rare * 1000 div n_tokens"))
      .withColumn("oov_flag", (col("n_rare") >= 1).cast("int"))
      .select("doc_id", "n_tokens", "n_rare", "rare_pm", "oov_flag")
      .orderBy("doc_id")
  }

  val rareTokenFilterSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |f AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
       |m AS (SELECT sum(c) AS total, count(*) AS vocab FROM f),
       |com AS (SELECT t FROM f CROSS JOIN m WHERE c * vocab * 2 >= total),
       |per AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id),
       |cc AS (
       |  SELECT doc_id, count(*) AS n_common
       |  FROM tok JOIN com USING (t) GROUP BY doc_id)
       |SELECT p.doc_id, p.n_tokens,
       |  p.n_tokens - coalesce(c.n_common, 0) AS n_rare,
       |  (p.n_tokens - coalesce(c.n_common, 0)) * 1000 // p.n_tokens AS rare_pm,
       |  CAST(p.n_tokens - coalesce(c.n_common, 0) >= 1 AS INT) AS oov_flag
       |FROM per p LEFT JOIN cc c ON c.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
}

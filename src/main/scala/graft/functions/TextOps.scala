package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything is a pure Catalyst expression (codegen'd, no UDFs) and
  * embarrassingly parallel per document — the shape that scales
  * linearly to 100 TB: one narrow map stage, no shuffle except the
  * final (optional) ordering.
  */
object TextOps {

  private val stopwords = Seq("the", "a")

  /** Token counting + quality scoring: whitespace tokens, a BPE-ish
    * regex token count, type-token ratio, stopword ratio, mean token
    * length, and a composite quality score. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    // stopword count WITHOUT a lambda: filter(toks, x -> ...) is a
    // HigherOrderFunction (CodegenFallback — the r17 CodegenSweep
    // flagged it, PERF §50); size-difference over nested array_remove
    // is the same count in pure codegen'd collection expressions.
    // SIZE BOUND (VERDICT r17 #5): each fold step is one array copy,
    // so this trades O(|stopwords|) copies per row for codegen — the
    // right trade while |stopwords| stays O(10). A realistic 100+
    // list should instead broadcast the stopword set into one native
    // expression (a MinHashSig-style count over a static Set), or
    // accept the single interpreted filter() if the column is off the
    // hot path — grow the list here only with a measured A/B.
    val nonStop = stopwords.foldLeft("toks")((e, w) => s"array_remove($e, '$w')")
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " ")) // tokenize once, not per expression
      .withColumn("n_tokens", expr("size(toks)"))
      .withColumn("n_bpeish", expr(
        "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))"))
      .withColumn("stop_cnt", expr(s"size(toks) - size($nonStop)"))
      .withColumn("ttr", round(col("n_distinct") / col("n_tokens"), 6))
      .withColumn("stop_ratio", round(col("stop_cnt") / col("n_tokens"), 6))
      .withColumn("mean_tok_len",
        round((length(col("text")) - (col("n_tokens") - 1)) / col("n_tokens"), 6))
      // composite score in exact integer micro-units: compound double
      // arithmetic (0.4*a + 0.3*b + ...) differs by 1 ulp across
      // engines and flips 6-dp rounding; integer div is deterministic.
      // quality = 0.4*ttr + 0.3*(1-stop_ratio) + 0.3*min(1, n_tokens/100)
      .withColumn("quality_micro", expr(
        """(400000L * n_distinct + 300000L * (n_tokens - stop_cnt)) div n_tokens
          | + 3000L * least(n_tokens, 100)""".stripMargin))
      .select("doc_id", "n_tokens", "n_bpeish", "n_distinct", "stop_cnt",
        "ttr", "stop_ratio", "mean_tok_len", "quality_micro")
      .orderBy("doc_id")
  }

  val textStatsSql: String = {
    val stopPred = stopwords.map(w => s"x = '$w'").mkString(" OR ")
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpeish,
       |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
       |  len(list_filter(string_split(text, ' '), x -> $stopPred)) AS stop_cnt,
       |  round(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 6) AS ttr,
       |  round(len(list_filter(string_split(text, ' '), x -> $stopPred)) / len(string_split(text, ' ')), 6) AS stop_ratio,
       |  round((length(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')), 6) AS mean_tok_len,
       |  (400000 * len(list_distinct(string_split(text, ' ')))
       |   + 300000 * (len(string_split(text, ' ')) - len(list_filter(string_split(text, ' '), x -> $stopPred))))
       |    // len(string_split(text, ' '))
       |   + 3000 * least(len(string_split(text, ' ')), 100) AS quality_micro
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Language-ID heuristic: per-language marker-token frequency with a
    * deterministic argmax. Marker occurrences are counted with
    * length/replace arithmetic so an independent SQL engine computes
    * the identical score. */
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ", "es" -> " el ", "de" -> " der ", "fr" -> " le ", "zh" -> " de ")

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val padded = "concat(' ', text, ' ')"
    val base = Tables.documents(spark, sfDir)
    val withCounts = langMarkers.foldLeft(base) { case (df, (lang, marker)) =>
      df.withColumn(s"c_$lang", expr(
        s"(length($padded) - length(replace($padded, '$marker', ''))) / ${marker.length}"))
    }
    val langs = langMarkers.map(_._1)
    val pred = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString(" ")
    withCounts
      .withColumn("lang_pred", expr(s"CASE $pred ELSE 'und' END"))
      .select("doc_id" +: langs.map(l => s"c_$l") :+ "lang_pred" map col: _*)
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    val padded = "concat(' ', text, ' ')"
    val counts = langMarkers.map { case (lang, marker) =>
      s"(length($padded) - length(replace($padded, '$marker', ''))) / ${marker.length} AS c_$lang"
    }.mkString(",\n  ")
    val langs = langMarkers.map(_._1)
    val pred = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"c_$l").mkString(", ")},
       |  CASE $pred ELSE 'und' END AS lang_pred
       |FROM (SELECT doc_id, $counts FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting (rolling hash + md5-based 60-bit id)
    * over whitespace-normalized lowercase text. The rolling hash is a
    * left fold (h*31 + codepoint) mod 1e9+7 — expressible in both
    * engines, stable under repartitioning. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = expr("lower(trim(regexp_replace(text, '\\\\s+', ' ')))")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        expr("cast(conv(substring(md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))), 1, 15), 16, 10) as bigint)")
          .as("fp_md5_60"),
        // native codegen'd Expression — see RollingHash for why this
        // beats the aggregate(transform(split...)) built-in formulation
        RollingHash.rolling_hash(norm).as("fp_rolling"))
      .orderBy("doc_id")
  }

  val fingerprintSql: String = {
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    s"""SELECT doc_id,
       |  ('0x' || substr(md5($norm), 1, 15))::BIGINT AS fp_md5_60,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($norm, ''), c -> CAST(ord(c) AS BIGINT))),
       |    (h, x) -> (h * 31 + x) % 1000000007) AS fp_rolling
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------- repetition filters

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1, applied to
    * word bigrams): fraction of bigram occurrences belonging to the
    * most common bigram and to any repeated bigram, plus a threshold
    * flag. Highly repetitive documents (boilerplate, generated spam)
    * are the classic training-data drop. Two hash-aggregations — the
    * shuffle carries one row per (doc, distinct bigram), then one per
    * doc; linear at corpus scale. Single-token docs have no bigrams and
    * drop out, exactly as in the oracle. */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    // Whole census per row via the native one-pass expression
    // (graft.functions.BigramRepStats): a bigram never matters beyond
    // its own document, so the former explode(transform(...)) →
    // groupBy(doc_id, bg) → groupBy(doc_id) pipeline — an interpreted
    // higher-order transform feeding a corpus-sized bigram-string
    // shuffle plus a per-doc shuffle — folds into the documents scan.
    // Zero exchanges; bit-identical aggregates (spec-pinned against
    // the exploded form). Docs with < 2 tokens return a null struct
    // and drop out, exactly as they were absent from the old groupBy.
    Tables.documents(spark, sfDir)
      .withColumn("__st",
        graft.functions.BigramRepStats.bigram_rep_stats(col("text")))
      .where(col("__st").isNotNull)
      .select(col("doc_id"),
        col("__st.n_bigrams").as("n_bigrams"),
        col("__st.top_bigram_cnt").as("top_bigram_cnt"),
        col("__st.dup_bigram_cnt").as("dup_bigram_cnt"))
      .withColumn("top_frac", round(col("top_bigram_cnt") * lit(1.0) / col("n_bigrams"), 6))
      .withColumn("dup_frac", round(col("dup_bigram_cnt") * lit(1.0) / col("n_bigrams"), 6))
      .withColumn("repetitive", (col("dup_frac") >= 0.2).cast("int"))
      .select("doc_id", "n_bigrams", "top_bigram_cnt", "dup_bigram_cnt",
        "top_frac", "dup_frac", "repetitive")
      .orderBy("doc_id")
  }

  val repetitionStatsSql: String = {
    val toks = "string_split(text, ' ')"
    s"""WITH bg AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len($toks) - 1),
       |    i -> $toks[i] || ' ' || $toks[i + 1])) AS bg
       |  FROM documents WHERE len($toks) >= 2),
       |cnts AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY doc_id, bg)
       |SELECT doc_id,
       |  CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       |  max(cnt) AS top_bigram_cnt,
       |  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_bigram_cnt,
       |  round(max(cnt) * 1.0 / sum(cnt), 6) AS top_frac,
       |  round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt), 6) AS dup_frac,
       |  CAST(round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt), 6) >= 0.2 AS INT) AS repetitive
       |FROM cnts GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ PII redaction

  /** PII patterns: email, North-American-style phone (ddd-dddd), and
    * IPv4 — written to run identically under Java regex (Spark) and
    * RE2 (DuckDB). */
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe    = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val phoneRe = "[0-9]{3}-[0-9]{4}"

  /** Redact emails, IPv4s, and phone-like numbers from a string column
    * — the standard scrub stage before text enters a training corpus.
    * Order matters: IPs before phones so a phone pattern never matches
    * inside an address. Pure codegen'd regexp_replace chain. */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")

  /** q46: PII scrub census over events. The corpus carries no real PII,
    * so the query first synthesizes a deterministic dirty contact
    * string from the event's own columns — IDENTICALLY in Spark and in
    * the oracle SQL, so the redaction itself is what gets
    * hash-verified: per-kind counts plus the scrubbed text. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty =
      """concat('contact user', user_id, ' at user', user_id,
        |  '@example.com or 555-', lpad(cast(event_id % 10000 as string), 4, '0'),
        |  ' from 10.', user_id % 256, '.', event_id % 256, '.1 re ', event_type)"""
        .stripMargin
    // Spark SQL string literals eat single backslashes ('\.' -> '.'),
    // so patterns embedded in expr() need their backslashes doubled;
    // the Column-API redactPii path takes the raw pattern untouched.
    def lit(re: String): String = re.replace("\\", "\\\\")
    Tables.events(spark, sfDir)
      .withColumn("dirty", expr(dirty))
      .withColumn("n_email", expr(s"size(regexp_extract_all(dirty, '${lit(emailRe)}', 0))"))
      .withColumn("n_ip", expr(s"size(regexp_extract_all(dirty, '${lit(ipRe)}', 0))"))
      .withColumn("n_phone", expr(
        s"size(regexp_extract_all(regexp_replace(dirty, '${lit(ipRe)}', '<IP>'), '${lit(phoneRe)}', 0))"))
      .withColumn("clean", redactPii(col("dirty")))
      .select("event_id", "n_email", "n_ip", "n_phone", "clean")
      .orderBy("event_id")
  }

  val piiRedactSql: String = {
    val dirty =
      """'contact user' || user_id || ' at user' || user_id ||
        |  '@example.com or 555-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' from 10.' || user_id % 256 || '.' || event_id % 256 || '.1 re ' || event_type"""
        .stripMargin
    s"""WITH d AS (SELECT event_id, $dirty AS dirty FROM events)
       |SELECT event_id,
       |  len(regexp_extract_all(dirty, '$emailRe')) AS n_email,
       |  len(regexp_extract_all(dirty, '$ipRe')) AS n_ip,
       |  len(regexp_extract_all(regexp_replace(dirty, '$ipRe', '<IP>', 'g'), '$phoneRe')) AS n_phone,
       |  regexp_replace(regexp_replace(regexp_replace(dirty,
       |    '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g'), '$phoneRe', '<PHONE>', 'g') AS clean
       |FROM d ORDER BY event_id""".stripMargin
  }
}

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
    val stopPred = stopwords.map(w => s"x = '$w'").mkString(" OR ")
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " ")) // tokenize once, not per expression
      .withColumn("n_tokens", expr("size(toks)"))
      .withColumn("n_bpeish", expr(
        "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))"))
      .withColumn("stop_cnt", expr(s"size(filter(toks, x -> $stopPred))"))
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
}

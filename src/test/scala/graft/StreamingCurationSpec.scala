package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr, size, split}

import graft.operators.DedupOps
import graft.streaming.StreamingCuration

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val corpusDocs = Seq(
    (100L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon")),
    (200L, ("one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"))
  )

  private val nearDup = // corpus doc 100 with one word changed
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau omega"
  private val novel =
    "completely different content about spark catalyst plans and " +
      "tungsten codegen with many distinct happy interesting shiny new words " +
      "plus extra unique vocabulary items everywhere"
  private val tooShort = "just a few words"
  private val oneToken = "solo"

  test("admission verdicts: quality rejects, provable novelty admits, band hits verify") {
    val corpusSig = DedupOps.minhashSignaturesOf(corpusDocs.toDF("doc_id", "text"))
    val bloom = StreamingCuration.corpusBandBloom(corpusSig)
    val stream = Seq(
      (1L, nearDup), (2L, novel), (3L, tooShort), (4L, oneToken),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = StreamingCuration.admissions(stream, bloom)
      .select("doc_id", "verdict", "reasons")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 5, "no doc may vanish from the admission stream")
    // Bloom filters have no false negatives: the near-dup MUST route
    // to verification
    assert(got(1L)._1 == "needs_verify", s"near-dup got ${got(1L)}")
    // fixed data + deterministic bloom seeds: the novel doc admits
    assert(got(2L)._1 == "admit", s"novel doc got ${got(2L)}")
    assert(got(3L)._1 == "reject_quality" && got(3L)._2.contains("too_short"))
    assert(got(4L)._1 == "reject_quality",
      "an unsignable one-token doc must be rejected, not dropped")
    // malformed input: every quality rule evaluates to null on null
    // text, so without an explicit null rule the gate would ADMIT it
    assert(got(5L)._1 == "reject_quality" && got(5L)._2.contains("null_text"),
      s"null text must reject, not slide through the gate: ${got(5L)}")
  }

  test("admissions run as a structured stream with identical verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val corpusSig = DedupOps.minhashSignaturesOf(corpusDocs.toDF("doc_id", "text"))
    val bloom = StreamingCuration.corpusBandBloom(corpusSig)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingCuration.admissions(mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("sc_admissions")
      .outputMode("append").start()
    try {
      mem.addData((1L, nearDup), (2L, novel), (3L, tooShort))
      q.processAllAvailable()
      val got = spark.table("sc_admissions")
        .select("doc_id", "verdict").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "needs_verify", 2L -> "admit", 3L -> "reject_quality"))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sc_admissions")
    }
  }

  test("needs_verify routes into the exact verifier and confirms the dup") {
    val corpusSig = DedupOps.minhashSignaturesOf(corpusDocs.toDF("doc_id", "text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusSig.count()
    val bloom = StreamingCuration.corpusBandBloom(corpusSig)
    val stream = Seq((1L, nearDup), (2L, novel)).toDF("doc_id", "text")
    val flagged = StreamingCuration.admissions(stream, bloom)
      .where($"verdict" === "needs_verify").select("doc_id")
    val verify = graft.streaming.StreamingDedup.nearDupMatches(
        stream.join(flagged, "doc_id"), corpusSig)
      .select("new_id", "corpus_id").as[(Long, Long)].collect()
    corpusSig.unpersist()
    assert(verify.toSet == Set((1L, 100L)),
      s"verifier must confirm exactly the near-dup: ${verify.mkString(",")}")
  }

  test("native quality columns match the higher-order forms they replaced") {
    // r16: withQuality swapped the lambda-based distinct-bigram count
    // and stop-token count for native codegen forms (PERF §47); this
    // pins value parity against the EXACT old expressions on docs that
    // exercise duplicates, stop-word density, empties, and unicode
    val tricky = Seq(
      (90001L, "the a the a the a the a the a the a the a the a the a the a"),
      (90002L, "rep rep rep rep rep rep rep rep rep rep rep rep rep rep"),
      (90003L, ""), (90004L, "solo"), (90005L, " leading the  double "),
      (90006L, "日本 語 the テスト a 🙂"), (90007L, null.asInstanceOf[String])) ++
      Tables.documents(spark, sf).select("doc_id", "text")
        .as[(Long, String)].collect().toSeq
    val df = tricky.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val cmp = df.select(
      expr("size(filter(toks, x -> x = 'the' OR x = 'a'))").as("stop_old"),
      expr("size(toks) - size(array_remove(array_remove(toks, 'the'), 'a'))")
        .as("stop_new"),
      expr(s"size(${DedupOps.bigramsE})").as("nbg_old"),
      size(graft.functions.ShingleHashes.shingle_hashes(col("text"))).as("nbg_new"))
      .collect()
    cmp.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getInt(0) == r.getInt(1)), s"stop count: $r")
      assert(r.isNullAt(2) == r.isNullAt(3) &&
        (r.isNullAt(2) || r.getInt(2) == r.getInt(3)), s"bigram count: $r")
    }
    // and the assembled verdict columns are unchanged end-to-end
    val out = StreamingCuration.withQuality(df.drop("toks"))
      .select("doc_id", "reasons", "pass").as[(Long, String, Int)]
      .collect().map { case (d, r, p) => d -> ((r, p)) }.toMap
    assert(out(90001L)._1.contains("high_stopword"))
    assert(out(90002L)._1.contains("repetitive"))
    assert(out(90007L)._1.startsWith("null_text") && out(90007L)._2 == 0)
  }
}

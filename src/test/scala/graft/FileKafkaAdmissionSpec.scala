package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.DedupOps
import graft.sources.FileKafka
import graft.streaming.StreamingDedup

/** Streaming admission end-to-end through the FileKafka source with a
  * checkpoint kill/resume (VERDICT r18 stretch #7): the admission
  * gates were previously only driven by MemoryStream, which never
  * exercises offset checkpointing. This spec runs the near-dup gate
  * off a filekafka topic, stops the query at a batch boundary,
  * produces more records — including an at-least-once REPLAY of an
  * already-judged document — resumes on the same checkpoint, and
  * pins the verdict set to be identical to an uninterrupted run's:
  * no verdict lost, none duplicated (source offsets restart from the
  * checkpoint; the stateful pair-dedup state survives the restart and
  * suppresses the replayed document's re-verdict). */
class FileKafkaAdmissionSpec extends SparkSpec {
  import spark.implicits._

  test("admission verdicts are exactly-once across a kill/resume at a batch boundary") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (200L, "an entirely different corpus document about spark plans")
    ).toDF("doc_id", "text")
    val table = "fk_adm_corpus"
    StreamingDedup.stageCorpusBands(spark,
      DedupOps.minhashSignaturesOf(corpus), table, buckets = 4)
    try {
      val topic = "docs"
      def rec(id: Long, text: String) = s"$id|$text"
      val d1 = rec(1L, "the quick brown fox leaps over the lazy dog again and again")
      val d2 = rec(2L, "completely unrelated text with no shared shingles at all")
      val d3 = rec(3L, "an entirely different corpus document about spark plans")
      val d4 = rec(4L, "novel words nowhere else either way entirely fresh tokens")

      // the gate: filekafka envelope -> (doc_id, text) -> bucketed
      // stream-static near-dup probe. maxOffsetsPerTrigger=2 forces
      // multiple micro-batches per drain so the checkpoint actually
      // records intermediate batch boundaries.
      def admission(sourceDir: String): DataFrame = {
        val parsed = FileKafka.stream(spark, sourceDir, topic,
            maxOffsetsPerTrigger = Some(2L))
          .selectExpr("cast(value as string) as raw")
          .select(
            split(col("raw"), "\\|").getItem(0).cast("long").as("doc_id"),
            split(col("raw"), "\\|").getItem(1).as("text"))
        StreamingDedup.nearDupMatchesBucketed(parsed, spark, table)
      }
      // Trigger.AvailableNow drains what exists, then STOPS — each
      // drain call is a full query lifecycle ending at a committed
      // batch boundary, so back-to-back drains on one checkpoint are
      // exactly the kill/resume sequence.
      def drain(sourceDir: String, out: String, ckpt: String): Unit = {
        val q = admission(sourceDir).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def verdicts(out: String): Seq[(Long, Long, Double)] =
        spark.read.parquet(out)
          .select("new_id", "corpus_id", "est_jaccard")
          .as[(Long, Long, Double)].collect().toSeq.sorted

      // ---- interrupted run: wave 1, stop, wave 2 (incl. an
      // at-least-once replay of d1), resume on the same checkpoint
      val dir = Files.createTempDirectory("fk_adm").toString
      val out = Files.createTempDirectory("fk_adm_out").toString + "/m"
      val ckpt = Files.createTempDirectory("fk_adm_ck").toString
      FileKafka.produceStrings(dir, topic, 0, Seq(d1, d2))
      drain(dir, out, ckpt)
      val afterWave1 = verdicts(out)
      assert(afterWave1.map(v => (v._1, v._2)) == Seq((1L, 100L)),
        s"wave 1 must flag exactly d1: $afterWave1")
      FileKafka.produceStrings(dir, topic, 0, Seq(d3, d4, d1))
      drain(dir, out, ckpt) // resume: offsets + dedup state from ckpt
      val resumed = verdicts(out)

      // ---- uninterrupted control: the same record sequence (incl.
      // the replay) through one run on fresh topic/sink/checkpoint
      val dir2 = Files.createTempDirectory("fk_adm2").toString
      val out2 = Files.createTempDirectory("fk_adm_out2").toString + "/m"
      val ckpt2 = Files.createTempDirectory("fk_adm_ck2").toString
      FileKafka.produceStrings(dir2, topic, 0, Seq(d1, d2, d3, d4, d1))
      drain(dir2, out2, ckpt2)
      val control = verdicts(out2)

      assert(resumed == control,
        s"kill/resume verdicts must equal the uninterrupted run's:\n" +
          s"  resumed=$resumed\n  control=$control")
      assert(resumed.map(v => (v._1, v._2)) == Seq((1L, 100L), (3L, 200L)),
        s"expected exactly (d1->c100, d3->c200): $resumed")
      assert(resumed.count(_._1 == 1L) == 1,
        "the replayed d1 record must not re-emit its verdict " +
          "(pair-dedup state must survive the restart)")
      assert(resumed.find(_._1 == 3L).exists(_._3 == 1.0),
        "exact twin must carry est_jaccard 1.0 after the resume")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}

package graft

import graft.sinks.{FileKafkaProducerClient, KafkaProducerOps}
import graft.sinks.KafkaProducerOps.RecordMetadata
import graft.sources.FileKafka

/** K8: the four producer send modes over the file-backed broker. */
class ProducerModesSpec extends SparkSpec {

  private def fixture(parts: Int = 1): (KafkaProducerOps.Producer, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_prod").toString
    (new KafkaProducerOps.Producer(new FileKafkaProducerClient(dir, "t", parts)), dir)
  }

  private def values(dir: String): Seq[String] =
    FileKafka.batch(spark, dir, "t").selectExpr("CAST(value AS STRING)")
      .collect().map(_.getString(0)).toSeq

  test("sendSingle flushes immediately; without-flush stays invisible until flush/close") {
    val (prod, dir) = fixture()
    prod.sendSingle("m1")
    assert(values(dir) == Seq("m1"))
    val pending = prod.sendSingleWithoutFlush("m2")
    assert(values(dir) == Seq("m1"), "unflushed send must not be visible")
    assert(!pending.isCompleted, "delivery future completes only at flush")
    prod.close() // close flushes, kafka semantics
    assert(values(dir) == Seq("m1", "m2"))
    assert(pending.isCompleted)
  }

  test("sendSync blocks for the ack and returns topic/partition/offset") {
    val (prod, dir) = fixture()
    assert(prod.sendSync("a") == RecordMetadata("t", 0, 0L))
    assert(prod.sendSync("b") == RecordMetadata("t", 0, 1L)) // dense offsets
    assert(values(dir) == Seq("a", "b"))
  }

  test("sendBatch assigns prefix-i / extracted keys and flushes periodically") {
    val (prod, dir) = fixture()
    prod.sendSyncWaitAll(Seq("x", "y"), keyPrefix = Some("order"))
    val keyed = FileKafka.batch(spark, dir, "t")
      .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(keyed == Set(("order-1", "x"), ("order-2", "y")))
    // key_field analogue: extractor wins over prefix
    prod.sendSyncWaitAll(Seq("id=7|payload"), keyPrefix = Some("order"),
      keyOf = Some(_.split('|').head))
    val keys = FileKafka.batch(spark, dir, "t")
      .selectExpr("CAST(key AS STRING)").collect().map(_.getString(0)).toSet
    assert(keys.contains("id=7"))
  }

  test("sendSyncWaitAll returns all metadata in send order; keys route partitions") {
    val (prod, _) = fixture(parts = 4)
    val md = prod.sendSyncWaitAll((1 to 8).map(i => s"m$i"), keyPrefix = Some("k"))
    assert(md.size == 8)
    assert(md.forall(_.topic == "t"))
    // same key -> same partition (kafka partitioner contract)
    val byKeyPart = prod.sendSyncWaitAll(Seq("p", "q"), keyOf = Some(_ => "fixed"))
    assert(byKeyPart.map(_.partition).distinct.size == 1)
    assert(byKeyPart(1).offset == byKeyPart(0).offset + 1)
  }

  test("sendWithCallback fires success callbacks with real offsets") {
    val (prod, _) = fixture()
    val got = scala.collection.mutable.ArrayBuffer.empty[RecordMetadata]
    var errors = 0
    prod.sendWithCallback(Seq("a", "b", "c"),
      onSuccess = got += _, onError = _ => errors += 1)
    assert(got.map(_.offset).sorted == Seq(0L, 1L, 2L))
    assert(errors == 0)
  }
}

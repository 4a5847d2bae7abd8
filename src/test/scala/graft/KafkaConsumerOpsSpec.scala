package graft

import java.nio.file.Files

import graft.sources.{FileKafka, FileKafkaConsumerClient, FileKafkaProbe, KafkaConsumerOps}
import graft.sources.KafkaConsumerOps.ConsumedMessage
import org.scalatest.funsuite.AnyFunSuite

/** The reference's six Kafka consume modes
  * (utils/kafka_consumer_utils.py:155-706) over the injectable
  * consumer client, bound to the FileKafka broker — real offsets,
  * real seek, real position continuation. */
class KafkaConsumerOpsSpec extends AnyFunSuite {

  private def freshTopic(): (String, String) = {
    val dir = Files.createTempDirectory("graft_consumer").toString
    val topic = "orders"
    FileKafka.produceStrings(dir, topic, 0, (0 until 5).map(i => s"p0-$i"), 1000L)
    FileKafka.produceStrings(dir, topic, 1, (0 until 3).map(i => s"p1-$i"), 2000L)
    (dir, topic)
  }

  test("mode 1 consumeOnce: bounded by max-messages, position continues across calls") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic, maxPollRecords = 5))
    val first = c.consumeOnce(maxMessages = 5, timeoutMs = 2000L)
    assert(first.size == 5)
    assert(first.forall(_.partition == 0))
    assert(first.map(_.offset) == (0L until 5L))
    // the client position advanced only past DELIVERED records
    val rest = c.consumeOnce(maxMessages = 10, timeoutMs = 300L)
    assert(rest.size == 3)
    assert(rest.forall(_.partition == 1))
  }

  test("mode 2 consumeWithTimeout: everything available within the window") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic))
    val got = c.consumeWithTimeout(timeoutMs = 300L)
    assert(got.size == 8)
    assert(got.map(m => (m.partition, m.offset)).toSet ==
      ((0 until 5).map(i => (0, i.toLong)) ++ (0 until 3).map(i => (1, i.toLong))).toSet)
  }

  test("mode 3 consumeContinuous: callback per message, stop-control ends the loop") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic))
    val seen = scala.collection.mutable.ArrayBuffer.empty[ConsumedMessage]
    val n = c.consumeContinuous(
      callback = seen += _,
      stop = () => seen.size >= 8)
    assert(n == 8 && seen.size == 8)
  }

  test("mode 4 consumeWithCallback: stats, error counting, processor-requested stop") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic))
    var calls = 0
    val stats = c.consumeWithCallback(
      processor = m => {
        calls += 1
        if (m.partition == 0 && m.offset == 2L) sys.error("boom")
        calls < 5 // request stop at the 5th processed message
      },
      timeoutMs = Some(2000L))
    assert(stats.totalMessages == 5)
    assert(stats.processingErrors == 1)
    assert(stats.processedSuccessfully == 4)
  }

  test("mode 5 consumeFromOffset: assign + seek starts exactly there") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic))
    val got = c.consumeFromOffset(partition = 0, offset = 3L,
      maxMessages = 10, timeoutMs = 300L)
    assert(got.map(_.offset) == Seq(3L, 4L))
    assert(got.map(_.value) == Seq(Some("p0-3"), Some("p0-4")))
    assert(got.forall(_.partition == 0), "assign(0) must exclude partition 1")
  }

  test("mode 6 consumeLatest: seek-to-end skips history, sees only new records") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic))
    val producer = new Thread(() => {
      Thread.sleep(100L)
      FileKafka.produceStrings(dir, topic, 0, Seq("new-a", "new-b", "new-c"), 3000L)
    })
    producer.start()
    val got = c.consumeLatest(maxMessages = 3, timeoutMs = 5000L)
    producer.join()
    assert(got.size == 3)
    assert(got.forall(m => m.partition == 0 && m.offset >= 5L),
      s"historical records leaked: $got")
    assert(got.map(_.value.get).toSet == Set("new-a", "new-b", "new-c"))
  }

  test("topicPartitionsInfo mirrors the reference's partition stats") {
    val (dir, topic) = freshTopic()
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, topic))
    val info = c.topicPartitionsInfo()
    assert(info.topic == topic && info.partitionCount == 2)
    assert(info.partitions(0).messageCount == 5 && info.partitions(1).messageCount == 3)
    assert(info.totalMessages == 8)
  }

  test("null-value tombstones round-trip (produce empty field, consume None)") {
    val dir = Files.createTempDirectory("graft_tomb").toString
    FileKafka.produce(dir, "t", 0, Seq(
      ("k1".getBytes, "v1".getBytes),
      ("k2".getBytes, null), // tombstone
      (null, "v3".getBytes)))
    val c = new KafkaConsumerOps.Consumer(new FileKafkaConsumerClient(dir, "t"))
    val got = c.consumeOnce(maxMessages = 3, timeoutMs = 1000L)
    assert(got.map(_.value) == Seq(Some("v1"), None, Some("v3")))
    assert(got.map(_.key) == Seq(Some("k1"), Some("k2"), None))
  }

  test("partition reader slice is Long-safe past Int.MaxValue") {
    val dir = Files.createTempDirectory("graft_long").toString
    FileKafka.produceStrings(dir, "t", 0, (0 until 5).map(i => s"m$i"))
    val file = new java.io.File(s"$dir/t/p0.log").getPath
    // an interior slice reads exactly its records
    assert(FileKafkaProbe.readSlice(file, "t", 0, 1L, 3L) ==
      Seq((1L, "m1"), (2L, "m2")))
    // a slice starting past Int.MaxValue must read NOTHING — the old
    // .toInt wrap replayed from a bogus position instead
    val big = Int.MaxValue.toLong + 10L
    assert(FileKafkaProbe.readSlice(file, "t", 0, big, big + 2L).isEmpty)
  }
}

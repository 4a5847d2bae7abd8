package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.{KafkaAdmin, KafkaAdminClient}
import graft.tools.KafkaAdmin._

/** In-memory broker model driving the ST7 admin surface — the
  * injectable-client pattern that a real kafka-clients binding
  * implements 1:1. */
class StubKafkaClient extends KafkaAdminClient {
  final case class Partition(var low: Long = 0L, var high: Long = 0L)
  final case class Topic(
      spec: TopicSpec,
      partitions: scala.collection.mutable.Map[Int, Partition],
      config: scala.collection.mutable.Map[String, ConfigEntry])

  val topics = scala.collection.mutable.LinkedHashMap.empty[String, Topic]
  val groups = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.Map[(String, Int), Long]]
  var closed = false

  /** Test hook: append `n` messages to a partition. */
  def produce(topic: String, partition: Int, n: Long): Unit =
    topics(topic).partitions(partition).high += n

  override def createTopic(name: String, spec: TopicSpec): Unit = {
    if (topics.contains(name)) sys.error(s"Topic '$name' already exists.")
    topics(name) = Topic(spec,
      scala.collection.mutable.Map((0 until spec.numPartitions).map(_ -> Partition()): _*),
      scala.collection.mutable.Map(spec.config.map { case (k, v) => k -> ConfigEntry(v) }.toSeq: _*))
  }
  override def deleteTopic(name: String): Unit =
    if (topics.remove(name).isEmpty) sys.error(s"Topic '$name' does not exist.")
  override def listTopics(): Map[String, TopicMeta] =
    topics.map { case (n, t) =>
      n -> TopicMeta(t.partitions.keys.map(p => p -> PartitionMeta(1, Seq(1), Seq(1))).toMap)
    }.toMap
  override def watermarks(topic: String, partition: Int): Watermarks = {
    val p = topics(topic).partitions(partition)
    Watermarks(p.low, p.high)
  }
  override def describeConfig(topic: String): Map[String, ConfigEntry] =
    topics.get(topic).map(_.config.toMap)
      .getOrElse(sys.error(s"Topic '$topic' does not exist."))
  override def alterConfig(topic: String, config: Map[String, String]): Unit = {
    val t = topics.getOrElse(topic, sys.error(s"Topic '$topic' does not exist."))
    config.foreach { case (k, v) => t.config(k) = ConfigEntry(v) }
  }
  override def createPartitions(topic: String, newTotal: Int): Unit = {
    val t = topics(topic)
    (t.partitions.size until newTotal).foreach(p => t.partitions(p) = Partition())
  }
  override def listGroups(): Seq[String] = groups.keys.toSeq
  override def describeGroup(groupId: String): GroupMeta =
    if (groups.contains(groupId)) GroupMeta("Stable", 1)
    else sys.error(s"Group '$groupId' does not exist.")
  override def committed(groupId: String, topic: String, partition: Int): Option[Long] =
    groups.get(groupId).flatMap(_.get((topic, partition)))
  override def commitOffsets(groupId: String, offsets: Map[(String, Int), Long]): Unit = {
    val g = groups.getOrElseUpdate(groupId, scala.collection.mutable.Map.empty)
    offsets.foreach { case (tp, o) => g(tp) = o }
  }
  override def describeCluster(): ClusterMeta =
    ClusterMeta("stub-cluster", 1, Seq(BrokerMeta(1, "localhost", 9092)))
  override def close(): Unit = closed = true
}

class KafkaAdminSpec extends AnyFunSuite {

  private def fixture: (KafkaAdmin, StubKafkaClient) = {
    val stub = new StubKafkaClient
    (new KafkaAdmin(stub), stub)
  }

  test("create/list/exists/delete topic round-trip with reference status shape") {
    val (admin, _) = fixture
    assert(admin.createTopic("orders", numPartitions = 3).isSuccess)
    assert(admin.createTopic("orders").status == "error") // duplicate -> error result, no throw
    assert(admin.topicExists("orders") && !admin.topicExists("nope"))
    assert(admin.listTopics() == Map("orders" -> TopicSummary(3, Seq(0, 1, 2))))
    assert(admin.deleteTopic("orders").isSuccess)
    assert(admin.deleteTopic("orders").status == "error")
    assert(admin.listTopics().isEmpty)
  }

  test("message counts come from watermark offsets per partition") {
    val (admin, stub) = fixture
    admin.createTopic("t", numPartitions = 2)
    stub.produce("t", 0, 10)
    stub.produce("t", 1, 5)
    val mc = admin.topicMessageCount("t").toOption.get
    assert(mc.totalMessages == 15 && mc.partitionCount == 2)
    assert(mc.partitions(0).count == 10 && mc.partitions(1).count == 5)
    assert(admin.topicMessageCount("missing") == Left("Topic missing not found"))
    val info = admin.topicInfo("t").toOption.get
    assert(info.messageCount == 15 && info.partitionCount == 2)
    assert(info.partitions(0).leader == 1)
  }

  test("topic config: describe reflects alter") {
    val (admin, _) = fixture
    admin.createTopic("cfg", config = Map("retention.ms" -> "1000"))
    assert(admin.describeTopicConfig("cfg").toOption.get("retention.ms").value == "1000")
    assert(admin.alterTopicConfig("cfg", Map("retention.ms" -> "2000")).isSuccess)
    assert(admin.describeTopicConfig("cfg").toOption.get("retention.ms").value == "2000")
    assert(admin.describeTopicConfig("missing").isLeft)
  }

  test("increase_partitions validates monotonic growth") {
    val (admin, _) = fixture
    admin.createTopic("p", numPartitions = 2)
    assert(admin.increasePartitions("p", 2).status == "error") // not greater
    assert(admin.increasePartitions("missing", 4).status == "error")
    assert(admin.increasePartitions("p", 4).isSuccess)
    assert(admin.listTopics()("p").partitions == 4)
  }

  test("consumer groups: list/describe/offsets/alter") {
    val (admin, stub) = fixture
    admin.createTopic("t", numPartitions = 2)
    assert(admin.listConsumerGroups().isEmpty)
    assert(admin.alterConsumerGroupOffsets("g1", Map("t" -> Map(0 -> 7L, 1 -> 3L))).isSuccess)
    assert(admin.listConsumerGroups() == Seq("g1"))
    assert(admin.describeConsumerGroups(Seq("g1", "gX"))("g1").toOption.get.state == "Stable")
    assert(admin.describeConsumerGroups(Seq("gX"))("gX").isLeft)
    // never-committed partitions are omitted, like the reference's offset >= 0 filter
    stub.commitOffsets("g2", Map(("t", 0) -> 1L))
    assert(admin.consumerGroupOffsets("g2") == Map("t" -> Map(0 -> 1L)))
    assert(admin.consumerGroupOffsets("g1") == Map("t" -> Map(0 -> 7L, 1 -> 3L)))
  }

  test("consumer lag = end offset - committed, 0-committed default") {
    val (admin, stub) = fixture
    admin.createTopic("t", numPartitions = 2)
    stub.produce("t", 0, 10)
    stub.produce("t", 1, 4)
    admin.alterConsumerGroupOffsets("g", Map("t" -> Map(0 -> 6L)))
    val lag = admin.consumerLag("g", "t").toOption.get
    assert(lag.partitions(0) == PartitionLag(6, 10, 4))
    assert(lag.partitions(1) == PartitionLag(0, 4, 4)) // never committed -> 0
    assert(lag.totalLag == 8)
    assert(admin.consumerLag("g", "missing").isLeft)
  }

  test("describe_cluster and close pass through the client") {
    val (admin, stub) = fixture
    val c = admin.describeCluster()
    assert(c.clusterId == "stub-cluster" && c.brokers.head.port == 9092)
    admin.close()
    assert(stub.closed)
  }
}

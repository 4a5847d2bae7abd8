package graft.tools

import scala.util.{Failure, Success, Try}

/** Kafka administration toolkit (SURVEY.md §2.10 ST7) — the
  * reference's 16-operation topic/offset/consumer-group surface
  * (utils/kafka_admin_utils.py:55-585) on an injectable protocol
  * client.
  *
  * The broker protocol is abstracted behind [[KafkaAdminClient]] (the
  * same injectable-transport pattern as
  * `graft.sources.OrderApiIngest.Transport`): the offline image has no
  * kafka-clients jar, so tests drive an in-memory stub; binding to a
  * real cluster is one class implementing the trait over
  * `org.apache.kafka.clients.admin.AdminClient` +
  * `KafkaConsumer#{beginningOffsets,endOffsets,committed}` — each
  * trait method maps 1:1 to one client call.
  *
  * Error shape follows the reference: mutating ops return a per-topic
  * [[KafkaAdmin.OpResult]] with status success/error rather than
  * throwing (kafka_admin_utils.py:80-91), read ops surface typed
  * results and propagate lookup failures as `Left(message)`.
  */
object KafkaAdmin {

  final case class TopicSpec(
      numPartitions: Int = 1,
      replicationFactor: Short = 1,
      config: Map[String, String] = Map.empty)

  final case class PartitionMeta(leader: Int, replicas: Seq[Int], isrs: Seq[Int])
  final case class TopicMeta(partitions: Map[Int, PartitionMeta])
  /** Low/high watermark offsets of one partition. */
  final case class Watermarks(low: Long, high: Long) { def count: Long = high - low }
  final case class ConfigEntry(
      value: String, isDefault: Boolean = false,
      isReadOnly: Boolean = false, isSensitive: Boolean = false)
  final case class GroupMeta(state: String, memberCount: Int)
  final case class BrokerMeta(id: Int, host: String, port: Int)
  final case class ClusterMeta(clusterId: String, controllerId: Int, brokers: Seq[BrokerMeta])

  final case class OpResult(status: String, message: String) {
    def isSuccess: Boolean = status == "success"
  }
  object OpResult {
    def success(msg: String): OpResult = OpResult("success", msg)
    def error(msg: String): OpResult = OpResult("error", msg)
    def of(t: Try[Unit], okMsg: String): OpResult = t match {
      case Success(_) => success(okMsg)
      case Failure(e) => error(Option(e.getMessage).getOrElse(e.toString))
    }
  }

  /** list_topics entry: partition count + ids (kafka_admin_utils.py:93-115). */
  final case class TopicSummary(partitions: Int, partitionIds: Seq[Int])
  /** get_topic_message_count result (:140-197). */
  final case class MessageCount(
      topic: String, partitions: Map[Int, Watermarks], totalMessages: Long,
      partitionCount: Int)
  /** get_topic_info result (:199-239). */
  final case class TopicInfo(
      topic: String, partitionCount: Int, partitions: Map[Int, PartitionMeta],
      messageCount: Long, partitionMessageCounts: Map[Int, Watermarks])
  /** get_consumer_lag per-partition row (:491-550). */
  final case class PartitionLag(committedOffset: Long, endOffset: Long, lag: Long)
  final case class ConsumerLag(
      groupId: String, topic: String, partitions: Map[Int, PartitionLag], totalLag: Long)
}

/** Protocol primitives — one method per broker RPC the reference's
  * toolkit touches. Implementations: a real binding wraps
  * kafka-clients' AdminClient/KafkaConsumer; tests inject an
  * in-memory stub. Methods throw on broker errors; [[KafkaAdmin]]
  * converts to the reference's status-result shape. */
trait KafkaAdminClient extends AutoCloseable {
  import KafkaAdmin._
  def createTopic(name: String, spec: TopicSpec): Unit
  def deleteTopic(name: String): Unit
  def listTopics(): Map[String, TopicMeta]
  def watermarks(topic: String, partition: Int): Watermarks
  def describeConfig(topic: String): Map[String, ConfigEntry]
  def alterConfig(topic: String, config: Map[String, String]): Unit
  def createPartitions(topic: String, newTotal: Int): Unit
  def listGroups(): Seq[String]
  def describeGroup(groupId: String): GroupMeta
  /** Committed offset of (group, topic, partition); None if never committed. */
  def committed(groupId: String, topic: String, partition: Int): Option[Long]
  def commitOffsets(groupId: String, offsets: Map[(String, Int), Long]): Unit
  def describeCluster(): ClusterMeta
  def close(): Unit
}

class KafkaAdmin(client: KafkaAdminClient) extends AutoCloseable {
  import KafkaAdmin._

  /** 1. create_topic (kafka_admin_utils.py:55-91). */
  def createTopic(name: String, numPartitions: Int = 1,
                  replicationFactor: Short = 1,
                  config: Map[String, String] = Map.empty): OpResult =
    OpResult.of(Try(client.createTopic(name,
        TopicSpec(numPartitions, replicationFactor, config))),
      s"Topic $name created successfully")

  /** 2. list_topics (:93-115). */
  def listTopics(): Map[String, TopicSummary] =
    client.listTopics().map { case (name, meta) =>
      name -> TopicSummary(meta.partitions.size, meta.partitions.keys.toSeq.sorted)
    }

  /** 3. delete_topic (:117-138). */
  def deleteTopic(name: String): OpResult =
    OpResult.of(Try(client.deleteTopic(name)), s"Topic $name deleted successfully")

  /** 4. get_topic_message_count via watermark offsets (:140-197). */
  def topicMessageCount(topic: String): Either[String, MessageCount] =
    client.listTopics().get(topic) match {
      case None => Left(s"Topic $topic not found")
      case Some(meta) =>
        val per = meta.partitions.keys.toSeq.sorted
          .map(p => p -> client.watermarks(topic, p)).toMap
        Right(MessageCount(topic, per, per.values.map(_.count).sum, per.size))
    }

  /** 5. get_topic_info: partition metadata + message counts (:199-239). */
  def topicInfo(topic: String): Either[String, TopicInfo] =
    client.listTopics().get(topic) match {
      case None => Left(s"Topic $topic not found")
      case Some(meta) =>
        topicMessageCount(topic).map { mc =>
          TopicInfo(topic, meta.partitions.size, meta.partitions,
            mc.totalMessages, mc.partitions)
        }
    }

  /** 6. alter_topic_config (:241-270). */
  def alterTopicConfig(topic: String, config: Map[String, String]): OpResult =
    OpResult.of(Try(client.alterConfig(topic, config)),
      s"Topic $topic config updated successfully")

  /** 7. describe_topic_config (:272-305). */
  def describeTopicConfig(topic: String): Either[String, Map[String, ConfigEntry]] =
    Try(client.describeConfig(topic)) match {
      case Success(c) => Right(c)
      case Failure(e) => Left(Option(e.getMessage).getOrElse(e.toString))
    }

  /** 8. increase_partitions, validating new > current (:307-343). */
  def increasePartitions(topic: String, newTotal: Int): OpResult =
    client.listTopics().get(topic) match {
      case None => OpResult.error(s"Topic $topic not found")
      case Some(meta) if newTotal <= meta.partitions.size =>
        OpResult.error(s"New partition count ($newTotal) must be greater " +
          s"than current (${meta.partitions.size})")
      case Some(_) =>
        OpResult.of(Try(client.createPartitions(topic, newTotal)),
          s"Topic $topic partitions increased to $newTotal")
    }

  /** 9. check_topic_exists; false on any broker error (:345-360). */
  def topicExists(topic: String): Boolean =
    Try(client.listTopics().contains(topic)).getOrElse(false)

  /** 10. list_consumer_groups (:362-391 — the reference punts to the
    * CLI here; the injectable client makes it a first-class op). */
  def listConsumerGroups(): Seq[String] = client.listGroups().sorted

  /** 11. describe_consumer_groups (:393-409, same punt upstream). */
  def describeConsumerGroups(groupIds: Seq[String]): Map[String, Either[String, GroupMeta]] =
    groupIds.map { g =>
      g -> (Try(client.describeGroup(g)) match {
        case Success(m) => Right(m)
        case Failure(e) => Left(Option(e.getMessage).getOrElse(e.toString))
      })
    }.toMap

  /** 12. get_consumer_group_offsets: committed offsets across every
    * topic, omitting never-committed partitions (:411-454). */
  def consumerGroupOffsets(groupId: String): Map[String, Map[Int, Long]] =
    client.listTopics().flatMap { case (topic, meta) =>
      val committed = meta.partitions.keys.toSeq.sorted.flatMap { p =>
        client.committed(groupId, topic, p).map(p -> _)
      }.toMap
      if (committed.nonEmpty) Some(topic -> committed) else None
    }

  /** 13. alter_consumer_group_offsets (:456-489). */
  def alterConsumerGroupOffsets(groupId: String,
                                offsets: Map[String, Map[Int, Long]]): OpResult =
    OpResult.of(Try(client.commitOffsets(groupId,
        offsets.flatMap { case (t, ps) => ps.map { case (p, o) => (t, p) -> o } })),
      s"Consumer group $groupId offsets updated successfully")

  /** 14. get_consumer_lag: end offset minus committed (0 when the
    * group never committed — reference semantics, :491-550). */
  def consumerLag(groupId: String, topic: String): Either[String, ConsumerLag] =
    client.listTopics().get(topic) match {
      case None => Left(s"Topic $topic not found")
      case Some(meta) =>
        val per = meta.partitions.keys.toSeq.sorted.map { p =>
          val committed = client.committed(groupId, topic, p).getOrElse(0L)
          val wm = client.watermarks(topic, p)
          p -> PartitionLag(committed, wm.high, wm.high - committed)
        }.toMap
        Right(ConsumerLag(groupId, topic, per, per.values.map(_.lag).sum))
    }

  /** 15. describe_cluster (:552-583). */
  def describeCluster(): ClusterMeta = client.describeCluster()

  /** 16. close (:585-588). */
  def close(): Unit = client.close()
}

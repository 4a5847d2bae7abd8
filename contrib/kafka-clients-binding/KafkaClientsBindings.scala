package graft.kafka

import java.time.Duration
import java.util.Properties

import scala.concurrent.{Future, Promise}
import scala.jdk.CollectionConverters._

import org.apache.kafka.clients.admin.{AdminClient, AlterConfigOp, ConfigEntry => KConfigEntry, NewPartitions, NewTopic}
import org.apache.kafka.clients.consumer.{KafkaConsumer, OffsetAndMetadata}
import org.apache.kafka.clients.producer.{KafkaProducer, ProducerRecord, RecordMetadata => KRecordMetadata}
import org.apache.kafka.common.TopicPartition
import org.apache.kafka.common.config.ConfigResource

import graft.sinks.KafkaProducerOps
import graft.sources.KafkaConsumerOps
import graft.sources.KafkaConsumerOps.ConsumedMessage
import graft.tools.KafkaAdmin._
import graft.tools.KafkaAdminClient

/** kafka-clients 3.x implementations of the injectable client traits.
  * See README.md in this directory: excluded from the offline build,
  * 1:1 with the file-backed/in-memory impls the test suite drives.
  */
class KafkaClientsConsumerClient(bootstrap: String, val topic: String,
                                 groupId: String = "graft",
                                 props: Map[String, String] = Map.empty)
    extends KafkaConsumerOps.ConsumerClient {

  private val consumer: KafkaConsumer[String, String] = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrap)
    p.put("group.id", groupId)
    p.put("key.deserializer", "org.apache.kafka.common.serialization.StringDeserializer")
    p.put("value.deserializer", "org.apache.kafka.common.serialization.StringDeserializer")
    p.put("enable.auto.commit", "false")
    props.foreach { case (k, v) => p.put(k, v) }
    new KafkaConsumer[String, String](p)
  }

  private def tp(p: Int) = new TopicPartition(topic, p)

  override def partitions: Seq[Int] =
    consumer.partitionsFor(topic).asScala.map(_.partition).toSeq.sorted

  override def beginningOffsets: Map[Int, Long] =
    consumer.beginningOffsets(partitions.map(tp).asJava).asScala
      .map { case (t, o) => t.partition -> o.longValue }.toMap

  override def endOffsets: Map[Int, Long] =
    consumer.endOffsets(partitions.map(tp).asJava).asScala
      .map { case (t, o) => t.partition -> o.longValue }.toMap

  override def assign(ps: Seq[Int]): Unit = {
    consumer.unsubscribe() // kafka forbids mixing subscribe and assign
    consumer.assign(ps.map(tp).asJava)
  }

  override def seek(partition: Int, offset: Long): Unit =
    consumer.seek(tp(partition), offset)

  override def seekToEnd(): Unit =
    consumer.seekToEnd(consumer.assignment())

  override def poll(timeoutMs: Long): Seq[ConsumedMessage] =
    consumer.poll(Duration.ofMillis(timeoutMs)).asScala.map { r =>
      ConsumedMessage(r.topic, r.partition, r.offset,
        Option(r.key), Option(r.value), r.timestamp)
    }.toSeq

  override def close(): Unit = consumer.close()
}

class KafkaClientsProducerClient(bootstrap: String, topic: String,
                                 props: Map[String, String] = Map.empty)
    extends KafkaProducerOps.ProducerClient {

  private val producer: KafkaProducer[String, String] = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrap)
    p.put("key.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    p.put("value.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    props.foreach { case (k, v) => p.put(k, v) }
    new KafkaProducer[String, String](p)
  }

  override def send(key: Option[String],
                    value: String): Future[KafkaProducerOps.RecordMetadata] = {
    val done = Promise[KafkaProducerOps.RecordMetadata]()
    producer.send(new ProducerRecord[String, String](topic, key.orNull, value),
      (md: KRecordMetadata, e: Exception) =>
        if (e != null) done.failure(e)
        else done.success(
          KafkaProducerOps.RecordMetadata(md.topic, md.partition, md.offset)))
    done.future
  }

  override def flush(): Unit = producer.flush()
  override def close(): Unit = { producer.flush(); producer.close() }
}

class KafkaClientsAdminClient(bootstrap: String,
                              props: Map[String, String] = Map.empty)
    extends KafkaAdminClient {

  private val admin: AdminClient = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrap)
    props.foreach { case (k, v) => p.put(k, v) }
    AdminClient.create(p)
  }

  // offset probes reuse a consumer-side client per call (the reference
  // does the same: admin metadata + consumer watermark API)
  private def withConsumer[T](topic: String)(f: KafkaConsumerOps.ConsumerClient => T): T = {
    val c = new KafkaClientsConsumerClient(bootstrap, topic)
    try f(c) finally c.close()
  }

  override def createTopic(name: String, spec: TopicSpec): Unit = {
    val nt = new NewTopic(name, spec.numPartitions, spec.replicationFactor)
    if (spec.config.nonEmpty) nt.configs(spec.config.asJava)
    admin.createTopics(java.util.List.of(nt)).all().get()
  }

  override def deleteTopic(name: String): Unit =
    admin.deleteTopics(java.util.List.of(name)).all().get()

  override def listTopics(): Map[String, TopicMeta] = {
    val names = admin.listTopics().names().get()
    admin.describeTopics(names).allTopicNames().get().asScala.map { case (n, d) =>
      n -> TopicMeta(d.partitions.asScala.map { p =>
        p.partition -> PartitionMeta(
          Option(p.leader).map(_.id).getOrElse(-1),
          p.replicas.asScala.map(_.id).toSeq,
          p.isr.asScala.map(_.id).toSeq)
      }.toMap)
    }.toMap
  }

  override def watermarks(topic: String, partition: Int): Watermarks =
    withConsumer(topic) { c =>
      Watermarks(c.beginningOffsets(partition), c.endOffsets(partition))
    }

  override def describeConfig(topic: String): Map[String, ConfigEntry] = {
    val res = new ConfigResource(ConfigResource.Type.TOPIC, topic)
    admin.describeConfigs(java.util.List.of(res)).all().get()
      .get(res).entries.asScala.map { e =>
        e.name -> ConfigEntry(e.value,
          e.source == KConfigEntry.ConfigSource.DEFAULT_CONFIG,
          e.isReadOnly, e.isSensitive)
      }.toMap
  }

  override def alterConfig(topic: String, config: Map[String, String]): Unit = {
    val res = new ConfigResource(ConfigResource.Type.TOPIC, topic)
    val ops = config.map { case (k, v) =>
      new AlterConfigOp(new KConfigEntry(k, v), AlterConfigOp.OpType.SET)
    }.asJavaCollection
    admin.incrementalAlterConfigs(java.util.Map.of(res, ops)).all().get()
  }

  override def createPartitions(topic: String, newTotal: Int): Unit =
    admin.createPartitions(
      java.util.Map.of(topic, NewPartitions.increaseTo(newTotal))).all().get()

  override def listGroups(): Seq[String] =
    admin.listConsumerGroups().all().get().asScala.map(_.groupId).toSeq

  override def describeGroup(groupId: String): GroupMeta = {
    val d = admin.describeConsumerGroups(java.util.List.of(groupId))
      .describedGroups().get(groupId).get()
    GroupMeta(d.state.toString, d.members.size)
  }

  override def committed(groupId: String, topic: String, partition: Int): Option[Long] = {
    val offs = admin.listConsumerGroupOffsets(groupId)
      .partitionsToOffsetAndMetadata().get()
    Option(offs.get(new TopicPartition(topic, partition))).map(_.offset)
  }

  override def commitOffsets(groupId: String, offsets: Map[(String, Int), Long]): Unit =
    admin.alterConsumerGroupOffsets(groupId,
      offsets.map { case ((t, p), o) =>
        new TopicPartition(t, p) -> new OffsetAndMetadata(o)
      }.asJava).all().get()

  override def describeCluster(): ClusterMeta = {
    val d = admin.describeCluster()
    ClusterMeta(
      d.clusterId.get,
      Option(d.controller.get).map(_.id).getOrElse(-1),
      d.nodes.get.asScala.map(n => BrokerMeta(n.id, n.host, n.port)).toSeq)
  }

  override def close(): Unit = admin.close()
}

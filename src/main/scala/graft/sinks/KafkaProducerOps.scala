package graft.sinks

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.{Await, Future, Promise}
import scala.concurrent.duration._

import graft.sources.FileKafka

/** K8: the reference's Kafka producer send-mode surface
  * (utils/kafka_producer_utils.py:76-277) — single-with-flush,
  * single-without-flush, batch with key prefix / key extractor and
  * periodic flush, synchronous send returning RecordMetadata,
  * sync-wait-all, and async-with-callback.
  *
  * The wire protocol sits behind [[KafkaProducerOps.ProducerClient]]
  * (same injectable pattern as [[graft.tools.KafkaAdminClient]]): a
  * real binding wraps kafka-clients `KafkaProducer#send/flush/close`
  * 1:1; offline, [[FileKafkaProducerClient]] writes the file-backed
  * broker (graft.sources.FileKafka) with genuine buffered-until-flush
  * visibility and real offsets in the delivery reports.
  */
object KafkaProducerOps {

  /** Delivery report (topic, partition, offset) — the subset of
    * kafka's RecordMetadata the reference surfaces (:138-161). */
  final case class RecordMetadata(topic: String, partition: Int, offset: Long)

  /** Wire primitives. `send` enqueues and returns a future that
    * completes when the broker acknowledges — for buffered transports
    * that is at the next flush(), exactly kafka's contract. */
  trait ProducerClient extends AutoCloseable {
    def send(key: Option[String], value: String): Future[RecordMetadata]
    def flush(): Unit
    def close(): Unit
  }

  class Producer(client: ProducerClient) extends AutoCloseable {

    private def resolveKey(keyPrefix: Option[String], keyOf: Option[String => String],
                           msg: String, i: Int): Option[String] =
      keyOf.map(f => f(msg))
        .orElse(keyPrefix.map(p => s"$p-$i"))
        .orElse(Some(i.toString)) // the reference falls back to the index

    /** send_single_message: send + flush (:76-84). */
    def sendSingle(message: String, key: Option[String] = None): Future[RecordMetadata] = {
      val f = client.send(key, message)
      client.flush()
      f
    }

    /** send_single_message_without_flush (:86-92) — buffered; not
      * visible to consumers until a later flush/close. */
    def sendSingleWithoutFlush(message: String, key: Option[String] = None): Future[RecordMetadata] =
      client.send(key, message)

    /** send_batch_messages: per-message keys from key_field extractor
      * or "prefix-i" (1-based), flush every `flushCount`, final flush
      * (:94-136). */
    def sendBatch(messages: Seq[String], keyPrefix: Option[String] = None,
                  keyOf: Option[String => String] = None,
                  flushCount: Int = 10): Seq[Future[RecordMetadata]] = {
      val futures = messages.zipWithIndex.map { case (m, i0) =>
        val i = i0 + 1
        val f = client.send(resolveKey(keyPrefix, keyOf, m, i), m)
        if (flushCount > 0 && i % flushCount == 0) client.flush()
        f
      }
      client.flush()
      futures
    }

    /** send_message_sync: block until acknowledged, return the
      * metadata (:138-161). */
    def sendSync(message: String, key: Option[String] = None,
                 timeout: Duration = 30.seconds): RecordMetadata = {
      val f = client.send(key, message)
      client.flush()
      Await.result(f, timeout)
    }

    /** send_messages_sync_wait: all messages acknowledged before
      * returning; metadata in send order (:163-230). */
    def sendSyncWaitAll(messages: Seq[String], keyPrefix: Option[String] = None,
                        keyOf: Option[String => String] = None,
                        timeout: Duration = 30.seconds,
                        flushCount: Int = 10): Seq[RecordMetadata] =
      sendBatch(messages, keyPrefix, keyOf, flushCount)
        .map(Await.result(_, timeout))

    /** send_messages_with_callback: per-message success/error
      * callbacks (:232-277). Callbacks run when the broker
      * acknowledges (at flush). */
    def sendWithCallback(messages: Seq[String],
                         onSuccess: RecordMetadata => Unit,
                         onError: Throwable => Unit,
                         keyPrefix: Option[String] = None,
                         keyOf: Option[String => String] = None,
                         flushCount: Int = 10): Unit = {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.parasitic
      sendBatch(messages, keyPrefix, keyOf, flushCount).foreach { f =>
        f.foreach(onSuccess)
        f.failed.foreach(onError)
      }
    }

    /** close flushes pending sends first — kafka semantics (:585). */
    def close(): Unit = client.close()
  }
}

/** File-backed producer client over the graft FileKafka broker dir:
  * sends buffer in memory; flush appends them to the topic partition
  * logs and completes the delivery futures with the real assigned
  * offsets. Partitioning: hash(key) % numPartitions when keyed,
  * round-robin otherwise — the kafka default partitioner shape. */
class FileKafkaProducerClient(dir: String, topic: String, numPartitions: Int = 1)
    extends KafkaProducerOps.ProducerClient {
  import KafkaProducerOps.RecordMetadata

  require(numPartitions > 0, "numPartitions must be positive")

  private val buffer =
    ArrayBuffer.empty[(Int, Option[String], String, Promise[RecordMetadata])]
  private var roundRobin = 0

  override def send(key: Option[String], value: String): Future[RecordMetadata] =
    this.synchronized {
      val partition = key match {
        case Some(k) => math.floorMod(k.hashCode, numPartitions)
        case None => roundRobin += 1; (roundRobin - 1) % numPartitions
      }
      val p = Promise[RecordMetadata]()
      buffer += ((partition, key, value, p))
      p.future
    }

  override def flush(): Unit = this.synchronized {
    buffer.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (partition, recs) =>
      val offsets = FileKafka.produce(dir, topic, partition,
        recs.toSeq.map { case (_, k, v, _) =>
          (k.map(_.getBytes(StandardCharsets.UTF_8)).orNull,
            v.getBytes(StandardCharsets.UTF_8))
        })
      recs.zip(offsets).foreach { case ((_, _, _, promise), off) =>
        promise.success(RecordMetadata(topic, partition, off))
      }
    }
    buffer.clear()
  }

  override def close(): Unit = flush()
}

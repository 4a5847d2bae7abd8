package graft.sources

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** The reference's Kafka consumer-mode surface
  * (utils/kafka_consumer_utils.py:155-706) — six consume modes:
  * once (max-N with timeout), bounded-by-timeout, continuous with
  * optional callback, callback-with-stop-control, from-specific-offset
  * (assign + seek), and latest-only (seek-to-end) — plus the
  * partitions/offsets introspection (`get_topic_partitions_info`,
  * :707-745).
  *
  * The wire protocol sits behind [[KafkaConsumerOps.ConsumerClient]]
  * (the injectable pattern shared with [[graft.sinks.KafkaProducerOps]]
  * and [[graft.tools.KafkaAdmin]]): a real binding wraps kafka-clients
  * `KafkaConsumer#poll/assign/seek/seekToEnd/beginningOffsets/endOffsets`
  * 1:1; offline, [[FileKafkaConsumerClient]] reads the file-backed
  * broker with genuine offset positions, so seek/latest semantics are
  * exercised for real.
  */
object KafkaConsumerOps {

  /** The reference's message_info dict (:204-212): envelope fields the
    * consumer surfaces per record. `value` None = tombstone. */
  final case class ConsumedMessage(
      topic: String, partition: Int, offset: Long,
      key: Option[String], value: Option[String], timestampMillis: Long)

  /** consume_messages_with_callback return shape (:405-411). */
  final case class CallbackStats(
      totalMessages: Long, processedSuccessfully: Long, processingErrors: Long,
      durationMs: Long)

  /** get_topic_partitions_info return shape (:726-741). */
  final case class PartitionInfo(beginningOffset: Long, endOffset: Long, messageCount: Long)
  final case class TopicPartitionsInfo(
      topic: String, partitionCount: Int,
      partitions: Map[Int, PartitionInfo], totalMessages: Long)

  /** Wire primitives — a 1:1 subset of kafka-clients Consumer. */
  trait ConsumerClient extends AutoCloseable {
    def topic: String
    def partitions: Seq[Int]
    def beginningOffsets: Map[Int, Long]
    def endOffsets: Map[Int, Long]
    /** Replace the assignment (the reference unsubscribes before
      * assigning — kafka forbids mixing subscribe and assign). */
    def assign(ps: Seq[Int]): Unit
    def seek(partition: Int, offset: Long): Unit
    def seekToEnd(): Unit
    def poll(timeoutMs: Long): Seq[ConsumedMessage]
    def close(): Unit
  }

  class Consumer(client: ConsumerClient, pollIntervalMs: Long = 10L)
      extends AutoCloseable {

    private def nowMs(): Long = System.nanoTime() / 1000000L

    /** Shared poll loop: stop on shutdown, deadline, max count, or the
      * handler returning false. Returns messages delivered. */
    private def loop(maxMessages: Option[Long], timeoutMs: Option[Long],
                     shuttingDown: () => Boolean,
                     handle: ConsumedMessage => Boolean): Long = {
      val deadline = timeoutMs.map(nowMs() + _)
      var n = 0L
      var go = true
      while (go && !shuttingDown() &&
             !deadline.exists(nowMs() >= _) &&
             !maxMessages.exists(n >= _)) {
        val batch = client.poll(pollIntervalMs)
        if (batch.isEmpty) {
          // nothing buffered: idle-wait (the reference keeps polling
          // until timeout/shutdown; callers bound tests with timeouts)
          Thread.sleep(math.min(pollIntervalMs, 10L))
        } else {
          val it = batch.iterator
          while (go && it.hasNext && !maxMessages.exists(n >= _)) {
            val m = it.next()
            n += 1
            if (!handle(m)) go = false
          }
        }
      }
      n
    }

    /** consume_messages_once (:155-236): up to `maxMessages`, bounded
      * by `timeoutMs`. */
    def consumeOnce(maxMessages: Int = 10, timeoutMs: Long = 30000L): Seq[ConsumedMessage] = {
      val out = mutable.ArrayBuffer.empty[ConsumedMessage]
      loop(Some(maxMessages.toLong), Some(timeoutMs), () => false, m => { out += m; true })
      out.toSeq
    }

    /** consume_messages_with_timeout (:237-302): everything that
      * arrives within the window. */
    def consumeWithTimeout(timeoutMs: Long = 30000L): Seq[ConsumedMessage] = {
      val out = mutable.ArrayBuffer.empty[ConsumedMessage]
      loop(None, Some(timeoutMs), () => false, m => { out += m; true })
      out.toSeq
    }

    /** consume_messages_continuous (:303-383): run until the optional
      * timeout (or `stop`), invoking the callback per message; returns
      * the count. */
    def consumeContinuous(callback: ConsumedMessage => Unit = _ => (),
                          timeoutMs: Option[Long] = None,
                          stop: () => Boolean = () => false): Long =
      loop(None, timeoutMs, stop, m => { callback(m); true })

    /** consume_messages_with_callback (:384-530): processor returns
      * false to stop; exceptions count as processing errors and
      * consumption continues — the reference's stats contract. */
    def consumeWithCallback(processor: ConsumedMessage => Boolean,
                            maxMessages: Option[Long] = None,
                            timeoutMs: Option[Long] = None,
                            shutdownCheck: () => Boolean = () => false): CallbackStats = {
      val t0 = nowMs()
      var total = 0L; var ok = 0L; var errs = 0L
      loop(maxMessages, timeoutMs, shutdownCheck, { m =>
        total += 1
        try { val cont = processor(m); ok += 1; cont }
        catch { case _: Exception => errs += 1; true }
      })
      CallbackStats(total, ok, errs, nowMs() - t0)
    }

    /** consume_from_specific_offset (:531-625): assign the single
      * partition, seek, then consume like `consumeOnce`. */
    def consumeFromOffset(partition: Int, offset: Long,
                          maxMessages: Int = 10, timeoutMs: Long = 30000L): Seq[ConsumedMessage] = {
      client.assign(Seq(partition))
      client.seek(partition, offset)
      consumeOnce(maxMessages, timeoutMs)
    }

    /** consume_latest_messages (:626-706): seek to the end of every
      * partition, then surface only records produced afterwards. */
    def consumeLatest(maxMessages: Int = 10, timeoutMs: Long = 30000L): Seq[ConsumedMessage] = {
      client.assign(client.partitions)
      client.seekToEnd()
      consumeOnce(maxMessages, timeoutMs)
    }

    /** get_topic_partitions_info (:707-745). */
    def topicPartitionsInfo(): TopicPartitionsInfo = {
      val begins = client.beginningOffsets
      val ends = client.endOffsets
      val infos = client.partitions.map { p =>
        val b = begins.getOrElse(p, -1L)
        val e = ends.getOrElse(p, -1L)
        p -> PartitionInfo(b, e, math.max(0L, e - b))
      }.toMap
      TopicPartitionsInfo(client.topic, infos.size, infos,
        infos.values.map(_.messageCount).sum)
    }

    override def close(): Unit = client.close()
  }
}

/** File-backed consumer client over the graft FileKafka broker dir:
  * real per-partition positions, seek/seek-to-end, bounded poll
  * batches. A production binding replaces this with kafka-clients
  * `KafkaConsumer`; the [[KafkaConsumerOps.Consumer]] modes are
  * transport-agnostic. */
class FileKafkaConsumerClient(dir: String, override val topic: String,
                              maxPollRecords: Int = 500)
    extends KafkaConsumerOps.ConsumerClient {
  import KafkaConsumerOps.ConsumedMessage

  private var assigned: Option[Seq[Int]] = None
  private val positions = mutable.Map.empty[Int, Long]

  override def partitions: Seq[Int] = FileKafka.listPartitions(dir, topic)
  override def beginningOffsets: Map[Int, Long] = partitions.map(_ -> 0L).toMap
  override def endOffsets: Map[Int, Long] = FileKafka.latestOffsets(dir, topic)

  override def assign(ps: Seq[Int]): Unit = this.synchronized {
    assigned = Some(ps)
  }
  override def seek(partition: Int, offset: Long): Unit = this.synchronized {
    positions(partition) = offset
  }
  override def seekToEnd(): Unit = this.synchronized {
    val ends = endOffsets
    current.foreach(p => positions(p) = ends.getOrElse(p, 0L))
  }

  private def current: Seq[Int] = assigned.getOrElse(partitions)

  override def poll(timeoutMs: Long): Seq[ConsumedMessage] = this.synchronized {
    val out = mutable.ArrayBuffer.empty[ConsumedMessage]
    current.foreach { p =>
      if (out.size < maxPollRecords) {
        val from = positions.getOrElse(p, 0L)
        val recs = FileKafka.readRecords(dir, topic, p, from, maxPollRecords - out.size)
        recs.foreach { case (off, k, v, ts) =>
          out += ConsumedMessage(topic, p, off,
            Option(k).map(new String(_, StandardCharsets.UTF_8)),
            Option(v).map(new String(_, StandardCharsets.UTF_8)), ts)
        }
        if (recs.nonEmpty) positions(p) = recs.last._1 + 1
      }
    }
    out.toSeq
  }

  override def close(): Unit = ()
}

package graft.sources

/** Test access to the package-private FileKafka partition reader —
  * lets specs plan slices directly (including offsets past
  * Int.MaxValue, where the pre-round-3 `.toInt` slice silently
  * wrapped and replayed from a bogus position). */
object FileKafkaProbe {
  def readSlice(file: String, topic: String, partition: Int,
                start: Long, end: Long): Seq[(Long, String)] = {
    val reader = new FileKafkaReaderFactory()
      .createReader(FileKafkaInputPartition(file, topic, partition, start, end))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    try
      while (reader.next()) {
        val r = reader.get()
        val v = if (r.isNullAt(1)) null else new String(r.getBinary(1), "UTF-8")
        out += ((r.getLong(4), v))
      }
    finally reader.close()
    out.toSeq
  }
}

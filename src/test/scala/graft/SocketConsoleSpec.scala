package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.Sinks
import graft.sources.Sources

/** The two construction-one-liner surfaces (S5 socket source, K7
  * console sink), driven end-to-end instead of construction-only:
  * a real TCP server feeds the socket source; the console sink runs a
  * real micro-batch. */
class SocketConsoleSpec extends SparkSpec {

  test("socket source streams lines from a live TCP server") {
    val server = new ServerSocket(0)
    val feeder = new Thread(() => {
      val s = server.accept()
      val w = new PrintWriter(s.getOutputStream, true)
      w.println("hello"); w.println("socket world")
      // keep the connection open long enough for the source to drain it
      Thread.sleep(3000)
      w.close(); s.close()
    })
    feeder.setDaemon(true); feeder.start()
    val q = Sources.socket(spark, "localhost", server.getLocalPort)
      .writeStream.format("memory").queryName("socket_spec").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      def rows() = spark.table("socket_spec").collect().map(_.getString(0)).toSet
      while (rows().size < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(50)
      }
      assert(rows() == Set("hello", "socket world"))
    } finally { q.stop(); server.close() }
  }

  test("console sink executes a micro-batch without error") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    in.addData("a", "b", "c")
    val q = Sinks.console(in.toDF(), numRows = 5).start()
    try {
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"console sink failed: ${q.exception}")
      val progress = q.recentProgress
      assert(progress.exists(_.numInputRows == 3),
        s"expected a 3-row batch, saw ${progress.map(_.numInputRows).toSeq}")
      assert(progress.head.sink.description.toLowerCase.contains("console"))
    } finally q.stop()
  }
}

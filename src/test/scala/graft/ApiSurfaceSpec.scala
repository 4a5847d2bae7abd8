package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Transforms
import graft.sources.Sources
import graft.streaming.StreamOps

class ApiSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("tumbleSql generates runnable SQL with window start/end") {
    Tables.events(spark, sf).createOrReplaceTempView("events_v")
    val sql = StreamOps.tumbleSql("events_v", "ts", "1 hour",
      keys = Seq("event_type"),
      aggSelects = Seq("COUNT(*) AS cnt", "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total"))
    val out = spark.sql(sql)
    assert(out.columns.toSet == Set("event_type", "cnt", "total", "window_start", "window_end"))
    assert(out.count() > 0)
    // window bounds are exactly the size apart
    val bad = out.where(
      col("window_end").cast("timestamp").cast("long") -
        col("window_start").cast("timestamp").cast("long") =!= 3600).count()
    assert(bad == 0)
  }

  test("streaming file source reads csv with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvstream")
    java.nio.file.Files.writeString(dir.resolve("part1.csv"), "1,a\n2,b\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val stream = Sources.file(spark, dir.toString, "csv", Some(schema), streaming = true)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("csv_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("csv_stream_out").count() == 2)
  }

  test("typed map/flatMap/keyBy wrappers behave like the reference operators") {
    val ds = Seq("a b", "c", "a c").toDS()
    val mapped = Transforms.map(ds, (s: String) => s.length)
    assert(mapped.collect().sorted.toSeq == Seq(1, 3, 3))
    val flat = Transforms.flatMap(ds, (s: String) => s.split(" ").toSeq)
    assert(flat.count() == 5)
    val grouped = Transforms.keyBy(flat, identity[String]).count().collect().toMap
    assert(grouped == Map("a" -> 2, "b" -> 1, "c" -> 2))
  }

  test("GraftConfig-driven session settings reach the SQL conf") {
    // the session factory is exercised by every main; assert the
    // scale-relevant settings it promises
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The events loader must normalize `ts` to TIMESTAMP_NTZ regardless of
  * how the generator wrote it: parquet TIMESTAMP(NANOS) surfaces as
  * LongType under nanosAsLong (testdata ≤ r10), TIMESTAMP(MICROS)
  * surfaces as a timestamp type (testdata ≥ r11). Round 11 hard-coded
  * the long branch and every events query failed analysis when the
  * testdata switched units. */
class TablesSpec extends SparkSpec {

  test("events.ts normalizes to timestamp_ntz on the shipped testdata") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    assert(ev.where(col("ts").isNotNull).count() > 0)
  }

  test("events.ts long-nanos fallback truncates to micros") {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_nanos")
    val evDir = dir.resolve("events.parquet").toString
    import spark.implicits._
    // 2024-01-01T00:00:00.000000123Z in nanos: the sub-micro tail must
    // be truncated, matching what DuckDB reports for nanos parquet
    val nanos = 1704067200L * 1000000000L + 123L
    Seq((nanos, "click")).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(evDir)
    val ev = Tables.events(spark, dir.toString)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    val got = ev.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got == "2024-01-01 00:00:00.000000", got)
  }

  test("events.ts is identical under a non-UTC session timezone") {
    // A library consumer with session tz != UTC must see the same UTC
    // wall-clock as the DuckDB oracle: the normalization goes through
    // raw epoch micros + an NTZ epoch literal, never a session-tz cast.
    import spark.implicits._
    val utc = Tables.events(spark, sf).select("event_id", "ts")
      .as[(Long, java.time.LocalDateTime)].collect().sortBy(_._1).take(100)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu") // +05:45
      val kat = Tables.events(spark, sf).select("event_id", "ts")
        .as[(Long, java.time.LocalDateTime)].collect().sortBy(_._1).take(100)
      assert(kat.toSeq == utc.toSeq,
        "events.ts shifted under a non-UTC session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}

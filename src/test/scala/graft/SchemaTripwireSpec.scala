package graft

import graft.tools.SchemaTripwire

/** The testdata schema tripwire (VERDICT r12 #7): a physical-type
  * change in any table's parquet footer must be a LOUD hard deviation
  * before a single query runs — the round-11 events.ts nanos→micros
  * flip broke 19 queries while every gate stayed green. */
class SchemaTripwireSpec extends SparkSpec {

  test("shipped testdata matches the pinned baseline") {
    assert(SchemaTripwire.check(sf) == Nil)
  }

  test("a plain-int64 ts (no timestamp annotation) is a hard deviation") {
    // nanosAsLong would surface this as long and Tables.load would
    // ASSUME nanos — assumption, not knowledge, so the probe must trip
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_plain")
    import spark.implicits._
    Seq((1L, 1704067200L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val (hard, _) = SchemaTripwire.checkTable(dir.toString, "events")
    assert(hard.exists(_.contains("events.ts")), hard.mkString("; "))
  }

  test("a timestamp-annotated ts variant is handled, not fatal") {
    // an instant type (INT96 under Spark's default outputTimestampType,
    // TIMESTAMP(MICROS,true) under TIMESTAMP_MICROS); either reads back
    // as TimestampType and the loader's unix_micros branch normalizes
    // it, so: warning, no hard deviation
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_instant")
    import spark.implicits._
    Seq((1L, new java.sql.Timestamp(1704067200000L), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val (hard, warn) = SchemaTripwire.checkTable(dir.toString, "events")
    assert(hard.isEmpty, hard.mkString("; "))
    assert(warn.exists(_.contains("handled by Tables.load")), warn.mkString("; "))
  }

  test("a narrowed key column is a hard deviation; an added column is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_narrow")
    import spark.implicits._
    Seq((1, "doc one", "en", "web", 7L, true))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "extra_flag")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val (hard, warn) = SchemaTripwire.checkTable(dir.toString, "documents")
    assert(hard.exists(d => d.contains("documents.doc_id") && d.contains("INT32")),
      hard.mkString("; "))
    assert(warn.exists(_.contains("extra_flag")), warn.mkString("; "))
  }

  test("a missing table file is skipped (scale dirs carry subsets)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_empty")
    assert(SchemaTripwire.check(dir.toString) == Nil)
  }

  test("drift confined to a LATER part file still trips (ADVICE r13)") {
    // simulate a generator change mid-run: part 0 on-baseline, part 1
    // with doc_id narrowed to int32 — a first-part-only probe passes
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val a = Files.createTempDirectory("graft_trip_pa")
    val b = Files.createTempDirectory("graft_trip_pb")
    Seq((1L, "doc", "en", "web", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(a.resolve("t").toString)
    Seq((1, "doc", "en", "web", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(b.resolve("t").toString)
    def part(d: java.nio.file.Path): java.nio.file.Path =
      Files.list(d.resolve("t")).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
    val mixed = Files.createTempDirectory("graft_trip_mixed")
    val tbl = mixed.resolve("documents.parquet")
    Files.createDirectories(tbl)
    Files.copy(part(a), tbl.resolve("part-00000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(part(b), tbl.resolve("part-00001.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val e = intercept[RuntimeException] {
      SchemaTripwire.checkTable(mixed.toString, "documents")
    }
    assert(e.getMessage.contains("cross-part schema drift"), e.getMessage)
    assert(e.getMessage.contains("doc_id"), e.getMessage)
  }
}

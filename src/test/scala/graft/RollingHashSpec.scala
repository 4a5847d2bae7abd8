package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHash

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("matches the built-in lambda formulation on ASCII input") {
    val df = Seq("hello world", "", "a", "the quick brown fox", "x " * 50)
      .toDF("s")
    val both = df.select(
      RollingHash.rolling_hash(col("s")).as("native"),
      expr("aggregate(transform(filter(split(s, ''), c -> c <> ''), c -> ascii(c)), " +
        "cast(0 as bigint), (h, x) -> (h * 31 + x) % 1000000007)").as("lambda"))
    assert(both.where(col("native") =!= col("lambda")).count() == 0)
  }

  test("evaluates identically interpreted and codegen'd") {
    // scalar path (interpreted)
    assert(RollingHash.hash("hello") ==
      "hello".foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L))
    // codegen path via a projection over enough rows to trigger wholestage
    val vals = (1 to 100).map(i => s"doc-$i content")
    val got = vals.toDF("s").select(RollingHash.rolling_hash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vals.map(RollingHash.hash))
  }

  test("handles null, unicode, and surrogate pairs by codepoint") {
    val df = Seq(Some("日本語"), Some("🙂"), None).toDF("s")
    val out = df.select(RollingHash.rolling_hash(col("s")).as("h")).collect()
    assert(out(0).getLong(0) == RollingHash.hash("日本語"))
    assert(out(1).getLong(0) == 0x1F642L % 1000000007L) // single codepoint
    assert(out(2).isNullAt(0))
  }

  test("registers for SQL text") {
    RollingHash.register(spark)
    val r = spark.sql("SELECT rolling_hash('abc') AS h").collect()(0).getLong(0)
    assert(r == RollingHash.hash("abc"))
  }
}

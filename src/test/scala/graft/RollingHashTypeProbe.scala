package graft

class RollingHashTypeProbe extends SparkSpec {
  test("rolling_hash rejects non-string input with a clear analysis error") {
    graft.functions.RollingHash.register(spark)
    val e = intercept[Exception] { spark.sql("SELECT rolling_hash(42)").collect() }
    assert(e.getMessage.contains("rolling_hash requires STRING input"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.BigramRepStats

class BigramRepStatsSpec extends SparkSpec {
  import spark.implicits._

  private val trickyDocs = Seq(
    (90001L, "the a the a the a the a"),
    (90002L, "rep rep rep rep rep rep"),
    (90003L, ""), (90004L, "solo"), (90005L, " leading the  double "),
    (90006L, "日本 語 the テスト a 🙂 日本 語"),
    (90007L, "x y"), (90008L, "x x"))

  test("bit-identical to the exploded bigram aggregate") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(trickyDocs.toDF("doc_id", "text"))
    val native = docs
      .withColumn("__st", BigramRepStats.bigram_rep_stats(col("text")))
      .where(col("__st").isNotNull)
      .select(col("doc_id"), col("__st.n_bigrams"), col("__st.top_bigram_cnt"),
        col("__st.dup_bigram_cnt"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val exploded = docs
      .withColumn("toks", split(col("text"), " "))
      .where(expr("size(toks) >= 2"))
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS bg"""
          .stripMargin)
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_bigrams"),
        max("cnt").as("top_bigram_cnt"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_bigram_cnt"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(native == exploded)
    assert(native.exists(_._4 > 0), "mix must exercise the dup branch")
  }

  test("null text and sub-bigram docs yield a null struct") {
    val df = Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, "solo"), (4L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), BigramRepStats.bigram_rep_stats(col("text")).as("st"))
      .orderBy("doc_id").collect()
    assert(df(0).isNullAt(1) && df(1).isNullAt(1) && df(2).isNullAt(1))
    assert(df(3).getStruct(1).getLong(0) == 1L)
  }

  test("interpreted eval matches the dataframe path") {
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq("a b a b a", "x  y", "one two three two one two")) {
      val interp = BigramRepStats.stats(UTF8String.fromString(s))
      val viaDf = Seq(Tuple1(s)).toDF("t")
        .select(BigramRepStats.bigram_rep_stats(col("t"))).collect()(0).getStruct(0)
      assert(interp.getLong(0) == viaDf.getLong(0) &&
        interp.getLong(1) == viaDf.getLong(1) &&
        interp.getLong(2) == viaDf.getLong(2), s)
    }
  }

  test("q45 is a narrow map: the only exchange is the presentation sort's") {
    // the structural point of the native census — the former plan had
    // THREE exchanges (groupBy(doc_id, bg), groupBy(doc_id), orderBy)
    val plan45 = graft.functions.TextOps.repetitionStats(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "(?i)exchange".r.findAllIn(plan45)
      .size - "(?i)reusedexchange".r.findAllIn(plan45).size
    assert(exchanges <= 1,
      s"q45 should shuffle only for its presentation sort:\n$plan45")
    assert(!plan45.toLowerCase.contains("hashaggregate"),
      s"no aggregate should survive the native census:\n$plan45")
  }
}

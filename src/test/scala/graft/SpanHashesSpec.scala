package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpanHashes

/** Pins the one-pass sliding-window hash (q80's heavy stage):
  * every window entry must equal the scalar polynomial hash of that
  * window's joined text — the identity the exact-confirm stage's
  * hash join relies on. */
class SpanHashesSpec extends SparkSpec {

  private def reference(text: String, k: Int): Seq[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k).map(i =>
      SpanHashes.hash(toks.slice(i, i + k).mkString(" ")))
  }

  test("window hashes equal the scalar hash of each joined span") {
    val rnd = new scala.util.Random(80)
    val texts = Seq(
      "a b c d e",
      "one",                      // fewer tokens than k
      "x  y   z q r s",           // repeated separators -> empty tokens
      " leading and trailing ",   // boundary empties
      "sigma σ unicode 😀 emoji pair here now extra"
    ) ++ (1 to 20).map { _ =>
      (1 to 3 + rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
    }
    for (k <- Seq(1, 2, 3, 8); t <- texts)
      assert(SpanHashes.spans(
          org.apache.spark.unsafe.types.UTF8String.fromString(t), k)
        .toLongArray().toSeq === reference(t, k), s"k=$k text='$t'")
  }

  test("codegen path agrees with interpreted eval") {
    import spark.implicits._
    val df = Seq("a b c d e f g h i j", "p q", "copy me twice copy me twice ok")
      .toDF("text")
    val viaExpr = df.select(
      SpanHashes.span_hashes(col("text"), 3).as("hs")).collect()
      .map(_.getSeq[Long](0))
    val expected = df.collect()
      .map(r => reference(r.getString(0), 3))
    assert(viaExpr.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
    // scalar companion through codegen too
    val s = df.select(SpanHashes.span_hash(col("text"))).collect()
      .map(_.getLong(0))
    assert(s.toSeq === df.collect().map(r => SpanHashes.hash(r.getString(0))).toSeq)
  }

  test("mulmod matches BigInt over adversarial operands") {
    val M = BigInt(SpanHashes.Mod)
    val rnd = new scala.util.Random(61)
    val edge = Seq(0L, 1L, 2L, SpanHashes.Mod - 1, SpanHashes.Mod - 2,
      (1L << 60) + 12345L)
    val ops = edge ++ (1 to 200).map(_ =>
      math.floorMod(rnd.nextLong(), SpanHashes.Mod))
    for (a <- ops; b <- ops.take(30))
      assert(BigInt(SpanHashes.mulmod(a, b)) === (BigInt(a) * BigInt(b)) % M,
        s"a=$a b=$b")
  }

  // ---- SpanStrings: the native window/chunk STRING generator (r17) ----

  test("span_strings is bit-parity with the old sliding transform form") {
    import spark.implicits._
    // the EXACT expression q80/q81 used before the r17 CodegenSweep fix
    def oldForm(k: Int) =
      s"""CASE WHEN size(toks) >= $k THEN
         |  transform(sequence(1, size(toks) - ${k - 1}),
         |    i -> concat_ws(' ', slice(toks, i, $k)))
         |ELSE array() END""".stripMargin
    val rnd = new scala.util.Random(17)
    val texts = Seq(
      "a b c d e", "one", "x  y   z q r s", " leading and trailing ",
      "", " ", "  ", "sigma σ unicode 😀 emoji pair here now extra"
    ) ++ (1 to 25).map { _ =>
      (1 to 1 + rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
    }
    val df = texts.toDF("text").withColumn("toks", split(col("text"), " "))
    for (k <- Seq(1, 2, 3, 8)) {
      val rows = df.select(
        graft.functions.SpanStrings.span_strings(col("text"), k).as("native"),
        expr(oldForm(k)).as("old")).as[(Seq[String], Seq[String])].collect()
      rows.zip(texts).foreach { case ((n, o), t) =>
        assert(n == o, s"k=$k text='$t'") }
    }
  }

  test("chunk_strings is bit-parity with the old chunked transform form") {
    import spark.implicits._
    // the EXACT expression q55 used before the r17 CodegenSweep fix
    def oldForm(k: Int) =
      s"""transform(sequence(0, cast(ceil(size(toks) / ${k}.0) as int) - 1),
         |  i -> concat_ws(' ', slice(toks, i * $k + 1, $k)))""".stripMargin
    val rnd = new scala.util.Random(55)
    val texts = Seq(
      "a b c d e", "one", "x  y   z q r s", "", " ", "exact four token text x"
    ) ++ (1 to 25).map { _ =>
      (1 to 1 + rnd.nextInt(60)).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
    }
    val df = texts.toDF("text").withColumn("toks", split(col("text"), " "))
    for (k <- Seq(1, 3, 5, 25)) {
      val rows = df.select(
        graft.functions.SpanStrings.chunk_strings(col("text"), k).as("native"),
        expr(oldForm(k)).as("old")).as[(Seq[String], Seq[String])].collect()
      rows.zip(texts).foreach { case ((n, o), t) =>
        assert(n == o, s"k=$k text='$t'") }
    }
  }

  test("span_strings windows hash to span_hashes entries (cross-expression identity)") {
    import spark.implicits._
    val df = Tables.documents(spark, sf).select("text").limit(50)
    val k = 5
    val rows = df.select(
      graft.functions.SpanStrings.span_strings(col("text"), k).as("w"),
      graft.functions.SpanHashes.span_hashes(col("text"), k).as("h"))
      .as[(Seq[String], Seq[Long])].collect()
    assert(rows.nonEmpty && rows.exists(_._1.nonEmpty))
    rows.foreach { case (w, h) =>
      assert(w.length == h.length)
      w.zip(h).foreach { case (s, hv) => assert(SpanHashes.hash(s) == hv) }
    }
  }

  test("SpanStrings codegen path agrees with interpreted eval") {
    import spark.implicits._
    val texts = Seq("a b c d e f", "p", "x  y z")
    val df = texts.toDF("text")
    val viaCodegen = df.select(
      graft.functions.SpanStrings.span_strings(col("text"), 3)).as[Seq[String]].collect()
    val interp = texts.map(t => graft.functions.SpanStrings.spans(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3, 1, false)
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq)
    assert(viaCodegen.toSeq == interp)
  }
}

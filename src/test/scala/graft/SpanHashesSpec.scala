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
}

package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.DedupOps

/** Adversarial pin of the two-stage verify's hash upper bound
  * (`DedupOps.verifyPrefixPairs`): the claim is that filtering on
  *   iu = distinct_hash_intersection + min(na - nha, nb - nhb)
  * can NEVER drop a pair the exact string compare would keep, for ANY
  * hash that is a function of the shingle — including adversarially
  * bad ones. The slack term exists because a within-doc collision
  * makes the distinct-hash intersection undercount the true shingle
  * intersection; each such undercount provably consumes one unit of
  * n - nh on BOTH sides.
  *
  * These tests feed handcrafted `sets` frames (the staged `doc_sets`
  * shape: sorted h32 array, distinct-hash count, sorted shingle array,
  * set size) so collisions are EXACT and deterministic rather than
  * birthday-searched, then compare against brute-force string Jaccard.
  */
class VerifyBoundSpec extends SparkSpec {

  private val setsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("hs", ArrayType(IntegerType, containsNull = true)),
    StructField("nh", IntegerType, nullable = false),
    StructField("ss", ArrayType(StringType, containsNull = true)),
    StructField("n", LongType, nullable = false)))

  /** Build the doc_sets frame from (doc_id, distinct shingles) under a
    * caller-chosen hash function — the exact shape `setsFrom` stages. */
  private def setsOf(docs: Seq[(Long, Seq[String])],
                     hash: String => Int): DataFrame = {
    val rows = docs.map { case (id, ss) =>
      val hs = ss.map(hash).sorted
      Row(id, hs, hs.distinct.size, ss.sorted, ss.size.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), setsSchema)
  }

  private def allPairs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    (for (a <- ids; b <- ids if a < b) yield (a, b))
      .toDF("doc_a", "doc_b")
  }

  private def bruteForce(docs: Seq[(Long, Seq[String])],
                         t: Double): Set[(Long, Long, Double)] = {
    val m = docs.toMap
    (for {
      a <- m.keys; b <- m.keys if a < b
      sa = m(a).toSet; sb = m(b).toSet
      i = (sa & sb).size
      j = BigDecimal(i.toDouble / (sa.size + sb.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= t
    } yield (a, b, j)).toSet
  }

  private def run(docs: Seq[(Long, Seq[String])], hash: String => Int,
                  t: Double): Set[(Long, Long, Double)] =
    DedupOps.verifyPrefixPairs(allPairs(docs.map(_._1)),
        setsOf(docs, hash), t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("within-doc collision: slack term is what keeps the true pair") {
    // A and B share s1, s2; s1 and s2 collide on the hash. Without the
    // min(n-nh) slack the distinct-hash intersection (1) would put the
    // bound at 1/5 < 0.5 and wrongly prune a jaccard-0.5 pair.
    val docs = Seq(
      1L -> Seq("s1", "s2", "s3"),
      2L -> Seq("s1", "s2", "s4"))
    val hash: String => Int = { case "s1" | "s2" => 5; case "s3" => 7; case _ => 9 }
    assert(run(docs, hash, 0.5) === bruteForce(docs, 0.5))
    assert(run(docs, hash, 0.5) === Set((1L, 2L, 0.5)))
  }

  test("cross-doc collision: hash stage overshoots, exact stage kills") {
    // A={s1,s3}, B={s1,s5}, hash(s3)=hash(s5): the hash bound sees a
    // full match (iu=2 -> 1.0) but true jaccard is 1/3 — the pair must
    // survive to the exact stage and die there, not be emitted.
    val docs = Seq(
      1L -> Seq("s1", "s3"),
      2L -> Seq("s1", "s5"))
    val hash: String => Int = { case "s1" => 1; case _ => 7 }
    assert(run(docs, hash, 0.5) === bruteForce(docs, 0.5))
    assert(run(docs, hash, 0.5).isEmpty)
  }

  test("constant hash (every shingle collides): still exact") {
    // The degenerate worst case — one hash value for the whole corpus.
    // nh=1 everywhere, the bound passes every pair, and the answer
    // must still be exactly the brute-force one.
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("x", "y"),
      4L -> Seq("a", "x", "y", "z"))
    val hash: String => Int = _ => 42
    assert(run(docs, hash, 0.5) === bruteForce(docs, 0.5))
  }

  test("random corpora x {good, mod-8, constant} hashes match brute force") {
    // Property sweep: 40 docs over a 30-shingle vocabulary (dense
    // overlap), verified under a well-spread hash, a hash folded to 8
    // values (heavy collisions both within and across docs), and a
    // constant hash. The emitted pair set must be IDENTICAL in all
    // three — the hash only prices the pruning, never the answer.
    val rnd = new scala.util.Random(79)
    val vocab = (1 to 30).map(i => s"w$i")
    val docs: Seq[(Long, Seq[String])] = (1L to 40L).map { id =>
      id -> rnd.shuffle(vocab).take(3 + rnd.nextInt(10)).toSeq
    }
    val good: String => Int = s => scala.util.hashing.MurmurHash3.stringHash(s)
    val folded: String => Int = s => math.floorMod(good(s), 8)
    val expected = bruteForce(docs, 0.5)
    assert(expected.nonEmpty) // the fixture must actually exercise pairs
    assert(run(docs, good, 0.5) === expected)
    assert(run(docs, folded, 0.5) === expected)
    assert(run(docs, _ => 0, 0.5) === expected)
  }
}

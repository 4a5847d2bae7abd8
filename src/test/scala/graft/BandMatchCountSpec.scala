package graft

import org.apache.spark.sql.functions._

import graft.functions.BandMatchCount

class BandMatchCountSpec extends SparkSpec {
  import spark.implicits._

  // the exact higher-order forms the native expression replaced
  // (DedupOps r15 and earlier: matches + sharesBand)
  private def lambdaMatches =
    "aggregate(zip_with(a, b, (x, y) -> if(x = y, 1, 0)), 0, (s, e) -> s + e)"
  private def lambdaShares(numBands: Int, rowsPerBand: Int) =
    s"""exists(sequence(0, ${numBands - 1}), k ->
       |  slice(a, k * $rowsPerBand + 1, $rowsPerBand) =
       |  slice(b, k * $rowsPerBand + 1, $rowsPerBand))""".stripMargin

  test("parity with matches + sharesBand on random signatures (8/4 and 128/16)") {
    val rnd = new scala.util.Random(7)
    for ((nh, nb) <- Seq((8, 4), (128, 16))) {
      val r = nh / nb
      // mix: fully random pairs (rarely share a band), near-identical
      // pairs (few mutated positions), and identical pairs
      def sig() = Array.fill(nh)(rnd.nextLong(1000))
      def mutate(a: Array[Long], k: Int) = {
        val b = a.clone()
        (0 until k).foreach(_ => b(rnd.nextInt(nh)) += 1)
        b
      }
      val pairs =
        Seq.fill(40)((sig(), sig())) ++
          Seq.fill(40) { val a = sig(); (a, mutate(a, 1 + rnd.nextInt(nh / 2))) } ++
          Seq.fill(10) { val a = sig(); (a, a.clone()) }
      val df = pairs.toDF("a", "b")
      val rows = df.select(
        BandMatchCount.band_match_count($"a", $"b", r).as("native"),
        expr(lambdaMatches).as("m"),
        expr(lambdaShares(nb, r)).as("shares")).collect()
      rows.foreach { row =>
        val native = row.getInt(0)
        val m = row.getInt(1)
        val shares = row.getBoolean(2)
        if (shares) assert(native == m, s"shares-band pair: $row")
        else assert(native == -1, s"no-band pair: $row")
      }
      assert(rows.exists(_.getInt(0) >= 0) && rows.exists(_.getInt(0) == -1),
        "mix must exercise both branches")
    }
  }

  test("rowsPerBand = 0 is the ungated agreement count") {
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 9L)),
      (Array(1L, 2L, 3L, 4L), Array(9L, 9L, 9L, 9L)))
      .toDF("a", "b")
    val out = df.select(BandMatchCount.band_match_count($"a", $"b", 0)).as[Int].collect()
    assert(out.toSeq == Seq(2, 0)) // never -1 without the gate
  }

  test("null input, null element, and length mismatch all yield null") {
    val cases = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (None: Option[Array[Long]], Some(Array(1L, 2L))),
      (Some(Array(1L, 2L)), Some(Array(1L, 2L, 3L)))) // length mismatch
      .toDF("a", "b")
    assert(cases.select(BandMatchCount.band_match_count($"a", $"b", 2)).collect()
      .forall(_.isNullAt(0)))
    val nullElem = spark.sql(
      "SELECT CAST(array(1, NULL) AS ARRAY<BIGINT>) a, " +
        "CAST(array(1, 2) AS ARRAY<BIGINT>) b")
    assert(nullElem.select(BandMatchCount.band_match_count($"a", $"b", 2)).collect()
      .head.isNullAt(0))
    // length not divisible by rowsPerBand is null too (gated form only)
    val odd = Seq((Array(1L, 2L, 3L), Array(1L, 2L, 3L))).toDF("a", "b")
    assert(odd.select(BandMatchCount.band_match_count($"a", $"b", 2)).collect()
      .head.isNullAt(0))
    assert(odd.select(BandMatchCount.band_match_count($"a", $"b", 0)).as[Int]
      .collect().head == 3)
  }

  test("intended divergence from the old lambda form on malformed inputs (ADVICE r16)") {
    // the old aggregate(zip_with(...)) returns a NON-NULL count on a
    // length mismatch or a null element (zip_with pads with nulls and
    // if(null,1,0) contributes 0); the native expression returns null.
    // Unreachable at every call site — signatures are fixed-length
    // arrays of non-null BIGINTs by construction — and the consumer's
    // threshold filter drops the row in both worlds; this pins the
    // divergence so the scaladoc claim stays honest.
    val mismatch = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    val oldM = mismatch.select(expr(lambdaMatches)).collect()(0)
    assert(!oldM.isNullAt(0) && oldM.getInt(0) == 2, "old form: non-null count")
    assert(mismatch.select(BandMatchCount.band_match_count($"a", $"b", 0))
      .collect()(0).isNullAt(0), "native form: null")
    val nullElem = spark.sql(
      "SELECT CAST(array(1, NULL) AS ARRAY<BIGINT>) a, " +
        "CAST(array(1, 2) AS ARRAY<BIGINT>) b")
    val oldN = nullElem.select(expr(lambdaMatches)).collect()(0)
    assert(!oldN.isNullAt(0) && oldN.getInt(0) == 1, "old form: non-null count")
    assert(nullElem.select(BandMatchCount.band_match_count($"a", $"b", 0))
      .collect()(0).isNullAt(0), "native form: null")
  }

  test("interpreted eval matches codegen") {
    val a = Array(5L, 5L, 7L, 8L, 1L, 2L, 3L, 4L)
    val b = Array(5L, 5L, 9L, 9L, 1L, 2L, 9L, 4L)
    for (rpb <- Seq(0, 2, 4)) {
      val e = BandMatchCount(
        org.apache.spark.sql.GraftShim.expression(lit(a)),
        org.apache.spark.sql.GraftShim.expression(lit(b)), rpb)
      val interp = e.nullSafeEval(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b))
      val viaDf = Seq((a, b)).toDF("a", "b")
        .select(BandMatchCount.band_match_count(col("a"), col("b"), rpb))
        .collect()(0).getInt(0)
      assert(interp == viaDf, s"rpb=$rpb")
    }
  }

  test("lshCandidatesOf output is unchanged by the native est (sf0.001)") {
    // end-to-end tripwire: the candidate operator through the native
    // expression still matches the oracle-checked q21 shape
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = graft.operators.DedupOps.lshCandidatesOf(docs).collect()
    assert(out.nonEmpty)
    // est_jaccard is k/8 by construction at the default preset
    assert(out.forall(r => { val e = r.getDouble(2); e >= 0.5 && (e * 8).isWhole }))
  }
}

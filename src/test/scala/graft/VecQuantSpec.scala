package graft

import org.apache.spark.sql.functions._

import graft.functions.VecQuant
import graft.operators.EmbeddingOps

class VecQuantSpec extends SparkSpec {
  import spark.implicits._

  // the exact SQL-lambda formulation the native expression replaces —
  // parity is against these (same doctrine as VecHealthSpec)
  private val lambdaMax = "array_max(transform(v, x -> abs(x)))"
  private def lambdaQ(mx: String) =
    s"""CASE WHEN $mx = 0.0D
       |  THEN transform(v, x -> if(x IS NULL, CAST(NULL AS INT), 0))
       |  ELSE transform(v, x -> CAST(floor(x / $mx * 127.0D + 0.5D) AS INT))
       |END""".stripMargin

  test("bit-identical to the transform-lambda quantization, edges included") {
    val edges = spark.sql(
      """SELECT v FROM VALUES
        |  (CAST(array() AS ARRAY<DOUBLE>)),
        |  (array(0.0d, 0.0d, 0.0d)),
        |  (array(127.0d, 2.5d, -2.5d, 3.5d, -3.5d, 0.0d)),
        |  (array(1.0d, -1.0d, 0.5d, -0.5d)),
        |  (CAST(array(2.0, NULL, -2.0) AS ARRAY<DOUBLE>)),
        |  (array(1e-300d, -1e-300d, 5e-301d)),
        |  (array(1e308d, -1e308d, 2.5e306d))
        |AS t(v)""".stripMargin)
    val rows = edges.select(
      VecQuant.vec_q8($"v").as("q"),
      expr(s"($lambdaMax)").as("mx"),
      expr(lambdaQ(lambdaMax)).as("lq")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](2),
        s"native/lambda divergence (mx=${r.get(1)}): " +
          s"${r.getSeq[Any](0)} vs ${r.getSeq[Any](2)}")
    }
    // pinned round-half-UP semantics (floor(x+0.5): -2.5/127-scale
    // lands at -2, +2.5 at 3) and the saturation bound |q| <= 127
    val hard = rows(2).getSeq[Int](0)
    assert(hard == Seq(127, 3, -2, 4, -3, 0),
      s"half-up rounding contract broken: $hard")
    assert(rows(1).getSeq[Int](0) == Seq(0, 0, 0), "zero vector -> all zeros")
    assert(rows(4).getSeq[Any](0) == Seq(127, null, -127),
      "null element stays null and is skipped by the max")
  }

  test("random parity, null input, and bounds") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(60)(Array.fill(64)(rnd.nextDouble() * 2 - 1)).toDF("v")
    df.select(VecQuant.vec_q8($"v").as("q"), expr(lambdaQ(lambdaMax)).as("lq"))
      .collect().foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1))
        assert(r.getSeq[Int](0).forall(q => q >= -127 && q <= 127),
          "quantized components must saturate inside [-127, 127]")
        assert(r.getSeq[Int](0).exists(q => math.abs(q) == 127),
          "the max-magnitude component must land exactly on ±127")
      }
    val nullIn = Seq((1L, None: Option[Array[Double]])).toDF("id", "v")
    assert(nullIn.select(VecQuant.vec_q8($"v")).collect().head.isNullAt(0),
      "null input must yield null")
  }

  test("interpreted path (nullSafeEval) forced directly and compared to codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.VecQ8
    // nullSafeEval IS the code under test: eval on literal inputs (no
    // plan, no codegen) against the df-codegen results on the same
    // vectors — the VecHealthSpec ADVICE-r18 doctrine
    val rows = spark.sql(
      """SELECT v FROM VALUES
        |  (CAST(array() AS ARRAY<DOUBLE>)),
        |  (array(0.0d, 0.0d)),
        |  (array(127.0d, 2.5d, -2.5d, 0.0d)),
        |  (CAST(array(2.0, NULL, -2.0) AS ARRAY<DOUBLE>)),
        |  (array(1e308d, -1e308d, 2.5e306d))
        |AS t(v)""".stripMargin)
      .select($"v", VecQuant.vec_q8($"v").as("q")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val interp = VecQ8(Literal.create(
          r.getSeq[Any](0), ArrayType(DoubleType, containsNull = true)))
        .eval(InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val interpSeq = (0 until interp.numElements()).map(i =>
        if (interp.isNullAt(i)) null else interp.getInt(i))
      assert(interpSeq == r.getSeq[Any](1),
        s"interpreted/codegen divergence on ${r.getSeq[Any](0)}: " +
          s"$interpSeq vs ${r.getSeq[Any](1)}")
    }
    assert(VecQ8(Literal.create(null, ArrayType(DoubleType, containsNull = true)))
      .eval(InternalRow.empty) == null)
  }

  test("q82 evaluates inside whole-stage codegen and stays close to the exact top-k") {
    val out = EmbeddingOps.quantizedCosineTopK(spark, sf)
    // columns: query_id, rank, vec_id, cos_q8 — collect THIS frame
    // (not a derived select, which plans its own QueryExecution)
    val quant = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // plan inspected AFTER the collect: AQE only finalizes (and
    // assigns WholeStageCodegen spans to) the plan on execution
    val plan = out.queryExecution.executedPlan.toString
    // the plan line carrying vec_q8 must sit inside a WholeStageCodegen
    // span (the "*(n)" marker on the node) — tree prefixes ("+- ")
    // precede the marker, so test containment, not the line start
    assert(plan.linesIterator.exists(l =>
        l.contains("vec_q8") && l.contains("*(")),
      s"vec_q8 not inside a codegen span:\n$plan")
    val exact = EmbeddingOps.cosineTopK(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(quant.size == exact.size && exact.size == 25)
    // int8 keeps cosine ordering nearly intact: measured 24/25 at
    // sf0.001 AND sf0.01 (pre-flight); assert a safe 80% recall bound
    assert((quant & exact).size >= 20,
      s"quantized recall collapsed: ${(quant & exact).size}/25")
  }
}

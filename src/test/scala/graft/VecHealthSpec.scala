package graft

import org.apache.spark.sql.functions._

import graft.functions.VecHealth

class VecHealthSpec extends SparkSpec {
  import spark.implicits._

  // the EXACT lambda forms q59 shipped before the native expression
  // (r18 fleet-sweep hit, PERF §50) — parity is against these
  private val lambdaZero = "size(filter(v, x -> x = 0.0d))"
  private val lambdaNonFinite =
    "size(filter(v, x -> isnan(x) or abs(x) = cast('Infinity' as double)))"

  test("bit-identical to the filter-lambda counts, edges included") {
    val edges = spark.sql(
      """SELECT v FROM VALUES
        |  (CAST(array() AS ARRAY<DOUBLE>)),
        |  (array(0.0d, -0.0d, 1.5d)),
        |  (array(cast('NaN' as double), cast('Infinity' as double),
        |         cast('-Infinity' as double), 2.0d)),
        |  (CAST(array(0.0, NULL, cast('NaN' as double)) AS ARRAY<DOUBLE>)),
        |  (array(1e308d, -1e308d, 4.9e-324d))
        |AS t(v)""".stripMargin)
    val rows = edges.select(
      VecHealth.vec_health_counts($"v").as("h"),
      expr(lambdaZero).as("lz"), expr(lambdaNonFinite).as("lnf")).collect()
    rows.foreach { r =>
      val h = r.getStruct(0)
      assert(h.getInt(0) == r.getInt(1),
        s"n_zero diverges: native ${h.getInt(0)} vs lambda ${r.getInt(1)}")
      assert(h.getInt(1) == r.getInt(2),
        s"n_nonfinite diverges: native ${h.getInt(1)} vs lambda ${r.getInt(2)}")
    }
    // -0.0 counts as zero (IEEE equality), NaN does not; null elements
    // count toward neither (the lambda predicate is NULL -> dropped)
    val byCase = rows.map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getInt(1)))
    assert(byCase(0) == ((0, 0)), "empty array")
    assert(byCase(1) == ((2, 0)), "0.0 and -0.0 both count as zero")
    assert(byCase(2) == ((0, 3)), "NaN and both infinities are non-finite")
    assert(byCase(3) == ((1, 1)), "null element counts toward neither")
  }

  test("random parity and null input") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextInt(5) match {
      case 0 => 0.0
      case 1 => Double.NaN
      case 2 => Double.PositiveInfinity
      case _ => rnd.nextDouble() - 0.5
    })
    val df = Seq.fill(40)(vec()).toDF("v")
    df.select(VecHealth.vec_health_counts($"v").as("h"),
        expr(lambdaZero).as("lz"), expr(lambdaNonFinite).as("lnf"))
      .collect().foreach { r =>
        assert(r.getStruct(0).getInt(0) == r.getInt(1))
        assert(r.getStruct(0).getInt(1) == r.getInt(2))
      }
    val nullIn = Seq((1L, None: Option[Array[Double]])).toDF("id", "v")
    assert(nullIn.select(VecHealth.vec_health_counts($"v")).collect()
      .head.isNullAt(0), "null input must yield null")
  }

  test("interpreted path (nullSafeEval) forced directly and compared to codegen (ADVICE r18)") {
    // The pre-r19 suite only ever evaluated the expression under
    // whole-stage codegen, so a nullSafeEval/doGenCode divergence —
    // the exact defect class a two-path expression guards against —
    // would never have been caught. Here nullSafeEval IS the code
    // under test: eval the expression on literal inputs (no plan, no
    // codegen) and compare against the codegen results on the same
    // vectors.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.VecHealthCounts
    val edges = spark.sql(
      """SELECT v FROM VALUES
        |  (CAST(array() AS ARRAY<DOUBLE>)),
        |  (array(0.0d, -0.0d, 1.5d)),
        |  (array(cast('NaN' as double), cast('Infinity' as double),
        |         cast('-Infinity' as double), 2.0d)),
        |  (CAST(array(0.0, NULL, cast('NaN' as double)) AS ARRAY<DOUBLE>)),
        |  (array(1e308d, -1e308d, 4.9e-324d))
        |AS t(v)""".stripMargin)
    val rows = edges
      .select($"v", VecHealth.vec_health_counts($"v").as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val interp = VecHealthCounts(
          Literal.create(r.getSeq[Any](0), ArrayType(DoubleType, containsNull = true)))
        .eval(InternalRow.empty).asInstanceOf[InternalRow]
      val codegen = r.getStruct(1)
      assert((interp.getInt(0), interp.getInt(1)) ==
          ((codegen.getInt(0), codegen.getInt(1))),
        s"interpreted/codegen divergence on ${r.getSeq[Any](0)}: " +
          s"(${interp.getInt(0)},${interp.getInt(1)}) vs " +
          s"(${codegen.getInt(0)},${codegen.getInt(1)})")
    }
    // interpreted null-input contract, same path
    assert(VecHealthCounts(Literal.create(null, ArrayType(DoubleType, containsNull = true)))
      .eval(InternalRow.empty) == null, "interpreted eval of null input must be null")
  }

  test("evaluates inside whole-stage codegen and agrees with interpreted eval") {
    val df = spark.range(1, 301)
      .withColumn("v", array((0 until 16).map(d =>
        when(($"id" + d) % 7 === 0, lit(0.0))
          .when(($"id" + d) % 11 === 0, lit(Double.NaN))
          .otherwise(($"id" + d).cast("double"))): _*))
    val out = df.select($"id", VecHealth.vec_health_counts($"v").as("h"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("vec_health_counts") && l.trim.startsWith("*(")),
      s"vec_health_counts not inside a codegen span:\n$plan")
    val codegen = out.collect().map(r =>
      (r.getLong(0), r.getStruct(1).getInt(0), r.getStruct(1).getInt(1))).toSeq
    // interpreted eval path (nullSafeEval) via a filter that blocks
    // whole-stage codegen: compare against the lambda forms instead
    val lambda = df.select($"id",
        expr(lambdaZero.replace("v", "v")).as("z"),
        expr(lambdaNonFinite).as("nf"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(codegen == lambda)
  }
}

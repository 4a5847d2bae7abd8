package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private val lambdaDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x)"

  test("bit-identical to the higher-order fold on random vectors") {
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)((rnd.nextDouble() - 0.5) * 2e6 + 0.123456789)
    val df = Seq.fill(50)((vec(), vec())).toDF("a", "b")
    val rows = df.select(
      DotProduct.dot_product($"a", $"b").as("native"),
      expr(lambdaDot).as("lambda")).collect()
    // exact bit equality, not approximate — same fold order
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null input, null element, and length mismatch all yield null") {
    val cases = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (None: Option[Array[Double]], Some(Array(1.0, 2.0))),
      (Some(Array(1.0, 2.0)), Some(Array(3.0)))) // length mismatch
      .toDF("a", "b")
    assert(cases.select(DotProduct.dot_product($"a", $"b")).collect()
      .forall(_.isNullAt(0)))
    val nullElem = spark.sql(
      "SELECT CAST(array(1.0, NULL) AS ARRAY<DOUBLE>) a, " +
        "CAST(array(2.0, 3.0) AS ARRAY<DOUBLE>) b")
    assert(nullElem.select(DotProduct.dot_product($"a", $"b")).collect()
      .head.isNullAt(0))
  }

  test("evaluates inside whole-stage codegen over many rows") {
    // spark.range (not a LocalTableScan, which ConvertToLocalRelation
    // would evaluate driver-side) and codegen-able array() inputs so
    // the whole projection compiles into one whole-stage-codegen span
    val df = spark.range(1, 501)
      .withColumn("a", array((0 until 64).map(d => ($"id" + d).cast("double")): _*))
      .withColumn("b", array((0 until 64).map(d => ($"id" - d).cast("double")): _*))
    val out = df.select(DotProduct.dot_product($"a", $"b").as("d"))
    val plan = out.queryExecution.executedPlan.toString
    // the *(n) prefix marks operators fused into WholeStageCodegen
    assert(plan.linesIterator.exists(l => l.contains("dot_product") && l.trim.startsWith("*(")),
      s"dot_product not inside a codegen span:\n$plan")
    val got = out.collect().map(_.getDouble(0))
    val exp = (1 to 500).map { i =>
      var s = 0.0
      (0 until 64).foreach(d => s += (i + d).toDouble * (i - d).toDouble)
      s
    }
    assert(got.toSeq == exp)
  }

  test("registers for SQL with arity validation") {
    DotProduct.register(spark)
    val r = spark.sql(
      "SELECT dot_product(CAST(array(1.0,2.0) AS ARRAY<DOUBLE>), " +
        "CAST(array(3.0,4.0) AS ARRAY<DOUBLE>)) AS d").collect().head.getDouble(0)
    assert(r == 11.0)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(CAST(array(1.0) AS ARRAY<DOUBLE>))").collect()
    }
    assert(e.getMessage.contains("dot_product"))
    val typeErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product('a', 'b')").collect()
    }
    assert(typeErr.getMessage.toLowerCase.contains("array<double>"))
  }
}

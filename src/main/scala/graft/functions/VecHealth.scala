package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: the embedding-health counts — zero
  * components and non-finite components — in ONE codegen pass over an
  * array<double> column.
  *
  * The built-in formulation — `size(filter(v, x -> x = 0.0d))` plus
  * `size(filter(v, x -> isnan(x) or abs(x) = Inf))` — is a pair of
  * HigherOrderFunctions: CodegenFallback, two materialized filtered
  * arrays, and two lambda dispatches per element per row (the r18
  * fleet sweep's q59 hit, PERF §50). The health census is a
  * corpus-wide narrow map that gates every downstream ANN/dedup
  * stage, so its per-row cost is paid on every vector at 100 TB; this
  * expression counts both in a single allocation-free loop (the only
  * per-row allocation is the 2-field output row).
  *
  * Parity with the lambda forms (spec-pinned in VecHealthSpec):
  * `x = 0.0d` counts -0.0 (IEEE/SQL equality) and not NaN;
  * `isnan(x) OR abs(x) = Infinity` is exactly
  * `Double.isNaN || Double.isInfinite`; a NULL element makes either
  * lambda predicate NULL, which `filter` drops — so null elements
  * count toward neither. Null input yields null. */
case class VecHealthCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_zero", IntegerType, nullable = false),
    StructField("n_nonfinite", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_health_counts requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var z = 0
    var nf = 0
    var i = 0
    val n = v.numElements()
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = v.getDouble(i)
        if (x == 0.0) z += 1
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) nf += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](z, nf))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val z = ctx.freshName("z")
      val nf = ctx.freshName("nf")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |int $z = 0;
         |int $nf = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = $a.getDouble($i);
         |    if ($x == 0.0) $z++;
         |    if (Double.isNaN($x) || Double.isInfinite($x)) $nf++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$z, $nf});
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): VecHealthCounts = copy(child = newChild)
  override def prettyName: String = "vec_health_counts"
}

object VecHealth {

  /** Column form: struct(n_zero INT, n_nonfinite INT). */
  def vec_health_counts(v: Column): Column =
    GraftShim.column(VecHealthCounts(GraftShim.expression(v)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: symmetric int8 quantization of an
  * embedding vector — `q_i = floor(x_i / max|x| * 127 + 0.5)` — in one
  * codegen pass over an array<double> column.
  *
  * Why this exists (the 100 TB path): an embedding corpus at
  * float32×dim is usually the LARGEST byte stream in a training-data
  * pipeline; int8 quantization cuts the scanned/shuffled bytes 4–8×
  * while cosine ordering survives almost unchanged, because the
  * per-vector scale factors cancel out of the cosine entirely:
  * cos(q_a, q_b) = dot(q_a,q_b) / (‖q_a‖·‖q_b‖) needs no
  * dequantization. The integer dots are exact (|q|≤127, so a
  * 64-dim dot ≤ ~1.03M — exactly representable in double), which
  * makes the quantized similarity CROSS-ENGINE deterministic — a
  * stronger oracle property than the float baseline's sequential-fold
  * agreement (EmbeddingOps.cosineTopK).
  *
  * The SQL-lambda formulation — `transform(v, x -> cast(floor(x /
  * mx * 127.0 + 0.5) as int))` plus an `aggregate` for the max — is a
  * pair of HigherOrderFunctions: CodegenFallback, interpreted per
  * element per row (the PERF §50 defect class). This expression does
  * the max pass and the quantize pass in one allocation-bounded loop
  * (one int[] per row — the output).
  *
  * Parity contract (spec-pinned in VecQuantSpec against the exact
  * lambda form): the ratio is taken FIRST — `x / mx * 127.0` — so the
  * intermediate is bounded by ±127.5 and cannot overflow for any
  * finite input (the `x * 127.0` order sends a ±1e308 component to
  * Infinity and a saturating cast); `floor(x/mx*127 + 0.5)` is
  * round-half-UP (toward
  * +inf: -2.5 → -2), identical in Spark and DuckDB because both
  * evaluate the same IEEE ops in the same order; a zero or
  * all-null/empty vector quantizes to all zeros (mx = 0 guard — the
  * lambda form's CASE WHEN); a NULL element stays NULL (transform
  * propagates it; it contributes nothing to the max, as list_max /
  * array_max skip nulls); NULL input yields NULL. */
case class VecQ8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(IntegerType, containsNull)
    case _ => ArrayType(IntegerType, containsNull = true)
  }
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_q8 requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val ab = math.abs(v.getDouble(i))
        if (ab > mx) mx = ab
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!v.isNullAt(i))
        out(i) =
          if (mx == 0.0) 0
          else math.floor(v.getDouble(i) / mx * 127.0 + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val ab = ctx.freshName("ab")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $ab = Math.abs($a.getDouble($i));
         |    if ($ab > $mx) $mx = $ab;
         |  }
         |}
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = Integer.valueOf($mx == 0.0 ? 0 :
         |      (int) Math.floor($a.getDouble($i) / $mx * 127.0 + 0.5));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecQ8 =
    copy(child = newChild)
  override def prettyName: String = "vec_q8"
}

object VecQuant {

  /** Column form: int8-range quantized copy of an array<double>
    * vector (values in [-127, 127] as INT; the per-vector scale
    * max|x|/127 is recoverable but deliberately not returned — cosine
    * over quantized vectors never needs it). */
  def vec_q8(v: Column): Column =
    GraftShim.column(VecQ8(GraftShim.expression(v)))
}

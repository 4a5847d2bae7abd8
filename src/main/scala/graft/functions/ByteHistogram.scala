package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Native Catalyst expression: L1-normalized `dim`-bin byte histogram
  * of a binary column — the stub "decoder" of the multimodal feature
  * pipeline (graft.functions.Multimodal).
  *
  * Replaces the round-1 `df.rdd.mapPartitions` implementation: as an
  * expression the feature extraction stays inside the SQL engine —
  * whole-stage codegen, column pruning through the projection, no
  * RDD<->DataFrame boundary. A real media decoder with the same
  * per-row purity would slot in the same way (or via typed
  * `Dataset.mapPartitions` if it needs batched native calls).
  */
case class ByteHistogram(child: Expression, dim: Int = 16) extends UnaryExpression {
  require(dim > 0 && dim <= 256, s"dim must be in [1, 256], got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_histogram requires BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteHistogram.histogram(input.asInstanceOf[Array[Byte]], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("hist")
      val i = ctx.freshName("i")
      val t = ctx.freshName("total")
      s"""
         |byte[] $b = $c;
         |float[] $h = new float[$dim];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h[(($b[$i] & 0xff) * $dim) / 256] += 1f;
         |}
         |float $t = Math.max(1f, (float) $b.length);
         |for (int $i = 0; $i < $dim; $i++) { $h[$i] /= $t; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
  override def prettyName: String = "byte_histogram"
}

object ByteHistogram {
  def histogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * dim) / 256) += 1f
      i += 1
    }
    val total = math.max(1f, bytes.length.toFloat)
    var j = 0
    while (j < dim) { hist(j) /= total; j += 1 }
    hist
  }

  /** Column form. */
  def byte_histogram(c: Column, dim: Int = 16): Column =
    GraftShim.column(ByteHistogram(GraftShim.expression(c), dim))
}

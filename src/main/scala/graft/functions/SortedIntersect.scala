package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: DISTINCT-intersection size of two
  * SORTED array<bigint> (or array<int>) columns by two-pointer merge.
  *
  * The built-in `size(array_intersect(a, b))` builds a hash set of one
  * side and a result array per ROW — allocation plus hashing per
  * element. When both sides are already sorted (the staged `doc_sets`
  * arrays are written through `sort_array`), the same set-intersection
  * count is a single forward scan of long compares with zero
  * allocation, inside whole-stage codegen. This is the hot loop of the
  * q79 verify stage, where a candidate-heavy corpus multiplies row
  * count into the hundreds of thousands.
  *
  * Duplicate elements are counted once per distinct value (set
  * semantics, matching array_intersect). UNSORTED input silently
  * undercounts — callers own the sort invariant; every producer in
  * this repo stages through sort_array. Null input or null element
  * yields null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two ARRAY<BIGINT> or two " +
          s"ARRAY<INT> inputs, got ${l.catalogString} and ${r.catalogString}")
    }

  private def isInt: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    def at(arr: ArrayData, i: Int): Long =
      if (isInt) arr.getInt(i).toLong else arr.getLong(i)
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = at(x, i); val yv = at(y, j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        val v = xv
        while (i < nx && !x.isNullAt(i) && at(x, i) == v) i += 1
        while (j < ny && !y.isNullAt(j) && at(y, j) == v) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (isInt) "getInt" else "getLong"
      val elem = if (isInt) "int" else "long"
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  $elem $xv = $a.$get($i);
         |  $elem $yv = $b.$get($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    while ($i < $nx && !$a.isNullAt($i) && $a.$get($i) == $xv) $i++;
         |    while ($j < $ny && !$b.isNullAt($j) && $b.$get($j) == $yv) $j++;
         |  }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Column form. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))
}

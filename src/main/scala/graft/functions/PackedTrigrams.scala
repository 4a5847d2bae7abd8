package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the character-trigram stream of a
  * string as PACKED BIGINT keys — codepoints c0 c1 c2 become
  * `(c0 << 42) | (c1 << 21) | c2` (21 bits holds any Unicode scalar,
  * 0x10FFFF < 2^21; the packing is injective so grouping on the keys
  * counts exactly like grouping on the trigram strings).
  *
  * Replaces the SQL-expr pipeline `transform(split(text, ''), ascii)`
  * + windowed shifts in the trigram-typicality operator
  * (graft.operators.CorpusOps): the split allocates one single-char
  * UTF8String per character per row; this walks the string's bytes
  * once and emits the long array directly, staying inside whole-stage
  * codegen.
  */
case class PackedTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"packed_trigrams requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PackedTrigrams.pack(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PackedTrigrams.pack($c));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackedTrigrams =
    copy(child = newChild)
  override def prettyName: String = "packed_trigrams"
}

object PackedTrigrams {
  /** One pass over the string's codepoints; empty for under-3-char
    * strings. Iteration is by Unicode CODEPOINT (matching Spark's
    * `split(s, '')` + `ascii` semantics, which never split surrogate
    * pairs), not UTF-16 char. */
  def pack(s: UTF8String): Array[Long] = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < 3) return Array.emptyLongArray
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < out.length) {
      out(i) = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      i += 1
    }
    out
  }

  /** Column form. */
  def packed_trigrams(c: Column): Column =
    GraftShim.column(PackedTrigrams(GraftShim.expression(c)))
}

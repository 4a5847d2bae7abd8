package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string —
  * fold over Unicode code points of (h * MULT + cp) mod MOD.
  *
  * This is the custom-`Expression` extension point (SURVEY.md §2.11 /
  * build-prompt preference (b)): the same computation expressed with
  * built-ins (`aggregate(transform(split(s,''), ...)))`) allocates a
  * per-character array per row; this expression runs a tight loop
  * over the UTF8 bytes inside whole-stage codegen — no allocation,
  * no lambda dispatch.
  *
  * Semantics match the SQL-expressible form used by the DuckDB oracle
  * (TextOps.fingerprintSql): identical constants, identical codepoint
  * iteration for BMP input.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  val Mod: Long = RollingHash.Mod
  val Mult: Long = RollingHash.Mult

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * ${Mult}L + $cp) % ${Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val Mod: Long = 1000000007L
  val Mult: Long = 31L

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column form. */
  def rolling_hash(c: Column): Column =
    GraftShim.column(RollingHash(GraftShim.expression(c)))

  /** SQL registration: SELECT rolling_hash(text) ... */
  def register(spark: SparkSession, name: String = "rolling_hash"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> name, "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        RollingHash(exprs.head)
      },
      "built-in")
}

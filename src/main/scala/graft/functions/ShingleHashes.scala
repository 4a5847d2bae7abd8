package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct word-bigram shingles of a
  * document with BOTH dedup hash widths, in one pass —
  * `array<struct<s: string, h: bigint, h60: bigint>>` where
  * `h`  = first 32 bits of md5(s)  (minhash input) and
  * `h60` = first 60 bits of md5(s) (simhash input).
  *
  * Bit-identical to the SQL-expr pipeline it replaces
  * (split + array_distinct(transform(concat)) + two
  * conv(substring(md5(s), ..), 16, 10) projections) — the hex-string
  * round trip is gone: the prefixes are read straight off the digest
  * bytes (15 hex chars = the first 8 bytes as an unsigned 64-bit
  * value >>> 4; 8 hex chars = the first 4 bytes). Tokenization
  * follows Spark's `split(text, ' ')` with limit -1 exactly
  * (trailing empty tokens kept); distinctness keeps first occurrence
  * like `array_distinct`.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ShingleHashes.outType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.ShingleHashes.shingles($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("h60", LongType, nullable = false))), containsNull = false)

  def shingles(text: UTF8String): ArrayData = {
    // Spark's split(text, ' ') is regex-based with limit -1: empty
    // tokens (leading, repeated, trailing separators) are all kept
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length - 1) {
      seen.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      val s = it.next()
      md.reset()
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = bytes 0..3 as an unsigned 32-bit value
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      // first 15 hex chars = bytes 0..7 as an unsigned 64-bit value >>> 4
      var h64 = 0L
      var b = 0
      while (b < 8) { h64 = (h64 << 8) | (d(b) & 0xffL); b += 1 }
      val h60 = h64 >>> 4
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(s), h, h60))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column form. */
  def shingle_hashes(c: Column): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(c)))
}

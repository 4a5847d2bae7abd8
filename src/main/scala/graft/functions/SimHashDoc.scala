package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's 60-bit simhash in one
  * pass — for each DISTINCT word-bigram shingle, the first 60 bits of
  * md5(shingle) vote ±1 per bit position; the result sets bit j iff
  * the position-j sum is positive.
  *
  * Bit-identical to the aggregate reference form
  * (`DedupOps.simhashFrom`: shingle_hashes → explode → 60 ±1 bit-sum
  * aggregates → fold): distinctness is BY SHINGLE STRING (first
  * occurrence kept, exactly `array_distinct`/ShingleHashes semantics)
  * because, unlike a minimum, a ±1 SUM is corrupted by duplicate
  * votes. The per-bit integer sums commute, so fold order is
  * irrelevant and the output matches the groupBy form exactly.
  *
  * Plan shape: a narrow zero-exchange map over the documents scan —
  * no per-(doc, shingle) row stream, no 61-column aggregate buffers,
  * no partial-row shuffle; linear in corpus bytes at 100 TB.
  *
  * Documents with fewer than 2 tokens have no shingles and return -1
  * (valid simhashes occupy [0, 2^60); callers filter `simhash >= 0`),
  * matching their absence from the aggregate form's groupBy output.
  */
case class SimHashDoc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_doc requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SimHashDoc.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SimHashDoc.simhash($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashDoc =
    copy(child = newChild)
  override def prettyName: String = "simhash_doc"
}

object SimHashDoc {

  def simhash(text: UTF8String): Long = {
    // tokenization contract: Spark's split(text, ' ') with limit -1
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2) return -1L
    // distinct BY STRING, first occurrence kept — ±1 sums are not
    // duplicate-insensitive, so this mirrors ShingleHashes exactly
    val seen = new java.util.HashSet[String](toks.length * 2)
    val sums = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length - 1) {
      val s = toks(i) + " " + toks(i + 1)
      if (seen.add(s)) {
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = bytes 0..7 as unsigned 64-bit >>> 4 —
        // the same h60 ShingleHashes feeds the aggregate form
        var h64 = 0L
        var b = 0
        while (b < 8) { h64 = (h64 << 8) | (d(b) & 0xffL); b += 1 }
        val h60 = h64 >>> 4
        var j = 0
        while (j < 60) {
          // branch-free ±1 vote per bit
          sums(j) += (((h60 >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Column form. */
  def simhash_doc(c: Column): Column =
    GraftShim.column(SimHashDoc(GraftShim.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the polynomial hash of EVERY k-token
  * sliding window of a document, in one pass — `array<bigint>` with
  * one entry per window, where entry i is the hash of
  * `concat_ws(' ', toks[i..i+k-1])` (Spark `split(text, ' ')`
  * tokenization, limit -1, empty tokens kept).
  *
  * This is the repeated-span detector's heavy stage (q80): the
  * built-in shape (`transform(sequence(...), i -> xxhash64(
  * concat_ws(' ', slice(toks, i, k))))`) assembles every window's
  * string — ~k× the corpus bytes of transient allocation before any
  * hash is taken. This expression walks the document's characters
  * ONCE, building prefix hashes P and powers PW, then reads each
  * window hash as (P[e] - P[s]·PW[e-s]) mod M in O(1) — total work
  * O(chars + windows), independent of k.
  *
  * Hash space: M = 2^61 - 1 (Mersenne; products reduced via
  * `Math.multiplyHigh`, 2^64 ≡ 8 mod M). A 30-bit modulus would
  * birthday-collide in the low millions of distinct spans and flood
  * the candidate stage; at 2^61 collisions stay negligible far past
  * 10^9 spans — and they only ever COST (an extra candidate the
  * exact string confirm discards), never corrupt, because every
  * consumer re-groups survivors by the span string.
  *
  * The window hash over the virtual joined string IS the plain
  * polynomial hash of the span text, so the scalar companion
  * [[SpanHashes.span_hash]] (same constants, whole-string fold) is
  * consistent by construction — `SpanHashesSpec` pins the identity.
  */
case class SpanHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_hashes requires STRING input, got ${child.dataType.catalogString}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_hashes requires k >= 1, got $k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    SpanHashes.spans(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SpanHashes.spans($c, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  val Mod: Long = (1L << 61) - 1
  val Mult: Long = 1315423911L

  /** (a * b) mod (2^61 - 1) without BigInt: the 128-bit product is
    * hi·2^64 + lo, and 2^64 ≡ 8 (mod M), so it folds to
    * 8·hi + (lo mod M) with one more fold for the carry. */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & Mod) + (lo >>> 61) + hi * 8L
    r = (r & Mod) + (r >>> 61)
    if (r >= Mod) r - Mod else r
  }

  /** Plain polynomial hash of a whole string — the scalar consumed by
    * the exact-confirm stage; equals the windowed formula applied to
    * the full string. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = mulmod(h, Mult) + s.charAt(i)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  def spans(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length
    if (m < k) return new GenericArrayData(Array.empty[Any])
    // virtual string: tokens joined by single spaces (what concat_ws
    // re-emits even when the source had repeated separators)
    var n = m - 1
    var i = 0
    while (i < m) { n += toks(i).length; i += 1 }
    val p = new Array[Long](n + 1)  // p(c) = hash of first c chars
    val pw = new Array[Long](n + 1) // pw(c) = Mult^c mod M
    val start = new Array[Int](m)   // char offset of token i
    pw(0) = 1L
    var c = 0
    i = 0
    while (i < m) {
      start(i) = c
      val t = toks(i)
      var j = 0
      while (j < t.length) {
        var h = mulmod(p(c), Mult) + t.charAt(j)
        if (h >= Mod) h -= Mod
        p(c + 1) = h
        pw(c + 1) = mulmod(pw(c), Mult)
        c += 1; j += 1
      }
      if (i < m - 1) { // the joining space
        var h = mulmod(p(c), Mult) + ' '
        if (h >= Mod) h -= Mod
        p(c + 1) = h
        pw(c + 1) = mulmod(pw(c), Mult)
        c += 1
      }
      i += 1
    }
    val out = new Array[Any](m - k + 1)
    i = 0
    while (i <= m - k) {
      val s = start(i)
      val e = if (i + k - 1 == m - 1) n else start(i + k) - 1
      // hash(span) = p(e) - p(s)·Mult^(e-s), normalized into [0, M)
      var h = p(e) - mulmod(p(s), pw(e - s))
      if (h < 0) h += Mod
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column forms. */
  def span_hashes(c: Column, k: Int): Column =
    GraftShim.column(SpanHashes(GraftShim.expression(c), k))

  def span_hash(c: Column): Column =
    GraftShim.column(SpanHashScalar(GraftShim.expression(c)))
}

/** Scalar companion: polynomial hash of one string under the same
  * constants — applied to a window's joined text it reproduces that
  * window's [[SpanHashes]] entry exactly. */
case class SpanHashScalar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"span_hash requires STRING input, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    SpanHashes.hash(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SpanHashes.hash($c.toString());"
    })
  override protected def withNewChildInternal(newChild: Expression): SpanHashScalar =
    copy(child = newChild)
  override def prettyName: String = "span_hash"
}

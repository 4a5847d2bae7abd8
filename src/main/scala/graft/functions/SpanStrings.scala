package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the STRING of every k-token window of
  * a document, at a configurable stride, in one pass —
  * `array<string>` where entry j is
  * `concat_ws(' ', slice(split(text, ' '), j*stride + 1, k))`.
  *
  * The built-in shape the span/chunk generators used —
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, ..., k)))`
  * — is a HigherOrderFunction: CodegenFallback, with a materialized
  * index array, a sliced token-array allocation, and an interpreted
  * lambda dispatch PER WINDOW (the same §47 defect class the LSH
  * candidate build hid; the r17 CodegenSweep flagged it in q55, q80
  * and q81 — together 8.70 s of the r16 100× bench; measured after
  * the rewrite across the three r18 100× runs: q55 2.54 → 0.66–0.67 s,
  * q80 2.26 → 2.02–2.67 s, q81 3.90 → 2.79–3.88 s — the q55 shape,
  * whose windows dominated its wall, keeps −74%; the q80/q81 shapes
  * are span-hash-bound and sit in the noise band, PERF §52b). This
  * expression
  * exploits the split/join round-trip identity: `split(text, ' ', -1)`
  * re-joined with single spaces is ALWAYS the original string
  * (repeated separators become empty tokens and come back as repeated
  * separators), so every window string is a SUBSTRING of the input —
  * one pass computes token offsets, then each window is one substring
  * copy, no token arrays, no lambdas, inside whole-stage codegen.
  *
  * Two window geometries, matching the two call-site semantics:
  *   - `stride = 1, includePartial = false` (q80/q81 sliding spans):
  *     the m−k+1 full windows; empty array when the document has
  *     fewer than k tokens.
  *   - `stride = k, includePartial = true` (q55 boilerplate chunks):
  *     the ceil(m/k) non-overlapping chunks, the last one short —
  *     exactly `slice(toks, i*k + 1, k)`'s tail behavior.
  *
  * `SpanHashesSpec` pins bit-parity against the exact old transform
  * forms on the documents corpus plus separator edge cases.
  */
case class SpanStrings(child: Expression, k: Int, stride: Int,
                       includePartial: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_strings requires STRING input, got ${child.dataType.catalogString}")
    else if (k < 1 || stride < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_strings requires k >= 1 and stride >= 1, got k=$k stride=$stride")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    SpanStrings.spans(input.asInstanceOf[UTF8String], k, stride, includePartial)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.SpanStrings.spans($c, $k, $stride, $includePartial);"
    })

  override protected def withNewChildInternal(newChild: Expression): SpanStrings =
    copy(child = newChild)
  override def prettyName: String = "span_strings"
}

object SpanStrings {

  def spans(text: UTF8String, k: Int, stride: Int,
            includePartial: Boolean): ArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val m = toks.length
    val starts = new Array[Int](m)
    var c = 0
    var i = 0
    while (i < m) { starts(i) = c; c += toks(i).length + 1; i += 1 }
    val nWin =
      if (includePartial) (m + stride - 1) / stride
      else if (m < k) 0
      else (m - k) / stride + 1
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val st = w * stride
      val lastIdx = math.min(st + k, m) - 1
      out(w) = UTF8String.fromString(
        s.substring(starts(st), starts(lastIdx) + toks(lastIdx).length))
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Sliding k-token windows (full windows only): entry i is
    * `concat_ws(' ', slice(split(text,' '), i+1, k))` for
    * i in 0..m−k; empty array when the document is shorter than k. */
  def span_strings(text: Column, k: Int): Column =
    GraftShim.column(SpanStrings(GraftShim.expression(text), k, 1,
      includePartial = false))

  /** Non-overlapping k-token chunks (short tail included): entry i is
    * `concat_ws(' ', slice(split(text,' '), i*k+1, k))` for
    * i in 0..ceil(m/k)−1. */
  def chunk_strings(text: Column, k: Int): Column =
    GraftShim.column(SpanStrings(GraftShim.expression(text), k, k,
      includePartial = true))
}

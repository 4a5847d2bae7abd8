package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the Gopher-repetition bigram census of
  * one document in one pass — `struct<n_bigrams, top_bigram_cnt,
  * dup_bigram_cnt>` (all BIGINT), where the counts are over word-
  * bigram OCCURRENCES (duplicates included):
  *
  *   n_bigrams       = size(toks) - 1 (every consecutive pair)
  *   top_bigram_cnt  = occurrences of the most frequent bigram
  *   dup_bigram_cnt  = occurrences belonging to any repeated bigram
  *
  * These are exactly the aggregates the repetition operators
  * (q45 `TextOps.repetitionStats`, q51 `CorpusOps.qualityFilter`'s
  * `repetitive` rule) previously derived from
  * `explode(transform(sequence(...), concat(...)))` → `groupBy(doc_id,
  * bg)` → `groupBy(doc_id)` — an interpreted higher-order transform
  * (CodegenFallback, PERF §47) feeding a CORPUS-SIZED bigram-string
  * shuffle plus a second per-doc shuffle. A bigram never matters
  * beyond its own document, so the whole census folds into a per-row
  * hash map inside the scan: zero exchanges, linear in corpus bytes,
  * the shape that survives 100 TB.
  *
  * Tokenization follows Spark's `split(text, ' ')` with limit -1
  * exactly (empty tokens kept), matching the SQL forms and
  * [[ShingleHashes]]. Documents with fewer than two tokens return
  * null — mirroring their absence from the old exploded aggregate
  * (callers `where(size(toks) >= 2)` or coalesce, as before). Null
  * text returns null.
  */
case class BigramRepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BigramRepStats.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigram_rep_stats requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    BigramRepStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("bgStats")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.expressions.GenericInternalRow $resultTerm =
         |  graft.functions.BigramRepStats.stats($c);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BigramRepStats =
    copy(child = newChild)
  override def prettyName: String = "bigram_rep_stats"
}

object BigramRepStats {
  val outType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("dup_bigram_cnt", LongType, nullable = false)))

  def stats(text: UTF8String): GenericInternalRow = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2) return null
    val counts = new java.util.HashMap[String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length - 1) {
      val k = toks(i) + " " + toks(i + 1)
      val prev = counts.get(k)
      counts.put(k, if (prev == null) 1L else prev + 1L): Unit
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c: Long = it.next()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any](toks.length - 1L, top, dup))
  }

  /** Column form. */
  def bigram_rep_stats(c: Column): Column =
    GraftShim.column(BigramRepStats(GraftShim.expression(c)))
}

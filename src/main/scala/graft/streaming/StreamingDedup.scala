package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, MinHashParams}

/** In-flight near-duplicate admission: a STREAM of new documents is
  * checked against a STATIC corpus signature table as it arrives —
  * the streaming half of `DedupOps.incrementalDedup` (q61), for
  * pipelines that admit documents continuously instead of in daily
  * batches.
  *
  * The enabler is a NARROW minhash signature: the batch path computes
  * signatures by explode + groupBy (one shuffle), which a streaming
  * projection cannot do without watermark-managed state. Folding the
  * min over each document's shingle array per row (`array_min` over a
  * `transform`) computes the identical signature with ZERO shuffle —
  * legal in any streaming projection and bit-identical to the staged
  * signature table (spec-pinned). The stream then explodes its band
  * keys and stream-static joins the corpus band table: per micro-batch
  * Spark plans a plain join against the static side.
  *
  * Scale shape: per-row signature math is codegen over the document's
  * own shingles (no corpus access); the static corpus bands are read
  * from the staged signature table and the join shuffles only the
  * micro-batch side unless the corpus side is pre-bucketed by band
  * key (the 100 TB layout: corpus bands bucketed once, every
  * micro-batch probes in place).
  */
object StreamingDedup {

  /** Per-element minhash mins over a pre-computed `__hs` hash-array
    * column — each entry is bit-identical to the batch signature
    * table's mh_i column. */
  private def sigArrayExpr(p: MinHashParams): String = {
    val mins = (0 until p.numHashes)
      .map(i => s"array_min(transform(__hs, h -> (${DedupOps.coeffA(i)} * h " +
        s"+ ${DedupOps.coeffB(i)}) % ${DedupOps.P}))")
      .mkString(", ")
    s"case when size(__hs) = 0 then cast(null as array<bigint>) else array($mins) end"
  }

  /** Attach `__sig` (narrow, shuffle-free minhash signature as
    * array<bigint>) to a frame with a `text` column; rows without a
    * bigram (docs under two tokens) carry a NULL `__sig`. The shingle
    * hashes come from the same native expression the batch path uses
    * (graft.functions.ShingleHashes), so batch/stream signature parity
    * holds by construction. */
  def withSignatureAll(docs: DataFrame,
                       p: MinHashParams = DedupOps.defaultParams): DataFrame =
    docs.withColumn("__sh",
        graft.functions.ShingleHashes.shingle_hashes(col("text")))
      .withColumn("__hs", expr("transform(__sh, x -> x.h)"))
      .withColumn("__sig", expr(sigArrayExpr(p)))
      .drop("__sh", "__hs")

  /** [[withSignatureAll]] with the unsignable rows dropped — they
    * cannot near-duplicate anything. */
  def withSignature(docs: DataFrame,
                    p: MinHashParams = DedupOps.defaultParams): DataFrame =
    withSignatureAll(docs, p).where(col("__sig").isNotNull)

  /** Stream-static near-dup matches: for each streaming document that
    * shares an LSH band with a corpus document and whose signature
    * agreement clears `estThreshold`, emit one row per (doc, corpus
    * partner, est_jaccard). On a stream the final dropDuplicates is
    * Spark's stateful dedup — a pair is emitted once for the stream's
    * lifetime; add a watermark upstream to bound that state when
    * doc_ids are unbounded. On a batch frame it is a plain distinct.
    *
    * @param stream    streaming (or batch) frame with `doc_id` and `text`
    * @param corpusSig STATIC signature table (doc_id, mh0..mhN) — the
    *                  staged table from `DedupOps.minhashSignatures`
    */
  def nearDupMatches(stream: DataFrame, corpusSig: DataFrame,
                     p: MinHashParams = DedupOps.defaultParams): DataFrame = {
    val sigStream = withSignature(stream, p)
      .select(col("doc_id").as("new_id"), col("__sig"))
      .withColumn("bk", explode(expr(DedupOps.bandArrayExpr(p))))
    val corpusBands = DedupOps.bandKeysOf(corpusSig, p)
      .withColumnRenamed("doc_id", "corpus_id")
      .withColumnRenamed("bk", "cbk")
    val corpusArr = corpusSig.select(col("doc_id").as("corpus_id"),
      array((0 until p.numHashes).map(i => col(s"mh$i")): _*).as("__csig"))
    val matches = expr(
      "aggregate(zip_with(__sig, __csig, (x, y) -> if(x = y, 1, 0)), 0, (a, e) -> a + e)")
    sigStream
      .join(corpusBands, col("bk") === col("cbk"))
      .join(corpusArr, "corpus_id")
      .withColumn("est_jaccard", matches.cast("double") / p.numHashes)
      .where(col("est_jaccard") >= DedupOps.estThreshold)
      .select("new_id", "corpus_id", "est_jaccard")
      .dropDuplicates("new_id", "corpus_id")
  }
}

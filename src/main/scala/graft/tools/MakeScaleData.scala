package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Deterministic scale-up generator for scaling experiments: replicates
  * the `documents` and `embeddings` tables of a source sf dir K times
  * with content decorrelated per replica, so pair densities stay
  * realistic instead of every row gaining K-1 near-duplicates.
  *
  *   - documents: replica r > 0 remaps the vocabulary by suffixing every
  *     token with the replica id. Bigram shingle sets across replicas are
  *     exactly disjoint, while within a replica the shingle structure is
  *     isomorphic to the source — so total near-dup pairs scale exactly
  *     linearly in K. (An earlier variant permuted token ORDER by a
  *     per-replica hash of the token value; with the corpus's ~30-word
  *     vocabulary that sorted every doc into the same global word order
  *     and manufactured a 289x pair explosion. Useful as an adversarial
  *     corpus, wrong as a scaling one.)
  *   - embeddings: replica r > 0 flips component signs by
  *     `xxhash64(i, r) % 2`, which preserves norms exactly while making
  *     cross-replica cosines ~0.
  *
  * No randomness: same (src, k) always produces byte-identical output.
  * Usage: runMain graft.tools.MakeScaleData <srcSfDir> <dstDir> <k>
  */
object MakeScaleData {

  def scaledDocuments(spark: SparkSession, src: String, k: Int): DataFrame = {
    val docs = Tables.documents(spark, src)
    (0 until k).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", concat_ws(" ",
          expr(s"transform(split(text, ' '), t -> concat(t, '~$r'))")))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _)
  }

  def scaledEmbeddings(spark: SparkSession, src: String, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, src)
    (0 until k).map { r =>
      if (r == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
        .withColumn("embedding",
          expr(s"transform(embedding, (x, i) -> " +
            s"case when pmod(xxhash64(i, $r), 2) = 0 then x else -x end)"))
    }.reduce(_ unionByName _)
  }

  /** K-fold replication of the TPC-H FACT tables for relational scale
    * points: lineitem/orders replicate with the order key remapped per
    * replica (so the two stay join-consistent and order-grain queries
    * scale linearly), while part/supplier keys are left alone — the
    * fact grows, the dimensions stay fixed, which is how a warehouse
    * actually scales (more transactions against the same catalog). */
  private def replicated(df: DataFrame, keyCol: String, k: Int): DataFrame =
    (0 until k).map { r =>
      if (r == 0) df
      else df.withColumn(keyCol, col(keyCol) + lit(r * 1000000000L))
    }.reduce(_ unionByName _)

  def scaledLineitem(spark: SparkSession, src: String, k: Int): DataFrame =
    replicated(Tables.lineitem(spark, src), "l_orderkey", k)

  def scaledOrders(spark: SparkSession, src: String, k: Int): DataFrame =
    replicated(Tables.orders(spark, src), "o_orderkey", k)

  /** Events replicate with DISJOINT user populations per replica
    * (event_id and user_id remapped, timestamps untouched): sessions,
    * windows, and per-user state machines keep their per-user density
    * while total volume scales linearly — the same day, K× the
    * traffic. The raw read passes `ts` through in whatever unit the
    * source carries (int64 nanos or timestamp micros); the loader
    * normalizes either representation identically). */
  def scaledEvents(spark: SparkSession, src: String, k: Int): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    (0 until k).map { r =>
      if (r == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(r * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(r * 10000000L))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: MakeScaleData <srcSfDir> <dstDir> <k> [tpch]")
    val src = args(0); val dst = args(1); val k = args(2).toInt
    val spark = GraftSession.local("graft-make-scale-data")
    scaledDocuments(spark, src, k)
      .repartition(GraftSession.cpus.toInt)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    scaledEmbeddings(spark, src, k)
      .repartition(GraftSession.cpus.toInt)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    if (args.contains("tpch")) {
      scaledLineitem(spark, src, k)
        .repartition(GraftSession.cpus.toInt)
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      scaledOrders(spark, src, k)
        .repartition(GraftSession.cpus.toInt)
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
      scaledEvents(spark, src, k)
        .repartition(GraftSession.cpus.toInt)
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
      // dimensions copy through unchanged
      Seq("part", "supplier", "customer", "nation", "region").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    }
    println(s"[make-scale-data] wrote ${k}x ${src} -> $dst")
    spark.stop()
  }
}

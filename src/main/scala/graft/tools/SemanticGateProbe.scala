package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamingSemanticGate

/** Measurement probe for [[graft.streaming.StreamingSemanticGate]]:
  * stages the sfDir's embeddings table into the quantized+bucketed
  * corpus layout, reports the AT-REST byte cut (float parquet vs int8
  * staged table — the claim the gate's scaladoc makes, measured), and
  * drives N probe batches of near-dup load (every batch vector is a
  * scaled copy of a corpus vector: scaling preserves cosine, so each
  * one must match — the REJECT path, the expensive one) for a
  * per-batch latency distribution.
  *
  * Usage: runMain graft.tools.SemanticGateProbe <sfDir> [nBatches]
  *          [batchSize]   (defaults 50, 1000)
  */
object SemanticGateProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemanticGateProbe <sfDir> [nBatches] [batchSize]")
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(50)
    val batchSize = args.lift(2).map(_.toLong).getOrElse(1000L)
    val spark = graft.GraftSession.local("semantic-gate-probe")
    val table = "sgp_corpus_vec"
    spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    val warehouse = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Option(warehouse.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(table))
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }

    val emb = Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    val t0 = System.nanoTime()
    val files = StreamingSemanticGate.stageCorpusVectors(spark, emb, table)
    println(f"[sgp] staged $nVec vecs in ${(System.nanoTime() - t0) / 1e9}%.1f s ($files files)")

    def bytesOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(bytesOf).sum
      else f.length()
    val srcBytes = bytesOf(new java.io.File(s"$sfDir/embeddings.parquet"))
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .where(col("col_name") === "Location").select("data_type")
      .collect()(0).getString(0).stripPrefix("file:")
    val dstBytes = bytesOf(new java.io.File(loc))
    println(f"[sgp] bytes: float corpus ${srcBytes / 1e6}%.1f MB -> int8 staged " +
      f"${dstBytes / 1e6}%.1f MB (${srcBytes.toDouble / dstBytes}%.2fx; staged side " +
      "also carries bucket id + norm + 8-byte ids)")

    // near-dup probe load: batch b = corpus slice b%m, each vector
    // scaled by 1.01 (cosine-preserving -> guaranteed match) under a
    // fresh id; localCheckpoint keeps generation out of the timing
    val m = math.max(1L, nVec / math.max(batchSize, 1L))
    val lat = (0 until n).map { b =>
      val batch = emb.where(pmod(col("vec_id"), lit(m)) === lit(b % m))
        .select((col("vec_id") + 900000000L).as("vec_id"),
          expr("transform(embedding, x -> x * CAST(1.01 AS FLOAT))").as("embedding"))
        .localCheckpoint(true)
      val s0 = System.nanoTime()
      val matches = StreamingSemanticGate.semanticMatches(batch, spark, table).count()
      val w = (System.nanoTime() - s0) / 1e9
      println(f"[sgp] batch $b%3d wall=$w%.3f s matches=$matches")
      spark.catalog.clearCache()
      w
    }
    val s = lat.sorted
    def pct(p: Double) = s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1))
    println(f"[sgp] summary n=$n batchSize=$batchSize corpus=$nVec " +
      f"p50=${pct(0.50)}%.3f p90=${pct(0.90)}%.3f p99=${pct(0.99)}%.3f max=${s.last}%.3f s")
    spark.stop()
  }
}

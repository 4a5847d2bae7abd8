package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamingSemanticGate

/** Recall/latency curve for the semantic gate's `planeSets` dial
  * (VERDICT r19 #6): the gate's nprobe=1 contract misses a true
  * neighbor whenever one near-zero projection puts it a bucket over;
  * each additional independent plane set recovers a geometric share
  * of those misses at ~linear staged-bytes and probe-candidate cost.
  * This probe MEASURES that trade instead of asserting it: for S in
  * 1..maxSets it stages the corpus at planeSets=S, probes with
  * perturbed twins of known corpus vectors (deterministic noise sized
  * to flip a few percent of projections while keeping
  * cos(twin, source) ~0.995 — the unit-norm corpus's components are
  * ~N(0, 1/√dim)), and reports twin→source RECALL, staged bytes/
  * files, stage wall, and median probe wall over `reps` runs.
  *
  * Usage: runMain graft.tools.SemanticRecallProbe <sfDir> [maxSets]
  *          [reps]   (defaults 4, 3)
  */
object SemanticRecallProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemanticRecallProbe <sfDir> [maxSets] [reps]")
    val sfDir = args(0)
    val maxSets = args.lift(1).map(_.toInt).getOrElse(4)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("semantic-recall-probe")
    val minCos = 0.9

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val nVec = emb.count()
    // perturbed twin of EVERY corpus vector under id+10^9: the truth
    // pair set is exactly {(id+10^9, id)} filtered to cos >= minCos
    val twins = emb.select((col("vec_id") + lit(1000000000L)).as("vec_id"),
      expr("transform(CAST(embedding AS array<double>), " +
        "(x, d) -> x + ((vec_id * 31 + d * 17) % 7 - 3) * 0.006)").as("embedding"))
      .localCheckpoint(true)

    (1 to maxSets).foreach { s =>
      val table = s"srp_corpus_s$s"
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
      val t0 = System.nanoTime()
      val files = StreamingSemanticGate.stageCorpusVectors(
        spark, emb, table, planeSets = s)
      val stageSec = (System.nanoTime() - t0) / 1e9
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .where(col("col_name") === "Location").select("data_type")
        .collect()(0).getString(0).stripPrefix("file:")
      def bytesOf(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).map(bytesOf).sum
        else f.length()
      val bytes = bytesOf(new java.io.File(loc))

      val walls = (1 to reps).map { _ =>
        val s0 = System.nanoTime()
        StreamingSemanticGate.semanticMatches(
          twins, spark, table, minCos = minCos, planeSets = s).count(): Unit
        val w = (System.nanoTime() - s0) / 1e9
        spark.catalog.clearCache()
        w
      }.sorted
      val recovered = StreamingSemanticGate.semanticMatches(
          twins, spark, table, minCos = minCos, planeSets = s)
        .where(col("new_id") === col("corpus_id") + lit(1000000000L))
        .count()
      println(f"[srp] planeSets=$s recall=${recovered.toDouble / nVec}%.4f " +
        f"($recovered/$nVec) probe_p50=${walls(walls.size / 2)}%.3f s " +
        f"(reps ${walls.map(w => f"$w%.3f").mkString("/")}) " +
        f"staged=${bytes / 1e6}%.1f MB/$files files stage=$stageSec%.1f s")
      spark.sql(s"DROP TABLE IF EXISTS $table"): Unit
    }
    spark.stop()
  }
}

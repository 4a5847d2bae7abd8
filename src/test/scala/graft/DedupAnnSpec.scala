package graft

import java.nio.file.{Files, Paths}

import graft.operators.{DedupOps, EmbeddingOps, MinHashParams}

/** Round-2 production shaping of the dedup/ANN stack: parameterized
  * minhash, staged signature tables, k-means IVF with zero-shuffle
  * assignment, nprobe. */
class DedupAnnSpec extends SparkSpec {

  test("MinHashParams validates band divisibility") {
    intercept[IllegalArgumentException] { MinHashParams(8, 3) }
    assert(MinHashParams(128, 16).rowsPerBand == 8)
  }

  test("hash coefficients are distinct out to 128 hashes and keep the oracle prefix") {
    val as = (0 until 128).map(DedupOps.coeffA)
    val bs = (0 until 128).map(DedupOps.coeffB)
    assert(as.distinct.size == 128 && bs.distinct.size == 128)
    assert(as.take(8) == DedupOps.A && bs.take(8) == DedupOps.B)
  }

  test("parameterized minhash widens the signature and still bounds est_jaccard") {
    val p = MinHashParams(16, 8)
    val sig = DedupOps.minhashSignatures(spark, sf, p)
    assert((0 until 16).forall(i => sig.columns.contains(s"mh$i")))
    val cands = DedupOps.lshCandidates(spark, sf, p).collect()
    assert(cands.nonEmpty)
    assert(cands.forall { r =>
      val e = r.getAs[Double]("est_jaccard"); e >= 0.5 && e <= 1.0
    })
  }

  test("staging materializes shared dedup tables once and reuses them") {
    val dirs = DedupOps.stageSignatures(spark, sf)
    assert(dirs.size == 3, "staging should be on by default in tests")
    dirs.foreach(d => assert(Files.exists(Paths.get(d, "_SUCCESS")), s"missing $d"))
    val before = dirs.map(d => Files.getLastModifiedTime(Paths.get(d, "_SUCCESS")))
    // a query routed through staging must not rewrite the tables
    DedupOps.jaccardVerify(spark, sf).collect()
    val after = dirs.map(d => Files.getLastModifiedTime(Paths.get(d, "_SUCCESS")))
    assert(before == after, "staged tables were rewritten")
  }

  test("staged and unstaged paths produce identical candidates") {
    val stagedRows = DedupOps.lshCandidates(spark, sf).collect().toSeq
    val prev = sys.props.get("graft.stage.dir")
    sys.props("graft.stage.dir") = "off"
    try {
      val unstaged = DedupOps.lshCandidates(spark, sf).collect().toSeq
      assert(stagedRows == unstaged)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.stage.dir") = v
        case None => sys.props.remove("graft.stage.dir")
      }
      spark.catalog.clearCache() // drop the unstaged persist()
    }
  }

  test("k-means centroids: sampled seeds converge to <=k finite centroids") {
    val cents = EmbeddingOps.kmeansCentroids(spark, sf)
    assert(cents.nonEmpty && cents.size <= EmbeddingOps.numCentroids)
    assert(cents.forall(_._2.length == EmbeddingOps.dim))
    assert(cents.forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
    // means, not copies of input rows: at least one centroid moved off its seed
    val vs = Tables.embeddings(spark, sf).count()
    assert(vs > cents.size)
  }

  test("IVF assignment is a pure narrow map: no Exchange, no Window in the plan") {
    val cents = EmbeddingOps.kmeansCentroids(spark, sf)
    val plan = EmbeddingOps.ivfAssign(spark, sf, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"assignment uses a window:\n$plan")
  }

  test("raising nprobe never worsens any returned neighbor") {
    def byRank(nprobe: Int) =
      EmbeddingOps.ivfAnn(spark, sf, EmbeddingOps.numCentroids,
          EmbeddingOps.kmeansIters, nprobe)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
          r.getAs[Double]("cos")).toMap
    val one = byRank(1)
    val two = byRank(2)
    assert(one.nonEmpty)
    one.foreach { case (k, cos1) =>
      assert(two.contains(k), s"nprobe=2 lost $k")
      assert(two(k) >= cos1, s"nprobe=2 worsened $k: ${two(k)} < $cos1")
    }
  }

  test("lshBuckets planes parameter bounds the bucket space") {
    val b10 = EmbeddingOps.lshBuckets(spark, sf, planes = 10).collect()
    assert(b10.forall { r =>
      val b = r.getAs[Int]("bucket"); b >= 0 && b < 1024
    })
    intercept[IllegalArgumentException] { EmbeddingOps.lshBuckets(spark, sf, 31) }
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, DedupOps, EmbeddingOps}

/** Round-7 curation operators (q55–q59) and the staged verified-pair
  * table. Exact-value correctness is the DuckDB oracle's job
  * (tools/check.py); these specs pin the structural invariants that
  * hold at ANY corpus size plus the staging semantics.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------- q55 boilerplate chunks

  test("q55: chunk counts tile the token stream; per-mille is bounded") {
    val got = CorpusOps.boilerplateChunks(spark, sf)
      .select("doc_id", "n_chunks", "n_boiler", "boiler_pm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // independent chunk count: ceil(n_tokens / 5) straight off the table
    val expected = Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "cast(ceil(size(split(text, ' ')) / 5.0) as bigint) AS n")
      .as[(Long, Long)].collect().toMap
    got.foreach { case (d, nc, nb, pm) =>
      assert(nc == expected(d), s"doc $d chunk count")
      assert(nb >= 0 && nb <= nc, s"doc $d boiler count out of range")
      assert(pm >= 0 && pm <= 1000, s"doc $d per-mille out of range")
      assert(pm == nb * 1000 / nc, s"doc $d per-mille arithmetic")
    }
  }

  test("q55: identical texts are fully boilerplate against each other") {
    // every chunk of a doc whose full text occurs in >= 2 docs is by
    // construction shared, so those docs must score boiler_pm == 1000
    val dupDocs = Tables.documents(spark, sf)
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .where(col("cnt") >= 2).select("doc_id").as[Long].collect().toSet
    if (dupDocs.nonEmpty) {
      val pmByDoc = CorpusOps.boilerplateChunks(spark, sf)
        .select("doc_id", "boiler_pm").as[(Long, Long)].collect().toMap
      dupDocs.foreach(d => assert(pmByDoc(d) == 1000L,
        s"exact-dup doc $d must be 100% boilerplate"))
    }
  }

  // ------------------------------------------------- q56 TF-IDF keywords

  test("q56: per-doc top-k is contiguous, ordered, and arithmetically exact") {
    val rows = CorpusOps.tfidfKeywords(spark, sf)
      .select("doc_id", "term", "tf", "df", "score_ppm", "rank")
      .as[(Long, String, Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach { case (_, _, tf, df, ppm, _) =>
      assert(df >= 1 && df <= nDocs)
      assert(tf >= 1)
      assert(ppm == tf * 1000000L / df, "integer score arithmetic")
    }
    rows.groupBy(_._1).foreach { case (d, rs) =>
      val ranks = rs.map(_._6).sorted.toSeq
      assert(ranks == (1 to rs.length), s"doc $d ranks not contiguous")
      assert(rs.length <= 3, s"doc $d emitted more than k rows")
      // scores non-increasing in rank order; ties broken by term asc
      val inOrder = rs.sortBy(_._6)
      inOrder.sliding(2).foreach {
        case Array((_, t1, _, _, s1, _), (_, t2, _, _, s2, _)) =>
          assert(s1 > s2 || (s1 == s2 && t1 < t2), s"doc $d rank order broken")
        case _ => ()
      }
    }
  }

  // -------------------------------------------- q57 trigram typicality

  test("q57: occurrence counts reconcile globally and per document") {
    val got = CorpusOps.trigramTypicality(spark, sf)
      .select("doc_id", "n_tris", "freq_mass", "rarest_cnt", "typ_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .selectExpr("doc_id", "cast(length(text) as bigint) AS l")
      .as[(Long, Long)].collect().toMap
    val total = got.map(_._2).sum // corpus trigram occurrences
    got.foreach { case (d, n, mass, rare, ppm) =>
      assert(n == lens(d) - 2, s"doc $d trigram count")
      assert(rare >= 1, "every occurring trigram occurs at least once")
      assert(mass >= n, "frequency mass is at least one per occurrence")
      assert(mass <= n * total, "mass cannot exceed all-occurrences bound")
      assert(ppm >= 1 && ppm <= 1000000L, s"doc $d ppm out of range: $ppm")
      assert(ppm == mass * 1000000L / (n * total), s"doc $d ppm arithmetic")
    }
  }

  // ----------------------------------------------- q58 epoch shuffle

  test("q58: deterministic, complete, per-shard-contiguous, epoch-decorrelated") {
    val a = CorpusOps.epochShuffle(spark, sf)
      .select("epoch", "doc_id", "shard", "pos")
      .as[(Int, Long, Long, Int)].collect()
    val b = CorpusOps.epochShuffle(spark, sf)
      .select("epoch", "doc_id", "shard", "pos")
      .as[(Int, Long, Long, Int)].collect()
    assert(a.sortBy(r => (r._1, r._2)).toSeq == b.sortBy(r => (r._1, r._2)).toSeq,
      "re-run must reproduce the identical order")
    val nDocs = Tables.documents(spark, sf).count()
    assert(a.length == 2 * nDocs, "every doc appears once per epoch")
    a.groupBy(r => (r._1, r._3)).foreach { case ((e, s), rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length),
        s"epoch $e shard $s positions not contiguous from 1")
    }
    assert(a.forall(r => r._3 >= 0 && r._3 < 16), "shard out of range")
    // epochs must not share an order: the shard+pos assignment of at
    // least one document differs between epoch 0 and epoch 1
    val e0 = a.filter(_._1 == 0).map(r => r._2 -> (r._3, r._4)).toMap
    val e1 = a.filter(_._1 == 1).map(r => r._2 -> (r._3, r._4)).toMap
    assert(e0.exists { case (d, sp) => e1(d) != sp },
      "epoch 1 reproduced epoch 0's order — hash not re-keyed")
  }

  // -------------------------------------------- q59 embedding health

  test("q59: clean corpus reports full dims, finite values, positive norms") {
    val got = EmbeddingOps.embeddingHealth(spark, sf)
      .select("vec_id", "dims", "n_zero", "n_nonfinite", "norm", "degenerate")
      .as[(Long, Int, Int, Int, Double, Int)].collect()
    assert(got.length == Tables.embeddings(spark, sf).count())
    got.foreach { case (id, dims, nz, nf, norm, deg) =>
      assert(dims == EmbeddingOps.dim, s"vec $id dims")
      assert(nz >= 0 && nz <= dims)
      assert(nf == 0, s"vec $id claims non-finite components")
      assert(norm > 0.0, s"vec $id norm must be positive")
      assert(deg == 0, s"vec $id flagged degenerate on a clean corpus")
    }
  }

  test("q59: health census plan is a narrow map — no Exchange") {
    val plan = EmbeddingOps.embeddingHealth(spark, sf)
      .queryExecution.executedPlan.toString
    // the single Exchange allowed is the presentation ORDER BY's range
    // partitioning; nothing else may shuffle
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"health census shuffles more than the sort:\n$plan")
    assert(!plan.contains("Join"), "health census must not join")
  }

  // ------------------------------------- staged verified near-dup pairs

  test("verified pair table stages once; staged == unstaged bit-for-bit") {
    val root = Files.createTempDirectory("graft_verified_stage").toString
    val staged = DedupOps.withStagingRoot(Some(root)) {
      DedupOps.jaccardVerify(spark, sf).collect().toSeq
    }
    val dir = DedupOps.withStagingRoot(Some(root)) {
      graft.operators.Staging.tableDir(root, sf, "verified_h8_b4")
    }
    assert(Files.exists(Paths.get(dir, "_SUCCESS")),
      s"verified pairs were not materialized under $dir")
    val before = Files.getLastModifiedTime(Paths.get(dir, "_SUCCESS"))
    val again = DedupOps.withStagingRoot(Some(root)) {
      DedupOps.jaccardVerify(spark, sf).collect().toSeq
    }
    assert(Files.getLastModifiedTime(Paths.get(dir, "_SUCCESS")) == before,
      "second read rebuilt the staged verified table")
    val unstaged = DedupOps.withStagingRoot(None) {
      DedupOps.jaccardVerify(spark, sf).collect().toSeq
    }
    spark.catalog.clearCache() // drop the unstaged persist()
    assert(staged == again && staged == unstaged)
  }

  test("staged verified read plan is a pure scan — no join, no shingle recompute") {
    val root = Files.createTempDirectory("graft_verified_plan").toString
    DedupOps.withStagingRoot(Some(root)) {
      DedupOps.jaccardVerify(spark, sf).count() // materialize
      val plan = DedupOps.jaccardVerify(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"staged verified read still joins:\n$plan")
      assert(plan.contains("Scan parquet") || plan.contains("FileScan"),
        "staged verified read must be a parquet scan")
    }
  }
}

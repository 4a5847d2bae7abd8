package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, DedupOps, GraphOps}
import graft.functions.TextOps

/** Connected-component clustering, corpus-curation operators
  * (q47-q52), and the q45/q46 text-filter invariants. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ GraphOps

  test("connectedComponents labels a chain, a triangle, and leaves islands out") {
    // chain 1-2-3-4, triangle 10-11-12 (with redundant edge), pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents fails loudly instead of returning unconverged labels") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(chain, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    // and converges fine with the default bound
    val ok = GraphOps.connectedComponents(chain).as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L))
  }

  test("connectedComponents of an empty edge set is empty") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.connectedComponents(none).count() == 0)
    assert(GraphOps.connectedComponentsStar(none).count() == 0)
  }

  test("both CC variants keep vertices that appear only in self-loops") {
    // 7 appears only as (7,7): a vertex declaration with no
    // connectivity — both variants must label it a singleton
    val edges = Seq((1L, 2L), (7L, 7L), (2L, 2L)).toDF("src", "dst")
    val prop = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val star = GraphOps.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 7L -> 7L)
    assert(prop == want, s"min-label: $prop")
    assert(star == want, s"star-contraction: $star")
  }

  test("star-contraction CC matches min-label on mixed shapes") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)).toDF("src", "dst")
    val star = GraphOps.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    val prop = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("star-contraction CC converges on a path far longer than the round bound") {
    // a 200-edge path needs ~200 min-label rounds (> maxIter=50) but
    // O(log n) star rounds — this is exactly the adversarial shape the
    // alternation exists for (gradual-drift duplicate chains)
    val path = (1L to 200L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("src", "dst")
    intercept[IllegalStateException] {
      GraphOps.connectedComponents(path, maxIter = 40)
    }
    val star = GraphOps.connectedComponentsStar(path, maxIter = 40)
      .as[(Long, Long)].collect()
    assert(star.length == 200 && star.forall(_._2 == 1L),
      "star contraction must collapse the whole path to component 1")
  }

  test("auto CC falls back to star contraction past the propagation bound") {
    val path = (1L to 120L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("src", "dst")
    val auto = GraphOps.connectedComponentsAuto(path, propagationIter = 5)
      .as[(Long, Long)].collect()
    assert(auto.length == 120 && auto.forall(_._2 == 1L))
  }

  test("star-contraction CC equals min-label on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val df = edges.toDF("src", "dst")
      val star = GraphOps.connectedComponentsStar(df).as[(Long, Long)].collect().toMap
      val prop = GraphOps.connectedComponents(df).as[(Long, Long)].collect().toMap
      assert(star == prop, s"trial $trial diverged")
    }
  }

  test("labelVertices keeps singletons as their own cluster") {
    val comps = Seq((2L, 1L), (1L, 1L)).toDF("id", "lbl")
    val verts = Seq(1L, 2L, 7L).toDF("doc_id")
    val got = GraphOps.labelVertices(verts, "doc_id", comps)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  // -------------------------------------------------- q47 dedup clusters

  test("q47: every verified near-dup pair lands in one cluster; reps are minima") {
    val clusters = DedupOps.dedupClusters(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val byDoc = clusters.map(c => c._1 -> c._2).toMap
    // cluster rep is the component minimum: cluster_id <= doc_id always,
    // and the rep's own row carries cluster_id == doc_id
    assert(clusters.forall { case (d, c, _) => c <= d && byDoc(c) == c })
    // transitivity: both endpoints of every verified pair share a cluster
    val pairs = DedupOps.jaccardVerify(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(byDoc(a) == byDoc(b)) }
    // cluster_size is consistent with the labeling
    val sizes = clusters.groupBy(_._2).view.mapValues(_.length).toMap
    assert(clusters.forall { case (_, c, s) => sizes(c) == s })
  }

  // ------------------------------------------------- q48 decontamination

  test("q48: benchmark docs are excluded and the probe join is broadcast") {
    val df = CorpusOps.decontaminate(spark, sf)
    val ids = df.select("doc_id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ % 20 != 0), "benchmark slice must not score itself")
    val flagged = df.where(col("contaminated") === 1).count()
    val frac = df.where(col("overlap_frac") > 1.0).count()
    assert(frac == 0, "overlap fraction is bounded by 1")
    assert(flagged < ids.length.toLong, "decontamination must not drop everything")
    // corpus side must not shuffle into the membership probe
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark n-gram probe should broadcast, got:\n$plan")
  }

  // --------------------------------------- q49/q50 deterministic sampling

  test("q49/q50: sampling is deterministic and domain mixing keeps the smallest stratum whole") {
    val s1 = CorpusOps.stratifiedSample(spark, sf).select("doc_id").as[Long].collect()
    val s2 = CorpusOps.stratifiedSample(spark, sf).select("doc_id").as[Long].collect()
    assert(s1.nonEmpty && s1.sameElements(s2), "hash sampling must be re-run-stable")

    val docs = Tables.documents(spark, sf)
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minLang = perLang.minBy(_._2)
    val kept = CorpusOps.domainMix(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // the smallest language is kept in full (u % mn < mn is a tautology)
    assert(kept(minLang._1) == minLang._2)
    // nothing exceeds its stratum's population
    kept.foreach { case (l, k) => assert(k <= perLang(l)) }
  }

  // ------------------------------------------------- q51 quality filter

  test("q51: reasons compose and agree with the standalone repetition filter") {
    val qf = CorpusOps.qualityFilter(spark, sf)
      .select("doc_id", "n_tokens", "reasons", "pass")
      .as[(Long, Int, String, Int)].collect()
    assert(qf.forall { case (_, _, r, p) => (p == 1) == r.isEmpty })
    qf.filter(_._2 < 20).foreach { case (_, _, r, _) =>
      assert(r.split(",").contains("too_short"))
    }
    assert(qf.exists(_._3.nonEmpty) && qf.exists(_._3.isEmpty),
      "thresholds should split the corpus, not degenerate")
    // repetitive flag must match q45's (docs with bigrams only)
    val rep = TextOps.repetitionStats(spark, sf)
      .select("doc_id", "repetitive").as[(Long, Int)].collect().toMap
    qf.foreach { case (d, _, r, _) =>
      val flagged = r.split(",").contains("repetitive")
      assert(flagged == rep.get(d).contains(1), s"doc $d repetitive mismatch")
    }
  }

  // ------------------------------------------------------ q52 packing

  test("q52: per-shard contiguous packing reproduces a sequential fold") {
    val got = CorpusOps.packBins(spark, sf)
      .select("doc_id", "shard", "n_tokens", "bin")
      .as[(Long, Long, Int, Long)].collect()
    got.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (_, _, n, bin) =>
        assert(bin == cum / 2048, "bin must be the sequence where the doc starts")
        cum += n
      }
    }
    // bins are dense per shard: no gaps in occupied sequence ids
    got.groupBy(_._2).foreach { case (_, docs) =>
      val bins = docs.map(_._4).distinct.sorted
      assert(bins.zip(bins.tail).forall { case (a, b) => b - a == 1 || b == a },
        "occupied bins must be contiguous")
    }
  }

  // --------------------------------------------- q45/q46 invariants

  test("q45: degenerate repetition cases (round-4 follow-up)") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"), // every bigram identical
      (2L, "all these tokens differ completely here"), // all bigrams unique
      (3L, "one")).toDF("doc_id", "text") // no bigrams: must drop out
    docs.createOrReplaceTempView("tmp_rep_docs")
    val df = Tables.documents(spark, sf).sparkSession.emptyDataFrame
    // run the same computation shape as q45 over the handcrafted frame
    val bigrams =
      """transform(sequence(1, size(toks) - 1),
        |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))""".stripMargin
    val stats = docs
      .withColumn("toks", split(col("text"), " "))
      .where(expr("size(toks) >= 2"))
      .selectExpr("doc_id", s"explode($bigrams) AS bg")
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n"),
        max("cnt").as("top"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!stats.contains(3L))
    assert(stats(1L) == ((1L, 4L, 4L, 4L)), "uniform doc: one bigram, all duplicated")
    assert(stats(2L)._3 == 1L && stats(2L)._4 == 0L, "unique bigrams: no duplication")
    assert(df.isEmpty) // silence unused warning path; keeps spark lazy happy
  }

  test("q46: redaction order protects IPs from the phone pattern") {
    val dirty = Seq(
      ("a", "mail bob.smith+x@corp-mail.io now"),
      ("b", "via 192.168.255-1234.7 endpoint"), // phone-like run inside an IP-adjacent blob
      ("c", "call 555-1234 or 555-0000"),
      ("d", "host 10.0.0.1 port 80"),
      ("e", "clean text, nothing to scrub")).toDF("k", "t")
    val out = dirty.select(col("k"), TextOps.redactPii(col("t")).as("r"))
      .as[(String, String)].collect().toMap
    assert(out("a") == "mail <EMAIL> now")
    assert(out("c") == "call <PHONE> or <PHONE>")
    assert(out("d") == "host <IP> port 80")
    assert(out("e") == "clean text, nothing to scrub")
    // IP redaction runs first, so digits inside an address never
    // surface as a fake phone hit
    assert(!out("d").contains("<PHONE>"))
    // idempotence: scrubbing scrubbed text changes nothing
    val twice = dirty.select(col("k"),
      TextOps.redactPii(TextOps.redactPii(col("t"))).as("r"))
      .as[(String, String)].collect().toMap
    assert(twice == out)
  }

  test("q54: rare-token census matches a driver-side brute force") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val all = texts.flatMap { case (_, t) => t.split(" ", -1) }
    val freq = all.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (total, vocab) = (freq.values.sum, freq.size.toLong)
    val expected = texts.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val nRare = toks.count(tk => freq(tk) * vocab * 2 < total).toLong
      id -> (toks.length.toLong, nRare)
    }.toMap
    val got = CorpusOps.rareTokenFilter(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { case org.apache.spark.sql.Row(
        id: Long, n: Long, r: Long, pm: Long, flag: Int) =>
      val (en, er) = expected(id)
      assert((n, r) == (en, er), s"doc $id: ($n,$r) vs ($en,$er)")
      assert(pm == r * 1000 / n)
      assert(flag == (if (r >= 1) 1 else 0))
    }
    // the synthetic corpus has a genuinely rare token: the census must
    // discriminate, not vacuously emit all-zeros
    assert(got.exists(_.getInt(4) == 1) && got.exists(_.getInt(4) == 0))
  }

  test("q80: repeated-span census matches a driver-side brute force") {
    val k = 8
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val occ = scala.collection.mutable.Map.empty[String, List[Long]]
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 to toks.length - k).foreach { i =>
        val span = toks.slice(i, i + k).mkString(" ")
        occ(span) = id :: occ.getOrElse(span, Nil)
      }
    }
    val expected = occ.collect {
      case (span, ids) if ids.distinct.size >= 2 =>
        span -> ((ids.distinct.size.toLong, ids.size.toLong, ids.min))
    }.toMap
    assert(expected.nonEmpty) // the near-dup fixture must share spans
    val df = CorpusOps.repeatedSpans(spark, sf)
    val got = df.collect()
    assert(got.length == expected.size)
    got.foreach { case org.apache.spark.sql.Row(
        span: String, ndocs: Long, o: Long, first: Long) =>
      assert(expected(span) == ((ndocs, o, first)), s"span '$span'")
    }
    // the corpus-wide heavy phase must hash through the native
    // one-pass expression (4.7x over concat_ws assembly at 100x,
    // PERF.md §17) — span STRINGS are only ever assembled for docs
    // that already hold a candidate hash. With staging ON that phase
    // lives inside the staged span_cand/span_docs build, so pin the
    // UNSTAGED shape (the one a non-staging library consumer gets).
    operators.DedupOps.withStagingRoot(None) {
      val plan = CorpusOps.repeatedSpans(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("span_hashes"),
        s"phase 1 must use the native window-hash expression:\n$plan")
    }
  }

  test("q81: dedup span ranges match a driver-side brute force") {
    val k = 8
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // brute force: windows whose span text appears in >= 2 distinct
    // docs, merged into maximal contiguous 1-based index ranges
    val occ = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 to toks.length - k).foreach { i =>
        val span = toks.slice(i, i + k).mkString(" ")
        occ(span) = occ.getOrElse(span, Set.empty) + id
      }
    }
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val flagged = (0 to toks.length - k).filter { i =>
        occ(toks.slice(i, i + k).mkString(" ")).size >= 2
      }.map(_ + 1L) // 1-based
      // merge indices whose token spans overlap (gap <= k-1, i.e.
      // new start i is within the previous range) into islands
      flagged.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, n) :: rest, i) if i <= e =>
          (s, i + (k - 1), n + 1) :: rest
        case (acc, i) => (i, i + (k - 1), 1L) :: acc
      }.reverse.map { case (s, e, n) => (id, s, e, n) }
    }.sortBy(r => (r._1, r._2))
    assert(expected.nonEmpty) // the near-dup fixture must share spans
    val got = CorpusOps.dedupSpanRanges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // ranges are windows-covered (span >= k), hold no more flagged
    // windows than positions allow, and are pairwise DISJOINT per doc
    got.foreach { case (_, s, e, n) =>
      assert(e - s + 1 >= k && n >= 1 && n <= e - s + 1 - (k - 1))
    }
    got.groupBy(_._1).values.foreach { rs =>
      rs.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("r21: q81 flagged-window frame is persisted once and registry-released") {
    // The r21 optimization: `wins` (affected-doc posexplode + span hash
    // + candidate join) is consumed by both the string-exact re-check
    // and the flagged join-back; it persists behind the bounded LRU.
    // Pin the plan reads the cache and the release hook frees exactly
    // the one frame (the leak bound).
    CorpusOps.releaseSpanWinsCache(spark): Unit // clean slate
    spark.catalog.clearCache()
    val df = CorpusOps.dedupSpanRanges(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"q81 should read the persisted flagged-window frame:\n$plan")
    df.collect()
    assert(CorpusOps.releaseSpanWinsCache(spark) == 1,
      "the q81 wins persist must be registry-released")
    spark.catalog.clearCache()
  }

  test("q17: array_remove stop count is bit-parity with the old filter lambda (r17 sweep)") {
    // the rewrite (PERF §50): size(toks) - size(array_remove(...)) in
    // codegen'd collection expressions replaces the interpreted
    // filter(toks, x -> ...) HOF; same count on the whole corpus plus
    // the separator edge cases ('the'/'a' as empty-token neighbors)
    val corpus = Tables.documents(spark, sf).select("text")
      .unionByName(Seq("the a the", "", " the  a ", "thea a the x")
        .toDF("text"))
    val rows = corpus
      .withColumn("toks", split(col("text"), " "))
      .select(
        expr("size(toks) - size(array_remove(array_remove(toks, 'the'), 'a'))").as("nw"),
        expr("size(filter(toks, x -> x = 'the' OR x = 'a'))").as("old"))
      .collect()
    assert(rows.nonEmpty && rows.exists(_.getInt(1) > 0))
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // and the shipped q17 carries no fallback expression anymore
    val stats = TextOps.textStats(spark, sf)
    stats.count()
    assert(graft.tools.CodegenSweep.fallbackHits(
      stats.queryExecution.executedPlan).isEmpty)
  }
}

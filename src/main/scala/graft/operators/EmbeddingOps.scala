package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DotProduct.dot_product

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths, as a production ANN pipeline needs both:
  *   - brute-force cosine top-k: the exactness baseline. Query set is
  *     broadcast; the corpus streams through one narrow map stage —
  *     linear scale-out, no shuffle of the corpus.
  *   - sign-LSH buckets: random-hyperplane signs compress each vector
  *     to a small bucket id; candidate generation joins only within
  *     buckets (IVF-style), bounding the pair count at scale.
  *
  * Dot products fold sequentially in double precision so independent
  * engines produce bit-identical sums (then rounded to 6 dp for the
  * oracle compare).
  */
object EmbeddingOps {
  val dim = 64
  val numPlanes = 8
  val topK = 5
  val numQueries = 5
  val nearDupCos = 0.4

  /** Sequential-fold dot product — the native codegen expression
    * (graft.functions.DotProduct), bit-identical to the higher-order
    * `aggregate(zip_with(...))` fold it replaced but inside
    * whole-stage codegen instead of CodegenFallback. */
  private def dotC(a: Column, b: Column): Column = dot_product(a, b)

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))

  /** Brute-force cosine top-k for a fixed query set (vec_id < numQueries). */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vs = vectors(spark, sfDir)
    val qs = vs.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val sims = vs.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dotC(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select("query_id", "rank", "vec_id", "cos")
      .orderBy("query_id", "rank")
  }

  private val duckVecCte: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)""".stripMargin

  val cosineTopKSql: String =
    s"""$duckVecCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT q.query_id, n.vec_id,
       |    round(list_dot_product(q.qv, n.v) / (q.qn * n.nrm), 6) AS cos
       |  FROM n CROSS JOIN q WHERE n.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos FROM ranked
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** Deterministic pseudo-random hyperplane sign for (plane p, dim d). */
  private def planeSign(p: Int, d: String): String =
    s"(CASE WHEN (($d * 13 + $p * 7) % 5) < 2 THEN 1.0 ELSE -1.0 END)"

  /** Sign-LSH bucket id per vector: bit p = sign of the projection on
    * pseudo-random plane p. `planes` is the recall/bucket-size knob —
    * 8 (the oracle default) gives 256 buckets; production tuning
    * raises it (or unions several independent plane sets) to keep
    * per-bucket candidate lists small at corpus scale. */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame =
    lshBucketsFrom(vectors(spark, sfDir)).orderBy("vec_id")

  def lshBuckets(spark: SparkSession, sfDir: String, planes: Int): DataFrame =
    lshBucketsFrom(vectors(spark, sfDir), planes).orderBy("vec_id")

  /** Hyperplane p as a literal sign vector — the projection is then a
    * codegen dot product instead of an interpreted 64-step fold.
    * Identical arithmetic: sign_d * v_d summed in index order. */
  private def planeVec(p: Int): Array[Double] =
    Array.tabulate(dim)(d => if ((d * 13 + p * 7) % 5 < 2) 1.0 else -1.0)

  /** Sign-LSH bucket id as a single per-row Column over an
    * array<double> vector — the same planes and arithmetic as
    * [[lshBuckets]] (codegen dot against each literal plane, bit p set
    * when the projection is positive), packaged so stream-side callers
    * ([[graft.streaming.StreamingSemanticGate]]) can bucket a
    * micro-batch with ZERO shuffle and land in the corpus table's
    * bucket space. */
  private[graft] def signBucket(v: Column, planes: Int = numPlanes): Column =
    signBucket(v, planes, 0)

  /** Sign bucket from the `setIdx`-th INDEPENDENT plane set — set s
    * draws its `planes` hyperplanes from the same deterministic family
    * at offsets [s·planes, (s+1)·planes), so set 0 is exactly the
    * q26/q27 bucket space and each further set is an independent
    * partitioning of the sphere. Unioning candidates across sets is
    * the classic LSH recall amplifier (a true neighbor split from its
    * query by ONE near-zero projection in set 0 almost surely shares a
    * bucket in some other set) — the remedy the semantic gate's
    * nprobe=1 contract names; [[graft.streaming.StreamingSemanticGate]]
    * exposes it as `planeSets`. */
  private[graft] def signBucket(v: Column, planes: Int, setIdx: Int): Column = {
    require(planes > 0 && planes < 31, s"planes must be in [1, 30], got $planes")
    require(setIdx >= 0, s"setIdx must be >= 0, got $setIdx")
    (0 until planes)
      .map(p => when(dotC(lit(planeVecSet(setIdx, planes, p)), v) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** Hyperplane p of plane set `setIdx`. Set 0 is the LEGACY q26
    * family (oracle-pinned; every staged planeSets=1 layout and the
    * q26/q27/q28 oracles depend on it bit-for-bit). Sets ≥ 1 draw
    * from a HASHED family instead: the legacy formula's sign depends
    * only on `(d·13 + p·7) mod 5`, i.e. on p mod 5 — the whole family
    * contains just FIVE distinct hyperplanes, so "offset by 8" would
    * hand back the same partition of the sphere and a second set
    * would recover nothing (measured: 0 set-1-only recoveries over
    * 190 perturbed twins). The hashed family mixes (set, plane, dim)
    * through two avalanche rounds, giving each further set
    * independent signs per dimension. */
  private def planeVecSet(setIdx: Int, planes: Int, p: Int): Array[Double] =
    if (setIdx == 0) planeVec(p)
    else {
      val gp = setIdx * planes + p
      Array.tabulate(dim) { d =>
        var h = d * 1103515245 + gp * 747796405 + 0x9e3779b9
        h = (h ^ (h >>> 15)) * 0x85ebca6b
        h = h ^ (h >>> 13)
        if ((h & 1) == 0) 1.0 else -1.0
      }
    }

  private def lshBucketsFrom(vecs: DataFrame, planes: Int = numPlanes): DataFrame = {
    require(planes > 0 && planes < 31, s"planes must be in [1, 30], got $planes")
    val withProj = (0 until planes).foldLeft(vecs) { (df, p) =>
      df.withColumn(s"proj$p", dotC(lit(planeVec(p)), col("v")))
    }
    val bucketExpr = (0 until planes)
      .map(p => s"(case when proj$p > 0 then ${1 << p} else 0 end)")
      .mkString(" + ")
    withProj.withColumn("bucket", expr(bucketExpr))
      .select("vec_id", "bucket")
  }

  private val duckBucketCte: String = {
    val projs = (0 until numPlanes).map { p =>
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(generate_series(0, ${dim - 1}),
         |    d -> ${planeSign(p, "d")} * v[d + 1])), (s, x) -> s + x) AS proj$p"""
        .stripMargin
    }.mkString(",\n  ")
    val bucketExpr = (0 until numPlanes)
      .map(p => s"(CASE WHEN proj$p > 0 THEN ${1 << p} ELSE 0 END)")
      .mkString(" + ")
    s"""projs AS (
       |  SELECT vec_id, v, nrm, $projs FROM n),
       |bk AS (
       |  SELECT vec_id, v, nrm, $bucketExpr AS bucket FROM projs)""".stripMargin
  }

  val lshBucketsSql: String =
    s"""$duckVecCte,
       |$duckBucketCte
       |SELECT vec_id, bucket FROM bk ORDER BY vec_id""".stripMargin

  /** ANN via LSH buckets: top-3 cosine neighbors per query, searching
    * only the query's bucket — the IVF-style scale path. */
  def annBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vs = vectors(spark, sfDir)
    // bucket as an inline per-row column ([[signBucket]] — identical
    // planes/arithmetic to [[lshBucketsFrom]]), NOT a vec_id self-join
    // against lshBucketsFrom(vs): the join form executed the vectors
    // subtree twice and paid a join/exchange purely to re-attach a
    // value derivable per row (r21 plan audit; guide §2.4)
    val vb = vs.withColumn("bucket", signBucket(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qs = vb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val sims = vb.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dotC(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos")
      .orderBy("query_id", "rank")
  }

  val annBucketedSql: String =
    s"""$duckVecCte,
       |$duckBucketCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
       |      FROM bk WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT q.query_id, bk.vec_id,
       |    round(list_dot_product(q.qv, bk.v) / (q.qn * bk.nrm), 6) AS cos
       |  FROM bk JOIN q ON bk.bucket = q.qbucket AND bk.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** IVF ANN: coarse quantization with REAL k-means centroids.
    *
    * Training is the standard distributed k-means loop (the MLlib
    * shape): seeds are a deterministic sample — the k vectors with the
    * smallest `md5(vec_id)`, an order-stable stand-in for a uniform
    * draw — and each iteration (1) assigns every vector to its nearest
    * centroid in one NARROW map over the corpus (the centroids travel
    * to the executors as literals folded into codegen, so there is no
    * join and no shuffle), then (2) recomputes each centroid as the
    * element-wise mean of its members via a tiny two-phase aggregate
    * whose shuffle moves only k×dim rows. Element sums go through
    * exact decimals, so the means are partition-order-invariant and
    * the DuckDB oracle — the same iterations unrolled as CTEs —
    * reproduces every centroid coordinate bit-for-bit.
    *
    * Lookup: a query probes the inverted lists of its `nprobe` nearest
    * centroids (nprobe=1 is the oracle configuration; raising it
    * trades scan fraction for recall, the classic IVF knob).
    */
  val numCentroids = 8
  val kmeansIters = 2

  /** Codegen dot product of a driver-side centroid with the vector
    * column — a pure per-row expression, bit-identical to the
    * oracle's list_dot_product over the same values. */
  private def dotLit(cv: Array[Double], v: Column): Column =
    dotC(lit(cv), v)

  /** (rounded cosine, -cent_id) score structs vs every centroid; the
    * lexicographic max is "highest similarity, ties to lower id". */
  private def centScores(cents: Seq[(Int, Array[Double])]): Seq[Column] =
    cents.map { case (cid, cv) =>
      val cn = math.sqrt(cv.foldLeft(0.0)((s, x) => s + x * x))
      struct(
        round(dotLit(cv, col("v")) / (lit(cn) * col("nrm")), 6).as("s"),
        lit(-cid).as("nc"))
    }

  /** Nearest-centroid id as a zero-shuffle per-row argmax (the round-1
    * row_number()/Window formulation shuffled the corpus on vec_id). */
  private def nearestCentroid(cents: Seq[(Int, Array[Double])]): Column =
    array_max(array(centScores(cents): _*)).getField("nc") * -1

  /** The query-side probe list: ids of the `nprobe` nearest centroids. */
  private def probeCentroids(cents: Seq[(Int, Array[Double])], nprobe: Int): Column =
    transform(
      slice(reverse(array_sort(array(centScores(cents): _*))), 1, nprobe),
      s => s.getField("nc") * -1)

  /** One k-means update: element-wise member means per centroid.
    * Exact decimal sums make the result independent of partitioning;
    * empty clusters drop (both engines drop them identically). */
  private def updateCentroids(assigned: DataFrame): Seq[(Int, Array[Double])] = {
    val rows = assigned
      .select(col("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cent_id", "pos")
      .agg((sum(col("x").cast("decimal(27,12)")).cast("double") / count(lit(1))).as("m"))
      .collect()
    rows.groupBy(_.getAs[Int]("cent_id")).map { case (cid, rs) =>
      val arr = new Array[Double](dim)
      rs.foreach(r => arr(r.getAs[Int]("pos")) = r.getAs[Double]("m"))
      (cid, arr)
    }.toSeq.sortBy(_._1)
  }

  private def seedCentroids(vs: DataFrame, k: Int): Seq[(Int, Array[Double])] =
    vs.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select("v").collect()
      .toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }

  /** Train coarse centroids: deterministic sampled seeds + `iters`
    * Lloyd iterations. Each iteration is one narrow assignment map and
    * one k×dim-row aggregate — the textbook distributed k-means cost. */
  def kmeansCentroids(spark: SparkSession, sfDir: String,
                      k: Int = numCentroids,
                      iters: Int = kmeansIters): Seq[(Int, Array[Double])] = {
    val vs = vectors(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = seedCentroids(vs, k)
    for (_ <- 1 to iters)
      cents = updateCentroids(vs.withColumn("cent_id", nearestCentroid(cents)))
    cents
  }

  // ------------------------------------------------------- IVF model staging

  /** Staged IVF model (the production shape: train ONCE, stage the
    * model, serve many queries): centroids as a k-row parquet table,
    * the inverted-list assignment as a corpus-sized one. Read-through
    * via [[Staging]] — the first query trains and writes, every later
    * query pays only centroid load (k×dim values) + probe. Staging
    * off → the pre-round-3 behavior (train per call). */
  private def stagedCentroids(spark: SparkSession, sfDir: String,
                              k: Int, iters: Int): Seq[(Int, Array[Double])] =
    Staging.root match {
      case None => kmeansCentroids(spark, sfDir, k, iters)
      case _ =>
        import spark.implicits._
        val df = Staging.readThrough(spark, sfDir, s"ivf_cent_k${k}_i$iters") {
          kmeansCentroids(spark, sfDir, k, iters)
            .map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cent_id", "cv")
        }
        df.collect()
          .map(r => (r.getAs[Int]("cent_id"), r.getAs[Seq[Double]]("cv").toArray))
          .toSeq.sortBy(_._1)
    }

  private def stagedAssignment(spark: SparkSession, sfDir: String,
                               cents: Seq[(Int, Array[Double])],
                               k: Int, iters: Int): DataFrame =
    Staging.root match {
      case None => ivfAssign(spark, sfDir, cents)
      case _ => Staging.readThrough(spark, sfDir, s"ivf_assign_k${k}_i$iters")(
        ivfAssign(spark, sfDir, cents))
    }

  /** Force-materialize the IVF model tables AND the quantized corpus
    * for `sfDir`; returns the staged paths (Nil when staging is off).
    * Bench calls this up front so one-time training cost is
    * attributed separately from query cost, mirroring
    * DedupOps.stageSignatures. */
  def stageIvf(spark: SparkSession, sfDir: String,
               k: Int = numCentroids, iters: Int = kmeansIters): Seq[String] =
    Staging.root match {
      case None => Nil
      case Some(root) =>
        val cents = stagedCentroids(spark, sfDir, k, iters)
        stagedAssignment(spark, sfDir, cents, k, iters)
        quantizedVectors(spark, sfDir)
        Seq(s"ivf_cent_k${k}_i$iters", s"ivf_assign_k${k}_i$iters", "emb_q8")
          .map(Staging.tableDir(root, sfDir, _))
    }

  // --------------------------------------- quantized corpus (batch ANN)

  /** The int8 corpus at rest for BATCH ANN (VERDICT r19 #5): q82
    * proved the quantized arithmetic; this is the staged table that
    * lets the bucketed/IVF probes (q83/q84) read the ~4× narrower
    * codes instead of the float vectors. One NARROW pass over the
    * corpus computes everything a probe needs — int8 codes
    * (graft.functions.VecQ8), quantized norm, the legacy sign-LSH
    * bucket (same planes/arithmetic as q26, as a per-row expression —
    * no join, no shuffle), and the IVF nearest-centroid id (the
    * trained float model folded in as codegen literals) — so the
    * float vector column is dropped at the door and never travels
    * again. Zero-norm vectors are excluded at stage time (no
    * direction ⇒ NaN cosine; same guard as q82/the streaming gate).
    * Read-through via [[Staging]]; staging off → recomputed per call
    * (the oracle path). */
  private def quantizedVectorsFresh(spark: SparkSession, sfDir: String,
                                    cents: Seq[(Int, Array[Double])]): DataFrame =
    vectors(spark, sfDir)
      .withColumn("cent_id", nearestCentroid(cents))
      .withColumn("q", graft.functions.VecQuant.vec_q8(col("v")))
      .withColumn("qd0", col("q").cast("array<double>"))
      .withColumn("qn", sqrt(dotC(col("qd0"), col("qd0"))))
      .withColumn("bucket", signBucket(col("v")))
      .where(col("qn") > 0)
      .select("vec_id", "q", "qn", "bucket", "cent_id")

  private[graft] def quantizedVectors(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = stagedCentroids(spark, sfDir, numCentroids, kmeansIters)
    Staging.root match {
      case None => quantizedVectorsFresh(spark, sfDir, cents)
      case _ => Staging.readThrough(spark, sfDir, "emb_q8")(
        quantizedVectorsFresh(spark, sfDir, cents))
    }
  }

  /** q83: bucketed ANN over the QUANTIZED corpus — q27's plan shape
    * (probe only the query's sign-LSH bucket, broadcast the k-row
    * query side, window top-3 over the bounded candidate set) with
    * the q82 arithmetic (integer dots exact in double, scale factors
    * cancelled out of the cosine). The corpus side reads
    * [[quantizedVectors]]: at 100 TB that is the staged int8 table —
    * the scan, the (nonexistent) corpus shuffle, and the cache all
    * shrink ~4× vs q27's float path while bucket membership is
    * IDENTICAL (buckets come from the float vector at stage time). */
  def quantizedAnnBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vb = quantizedVectors(spark, sfDir)
      .withColumn("qd", col("q").cast("array<double>"))
    val qs = vb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"),
        col("qn").as("qqn"), col("bucket").as("qbucket"))
    val sims = vb.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos_q8", round(dotC(col("qqd"), col("qd")) / (col("qqn") * col("qn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos_q8").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos_q8")
      .orderBy("query_id", "rank")
  }

  /** DuckDB CTEs defining `qq(vec_id, qd, qn)`: the quantized corpus
    * with zero-norm vectors excluded — the oracle twin of
    * [[quantizedVectorsFresh]]'s code/norm columns (same VecQ8
    * half-up arithmetic as the q82 oracle). Expects `e(vec_id, v)`. */
  private val duckQuantCte: String =
    s"""qm AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
       |qz AS (SELECT vec_id,
       |  CASE WHEN mx = 0 THEN list_transform(v, x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END)
       |       ELSE list_transform(v, x -> CAST(floor(x / mx * 127.0 + 0.5) AS INT)) END AS q
       |  FROM qm),
       |qn0 AS (SELECT vec_id, CAST(q AS DOUBLE[]) AS qd,
       |  sqrt(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))) AS qn FROM qz),
       |qq AS (SELECT vec_id, qd, qn FROM qn0 WHERE qn > 0)""".stripMargin

  val quantizedAnnBucketedSql: String =
    s"""$duckVecCte,
       |$duckBucketCte,
       |$duckQuantCte,
       |vbk AS (SELECT bk.vec_id, bk.bucket, qq.qd, qq.qn
       |        FROM bk JOIN qq ON bk.vec_id = qq.vec_id),
       |q AS (SELECT vec_id AS query_id, qd AS qqd, qn AS qqn, bucket AS qbucket
       |      FROM vbk WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT q.query_id, v.vec_id,
       |    round(list_dot_product(q.qqd, v.qd) / (q.qqn * v.qn), 6) AS cos_q8
       |  FROM vbk v JOIN q ON v.bucket = q.qbucket AND v.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_q8,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_q8 DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos_q8 FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** q84: IVF ANN over the QUANTIZED corpus — q33's inverted-list
    * probe (train-once float k-means model; nprobe=1) with the
    * scan/dot side reading [[quantizedVectors]]' staged int8 codes.
    * Assignment comes from the staged table (computed against the
    * float vectors at stage time, so the inverted lists are IDENTICAL
    * to q33's); only the distance arithmetic is quantized. The
    * query side is k rows and broadcasts. */
  def quantizedIvfAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vb = quantizedVectors(spark, sfDir)
      .withColumn("qd", col("q").cast("array<double>"))
    // nprobe=1: the query's probe list is exactly its own nearest
    // centroid — already staged as its cent_id
    val qs = vb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"),
        col("qn").as("qqn"), col("cent_id").as("qcent"))
    val sims = vb.join(broadcast(qs),
        col("cent_id") === col("qcent") && col("vec_id") =!= col("query_id"))
      .withColumn("cos_q8", round(dotC(col("qqd"), col("qd")) / (col("qqn") * col("qn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos_q8").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos_q8")
      .orderBy("query_id", "rank")
  }

  /** q84 with the classic IVF recall knob: probe the query's `nprobe`
    * nearest inverted lists (centroid scoring on the FLOAT query
    * vector from the staged assignment — the model stays float, only
    * the corpus-side distances are quantized). nprobe=1 reproduces
    * [[quantizedIvfAnn]] exactly (the top-1 probe IS the staged
    * cent_id); per-rank cosine is non-decreasing in nprobe
    * (superset of candidates), spec-pinned like the float path's. */
  def quantizedIvfAnn(spark: SparkSession, sfDir: String, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = stagedCentroids(spark, sfDir, numCentroids, kmeansIters)
    val vb = quantizedVectors(spark, sfDir)
      .withColumn("qd", col("q").cast("array<double>"))
    val probes = stagedAssignment(spark, sfDir, cents, numCentroids, kmeansIters)
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        explode(probeCentroids(cents, nprobe)).as("qcent"))
    val qs = probes.join(
      vb.select(col("vec_id").as("query_id"), col("qd").as("qqd"),
        col("qn").as("qqn")),
      "query_id")
    val sims = vb.join(broadcast(qs),
        col("cent_id") === col("qcent") && col("vec_id") =!= col("query_id"))
      .withColumn("cos_q8", round(dotC(col("qqd"), col("qd")) / (col("qqn") * col("qn")), 6))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos_q8").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos_q8")
      .orderBy("query_id", "rank")
  }

  /** q85: MULTI-PLANE-SET bucketed ANN over quantized vectors — the
    * recall amplifier the streaming gate's `planeSets` dial wires
    * (PERF §61: miss rate falls ~4× per added set), expressed as a
    * batch query: every vector carries `sets` composite bucket keys
    * (set 0 = the oracle-pinned q26 planes; sets ≥ 1 from the hashed
    * family — the legacy formula holds only five distinct
    * hyperplanes, see signBucket), candidates are the UNION of
    * same-bucket pairs across sets (pair-deduped before ranking so a
    * pair found in two sets scores once), top-3 by quantized cosine.
    *
    * Scale shape: the corpus explodes ×sets in a narrow map (no
    * shuffle — the candidate join broadcasts the k×sets query rows),
    * the window ranks only the bounded union candidate set. Top-k
    * quality dominates q83's single-set answer BY CONSTRUCTION
    * (superset of candidates ⇒ per-rank cosine non-decreasing) —
    * spec-pinned in DedupAnnSpec. */
  val multiSetPlaneSets = 2

  def multiSetAnnBucketed(spark: SparkSession, sfDir: String): DataFrame =
    multiSetAnnBucketed(spark, sfDir, multiSetPlaneSets)

  def multiSetAnnBucketed(spark: SparkSession, sfDir: String, sets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vs = vectors(spark, sfDir)
      // zero-norm guard on the CHEAP float dot, placed BEFORE the
      // quantize/plane projections: filtering on the quantized norm
      // after them lets predicate pushdown substitute the whole
      // quantize expression tree into the scan filter, and explode's
      // inferred size()>0 predicate drags the 16 plane dots in too —
      // the first cut of this query paid the per-row arithmetic ~3×
      // (1.37 s vs 0.24 for q83 at sf0.1, plan-verified). dot(v,v)>0
      // ⟺ quantized qn>0: any nonzero element makes mx>0 and the
      // max-abs element quantizes to ±127; NaN poisons both sides'
      // predicates to false identically.
      .where(dotC(col("v"), col("v")) > 0)
      .withColumn("qd",
        graft.functions.VecQuant.vec_q8(col("v")).cast("array<double>"))
      .withColumn("qn", sqrt(dotC(col("qd"), col("qd"))))
      .withColumn("bkts", array((0 until sets).map(s =>
        lit(s * (1 << numPlanes)) + signBucket(col("v"), numPlanes, s)): _*))
      .select("vec_id", "qd", "qn", "bkts")
    // explode_outer: plain explode infers a size(bkts) > 0 filter
    // that pushes the plane-dot array into the scan (see above); the
    // array is never empty (sets >= 1 literal entries), so _outer is
    // semantically identical and plans clean
    val corpus = vs.select(col("vec_id"), col("qd"), col("qn"),
      explode_outer(col("bkts")).as("bkt"))
    val qs = vs.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"),
        col("qn").as("qqn"), explode_outer(col("bkts")).as("qbkt"))
    val sims = corpus.join(broadcast(qs),
        col("bkt") === col("qbkt") && col("vec_id") =!= col("query_id"))
      .withColumn("cos_q8",
        round(dotC(col("qqd"), col("qd")) / (col("qqn") * col("qn")), 6))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos_q8").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos_q8")
      .orderBy("query_id", "rank")
  }

  /** Oracle: set 0 through the legacy formula CTEs, set 1's eight
    * hashed-family hyperplanes baked in as LITERAL sign vectors (the
    * same constants Spark folds into codegen — the oracle then tests
    * the union/dedup/ranking logic against shared plane constants,
    * exactly as the q26 oracle shares the legacy formula). */
  val multiSetAnnBucketedSql: String = {
    def planeLit(setIdx: Int, p: Int): String =
      planeVecSet(setIdx, numPlanes, p)
        .map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val b1Expr = (0 until numPlanes)
      .map(p => s"(CASE WHEN list_dot_product(CAST(${planeLit(1, p)} AS DOUBLE[]), v) > 0 THEN ${1 << p} ELSE 0 END)")
      .mkString(" + ")
    s"""$duckVecCte,
       |$duckBucketCte,
       |s1 AS (SELECT vec_id, $b1Expr AS b1 FROM n),
       |$duckQuantCte,
       |vb AS (SELECT bk.vec_id, bk.bucket AS b0, s1.b1, qq.qd, qq.qn
       |       FROM bk JOIN s1 ON bk.vec_id = s1.vec_id
       |               JOIN qq ON bk.vec_id = qq.vec_id),
       |q AS (SELECT vec_id AS query_id, qd AS qqd, qn AS qqn, b0 AS qb0, b1 AS qb1
       |      FROM vb WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT DISTINCT q.query_id, v.vec_id,
       |    round(list_dot_product(q.qqd, v.qd) / (q.qqn * v.qn), 6) AS cos_q8
       |  FROM vb v JOIN q ON (v.b0 = q.qb0 OR v.b1 = q.qb1) AND v.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_q8,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_q8 DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos_q8 FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle: q33's unrolled k-means chain for the ASSIGNMENT, the
    * q82 quantization for the DISTANCES. */
  val quantizedIvfAnnSql: String =
    s"""$ivfChainCtes,
       |$duckQuantCte,
       |afq AS (SELECT af.vec_id, af.cent_id, qq.qd, qq.qn
       |        FROM af JOIN qq ON af.vec_id = qq.vec_id),
       |q AS (SELECT vec_id AS query_id, qd AS qqd, qn AS qqn, cent_id AS qcent
       |      FROM afq WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT q.query_id, a.vec_id,
       |    round(list_dot_product(q.qqd, a.qd) / (q.qqn * a.qn), 6) AS cos_q8
       |  FROM afq a JOIN q ON a.cent_id = q.qcent AND a.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_q8,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_q8 DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos_q8 FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Corpus → (vec_id, v, nrm, cent_id) with the trained centroids;
    * pure narrow map, no Exchange anywhere in the plan. */
  def ivfAssign(spark: SparkSession, sfDir: String,
                cents: Seq[(Int, Array[Double])]): DataFrame =
    vectors(spark, sfDir).withColumn("cent_id", nearestCentroid(cents))

  /** IVF ANN: top-3 neighbors per query among vectors in the query's
    * `nprobe` nearest inverted lists. */
  def ivfAnn(spark: SparkSession, sfDir: String): DataFrame =
    ivfAnn(spark, sfDir, numCentroids, kmeansIters, nprobe = 1)

  def ivfAnn(spark: SparkSession, sfDir: String,
             k: Int, iters: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = stagedCentroids(spark, sfDir, k, iters)
    val assigned = stagedAssignment(spark, sfDir, cents, k, iters)
    val qs = assigned.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probeCentroids(cents, nprobe)).as("qcent"))
    val sims = assigned.join(broadcast(qs),
        col("cent_id") === col("qcent") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dotC(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** The seeds + Lloyd iterations unrolled as CTEs, through the final
    * assignment `af(vec_id, v, nrm, cent_id)` — shared by the float
    * (q33) and quantized (q84) IVF oracles. */
  private def ivfChainCtes: String = {
    def assignCte(name: String, centsCte: String): String =
      s"""$name AS (
         |  SELECT vec_id, v, nrm, cent_id FROM (
         |    SELECT n.vec_id, n.v, n.nrm, c.cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(c.cv, n.v) / (c.cn * n.nrm), 6) DESC,
         |                 c.cent_id) AS rn
         |    FROM n CROSS JOIN $centsCte c) t WHERE rn = 1)""".stripMargin
    def updateCte(mName: String, cName: String, aName: String): String =
      s"""$mName AS (
         |  SELECT cent_id, p.pos,
         |    CAST(sum(CAST(v[p.pos] AS DECIMAL(27,12))) AS DOUBLE) / count(*) AS m
         |  FROM $aName, (SELECT unnest(generate_series(1, $dim)) AS pos) p
         |  GROUP BY cent_id, p.pos),
         |$cName AS (
         |  SELECT cent_id, list(m ORDER BY pos) AS cv,
         |    sqrt(list_dot_product(list(m ORDER BY pos), list(m ORDER BY pos))) AS cn
         |  FROM $mName GROUP BY cent_id)""".stripMargin
    val iterCtes = (0 until kmeansIters).map { i =>
      assignCte(s"a$i", s"c$i") + ",\n" + updateCte(s"m$i", s"c${i + 1}", s"a$i")
    }.mkString(",\n")
    s"""$duckVecCte,
       |seed AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cent_id, v
       |  FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $numCentroids),
       |c0 AS (SELECT cent_id, v AS cv, sqrt(list_dot_product(v, v)) AS cn FROM seed),
       |$iterCtes,
       |${assignCte("af", s"c$kmeansIters")}""".stripMargin
  }

  /** Oracle: the same seeds + Lloyd iterations unrolled as CTEs. */
  val ivfAnnSql: String =
    s"""$ivfChainCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id AS qcent
       |      FROM af WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT q.query_id, a.vec_id,
       |    round(list_dot_product(q.qv, a.v) / (q.qn * a.nrm), 6) AS cos
       |  FROM af a JOIN q ON a.cent_id = q.qcent AND a.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Embedding near-duplicate pairs: cosine above threshold, searched
    * within LSH buckets only (bounded candidate set at scale). Guarded
    * against degenerate buckets — see [[BandGuard]]: identical vectors
    * above the group threshold collapse to a linear (rep, member) star
    * (cos exactly 1.0) before bucketing, and each bucket keeps at most
    * `maxBucket` members in the self-join. */
  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame =
    nearDupPairsFrom(vectors(spark, sfDir), BandGuard.default)

  /** Near-dup pairs over an arbitrary `(vec_id, embedding)` frame with
    * an explicit skew guard. */
  def nearDupPairsOf(embeddings: DataFrame, g: BandGuard = BandGuard.default): DataFrame =
    nearDupPairsFrom(
      embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(dot_product(col("v"), col("v")))),
      g)

  private def nearDupPairsFrom(vs: DataFrame, g: BandGuard): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // guard stage 1: identical-vector collapse (cosine 1.0 by definition)
    val (bandVs, starPairs) =
      if (g.maxGroupAllPairs == Int.MaxValue)
        (vs, vs.limit(0).select(
          col("vec_id").as("vec_a"), col("vec_id").as("vec_b"),
          lit(1.0).as("cos")))
      else {
        // The collapse window is keyed by an 8-byte xxhash64 fingerprint
        // of the vector, not the raw array<double>: a 64-dim vector is
        // ~512 bytes of shuffle key per row plus array hashing/compare
        // in the exchange. Exactness survives because each row's vector
        // is compared to its fingerprint group's representative (the
        // min-vec_id row's vector): on a 64-bit collision the foreign
        // rows simply fail that compare, stay un-collapsed, and fall
        // through to the bucket cap (guard stage 2).
        val wfp = Window.partitionBy("__fp")
        val rep = vs
          .withColumn("__fp", xxhash64(col("v")))
          .withColumn("__gmin", min(col("vec_id")).over(wfp))
          .withColumn("__repv", min_by(col("v"), col("vec_id")).over(wfp))
        val tagged = rep
          .withColumn("__gsz",
            sum(when(col("v") === col("__repv"), 1L).otherwise(0L)).over(wfp))
          .withColumn("__dup",
            col("v") === col("__repv") && col("__gsz") > g.maxGroupAllPairs)
        (tagged
           .where(!col("__dup") || col("vec_id") === col("__gmin"))
           .select("vec_id", "v", "nrm"),
         tagged
           .where(col("__dup") && col("vec_id") =!= col("__gmin"))
           .select(col("__gmin").as("vec_a"), col("vec_id").as("vec_b"),
             lit(1.0).as("cos")))
      }
    // inline per-row bucket (same arithmetic as lshBucketsFrom) — the
    // previous vec_id self-join re-executed the whole guard-window
    // subtree a second time just to re-attach the bucket (r21 plan
    // audit: two copies of the __fp collapse windows + a join)
    val vb0 = bandVs.withColumn("bucket", signBucket(col("v")))
    // guard stage 2: per-bucket membership cap
    SkewGuard.maybeLogOverflow(vb0, "bucket", g.maxBucket, g.logOverflow, "nearDupPairs")
    val vb = SkewGuard.capBuckets(vb0, "bucket", "vec_id", g.maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = vb.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket").as("ba"))
    val b = vb.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket").as("bb"))
    a.join(b, col("ba") === col("bb") && col("vec_a") < col("vec_b"))
      .withColumn("cos", round(dotC(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= nearDupCos)
      .select("vec_a", "vec_b", "cos")
      .unionByName(starPairs)
      .orderBy("vec_a", "vec_b")
  }

  val nearDupPairsSql: String =
    s"""$duckVecCte,
       |$duckBucketCte
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
       |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= $nearDupCos
       |ORDER BY vec_a, vec_b""".stripMargin

  // --------------------------------------------- semantic decontamination

  /** Held-out eval slice standing in for the benchmark embedding set
    * (mirrors CorpusOps' n-gram benchPred, keyed on vec_id). */
  private val semBenchPred = "vec_id % 20 = 0"
  /** Max-cosine flag threshold. A real pipeline sets this near 0.95;
    * the synthetic corpus plants no cross-slice twins, so the oracle
    * exercises the flag at a value the data actually straddles. */
  val semThreshold = 0.45

  /** q53: semantic decontamination — the embedding-space counterpart
    * of n-gram benchmark decontamination (q48): a training example
    * whose embedding is too close to ANY benchmark embedding is a
    * paraphrase-level leak that n-gram overlap misses. Emits, per
    * training vector, its max cosine against the benchmark set, how
    * many benchmark vectors sit above the threshold, and the flag.
    *
    * Scale shape: the benchmark set is fixed-size (eval suites don't
    * grow with the corpus), so it broadcasts and the corpus streams
    * through one narrow map + one partial-agg shuffle on vec_id —
    * identical topology to brute-force top-k. For corpora where even
    * one pass is too hot, the IVF/LSH candidate paths above compose
    * the same way (probe only the benchmark's buckets). Cosines are
    * rounded to 6 dp BEFORE the threshold compare on both sides so
    * flag bits can't straddle a 1-ulp engine difference. */
  def semanticDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val vs = vectors(spark, sfDir)
    val bench = vs.where(expr(semBenchPred))
      .select(col("v").as("bv"), col("nrm").as("bn"))
    vs.where(expr(s"NOT ($semBenchPred)"))
      .crossJoin(broadcast(bench))
      .withColumn("cos", round(dotC(col("v"), col("bv")) / (col("nrm") * col("bn")), 6))
      .groupBy("vec_id").agg(
        max("cos").as("max_cos"),
        count(when(col("cos") >= semThreshold, 1)).as("n_close"))
      .withColumn("contaminated", (col("max_cos") >= semThreshold).cast("int"))
      .select("vec_id", "max_cos", "n_close", "contaminated")
      .orderBy("vec_id")
  }

  val semanticDecontaminateSql: String =
    s"""$duckVecCte,
       |bench AS (SELECT v AS bv, nrm AS bn FROM n WHERE $semBenchPred),
       |train AS (SELECT vec_id, v, nrm FROM n WHERE NOT ($semBenchPred)),
       |cs AS (
       |  SELECT t.vec_id,
       |    round(list_dot_product(t.v, b.bv) / (t.nrm * b.bn), 6) AS cos
       |  FROM train t CROSS JOIN bench b)
       |SELECT vec_id, max(cos) AS max_cos,
       |  count(CASE WHEN cos >= $semThreshold THEN 1 END) AS n_close,
       |  CAST(max(cos) >= $semThreshold AS INT) AS contaminated
       |FROM cs GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------- embedding health census

  /** q59: embedding health census — the data-quality gate an embedding
    * column passes before any ANN/dedup stage trusts it: dimension
    * count (schema drift), zero-component count, non-finite count
    * (NaN/Inf poison every distance), L2 norm (un-normalized or
    * collapsed vectors), and a degenerate flag. Broken vectors
    * upstream silently corrupt every cosine downstream, so this runs
    * first and cheap.
    *
    * Scale shape: pure narrow map over the vector column — no shuffle,
    * no join; the norm is the same codegen fold the ANN operators use.
    * The ORDER BY is presentation-only. */
  def embeddingHealth(spark: SparkSession, sfDir: String): DataFrame =
    vectors(spark, sfDir)
      .withColumn("dims", size(col("v")))
      // one-pass native counts (graft.functions.VecHealthCounts): the
      // two filter() lambdas here were the fleet sweep's q59 hit
      // (CodegenFallback on a corpus-wide narrow map, PERF §50);
      // parity with the lambda forms is spec-pinned in VecHealthSpec
      .withColumn("__h", graft.functions.VecHealth.vec_health_counts(col("v")))
      .withColumn("n_zero", col("__h").getField("n_zero"))
      .withColumn("n_nonfinite", col("__h").getField("n_nonfinite"))
      .withColumn("norm", round(col("nrm"), 6))
      .withColumn("degenerate",
        (col("n_nonfinite") > 0 || col("n_zero") === col("dims")).cast("int"))
      .select("vec_id", "dims", "n_zero", "n_nonfinite", "norm", "degenerate")
      .orderBy("vec_id")

  val embeddingHealthSql: String =
    s"""$duckVecCte
       |SELECT vec_id,
       |  len(v) AS dims,
       |  len(list_filter(v, x -> x = 0.0)) AS n_zero,
       |  len(list_filter(v, x -> isnan(x) OR isinf(x))) AS n_nonfinite,
       |  round(nrm, 6) AS norm,
       |  CAST(len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0
       |       OR len(list_filter(v, x -> x = 0.0)) = len(v) AS INT) AS degenerate
       |FROM n ORDER BY vec_id""".stripMargin

  /** q82: brute-force cosine top-k over INT8-QUANTIZED vectors — the
    * compressed-corpus scale path. An embedding corpus at float32×dim
    * is typically the largest byte stream in a training-data pipeline;
    * symmetric int8 quantization (graft.functions.VecQ8, one codegen
    * pass) cuts the scanned/shuffled/cached bytes ~4–8× while cosine
    * ordering survives almost unchanged — and the per-vector scale
    * factors CANCEL out of the cosine entirely, so the search never
    * dequantizes: cos = dot(q_a,q_b) / (‖q_a‖·‖q_b‖) over the int
    * arrays. The integer dots are exact (|q| ≤ 127 ⇒ a 64-dim dot
    * ≤ ~1.03M, exactly representable in double), which makes the
    * score CROSS-ENGINE deterministic before the single final
    * divide+round — a stronger oracle property than the float
    * baseline's sequential-fold agreement (q25).
    *
    * Same plan shape as q25: the k×dim query side broadcasts, the
    * corpus streams through one narrow quantize+dot map (zero corpus
    * shuffle), top-k via a per-query window over the bounded
    * candidate set. At 100 TB the quantized corpus would be STAGED
    * once (like the dedup artifacts) rather than re-quantized per
    * query — the expression is the staging kernel. */
  def quantizedCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vs = vectors(spark, sfDir)
      .withColumn("qd",
        graft.functions.VecQuant.vec_q8(col("v")).cast("array<double>"))
      .withColumn("qn", sqrt(dotC(col("qd"), col("qd"))))
      // a zero-norm (all-zero) vector has no direction: its cosine is
      // 0/0 = NaN, which Spark's DESC sort ranks ABOVE every real
      // score while DuckDB ranks it differently — the same guard the
      // streaming gate applies (StreamingSemanticGate.withQuantized),
      // mirrored in the oracle SQL (ADVICE r19)
      .where(col("qn") > 0)
      .select("vec_id", "qd", "qn")
    val qs = vs.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"), col("qn").as("qqn"))
    val sims = vs.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_q8",
        round(dotC(col("qqd"), col("qd")) / (col("qqn") * col("qn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos_q8").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select("query_id", "rank", "vec_id", "cos_q8")
      .orderBy("query_id", "rank")
  }

  val quantizedCosineTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
       |qz AS (SELECT vec_id,
       |  CASE WHEN mx = 0 THEN list_transform(v, x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END)
       |       ELSE list_transform(v, x -> CAST(floor(x / mx * 127.0 + 0.5) AS INT)) END AS q
       |  FROM m),
       |n0 AS (SELECT vec_id, CAST(q AS DOUBLE[]) AS qd,
       |  sqrt(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))) AS qn FROM qz),
       |n AS (SELECT vec_id, qd, qn FROM n0 WHERE qn > 0),
       |qs AS (SELECT vec_id AS query_id, qd AS qqd, qn AS qqn FROM n WHERE vec_id < $numQueries),
       |sims AS (SELECT qs.query_id, n.vec_id,
       |  round(list_dot_product(qs.qqd, n.qd) / (qs.qqn * n.qn), 6) AS cos_q8
       |  FROM n CROSS JOIN qs WHERE n.vec_id <> qs.query_id),
       |ranked AS (SELECT query_id, vec_id, cos_q8,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_q8 DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos_q8 FROM ranked
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
}

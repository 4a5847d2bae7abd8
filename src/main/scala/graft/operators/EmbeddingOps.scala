package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** Sequential-fold dot product of two array<double> columns. */
  private def dotE(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x)"

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotE("v", "v")})"))

  /** Brute-force cosine top-k for a fixed query set (vec_id < numQueries). */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vs = vectors(spark, sfDir)
    val qs = vs.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val sims = vs.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(expr(dotE("qv", "v")) / (col("qn") * col("nrm")), 6))
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
    * pseudo-random plane p. */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame =
    lshBucketsFrom(vectors(spark, sfDir)).orderBy("vec_id")

  private def lshBucketsFrom(vecs: DataFrame): DataFrame = {
    val withProj = (0 until numPlanes).foldLeft(vecs) { (df, p) =>
      df.withColumn(s"proj$p", expr(
        s"aggregate(sequence(0, ${dim - 1}), cast(0 as double), " +
          s"(s, d) -> s + ${planeSign(p, "d")} * element_at(v, d + 1))"))
    }
    val bucketExpr = (0 until numPlanes)
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
    val bk = lshBucketsFrom(vs)
    val vb = vs.join(bk, "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qs = vb.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val sims = vb.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(expr(dotE("qv", "v")) / (col("qn") * col("nrm")), 6))
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

  /** IVF-style ANN: coarse quantization with deterministic centroids
    * (the first `numCentroids` vectors stand in for k-means output —
    * at production scale you'd train real centroids; the topology is
    * identical). Every vector is assigned to its nearest centroid
    * (one broadcast + narrow map over the corpus); a query searches
    * only its own centroid's inverted list — the classic IVF nprobe=1
    * trade-off of recall for a corpus-fraction scan. */
  val numCentroids = 8

  private def ivfAssignments(vs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = vs.where(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = vs.crossJoin(broadcast(cents))
      .withColumn("csim", round(expr(dotE("cv", "v")) / (col("cn") * col("nrm")), 6))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    scored.withColumn("crank", row_number().over(w))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"))
  }

  /** IVF ANN: top-3 neighbors per query among vectors sharing the
    * query's nearest centroid. */
  def ivfAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = ivfAssignments(vectors(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qs = assigned.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").as("qcent"))
    val sims = assigned.join(broadcast(qs),
        col("cent_id") === col("qcent") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(expr(dotE("qv", "v")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "vec_id", "cos")
      .orderBy("query_id", "rank")
  }

  val ivfAnnSql: String =
    s"""$duckVecCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $numCentroids),
       |scored AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
       |    round(list_dot_product(c.cv, n.v) / (c.cn * n.nrm), 6) AS csim
       |  FROM n CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, v, nrm, cent_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crank
       |    FROM scored) t WHERE crank = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id AS qcent
       |      FROM assigned WHERE vec_id < $numQueries),
       |sims AS (
       |  SELECT q.query_id, a.vec_id,
       |    round(list_dot_product(q.qv, a.v) / (q.qn * a.nrm), 6) AS cos
       |  FROM assigned a JOIN q ON a.cent_id = q.qcent AND a.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, rank, vec_id, cos FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Embedding near-duplicate pairs: cosine above threshold, searched
    * within LSH buckets only (bounded candidate set at scale). */
  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val vs = vectors(spark, sfDir)
    val vb = vs.join(lshBucketsFrom(vs), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = vb.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket").as("ba"))
    val b = vb.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket").as("bb"))
    a.join(b, col("ba") === col("bb") && col("vec_a") < col("vec_b"))
      .withColumn("cos", round(expr(dotE("va", "vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= nearDupCos)
      .select("vec_a", "vec_b", "cos")
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
}

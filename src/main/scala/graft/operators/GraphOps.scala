package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup post-processing.
  *
  * The one that matters for a training-data pipeline is connected
  * components: near-dup PAIRS (MinHash/SimHash/embedding) are not yet
  * dedup GROUPS — `a~b` and `b~c` must collapse `{a,b,c}` into one
  * cluster with one survivor, or the keep-list drops too little.
  *
  * Scale shape: the component computation runs ONLY on the edge-induced
  * subgraph. After LSH + verification the edge set is a tiny fraction
  * of the corpus (duplicates, not documents), so the iterative part
  * touches |edges| rows, never corpus rows; the corpus joins in exactly
  * once at the end to label singletons. Iteration is min-label
  * propagation — per round one shuffle join + one min-aggregate, with
  * `localCheckpoint` truncating the lineage so round N's plan doesn't
  * re-run rounds 1..N-1. Rounds are bounded by the component diameter;
  * dedup clusters are shallow (stars around a few templates), so this
  * converges in a handful of rounds. For adversarially long path
  * graphs, swap the propagation body for the large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce"),
  * which is O(log n) rounds over the same primitives.
  */
object GraphOps {

  /** Label every vertex of the undirected graph `edges` (columns
    * `src`, `dst`; direction ignored) with the minimum vertex id
    * reachable from it. Returns one row per DISTINCT vertex that
    * appears in an edge: `(id, lbl)`. Deterministic: min-labels are
    * independent of partitioning and join order.
    *
    * @param maxIter hard convergence bound; exceeded ⇒ IllegalStateException
    *                (never silently returns half-propagated labels).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    require(edges.columns.contains("src") && edges.columns.contains("dst"),
      s"edges needs src/dst columns, got ${edges.columns.mkString(",")}")
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LAZY checkpoints throughout: the convergence sum is the round's
    // only action, so it materializes the checkpoint in the same Spark
    // job — one pass over the labels per round instead of two (eager
    // checkpoint job + sum job)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(false)
    // Convergence check without a per-round join: min-propagation is
    // monotone (lbl never increases, the vertex set is fixed), so ANY
    // label change strictly decreases sum(lbl) — equal sums ⇔ fixpoint.
    // decimal(38,0) keeps the sum exact for int64 labels at any count.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty edge set
    var prevSum = lblSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = labels.join(und, labels("id") === und("src"))
        .select(und("dst").as("id"), labels("lbl").as("lbl"))
        .unionByName(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(false)
      val nextSum = lblSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    und.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          "(component diameter exceeds the bound; raise maxIter or use " +
          "star-contraction rounds for path-like graphs)")
    labels
  }

  /** Attach component labels to a full vertex set: vertices absent from
    * the edge set keep their own id (singleton clusters). `vertices`
    * must expose `idCol`; output adds `cluster_id`. */
  def labelVertices(vertices: DataFrame, idCol: String,
                    components: DataFrame): DataFrame =
    vertices
      .join(components.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), col(idCol)))
      .drop("lbl")

  /** Convenience predicate: the canonical survivor of each cluster. */
  def isClusterRep(idCol: String): Column = col(idCol) === col("cluster_id")
}

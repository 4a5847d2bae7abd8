package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators (SURVEY.md §2.3, §2.5, §2.6, §2.8).
  *
  * Everything here is declarative DataFrame API so Catalyst handles
  * pushdown, pruning, and join strategy. Aggregates over double
  * columns go through exact DECIMAL arithmetic
  * (see [[decSum]]) so results are bit-identical regardless of
  * partition count / merge order — both a correctness-oracle
  * requirement and the right call at 1000-executor scale where
  * floating-point sums are otherwise nondeterministic run-to-run.
  */
object RelationalOps {

  /** Order-independent exact sum of a 2-decimal double column,
    * returned as double: cast-to-decimal is exact for 2dp inputs,
    * decimal addition is associative/commutative, and the final
    * decimal→double cast is exact below 2^53. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact revenue expression: price * (1 - discount) in decimal. */
  def revenue(price: Column, discount: Column): Column =
    price.cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)"))

  /** Pricing-summary aggregate — the reference's windowed
    * count/sum/avg/max/min family (utils/flink_window_utils.py:330-397,
    * A1-A4) in batch form over lineitem. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        round(decSum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        round(decSum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      |  MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + filter (T2/T8/T9) — predicate and column pruning
    * reach the parquet scan (verified via explain: PushedFilters). */
  def filterProject(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.where(col("l_returnflag") === "R" && col("l_quantity") > 40)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        revenue(col("l_extendedprice"), col("l_discount")).cast("double").as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val filterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Multi-way dimension (lookup) join — JN2 analogue. nation/region
    * are explicitly broadcast (bounded at 25/5 rows forever); customer
    * GROWS with scale factor (SF×150k rows — tens of GB at 100 TB), so
    * it carries NO hint: AQE broadcasts it while it fits
    * autoBroadcastJoinThreshold and falls back to a shuffled hash join
    * beyond, instead of a forced hint OOMing the driver. */
  def dimJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("order_count"),
        decSum(col("o_totalprice")).as("total_revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val dimJoinSql: String =
    """SELECT r_name, n_name, COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Top-k per group (O4 — the reference's "TopN" TableAggregate
    * concept, flink_learning/flink_typora.md:808). Deterministic
    * tie-break on o_orderkey. */
  def topKPerGroup(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val topKPerGroupSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** q72: top-k per group as a bounded two-phase AGGREGATE
    * (functions.Aggregators.TopKByScore) instead of a window: the
    * shuffle carries at most k rows per (partition, group) — partial
    * buffers merge map-side — where row_number() must shuffle and
    * sort every order of every customer. Same output contract as
    * [[topKPerGroup]] (shared oracle); the typed Dataset path
    * (groupByKey + Aggregator + flatMap) is the API showcase.
    *
    * Honest trade (measured at sf0.1: 0.49 s vs the window's
    * 0.36 s): with ~10 rows per group the window's in-partition sort
    * is trivial and the typed path pays object serialization; the
    * aggregate wins when group size >> k, because the shuffle drops
    * from every row to k per (partition, group) — a shuffle-volume
    * argument, which is the one that matters at cluster scale. */
  def topKPerGroupAgg(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.Aggregators.TopKByScore(k)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (cust, top) =>
        top.iterator.zipWithIndex.map { case ((price, okey), i) =>
          (cust, i + 1, okey, price)
        }
      }
      .toDF("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Global sort + limit (O1/O2) with a total order for determinism. */
  def sortLimit(spark: SparkSession, sfDir: String, n: Int = 100): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(n)

  val sortLimitSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Union / merge (O3 — pd.concat analogue,
    * flink5_parse_walmart_order.py:202) via unionByName. */
  def unionMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val hi = o.where(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
    val lo = o.where(col("o_totalprice") < 10000)
      .select(col("o_orderkey"), col("o_totalprice"), lit("low").as("bucket"))
    hi.unionByName(lo).orderBy(col("o_orderkey"))
  }

  val unionMergeSql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 400000
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 10000
      |) t ORDER BY o_orderkey""".stripMargin

  /** ROLLUP aggregation (beyond-reference: grouping-set analytics the
    * reference lacks but any replacement engine is expected to have).
    * Subtotal rows carry NULL group keys, identical in both engines. */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupAggSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Exact dedup (A7 — dedup by purchaseOrderId,
    * order1_request_walmart_order.py:241-261) expressed
    * deterministically: keep the minimum id per duplicate group.
    * Hash-groupBy on the dedup key — one shuffle, map-side partial
    * aggregation, linear in data size at any scale. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .orderBy(col("text_hash"))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
      |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin

  /** q67: shipping-priority top-10 (TPC-H Q3 shape) — the canonical
    * selective three-way join: a filtered dimension (one market
    * segment of customers) joins orders then lineitem, aggregates
    * exact revenue per order, and takes a bounded top-k.
    *
    * Scale shape: Catalyst pushes both date filters into the scans,
    * broadcasts the filtered customer side under AQE, and the top-10
    * is TakeOrdered (per-partition heaps + driver merge), never a
    * global sort. Revenue is exact decimal so ordering is engine- and
    * partition-stable. */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = "1998-01-01"
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") < lit(cutoff))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") > lit(cutoff))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** q68: local-supplier volume (TPC-H Q5 shape) — the canonical
    * six-way join: region → nation → customer/supplier → orders →
    * lineitem with the "customer and supplier in the same nation"
    * equi-constraint, revenue per nation.
    *
    * Scale shape: region/nation are broadcast leaves; customer and
    * supplier join on their shared nationkey constraint through the
    * fact table; only orders⋈lineitem is a shuffle join at scale —
    * exactly the plan shape a warehouse engine must produce, left to
    * Catalyst + AQE rather than hand-ordered. */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val asia = Tables.region(spark, sfDir).where(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, sfDir)
      .join(asia, col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1996-01-01") &&
             col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** q70: customer order-count distribution (TPC-H Q13 shape) — the
    * canonical LEFT OUTER + double aggregation: customers keep their
    * zero-order row through the outer join, orders are counted per
    * customer, then customers are counted per order-count. Exercises
    * the outer-join path (every other join in the suite is inner or
    * semi) and the aggregate-of-aggregate plan.
    *
    * Scale shape: both aggregates are hash aggregates with map-side
    * partials; the outer join shuffles on custkey once, and the
    * second aggregate's key space (distinct order counts) is tiny. */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val orderCountDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q71: dormant high-value customers — NOT EXISTS over recent
    * orders, i.e. the anti-join: customers above an account-balance
    * floor with no order since the cutoff. The third join family
    * (inner/outer/anti) the engine must plan well; Catalyst compiles
    * the NOT EXISTS into a broadcast/shuffle anti join, never a
    * per-row subquery.
    *
    * Scale shape: the recent-orders side is filtered before the
    * anti join (predicate pushed to the scan), then a single
    * left-anti hash join on custkey. */
  def dormantCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val recent = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey"))
    Tables.customer(spark, sfDir)
      .where(col("c_acctbal") > 7500)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  val dormantCustomersSql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > 7500
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** q74: order-priority check (TPC-H Q4 shape) — count orders per
    * priority having AT LEAST ONE late line item (EXISTS → a LeftSemi
    * hash join: each order matches at most once no matter how many
    * lines are late). Completes the oracle-checked join family:
    * inner, outer (q70), semi (q74), anti (q71).
    *
    * Scale shape: the lateness predicate pushes into the lineitem
    * scan; the semi join shuffles on orderkey once and short-circuits
    * per probe; the priority rollup is a tiny aggregate. */
  def priorityCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val late = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey")
    Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1997-01-01") &&
             col("o_orderdate") < lit("1998-01-01"))
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val priorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Exact per-group percentiles by rank selection: the value at rank
    * ceil(q * n) of the group's ascending sort (percentile_disc
    * semantics — an ACTUAL group element, so integer columns stay
    * exact and the oracle reproduces every value bit-for-bit, unlike
    * interpolating `percentile` or sketch-based `approx_percentile`).
    *
    * Two-phase rank selection, NOT a per-group row sort: phase 1 is
    * `groupBy(group, value).count()` — a hash aggregate with map-side
    * partial combine, so the shuffle carries at most one row per
    * DISTINCT value per group per task, not one row per document;
    * phase 2 runs the cumulative count over the distinct-value table
    * and picks, for each target rank ceil(q*n), the smallest value
    * whose cumulative count reaches it (exactly the value the sorted
    * rank would land on, ties included). The only per-group sequential
    * step scales with the group's VALUE-DOMAIN cardinality (bounded
    * for lengths, scores, latencies — the columns percentiles are run
    * on), never with its row count: a language holding 60% of a
    * 100 TB corpus is a few hundred thousand distinct lengths in the
    * window, not billions of rows in one task's sort. */
  def percentilesBy(df: DataFrame, groupCol: String, valueCol: String,
                    qs: Seq[Double]): DataFrame = {
    // NULL values are excluded up front (percentile_disc semantics,
    // matching percentilesByBucketed): counting them in __n while
    // min(when(...)) can never select them would skew every rank
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(groupCol, valueCol).agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__hi", sum("__c").over(
        Window.partitionBy(groupCol).orderBy(col(valueCol).asc)))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
    val picks = qs.map { q =>
      min(when(col("__hi") >= ceil(lit(q) * col("__n")), col(valueCol)))
        .as(s"p${(q * 100).round}")
    }
    cum.groupBy(groupCol).agg(picks.head, picks.tail: _*)
  }

  /** The naive one-phase variant — row_number over every row of the
    * group — kept as the exactness cross-check [[percentilesBy]] is
    * spec-pinned against. Its per-group sort runs inside ONE task, so
    * it is correct at any size but a single-executor bottleneck on a
    * skewed stratum; never use it where a group can exceed a
    * partition. */
  private[graft] def percentilesByWindowed(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    // row_number's tie order is partition-dependent, but tied rows
    // carry the SAME value, so the value selected at any rank is
    // deterministic — no tiebreak column needed. NULLs excluded like
    // the two-phase variants, so the three engines stay equivalent.
    val ranked = df.where(col(valueCol).isNotNull)
      .withColumn("__rank", row_number().over(
        Window.partitionBy(groupCol).orderBy(col(valueCol).asc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val picks = qs.map { q =>
      max(when(col("__rank") === expr(s"cast(ceil($q * __n) as int)"),
        col(valueCol))).as(s"p${(q * 100).round}")
    }
    ranked.groupBy(groupCol).agg(picks.head, picks.tail: _*)
  }

  /** Exact per-group percentiles for CONTINUOUS value domains, where
    * [[percentilesBy]]'s distinct-value table would be as large as the
    * input (every value unique) and its per-group cumulative window a
    * single-task sort again. Range-bucketed rank selection instead:
    *   1. per-group (n, lo, hi) — one tiny aggregate, joined back;
    *   2. each row maps to a value-range bucket (monotone in the
    *      value, so bucket order IS value order); per-bucket counts —
    *      a hash aggregate of at most `buckets` rows per group;
    *   3. the bucket prefix-sum locates, for every target rank
    *      ceil(q*n), WHICH bucket holds it and the residual rank
    *      inside that bucket (groups x qs rows, joined back);
    *   4. only target-bucket rows are revisited, and the residual
    *      rank is selected inside them by the same distinct-value
    *      cumulative count [[percentilesBy]] uses.
    * No step sorts a whole group in one task: the widest sequential
    * work is one bucket's distinct values, ~n_group/buckets rows (an
    * adversarial value pile-up inside one bucket is by definition a
    * tie pile, which the distinct-value select collapses) — UNLESS
    * the pile-up is of DISTINCT values crammed into one bucket's
    * value range (a heavy tail under a huge outlier-stretched [lo,
    * hi]). `levels = 2` handles that tail by re-bucketing each
    * TARGET bucket over its own (lo, hi) before the distinct-value
    * select, cutting the sequential step to ~n_group/buckets² rows;
    * the extra cost is two aggregates over target-bucket rows only
    * (not the whole group), so the default stays 1. Exact for any
    * distribution at either level — bucketing only NARROWS where the
    * rank is searched, the selection itself is by count, never
    * interpolation.
    *
    * The small side of every join-back (stats, targets) is one row per
    * group (× qs) — tiny for the declared queries (≤5 groups) but
    * unbounded for a library caller grouping on a high-cardinality
    * key. r14 dropped all five forced broadcast hints for that safety
    * and shipped it unmeasured; the r15 A/B (PERF §37, interleaved at
    * 100×) put the cost at ~30% (6.8 vs 5.2 s) — AQE's late
    * materialization of four stats/targets join-backs is real time.
    * So the hints are now CONDITIONAL on measurement, not guessed:
    * the stats aggregate (one row per group) is persisted and counted
    * — one small extra job at plan-construction time — and the five
    * hints apply only when the group count is provably broadcast-safe
    * (≤ [[pctHintMaxGroups]]). A million-group caller still degrades
    * to shuffle joins instead of a driver OOM, and the persist also
    * stops the five stats subplan occurrences recomputing the
    * aggregate. The persist's lifetime is NOT automatic (ADVICE r15:
    * CacheManager holds a strong reference to the cached plan, so
    * ContextCleaner never reclaims it when the handle goes
    * unreachable) — each stats frame is tracked in a bounded
    * per-session LRU ([[SessionCacheRegistry]]): repeated calls over
    * the same input share one entry, distinct inputs beyond the window
    * evict-and-unpersist the eldest, and
    * [[releasePercentileCache]] frees them all eagerly.
    *
    * NOTE: this makes percentilesByBucketed EAGER (it runs the stats
    * job before returning), like [[graft.operators.DedupOps
    * .prefixJaccardPairsOf]]. SPARK_GRAFT_PCT_HINT overrides for A/B
    * attribution: `force` = always hint, `off` = never (the r14
    * hint-free shape, no eager count). */
  private[graft] val pctHintMaxGroups = 100000L

  /** Per-session LRU of percentile stats persists (ADVICE r15: the
    * leak class [[SessionCacheRegistry]] exists for — every call over
    * a DISTINCT input takes one group-cardinality MEMORY_AND_DISK
    * frame that CacheManager pins until released). */
  private[graft] val pctStatsRegistry = new SessionCacheRegistry(8)

  /** Unpersist every percentile stats frame cached by
    * [[percentilesByBucketed]] calls on `spark`; returns the count.
    * The LRU bounds the steady state regardless — this is the eager
    * release for callers that know they are done. */
  def releasePercentileCache(spark: org.apache.spark.sql.SparkSession): Int =
    pctStatsRegistry.release(spark)

  def percentilesByBucketed(df: DataFrame, groupCol: String, valueCol: String,
                            qs: Seq[Double], buckets: Int = 4096,
                            levels: Int = 1): DataFrame = {
    require(levels == 1 || levels == 2, s"levels must be 1 or 2, got $levels")
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
    val statsRaw = vals.groupBy(groupCol).agg(count(lit(1)).as("__n"),
      min("__v").as("__lo"), max("__v").as("__hi"))
    val (stats, hintOn) = sys.env.get("SPARK_GRAFT_PCT_HINT") match {
      case Some("force") => (statsRaw, true)
      case Some("off")   => (statsRaw, false)
      case _ =>
        val cached = statsRaw
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pctStatsRegistry.register(cached): Unit
        (cached, cached.count() <= pctHintMaxGroups)
    }
    def maybeHint(small: DataFrame): DataFrame =
      if (hintOn) broadcast(small) else small
    val bucketed = vals.join(maybeHint(stats), groupCol)
      .withColumn("__b", when(col("__hi") === col("__lo"), lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((col("__v") - col("__lo")) / (col("__hi") - col("__lo"))
            * buckets).cast("int"))))
    val hist = bucketed.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val cum = hist
      .join(maybeHint(stats.select(col(groupCol), col("__n"))), groupCol)
      .withColumn("__cum",
        sum("__c").over(Window.partitionBy(groupCol).orderBy(col("__b"))))
    val targets = cum
      .withColumn("__q", explode(array(qs.map(lit): _*)))
      .withColumn("__r", ceil(col("__q") * col("__n")))
      .where(col("__cum") >= col("__r") &&
             col("__cum") - col("__c") < col("__r"))
      .select(col(groupCol).as("__g"), col("__q"),
        col("__b").as("__tb"),
        (col("__r") - (col("__cum") - col("__c"))).as("__rr"))
    // rows of the TARGET buckets only, tagged with the residual rank;
    // every (group, q) names exactly one target bucket
    val tRows = bucketed
      .join(maybeHint(targets),
        col(groupCol) === col("__g") && col("__b") === col("__tb"))
      .select(col(groupCol), col("__q"), col("__rr"), col("__v"))
    // level 2: the same histogram → prefix-sum → residual-rank
    // narrowing, replayed INSIDE each target bucket over its own
    // value range (the level-2 "group" is the (group, q) target)
    val finalRows =
      if (levels == 1) tRows
      else {
        val tStats = tRows.groupBy(groupCol, "__q")
          .agg(min("__v").as("__lo2"), max("__v").as("__hi2"))
        val sub = tRows.join(maybeHint(tStats), Seq(groupCol, "__q"))
          .withColumn("__b2", when(col("__hi2") === col("__lo2"), lit(0))
            .otherwise(least(lit(buckets - 1),
              floor((col("__v") - col("__lo2")) /
                (col("__hi2") - col("__lo2")) * buckets).cast("int"))))
        val cum2 = sub.groupBy(col(groupCol), col("__q"), col("__rr"),
            col("__b2")).agg(count(lit(1)).as("__c"))
          .withColumn("__cum", sum("__c").over(
            Window.partitionBy(col(groupCol), col("__q")).orderBy(col("__b2"))))
        val targets2 = cum2
          .where(col("__cum") >= col("__rr") &&
                 col("__cum") - col("__c") < col("__rr"))
          .select(col(groupCol).as("__g2"), col("__q").as("__q2"),
            col("__b2").as("__tb2"),
            (col("__rr") - (col("__cum") - col("__c"))).as("__rr2"))
        sub.join(maybeHint(targets2),
            col(groupCol) === col("__g2") && col("__q") === col("__q2") &&
            col("__b2") === col("__tb2"))
          .select(col(groupCol), col("__q"), col("__rr2").as("__rr"), col("__v"))
      }
    val picked = finalRows
      .groupBy(col(groupCol), col("__q"), col("__rr"), col("__v"))
      .agg(count(lit(1)).as("__c2"))
      .withColumn("__cum2", sum("__c2").over(
        Window.partitionBy(col(groupCol), col("__q")).orderBy(col("__v"))))
      .where(col("__cum2") >= col("__rr"))
      .groupBy(groupCol, "__q").agg(min("__v").as("__pv"))
    val cols = qs.map(q =>
      max(when(col("__q") === q, col("__pv"))).as(s"p${(q * 100).round}"))
    picked.groupBy(groupCol).agg(cols.head, cols.tail: _*)
  }

  /** q64: per-language document-length percentiles — the corpus-shape
    * summary (median/tails per stratum) every curation dashboard
    * opens with. */
  def langLengthPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    percentilesBy(Tables.documents(spark, sfDir), "lang", "n_chars",
        Seq(0.25, 0.5, 0.75, 1.0))
      .orderBy("lang")

  val langLengthPercentilesSql: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC) AS rk,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT lang,
      |  max(CASE WHEN rk = CAST(ceil(0.25 * n) AS INT) THEN n_chars END) AS p25,
      |  max(CASE WHEN rk = CAST(ceil(0.5 * n) AS INT) THEN n_chars END) AS p50,
      |  max(CASE WHEN rk = CAST(ceil(0.75 * n) AS INT) THEN n_chars END) AS p75,
      |  max(CASE WHEN rk = CAST(ceil(1.0 * n) AS INT) THEN n_chars END) AS p100
      |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin

  /** q76: min-cost supplier per part (TPC-H Q2 shape). The reference
    * shape is a correlated MIN subquery per part; the idiomatic Spark
    * decorrelation is a per-part window minimum over the already-
    * joined cost table — one pass, no re-scan, and the window groups
    * are per-part (bounded by suppliers-per-part, never stratum-
    * sized). Unit cost is a per-row IEEE division + MIN, both
    * order-independent, so the doubles compare bit-exact cross-engine.
    * Scale shape: cost is one hash-agg of lineitem; nation/region are
    * broadcast inside the `eu` build (bounded at 25/5 rows), but `eu`
    * itself derives from supplier (SF×10k rows — grows with the
    * corpus) so it carries NO hint: AQE broadcasts it while small and
    * shuffle-joins beyond. The selective part filter also prefilters
    * lineitem as a semi join BEFORE the cost aggregate (see body). */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val eu = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir))
        .where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name")
    val small = Tables.part(spark, sfDir)
      .where(col("p_size") <= 15).select("p_partkey", "p_name")
    // Semi-join prefilter BEFORE the cost aggregate (guide §3.2, r21):
    // the downstream part join is selective (p_size ≤ 15 keeps ~30% of
    // parts) and drops or keeps whole (l_partkey, l_suppkey) groups —
    // per-group min and the per-part window min over the survivors are
    // bit-identical, while the aggregate's shuffle input falls ~3×.
    // Hint-free like q77's red-part prefilter: the filtered part
    // projection broadcasts statically. The eu (supplier) side is NOT
    // prefiltered here: its 3-way-join size estimate exceeds the
    // static broadcast threshold, so Catalyst planned the semi join as
    // SMJ — a brand-new full lineitem shuffle by suppkey that AQE pays
    // before it can demote the join (observed in the r21 plan dump);
    // the eu restriction is applied once at the post-aggregate join as
    // before.
    val cost = Tables.lineitem(spark, sfDir)
      .join(small.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    cost
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .join(small, col("l_partkey") === col("p_partkey"))
      .withColumn("min_cost",
        min("unit_cost").over(Window.partitionBy("l_partkey")))
      .where(col("unit_cost") === col("min_cost"))
      .select("p_partkey", "p_name", "s_name", "unit_cost")
      .orderBy("p_partkey", "s_name")
  }

  val minCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT p_partkey, p_name, s_name, unit_cost
      |FROM cost JOIN eu ON l_suppkey = s_suppkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 15
      |  AND unit_cost = (
      |    SELECT min(c2.unit_cost) FROM cost c2
      |    JOIN eu e2 ON c2.l_suppkey = e2.s_suppkey
      |    WHERE c2.l_partkey = cost.l_partkey)
      |ORDER BY p_partkey, s_name""".stripMargin

  /** q77: dominant shippers (TPC-H Q20 shape) — suppliers who shipped
    * more than 30% of the 1997 total of some red part. The nested
    * IN-subquery chain (supplier IN ... part IN ... threshold against
    * a correlated aggregate) becomes: per-(part, supplier) quantity
    * aggregate, per-part total as a window sum over that SAME
    * aggregate (no second lineitem scan), threshold filter, then a
    * LEFT SEMI join onto suppliers. Quantities are small integers in
    * doubles — sums are exact and order-independent. */
  def dominantShippers(spark: SparkSession, sfDir: String): DataFrame = {
    val red = Tables.part(spark, sfDir)
      .where(col("p_name").startsWith("red")).select("p_partkey")
    val shipped = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01") &&
             col("l_shipdate") < lit("1998-01-01"))
      .join(red, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("qty"))
    val dominant = shipped
      .withColumn("part_total",
        sum("qty").over(Window.partitionBy("l_partkey")))
      .where(col("qty") * 10 > col("part_total") * 3)
      .select("l_suppkey").distinct()
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  val dominantShippersSql: String =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM shipped s1
      |  WHERE s1.qty * 10 > 3 * (
      |    SELECT sum(s2.qty) FROM shipped s2
      |    WHERE s2.l_partkey = s1.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  /** q78: top-revenue suppliers (TPC-H Q15 shape) — the revenue view
    * plus a scalar MAX subquery, kept as ties-included selection.
    * The max attaches via a SALTED two-stage window over the
    * supplier-quarter aggregate, NOT the usual
    * crossJoin(broadcast(agg)) scalar attachment: that pattern would
    * re-derive the aggregate branch and re-scan lineitem — at 100 TB
    * the second scan costs more than everything else in the query.
    * Stage 1 computes per-salt maxima across 64 hash partitions (the
    * rev frame is one row per ACTIVE supplier — SF-scaled, tens of
    * millions at a true 100 TB, so a single-partition pass over it
    * would NOT be scale-safe); stage 2 runs over the surviving
    * candidates, at most one distinct value per salt plus ties of the
    * winner — bounded by the salt count regardless of supplier
    * cardinality. Its partition spec is a constant expression rather
    * than empty, so WindowExec never logs the
    * "No Partition Defined" single-partition warning for a frame
    * that is bounded by construction. One lineitem scan total,
    * spec-pinned. Revenue is exact decimal (order-independent), cast
    * back to double for the contract. */
  def topRevenueSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01") &&
             col("l_shipdate") < lit("1997-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .as("__rev"))
    val nSalts = 64
    val cand = rev
      .withColumn("__salt", pmod(col("l_suppkey"), lit(nSalts)))
      .withColumn("__smax", max("__rev").over(Window.partitionBy("__salt")))
      .where(col("__rev") === col("__smax"))
    // pmod(__salt, 1) ≡ 0 but is not constant-folded away, keeping the
    // partition spec non-empty (no WindowExec warning) while placing
    // the ≤ nSalts surviving rows in one partition for the final max
    val best = cand
      .withColumn("__max",
        max("__rev").over(Window.partitionBy(pmod(col("__salt"), lit(1)))))
      .where(col("__rev") === col("__max"))
      .withColumn("total_revenue", col("__rev").cast("double"))
    Tables.supplier(spark, sfDir)
      .join(best, col("s_suppkey") === col("l_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  val topRevenueSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE r = (SELECT max(r) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** q75: per-priority order-value percentiles over a CONTINUOUS
    * domain (o_totalprice is near-unique), where the distinct-value
    * plan (q64) would degenerate — the oracle for
    * [[percentilesByBucketed]]. percentile_disc semantics select a
    * STORED double, so the comparison stays bit-exact with no
    * cross-engine float arithmetic. */
  def pricePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    percentilesByBucketed(Tables.orders(spark, sfDir), "o_orderpriority",
        "o_totalprice", Seq(0.25, 0.5, 0.75, 1.0))
      .orderBy("o_orderpriority")

  val pricePercentilesSql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice ASC) AS rk,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority,
      |  max(CASE WHEN rk = CAST(ceil(0.25 * n) AS INT) THEN o_totalprice END) AS p25,
      |  max(CASE WHEN rk = CAST(ceil(0.5 * n) AS INT) THEN o_totalprice END) AS p50,
      |  max(CASE WHEN rk = CAST(ceil(0.75 * n) AS INT) THEN o_totalprice END) AS p75,
      |  max(CASE WHEN rk = CAST(ceil(1.0 * n) AS INT) THEN o_totalprice END) AS p100
      |FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}

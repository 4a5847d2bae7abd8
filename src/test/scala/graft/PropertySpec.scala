package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** Property-based subset of the reference's 35-property test spec
  * (.kiro/specs/flink-mysql-connector-test/design.md:246-402):
  * aggregate determinism under repartitioning, null-on-failure
  * coercion, JSON flatten losslessness, VARCHAR truncation, UTF-8
  * preservation. Spark actions are expensive, so case counts are
  * deliberately small — each case still covers a whole generated
  * batch. */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  property("decimal-summed aggregates identical under any partitioning") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 999999).map(_ / 100.0))) { xs =>
      val df = xs.toDF("v")
      val results = Seq(1, 3, 7).map { n =>
        df.repartition(n).agg(RelationalOps.decSum(col("v"))).collect()(0).getDouble(0)
      }
      results.distinct.size == 1
    }

  property("try_cast coercions null-on-failure, never throwing") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf(
      Gen.numStr, Gen.alphaStr, Gen.const(""), Gen.const("  42  "),
      Gen.const("-7"), Gen.const("1e3"), Gen.const("9" * 30)))) { gens =>
      val xs = gens.take(30)
      val out = xs.toDF("s")
        .select(col("s").try_cast("int").as("i"), col("s").try_cast("long").as("l"),
          col("s").try_cast("decimal(10,2)").as("d"))
        .collect() // must not throw for ANY input
      out.length == xs.length
    }

  private val orderSpec = Gen.zip(Gen.chooseNum(1000L, 999999L), Gen.chooseNum(1, 4))

  property("order flatten lossless: one row per line, header duplicated, PK non-null") =
    forAll(Gen.listOfN(3, orderSpec)) { specs0 =>
      val specs = specs0.distinctBy(_._1)
      val jsons = specs.map { case (po, n) =>
        val lines = (1 to n).map(i => OrderFixtures.line(i, s"SKU-$po-$i")).mkString("[", ",", "]")
        OrderFixtures.order(po.toString, lines)
      }
      val flat = graft.model.OrderParser.parse(jsons.toDF("value")).cache()
      val countOk = flat.count() == specs.map(_._2).sum
      val headerOk = specs.forall { case (po, n) =>
        flat.where(col("purchaseOrderId") === po).count() == n
      }
      val pkOk = flat.where(col("purchaseOrderId").isNull || col("sku").isNull).count() == 0
      flat.unpersist()
      countOk && headerOk && pkOk
    }

  property("varchar truncation bounds every limited column") =
    forAll(Gen.chooseNum(150, 400)) { len =>
      val json = OrderFixtures.order("2000", s"[${OrderFixtures.line(1, "S" * len)}]")
        .replace("1 Main St", "A" * len)
        .replace("Springfield", "C" * len)
      val flat = graft.model.OrderParser.parse(Seq(json).toDF("value"))
      val limits = graft.model.WalmartOrderSchema.varcharLimits
      val conds = limits.map { case (c, n) => length(col(c)) > n }.reduce(_ || _)
      flat.where(conds).count() == 0
    }

  property("UTF-8 text survives the parse round trip") =
    forAll(Gen.oneOf("咖啡豆", "Ünïcødé", "Français—été", "日本語テスト", "🙂emoji")) { name =>
      val json = OrderFixtures.order("3000", s"[${OrderFixtures.line(1, "SKU0")}]")
        .replace("Café Münster 咖啡", name)
      val got = graft.model.OrderParser.parse(Seq(json).toDF("value"))
        .select("productName").collect().map(_.getString(0)).toSet
      got == Set(name)
    }

  property("bucketed rank selection equals exact sort on continuous + tied doubles") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 2),
        Gen.oneOf(Gen.chooseNum(-1e6, 1e6),
          Gen.oneOf(0.0, 1.5, -2.25))))) { raw =>
      val xs = raw.take(150)
      val df = xs.map { case (g, v) => (s"g$g", v) }.toDF("grp", "v")
      val qs = Seq(0.1, 0.5, 0.9, 1.0)
      // buckets=7 forces multi-value buckets and boundary crossings —
      // exactness must not depend on bucket resolution
      val got = RelationalOps.percentilesByBucketed(
          df.repartition(5), "grp", "v", qs, buckets = 7)
        .collect().map(r => r.getString(0) ->
          qs.indices.map(i => r.getDouble(i + 1))).toMap
      val exact = xs.groupBy(x => s"g${x._1}").map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> qs.map(q => sorted(math.ceil(q * sorted.length).toInt - 1))
      }
      Prop(got == exact) :| s"got $got expected $exact"
    }

  property("sorted_intersect_count equals size(array_intersect) incl. duplicates") =
    forAll(Gen.listOf(Gen.chooseNum(-20L, 20L)),
           Gen.listOf(Gen.chooseNum(-20L, 20L))) { (a, b) =>
      // tiny value domain forces heavy duplication and long shared runs
      val df = Seq((a.sorted, b.sorted)).toDF("x", "y")
      val r = df.select(
          graft.functions.SortedIntersectCount
            .sorted_intersect_count(col("x"), col("y")).as("fast"),
          graft.functions.SortedIntersectCount.sorted_intersect_count(
            col("x").cast("array<int>"), col("y").cast("array<int>"))
            .as("fastInt"),
          size(array_intersect(col("x"), col("y"))).as("ref"))
        .head
      Prop(r.getInt(0) == r.getInt(2) && r.getInt(1) == r.getInt(2)) :|
        s"fast ${r.getInt(0)} int ${r.getInt(1)} ref ${r.getInt(2)}"
    }

  property("two-level re-bucket stays exact on a single-bucket pile-up") =
    // pathological for one-level bucketing: one outlier stretches
    // [lo, hi] so that EVERY other value — all distinct — lands in a
    // single bucket; levels=2 must re-bucket that pile and still
    // select the exact rank (and agree with the one-level engine)
    forAll(Gen.chooseNum(5, 60), Gen.chooseNum(0L, 1000L)) { (m, seed) =>
      val pile = (0 until m).map(i => ("g0", 1e9 + i + (seed % 97) * 1e-3))
      val df = (pile :+ (("g0", -1e9))).toDF("grp", "v")
      val qs = Seq(0.1, 0.5, 0.9, 1.0)
      def run(levels: Int) = RelationalOps.percentilesByBucketed(
          df.repartition(3), "grp", "v", qs, buckets = 7, levels = levels)
        .collect().map(r => r.getString(0) ->
          qs.indices.map(i => r.getDouble(i + 1))).toMap
      val sorted = (pile.map(_._2) :+ -1e9).sorted
      val exact = Map("g0" ->
        qs.map(q => sorted(math.ceil(q * sorted.length).toInt - 1)))
      val l2 = run(2)
      Prop(l2 == exact && run(1) == exact) :| s"got $l2 expected $exact"
    }

  property("prefix-filter jaccard join equals driver-side brute force") =
    forAll(Gen.listOfN(10,
        Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
          .map(_.take(10)))) { raw =>
      // duplicated tail guarantees exact-dup positives; the random
      // small-vocab docs produce incidental near-dups and misses
      val docs = (raw ++ raw.take(3)).zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.DedupOps.prefixJaccardPairsOf(df)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      def sh(ts: Seq[String]): Set[String] =
        ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      val sets = docs.map { case (i, text) => i -> sh(text.split(" ").toSeq) }
      val brute = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >=
          graft.operators.DedupOps.prefixThreshold
      } yield (ia, ib)).toSet
      Prop(got == brute) :| s"got $got expected $brute"
    }

  property("rank-selected percentiles equal exact sort on any grouped data") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(-500L, 500L)))) { raw =>
      val xs = raw.take(200)
      val df = xs.map { case (g, v) => (s"g$g", v) }.toDF("grp", "v")
      val qs = Seq(0.25, 0.5, 0.75, 1.0)
      val got = RelationalOps.percentilesBy(df.repartition(5), "grp", "v", qs)
        .collect().map(r => r.getString(0) ->
          qs.indices.map(i => r.getLong(i + 1))).toMap
      val exact = xs.groupBy(x => s"g${x._1}").map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> qs.map(q => sorted(math.ceil(q * sorted.length).toInt - 1))
      }
      Prop(got == exact) :| s"got $got expected $exact"
    }
}

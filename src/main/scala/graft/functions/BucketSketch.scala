package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Bucket-count sketch pair for the q79 verify PREFILTER: a per-doc
  * 64-bucket histogram of the 32-bit shingle hashes, packed as 128
  * bytes (64 unsigned big-endian shorts), plus the pairwise
  * Σ min(ca_i, cb_i) — a DETERMINISTIC upper bound on the two docs'
  * true shared-shingle count.
  *
  * Why the bound holds: the bucket of a shingle is a function of the
  * shingle (low 6 bits of its hash), so every SHARED shingle lands in
  * the same bucket on both sides and contributes 1 to both counts;
  * per bucket the shared count is therefore ≤ min(ca_i, cb_i), and
  * summing buckets bounds the total intersection. Within-doc hash
  * collisions only INCREASE counts (each distinct shingle counts
  * separately), which can only loosen the bound — never a false
  * negative. Saturation: counts clamp at 65535; a clamped count
  * understates only docs carrying ≥ 65,535 shingles IN ONE BUCKET,
  * impossible for any doc with < 65,535 distinct shingles total —
  * callers gate the prefilter on n < 65535 per side (DedupOps),
  * larger docs bypass straight to the exact verify.
  *
  * Purpose (PERF §29): the verify stage's sort-merge joins must
  * sort-exchange every candidate pair twice; at 100× that is 58.7M
  * rows of which 25,600 survive the hash bound. Broadcasting this
  * 128-byte-per-doc sketch lets a candidate-side prefilter reject the
  * bulk in the SAME stage that emits the candidates — zero exchange —
  * so the expensive bucket-aligned array verify receives orders of
  * magnitude fewer rows.
  */
object BucketSketch {
  val NumBuckets = 64
  val SketchBytes: Int = NumBuckets * 2

  def bucket_count_sketch(hs: Column): Column =
    GraftShim.column(BucketCountSketch(GraftShim.expression(hs)))

  def bucket_min_sum(a: Column, b: Column): Column =
    GraftShim.column(BucketMinSum(GraftShim.expression(a), GraftShim.expression(b)))
}

/** array<int> (the doc's 32-bit shingle hashes, any order) → 128-byte
  * bucket-count sketch. Null array or null element yields null. */
case class BucketCountSketch(child: Expression) extends UnaryExpression {
  import BucketSketch._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_count_sketch requires ARRAY<INT>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](SketchBytes)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val b = arr.getInt(i) & (NumBuckets - 1)
      val p = b << 1
      val c = ((out(p) & 0xff) << 8) | (out(p + 1) & 0xff)
      if (c < 0xffff) {
        val c2 = c + 1
        out(p) = (c2 >>> 8).toByte
        out(p + 1) = c2.toByte
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$SketchBytes];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  int $b = $a.getInt($i) & ${NumBuckets - 1};
         |  int $p = $b << 1;
         |  int $c = (($out[$p] & 0xff) << 8) | ($out[$p + 1] & 0xff);
         |  if ($c < 0xffff) {
         |    $c++;
         |    $out[$p] = (byte)($c >>> 8);
         |    $out[$p + 1] = (byte)$c;
         |  }
         |}
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketCountSketch =
    copy(child = newChild)
  override def prettyName: String = "bucket_count_sketch"
}

/** Σ min over the two sketches' unsigned shorts — the intersection
  * upper bound. Inputs must be equal-length sketches. */
case class BucketMinSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bucket_min_sum requires two BINARY sketches, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    require(x.length == y.length && (x.length & 1) == 0,
      s"malformed sketches: lengths ${x.length} vs ${y.length} " +
        "(must be equal and even)")
    var i = 0; var s = 0
    while (i < x.length) {
      val cx = ((x(i) & 0xff) << 8) | (x(i + 1) & 0xff)
      val cy = ((y(i) & 0xff) << 8) | (y(i + 1) & 0xff)
      s += (if (cx < cy) cx else cy)
      i += 2
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cx = ctx.freshName("cx")
      val cy = ctx.freshName("cy")
      s"""
         |if ($a.length != $b.length || ($a.length & 1) != 0) {
         |  throw new IllegalArgumentException("malformed sketches: lengths "
         |    + $a.length + " vs " + $b.length + " (must be equal and even)");
         |}
         |int $s = 0;
         |for (int $i = 0; $i < $a.length; $i += 2) {
         |  int $cx = (($a[$i] & 0xff) << 8) | ($a[$i + 1] & 0xff);
         |  int $cy = (($b[$i] & 0xff) << 8) | ($b[$i + 1] & 0xff);
         |  $s += ($cx < $cy) ? $cx : $cy;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketMinSum =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bucket_min_sum"
}

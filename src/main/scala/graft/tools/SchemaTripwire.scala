package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Round-opening testdata schema probe (VERDICT r12 #7).
  *
  * The round-11 testdata generator silently switched `events.ts` from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and broke 19 queries
  * at analysis time while every gate stayed green. `Tables.load` now
  * normalizes from the RESOLVED schema, but normalization only covers
  * the variants someone has thought about — any OTHER physical-type
  * drift (a key widened to int32, a timestamp turned into epoch
  * seconds, a string column re-encoded) would again surface as
  * downstream breakage instead of a loud, attributable signal.
  *
  * This probe reads the parquet FOOTER of every table (no row data,
  * no SparkSession) and compares each leaf column's physical type +
  * logical annotation against the pinned baseline below.
  *
  *   - deviation  — a column missing or typed off-baseline with no
  *     handled normalization path: HARD failure (exit 1 from main;
  *     Bench records it in its `errors` map, which marks the artifact
  *     incomparable by the n_failed/errors convention).
  *   - warning — a variant `Tables.load` provably handles (any
  *     TIMESTAMP-annotated int64 for `events.ts`, per the unit
  *     dispatch in Tables.scala) or an ADDED column (additive drift
  *     breaks nothing): reported, not fatal.
  *
  * Usage:
  *   runMain graft.tools.SchemaTripwire [sfDir]        — probe
  *   runMain graft.tools.SchemaTripwire --dump [sfDir] — print
  *     observed descriptors in baseline form (for re-pinning after an
  *     ACKNOWLEDGED generator change).
  */
object SchemaTripwire {

  /** table -> (leaf column path -> "PHYSICAL[ logical]") as produced
    * by [[descriptors]]. Pinned from the round-13 testdata
    * (sf0.001/0.01/0.1 all agree — one generator). */
  val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map(
      "r_regionkey" -> "INT32",
      "r_name" -> "BINARY STRING"),
    "nation" -> Map(
      "n_nationkey" -> "INT32",
      "n_name" -> "BINARY STRING",
      "n_regionkey" -> "INT32"),
    "customer" -> Map(
      "c_custkey" -> "INT64",
      "c_name" -> "BINARY STRING",
      "c_nationkey" -> "INT32",
      "c_acctbal" -> "DOUBLE",
      "c_mktsegment" -> "BINARY STRING"),
    "supplier" -> Map(
      "s_suppkey" -> "INT64",
      "s_name" -> "BINARY STRING",
      "s_nationkey" -> "INT32",
      "s_acctbal" -> "DOUBLE"),
    "part" -> Map(
      "p_partkey" -> "INT64",
      "p_name" -> "BINARY STRING",
      "p_brand" -> "BINARY STRING",
      "p_type" -> "BINARY STRING",
      "p_size" -> "INT32",
      "p_retailprice" -> "DOUBLE"),
    "orders" -> Map(
      "o_orderkey" -> "INT64",
      "o_custkey" -> "INT64",
      "o_orderstatus" -> "BINARY STRING",
      "o_totalprice" -> "DOUBLE",
      "o_orderdate" -> "INT64 TIMESTAMP(MICROS,false)",
      "o_orderpriority" -> "BINARY STRING"),
    "lineitem" -> Map(
      "l_orderkey" -> "INT64",
      "l_partkey" -> "INT64",
      "l_suppkey" -> "INT64",
      "l_linenumber" -> "INT32",
      "l_quantity" -> "DOUBLE",
      "l_extendedprice" -> "DOUBLE",
      "l_discount" -> "DOUBLE",
      "l_tax" -> "DOUBLE",
      "l_returnflag" -> "BINARY STRING",
      "l_linestatus" -> "BINARY STRING",
      "l_shipdate" -> "INT64 TIMESTAMP(MICROS,false)"),
    "events" -> Map(
      "event_id" -> "INT64",
      "ts" -> "INT64 TIMESTAMP(MICROS,false)",
      "user_id" -> "INT64",
      "event_type" -> "BINARY STRING",
      "value" -> "DOUBLE",
      "props" -> "BINARY STRING"),
    "documents" -> Map(
      "doc_id" -> "INT64",
      "text" -> "BINARY STRING",
      "lang" -> "BINARY STRING",
      "source" -> "BINARY STRING",
      "n_chars" -> "INT64"),
    "embeddings" -> Map(
      "vec_id" -> "INT64",
      "embedding.list.element" -> "FLOAT",
      "label" -> "INT32"))

  /** Off-baseline shapes `Tables.load` still normalizes correctly:
    * events.ts as int64 with ANY timestamp annotation (micros/nanos/
    * millis × either UTC-adjustment — the schema-driven dispatch in
    * Tables.scala covers long-surfaced nanos, NTZ, and instant types).
    * INT96 (Spark's legacy instant encoding, no annotation) also reads
    * back as TimestampType and takes the same branch. A PLAIN int64 ts
    * is NOT accepted: nanosAsLong would surface it as long and the
    * loader would silently treat it as nanos, which is an assumption,
    * not knowledge. */
  private def handledVariant(table: String, col: String, desc: String): Boolean =
    table == "events" && col == "ts" &&
      (desc.startsWith("INT64 TIMESTAMP(") || desc == "INT96")

  /** Leaf descriptors of ONE parquet file's footer: dotted column
    * path -> "PHYSICAL[ logical-annotation]". Never reads rows. */
  private def fileDescriptors(file: Path, conf: Configuration): Map[String, String] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getFileMetaData.getSchema.getColumns.asScala.map { cd =>
        val pt = cd.getPrimitiveType
        val logical = Option(pt.getLogicalTypeAnnotation)
          .map(" " + _.toString).getOrElse("")
        cd.getPath.mkString(".") -> (pt.getPrimitiveTypeName.toString + logical)
      }.toMap
    } finally reader.close()
  }

  /** Leaf descriptors of a parquet file/dir. For a dir, EVERY part
    * file's footer is probed (footer-only, O(#parts) metadata reads —
    * ADVICE r13: drift confined to a later part, e.g. a generator
    * change mid-run producing mixed parts, must not slip past a
    * first-part-only probe); any cross-part disagreement throws, which
    * Bench's tripwire catch records as an artifact-invalidating error. */
  def descriptors(path: String): Map[String, String] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
        if (parts.isEmpty) sys.error(s"no .parquet part files under $path")
        parts
      } else Seq(p)
    val first = fileDescriptors(files.head, conf)
    files.tail.foreach { f =>
      val d = fileDescriptors(f, conf)
      if (d != first) {
        val diffs = (first.keySet ++ d.keySet).toSeq.sorted.flatMap { c =>
          val (a, b) = (first.get(c), d.get(c))
          if (a == b) None
          else Some(s"$c: ${b.getOrElse("ABSENT")} (${files.head.getName}: ${a.getOrElse("ABSENT")})")
        }
        sys.error(s"cross-part schema drift in $path at ${f.getName}: " +
          diffs.mkString("; "))
      }
    }
    first
  }

  /** (hard deviations, warnings) for one table dir. Missing table
    * files are skipped (scale dirs legally carry a subset — absence is
    * already loud when a query reads it). */
  def checkTable(sfDir: String, table: String): (Seq[String], Seq[String]) = {
    val path = s"$sfDir/$table.parquet"
    // existence through the SAME Hadoop FileSystem API descriptors()
    // resolves with (ADVICE r13): a java.io.File check on a non-local
    // sfDir (hdfs://, s3a://) made every table look missing and turned
    // the tripwire into a silent false pass
    val p = new Path(path)
    if (!p.getFileSystem(new Configuration()).exists(p)) return (Nil, Nil)
    val actual = descriptors(path)
    val exp = expected(table)
    val missing = (exp.keySet -- actual.keySet).toSeq.sorted
      .map(c => s"$table.$c: MISSING (expected ${exp(c)})")
    val changed = exp.keySet.intersect(actual.keySet).toSeq.sorted
      .filter(c => actual(c) != exp(c))
      .map(c => (c, s"$table.$c: ${actual(c)} (expected ${exp(c)})"))
    val (handled, hard) =
      changed.partition { case (c, _) => handledVariant(table, c, actual(c)) }
    val added = (actual.keySet -- exp.keySet).toSeq.sorted
      .map(c => s"$table.$c: ADDED (${actual(c)})")
    (missing ++ hard.map(_._2),
      handled.map(_._2 + " — handled by Tables.load") ++ added)
  }

  /** All hard deviations across every present table; empty = green. */
  def check(sfDir: String): Seq[String] =
    graft.Tables.names.flatMap(checkTable(sfDir, _)._1)

  def main(args: Array[String]): Unit = {
    val dump = args.contains("--dump")
    val sfDir = args.filterNot(_.startsWith("--"))
      .headOption.getOrElse("/root/testdata/sf0.01")
    if (dump) {
      graft.Tables.names.foreach { t =>
        val path = s"$sfDir/$t.parquet"
        if (new java.io.File(path).exists())
          descriptors(path).toSeq.sorted.foreach { case (c, d) =>
            println(s"""      "$c" -> "$d",  // $t""")
          }
      }
      return
    }
    var bad = false
    graft.Tables.names.foreach { t =>
      val (hard, warn) = checkTable(sfDir, t)
      hard.foreach { d => bad = true; println(s"[tripwire] DEVIATION $d") }
      warn.foreach(d => println(s"[tripwire] warning $d"))
    }
    if (bad) {
      println(s"[tripwire] FAIL — $sfDir physical schema drifted; " +
        "inspect with --dump, fix/extend Tables.load, then re-pin the baseline")
      sys.exit(1)
    } else println(s"[tripwire] OK — $sfDir matches the pinned baseline")
  }
}

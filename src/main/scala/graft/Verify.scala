package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rmrf)
      f.delete(): Unit
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      // Delete any prior output FIRST: if both the query and the
      // sentinel write below fail (e.g. a filesystem/session-wide
      // fault), a stale previous-round result dir must not survive to
      // be compared as if it were this run's output.
      rmrf(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A query that fails must show up RED in the correctness report,
        // not vanish from it: round 11 broke all 19 events queries at
        // analysis time and the report stayed all-green because failed
        // queries simply had no output dir. Write a one-row sentinel
        // whose schema can never match any oracle, so the driver compare
        // records an explicit mismatch for this query.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        import spark.implicits._
        try Seq(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(500)}")
          .toDF("__query_failed")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        catch { case e2: Throwable =>
          // Missing dir now means FAILURE (prior output was deleted
          // above); still say so loudly for the driver log.
          System.err.println(
            s"[verify] $name sentinel write ALSO failed: ${e2.getMessage}")
        }
      }
      // queries persist() shared subtrees internally; don't let cached
      // blocks accumulate across the 30+ query loop
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

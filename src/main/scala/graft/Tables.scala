package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Kept deliberately thin: `spark.read.parquet` hands Catalyst a
  * relation it can push filters and column pruning into — any wrapping
  * (caching, collecting, schema rewriting) here would only get in the
  * optimizer's way. At cluster scale the same call reads a partitioned
  * directory tree with partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
      // Spark surfaces as long under spark.sql.legacy.parquet.nanosAsLong)
      // and TIMESTAMP(MICROS). Normalize to TIMESTAMP_NTZ either way —
      // the micros truncation is what DuckDB applies to nanos, so oracle
      // comparisons line up — and decide from the RESOLVED schema, not
      // from an assumption about the file: hard-coding `ts div 1000`
      // breaks analysis for every events query the moment the testdata
      // generator switches units.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      import org.apache.spark.sql.functions.expr
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      // All conversions go through raw epoch micros added to an NTZ
      // epoch literal: `cast(... as timestamp_ntz)` from TimestampType
      // renders in the SESSION timezone, so a non-UTC consumer session
      // would see shifted events timestamps relative to the oracle.
      // timestampadd over TIMESTAMP_NTZ never consults the session tz.
      val epochNtz = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
      raw.schema("ts").dataType match {
        case LongType => // nanos surfaced as long → truncate to micros
          raw.withColumn("ts",
            expr(s"timestampadd(MICROSECOND, ts div 1000, $epochNtz)"))
        case TimestampNTZType => raw // already zone-free wall time
        case _ => // instant type → UTC wall time, session-tz-independent
          raw.withColumn("ts",
            expr(s"timestampadd(MICROSECOND, unix_micros(ts), $epochNtz)"))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` text works —
    * the analogue of the reference's Table-API registration
    * (utils/flink_table_api_utils.py:129-174).
    *
    * Memoized per (session, dir): view registration re-reads parquet
    * footers and re-lists files, which showed up as ~0.2 s on every
    * SQL-text query. Re-registering is only needed when the data dir
    * changes; a dir switch (scale-factor change mid-session, as Bench
    * and the tests do) invalidates the memo. The memo hit still
    * confirms every canonical view EXISTS (a cheap in-memory catalog
    * lookup) so foreign code dropping one of these names forces a
    * re-register instead of failing downstream SQL; it deliberately
    * does NOT detect a view REPLACED under a canonical name — callers
    * registering their own views must not collide with [[names]].
    * WeakHashMap keys: a retired SparkSession must not be pinned by
    * this cache. */
  private val registeredFor = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    def current =
      registeredFor.get(spark) == sfDir &&
        names.forall(spark.catalog.tableExists)
    if (!current) synchronized {
      if (!current) {
        names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
        registeredFor.put(spark, sfDir)
      }
    }
  }
}

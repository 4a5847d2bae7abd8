package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus
  * decode/feature-extract plumbing.
  *
  * The actual media decode is a STUB (no codec libraries in this
  * environment): [[fakeDecodeFeatures]] derives a deterministic
  * feature vector from the raw bytes. Everything around it — schema,
  * per-partition batch processing, feature vector shape, partition
  * parallelism — is real and tested, so swapping in a true decoder
  * (JNI/FFmpeg/ImageIO) changes one function.
  *
  * Scale shape: media bytes never leave their partition; metadata
  * extraction and feature extraction are narrow maps. At 100 TB the
  * binary column stays columnar in parquet, and pushdown prunes it
  * out of queries that only touch metadata.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("content_md5", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Build a media table from the documents fixture: text bytes stand
    * in for opaque media payloads (deterministic fake). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        expr("element_at(array('image','audio','video'), cast(doc_id % 3 as int) + 1)")
          .as("media_kind"),
        col("text").cast("binary").as("content"))

  /** Typed metadata from the binary column — pure Catalyst: md5 /
    * octet_length are codegen'd; width/height/duration are
    * deterministic stubs derived from the content hash (a real
    * decoder would parse headers here). */
  def withMetadata(df: DataFrame): DataFrame =
    df.withColumn("h32",
        expr("cast(conv(substring(md5(content), 1, 8), 16, 10) as bigint)"))
      .withColumn("meta", struct(
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        when(col("media_kind") === "image", (col("h32") % 1920 + 1).cast("int")).as("width"),
        when(col("media_kind") === "image", (col("h32") % 1080 + 1).cast("int")).as("height"),
        when(col("media_kind") =!= "image", col("h32") % 600000).as("duration_ms")))
      .drop("h32")

  /** Feature extraction over binary payloads — the stub "decoder" as a
    * native Catalyst expression ([[ByteHistogram]]): an L1-normalized
    * `dim`-bin byte histogram per row, deterministic and
    * shape-correct. Runs inside whole-stage codegen as a plain
    * projection (the round-1 `df.rdd.mapPartitions` version exited the
    * SQL engine and lost codegen + column pruning). A real decoder
    * replaces the expression — or drops to typed
    * `Dataset.mapPartitions` if it needs batched native calls. */
  def fakeDecodeFeatures(df: DataFrame, contentCol: String = "content",
                         dim: Int = 16): DataFrame =
    df.withColumn("features", ByteHistogram.byte_histogram(col(contentCol), dim))

  /** The oracle-checked metadata query: binary payload stats per doc. */
  def mediaMetaQuery(spark: SparkSession, sfDir: String): DataFrame =
    withMetadata(mediaFromDocuments(spark, sfDir))
      .select(
        col("media_id"), col("media_kind"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.content_md5").as("content_md5"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.duration_ms").as("duration_ms"))
      .orderBy("media_id")

  val mediaMetaQuerySql: String =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST((('0x' || substr(md5(text), 1, 8))::BIGINT % 1920 + 1) AS INT) END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST((('0x' || substr(md5(text), 1, 8))::BIGINT % 1080 + 1) AS INT) END AS height,
      |  CASE WHEN doc_id % 3 <> 0 THEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 600000 END AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin

  // ------------------------------------------------- frame sampling

  private val frameLen = 32  // bytes per sampled frame
  private val stride   = 64  // bytes between frame starts

  /** q73: frame sampling over the binary media column — cut each
    * payload into fixed-length byte frames at a stride (every Nth
    * video frame / audio window), emitting per-frame index, byte
    * length, and checksum. The Spark side is genuine BINARY column
    * plumbing (`substring`/`md5` over binary stay in whole-stage
    * codegen; a real frame decoder replaces the slicing expression,
    * nothing else). The sampled-frame stream is what a multimodal
    * feature extractor consumes downstream.
    *
    * Scale shape: pure narrow explode — frames never leave their
    * partition, output is bounded by bytes/stride per row, and
    * metadata-only consumers prune the binary column at the scan.
    *
    * (The DuckDB oracle uses VARCHAR slicing — DuckDB 1.0 has no BLOB
    * substring/md5 — so the oracle-checked query scopes itself to
    * byte-pure payloads (octet_length == char length) ON BOTH SIDES;
    * the operator's slicing itself is pure binary and
    * content-agnostic. The adversarial-corpus run caught the
    * unscoped version diverging on multi-byte documents.) */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaFromDocuments(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
          .where(octet_length(col("text")) === length(col("text")))
          .select(col("doc_id").as("media_id")),
        "media_id")
      .where(octet_length(col("content")) >= frameLen)
      .withColumn("n_frames", expr(
        s"cast((octet_length(content) - $frameLen) div $stride as int) + 1"))
      // explode the INDEX sequence, slice per exploded row: the r17
      // form transform()'d the full frame array per media row first —
      // a CodegenFallback lambda (fleet sweep hit, PERF §50) AND a
      // per-row materialization of every frame before the explode;
      // index-first keeps the slicing in whole-stage codegen and
      // streams one frame at a time
      .select(col("media_id"), col("content"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      .withColumn("frame", expr(
        s"substring(content, frame_idx * $stride + 1, $frameLen)"))
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).as("n_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("media_id", "frame_idx")

  val frameSampleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, text AS content FROM documents
       |  WHERE length(text) >= $frameLen
       |    AND octet_length(encode(text)) = length(text)),
       |f AS (
       |  SELECT media_id, content,
       |    unnest(generate_series(0,
       |      CAST((length(content) - $frameLen) // $stride AS INT))) AS frame_idx
       |  FROM m)
       |SELECT media_id, frame_idx,
       |  length(substr(content, frame_idx * $stride + 1, $frameLen)) AS n_bytes,
       |  md5(substr(content, frame_idx * $stride + 1, $frameLen)) AS frame_md5
       |FROM f ORDER BY media_id, frame_idx""".stripMargin
}

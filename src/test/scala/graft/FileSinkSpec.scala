package graft

import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** K5 file sink round trip: parsed order lines written and re-read in
  * each supported format. */
class FileSinkSpec extends SparkSpec {
  import spark.implicits._

  test("parquet/orc/csv/json round-trip the flat order schema") {
    val flat = graft.pipelines.WalmartOrderPipeline.parse(
      Seq(OrderFixtures.twoLineOrder).toDF("value"))
      .select("purchaseOrderId", "sku", "orderLineStatus", "chargeAmount")
    val base = java.nio.file.Files.createTempDirectory("graft_fs")
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = s"$base/$fmt"
      Sinks.fileBatch(flat, path, fmt)
      val back = fmt match {
        case "csv" => spark.read.option("header", "false")
          .schema(flat.schema).csv(path)
        case f => spark.read.format(f).schema(flat.schema).load(path)
      }
      assert(back.count() == 2, s"$fmt round trip lost rows")
      assert(back.where(col("sku") === "SKU-A").count() == 1, s"$fmt content mismatch")
    }
  }

  test("columnar formats push filters and prune columns at the scan") {
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft_cols")
    for (fmt <- Seq("parquet", "orc")) {
      val path = s"$base/$fmt"
      Sinks.fileBatch(docs, path, fmt)
      val q = spark.read.format(fmt).load(path)
        .where(col("doc_id") > 100).select("doc_id", "lang")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)"),
        s"$fmt scan lost predicate pushdown:\n$plan")
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
        s"$fmt scan reads more than the projected columns:\n$plan")
      assert(q.count() == docs.where(col("doc_id") > 100).count())
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** K5 file sink round trip: parsed order lines written and re-read in
  * each supported format. */
class FileSinkSpec extends SparkSpec {
  import spark.implicits._

  test("parquet/csv/json round-trip the flat order schema") {
    val flat = graft.pipelines.WalmartOrderPipeline.parse(
      Seq(OrderFixtures.twoLineOrder).toDF("value"))
      .select("purchaseOrderId", "sku", "orderLineStatus", "chargeAmount")
    val base = java.nio.file.Files.createTempDirectory("graft_fs")
    for (fmt <- Seq("parquet", "json", "csv")) {
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
}

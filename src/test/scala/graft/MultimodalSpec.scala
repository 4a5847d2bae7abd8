package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal
import graft.tools.JdbcAdmin

class MultimodalSpec extends SparkSpec {

  test("media table carries binary content with typed metadata") {
    val media = Multimodal.withMetadata(Multimodal.mediaFromDocuments(spark, sf))
    val r = media.where(col("media_kind") === "image").limit(1).collect()(0)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") > 0)
    assert(meta.getAs[String]("content_md5").length == 32)
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 1920)
    assert(meta.isNullAt(meta.fieldIndex("duration_ms"))) // images have no duration
    val audio = media.where(col("media_kind") =!= "image").limit(1).collect()(0)
      .getAs[org.apache.spark.sql.Row]("meta")
    assert(!audio.isNullAt(audio.fieldIndex("duration_ms")))
  }

  test("fake decode produces fixed-dim unit-L1 feature vectors per partition batch") {
    val media = Multimodal.mediaFromDocuments(spark, sf).repartition(3)
    val feats = Multimodal.fakeDecodeFeatures(media)
    val row = feats.orderBy("media_id").limit(1).collect()(0)
    val v = row.getSeq[Float](row.fieldIndex("features")).toList
    assert(v.length == 16)
    assert(math.abs(v.sum - 1.0f) < 1e-3) // normalized histogram
    // deterministic: same content -> same features
    val row2 = Multimodal.fakeDecodeFeatures(media).orderBy("media_id").limit(1).collect()(0)
    val again = row2.getSeq[Float](row2.fieldIndex("features")).toList
    assert(v == again)
  }

  test("feature extraction stays inside the SQL engine (no RDD boundary)") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val plan = Multimodal.fakeDecodeFeatures(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      s"decode must not exit to RDDs:\n$plan")
    assert(plan.contains("byte_histogram"), s"expected the native expression:\n$plan")
    // null content -> null features (expression null semantics)
    import spark.implicits._
    val withNull = Seq((1L, "x".getBytes), (2L, null: Array[Byte]))
      .toDF("media_id", "content")
    val out = Multimodal.fakeDecodeFeatures(withNull).orderBy("media_id").collect()
    assert(out(0).getSeq[Float](out(0).fieldIndex("features")).nonEmpty)
    assert(out(1).isNullAt(out(1).fieldIndex("features")))
  }

  test("frame sampling slices real bytes: frames reassemble from the payload") {
    import spark.implicits._
    val frames = Multimodal.frameSample(spark, sf)
      .select("media_id", "frame_idx", "n_bytes", "frame_md5")
      .as[(Long, Int, Int, String)].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_._3 == 32), "every sampled frame is full-length")
    // reconstruct expected frames driver-side from the raw payloads
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.foreach { case (id, idx, _, got) =>
      val bytes = texts(id).getBytes("UTF-8").slice(idx * 64, idx * 64 + 32)
      val want = md.digest(bytes).map("%02x".format(_)).mkString
      assert(got == want, s"media $id frame $idx checksum mismatch")
    }
    // per-media frame indexes are contiguous from 0 and stride-bounded
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val idxs = fs.map(_._2).sorted.toSeq
      assert(idxs == (0 until fs.length), s"media $id frame indexes not contiguous")
      val len = texts(id).length
      assert(fs.length == (len - 32) / 64 + 1, s"media $id frame count")
    }
    // the oracle's VARCHAR slicing is only byte-exact for byte-pure
    // payloads, so the query self-scopes: multi-byte docs must be
    // excluded on the Spark side too (caught live by the
    // adversarial-corpus run before the scope filter existed)
    val pureIds = texts.filter { case (_, t) =>
      t.getBytes("UTF-8").length == t.codePointCount(0, t.length)
    }.keySet
    assert(frames.map(_._1).toSet.subsetOf(pureIds),
      "a multi-byte doc leaked into the byte-sliced oracle query")
  }
}

class JdbcAdminSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftadmin;create=true"

  test("execute/introspect/count/batch against a live database") {
    val admin = new JdbcAdmin(url)
    admin.execute("CREATE TABLE t1 (id INT NOT NULL PRIMARY KEY, name VARCHAR(20))")
    assert(!admin.executeIdempotent("CREATE TABLE t1 (id INT NOT NULL PRIMARY KEY)"))
    assert(admin.tableExists("T1")) // Derby uppercases identifiers
    assert(admin.columns("T1").map(_._1) == Seq("ID", "NAME"))
    admin.executeBatch(Seq(
      "INSERT INTO t1 VALUES (1, 'a')",
      "INSERT INTO t1 VALUES (2, 'b')"))
    assert(admin.countRows("t1") == 2)
    // distributed read back through spark.read.jdbc
    val df = admin.query(spark, "SELECT id, name FROM t1")
    assert(df.count() == 2)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name"))
  }

  test("config-driven bootstrap creates the walmart schema idempotently and verifies") {
    val admin = new JdbcAdmin("jdbc:derby:memory:graftboot;create=true")
    val cfg = GraftConfig.parse(
      """init:
        |  schemas: ods
        |  tables: ods.walmart_order
        |""".stripMargin)
    val boot = new graft.tools.DbBootstrap(admin,
      ddlFor = Map("ods.walmart_order" ->
        graft.model.WalmartOrderSchema.ansiDdl("ods", "walmart_order")))
    val r1 = boot.run(cfg)
    assert(r1.schemasCreated == Seq("ods") && r1.schemasExisting.isEmpty)
    assert(r1.tablesCreated == Seq("ods.walmart_order") && r1.tablesExisting.isEmpty)
    assert(r1.allVerified, s"verification failed: ${r1.verified}")
    // all 52 output columns landed
    assert(admin.columns("WALMART_ORDER").size ==
      graft.model.WalmartOrderSchema.outputColumns.size)
    // second run: idempotent — everything reported as already existing
    val r2 = boot.run(cfg)
    assert(r2.schemasCreated.isEmpty && r2.schemasExisting == Seq("ods"))
    assert(r2.tablesCreated.isEmpty && r2.tablesExisting == Seq("ods.walmart_order"))
    assert(r2.allVerified)
    assert(admin.countRows("ods.walmart_order") == 0)
  }

  test("verification is schema-scoped: a same-named decoy in another schema cannot verify") {
    val admin = new JdbcAdmin("jdbc:derby:memory:graftboot3;create=true")
    admin.executeIdempotent("CREATE SCHEMA decoys")
    admin.execute("CREATE TABLE decoys.mini (id INT)")
    // DDL deliberately creates the WRONG table, so target.mini never
    // exists — only the decoy could (wrongly) satisfy an unscoped probe
    val boot = new graft.tools.DbBootstrap(admin,
      ddlFor = Map("target.mini" -> "CREATE TABLE decoys.other (id INT)"))
    val r = boot.run(graft.tools.BootstrapPlan(Seq("target"), Seq("target.mini")))
    assert(r.verified("target.mini") == false,
      s"decoys.mini must not verify target.mini: ${r.verified}")
  }

  test("bootstrap resolves DDL from a sql dir by the reference's naming conventions") {
    val admin = new JdbcAdmin("jdbc:derby:memory:graftboot2;create=true")
    val dir = java.nio.file.Files.createTempDirectory("graft_sqldir")
    java.nio.file.Files.writeString(dir.resolve("create_mini.sql"),
      """-- mini table (comment-stripping + multi-statement split)
        |CREATE TABLE webapp.mini (
        |  id INT NOT NULL PRIMARY KEY, -- trailing comment
        |  name VARCHAR(20));
        |CREATE INDEX mini_name ON webapp.mini(name);
        |""".stripMargin)
    val boot = new graft.tools.DbBootstrap(admin, sqlDir = Some(dir.toString))
    // the reference honors its own 'scheam' typo key — so do we
    val cfg = GraftConfig.parse("init:\n  scheam: webapp\n  tables: webapp.mini\n")
    val r = boot.run(cfg)
    assert(r.schemasCreated == Seq("webapp"))
    assert(r.tablesCreated == Seq("webapp.mini") && r.allVerified)
    // unknown table with no DDL source fails loudly, not silently
    intercept[IllegalArgumentException] {
      boot.run(graft.tools.BootstrapPlan(Nil, Seq("webapp.missing")))
    }
  }
}

package graft.tools

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Environment smoke-check: "does the engine start here?"
  *
  * Spark-native analogue of the reference's environment report
  * (check_flink_environment.py:29-199): JVM/language versions, presence
  * of the key runtime classes, a tiny end-to-end job through the real
  * execution path, the embedded JDBC database, test data, and the
  * optional external-client jars — each as an OK / WARN / FAIL line in
  * a sectioned report. WARN marks optional pieces (a missing Kafka
  * client jar degrades features, it does not break the engine); any
  * FAIL means the environment cannot run graft.
  */
object EnvCheck {

  sealed trait Status { def symbol: String }
  case object Ok extends Status { val symbol = "✓" }
  case object Warn extends Status { val symbol = "⚠" }
  case object Fail extends Status { val symbol = "✗" }

  final case class Item(section: String, label: String, status: Status, details: String)

  private def classPresent(section: String, label: String, fqcn: String,
                           optional: Boolean = false): Item =
    try {
      Class.forName(fqcn)
      Item(section, label, Ok, fqcn)
    } catch {
      case _: Throwable if optional =>
        Item(section, label, Warn, s"$fqcn not on classpath (optional)")
      case e: Throwable =>
        Item(section, label, Fail, s"$fqcn: ${e.getClass.getSimpleName}")
    }

  private def attempt(section: String, label: String)(body: => String): Item =
    try Item(section, label, Ok, body)
    catch { case e: Throwable =>
      Item(section, label, Fail, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** Run every check against a live session. Pure data out; rendering
    * and process exit stay in [[main]] so tests can assert the shape. */
  def run(spark: SparkSession, dataRoot: String = "/root/testdata"): Seq[Item] = {
    val jvm = {
      val v = sys.props.getOrElse("java.version", "?")
      val ok = v.takeWhile(_.isDigit) match {
        case "" => false
        case major => major.toInt >= 17
      }
      Item("1. JVM", "Java version",
        if (ok) Ok else Fail,
        s"$v${if (ok) "" else " (Spark 4 requires Java 17+)"}")
    }
    val scalaV = {
      val v = scala.util.Properties.versionNumberString
      Item("1. JVM", "Scala version",
        if (v.startsWith("2.13")) Ok else Fail, v)
    }

    val classes = Seq(
      classPresent("2. Runtime classes", "SparkSession", "org.apache.spark.sql.SparkSession"),
      classPresent("2. Runtime classes", "Catalyst Expression", "org.apache.spark.sql.catalyst.expressions.Expression"),
      classPresent("2. Runtime classes", "RocksDB state store", "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      classPresent("2. Runtime classes", "Embedded Derby driver", "org.apache.derby.jdbc.EmbeddedDriver"),
      classPresent("2. Runtime classes", "graft native expressions", "graft.functions.RollingHash"))

    val runtime = Seq(
      attempt("3. Execution", "Spark version") {
        val v = spark.version
        require(v.startsWith("4."), s"expected Spark 4.x, got $v")
        v
      },
      attempt("3. Execution", "Tiny job (sum over range)") {
        val got = spark.range(1000).selectExpr("sum(id) AS s").head().getLong(0)
        require(got == 499500L, s"sum(0..999) returned $got")
        "sum(0..999) = 499500"
      },
      attempt("3. Execution", "Whole-stage codegen") {
        // exchange-free so the plan is not wrapped in AdaptiveSparkPlan
        // (AQE hides codegen spans until the stage is materialized)
        val plan = spark.range(100).selectExpr("id * 2 AS d")
          .queryExecution.executedPlan
        val spans = plan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }
        require(spans.nonEmpty, "no WholeStageCodegen span in plan")
        s"WholeStageCodegen active (${spans.size} span)"
      },
      attempt("3. Execution", "Streaming source resolution") {
        val schema = spark.readStream.format("rate").load().schema
        s"rate source resolves (${schema.fieldNames.mkString(", ")})"
      })

    val jdbc = attempt("4. Embedded JDBC", "Derby in-memory round-trip") {
      val url = "jdbc:derby:memory:graft_envcheck;create=true"
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        try st.executeUpdate("DROP TABLE envcheck") catch { case _: Throwable => () }
        st.executeUpdate("CREATE TABLE envcheck(id INT)")
        st.executeUpdate("INSERT INTO envcheck VALUES (1), (2)")
        val rs = st.executeQuery("SELECT count(*) FROM envcheck")
        rs.next()
        val n = rs.getInt(1)
        require(n == 2, s"expected 2 rows, got $n")
        "create + insert + count OK"
      } finally c.close()
    }

    val data = {
      val root = new java.io.File(dataRoot)
      if (!root.isDirectory)
        Seq(Item("5. Test data", "data root", Warn, s"$dataRoot absent (optional outside the sandbox)"))
      else {
        val sfs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("sf")).sortBy(_.getName)
        if (sfs.isEmpty)
          Seq(Item("5. Test data", "data root", Warn, s"no sf* dirs under $dataRoot"))
        else sfs.toSeq.map { d =>
          val tables = Option(d.listFiles()).getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet"))
          Item("5. Test data", d.getName,
            if (tables > 0) Ok else Fail, s"$tables parquet tables")
        }
      }
    }

    val optional = Seq(
      classPresent("6. Optional clients", "Kafka client (real broker)",
        "org.apache.kafka.clients.producer.KafkaProducer", optional = true),
      classPresent("6. Optional clients", "spark-sql-kafka connector",
        "org.apache.spark.sql.kafka010.KafkaSourceProvider", optional = true))

    Seq(jvm, scalaV) ++ classes ++ runtime ++ Seq(jdbc) ++ data ++ optional
  }

  def render(items: Seq[Item]): String = {
    val sb = new StringBuilder
    sb.append("=" * 70).append('\n')
    sb.append("  graft environment check\n")
    items.groupBy(_.section).toSeq.sortBy(_._1).foreach { case (section, xs) =>
      sb.append("=" * 70).append('\n').append(s"  $section\n")
      xs.foreach { i =>
        sb.append(f"${i.status.symbol} ${i.label}%-36s ${i.details}%n")
      }
    }
    sb.append("=" * 70).append('\n')
    val fails = items.count(_.status == Fail)
    val warns = items.count(_.status == Warn)
    sb.append(
      if (fails == 0) s"ENV OK (${items.size} checks, $warns warnings)\n"
      else s"ENV FAIL ($fails failing checks)\n")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val dataRoot = args.headOption.getOrElse("/root/testdata")
    val spark = GraftSession.local("graft-envcheck")
    val items = run(spark, dataRoot)
    print(render(items))
    spark.stop()
    if (items.exists(_.status == Fail)) sys.error("environment check FAILED")
  }
}

package graft

import graft.tools.EnvCheck
import graft.tools.EnvCheck.{Fail, Ok, Warn}

/** Report-shape contract for the environment smoke-check
  * (reference: check_flink_environment.py:29-199). */
class EnvCheckSpec extends SparkSpec {

  lazy val items: Seq[EnvCheck.Item] = EnvCheck.run(spark, "/root/testdata")

  test("all mandatory checks pass in this environment") {
    val fails = items.filter(_.status == Fail)
    assert(fails.isEmpty, s"failing checks: ${fails.mkString("; ")}")
  }

  test("every section of the reference report is covered") {
    val sections = items.map(_.section).distinct
    assert(sections.exists(_.contains("JVM")))
    assert(sections.exists(_.contains("Runtime classes")))
    assert(sections.exists(_.contains("Execution")))
    assert(sections.exists(_.contains("JDBC")))
    assert(sections.exists(_.contains("Test data")))
    assert(sections.exists(_.contains("Optional clients")))
  }

  test("optional kafka jars are WARN, never FAIL, when absent") {
    val kafka = items.filter(_.section.contains("Optional clients"))
    assert(kafka.size == 2)
    kafka.foreach(i => assert(i.status == Ok || i.status == Warn, i.toString))
  }

  test("the runtime section actually executed a job") {
    val job = items.find(_.label.contains("Tiny job")).get
    assert(job.status == Ok)
    assert(job.details.contains("499500"))
  }

  test("testdata scale factors are enumerated with table counts") {
    val sf = items.filter(_.section.contains("Test data"))
    assert(sf.exists(_.label == "sf0.001"))
    assert(sf.forall(_.status == Ok))
  }

  test("render produces the sectioned symbol report and the verdict line") {
    val out = EnvCheck.render(items)
    assert(out.contains("graft environment check"))
    assert(out.contains("✓"))
    assert(out.contains("ENV OK"))
    assert(!out.contains("ENV FAIL"))
  }

  test("a Fail item flips the verdict line") {
    val bad = items :+ EnvCheck.Item("9. X", "broken", Fail, "boom")
    assert(EnvCheck.render(bad).contains("ENV FAIL (1 failing checks)"))
  }
}

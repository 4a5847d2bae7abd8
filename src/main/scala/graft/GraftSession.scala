package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Plays the role of the reference's environment setup chain
  * (flink1_create_filnk_env.py:50-89 env creation,
  * flink3_add_parameter_to_flink.py:22-89 parallelism/checkpointing) —
  * re-expressed as Spark session configuration. Jar management
  * (flink2_add_jar_to_flink.py) is obsolete: dependencies live on the
  * classpath.
  *
  * Scale posture: shuffle partitions default to the local core count
  * (not 200); AQE is on so that at cluster scale the runtime re-plans
  * partition counts, skew joins, and broadcast decisions from actual
  * stage statistics.
  */
object GraftSession {

  /** Default thread/partition count, overridable via SPARK_GRAFT_CPUS. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      // FAIR task scheduling across concurrent jobs: with one query at
      // a time this is inert (a single job owns every slot either
      // way); during stageAll's all-at-once chain DAG it stops an
      // early-submitted chain's wide stage from starving the
      // critical-path chain's next stage of task slots (FIFO offers
      // slots strictly in job-submission order). A/B: PERF §36.
      // SPARK_GRAFT_SCHEDULER=FIFO restores the old behavior.
      .config("spark.scheduler.mode",
        sys.env.getOrElse("SPARK_GRAFT_SCHEDULER", "FAIR"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the driver-generated events table carries TIMESTAMP(NANOS)
      // which Spark's parquet reader only surfaces as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 4.1's async checksum file manager deadlocks state-store
      // commits under local-mode thread pools; plain checkpoint IO
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** Local session for tests/tools; cluster deployments pass their own
    * master via spark-submit and only inherit the SQL conf above.
    *
    * SPARK_GRAFT_MASTER overrides the master URL — the instrument
    * behind the multi-executor smoke runs (VERDICT r14 stretch #8):
    * `local-cluster[2,4,4096]` launches two real executor JVMs with
    * separate block managers and a real network shuffle, closing the
    * "local-mode artifact" caveat on scheduler/staging claims without
    * a cluster. Requires SPARK_HOME (+ worker JVMs inherit
    * spark.executor.memory from the bracket args). */
  def local(appName: String = "graft"): SparkSession = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = builder(appName).master(master)
    // local-cluster executors are SEPARATE JVMs launched by the
    // in-process worker: they inherit Spark's jars but not this
    // application's compiled classes, so ship our own code-source
    // directory (and SparkEntry's, identical in practice) on the
    // executor classpath — the one piece spark-submit --jars would
    // otherwise do
    if (master.startsWith("local-cluster")) {
      val codeSource = getClass.getProtectionDomain.getCodeSource
        .getLocation.getPath
      b.config("spark.executor.extraClassPath", codeSource): Unit
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.tools

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sources

/** Relational-database helper (SURVEY.md §2.10 ST8) — the reference's
  * unified_mysql.py surface on Spark + plain JDBC:
  * query→DataFrame, DML/DDL execution with retry, batch DML,
  * table introspection, counts.
  *
  * Queries go through `spark.read.jdbc` (distributed, pushdown-aware);
  * control statements use a short-lived driver-side connection — the
  * same split the reference makes between pandas reads and engine DDL.
  */
class JdbcAdmin(url: String, props: Map[String, String] = Map.empty,
                maxRetries: Int = 3, backoffMs: Long = 1000L) extends Serializable {

  /** Run `f` with a fresh connection. Connection acquisition retries
    * on any SQLException; statement execution retries ONLY on
    * transient/recoverable failures (deadlock, lock timeout,
    * connection drop) — deterministic statement errors (syntax,
    * missing object, constraint) propagate immediately so callers
    * aren't stalled through pointless backoff and non-idempotent DML
    * isn't blindly re-applied (unified_mysql.py:135-157 semantics). */
  private def withConnection[T](f: Connection => T): T = {
    var attempt = 0
    var result: Option[T] = None
    while (result.isEmpty) {
      val conn: Connection =
        try {
          val p = new java.util.Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          DriverManager.getConnection(url, p)
        } catch {
          case _: java.sql.SQLException if attempt < maxRetries =>
            attempt += 1; Thread.sleep(backoffMs * attempt); null
        }
      if (conn != null) {
        try result = Some(f(conn))
        catch {
          case _: java.sql.SQLTransientException |
               _: java.sql.SQLRecoverableException |
               _: java.sql.SQLTransactionRollbackException
              if attempt < maxRetries =>
            attempt += 1; Thread.sleep(backoffMs * attempt)
        } finally conn.close()
      }
    }
    result.get
  }

  /** query → DataFrame (unified_mysql.py:242-287). */
  def query(spark: SparkSession, sql: String): DataFrame =
    Sources.jdbc(spark, url, s"($sql) q", props)

  /** Whole-table read, optionally range-partitioned for parallelism. */
  def table(spark: SparkSession, name: String,
            partitionColumn: Option[String] = None,
            lowerBound: Long = 0, upperBound: Long = 0,
            numPartitions: Int = 1): DataFrame =
    Sources.jdbc(spark, url, name, props, partitionColumn, lowerBound, upperBound, numPartitions)

  /** Execute DML/DDL; returns update count (DDL → 0). Retries with
    * linear backoff (unified_mysql.py:135-157). */
  def execute(sql: String): Int = withConnection { c =>
    c.createStatement().executeUpdate(sql)
  }

  /** Transactional batch DML (unified_mysql.py:350-376). */
  def executeBatch(sqls: Seq[String]): Seq[Int] = withConnection { c =>
    c.setAutoCommit(false)
    try {
      val st = c.createStatement()
      sqls.foreach(st.addBatch)
      val counts = st.executeBatch().toSeq
      c.commit()
      counts
    } catch {
      case e: Throwable =>
        try c.rollback() catch { case _: java.sql.SQLException => () }
        throw e
    }
  }

  /** Idempotent DDL: tolerate "already exists"
    * (init_database_env.py:240-248). */
  def executeIdempotent(sql: String): Boolean =
    try { execute(sql); true }
    catch {
      // "already exists" only — "does not exist" must propagate
      case e: java.sql.SQLException
          if Option(e.getMessage).exists(m =>
            m.toLowerCase.contains("already exist")) => false
    }

  /** Table columns via JDBC metadata (DESCRIBE analogue,
    * unified_mysql.py introspection). */
  def columns(tableName: String): Seq[(String, String)] = columns(None, tableName)

  /** Column metadata, optionally restricted to one schema so a
    * same-named table in another schema cannot satisfy the probe. */
  def columns(schema: Option[String], tableName: String): Seq[(String, String)] =
    withConnection { c =>
      val rs = c.getMetaData.getColumns(null, schema.orNull, tableName, null)
      val b = scala.collection.mutable.ListBuffer.empty[(String, String)]
      while (rs.next()) b += rs.getString("COLUMN_NAME") -> rs.getString("TYPE_NAME")
      b.toList
    }

  def tableExists(tableName: String): Boolean = columns(tableName).nonEmpty

  /** COUNT(*) helper (unified_mysql.py:529-549). */
  def countRows(tableName: String): Long = withConnection { c =>
    val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $tableName")
    rs.next(); rs.getLong(1)
  }

  /** Backup = empty clone + INSERT..SELECT (unified_mysql.py backup).
    * The clone statement is dialect-specific: MySQL (the reference's
    * target engine) has no `WITH NO DATA` but does have
    * `CREATE TABLE .. LIKE` (which also preserves keys/indexes);
    * Derby/Postgres/standard engines take the ANSI CTAS form. */
  private[graft] def backupCloneSql(tableName: String, backupName: String): String =
    if (url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb"))
      s"CREATE TABLE $backupName LIKE $tableName"
    else
      s"CREATE TABLE $backupName AS SELECT * FROM $tableName WITH NO DATA"

  def backupTable(tableName: String, backupName: String): Unit = {
    execute(backupCloneSql(tableName, backupName))
    execute(s"INSERT INTO $backupName SELECT * FROM $tableName")
    ()
  }

  def truncate(tableName: String): Unit = { execute(s"TRUNCATE TABLE $tableName"); () }
}

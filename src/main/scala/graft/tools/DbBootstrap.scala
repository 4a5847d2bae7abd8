package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftConfig

/** What the bootstrap is asked to create: schema names plus
  * `schema.table` qualified table names (table_config.yml shape). */
final case class BootstrapPlan(schemas: Seq[String], tables: Seq[String])

/** What actually happened, split created-vs-already-existed (the
  * reference prints exactly this distinction), plus per-table
  * post-create verification. */
final case class BootstrapResult(
    schemasCreated: Seq[String], schemasExisting: Seq[String],
    tablesCreated: Seq[String], tablesExisting: Seq[String],
    verified: Map[String, Boolean]) {
  def allVerified: Boolean = verified.nonEmpty && verified.values.forall(identity)
}

/** Config-driven database bootstrap
  * (init_database_env.py:95-330 + table_config.yml): create the
  * configured schemas and tables idempotently and verify they exist.
  *
  * Config keys (the table_config.yml analogue in GraftConfig's flat
  * YAML subset — both the correct `schemas` spelling and the
  * reference's `scheam` typo are honored, as the reference itself
  * does, init_database_env.py:120-133):
  *
  * {{{
  * init:
  *   schemas: ods,dws
  *   tables: ods.walmart_order
  * }}}
  *
  * DDL resolution per table, in order: the in-code registry (`ddlFor`,
  * e.g. WalmartOrderSchema.ansiDdl), then `sqlDir` files by the
  * reference's naming conventions (`schema.table.sql`,
  * `create_table.sql`, `table.sql` — init_database_env.py:160-186).
  * Statements are comment-stripped, split on `;`, and applied through
  * JdbcAdmin.executeIdempotent ("already exists" tolerated, real
  * errors propagate — :240-248).
  */
class DbBootstrap(admin: JdbcAdmin, sqlDir: Option[String] = None,
                  ddlFor: Map[String, String] = Map.empty) {

  def plan(cfg: GraftConfig): BootstrapPlan = {
    def csv(k: String): Seq[String] =
      cfg.getOrElse(k, "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    BootstrapPlan(
      (csv("init.schemas") ++ csv("init.scheam")).distinct,
      csv("init.tables").distinct)
  }

  /** The reference's three file-naming conventions
    * (init_database_env.py:160-186). */
  private[tools] def findSqlFile(qualified: String): Option[String] =
    sqlDir.flatMap { dir =>
      val table = qualified.split("\\.", 2).last
      Seq(s"$qualified.sql", s"create_$table.sql", s"$table.sql")
        .map(n => Paths.get(dir, n))
        .find(Files.exists(_))
        .map(_.toString)
    }

  /** Comment-strip + split on `;` (init_database_env.py:206-224). */
  private[tools] def statements(sql: String): Seq[String] =
    sql.linesIterator.map { line =>
      val i = line.indexOf("--")
      if (i >= 0) line.substring(0, i) else line
    }.mkString("\n").split(";").map(_.trim).filter(_.nonEmpty).toSeq

  private def ddlOf(qualified: String): String =
    ddlFor.get(qualified)
      .orElse(findSqlFile(qualified).map(f => Files.readString(Paths.get(f))))
      .getOrElse(throw new IllegalArgumentException(
        s"no DDL for table '$qualified': not in the registry and no sql file " +
          s"under ${sqlDir.getOrElse("<no sqlDir>")}"))

  /** Post-create verification: the table answers a metadata or count
    * probe (init_database_env.py table_exists, :204-213). */
  private def tableVerified(qualified: String): Boolean = {
    val parts = qualified.split("\\.", 2)
    val (schema, t) =
      if (parts.length == 2) (Some(parts(0)), parts(1)) else (None, parts(0))
    // metadata probe scoped to the table's own schema — a same-named
    // table elsewhere must not vacuously verify this one
    admin.columns(schema, t).nonEmpty ||
      admin.columns(schema.map(_.toUpperCase), t.toUpperCase).nonEmpty ||
      (try { admin.countRows(qualified) >= 0L }
       catch { case _: java.sql.SQLException => false })
  }

  def run(cfg: GraftConfig): BootstrapResult = run(plan(cfg))

  def run(p: BootstrapPlan): BootstrapResult = {
    val (sc, se) = p.schemas.partition(s => admin.executeIdempotent(s"CREATE SCHEMA $s"))
    val (tc, te) = p.tables.partition { q =>
      // "created" when any statement newly applied; a rerun where
      // everything already exists reports the table as existing
      statements(ddlOf(q)).map(admin.executeIdempotent).exists(identity)
    }
    BootstrapResult(sc, se, tc, te,
      p.tables.map(q => q -> tableVerified(q)).toMap)
  }
}

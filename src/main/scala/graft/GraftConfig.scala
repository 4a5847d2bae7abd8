package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Minimal config loader (SURVEY.md §7.1 item 1 — the reference's
  * YAML merge, config/config.py:23-66): a flat YAML subset
  * (`key: value` with one level of indentation-based nesting,
  * comments, quoted strings) flattened to dotted keys, with
  * defaults-then-overrides merge and environment-variable overlay.
  * No external dependencies — the offline build has none to offer.
  */
final case class GraftConfig(values: Map[String, String]) {
  def get(key: String): Option[String] = values.get(key)
  def apply(key: String): String = values(key)
  def getOrElse(key: String, default: String): String = values.getOrElse(key, default)
  def getInt(key: String, default: Int): Int =
    values.get(key).flatMap(_.toIntOption).getOrElse(default)
  def getLong(key: String, default: Long): Long =
    values.get(key).flatMap(_.toLongOption).getOrElse(default)
  def getBoolean(key: String, default: Boolean): Boolean =
    values.get(key).flatMap(_.toBooleanOption).getOrElse(default)
  /** Sub-config of every key under `prefix.` (prefix stripped). */
  def section(prefix: String): Map[String, String] =
    values.collect { case (k, v) if k.startsWith(prefix + ".") =>
      k.stripPrefix(prefix + ".") -> v }
  /** Later wins — the reference's default-merge-override semantics. */
  def ++(other: GraftConfig): GraftConfig = GraftConfig(values ++ other.values)
}

object GraftConfig {

  def empty: GraftConfig = GraftConfig(Map.empty)

  /** Parse the flat YAML subset: `section:` headers, 2-space indented
    * `key: value` pairs, full-line and trailing comments, single/double
    * quoted values. */
  def parse(text: String): GraftConfig = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    text.linesIterator.foreach { raw =>
      val noComment =
        if (raw.trim.startsWith("#")) ""
        else raw.replaceAll("""\s+#.*$""", "")
      if (noComment.trim.nonEmpty && noComment.contains(":")) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val Array(k, rest @ _*) = noComment.split(":", 2)
        val v = rest.headOption.getOrElse("").trim
        val key = k.trim
        if (v.isEmpty && !indented) {
          section = key
        } else {
          val unquoted =
            if ((v.startsWith("\"") && v.endsWith("\"") && v.length >= 2) ||
                (v.startsWith("'") && v.endsWith("'") && v.length >= 2))
              v.substring(1, v.length - 1)
            else v
          val full = if (indented && section.nonEmpty) s"$section.$key" else key
          out += full -> unquoted
        }
      }
    }
    GraftConfig(out.toMap)
  }

  def load(path: String): GraftConfig =
    parse(Files.readString(Paths.get(path)))

  /** Merge: defaults first, then each override file, then env vars
    * with the given prefix (GRAFT_KAFKA_BOOTSTRAP_SERVERS →
    * kafka.bootstrap_servers).
    *
    * Section/key split: a double underscore, if present, is the
    * explicit separator (GRAFT_MY_SECTION__KEY → my_section.key — the
    * only way to address a section whose name itself contains an
    * underscore); otherwise the FIRST underscore splits, so plain
    * single-level sections work unadorned. */
  def resolve(defaultPath: Option[String] = None,
              overridePaths: Seq[String] = Nil,
              envPrefix: String = "GRAFT_",
              env: Map[String, String] = sys.env): GraftConfig = {
    val base = defaultPath.filter(p => Files.exists(Paths.get(p)))
      .map(load).getOrElse(empty)
    val withFiles = overridePaths.filter(p => Files.exists(Paths.get(p)))
      .foldLeft(base)((c, p) => c ++ load(p))
    val envConf = GraftConfig(env.collect {
      case (k, v) if k.startsWith(envPrefix) =>
        val body = k.stripPrefix(envPrefix).toLowerCase
        val key =
          if (body.contains("__")) {
            val i = body.indexOf("__")
            body.substring(0, i) + "." + body.substring(i + 2)
          } else body.replaceFirst("_", ".")
        key -> v
    })
    withFiles ++ envConf
  }
}

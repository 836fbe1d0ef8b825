package graft.core

import java.time.{Duration, Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Execution environment, mirroring the reference's
  * `DBT_CLOUD_INVOCATION_CONTEXT` env var ('' | 'dev' | 'ci').
  * Ref: macros/generate_schema_name.sql:5-11, macros/utils/log_helpers.sql:78-79.
  */
sealed trait Env { def isDevCi: Boolean = this == Env.Dev || this == Env.Ci }
object Env {
  case object Prod extends Env
  case object Dev extends Env
  case object Ci extends Env
  /** Parse like the reference: lowercase compare against 'dev'/'ci', anything
    * else (incl. empty) is prod. Ref: log_helpers.sql:78-79. */
  def fromContext(ctx: String): Env = Option(ctx).map(_.toLowerCase) match {
    case Some("dev") => Dev
    case Some("ci")  => Ci
    case _           => Prod
  }
}

/** 3-part relation name, the reference's BigQuery `project.dataset.table`.
  * Ref: macros/utils/log_helpers.sql:4-6, macros/product_registration/helpers.sql:7-11. */
final case class TableId(database: String, schema: String, identifier: String) {
  def fqn: String = s"$database.$schema.$identifier"
}

/** Model coordinates from the dbt node FQN `[domain, group, layer, name]` plus
  * optional version. Ref: macros/utils/log_helpers.sql:90-95,
  * macros/generate_schema_name.sql:15-16. */
final case class ModelRef(
    domain: String,
    group: String,
    layer: String,
    name: String,
    version: Option[String] = None)

/** Config resolution with meta-over-top-level precedence.
  * Ref: macros/utils/config_helpers.sql:2-15 (`get_config_or_meta`). */
final case class ModelConfig(
    top: Map[String, Any] = Map.empty,
    meta: Map[String, Any] = Map.empty) {
  /** meta[key] wins over top-level config[key], else default. Only a present,
    * non-null meta value shadows the top-level one. */
  def getOrMeta(key: String, default: Any = null): Any =
    meta.get(key).filter(_ != null)
      .orElse(top.get(key).filter(_ != null))
      .getOrElse(default)
  def getString(key: String): Option[String] =
    Option(getOrMeta(key)).map(_.toString).filter(_.nonEmpty)
  def getInt(key: String): Option[Int] =
    Option(getOrMeta(key)).map(_.toString.toInt)
}

/** Environment-aware naming policy (schema / alias / deployed-relation).
  * Ref: macros/generate_schema_name.sql, macros/generate_alias_name.sql,
  * macros/product_registration/helpers.sql:26-53. */
object Naming {

  /** Schema (dataset) generation. Ref: generate_schema_name.sql:1-24.
    * ci -> the target's default schema; dev -> dbt_cloud_user_<id>;
    * prod -> <domain>_<group> for layer 'dataproduct', else
    * <domain>_<group>_curated. (`project_name` in the reference is the dbt
    * project, i.e. the domain.) */
  def schemaFor(env: Env, ref: ModelRef, defaultSchema: String, userId: String = ""): String =
    env match {
      case Env.Ci   => defaultSchema
      case Env.Dev  => s"dbt_cloud_user_$userId"
      case Env.Prod =>
        if (ref.layer == "dataproduct") s"${ref.domain}_${ref.group}"
        else s"${ref.domain}_${ref.group}_curated"
    }

  /** Jinja `trim('.0')`: strip any of the characters '.' and '0' from BOTH
    * ends. Notable consequences (ref generate_alias_name.sql:5-9):
    * "1.0"->"1", "2.0"->"2", "10.0"->"1" (trailing '0','.','0' stripped; the
    * leading '1' survives), and a post-trim "1" suppresses the suffix. */
  private[core] def trimDotZero(v: String): String = {
    val chars = Set('.', '0')
    var s = v
    while (s.nonEmpty && chars(s.head)) s = s.tail
    while (s.nonEmpty && chars(s.last)) s = s.init
    s
  }

  /** Alias generation. Ref: generate_alias_name.sql:1-26.
    * Precedence: custom alias (whitespace-trimmed) | name_v<version with
    * '.' -> '-'> | plain name. Version comes from the dataproduct config's
    * `version` (with the trim('.0') quirk; post-trim "1" means no suffix)
    * else the node version (used verbatim). */
  def aliasFor(ref: ModelRef, dataproductVersion: Option[String] = None,
               customAlias: Option[String] = None): String = {
    val v: Option[String] = dataproductVersion.filter(_.nonEmpty) match {
      case Some(dv) =>
        val t = trimDotZero(dv)
        if (t == "1") Some("") else Some(t)
      case None => ref.version.filter(_.nonEmpty)
    }
    customAlias.map(_.trim).filter(_.nonEmpty) match {
      case Some(c) => c
      case None =>
        v.filter(_.nonEmpty) match {
          case Some(ver) => s"${ref.name}_v${ver.replace(".", "-")}"
          case None      => ref.name
        }
    }
  }

  /** In dev/ci, rewrite the schema to the production schema derived from the
    * FQN so validation compares against deployed state; in prod return the
    * relation unchanged. Ref: product_registration/helpers.sql:26-53. */
  def deployedRelation(env: Env, rel: TableId, ref: ModelRef): TableId =
    if (!env.isDevCi) rel
    else {
      val domain = ref.domain.toLowerCase
      val group = ref.group.toLowerCase
      ref.layer.toLowerCase match {
        case "curated"     => rel.copy(schema = s"${domain}_${group}_curated")
        case "dataproduct" => rel.copy(schema = s"${domain}_${group}")
        case _             => rel
      }
    }

  /** Derive the log-table id and friends for a relation.
    * Ref: macros/utils/log_helpers.sql:2-18 (`bq_ids_for_relation`):
    * log table = <project>.<domain>_dbt_raw.<domain>_dbt_event_log. */
  def logTableFor(rel: TableId, domain: String): TableId =
    TableId(rel.database, s"${domain}_dbt_raw", s"${domain}_dbt_event_log")
}

/** The reference's timestamp-string contract:
  * '%Y-%m-%d %H:%M:%S.%f UTC' (microsecond precision, literal ' UTC').
  * Ref: log_helpers.sql:77 (default '1900-01-01 00:00:00.000000 UTC'),
  * :112,:166,:226-233,:271. Centralized here per SURVEY §7 risk 2. */
object Ts {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'")
  val Default = "1900-01-01 00:00:00.000000 UTC"

  def parse(s: String): Instant =
    LocalDateTime.parse(s, fmt).toInstant(ZoneOffset.UTC)
  def format(i: Instant): String =
    LocalDateTime.ofInstant(i, ZoneOffset.UTC).format(fmt)
  def plusDays(s: String, days: Int): String =
    format(parse(s).plus(Duration.ofDays(days)))
  def minusMicros(s: String, micros: Long): String =
    format(parse(s).minusNanos(micros * 1000L))
  /** Lowest of a list of timestamp strings; blanks/nulls are dropped.
    * Pure-Scala equivalent of get_lowest_string_timestamp
    * (log_helpers.sql:255-278) — no cluster roundtrip needed. */
  def lowest(ts: Seq[String]): Option[String] =
    ts.filter(t => t != null && t.trim.nonEmpty && t != "None")
      .map(parse).minOption.map(format)
  /** Ref: log_helpers.sql:281-304. */
  def highest(ts: Seq[String]): Option[String] =
    ts.filter(t => t != null && t.trim.nonEmpty && t != "None")
      .map(parse).maxOption.map(format)
}

/** History-load limiting: cap window_end at window_start + N days.
  * Ref: macros/utils/log_helpers.sql:213-252. */
object HistoryLimit {

  /** Ref: apply_history_load_limit (log_helpers.sql:213-238).
    * dev/ci default to a 1-day cap, overridable via maxDaysDevCi; the cap only
    * applies when a positive day count and a window start are present. */
  def apply(maxDays: Option[Int], windowStart: Option[String], windowEnd: String,
            env: Env, maxDaysDevCi: Option[Int] = None): String = {
    if (maxDays.isEmpty && maxDaysDevCi.isEmpty) return windowEnd
    val loadDays =
      if (env.isDevCi) maxDaysDevCi.getOrElse(1)
      else maxDays.getOrElse(0)
    windowStart match {
      case Some(start) if loadDays > 0 =>
        val maxLoadEnd = Ts.parse(start).plus(Duration.ofDays(loadDays))
        if (maxLoadEnd.isBefore(Ts.parse(windowEnd))) Ts.format(maxLoadEnd)
        else windowEnd
      case _ => windowEnd
    }
  }

  /** Ref: apply_history_load_limit_adjusted (log_helpers.sql:241-252):
    * apply the day cap, then additionally cap at a configured
    * `table_window_end` if present. */
  def adjusted(maxDays: Option[Int], windowStart: Option[String], windowEnd: String,
               env: Env, tableWindowEnd: Option[String],
               maxDaysDevCi: Option[Int] = None): String = {
    val capped = apply(maxDays, windowStart, windowEnd, env, maxDaysDevCi)
    tableWindowEnd match {
      case Some(twe) => Ts.lowest(Seq(capped, twe)).getOrElse(capped)
      case None      => capped
    }
  }
}

/** `'` -> `\'` and `"` -> `\"` escaping for literal embedding.
  * Ref: macros/utils/quote_replace.sql. */
object QuoteReplace {
  def apply(s: String): String =
    s.replace("'", "\\'").replace("\"", "\\\"")
}

package graft.registry

import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.core.{Env, ModelRef, Naming, TableId}
import graft.warehouse.{SchemaPaths, Warehouse}

/** The `dataproduct` model config block + model-level metadata the
  * governance macros consume (validate_dataproduct.sql:5-27,
  * register_dataproduct_metadata.sql:3-28). */
final case class DataproductConfig(
    owner: Option[String] = None,
    displayName: Option[String] = None,
    previewWhereClause: Option[String] = None,
    version: Option[String] = None,
    versionDescription: Option[String] = None)

final case class ModelMeta(
    description: Option[String] = None,
    columnDescriptions: Map[String, String] = Map.empty,
    labels: Map[String, String] = Map.empty)

/** One row of the dataproducts catalog (SURVEY §1.4;
  * register_dataproduct_metadata.sql:110-131). */
final case class BqRef(datasetId: String, tableId: String)
final case class ColumnMeta(field_path: String, data_type: String, description: String)
final case class LabelKV(key: String, value: String)
final case class DataproductEntry(
    id: String,
    description: String,
    name: String,
    domain: String,
    dataproductGroup: String,
    bigquery: BqRef,
    dbtId: String,
    owner: String,
    registeredTime: Timestamp,
    lastUpdateTime: Timestamp,
    columns: Seq[ColumnMeta],
    labels: Seq[LabelKV],
    rowCount: Option[Long],
    sizeInBytes: Option[Long],
    previewWhereClause: Option[String],
    version: Option[String],
    versionDescription: Option[String])

/** Typed governance failures (C1-C6) with the reference's messages. */
final class ValidationException(msg: String) extends RuntimeException(msg)

/** The dataproducts catalog: `dataplatform_internal.dataproducts`
  * (validate_dataproduct.sql:57, register_dataproduct_metadata.sql:89). */
final class Registry(wh: Warehouse, spark: SparkSession, project: String = "proj") {
  import spark.implicits._

  val catalogTable: TableId = TableId(project, "dataplatform_internal", "dataproducts")

  def readCatalog(): DataFrame =
    if (wh.exists(catalogTable)) wh.read(catalogTable)
    else spark.emptyDataset[DataproductEntry].toDF()

  /** C4 — struct-equality membership check (validate_dataproduct.sql:54-64). */
  def isRegistered(deployed: TableId): Boolean =
    wh.exists(catalogTable) &&
      readCatalog()
        .filter($"bigquery.datasetId" === deployed.schema &&
          $"bigquery.tableId" === deployed.identifier)
        .limit(1).count() > 0

  def entryFor(deployed: TableId): Option[DataproductEntry] =
    if (!wh.exists(catalogTable)) None
    else readCatalog()
      .filter($"bigquery.datasetId" === deployed.schema &&
        $"bigquery.tableId" === deployed.identifier)
      .as[DataproductEntry].collect().headOption

  /** C7 — gather metadata and C8 — upsert the catalog entry
    * (register_dataproduct_metadata.sql:1-135). Set-based MERGE semantics
    * like the reference's (`:89-132`): matched keeps registeredTime and
    * updates everything else; not-matched inserts with registeredTime=now.
    * The resolve is an anti-join + union staged through a temp table and
    * rename-swapped (Spark cannot overwrite a path it is reading) — the
    * only driver-side read is the bounded 1-row registeredTime lookup. */
  def register(
      df: DataFrame,
      rel: TableId,
      ref: ModelRef,
      cfg: DataproductConfig,
      meta: ModelMeta,
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): DataproductEntry = {

    val columns = SchemaPaths.flatten(df.schema).map { case (path, dt) =>
      ColumnMeta(path, dt, meta.columnDescriptions.getOrElse(path, ""))
    }
    val labels = meta.labels.toSeq.sortBy(_._1).map { case (k, v) => LabelKV(k, v) }
    val (rowCount, sizeBytes) =
      if (wh.exists(rel)) { val (r, s) = wh.sizeInfo(rel); (Some(r), Some(s)) }
      else (None, None)

    val ts = now()
    val existing = entryFor(TableId(rel.database, rel.schema, rel.identifier))
    val entry = DataproductEntry(
      id = Registry.md5Hex(s"${rel.schema}-${ref.name}"),
      description = meta.description.getOrElse(""),
      name = cfg.displayName.getOrElse(ref.name),
      domain = ref.domain,
      dataproductGroup = ref.group,
      bigquery = BqRef(rel.schema, rel.identifier),
      dbtId = s"model.${ref.domain}.${ref.name}",
      owner = cfg.owner.getOrElse(""),
      registeredTime = existing.map(_.registeredTime).getOrElse(ts),
      lastUpdateTime = ts,
      columns = columns,
      labels = labels,
      rowCount = rowCount,
      sizeInBytes = sizeBytes,
      previewWhereClause = cfg.previewWhereClause,
      version = cfg.version,
      versionDescription = cfg.versionDescription)

    if (!wh.exists(catalogTable)) {
      wh.overwrite(catalogTable, Seq(entry).toDF())
    } else {
      // Null-safe equality: a plain === makes the conjunction NULL for
      // catalog rows with a NULL bigquery key, and NULL filters as false —
      // silently deleting those rows. The reference MERGE keeps unmatched
      // target rows unconditionally (register_dataproduct_metadata.sql:89-132).
      val others = readCatalog()
        .filter(!($"bigquery.datasetId" <=> entry.bigquery.datasetId &&
          $"bigquery.tableId" <=> entry.bigquery.tableId))
      val tmp = catalogTable.copy(identifier = catalogTable.identifier + "__upsert_tmp")
      wh.overwrite(tmp, others.unionByName(Seq(entry).toDF()))
      wh.rename(tmp, catalogTable)
    }
    entry
  }
}
object Registry {
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}

/** C1-C6 — dataproduct validation (validate_dataproduct.sql:1-131). */
final class Validator(registry: Registry, wh: Warehouse) {

  private def fail(msg: String): Nothing = throw new ValidationException(msg)

  /** C6 — 2-4 dot-separated numeric parts (validate_dataproduct.sql:120-131). */
  def validateSemanticVersioning(v: String): Unit = {
    val parts = v.split("\\.", -1)
    if (parts.length > 4 || parts.length < 2)
      fail("Version string portion was too short or too long. Use format: major.minor.(build).(revision)")
    parts.foreach { p =>
      if (p.isEmpty || !p.forall(_.isDigit))
        fail(s"each part of version must be a number. '$p' is not a number")
    }
  }

  /** C2 — dry-run the preview clause; Catalyst ANALYSIS is the validation
    * (validate_dataproduct.sql:39-43): no job runs, only plan resolution. */
  def validatePreviewWhereClause(df: DataFrame, clause: String): Unit =
    try df.filter(expr(clause)).queryExecution.analyzed
    catch {
      case e: Exception => fail(s"Invalid previewWhereClause '$clause': ${e.getMessage}")
    }

  /** C1 — full orchestration (validate_dataproduct.sql:1-37). */
  def validate(
      df: DataFrame,
      rel: TableId,
      ref: ModelRef,
      env: Env,
      cfg: Option[DataproductConfig],
      meta: ModelMeta): Unit = {
    val deployed = Naming.deployedRelation(env, rel, ref)
    val isRegistered = registry.isRegistered(deployed)
    val isDataproduct = cfg.isDefined

    if (isRegistered && !isDataproduct) fail("Can't unregister dataproduct.")
    if (!isDataproduct) return

    val c = cfg.get
    if (c.owner.forall(_.trim.isEmpty)) fail("Dataproduct owner must be set")
    c.previewWhereClause.filter(_.nonEmpty).foreach(validatePreviewWhereClause(df, _))
    c.version.filter(_.nonEmpty).foreach(validateSemanticVersioning)

    // C3 — dataset placement (validate_dataproduct.sql:45-52)
    if (deployed.schema.split("_").last == "curated")
      fail("Models for registered dataproducts must be in a subfolder called " +
        "dataproduct under your dataproductgroup. e.g: models/example/dataproduct/mymodel.sql")

    if (meta.description.forall(_.trim.isEmpty)) fail("Dataproducts must have a description")

    // C5 — no column deletion for registered products (STRUCT-typed columns
    // exempt) + every column needs a description (validate_dataproduct.sql:66-118)
    val newCols = SchemaPaths.flatten(df.schema)
    if (isRegistered && wh.exists(deployed)) {
      val oldCols = SchemaPaths.flatten(wh.read(deployed).schema)
      val newSet = newCols.toSet
      // the reference exempts any dtype CONTAINING a struct/record
      // (validate_dataproduct.sql:96) — array<struct<...>> included
      val missing = oldCols.filterNot(newSet.contains)
        .filterNot { case (_, dt) => dt.contains("struct") }
      if (missing.nonEmpty)
        fail("Schema of registered dataproduct can't be changed. Missing columns: " +
          missing.map(_._1).mkString(", "))
    }
    newCols.foreach { case (path, _) =>
      if (!meta.columnDescriptions.get(path).exists(_.trim.nonEmpty))
        fail(s"Dataproduct columns must have a description, missing description for $path")
    }
  }
}

package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.TableId
import graft.warehouse.Warehouse

/** DSv2 catalog over the graft warehouse: `SELECT * FROM
  * graft.db.schema.table` (catalog `graft`, 2-level namespace matching the
  * warehouse's 3-part TableId) plans straight to a parquet scan of the
  * table's directory — filter pushdown, column pruning, and `part_date`
  * partition pruning all apply, and the schema comes from the warehouse's
  * authoritative `_schema` sidecar (via `Warehouse.read`, which also heals
  * any interrupted partition swap before Spark lists files).
  *
  * Registered by GraftSession as `spark.sql.catalog.graft`; the warehouse
  * root is read per-query from `spark.graft.warehouse.root` (the same conf
  * the SQL MERGE surface uses) so one session can point at different
  * warehouses over its lifetime — catalog instances are cached by Spark,
  * static options are not re-read.
  *
  * Writes go through the materializations (the reference's model is
  * "models write, SQL reads"); DDL here is limited to DROP and RENAME,
  * which map to the warehouse's own operations.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def session: SparkSession = SparkSession.active

  private def warehouse(): Warehouse = {
    val root = session.conf.getOption(GraftMergeInto.RootConf).getOrElse(
      throw new IllegalStateException(
        s"set ${GraftMergeInto.RootConf} before querying the '$catalogName' catalog"))
    new Warehouse(root, session)
  }

  private def tableId(ident: Identifier): TableId = {
    if (ident.namespace().length != 2)
      throw new NoSuchTableException(ident)
    TableId(ident.namespace()(0), ident.namespace()(1), ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 2) throw new NoSuchNamespaceException(namespace)
    val wh = warehouse()
    val dir = new Path(s"${wh.root}/${namespace.mkString("/")}")
    val fs = dir.getFileSystem(session.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val wh = warehouse()
    val id = tableId(ident)
    if (!wh.exists(id)) throw new NoSuchTableException(ident)
    // sidecar-resolved schema (one footer, drift-tolerant) + heal-on-read
    val schema = wh.read(id).schema
    ParquetTable(ident.toString, session, CaseInsensitiveStringMap.empty(),
      Seq(wh.pathOf(id)), Some(schema), classOf[ParquetFileFormat])
  }

  override def dropTable(ident: Identifier): Boolean = {
    val wh = warehouse()
    val id = tableId(ident)
    if (!wh.exists(id)) false
    else { wh.drop(id); true }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val wh = warehouse()
    if (!wh.exists(tableId(from))) throw new NoSuchTableException(from)
    wh.rename(tableId(from), tableId(to))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName catalog: ALTER TABLE is not supported — schema evolution " +
        "flows through the materializations' on_schema_change handling")
}

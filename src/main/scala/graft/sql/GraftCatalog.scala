package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
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
  * Writes: UNpartitioned tables accept `INSERT INTO` (v2 parquet append —
  * the same layout `Warehouse.append` produces); PARTITIONED tables are
  * read-only through the catalog and take writes via `MERGE INTO` and the
  * materializations (the reference's model is "models write, SQL reads").
  * DDL is limited to DROP and RENAME, which map to the warehouse's own
  * operations.
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
      .map(_.getPath.getName)
      // the warehouse's RESERVED sibling dirs are not tables: the
      // persistent `<table>__takedown` guard root and the transient
      // staged-rewrite / backup dirs of the rename and delete
      // protocols would otherwise surface as phantom tables in SHOW
      // TABLES — and loadTable on the guard root fails outright, it
      // holds no parquet (r17 ADVICE low)
      .filterNot(n => GraftCatalog.ReservedSuffixes.exists(n.endsWith))
      .map(Identifier.of(namespace, _))
  }

  override def loadTable(ident: Identifier): Table = {
    val wh = warehouse()
    val id = tableId(ident)
    if (!wh.exists(id)) throw new NoSuchTableException(ident)
    // sidecar-resolved schema (one footer, drift-tolerant) + heal-on-read
    val schema = wh.read(id).schema
    val pt = ParquetTable(ident.toString, session, CaseInsensitiveStringMap.empty(),
      Seq(wh.pathOf(id)), Some(schema), classOf[ParquetFileFormat])
    // UNpartitioned tables (the append/log family) take INSERT INTO via
    // the v2 parquet write — new part files in the table dir, exactly the
    // layout Warehouse.append produces. PARTITIONED tables are read-only
    // here: a v2 append would write `part_date` as a data column into the
    // table root, corrupting the directory layout — their write path is
    // MERGE INTO (and the materializations), which rewrites whole
    // partition dirs under the crash-safe swap protocol.
    if (wh.readPartitionMeta(id).isDefined) new GraftReadOnlyTable(pt) else pt
  }

  /** CREATE TABLE / CTAS for UNpartitioned tables: materialize the
    * `_schema` sidecar (zero-row table — the reference's empty-batch
    * first run), then the v2 parquet append fills it (Spark's non-staged
    * CTAS = createTable + write). PARTITIONED BY is rejected: partitioned
    * tables are built by the materializations, whose writes go through
    * the crash-safe swap protocol. */
  override def createTable(
      ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"$catalogName catalog: PARTITIONED BY is not supported in CREATE TABLE — " +
          "partitioned tables are created by the materializations / MERGE path")
    // USING <format> / LOCATION / TBLPROPERTIES arrive via `properties`;
    // silently discarding them would create a parquet table in the
    // warehouse while the user believes their clause took effect
    val unsupported = properties.keySet().toArray(Array.empty[String])
      .filterNot(k => k == "provider" && "parquet".equalsIgnoreCase(properties.get(k)))
      .filterNot(_ == "owner") // Spark attaches the session user automatically
    if (unsupported.nonEmpty)
      throw new UnsupportedOperationException(
        s"$catalogName catalog: CREATE TABLE options not supported here: " +
          s"${unsupported.mkString(", ")} — tables are parquet in the warehouse root")
    val wh = warehouse()
    val id = tableId(ident)
    if (wh.exists(id))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    wh.createEmpty(id, StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable))))
    loadTable(ident)
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

object GraftCatalog {
  /** Directory-name suffixes the warehouse reserves for non-table
    * siblings: the standing-takedown guard root (persistent) and the
    * staged-rewrite / swap-backup dirs of rename, deleteRows, the
    * sync_all_columns rewrite, and the log/denylist compacts
    * (transient crash wreckage). None of them is a queryable table. */
  private[sql] val ReservedSuffixes = Seq(
    "__takedown", "__replaced", "__delete_tmp", "__sync_tmp",
    "__compact_tmp", "__edna_tmp")
}

/** Read-only view of a partitioned warehouse table: scans delegate to the
  * parquet table, but SupportsWrite is deliberately NOT implemented, so
  * `INSERT INTO` fails at analysis ("does not support append in batch
  * mode") instead of corrupting the partition layout. */
private[sql] class GraftReadOnlyTable(delegate: ParquetTable)
  extends Table with SupportsRead {
  override def name(): String = delegate.name
  override def schema(): StructType = delegate.schema
  override def partitioning(): Array[Transform] = delegate.partitioning()
  override def properties(): java.util.Map[String, String] = delegate.properties()
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = new java.util.HashSet[TableCapability](delegate.capabilities())
    caps.remove(TableCapability.BATCH_WRITE)
    caps.remove(TableCapability.STREAMING_WRITE)
    caps.remove(TableCapability.TRUNCATE)
    caps.remove(TableCapability.OVERWRITE_BY_FILTER)
    caps.remove(TableCapability.OVERWRITE_DYNAMIC)
    java.util.Collections.unmodifiableSet(caps)
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)
}

package graft.sql

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.TableId
import graft.materialize.{MergeConfig, MergeIntoPartitioned}
import graft.warehouse.Warehouse

/** SQL surface for the partitioned MERGE — the reference's user API is
  * "write SQL" (incremental_partition_merge.sql renders a BigQuery MERGE
  * statement; README.md:283). Registered via SparkSessionExtensions
  * (`spark.sql.extensions=graft.sql.GraftSparkExtensions`, set by
  * GraftSession), it routes
  *
  *   MERGE INTO db.schema.tbl AS t USING src AS s
  *   ON t.k1 = s.k1 [AND t.k2 = s.k2 …]
  *   [WHEN MATCHED [AND s.et > t.et] THEN UPDATE SET *]
  *   [WHEN NOT MATCHED THEN INSERT *]
  *
  * to MergeIntoPartitioned — Spark's OWN grammar does the parsing (the
  * delegate parser produces the MergeIntoTable logical plan; nothing is
  * re-lexed here), and only statements whose 3-part target resolves in
  * the configured graft warehouse (`spark.graft.warehouse.root`) are
  * intercepted; every other statement passes through untouched.
  *
  * The partition field comes from the TABLE's metadata sidecar
  * (`_partition_meta`, written by the materializations) — as in BigQuery,
  * a MERGE statement never restates the partition column; the ON clause
  * supplies unique_key and the WHEN MATCHED recency guard supplies
  * event_time, mirroring how the reference renders those config values
  * into its MERGE text (incremental_partition_merge.sql:239-265).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectParser { case (session, delegate) => new GraftMergeParser(session, delegate) }
}

class GraftMergeParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case m: MergeIntoTable => GraftMergeInto.interceptOrPass(session, m)
      case other => other
    }

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] = delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
}

object GraftMergeInto {
  /** Session conf naming the warehouse root the SQL surface serves. */
  val RootConf = "spark.graft.warehouse.root"

  /** Replace a MergeIntoTable whose target lives in the configured graft
    * warehouse with the runnable graft merge; pass every other statement
    * through to Spark untouched. A graft-targeted statement OUTSIDE the
    * supported shape fails here, at parse time, with an actionable
    * message (Spark's own path would fail later anyway: plain parquet has
    * no row-level-operation support). */
  def interceptOrPass(session: SparkSession, m: MergeIntoTable): LogicalPlan = {
    val rootOpt = session.conf.getOption(RootConf)
    val partsOpt = targetIdent(m.targetTable).filter(_.length == 3)
    (rootOpt, partsOpt) match {
      case (Some(root), Some(parts))
          if new Warehouse(root, session).exists(TableId(parts(0), parts(1), parts(2))) =>
        build(m, parts)
      case _ => m
    }
  }

  private def targetIdent(p: LogicalPlan): Option[Seq[String]] = p match {
    case SubqueryAlias(_, child) => targetIdent(child)
    case r: UnresolvedRelation => Some(r.multipartIdentifier)
    case _ => None
  }

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(
      s"graft MERGE INTO: $what. Supported shape: ON conjunction of t.k = s.k; " +
        "optional WHEN MATCHED [AND s.<et> > t.<et>] THEN UPDATE SET *; " +
        "optional WHEN NOT MATCHED THEN INSERT *")

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  private def aliasOf(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  /** An unqualified attribute always passes; a qualified one must cite the
    * expected side's alias (when that alias is known). */
  private def qualMatches(attr: UnresolvedAttribute, alias: Option[String]): Boolean =
    attr.nameParts.length < 2 ||
      alias.forall(a => attr.nameParts(attr.nameParts.length - 2).equalsIgnoreCase(a))

  private def build(m: MergeIntoTable, parts: Seq[String]): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION is not supported")

    // ON: conjunction of equi-predicates over the same column name on both
    // sides -> unique_key (incremental_partition_merge.sql:245-246)
    val keys = splitConj(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => fail(s"unsupported ON predicate '${other.sql}'")
    }

    // WHEN MATCHED [AND s.et > t.et] THEN UPDATE SET * -> event_time
    // (incremental_partition_merge.sql:251-257: the recency guard). The
    // qualifier check rejects a reversed guard (t.et > s.et), which would
    // silently invert the recency semantics.
    val sAlias = aliasOf(m.sourceTable)
    val tAlias = aliasOf(m.targetTable)
    val eventTime: Option[String] = m.matchedActions match {
      case Seq() => None
      case Seq(UpdateStarAction(None)) => None
      case Seq(UpdateStarAction(Some(GreaterThan(a: UnresolvedAttribute, b: UnresolvedAttribute))))
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) &&
            qualMatches(a, sAlias) && qualMatches(b, tAlias) =>
        Some(a.nameParts.last)
      case _ => fail("matched clause must be WHEN MATCHED [AND s.et > t.et] THEN UPDATE SET *")
    }
    val updateOnMatch = m.matchedActions.nonEmpty

    m.notMatchedActions match {
      case Seq() | Seq(InsertStarAction(None)) => ()
      case _ => fail("not-matched clause must be WHEN NOT MATCHED THEN INSERT *")
    }
    val insertOnNoMatch = m.notMatchedActions.nonEmpty
    if (!updateOnMatch && !insertOnNoMatch)
      fail("at least one of WHEN MATCHED / WHEN NOT MATCHED is required")

    GraftMergeExec(parts(0), parts(1), parts(2), keys, eventTime,
      updateOnMatch, insertOnNoMatch, m.sourceTable)
  }
}

/** Runnable command carrying the extracted merge config; the source plan
  * is analyzed at run time against the session catalog (temp views,
  * subqueries — anything spark.sql can read). */
case class GraftMergeExec(
    db: String, schemaName: String, table: String,
    uniqueKey: Seq[String], eventTime: Option[String],
    updateOnMatch: Boolean, insertOnNoMatch: Boolean,
    source: LogicalPlan) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val root = spark.conf.get(GraftMergeInto.RootConf)
    val wh = new Warehouse(root, spark)
    val id = TableId(db, schemaName, table)
    val pf = wh.readPartitionMeta(id).getOrElse(throw new IllegalStateException(
      s"MERGE INTO ${id.fqn}: no declared partition field (_partition_meta sidecar). " +
        "Build the table through a graft materialization first, or declare one via " +
        "Warehouse.writePartitionMeta."))
    var batch = org.apache.spark.sql.graft.PlanUtils.ofRows(spark, source)
    // Single-clause statements pre-filter the batch, honoring the A2 match
    // rule (match = same key in a TOUCHED partition; NULL keys never
    // match): update-only drops batch rows with no in-touched-partition
    // match; insert-only keeps exactly those rows (plus NULL keys, which
    // always insert). The merge itself then handles the kept rows.
    if (!updateOnMatch || !insertOnNoMatch) {
      import org.apache.spark.sql.functions.{col, to_date}
      val touched = batch.select(to_date(col(pf)).as("__d")).distinct()
        .collect().flatMap(r => Option(r.getDate(0))).toSeq
      val tgtKeys = wh.readPartitions(id, touched)
        .select(uniqueKey.map(col): _*).dropDuplicates()
      if (!insertOnNoMatch) batch = batch.join(tgtKeys, uniqueKey, "left_semi")
      if (!updateOnMatch) batch = batch.join(tgtKeys, uniqueKey, "left_anti")
    }
    new MergeIntoPartitioned(wh, spark).run(batch, id,
      MergeConfig(partitionField = pf, uniqueKey = uniqueKey, eventTime = eventTime))
    Seq.empty
  }
}

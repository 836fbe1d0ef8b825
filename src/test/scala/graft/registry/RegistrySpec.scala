package graft.registry

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.warehouse.Warehouse

/** C1-C8 governance tests (SURVEY §5.3): each validation rule fires; the
  * registration upsert matches the reference's MERGE semantics. */
class RegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("registry-test")
    .getOrCreate()

  import spark.implicits._

  private def fixture() = {
    val wh = new Warehouse(Files.createTempDirectory("graft_reg_").toString, spark)
    val reg = new Registry(wh, spark)
    (wh, reg, new Validator(reg, wh))
  }

  private val ref = ModelRef("sales", "orders", "dataproduct", "daily")
  private val rel = TableId("proj", "sales_orders", "daily")
  private def df = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
  private val okCfg = DataproductConfig(owner = Some("team-x"), version = Some("1.2"))
  private val okMeta = ModelMeta(
    description = Some("orders daily"),
    columnDescriptions = Map("id" -> "the id", "payload" -> "the payload"))

  test("C6 semver: 2-4 numeric parts required") {
    val (_, _, v) = fixture()
    v.validateSemanticVersioning("1.2")
    v.validateSemanticVersioning("1.2.3.4")
    intercept[ValidationException](v.validateSemanticVersioning("1"))
    intercept[ValidationException](v.validateSemanticVersioning("1.2.3.4.5"))
    intercept[ValidationException](v.validateSemanticVersioning("1.x"))
    intercept[ValidationException](v.validateSemanticVersioning("1."))
  }

  test("C2 preview clause: analysis validates; bad column/syntax rejected") {
    val (_, _, v) = fixture()
    v.validatePreviewWhereClause(df, "id > 1")
    intercept[ValidationException](v.validatePreviewWhereClause(df, "nonexistent > 1"))
    intercept[ValidationException](v.validatePreviewWhereClause(df, "id >>> 1"))
  }

  test("C1: owner and description required; C3 placement; unregister forbidden") {
    val (wh, reg, v) = fixture()
    // owner missing
    intercept[ValidationException](
      v.validate(df, rel, ref, Env.Prod, Some(okCfg.copy(owner = None)), okMeta))
    // description missing
    intercept[ValidationException](
      v.validate(df, rel, ref, Env.Prod, Some(okCfg), okMeta.copy(description = None)))
    // C3: curated placement rejected
    val curatedRef = ref.copy(layer = "curated")
    val curatedRel = TableId("proj", "sales_orders_curated", "daily")
    intercept[ValidationException](
      v.validate(df, curatedRel, curatedRef, Env.Prod, Some(okCfg), okMeta))
    // valid passes
    v.validate(df, rel, ref, Env.Prod, Some(okCfg), okMeta)
    // register, then removing the dataproduct config is forbidden (C1)
    reg.register(df, rel, ref, okCfg, okMeta)
    intercept[ValidationException](
      v.validate(df, rel, ref, Env.Prod, None, okMeta))
  }

  test("C5: registered products may not lose columns; struct columns exempt; descriptions required per column") {
    val (wh, reg, v) = fixture()
    wh.overwrite(rel, df) // deployed state has (id, payload)
    reg.register(df, rel, ref, okCfg, okMeta)

    // dropping 'payload' rejected
    val narrower = Seq((1L)).toDF("id")
    val ex = intercept[ValidationException](
      v.validate(narrower, rel, ref, Env.Prod, Some(okCfg),
        okMeta.copy(columnDescriptions = Map("id" -> "the id"))))
    assert(ex.getMessage.contains("Missing columns: payload"))

    // a column without a description rejected
    intercept[ValidationException](
      v.validate(df, rel, ref, Env.Prod, Some(okCfg),
        okMeta.copy(columnDescriptions = Map("id" -> "the id"))))

    // struct-typed entries are exempt from the deletion check: ADDING a
    // field to a struct changes the struct's dtype string (old entry not in
    // new set) but must pass — only its leaves are compared, and they are
    // all still present (validate_dataproduct.sql:96 rationale)
    import org.apache.spark.sql.functions._
    val withStruct = df.withColumn("nested", struct(lit(1).as("x")))
    wh.overwrite(rel, withStruct)
    reg.register(withStruct, rel, ref, okCfg,
      okMeta.copy(columnDescriptions = okMeta.columnDescriptions +
        ("nested" -> "n", "nested.x" -> "nx")))
    val widenedStruct = df.withColumn("nested",
      struct(lit(1).as("x"), lit("s").as("y")))
    v.validate(widenedStruct, rel, ref, Env.Prod, Some(okCfg),
      okMeta.copy(columnDescriptions = okMeta.columnDescriptions +
        ("nested" -> "n", "nested.x" -> "nx", "nested.y" -> "ny")))
    // but dropping the struct entirely still fails (on its non-struct leaves)
    val ex2 = intercept[ValidationException](
      v.validate(df, rel, ref, Env.Prod, Some(okCfg), okMeta))
    assert(ex2.getMessage.contains("nested.x"))

    // array<struct<...>> is exempt too: the reference checks dtype
    // CONTAINING struct/record, not starting with it
    val withArr = df.withColumn("items",
      array(struct(lit(1).as("x"))))
    wh.overwrite(rel, withArr)
    reg.register(withArr, rel, ref, okCfg,
      okMeta.copy(columnDescriptions = okMeta.columnDescriptions + ("items" -> "i")))
    val widenedArr = df.withColumn("items",
      array(struct(lit(1).as("x"), lit("s").as("y"))))
    v.validate(widenedArr, rel, ref, Env.Prod, Some(okCfg),
      okMeta.copy(columnDescriptions = okMeta.columnDescriptions + ("items" -> "i")))
  }

  test("C7/C8: upsert — insert sets registeredTime; update preserves it and bumps lastUpdateTime") {
    val (wh, reg, _) = fixture()
    wh.overwrite(rel, df)
    val t1 = new Timestamp(1700000000000L)
    val e1 = reg.register(df, rel, ref, okCfg, okMeta, now = () => t1)
    assert(e1.registeredTime == t1 && e1.lastUpdateTime == t1)
    assert(e1.id == Registry.md5Hex("sales_orders-daily"))
    assert(e1.rowCount.contains(2L))
    assert(e1.columns.map(c => c.field_path -> c.description).toMap
      == Map("id" -> "the id", "payload" -> "the payload"))

    val t2 = new Timestamp(1800000000000L)
    val e2 = reg.register(df, rel, ref, okCfg.copy(owner = Some("team-y")), okMeta, now = () => t2)
    assert(e2.registeredTime == t1, "update must preserve registeredTime")
    assert(e2.lastUpdateTime == t2 && e2.owner == "team-y")
    assert(reg.readCatalog().count() == 1, "upsert must not duplicate")

    // a second product inserts alongside
    val rel2 = TableId("proj", "sales_orders", "weekly")
    reg.register(df, rel2, ref.copy(name = "weekly"), okCfg, okMeta, now = () => t2)
    assert(reg.readCatalog().count() == 2)
    assert(reg.isRegistered(rel) && reg.isRegistered(rel2))
    assert(!reg.isRegistered(TableId("proj", "sales_orders", "nope")))
  }

  override def afterAll(): Unit = spark.stop()
}

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises window filter (A1 shape), uuid_v5 correlation ids (D12), a
    * join, and an exact decimal-backed aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.read(spark, dir, "lineitem")
      .filter(col("l_shipdate").cast("timestamp") > lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate").cast("timestamp") <= lit("1999-01-01").cast("timestamp"))
    val ord = Tables.read(spark, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("correlation_id",
        graft.functions.GraftFunctions.uuidV5(
          concat(col("o_orderkey").cast("string"), lit(":"), col("l_linenumber").cast("string")),
          "3bfbbd36-410b-43fa-999a-bb990a6db5c7"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(col("correlation_id")).as("n"),
        sum(col("l_quantity").cast("decimal(30,10)")).cast("double").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the harness parquet tables (TESTDATA.md). */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read
    * natively; with nanosAsLong it arrives as LongType nanoseconds. Derive a
    * microsecond TimestampType `ts` (integer `div` — double division would
    * lose precision above 2^53 ns). DuckDB truncates ns->us on read the same
    * way, so the two engines agree exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the harness parquet tables (TESTDATA.md). */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across harness revisions. NANOS is unreadable
    * natively; with nanosAsLong it arrives as LongType nanoseconds, and we
    * derive a microsecond TimestampType `ts` (integer `div` — double
    * division would lose precision above 2^53 ns; DuckDB truncates ns->us
    * on read the same way, so the two engines agree exactly). MICROS (and
    * TIMESTAMP_NTZ) already match DuckDB's native read — adapt on the
    * observed column type instead of assuming one generation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    df.withColumn("ts", eventTs(df.schema))
  }

  /** Microsecond-timestamp `ts` Column for an events scan, adaptive to the
    * shipped physical type (works on streaming readers too — pass the
    * reader's schema). */
  def eventTs(schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
}

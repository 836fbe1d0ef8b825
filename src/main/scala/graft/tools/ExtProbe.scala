package graft.tools
/** One-off driver: proves the spark.sql.extensions entry point works in a
  * fresh JVM session (the real deployment path). */
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("""SELECT graft_hex_to_int('0xff') AS a,
                        graft_uuid_v5('www.example.com', '6ba7b810-9dad-11d1-80b4-00c04fd430c8') AS u""").show(false)
    spark.stop()
  }
}

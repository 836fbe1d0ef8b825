package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Candidate-volume probe: hash-order vs rarest-first containment
  * prefixes on the sf0.1 corpus. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val sets = Dedup.shingleHashSets(docs, "text", "doc_id")
      .filter(size(col("hs")) > 0).persist()
    sets.count()
    val post = sets.select(col("id").as("id_b"), explode(col("hs")).as("s")).persist()
    post.count()
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val t = 0.9
    // hash-order prefix
    val prefHash = sets.withColumn("n", size(col("hs")))
      .withColumn("plen", (col("n") - ceil(lit(t) * col("n")).cast("int") + 1))
      .select(col("id").as("id_a"), explode(expr("slice(hs, 1, plen)")).as("s"))
    val candHash = timeIt("hash-order candidates") {
      prefHash.join(post, "s").filter(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b").count()
    }
    val freq = post.groupBy("s").agg(count(lit(1)).as("df"))
    val prefRare = post.select(col("id_b").as("id"), col("s")).join(freq, "s")
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)").as("sh"),
        count(lit(1)).as("n"))
      .withColumn("plen", (col("n") - ceil(lit(t) * col("n")).cast("int") + 1))
      .select(col("id").as("id_a"), explode(expr("slice(sh, 1, plen)")).as("s"))
    val candRare = timeIt("rarest-first candidates") {
      prefRare.join(post, "s").filter(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b").count()
    }
    println(s"candidates: hash-order=$candHash rarest-first=$candRare")
    spark.stop()
  }
}

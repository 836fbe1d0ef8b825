package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.Dedup
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sets = time("shingleHashes+persist") {
      val s = Dedup.shingleHashSets(docs, "text", "doc_id").persist()
      s.count(); s
    }
    val sorted = sets.select(col("id"), array_sort(col("hs")).as("sorted_hs"))
      .withColumn("n", size(col("sorted_hs")))
      .withColumn("plen", (col("n") - ceil(lit(0.8) * col("n")).cast("int") + 1))
      .select(col("id"), expr("slice(sorted_hs, 1, plen)").as("prefix"))
    val prefPost = sorted.select(col("id"), explode(col("prefix")).as("s"))
    time("prefix postings count")(println("postings=" + prefPost.count()))
    val l = prefPost.select(col("s"), col("id").as("id_a"))
    val r = prefPost.select(col("s"), col("id").as("id_b"))
    val cand = l.join(r, "s").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b").persist()
    time("candidates")(println("cand=" + cand.count()))
    val a = sets.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val b = sets.select(col("id").as("id_b"), col("hs").as("hs_b"))
    val ver = cand.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
        size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
      .filter(col("jaccard") >= 0.8)
    time("verify")(println("pairs=" + ver.count()))
    spark.stop()
  }
}

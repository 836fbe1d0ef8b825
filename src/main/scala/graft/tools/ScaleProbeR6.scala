package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Scaling probe for BPE training/segmentation at 1x vs 10x corpus.
  *
  * The design claim under test: corpus size only affects the INITIAL word
  * count — after the collapse to a word-frequency dict, per-round cost is
  * O(dict), and a 10x clone-union corpus has the SAME dict (identical
  * distinct words, 10x the frequencies), so the merge rounds should cost
  * the same at both scales and produce an identical merge table (freqs
  * scaled by 10). Segmentation is a pure projection — linear in rows. */
object ScaleProbeR6 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def corpus(k: Int) = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    var merges1: Seq[(Long, String, String, Long)] = Nil
    for (k <- Seq(1, 10)) {
      val docs = corpus(k).cache(); docs.count()
      println(s"=== corpus x$k (${5000 * k} docs) ===")
      val merges = time(s"bpe_train(40 merges) x$k")(
        Bpe.train(docs, "text", numMerges = 40))
      if (k == 1) merges1 = merges
      else {
        val same = merges.map(m => (m._1, m._2, m._3)) ==
          merges1.map(m => (m._1, m._2, m._3))
        val scaled = merges.map(_._4).zip(merges1.map(_._4))
          .forall { case (f10, f1) => f10 == 10 * f1 }
        println(s"merge table identical: $same; freqs exactly 10x: $scaled")
      }
      time(s"bpe_segment(all tokens) x$k")(
        docs.select(explode(Dedup.tokens(col("text"))).as("tok"))
          .select(Bpe.segmentUdf(merges)(col("tok")).as("p"))
          .select(sum(size(col("p")))).head())
      docs.unpersist()
    }
    spark.stop()
  }
}

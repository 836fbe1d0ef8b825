package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Scaling probe for the PQ/IVF+PQ index at 1x vs 10x corpus
  * (clone-union with id offsets). Claims under test:
  *  - fit cost is linear in corpus (one pass per Lloyd iteration,
  *    collect bounded at k×dim regardless of rows);
  *  - encode/write is linear (one projection + partitioned write);
  *  - serving reads only probed cells of CODES — per-query cost tracks
  *    the probed fraction, and the index bytes shrink ~32x vs vectors. */
object ScaleProbePq {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def corpus(k: Int) = (0 until k).map(i =>
      base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (d.isFile) d.length
      else Option(d.listFiles).map(_.map(f => dirBytes(f.getPath)).sum).getOrElse(0L)
    }
    for (k <- Seq(1, 10)) {
      val docs = corpus(k).cache(); val n = docs.count()
      println(s"=== corpus x$k ($n vectors) ===")
      val path = java.nio.file.Files.createTempDirectory(s"graft_pqprobe_x$k").toString
      time(s"ivfpq write (fit+encode) x$k")(
        IvfPq.write(docs, "embedding", "vec_id", path,
          nCells = 16, m = 8, k = 16, iters = 3, corpusRows = Some(n)))
      val vecBytes = n * 64 * 4 // raw float payload
      val idxBytes = dirBytes(path)
      println(f"index bytes: $idxBytes%,d (raw vector payload: $vecBytes%,d)")
      val queries = base.filter(col("vec_id") < 10)
      time(s"ivfpq serve 10 queries x$k")(
        IvfPq.topK(spark, path, queries, "embedding", "vec_id",
          k = 10, nProbe = 4).count())
      docs.unpersist()
    }
    spark.stop()
  }
}

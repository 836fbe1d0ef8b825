package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** The Zipfian containment probe VERDICT r9 asked for: hash-order vs
  * rarest-first A-prefixes when the shingle document-frequency
  * distribution has real HUBS (boilerplate phrases in >= 10% of docs —
  * the shape of actual web text, which the sf testdata's mild synthetic
  * skew does not reproduce).
  *
  * Synthesized corpus (deterministic, no RNG): each doc =
  *  - one of 5 hub phrases (12 tokens) -> its ~10 shingles have df =
  *    n/5 = 20% of the corpus,
  *  - one of 500 mid phrases (6 tokens) -> df = n/500,
  *  - 40 doc-unique tokens -> df = 1 shingles.
  *
  * At t = 0.9 the prefix is ~7 of ~56 shingles. Hash order is uniform,
  * so each doc's prefix catches ~10·(7/56) ≈ 1.25 hub shingles in
  * expectation, and EVERY one joins an n/5-row posting list: candidate
  * volume ~ n·1.25·(n/5) — quadratic in corpus size. Rarest-first puts
  * the df=1 shingles in the prefix, so candidates track true matches.
  * Both are lossless (prefix lemma holds for any total order); this
  * probe measures the cost gap that makes rarest-first the only safe
  * default at corpus scale (Dedup.containmentPairs scaladoc). */
object ZipfContainProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hubs = (0 until 5).map(k =>
      (0 until 12).map(i => s"hub${k}w$i").mkString(" "))
    val mids = (0 until 500).map(k =>
      (0 until 6).map(i => s"mid${k}w$i").mkString(" "))
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        element_at(typedLit(hubs), (pmod(col("id"), lit(5L)) + 1).cast("int")),
        element_at(typedLit(mids), (pmod(col("id"), lit(500L)) + 1).cast("int")),
        expr("concat_ws(' ', transform(sequence(1, 40), i -> concat('u', id, 'x', i)))")
      ).as("text"))

    val sets = Dedup.shingleHashSets(docs, "text", "doc_id")
      .filter(size(col("hs")) > 0).persist()
    println(s"docs=$n sets=${sets.count()}")
    val post = sets.select(col("id").as("id_b"), explode(col("hs")).as("s")).persist()
    println(s"postings=${post.count()}")
    val dfTop = post.groupBy("s").agg(count(lit(1)).as("df"))
      .orderBy(desc("df")).limit(3).collect()
      .map(r => r.getLong(1)).mkString(",")
    println(s"top shingle dfs: $dfTop (hub target = ${n / 5})")

    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val t = 0.9
    val freq = post.groupBy("s").agg(count(lit(1)).as("df"))
    val prefRare = post.select(col("id_b").as("id"), col("s")).join(freq, "s")
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)").as("sh"),
        count(lit(1)).as("n"))
      .withColumn("plen",
        (col("n") - ceil(lit(t) * col("n") - lit(1e-9)).cast("int") + 1))
      .select(col("id").as("id_a"), explode(expr("slice(sh, 1, plen)")).as("s"))
    val joinedRare = timeIt("rarest-first join rows") {
      prefRare.join(post, "s").filter(col("id_a") =!= col("id_b")).count()
    }
    val candRare = timeIt("rarest-first candidates (dedup'd)") {
      prefRare.join(post, "s").filter(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b").count()
    }

    val prefHash = sets.withColumn("n", size(col("hs")))
      .withColumn("plen",
        (col("n") - ceil(lit(t) * col("n") - lit(1e-9)).cast("int") + 1))
      .select(col("id").as("id_a"), explode(expr("slice(hs, 1, plen)")).as("s"))
    val joinedHash = timeIt("hash-order join rows") {
      prefHash.join(post, "s").filter(col("id_a") =!= col("id_b")).count()
    }
    val candHash = timeIt("hash-order candidates (dedup'd)") {
      prefHash.join(post, "s").filter(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b").count()
    }

    println(s"join rows:  hash=$joinedHash rare=$joinedRare " +
      f"(${joinedHash.toDouble / math.max(joinedRare, 1)}%.0fx)")
    println(s"candidates: hash=$candHash rare=$candRare " +
      f"(${candHash.toDouble / math.max(candRare, 1)}%.0fx)")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** How big are the physical plans the heavy gates make AQE re-render?
  * Builds the cc_store pipeline's intermediate frames exactly as the
  * gate does and prints each one's executedPlan treeString length and
  * node count (innerChildren included via treeString) — the direct
  * evidence for the nested-InMemoryRelation render blow-up ProfileGate's
  * sampler points at. */
object ProbePlanSize {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Dedup

    def describe(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val s = df.queryExecution.executedPlan.treeString
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$name%-28s treeString=${s.length}%9d chars  render=$ms%8.1f ms")
    }

    val docs = graft.Tables.read(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 250)
    val sets = Dedup.shingleHashSets(corpus, "text", "doc_id", 3).persist()
    describe("sets (persisted)", sets)
    val pairs = Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 0.8)
    describe("minhash pairs (lazy)", pairs)
    val p = pairs.select(col("id_a").as("u"), col("id_b").as("v")).persist()
    p.count()
    describe("p (persisted+counted)", p)
    val nodes = p.select(col("u")).unionByName(p.select(col("v").as("u"))).distinct()
    val edges = p.unionByName(p.select(col("v").as("u"), col("u").as("v")))
      .unionByName(nodes.withColumn("v", col("u"))).persist()
    edges.count()
    describe("edges (persisted)", edges)
    val labels0 = nodes.select(col("u").as("node"), col("u").as("label"))
    val swept = edges
      .join(labels0.select(col("node").as("v"), col("label").as("vlab")), "v")
      .groupBy(col("u")).agg(min(col("vlab")).as("label"))
      .select(col("u").as("node"), col("label")).persist()
    val next = swept
      .join(swept.select(col("node").as("label"), col("label").as("label2")),
        Seq("label"), "left")
      .select(col("node"), coalesce(col("label2"), col("label")).as("label"))
    describe("round-1 'next' (lazy)", next)
    spark.stop()
  }
}

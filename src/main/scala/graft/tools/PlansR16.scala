package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 plan audit.
  *
  *  - `Forget.audit`'s edge/label checks must compile to broadcast
  *    HASH joins (two LEFT equi-joins against the distinct drop set),
  *    never the r15 OR-condition BroadcastNestedLoopJoin — at 100 TB a
  *    large takedown list made the AUDIT the bottleneck (O(|edges| ×
  *    |drop set|) comparisons), and the NLJ shape also double-counted
  *    rows hitting two dropped ids. The main REFUSES (exit 1) if any
  *    audited plan contains a nested-loop join.
  *  - the standing denylist's append-path exclusion must be a
  *    broadcast LEFT ANTI (takedown sets are small; a shuffled anti
  *    join would add a corpus-wide exchange to every micro-batch). */
object PlansR16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.read(spark, dir, "documents")
    val ids = docs.select("doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_plans16_").toString

    val pairs = ids.as("a").join(ids.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1 && col("a.doc_id") % 10 =!= 9)
      .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
    graft.operators.EdgeStore.write(pairs.withColumn("w", lit(1L)),
      "u", "v", Some("w"), s"$tmp/es", nBuckets = 16)
    graft.operators.LabelStore.write(
      graft.operators.ConnectedComponents.run(pairs, "u", "v"),
      s"$tmp/lb", nBuckets = 8)

    // the audit body's exact join shape (Forget.audit counts2)
    val dropB = broadcast(ids.filter(col("doc_id") % 7 === 3)
      .select(col("doc_id").cast("long").as("__drop")).distinct())
    def counts2Plan(df: org.apache.spark.sql.DataFrame,
                    c1: String, c2: String) =
      df.join(broadcast(dropB.select(col("__drop").as("__d1"))),
          col(c1) === col("__d1"), "left")
        .join(broadcast(dropB.select(col("__drop").as("__d2"))),
          col(c2) === col("__d2"), "left")
        .agg(count(lit(1)),
          count(when(col("__d1").isNotNull || col("__d2").isNotNull,
            lit(1))))
    val plans = Seq(
      "Forget.audit edge check (two broadcast LEFT equi-joins, no NLJ)" ->
        counts2Plan(spark.read.parquet(s"$tmp/es/edges")
          .select("src", "dst"), "src", "dst"),
      "Forget.audit label check (same shape over byn)" ->
        counts2Plan(spark.read.parquet(s"$tmp/lb/byn")
          .select("node", "label"), "node", "label"))

    var bad = false
    plans.foreach { case (title, df) =>
      println(s"=== $title ===")
      df.explain("formatted")
      val physical = df.queryExecution.executedPlan.toString
      if (physical.contains("BroadcastNestedLoopJoin")) {
        println(s"!!! NLJ found in: $title")
        bad = true
      }
    }

    // denylist exclusion: broadcast anti join on the append path
    graft.llm.Denylist.record(ids.filter(col("doc_id") % 9 === 4),
      "doc_id", s"$tmp/dl")
    println("=== Denylist.exclude (broadcast LEFT ANTI) ===")
    val excl = graft.llm.Denylist.exclude(docs, "doc_id", spark, s"$tmp/dl")
    excl.explain("formatted")
    val exclPlan = excl.queryExecution.executedPlan.toString
    // executedPlan.toString renders join fields comma-separated
    // ("BroadcastHashJoin [...], [...], LeftAnti, BuildRight, ...")
    if (!(exclPlan.contains("BroadcastHashJoin") &&
          exclPlan.contains("LeftAnti")) ||
        exclPlan.contains("BroadcastNestedLoopJoin")) {
      println("!!! denylist exclusion is not a broadcast anti join")
      bad = true
    }

    spark.stop()
    if (bad) sys.exit(1)
    println("PLANSR16_OK")
  }
}

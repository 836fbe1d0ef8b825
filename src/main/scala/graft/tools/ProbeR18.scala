package graft.tools

import org.apache.spark.sql.functions._

/** Round-18 slope evidence for the round's own changes.
  *
  *  1. `Warehouse.deleteRows` broadcast vs FORCED-SHUFFLED (the new
  *     size-guarded hint, ceiling forced to 0 and Spark's automatic
  *     broadcast thresholds killed) at 1× vs 10×: the degraded path's
  *     price on the erasure itself, so the 64 MB ceiling's
  *     conservatism is a judgment with numbers behind it — the r17
  *     probe measured only the ingest-guard join.
  *  2. `Forget.audit` over a warehouse + edge store set, broadcast vs
  *     forced-shuffled at both scales — the two-column census is the
  *     audit's heaviest join.
  *  3. Journaled vs unjournaled `forgetDocs` on the same store set —
  *     the journal (flags + steps inventory + ids dump + done
  *     markers) must cost metadata, not data.
  *
  * Two passes (pass 1 absorbs JIT; report pass 2), local[32].
  * Usage: runMain graft.tools.ProbeR18 [organic1xDir] [organic10xDir] */
object ProbeR18 {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      "1x" -> args.lift(0).getOrElse("/tmp/graft_org1"),
      "10x" -> args.lift(1).getOrElse("/tmp/graft_org10"))
    val spark = graft.core.GraftSession.builder("local[32]", Some(32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def forceShuffle[A](body: => A): A = {
      val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.denylist.broadcastMaxBytes", "0")
      try body
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.graft.denylist.broadcastMaxBytes")
      }
    }

    for (pass <- 1 to 2; (tag0, dir) <- dirs) {
      val tag = s"p${pass}_$tag0"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()

      def freshTable(): (graft.warehouse.Warehouse, graft.core.TableId) = {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft_p18_${tag}_").toString
        val wh = new graft.warehouse.Warehouse(tmp, spark)
        val id = graft.core.TableId("proj", "corpus", "docs")
        wh.overwritePartitioned(id, docs.withColumn("part_date",
          date_add(lit("2026-01-01").cast("date"),
            (col("doc_id") % 40).cast("int"))))
        (wh, id)
      }
      val drop = docs.filter(col("doc_id") % 40 === 3 ||
        col("doc_id") % 40 === 17).select("doc_id")
      val nDrop = drop.count()

      // ---- 1. deleteRows: broadcast vs forced-shuffled ------------------
      val (whB, idB) = freshTable()
      val (remB, tDelB) = timed(whB.deleteRows(idB, drop, "doc_id"))
      val (whS, idS) = freshTable()
      val (remS, tDelS) = timed(forceShuffle(
        whS.deleteRows(idS, drop, "doc_id")))
      require(remB == remS && remB == nDrop,
        s"shape mismatch: broadcast removed $remB, shuffled $remS, expected $nDrop")
      println(f"[$tag] rows=$n deleteRows drop=$nDrop: " +
        f"broadcast=${tDelB}%.1fs shuffled=${tDelS}%.1fs")

      // ---- 2. audit (warehouse + edge census), both regimes --------------
      val edP = java.nio.file.Files
        .createTempDirectory(s"graft_p18e_${tag}_").toString
      graft.operators.EdgeStore.write(
        docs.select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
          .withColumn("w", lit(1L)), "u", "v", Some("w"), edP, nBuckets = 16)
      val stores = graft.llm.Forget.Stores(edge = Some(edP),
        warehouse = Seq(graft.llm.Forget.WarehouseTarget(whB, idB, "doc_id")))
      val (aB, tAudB) = timed(
        graft.llm.Forget.audit(spark, drop, "doc_id", stores)
          .agg(sum("n_dropped")).head().getLong(0))
      val (aS, tAudS) = timed(forceShuffle(
        graft.llm.Forget.audit(spark, drop, "doc_id", stores)
          .agg(sum("n_dropped")).head().getLong(0)))
      require(aB == aS, s"audit mismatch: broadcast $aB vs shuffled $aS")
      println(f"[$tag] audit (wh+edge): broadcast=${tAudB}%.1fs " +
        f"shuffled=${tAudS}%.1fs (dropped-visible rows agree: $aB)")

      // ---- 3. journaled vs unjournaled forgetDocs ------------------------
      def freshSample(): String = {
        val p = java.nio.file.Files
          .createTempDirectory(s"graft_p18s_${tag}_").toString + "/sm"
        graft.operators.SampleStore.write(docs, Seq.empty, "doc_id",
          "source", p, kMax = 40)
        p
      }
      val stU = graft.llm.Forget.Stores(sample = Some(freshSample()))
      val (_, tUnj) = timed(
        graft.llm.Forget.forgetDocs(spark, drop, "doc_id", stU))
      val smJ = freshSample()
      val stJ = graft.llm.Forget.Stores(sample = Some(smJ))
      val (_, tJ) = timed(
        graft.llm.Forget.forgetDocs(spark, drop, "doc_id", stJ,
          journal = Some(graft.llm.Forget.Journal(
            new java.io.File(smJ).getParent + "/j", "probe"))))
      println(f"[$tag] forgetDocs(sample): unjournaled=${tUnj}%.1fs " +
        f"journaled=${tJ}%.1fs")
    }
    spark.stop()
    println("PROBER18_DONE")
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 part 2: slope evidence for the round's own additions.
  *
  *  1. `Warehouse.deleteRows` at 1× vs 10× (organic fixture): the
  *     partition-pruned claim measured — a drop set confined to 2 of
  *     40 day-partitions must cost ~the 2 partitions' rewrite at both
  *     scales, and the idempotent re-run (0 touched partitions) must
  *     cost ~the discovery scan alone.
  *  2. `Denylist.exclude`'s two shapes at 10×: the pinned broadcast
  *     LEFT ANTI vs the size-guarded fallback (hint dropped, shuffled
  *     anti) — the degraded path's price, measured, so the 64 MB
  *     ceiling is a judgment with numbers behind it.
  *
  * Usage: runMain graft.tools.ProbeR17b [organic1xDir] [organic10xDir] */
object ProbeR17b {
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

    for (pass <- 1 to 2; (tag0, dir) <- dirs) {
      val tag = s"p${pass}_$tag0"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()

      // ---- deleteRows: 40 day-partitions, drop confined to 2 ------------
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_p17b_${tag}_").toString
      val wh = new graft.warehouse.Warehouse(tmp, spark)
      val id = graft.core.TableId("proj", "corpus", "docs")
      val (_, tBuild) = timed {
        wh.overwritePartitioned(id, docs.withColumn("part_date",
          date_add(lit("2026-01-01").cast("date"),
            (col("doc_id") % 40).cast("int"))))
      }
      // every id in partitions 3 and 17 — 2 of 40 touched
      val drop = docs.filter(col("doc_id") % 40 === 3 ||
          col("doc_id") % 40 === 17).select("doc_id")
      val nDrop = drop.count()
      val (removed, tDel) = timed { wh.deleteRows(id, drop, "doc_id") }
      val (_, tNoop) = timed { wh.deleteRows(id, drop, "doc_id") }
      println(f"[probe17b/$tag] deleteRows: $n%d rows, $nDrop%d dropped " +
        f"(2/40 partitions), build $tBuild%.1f s, delete $tDel%.1f s " +
        f"(removed=$removed%d), idempotent re-run $tNoop%.1f s")

      // ---- denylist: broadcast vs size-guarded shuffled anti -------------
      graft.llm.Denylist.record(
        docs.filter(col("doc_id") % 9 === 4).select("doc_id"),
        "doc_id", s"$tmp/guard")
      val (nB, tBcast) = timed {
        graft.llm.Denylist.exclude(docs, "doc_id", spark, s"$tmp/guard")
          .count()
      }
      spark.conf.set("spark.graft.denylist.broadcastMaxBytes", "0")
      val (nS, tShuf) = timed {
        graft.llm.Denylist.exclude(docs, "doc_id", spark, s"$tmp/guard")
          .count()
      }
      spark.conf.unset("spark.graft.denylist.broadcastMaxBytes")
      require(nB == nS, s"shape change altered results: $nB vs $nS")
      println(f"[probe17b/$tag] denylist: broadcast $tBcast%.1f s, " +
        f"forced-shuffled $tShuf%.1f s (survivors $nB%d — identical)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 scale probes (r15 verdict ask #7): the two audit-family
  * gates missing from SCALING.md's slope tables, timed at 1× vs the
  * MakeSf ×10 fixture.
  *
  *  1. `Warehouse.fsck` over a partitioned merge-built table + a flat
  *     side table — the audit is root listings plus ONE footers pass
  *     over the table's own partition dirs, so wall should track file
  *     count, not row count;
  *  2. `Forget.forgetDocs` over a chunk store with `chunkCompact`
  *     BOTH ways — the purge-debt economics an operator actually
  *     needs: gc-only leaves dropped doc IDS in manifest rows (the
  *     audit's chunk_manifest row counts the debt) at a fraction of
  *     the cost; chunkCompact pays a full manifest+chunk rewrite NOW.
  *
  * Usage: runMain graft.tools.ProbeR16 [sfDir] */
object ProbeR16 {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe16_").toString

    // ---- 1. warehouse fsck ------------------------------------------------
    val wh = new graft.warehouse.Warehouse(s"$tmp/wh", spark)
    val daily = graft.core.TableId("analytics", "core", "docs_daily")
    val part = docs.select(col("doc_id"), col("lang"),
      date_add(lit("2026-01-01").cast("date"),
        (col("doc_id") % 7).cast("int")).as("part_date"))
    wh.overwriteTouchedPartitions(daily, part.filter(col("doc_id") % 2 === 0))
    wh.appendPartitioned(daily, part.filter(col("doc_id") % 2 === 1))
    val flat = graft.core.TableId("analytics", "core", "lang_dim")
    wh.overwrite(flat, docs.select("lang").distinct())
    val (_, tFsck) = timed {
      wh.fsck(daily).collect(); wh.fsck(flat).collect()
    }
    println(f"[probe16] warehouse_fsck: $n%d docs, both tables audited " +
      f"in $tFsck%.1f s")

    // ---- 2. forgetDocs purge-debt economics --------------------------------
    def freshStore(path: String): Unit =
      graft.llm.ChunkStore.write(docs.select("doc_id", "text"), "text",
        "doc_id", path, nBuckets = 64)
    val dropped = docs.select("doc_id").filter(col("doc_id") % 9 === 4)
    def debt(path: String): Long = {
      val stores = graft.llm.Forget.Stores(chunk = Some(path))
      graft.llm.Forget.audit(spark, dropped, "doc_id", stores)
        .filter(col("store") === "chunk_manifest")
        .select("n_dropped").head().getLong(0)
    }
    val gcOnly = s"$tmp/ch_gc"
    freshStore(gcOnly)
    val (_, tGcOnly) = timed(graft.llm.Forget.forgetDocs(spark, dropped,
      "doc_id", graft.llm.Forget.Stores(chunk = Some(gcOnly))))
    val debtGc = debt(gcOnly)
    val full = s"$tmp/ch_full"
    freshStore(full)
    val (_, tFull) = timed(graft.llm.Forget.forgetDocs(spark, dropped,
      "doc_id", graft.llm.Forget.Stores(chunk = Some(full)),
      chunkCompact = true))
    val debtFull = debt(full)
    println(f"[probe16] forgetDocs chunk-only: gc-only $tGcOnly%.1f s " +
      f"(manifest debt $debtGc%d ids), chunkCompact $tFull%.1f s " +
      f"(debt $debtFull%d)")

    // ---- 3. standing-denylist append overhead -------------------------------
    // the per-batch price of the takedown guard: one FS probe when no
    // denylist exists, one broadcast anti-join when one does — measured
    // as whole appendBatch wall with/without a 1k-id list, same batch
    val batch = docs.select("doc_id", "text").filter(col("doc_id") % 4 === 1)
    def appendOnce(path: String, id: Long): Double =
      timed(graft.llm.ChunkStore.appendBatch(batch, "text", "doc_id",
        path, nBuckets = 64, batchId = id))._2
    val bare = s"$tmp/ch_nodeny"
    freshStore(bare)
    val warm = appendOnce(bare, 0L) // JVM/codegen warmup
    val tNoDeny = appendOnce(bare, 1L)
    val guarded = s"$tmp/ch_deny"
    freshStore(guarded)
    graft.llm.Denylist.record(
      docs.select("doc_id").filter(col("doc_id") % 50 === 0), "doc_id",
      guarded)
    appendOnce(guarded, 0L)
    val tDeny = appendOnce(guarded, 1L)
    println(f"[probe16] denylist overhead: appendBatch $tNoDeny%.2f s " +
      f"without vs $tDeny%.2f s with a ${n / 50}%d-id list " +
      f"(warmup $warm%.2f s)")
    spark.stop()
  }
}

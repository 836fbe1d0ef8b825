package graft.operators

import graft.SparkSpec
import graft.warehouse.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Store maintenance ops are single-writer ENFORCED (r14 verdict
  * "What's missing #4"): every gc / compact / dropNodes / dropKeys /
  * rebuild / pruneFoldedNamed takes the store-root (or table) writer
  * lease — a concurrent second op fails fast with the locked-by
  * message instead of interleaving staged installs; a stale lease
  * (dead holder) breaks after ttl; reentrancy keeps compact-inside-
  * ingest (maybeCompact) working. */
class StoreLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def mkChunkStore(): String = {
    val p = Files.createTempDirectory("graft_lease_cs_").toString
    graft.llm.ChunkStore.write(Seq(
        (1L, "a document with enough words to chunk into several " +
          "content addressed pieces of storage right here"),
        (2L, "garbage document whose unique bytes give the collector " +
          "real work to perform during the test"))
      .toDF("doc_id", "text"), "text", "doc_id", p, nBuckets = 4)
    graft.llm.ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"),
      "doc_id", p)
    p
  }

  test("a held lease makes concurrent maintenance fail fast (gc, compact, dropNodes, dropKeys)") {
    val cs = mkChunkStore()
    // hold the store-root lease from THIS thread, attempt the op from
    // ANOTHER thread (leases are reentrant per (thread, path) — a
    // same-thread call would legitimately pass)
    def fromOtherThread(body: => Unit): Throwable = {
      @volatile var err: Throwable = null
      val t = new Thread(() => try body catch { case e: Throwable => err = e })
      t.start(); t.join()
      err
    }
    Warehouse.withPathLease(spark, cs, what = "test holder") {
      val e = fromOtherThread(graft.llm.ChunkStore.gc(spark, cs))
      assert(e != null && e.getMessage.contains("locked by another writer"),
        String.valueOf(e))
      val e2 = fromOtherThread(graft.llm.ChunkStore.compact(spark, cs))
      assert(e2 != null && e2.getMessage.contains("locked by another writer"),
        String.valueOf(e2))
    }
    // released: the op now runs
    val (_, collected) = graft.llm.ChunkStore.gc(spark, cs)
    assert(collected > 0L)

    val es = Files.createTempDirectory("graft_lease_es_").toString
    EdgeStore.write(Seq((1L, 2L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), es, nBuckets = 4)
    Warehouse.withPathLease(spark, es, what = "test holder") {
      val e = fromOtherThread(
        EdgeStore.dropNodes(spark, es, Seq(2L).toDF("n"), "n"))
      assert(e != null && e.getMessage.contains("locked by another writer"),
        String.valueOf(e))
    }
    val tk = Files.createTempDirectory("graft_lease_tk_").toString
    TopKStore.write(Seq(("d1", "x"), ("d1", "y")).toDF("day", "v"),
      Seq.empty, "v", "day", tk, m = 2)
    Warehouse.withPathLease(spark, tk, what = "test holder") {
      val e = fromOtherThread(
        TopKStore.dropKeys(spark, tk, Seq("x").toDF("v"), "v"))
      assert(e != null && e.getMessage.contains("locked by another writer"),
        String.valueOf(e))
    }
  }

  test("a stale lease (dead holder) breaks after ttl; a live one does not") {
    val p = Files.createTempDirectory("graft_lease_stale_").toString
    val lock = new org.apache.hadoop.fs.Path(p + "._writer_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lock, true); out.write("dead".getBytes); out.close()
    // age the lock beyond ttl: the next taker breaks it and proceeds
    fs.setTimes(lock, System.currentTimeMillis - 3600 * 1000L, -1)
    var ran = false
    Warehouse.withPathLease(spark, p, ttlMs = 1000L,
      what = "stale test") { ran = true }
    assert(ran, "stale lease must be broken, not respected forever")
    // a FRESH foreign lock is respected
    val out2 = fs.create(lock, true); out2.write("live".getBytes); out2.close()
    val e = intercept[IllegalStateException] {
      Warehouse.withPathLease(spark, p, ttlMs = 3600 * 1000L,
        what = "live test") { () }
    }
    assert(e.getMessage.contains("locked by another writer"))
    fs.delete(lock, false)
  }

  test("reentrancy: a store-level op composes with the nested IvfLayout lease") {
    // LabelStore.compact leases the store root, then IvfLayout.compact
    // leases each copy's table — different keys, fail-fast (never
    // blocking), same thread: must all acquire
    val p = Files.createTempDirectory("graft_lease_re_").toString
    LabelStore.write(ConnectedComponents.run(
        Seq((1L, 2L)).toDF("u", "v"), "u", "v"), p, nBuckets = 2)
    LabelStore.applyBatch(spark, p, Seq((2L, 3L)).toDF("u", "v"),
      "u", "v", runId = Some("backfill-a"))
    Warehouse.withPathLease(spark, p, what = "outer") {
      LabelStore.compact(spark, p) // reentrant on the root, nested on copies
    }
    assert(LabelStore.read(spark, p).as[(Long, Long)].collect().toMap
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}

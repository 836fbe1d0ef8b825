package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** The `b<digits>` run-id namespace belongs to each store's single
  * checkpointed stream (r13 verdict "What to keep doing #2"): the
  * bounded fold manifest collapses those ids under a high-water mark,
  * so a MANUAL append reusing the shape would silently inherit
  * collapse semantics — `contains(b7)` could no-op an append whose
  * rows were never delivered. Every additive store's manual `append`
  * must refuse the shape; streams mint ids via `appendBatch`. The
  * guard fires BEFORE any metadata read or write, so no store needs
  * to exist on disk. */
class NamespaceGuardSpec extends SparkSpec {
  import spark.implicits._

  private def someDf = Seq(("d1", "k", 1L)).toDF("day", "k", "v")

  private def refused(body: => Unit): Unit = {
    val e = intercept[IllegalArgumentException](body)
    assert(e.getMessage.contains("b<digits>") &&
      e.getMessage.contains("appendBatch"), e.getMessage)
  }

  test("every additive store's manual append rejects a b<digits> run id") {
    val p = Files.createTempDirectory("graft_ns_").toString
    refused(HistStore.append(someDf, Seq.empty, "v", "day", p,
      runId = Some("b7")))
    refused(QuantileStore.append(someDf, Seq.empty, "v", "day", p,
      runId = Some("b7")))
    refused(QuantileStore.appendLog2(someDf, Seq.empty, "v", "day", p,
      runId = Some("b7")))
    refused(CmsStore.append(someDf, "k", "day", p, runId = Some("b7")))
    refused(TopKStore.append(someDf, Seq.empty, "v", "day", p,
      runId = "b7"))
    refused(SampleStore.append(someDf, Seq.empty, "k", "day", p,
      runId = Some("b7")))
    refused(EdgeStore.append(Seq((1L, 2L, 1L)).toDF("s", "d", "w"),
      "s", "d", Some("w"), p, runId = Some("b7")))
    // an overflow-length digit id is NAMED (FoldManifestSpec) and passes
    // the guard — only genuine stream-batch shapes are reserved; it
    // then fails on the missing store, proving the guard let it through
    val past = intercept[IllegalArgumentException] {
      CmsStore.append(someDf, "k", "day", p,
        runId = Some("b9999999999999999999"))
    }
    assert(past.getMessage.contains("_cms_meta"),
      s"overflow id must pass the guard and fail on the store instead: " +
        past.getMessage)
  }

  test("slot-overwrite stores' manual entry points reject b<digits> too") {
    // same hazard, different failure shape (round-14 review): on these
    // stores a folded high-water mark silently NO-OPS the manual
    // append/applyBatch — postings or label deltas vanish without an
    // error — so the namespace is enforced at every runId entry point
    val p = Files.createTempDirectory("graft_ns_idx_").toString
    val docs = Seq((1L, "some text")).toDF("doc_id", "text")
    val vecs = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    refused(graft.llm.MinHashIndex.append(docs, "text", "doc_id", p,
      runId = Some("b7")))
    refused(graft.llm.MinHashIndex.serveThenAppend(spark, p, docs,
      "text", "doc_id", runId = Some("b7"))(_ => ()))
    refused(graft.llm.ContainIndex.append(docs, "text", "doc_id", p,
      runId = Some("b7")))
    refused(graft.llm.ContainIndex.serveThenAppend(spark, p, docs,
      "text", "doc_id", runId = Some("b7"))(_ => ()))
    refused(graft.llm.Retrieval.appendIndex(docs, "text", "doc_id", p,
      runId = Some("b7")))
    refused(graft.llm.IvfIndex.append(vecs, "embedding", "vec_id", p,
      runId = Some("b7")))
    refused(graft.llm.IvfPq.append(vecs, "embedding", "vec_id", p,
      runId = Some("b7")))
    refused(graft.llm.ChunkStore.append(docs, "text", "doc_id", p,
      runId = Some("b7")))
    refused(LabelStore.applyBatch(spark, p, pairs, "id_a", "id_b",
      runId = Some("b7")))
  }

  test("appendBatch mints the reserved id and lands the slot") {
    val p = Files.createTempDirectory("graft_ns_ok_").toString
    CmsStore.write(someDf, "k", "day", p, depth = 2, width = 16)
    CmsStore.appendBatch(someDf, "k", "day", p, batchId = 3L)
    val root = new org.apache.hadoop.fs.Path(s"$p/cms/run=b3")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(root), "appendBatch writes the b<batchId> slot")
  }
}

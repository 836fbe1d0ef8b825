package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-addressed chunk store: round trip, dedup-on-append, bucket
  * pruning, compaction. */
class ChunkStoreSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cs_spec_").toString

  test("write + reconstruct round-trips the corpus byte-exactly") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val root = freshRoot()
    ChunkStore.write(docs, "text", "doc_id", root, nBuckets = 8)
    val back = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.filter(length(col("text")) > 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want)
  }

  test("append stores only never-seen chunks; re-appending a copy stores none") {
    import spark.implicits._
    val a = Seq((1L, "the quick brown fox jumps over the lazy dog and keeps " +
      "running through a long field of identical grass for many sentences"))
      .toDF("doc_id", "text")
    val root = freshRoot()
    ChunkStore.write(a, "text", "doc_id", root, nBuckets = 4)
    val stored0 = spark.read.parquet(s"$root/chunks").count()
    // an exact copy under a new id: manifest grows, chunk table does not
    ChunkStore.append(a.select((col("doc_id") + 100L).as("doc_id"), col("text")),
      "text", "doc_id", root, nBuckets = 4)
    assert(spark.read.parquet(s"$root/chunks").count() == stored0,
      "identical content must add zero chunk rows")
    val man = spark.read.parquet(s"$root/manifest")
    assert(man.select("doc_id").distinct().count() == 2)
    // both docs reconstruct to the same text
    val back = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(1L) == back(101L))
  }

  test("near-duplicate append stores only the edit neighborhood") {
    import spark.implicits._
    val base = "in the middle of the corpus there is a long shared run of " +
      "text that should chunk identically on both sides of any edit " +
      "because boundaries depend only on a local window of the content " +
      "and therefore almost every chunk of a near duplicate already exists"
    val root = freshRoot()
    ChunkStore.write(Seq((1L, base)).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val stored0 = spark.read.parquet(s"$root/chunks").count()
    ChunkStore.append(
      Seq((2L, "edited prefix " + base)).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val stored1 = spark.read.parquet(s"$root/chunks").count()
    assert(stored1 > stored0, "the edited head must add chunks")
    assert(stored1 - stored0 < stored0,
      s"most chunks must be shared: $stored0 -> $stored1")
    val st = ChunkStore.stats(spark, root).collect()(0)
    assert(st.getLong(0) > st.getLong(1),
      "manifest rows must exceed stored rows once content is shared")
  }

  test("append prunes the store scan to the batch's chunk buckets") {
    import spark.implicits._
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(50)
    val root = freshRoot()
    ChunkStore.write(docs, "text", "doc_id", root, nBuckets = 16)
    // one tiny batch: its chunks hash into few of the 16 buckets; the
    // existing-side scan must carry a PartitionFilter on cb
    val batch = Seq((900001L, "a single fresh document for bucket pruning"))
      .toDF("doc_id", "text")
    val ch = Curation.cdcChunks(batch, "text", "doc_id")
    val touched = ch.select(
        pmod(conv(substring(col("chunk_hash"), 1, 4), 16, 10).cast("long"), lit(16L)))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(touched.size < 16)
    val pruned = spark.read.parquet(s"$root/chunks")
      .filter(col("cb").isin(touched.toSeq: _*))
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    // isin compiles to `cb IN (...)` or, for a single bucket, `cb = b`
    assert(pf.contains("cb"),
      s"bucket prune must be a planning-time partition filter: $pf")
    ChunkStore.append(batch, "text", "doc_id", root, nBuckets = 16)
    val back = ChunkStore.reconstruct(spark, root)
    assert(back.filter(col("doc_id") === 900001L).count() == 1)
  }

  test("streaming ingest dedups ACROSS micro-batches") {
    import spark.implicits._
    val base = "in the middle of the corpus there is a long shared run of " +
      "text that should chunk identically on both sides of any edit " +
      "because boundaries depend only on a local window of the content"
    val srcDir = java.nio.file.Files.createTempDirectory("graft_scs_src_").toString
    // batch 1: the original; batch 2: a near-duplicate (prefix edit)
    Seq((1L, base)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((2L, "edited prefix " + base)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val root = freshRoot(); val ckpt = freshRoot()
    ChunkStore.write(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val schema = spark.read.parquet(srcDir).schema
    graft.streaming.StreamingIncremental.streamingChunkIngest(
      spark, srcDir, schema, root, ckpt, "text", "doc_id",
      nBuckets = 4, maxFilesPerTrigger = Some(1)).awaitTermination()
    val st = ChunkStore.stats(spark, root).collect()(0)
    // near-dup in a LATER batch still shares: stored < manifested
    assert(st.getLong(1) < st.getLong(0),
      s"cross-batch sharing expected: stored=${st.getLong(1)} manifested=${st.getLong(0)}")
    val back = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(1L -> base, 2L -> ("edited prefix " + base)))
  }

  test("compact: one file per bucket, reconstruction unchanged") {
    import spark.implicits._
    val root = freshRoot()
    val mk = (i: Long) => (i, s"document number $i with some padding text " +
      "long enough to produce a handful of content defined chunks each time")
    ChunkStore.write(Seq(mk(1)).toDF("doc_id", "text"), "text", "doc_id", root, 4)
    ChunkStore.append(Seq(mk(2)).toDF("doc_id", "text"), "text", "doc_id", root, 4)
    ChunkStore.append(Seq(mk(3)).toDF("doc_id", "text"), "text", "doc_id", root, 4)
    val before = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ChunkStore.compact(spark, root)
    val files = new java.io.File(s"$root/chunks").listFiles
      .filter(_.getName.startsWith("cb="))
      .map(d => d.getName -> d.listFiles.count(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty && files.forall(_._2 == 1),
      s"compact must leave one file per bucket: ${files.toSeq}")
    val after = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before)
  }

  test("reconstructDocs: selective random access == filtered full reconstruction, bucket-pruned") {
    import spark.implicits._
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val root = freshRoot()
    ChunkStore.write(docs, "text", "doc_id", root, nBuckets = 16)
    val want = ChunkStore.reconstruct(spark, root)
      .filter(col("doc_id").isin(3L, 7L, 11L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = ChunkStore.reconstructDocs(spark, root,
        Seq(3L, 7L, 11L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
    // the chunk read is genuinely pruned: 3 docs' hashes touch fewer
    // than all 16 buckets (bucket dirs exist for all of them)
    val man = spark.read.parquet(s"$root/manifest")
      .filter(col("doc_id").isin(3L, 7L, 11L))
    val touched = man.select(
        pmod(conv(substring(col("chunk_hash"), 1, 4), 16, 10).cast("long"), lit(16L)))
      .distinct().count()
    assert(touched < 16, s"fixture: docs touch $touched buckets — widen it")
    // tombstoned docs stay hidden through the selective path too
    ChunkStore.deleteDocs(Seq(Tuple1(7L)).toDF("doc_id"), "doc_id", root)
    val afterDel = ChunkStore.reconstructDocs(spark, root,
        Seq(3L, 7L).toDF("doc_id"), "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterDel === Set(3L))
  }

  test("re-ingesting a doc in a later run REPLACES it (latest-run-wins), never concatenates") {
    import spark.implicits._
    val v1 = "version one of a page that is long enough to chunk into " +
      "several pieces so that naive manifest merging would duplicate them"
    val v2 = "version two rewritten after a re-crawl with different words " +
      "but still long enough to chunk into several distinct pieces"
    val root = freshRoot()
    ChunkStore.write(Seq((7L, v1)).toDF("doc_id", "text"), "text", "doc_id", root, 4)
    // exact re-ingest of the SAME content in a later run: text unchanged
    ChunkStore.append(Seq((7L, v1)).toDF("doc_id", "text"), "text", "doc_id", root, 4)
    val exact = ChunkStore.reconstruct(spark, root).collect()
    assert(exact.length == 1 && exact(0).getString(1) == v1,
      "exact re-ingest must not duplicate chunks in the reconstruction")
    // edited re-ingest: the NEW version wins outright
    ChunkStore.append(Seq((7L, v2)).toDF("doc_id", "text"), "text", "doc_id", root, 4)
    val edited = ChunkStore.reconstruct(spark, root).collect()
    assert(edited.length == 1 && edited(0).getString(1) == v2,
      s"latest run must win: ${edited(0).getString(1).take(40)}…")
  }

  test("append with a mismatched nBuckets is rejected (store metadata)") {
    import spark.implicits._
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "some document text that chunks"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 8)
    assert(ChunkStore.readMeta(spark, root).map(_._1).contains(8))
    val ex = intercept[IllegalArgumentException] {
      ChunkStore.append(Seq((2L, "another document"))
        .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 16)
    }
    assert(ex.getMessage.contains("nBuckets=8"))
  }

  test("deleteDocs hides immediately; compact purges; re-ingest after delete revives") {
    import spark.implicits._
    val shared = "a long shared tail of text that two documents have in " +
      "common so deleting one must not drop the other document's chunks"
    val root = freshRoot()
    ChunkStore.write(Seq(
        (1L, "unique head one " + shared),
        (2L, "unique head two " + shared),
        (3L, "a fully independent document with content nobody shares"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    val storedBefore = spark.read.parquet(s"$root/chunks").count()
    ChunkStore.deleteDocs(Seq(Tuple1(3L)).toDF("doc_id"), "doc_id", root)
    // serve-side: doc 3 is gone immediately, no rewrite happened yet
    val served = ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(served == Set(1L, 2L), s"tombstoned doc must be hidden: $served")
    assert(spark.read.parquet(s"$root/chunks").count() == storedBefore,
      "delete must not rewrite the chunk table")
    // compact: doc 3's exclusive chunks are reclaimed, shared ones kept,
    // survivors reconstruct byte-identically
    val before = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ChunkStore.compact(spark, root)
    assert(spark.read.parquet(s"$root/chunks").count() < storedBefore,
      "compact must reclaim the deleted doc's exclusive chunks")
    val after = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before, "survivors must be byte-identical after compact")
    assert(!new java.io.File(s"$root/tombstones").exists,
      "applied tombstones must be cleared")
    // revive: a delete then a LATER re-ingest makes the doc visible again
    ChunkStore.deleteDocs(Seq(Tuple1(1L)).toDF("doc_id"), "doc_id", root)
    ChunkStore.append(Seq((1L, "the revived document body"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    val revived = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(revived(1L) == "the revived document body")
    assert(revived.keySet == Set(1L, 2L))
  }

  test("a replayed slot reuses its seq: a delete between delivery and replay is not undone") {
    import spark.implicits._
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "a surviving document with enough words " +
      "to chunk into some pieces of content"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    val b0 = Seq((2L, "the streamed document that gets deleted while " +
      "the stream is down and must stay deleted across the replay"))
      .toDF("doc_id", "text")
    ChunkStore.appendBatch(b0, "text", "doc_id", root, nBuckets = 4,
      batchId = 0L) // first delivery: seq 1
    // operator deletes doc 2 while the stream is down (tombstone seq 2)
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", root)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // restart: foreachBatch replays b0 (at-least-once). With a FRESH
    // seq the replayed manifest would outrank the tombstone and
    // resurrect doc 2 — the slot must reuse its original seq instead
    ChunkStore.appendBatch(b0, "text", "doc_id", root, nBuckets = 4,
      batchId = 0L)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "replay must not outrank the tombstone")
    // a GENUINE later re-ingest (new run id → fresh seq) still revives
    ChunkStore.append(b0, "text", "doc_id", root, nBuckets = 4,
      runId = Some("reingest-x"))
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "intentional re-ingest outranks the tombstone as before")
    // and the seq counter never rewound: delete doc 1, tombstone must
    // outrank every manifest written so far
    ChunkStore.deleteDocs(Seq(Tuple1(1L)).toDF("doc_id"), "doc_id", root)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("compact between delivery and replay cannot resurrect a deleted doc") {
    import spark.implicits._
    // the round-14 review corner: the streaming loop compacts at the
    // TOP of foreachBatch, so on restart-after-crash the compact runs
    // BEFORE the replay of the last delivered batch — it used to purge
    // the slot and the tombstones, and the replayed append then minted
    // a fresh seq and re-landed the deleted doc as live
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "a surviving document with enough words " +
      "to chunk into a few pieces here")).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val b0 = Seq((2L, "the streamed document deleted while the stream " +
      "is down and then chased by a compact before its replay runs"))
      .toDF("doc_id", "text")
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", root)
    ChunkStore.compact(spark, root) // folds b0, purges doc 2, clears tombstones
    assert(RunSlots.foldedRuns(spark, s"$root/manifest").contains("b0"))
    val chunksAfter = spark.read.parquet(s"$root/chunks").count()
    // the replay: must be a WHOLE-append no-op (manifests AND chunks)
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "replay after the folding compact must not resurrect the deleted doc")
    assert(spark.read.parquet(s"$root/chunks").count() == chunksAfter,
      "no chunk bytes re-land for a folded batch")
  }

  test("compact carries a PARTIAL manifest slot; a shadowing tombstone survives it") {
    import spark.implicits._
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "a surviving document with enough words " +
      "to chunk into a few pieces right here")).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val b0 = Seq((2L, "the half-landed document whose batch crashed " +
      "mid manifest write and will be replayed by the restarted stream"))
      .toDF("doc_id", "text")
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    val marker = new org.apache.hadoop.fs.Path(
      s"$root/manifest/run=b0/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false)) // "crash" mid-first-write
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", root)
    ChunkStore.compact(spark, root)
    // the partial slot rode over verbatim, unrecorded — its replay must
    // still land; and the tombstone shadowing it must SURVIVE the
    // compact, or the replay (same seq) would make doc 2 visible
    assert(!RunSlots.foldedRuns(spark, s"$root/manifest").contains("b0"),
      "partial slot must not be recorded")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")),
      "a tombstone shadowing a carried slot must not be cleared")
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "the replay reuses its seq — the tombstone still wins")
    // once the slot is committed, the next compact folds and records
    // it, clears the applied tombstone, and doc 2 stays gone
    ChunkStore.compact(spark, root)
    assert(RunSlots.foldedRuns(spark, s"$root/manifest").contains("b0"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")))
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("partial-slot compact keeps seq order: a re-ingest-after-delete survives it") {
    import spark.implicits._
    // round-14 review: with a partial slot the tombstones are retained,
    // and folding visible rows to seq 0 would put a committed re-ingest
    // BELOW its own superseded tombstone — the doc vanishes and the
    // next compact purges it. Original seqs must ride the fold instead.
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "base document with enough words to chunk "
      + "into a few content defined pieces")).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val d = Seq((2L, "the deleted then re-ingested document with plenty "
      + "of text to chunk several times over")).toDF("doc_id", "text")
    ChunkStore.appendBatch(d, "text", "doc_id", root, 4, batchId = 0L) // seq 1
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", root) // seq 2
    ChunkStore.appendBatch(d, "text", "doc_id", root, 4, batchId = 1L) // seq 3: revive
    val e = Seq((3L, "an unrelated batch that crashes mid manifest write "
      + "leaving a partial slot behind for the replay"))
      .toDF("doc_id", "text")
    ChunkStore.appendBatch(e, "text", "doc_id", root, 4, batchId = 2L) // seq 4
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/manifest/run=b2/_SUCCESS"), false))
    ChunkStore.compact(spark, root)
    val visible = ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(visible == Set(1L, 2L, 3L),
      s"the revived doc must survive a partial-slot compact: $visible")
    // replay commits the slot; the NEXT compact collapses + clears
    ChunkStore.appendBatch(e, "text", "doc_id", root, 4, batchId = 2L)
    ChunkStore.compact(spark, root)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")))
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("partial-slot compact keeps the slot's chunk bytes: no truncated serves before replay") {
    import spark.implicits._
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "base document with enough words to chunk "
      + "into a few content defined pieces")).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val fTxt = "a uniquely worded crashed-batch document whose chunk " +
      "bytes exist only through the partial slot until the replay runs"
    ChunkStore.appendBatch(Seq((5L, fTxt)).toDF("doc_id", "text"),
      "text", "doc_id", root, 4, batchId = 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/manifest/run=b0/_SUCCESS"), false))
    ChunkStore.compact(spark, root)
    // round-14 review: the slot's docs resolve from it until the
    // replay, so its chunk bytes must survive the chunk rewrite — an
    // inner join would otherwise serve the doc TRUNCATED, silently
    val back = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(5L) == fTxt,
      s"carried slot must serve full bytes, got: ${back(5L)}")
  }

  test("compact refuses when every manifest slot is uncommitted") {
    import spark.implicits._
    val root = freshRoot()
    // a store built by manual named appends alone has no __base__ slot
    ChunkStore.append(Seq((1L, "the only batch this store ever saw with "
      + "enough text to chunk")).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4, runId = Some("seed-x"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/manifest/run=seed-x/_SUCCESS"), false))
    val e = intercept[IllegalArgumentException] {
      ChunkStore.compact(spark, root)
    }
    assert(e.getMessage.contains("nothing committed to fold"), e.getMessage)
  }

  test("gc: targeted collection — unique chunks gone, shared survive, clean buckets untouched") {
    import spark.implicits._
    val shared = "a long shared tail of text that two documents have in " +
      "common so deleting one must not drop the other document's chunks " +
      "and it keeps going for long enough to span several cdc chunks of " +
      "content in a row so bucket census paths actually get exercised"
    val root = freshRoot()
    ChunkStore.write(Seq(
        (1L, "unique head one " + shared),
        (2L, "unique head two " + shared),
        (3L, "a fully independent document with content nobody shares " +
          "that is long enough to produce several chunks of its own here"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    val storedBefore = spark.read.parquet(s"$root/chunks").count()
    val before = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucketFiles(): Map[String, Set[String]] = {
      val chRoot = new org.apache.hadoop.fs.Path(s"$root/chunks")
      val fs = chRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(chRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cb="))
        .map(d => d.getPath.getName -> fs.listStatus(d.getPath)
          .map(f => s"${f.getPath.getName}:${f.getLen}").toSet).toMap
    }
    val filesBefore = bucketFiles()
    // nothing deleted yet: gc is a no-op census, zero rewrites
    assert(ChunkStore.gc(spark, root) === ((0, 0L)))
    assert(bucketFiles() === filesBefore, "clean store must be untouched")

    ChunkStore.deleteDocs(Seq(Tuple1(3L)).toDF("doc_id"), "doc_id", root)
    val (buckets, collected) = ChunkStore.gc(spark, root)
    assert(collected > 0L, "doc 3's exclusive chunks must be collected")
    assert(spark.read.parquet(s"$root/chunks").count() ===
      storedBefore - collected)
    // only the dirty buckets were rewritten — every clean bucket's
    // files are byte-identical (targeted, not a full-store rewrite)
    val filesAfter = bucketFiles()
    val untouched = filesAfter.filter { case (k, v) =>
      filesBefore.get(k).contains(v) }
    assert(untouched.size >= filesAfter.size - buckets,
      s"gc rewrote more than its $buckets dirty buckets")
    // survivors reconstruct byte-identically; the deleted doc's text is
    // unreconstructable (its unique bytes are gone)
    val after = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === before - 3L,
      "shared chunks survive; docs 1 and 2 byte-identical")
    // idempotent: a second gc finds nothing
    assert(ChunkStore.gc(spark, root) === ((0, 0L)))
  }

  test("gc: crash leftovers refuse loudly; every intermediate state serves correctly") {
    import spark.implicits._
    val root = freshRoot()
    ChunkStore.write(Seq(
        (1L, "first survivor document with enough text to chunk into " +
          "several pieces of content addressed storage right here"),
        (2L, "the doomed document whose bytes must disappear after the " +
          "collection finishes running over the dirty buckets"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", root)
    val survivors = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // simulate a crash mid-gc: a stale staged tree left behind
    val chRoot = new org.apache.hadoop.fs.Path(s"$root/chunks")
    val fs = chRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(chRoot, "_gc_tmp/cb=0"))
    // underscore staging is INVISIBLE to readers — serving is unaffected
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      === survivors)
    val e = intercept[IllegalArgumentException] {
      ChunkStore.gc(spark, root)
    }
    assert(e.getMessage.contains("_gc_tmp"), e.getMessage)
    // remedy: remove the leftover, re-run — collection completes
    fs.delete(new org.apache.hadoop.fs.Path(chRoot, "_gc_tmp"), true)
    val (_, collected) = ChunkStore.gc(spark, root)
    assert(collected > 0L)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      === survivors, "survivors byte-identical after the re-run")
    // a backup leftover (crash mid-install) also refuses, names the dir
    fs.mkdirs(new org.apache.hadoop.fs.Path(chRoot, "_gc_old_cb=1"))
    val e2 = intercept[IllegalArgumentException] {
      ChunkStore.gc(spark, root)
    }
    assert(e2.getMessage.contains("_gc_old_cb=1"), e2.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(chRoot, "_gc_old_cb=1"), true)
    // refusal when nothing survives: an empty install would break reads
    ChunkStore.deleteDocs(Seq(Tuple1(1L)).toDF("doc_id"), "doc_id", root)
    val e3 = intercept[IllegalArgumentException] {
      ChunkStore.gc(spark, root)
    }
    assert(e3.getMessage.contains("no document survives"), e3.getMessage)
  }

  test("gc liveness ignores a torn higher-seq slot: the committed version's bytes survive") {
    import spark.implicits._
    // the round-14 ADVICE corner: a crash mid-append leaves a partial
    // (no _SUCCESS) slot whose higher seq SHADOWS a doc's committed
    // version under latest-run-wins. gc must compute liveness the way
    // compact folds — committed slots only, plus every hash the partial
    // slot references — or it collects the committed version's
    // exclusive bytes; if the operator then removes the torn slot
    // instead of replaying it, the doc resolves back to a version whose
    // chunks are gone: permanent silent truncation.
    val root = freshRoot()
    val committedText = "the committed version of the document with its " +
      "own long run of words that chunk into exclusive pieces right here"
    ChunkStore.write(Seq(
        (1L, committedText),
        (9L, "garbage document giving the collector real work to do " +
          "with uniquely owned chunk bytes of its very own"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    // a re-ingest of doc 1 crashes mid-append: slot lands, marker doesn't
    ChunkStore.appendBatch(Seq(
        (1L, "a torn newer version with completely different words " +
          "sharing nothing with the committed document at all"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4,
      batchId = 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/manifest/run=b0/_SUCCESS"), false)
    // real garbage exists (doc 9), so gc has work — but neither version
    // of doc 1 may lose bytes
    ChunkStore.deleteDocs(Seq(Tuple1(9L)).toDF("doc_id"), "doc_id", root)
    val (_, collected) = ChunkStore.gc(spark, root)
    assert(collected > 0L, "doc 9's exclusive chunks must be collected")
    // operator takes the documented requireNoPartialSlots remedy:
    // removes the torn slot instead of replaying it — the doc must
    // resolve back to its committed version BYTE-EXACTLY
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/manifest/run=b0"), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/manifest/_slot_seq_b0.json"), false)
    val back = ChunkStore.reconstruct(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back === Map(1L -> committedText),
      "committed version truncated: gc collected bytes a torn slot shadowed")
  }

  test("a torn REPLAY overwrite cannot mint a fresh seq: the sidecar recovers the original") {
    import spark.implicits._
    // existingSlotSeq used to read the seq back out of the slot's own
    // parquet rows — but a replay's mode(overwrite) deletes the slot
    // dir before new rows land, so a crash in that window destroyed the
    // only copy of the first delivery's seq; the NEXT replay then
    // minted a fresh higher seq and outranked a tombstone written in
    // between (round-14 ADVICE). The durable _slot_seq sidecar closes
    // that window.
    val root = freshRoot()
    ChunkStore.write(Seq((1L, "a surviving document with enough words " +
      "to chunk into some pieces of content here"))
      .toDF("doc_id", "text"), "text", "doc_id", root, nBuckets = 4)
    val b0 = Seq((2L, "the streamed document that is deleted while the " +
      "stream is down and must stay deleted across every replay"))
      .toDF("doc_id", "text")
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", root)
    // a replay starts and crashes INSIDE its own overwrite: the slot
    // dir is already gone, no new rows landed
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/manifest/run=b0"), true)
    // the next replay must recover the ORIGINAL seq from the sidecar —
    // a fresh mint would outrank the tombstone and resurrect doc 2
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "replay after a torn overwrite must not outrank the tombstone")
    // and the sidecar survives a partial-slot compact (carried verbatim
    // with its slot): tear the marker, compact, replay — still deleted
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/manifest/run=b0/_SUCCESS"), false)
    ChunkStore.compact(spark, root)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/manifest/run=b0"), true)
    ChunkStore.appendBatch(b0, "text", "doc_id", root, 4, batchId = 0L)
    assert(ChunkStore.reconstruct(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "sidecar must ride the compact with its partial slot")
  }
}

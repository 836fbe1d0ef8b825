package graft.llm

import graft.SparkSpec
import graft.operators.{EdgeStore, SampleStore, TopKStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Standing ingest denylist: the sf-scale end-to-end story is gated
  * (`forget_reingest`); this pins the mechanics on hand fixtures —
  * identity when absent, per-store append filtering, survival across
  * the maintenance op that clears every OTHER marker (compact), and
  * explicit re-admittance via clear(). */
class DenylistSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) = ids.map(i =>
    (i, s"document number $i with plenty of words to shingle and chunk " +
      s"into content addressed pieces of its very own kind $i", s"p${i % 2}"))
    .toDF("doc_id", "text", "part")

  test("exclude is identity when no denylist exists; filters when one does") {
    val root = Files.createTempDirectory("graft_deny_").toString + "/s"
    val df = mkDocs(1L to 6L)
    assert(Denylist.exclude(df, "doc_id", spark, root).count() === 6L)
    Denylist.record(Seq(2L, 4L).toDF("doc_id"), "doc_id", root)
    assert(Denylist.exclude(df, "doc_id", spark, root)
      .select("doc_id").as[Long].collect().sorted === Seq(1L, 3L, 5L, 6L))
    // pair form: a row dies when EITHER end is denied
    val pairs = Seq((1L, 2L), (3L, 5L), (4L, 6L)).toDF("u", "v")
    assert(Denylist.excludePair(pairs, "u", "v", spark, root)
      .as[(Long, Long)].collect().toSeq === Seq((3L, 5L)))
    // re-admittance is explicit
    Denylist.clear(spark, root)
    assert(Denylist.exclude(df, "doc_id", spark, root).count() === 6L)
  }

  test("compact folds many takedown appends to one file; exclusion unchanged; wreckage repairs") {
    val root = Files.createTempDirectory("graft_deny_cp_").toString + "/s"
    (1L to 5L).foreach(i =>
      Denylist.record(Seq(i, i + 10L).toDF("id"), "id", root))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Int = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_denylist"))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(dataFiles() >= 5)
    val before = Denylist.readOpt(spark, root).get
      .as[String].collect().toSet
    Denylist.compact(spark, root)
    assert(dataFiles() === 1)
    assert(Denylist.readOpt(spark, root).get
      .as[String].collect().toSet === before)
    // wreckage from a crash between the install renames repairs via
    // the generic swap remedy
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/_denylist"),
      new org.apache.hadoop.fs.Path(s"$root/_denylist__compact_old"))
    assert(graft.operators.StoreRepair.swap(spark, s"$root/_denylist",
      "compact") === "rolled_back")
    assert(Denylist.readOpt(spark, root).get
      .as[String].collect().toSet === before)
  }

  test("compact-crash window: a missing live list with a __compact_old backup still GUARDS") {
    // a crash in compact between the backup rename and the install
    // leaves _denylist absent with _denylist__compact_old present; the
    // old readOpt treated that as 'no denylist exists', silently
    // dropping the takedown guard on every append path (r16 ADVICE
    // medium). The backup is the full pre-compact list, so reading it
    // keeps the guard active; record() heals the wreckage outright.
    val root = Files.createTempDirectory("graft_deny_cw_").toString + "/s"
    Denylist.record(Seq(2L, 4L).toDF("id"), "id", root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/_denylist"),
      new org.apache.hadoop.fs.Path(s"$root/_denylist__compact_old"))
    // the guard holds through the wreckage, without mutating it
    assert(Denylist.exclude(mkDocs(1L to 4L), "doc_id", spark, root)
      .select("doc_id").as[Long].collect().sorted === Seq(1L, 3L))
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/_denylist__compact_old")))
    // record() restores the backup before appending: one list again
    Denylist.record(Seq(9L).toDF("id"), "id", root)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/_denylist__compact_old")))
    assert(Denylist.readOpt(spark, root).get
      .as[String].collect().toSet === Set("2", "4", "9"))
  }

  test("oversized list drops the broadcast hint: shuffled left_anti, same rows, no driver cliff") {
    val root = Files.createTempDirectory("graft_deny_sz_").toString + "/s"
    Denylist.record(Seq(2L, 4L).toDF("id"), "id", root)
    val df = mkDocs(1L to 6L)
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      // kill every AUTOMATIC broadcast so the hint alone decides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // control: under the ceiling the hint pins a broadcast join
      val hinted = Denylist.exclude(df, "doc_id", spark, root)
      assert(hinted.queryExecution.sparkPlan.toString
        .contains("Broadcast"), hinted.queryExecution.sparkPlan.toString)
      // force the guard: a 0-byte ceiling means 'every list is too big'
      spark.conf.set("spark.graft.denylist.broadcastMaxBytes", "0")
      val big = Denylist.exclude(df, "doc_id", spark, root)
      assert(!big.queryExecution.sparkPlan.toString.contains("Broadcast"),
        big.queryExecution.sparkPlan.toString)
      assert(big.select("doc_id").as[Long].collect().sorted
        === Seq(1L, 3L, 5L, 6L))
      val bigPair = Denylist.excludePair(
        Seq((1L, 2L), (3L, 5L), (4L, 6L)).toDF("u", "v"), "u", "v",
        spark, root)
      assert(!bigPair.queryExecution.sparkPlan.toString.contains("Broadcast"))
      assert(bigPair.as[(Long, Long)].collect().toSeq === Seq((3L, 5L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      prevAqe.foreach(v =>
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v))
      spark.conf.unset("spark.graft.denylist.broadcastMaxBytes")
    }
  }

  test("chunk store: a denied id never re-lands through append; survivors do") {
    val p = Files.createTempDirectory("graft_deny_ch_").toString
    ChunkStore.write(mkDocs(1L to 4L), "text", "doc_id", p, nBuckets = 4)
    ChunkStore.deleteDocs(Seq(3L).toDF("doc_id"), "doc_id", p)
    ChunkStore.gc(spark, p)
    Denylist.record(Seq(3L).toDF("doc_id"), "doc_id", p)
    // the re-crawl batch contains the forgotten doc AND a new one
    ChunkStore.append(mkDocs(Seq(3L, 9L)), "text", "doc_id", p,
      nBuckets = 4, runId = Some("recrawl"))
    val served = ChunkStore.reconstruct(spark, p)
      .select("doc_id").as[Long].collect().sorted
    assert(served === Seq(1L, 2L, 4L, 9L))
    // the denylist survives the full-tree rewrite that clears every
    // other marker — a compact must not un-forget
    ChunkStore.compact(spark, p)
    assert(Denylist.readOpt(spark, p).isDefined)
    ChunkStore.append(mkDocs(Seq(3L)), "text", "doc_id", p,
      nBuckets = 4, runId = Some("recrawl2"))
    assert(!ChunkStore.reconstruct(spark, p)
      .select("doc_id").as[Long].collect().contains(3L))
  }

  test("edge/topk/sample appends filter against the list") {
    val base = Files.createTempDirectory("graft_deny_ops_").toString
    val docs = mkDocs(1L to 8L)

    val edP = s"$base/ed"
    EdgeStore.write(Seq((1L, 2L, 1L)).toDF("u", "v", "w"), "u", "v",
      Some("w"), edP, nBuckets = 4)
    Denylist.record(Seq(5L).toDF("doc_id"), "doc_id", edP)
    EdgeStore.append(Seq((5L, 6L, 1L), (6L, 5L, 1L), (7L, 8L, 1L))
      .toDF("u", "v", "w"), "u", "v", Some("w"), edP, nBuckets = 4,
      runId = Some("re"))
    assert(EdgeStore.read(spark, edP).select("src", "dst")
      .as[(Long, Long)].collect().toSet === Set((1L, 2L), (7L, 8L)))

    val tkP = s"$base/tk"
    TopKStore.write(docs, Seq.empty, "doc_id", "part", tkP, m = 4)
    Denylist.record(Seq(99L).toDF("v"), "v", tkP)
    TopKStore.append(Seq((99L, "p0"), (7L, "p0")).toDF("doc_id", "part"),
      Seq.empty, "doc_id", "part", tkP, runId = "re")
    val vals = TopKStore.topK(spark, tkP, Seq.empty, k = 8)
      .select("value").as[String].collect().toSet
    assert(vals.contains("7") && !vals.contains("99"))

    val smP = s"$base/sm"
    SampleStore.write(docs, Seq.empty, "doc_id", "part", smP, kMax = 10)
    Denylist.record(Seq(99L).toDF("doc_id"), "doc_id", smP)
    SampleStore.append(Seq((99L, "p0"), (42L, "p0")).toDF("doc_id", "part"),
      Seq.empty, "doc_id", "part", smP, runId = Some("re"))
    val keys = SampleStore.sample(spark, smP, Seq.empty, k = 10)
      .select("key").as[String].collect().toSet
    assert(keys.contains("42") && !keys.contains("99"))
  }

  test("forgetDocs(denylist = true) records at every declared root, before erasure") {
    val base = Files.createTempDirectory("graft_deny_fg_").toString
    val docs = mkDocs(1L to 8L)
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("u", "v")
    val (chP, mhP, edP) = (s"$base/ch", s"$base/mh", s"$base/ed")
    ChunkStore.write(docs, "text", "doc_id", chP, nBuckets = 4)
    MinHashIndex.write(docs, "text", "doc_id", mhP, nBuckets = 4)
    EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v", Some("w"),
      edP, nBuckets = 4)
    val stores = Forget.Stores(chunk = Some(chP), minhash = Some(mhP),
      edge = Some(edP))
    // chunkCompact: purge the manifest rows too, so the audit's
    // chunk_manifest purge-debt row reads zero below
    Forget.forgetDocs(spark, Seq(4L).toDF("doc_id"), "doc_id", stores,
      chunkCompact = true, denylist = true)
    Seq(chP, mhP, edP).foreach { p =>
      val d = Denylist.readOpt(spark, p)
      assert(d.isDefined && d.get.as[String].collect().toSeq === Seq("4"),
        s"denylist missing at $p")
    }
    // the minhash index refuses the id on EVERY append route
    MinHashIndex.append(mkDocs(Seq(4L, 9L)), "text", "doc_id", mhP,
      nBuckets = 4, runId = Some("re"))
    val indexed = spark.read.parquet(s"$mhP/sets").select("id")
      .distinct().as[Long].collect().toSet
    assert(indexed.contains(9L) && !indexed.contains(4L))
    // ...and on the SERVE-ONLY route: a denied doc emits no pairs even
    // against a near-identical indexed twin (r16 review, second pass —
    // served pairs are a downstream artifact no audit covers)
    val doc4Text = mkDocs(Seq(4L)).select("text").as[String].head()
    MinHashIndex.append(Seq((40L, doc4Text, "p0"))
        .toDF("doc_id", "text", "part"),
      "text", "doc_id", mhP, nBuckets = 4, runId = Some("twin"))
    val served = MinHashIndex.nearDupPairsIncremental(spark, mhP,
      mkDocs(Seq(4L)), "text", "doc_id", jaccardThreshold = 0.8,
      nBuckets = 4)
    assert(served.filter(col("id_a") === 4L || col("id_b") === 4L)
      .isEmpty, "a denied doc must not pair")
    // audit still reads zero after the re-append
    val audit = Forget.audit(spark, Seq(4L).toDF("doc_id"), "doc_id", stores)
    assert(audit.filter(col("n_dropped") =!= 0L).isEmpty)
  }

  test("clear with compact wreckage present: the __compact_old fallback must not resurrect the list") {
    val root = Files.createTempDirectory("graft_deny_cw_").toString + "/s"
    val df = mkDocs(1L to 6L)
    Denylist.record(Seq(2L).toDF("id"), "id", root)
    // simulate a compact crash: live list renamed to the backup, the
    // install never happened — readOpt serves from the backup (guard
    // holds through the wreckage)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/_denylist"),
      new org.apache.hadoop.fs.Path(s"$root/_denylist__compact_old")))
    assert(Denylist.exclude(df, "doc_id", spark, root).count() === 5L)
    // the r17 ADVICE failure: clear() deleted only _denylist, so the
    // backup silently resurrected the list — explicitly re-admitted
    // ids kept being dropped on ingest (silent data loss)
    Denylist.clear(spark, root)
    assert(Denylist.readOpt(spark, root).isEmpty,
      "clear must remove the compact backup too")
    assert(Denylist.exclude(df, "doc_id", spark, root).count() === 6L)
  }
}

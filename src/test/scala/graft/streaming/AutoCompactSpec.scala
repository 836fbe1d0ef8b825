package graft.streaming

import graft.SparkSpec
import graft.llm.{MinHashIndex, RunSlots}
import graft.operators.{ConnectedComponents, LabelStore}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Threshold-triggered slot compaction inside the streaming
  * maintenance loops (r11 verdict "Next round #1"): per-batch cost of
  * a slotted store grows with TOTAL batch count unless slots fold back
  * into `__base__`; the fold manifest makes that fold replay-safe, so
  * the loops can compact between micro-batches instead of waiting for
  * an offline window. Also covers the ADVICE r11 readLabels
  * flat-fallback fix and the O(corpus) simple-tier size guard. */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3

  private def corpus =
    Seq((1L, base + "one"), (2L, "totally different words entirely here"))
      .toDF("doc_id", "text")

  private def fileSet(dir: String): Set[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val b = Set.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      b += s"${f.getPath.toString.stripPrefix(dir)}:${f.getLen}"
    }
    b.result()
  }

  /** Seed index + label store, land 3 single-file micro-batches of
    * near-dup docs (ids 100, 101, 102 — all cluster with doc 1). */
  private def runStream(autoCompactSlots: Option[Int]): String = {
    val idx = Files.createTempDirectory("graft_ac_idx_").toString
    MinHashIndex.write(corpus, "text", "doc_id", idx, nBuckets = 4)
    val store = Files.createTempDirectory("graft_ac_lab_").toString
    LabelStore.write(
      ConnectedComponents.run(
        graft.llm.Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 0.8),
        "id_a", "id_b"),
      store, nBuckets = 4)
    val srcDir = Files.createTempDirectory("graft_ac_src_").toString
    for (i <- 0 until 3)
      Seq((100L + i, base + "one")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_ac_ck_").toString
    val schema = spark.read.parquet(srcDir).schema
    StreamingIncremental.streamingClusterMaintenanceBucketed(
      spark, srcDir, schema, idx, store, ckpt, "text", "doc_id",
      jaccardThreshold = 0.8, nBuckets = 4,
      maxFilesPerTrigger = Some(1),
      autoCompactSlots = autoCompactSlots).awaitTermination()
    store
  }

  test("mid-stream auto-compact folds slots, labels identical to the uncompacted run") {
    val compacted = runStream(autoCompactSlots = Some(2))
    val plain = runStream(autoCompactSlots = None)
    def labels(p: String) =
      LabelStore.read(spark, p).as[(Long, Long)].collect().toSet
    assert(labels(compacted) === labels(plain),
      "auto-compaction must not change the labeling")
    // 3 batches, threshold 2: the check before b2 folds b0+b1, b2
    // lands its own slot afterwards
    assert(RunSlots.slotCount(spark, s"$compacted/byn") === 1)
    assert(RunSlots.foldedRuns(spark, s"$compacted/byn").contains("b0"))
    assert(RunSlots.foldedRuns(spark, s"$compacted/byn").contains("b1"))
    assert(RunSlots.slotCount(spark, s"$plain/byn") === 3)
    // replaying a FOLDED batch (crash-between-compact-and-commit
    // corner) leaves the store byte-identical
    val before = (fileSet(s"$compacted/byn"), fileSet(s"$compacted/byc"))
    LabelStore.applyStreamBatch(spark, compacted,
      Seq((1L, 100L)).toDF("id_a", "id_b"), "id_a", "id_b", 0L)
    assert((fileSet(s"$compacted/byn"), fileSet(s"$compacted/byc")) === before)
  }

  test("readLabels flat fallback ignores an uncommitted v_ dir (torn first rewrite)") {
    val dir = Files.createTempDirectory("graft_ac_flat_").toString
    Seq((5L, 5L), (6L, 5L)).toDF("node", "label").coalesce(1)
      .write.mode("overwrite").parquet(dir) // legacy flat store
    // crash during the FIRST versioned rewrite: torn part file, no
    // _SUCCESS — the fallback must read only the root-level flat files
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partial = new Path(dir, "v_000001")
    fs.mkdirs(partial)
    val out = fs.create(new Path(partial, "part-00000.parquet"))
    out.write(Array[Byte](0, 1, 2, 3))
    out.close()
    assert(StreamingIncremental.readLabels(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq === Seq(5L -> 5L, 6L -> 5L))
  }

  test("simple-tier size guard fails loudly and names the bucketed store") {
    val idx = Files.createTempDirectory("graft_ac_g_idx_").toString
    MinHashIndex.write(corpus, "text", "doc_id", idx, nBuckets = 4)
    val labelsPath = Files.createTempDirectory("graft_ac_g_lab_").toString
    StreamingIncremental.writeLabels(spark,
      Seq((1L, 1L), (2L, 2L)).toDF("node", "label"), labelsPath)
    val srcDir = Files.createTempDirectory("graft_ac_g_src_").toString
    Seq((100L, base + "one")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_ac_g_ck_").toString
    val schema = spark.read.parquet(srcDir).schema
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingIncremental.streamingClusterMaintenance(
        spark, srcDir, schema, idx, labelsPath, ckpt, "text", "doc_id",
        jaccardThreshold = 0.8, nBuckets = 4,
        maxLabelBytes = Some(1L)).awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("streamingClusterMaintenanceBucketed")),
      messages(e).mkString(" | "))
  }
}

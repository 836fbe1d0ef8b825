package graft.operators

import graft.SparkSpec
import graft.llm.ChunkStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Store integrity audits (fsck): the clean path is gated end-to-end
  * (`store_fsck`); this spec pins the DETECTION side — each store is
  * deliberately corrupted in the way its crash contract promises
  * cannot happen, and the matching check must fire (and only it,
  * where the corruption is localized). */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def violations(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.as[(String, Long)].collect().toMap

  test("chunk store: dangling refs, gc debt, duplicate and misbucketed chunks") {
    val p = Files.createTempDirectory("graft_fsck_cs_").toString
    ChunkStore.write(Seq(
        (1L, "first document with plenty of words to chunk into " +
          "several content addressed pieces right here"),
        (2L, "second document with entirely different words owning " +
          "its very own exclusive chunk bytes"))
      .toDF("doc_id", "text"), "text", "doc_id", p, nBuckets = 4)
    assert(violations(ChunkStore.fsck(spark, p)).forall(_._2 == 0L))
    // gc debt: tombstone doc 2 without collecting
    ChunkStore.deleteDocs(Seq(Tuple1(2L)).toDF("doc_id"), "doc_id", p)
    val v1 = violations(ChunkStore.fsck(spark, p))
    assert(v1("gc_debt_chunks") > 0L, v1.toString)
    assert(v1("dangling_manifest_ref") === 0L, v1.toString)
    // duplicate + misbucketed rows: re-append an existing chunk row
    // verbatim and once under the WRONG bucket
    val one = spark.read.parquet(s"$p/chunks")
      .select(col("chunk_hash"), col("chunk"), col("cb").cast("long"))
      .limit(1).collect().head
    Seq((one.getString(0), one.getString(1), one.getLong(2)))
      .toDF("chunk_hash", "chunk", "cb")
      .write.mode("append").partitionBy("cb").parquet(s"$p/chunks")
    Seq((one.getString(0), one.getString(1), (one.getLong(2) + 1) % 4))
      .toDF("chunk_hash", "chunk", "cb")
      .write.mode("append").partitionBy("cb").parquet(s"$p/chunks")
    val v2 = violations(ChunkStore.fsck(spark, p))
    assert(v2("dup_chunk_hash") > 0L, v2.toString)
    assert(v2("misbucketed_chunk") === 1L, v2.toString)
    // dangling ref: lose a whole bucket dir (the one real corruption)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/chunks"))
      .filter(_.getPath.getName.startsWith("cb="))
    buckets.foreach(b => fs.delete(b.getPath, true))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/chunks/cb=0"))
    Seq(("nosuchhash", "x", 0L)).toDF("chunk_hash", "chunk", "cb")
      .write.mode("append").partitionBy("cb").parquet(s"$p/chunks")
    val v3 = violations(ChunkStore.fsck(spark, p))
    assert(v3("dangling_manifest_ref") > 0L, v3.toString)
  }

  test("label store: copy mismatch, impossible labels, missing roots") {
    val p = Files.createTempDirectory("graft_fsck_lb_").toString
    LabelStore.write(ConnectedComponents.run(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v"), "u", "v"),
      p, nBuckets = 4)
    assert(violations(LabelStore.fsck(spark, p)).forall(_._2 == 0L))
    // a foreign row lands in byn only, in the WRONG bucket (4001 % 4 =
    // 1, written under nb=0): label > node, absent from byc, and its
    // "label" 9999 has no root row
    Seq((4001L, 9999L, 0L)).toDF("node", "label", "nb")
      .write.mode("append").partitionBy("nb")
      .parquet(s"$p/byn/run=__base__")
    val v = violations(LabelStore.fsck(spark, p))
    assert(v("copy_mismatch") === 1L, v.toString)
    assert(v("label_above_node") === 1L, v.toString)
    assert(v("missing_root") === 1L, v.toString)
    assert(v("misbucketed_node") === 1L, v.toString)
  }

  test("topk store: oversize instances, mixed cuts, negative values") {
    val p = Files.createTempDirectory("graft_fsck_tk_").toString
    TopKStore.write(
      Seq(("d1", "x"), ("d1", "x"), ("d1", "y")).toDF("day", "v"),
      Seq.empty, "v", "day", p, m = 2)
    assert(violations(TopKStore.fsck(spark, p)).forall(_._2 == 0L))
    Seq(
      ("(base)", "a", 1L, 7L, 0L), // cut 7 != the instance's real cut 0
      ("(base)", "b", 1L, 0L, 0L),
      ("(base)", "c", -1L, 0L, 0L)) // negative cnt
      .toDF("inst", "value", "cnt", "cut", "slack")
      .write.mode("append").parquet(s"$p/topk/run=__base__/part=d1")
    val v = violations(TopKStore.fsck(spark, p))
    assert(v("oversize_instance") === 1L, v.toString)
    assert(v("mixed_instance_cut") === 1L, v.toString)
    assert(v("negative_value") === 1L, v.toString)
  }

  test("sample store: bad hashes, duplicate keys, oversize reservoirs") {
    val p = Files.createTempDirectory("graft_fsck_sm_").toString
    SampleStore.write(Seq(("d1", "a"), ("d1", "b")).toDF("day", "doc"),
      Seq.empty, "doc", "day", p, kMax = 2)
    assert(violations(SampleStore.fsck(spark, p)).forall(_._2 == 0L))
    // a tampered hkey, a duplicated key, and a third distinct key push
    // the instance past kMax
    val good = spark.read.parquet(s"$p/sample")
      .select("key", "hkey").limit(1).collect().head
    Seq((good.getString(0), good.getString(1)), // dup of a stored key
      ("zz", "0000"))                           // bad hkey + oversize
      .toDF("key", "hkey")
      .write.mode("append").parquet(s"$p/sample/run=__base__/part=d1")
    val v = violations(SampleStore.fsck(spark, p))
    assert(v("bad_hkey") === 1L, v.toString)
    assert(v("dup_key") === 1L, v.toString)
    assert(v("oversize_reservoir") === 1L, v.toString)
  }

  test("bloom and cms stores: geometry violations and mass disagreement") {
    val bl = Files.createTempDirectory("graft_fsck_bl_").toString
    BloomStore.write(Seq(("d1", "k1"), ("d1", "k2")).toDF("day", "k"),
      "k", "day", bl, depth = 2, width = 64)
    assert(violations(BloomStore.fsck(spark, bl)).forall(_._2 == 0L))
    Seq((99, 5L), (0, 999L)).toDF("r", "j")
      .write.mode("append").parquet(s"$bl/part=d1")
    val vb = violations(BloomStore.fsck(spark, bl))
    assert(vb("position_out_of_range") === 2L, vb.toString)

    val cm = Files.createTempDirectory("graft_fsck_cm_").toString
    CmsStore.write(Seq(("d1", "k1"), ("d1", "k2"), ("d2", "k1"))
      .toDF("day", "k"), "k", "day", cm, depth = 2, width = 16)
    assert(violations(CmsStore.fsck(spark, cm)).forall(_._2 == 0L))
    // one lost cell on row 0 of part d1: its row mass now disagrees
    // with row 1's; plus an out-of-range and a negative cell on d2
    Seq((0, 3L, -1L)).toDF("r", "j", "cnt")
      .write.mode("append").parquet(s"$cm/cms/run=__base__/part=d1")
    Seq((1, 99L, -2L)).toDF("r", "j", "cnt")
      .write.mode("append").parquet(s"$cm/cms/run=__base__/part=d2")
    val vc = violations(CmsStore.fsck(spark, cm))
    assert(vc("cell_out_of_range") === 1L, vc.toString)
    assert(vc("negative_cell") === 2L, vc.toString)
    assert(vc("mass_disagreement") === 2L, vc.toString)
  }

  test("hist and quantile stores: range and sign violations") {
    val hs = Files.createTempDirectory("graft_fsck_hs_").toString
    HistStore.write(Seq(("d1", "en", 5L), ("d1", "en", 900L))
      .toDF("day", "lang", "v"), Seq("lang"), "v", "day", hs, 0L, 1000L, 10)
    assert(violations(HistStore.fsck(spark, hs)).forall(_._2 == 0L))
    Seq(("en", 99L, 1L), ("en", 3L, -2L)).toDF("lang", "bin", "cnt")
      .write.mode("append").parquet(s"$hs/hist/run=__base__/part=d1")
    val vh = violations(HistStore.fsck(spark, hs))
    assert(vh("bin_out_of_range") === 1L, vh.toString)
    assert(vh("negative_count") === 1L, vh.toString)

    val qt = Files.createTempDirectory("graft_fsck_qt_").toString
    QuantileStore.writeLog2(Seq(("d1", "en", 5L), ("d1", "en", 900L))
      .toDF("day", "lang", "v"), Seq("lang"), "v", "day", qt)
    assert(violations(QuantileStore.fsck(spark, qt)).forall(_._2 == 0L))
    // raw values appended as bucket indexes — the mode-mixing failure
    Seq(("en", 900L, 1L), ("en", 3L, -1L)).toDF("lang", "bucket", "cnt")
      .write.mode("append").parquet(s"$qt/quant/run=__base__/part=d1")
    val vq = violations(QuantileStore.fsck(spark, qt))
    assert(vq("bucket_out_of_mode") === 1L, vq.toString)
    assert(vq("negative_count") === 1L, vq.toString)
  }

  test("minhash index: the two copies must cover the same ids") {
    val p = Files.createTempDirectory("graft_fsck_mh_").toString
    graft.llm.MinHashIndex.write(Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "an entirely different document about ships and harbors"))
      .toDF("doc_id", "text"), "text", "doc_id", p, nBuckets = 4)
    assert(violations(graft.llm.MinHashIndex.fsck(spark, p))
      .forall(_._2 == 0L))
    // a set row lands without its banding twin: the doc silently
    // escapes candidate generation
    val one = spark.read.parquet(s"$p/sets").limit(1)
      .select(lit(999L).as("id"), col("hs"))
    one.write.mode("append")
      .parquet(s"$p/sets/run=__base__/ib=0")
    val v = violations(graft.llm.MinHashIndex.fsck(spark, p))
    assert(v("set_without_band") === 1L, v.toString)
    // and the reverse: a banding row whose set is gone
    spark.read.parquet(s"$p/bands").limit(1)
      .select(lit(998L).as("id"), col("band"), col("key"))
      .write.mode("append").parquet(s"$p/bands/run=__base__/kb=0")
    val v2 = violations(graft.llm.MinHashIndex.fsck(spark, p))
    assert(v2("band_without_set") === 1L, v2.toString)
  }

  test("ivf and ivf+pq indexes: misassigned vectors and malformed codes") {
    val rnd = new scala.util.Random(11L)
    val vecs = (1L to 40L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat()))).toDF("vec_id", "vec")
    val iv = Files.createTempDirectory("graft_fsck_iv_").toString
    graft.llm.IvfIndex.write(vecs, "vec", "vec_id", iv, nCells = 4)
    assert(violations(graft.llm.IvfIndex.fsck(spark, iv))
      .forall(_._2 == 0L))
    // move a copy of a vector into a FOREIGN cell: unreachable under
    // probe pruning, exactly what the audit exists to see
    val row = spark.read.parquet(iv)
      .select(col("neighbor_id"), col("neighbor_vec"),
        col("cid").cast("long").as("cid")).limit(1).collect().head
    val foreign = spark.read.parquet(iv)
      .select(col("cid").cast("long")).distinct()
      .as[Long].collect().filterNot(_ == row.getLong(2)).head
    Seq((9999L, row.getSeq[Float](1))).toDF("neighbor_id", "neighbor_vec")
      .write.mode("append").parquet(s"$iv/run=__base__/cid=$foreign")
    // plus an empty embedding
    Seq((9998L, Seq.empty[Float])).toDF("neighbor_id", "neighbor_vec")
      .write.mode("append")
      .parquet(s"$iv/run=__base__/cid=${row.getLong(2)}")
    val v = violations(graft.llm.IvfIndex.fsck(spark, iv))
    assert(v("misassigned_vector") === 1L, v.toString)
    assert(v("empty_vector") === 1L, v.toString)

    val pq = Files.createTempDirectory("graft_fsck_pq_").toString
    graft.llm.IvfPq.write(vecs, "vec", "vec_id", pq, nCells = 2, m = 2,
      k = 4, iters = 2)
    assert(violations(graft.llm.IvfPq.fsck(spark, pq))
      .forall(_._2 == 0L))
    val cid0 = spark.read.parquet(pq).select(col("cid").cast("long"))
      .distinct().as[Long].collect().head
    Seq((9999L, Seq(1, 2, 3)), (9998L, Seq(0, 99)))
      .toDF("id", "codes")
      .write.mode("append").parquet(s"$pq/run=__base__/cid=$cid0")
    val vp = violations(graft.llm.IvfPq.fsck(spark, pq))
    assert(vp("bad_code_length") === 1L, vp.toString)
    assert(vp("code_out_of_range") === 1L, vp.toString)
  }

  test("edge store: duplicate base rows and self-loops") {
    val p = Files.createTempDirectory("graft_fsck_ed_").toString
    EdgeStore.write(Seq((1L, 2L, 1L), (2L, 3L, 2L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4)
    assert(violations(EdgeStore.fsck(spark, p)).forall(_._2 == 0L))
    Seq((1L, 2L, 5L), (7L, 7L, 1L)).toDF("src", "dst", "w")
      .write.mode("append").parquet(s"$p/edges/run=__base__/eb=1")
    val v = violations(EdgeStore.fsck(spark, p))
    assert(v("dup_base_edge") === 1L, v.toString)
    assert(v("self_loop") === 1L, v.toString)
  }
}

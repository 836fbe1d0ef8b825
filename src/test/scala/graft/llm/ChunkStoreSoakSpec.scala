package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized replay-interaction soak (r14 verdict "What's wrong #1"):
  * the append × delete × compact × gc × replay matrix is the repo's
  * subtlest surface — round 14's three real bugs (compact-before-replay
  * resurrection, replay-after-delete resurrection, partial-slot seq
  * collapse) all lived in it and were found by review, not by a gate.
  * This soak drives a few hundred random interleavings of the public
  * ops against a NAIVE in-memory model of the store's visibility
  * semantics and asserts full reconstruct equality at checkpoints.
  * Deterministically seeded: any divergence reproduces from the seed
  * printed in the failure message.
  *
  * Model semantics (the contract under test):
  *  - appendBatch(b, docs): every doc in the batch becomes visible with
  *    the batch's text (latest-run-wins; revives a deleted doc);
  *  - REPLAY of an already-delivered batch id (same rows): a NO-OP on
  *    visibility, whatever happened in between — the slot overwrite
  *    reuses its original seq, so later tombstones/versions keep
  *    outranking it, and a folded id is a whole-append no-op;
  *  - deleteDocs(ids): the ids vanish (until a FRESH batch re-ingests);
  *  - compact / gc: no visibility change ever. */
class ChunkStoreSoakSpec extends SparkSpec {
  import spark.implicits._

  private val Universe = (1L to 24L).toVector

  private def text(id: Long, version: Int): String =
    s"document $id version $version carrying a reasonable run of words " +
      s"so the content defined chunker has material to split id$id v$version " +
      "and some shared boilerplate every document repeats verbatim"

  test("soak: random append/replay/delete/compact/gc interleavings match the naive model") {
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory("graft_cs_soak_").toString
    ChunkStore.write(Seq((1L, text(1, 0))).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)

    val model = scala.collection.mutable.Map[Long, String](1L -> text(1, 0))
    // delivered batches: id -> the exact rows of the first delivery
    val delivered = scala.collection.mutable.Map[Long, Seq[(Long, String)]]()
    var nextBatch = 0L
    var version = 1

    def check(step: Int): Unit = {
      val got = ChunkStore.reconstruct(spark, root)
        .as[(Long, String)].collect().toMap
      assert(got === model.toMap,
        s"divergence at step $step (seed $seed): " +
          s"store-only=${(got.keySet -- model.keySet).toSeq.sorted} " +
          s"model-only=${(model.keySet -- got.keySet).toSeq.sorted} " +
          s"diff=${got.keySet.intersect(model.keySet)
            .filter(k => got(k) != model(k)).toSeq.sorted}")
    }

    val steps = 60
    for (step <- 1 to steps) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // fresh batch (monotonic id — the stream contract)
          val ids = rnd.shuffle(Universe).take(1 + rnd.nextInt(4))
          val rows = ids.map(id => (id, text(id, version))).toSeq
          version += 1
          val b = nextBatch; nextBatch += 1
          ChunkStore.appendBatch(rows.toDF("doc_id", "text"),
            "text", "doc_id", root, 4, batchId = b)
          delivered(b) = rows
          rows.foreach { case (id, t) => model(id) = t }
        case 3 | 4 => // replay a previously delivered batch verbatim
          if (delivered.nonEmpty) {
            val b = delivered.keys.toSeq.sorted.apply(
              rnd.nextInt(delivered.size))
            ChunkStore.appendBatch(delivered(b).toDF("doc_id", "text"),
              "text", "doc_id", root, 4, batchId = b)
            // model: no-op — the replay must never change visibility
          }
        case 5 | 6 => // delete a random id set (some may not exist)
          val ids = rnd.shuffle(Universe).take(1 + rnd.nextInt(3))
          ChunkStore.deleteDocs(ids.toDF("doc_id"), "doc_id", root)
          ids.foreach(model.remove)
        case 7 => // compact (mid-stream schedulable — must not move anything)
          ChunkStore.compact(spark, root)
        case 8 => // gc (refuses on a fully-empty store — skip that corner)
          if (model.nonEmpty) ChunkStore.gc(spark, root)
        case 9 => // delete-then-replay of a batch containing the victim:
          // the round-14 resurrection corner, forced explicitly
          if (delivered.nonEmpty) {
            val b = delivered.keys.toSeq.sorted.apply(
              rnd.nextInt(delivered.size))
            val victim = delivered(b).head._1
            ChunkStore.deleteDocs(Seq(Tuple1(victim)).toDF("doc_id"),
              "doc_id", root)
            model.remove(victim)
            ChunkStore.appendBatch(delivered(b).toDF("doc_id", "text"),
              "text", "doc_id", root, 4, batchId = b)
            // replay reuses its seq: the tombstone keeps winning
          }
      }
      if (step % 6 == 0 || step == steps) check(step)
    }
  }

  test("crash-repair soak: injected mid-install crashes in compact/gc always repair back to the model") {
    // r16: the maintenance ops now have executable remedies
    // (repairCompact / repairGc). This soak interleaves normal traffic
    // with compact/gc runs that CRASH at a random install phase (real
    // wreckage via the failpoints), repairs immediately, and holds the
    // store to the same naive visibility model — deletions stay
    // deleted, revivals stay revived, replays stay no-ops, across any
    // crash+repair point.
    val seed = 20260816L
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory("graft_cs_crash_").toString
    ChunkStore.write(Seq((1L, text(1, 0))).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 4)
    val model = scala.collection.mutable.Map[Long, String](1L -> text(1, 0))
    val delivered = scala.collection.mutable.Map[Long, Seq[(Long, String)]]()
    var nextBatch = 0L
    var version = 1
    def check(step: Int): Unit = {
      val got = ChunkStore.reconstruct(spark, root)
        .as[(Long, String)].collect().toMap
      assert(got === model.toMap, s"divergence at step $step (seed $seed)")
    }
    val steps = 36
    for (step <- 1 to steps) {
      rnd.nextInt(6) match {
        case 0 => // fresh batch
          val ids = rnd.shuffle(Universe).take(1 + rnd.nextInt(4))
          val rows = ids.map(id => (id, text(id, version))).toSeq
          version += 1
          val b = nextBatch; nextBatch += 1
          ChunkStore.appendBatch(rows.toDF("doc_id", "text"),
            "text", "doc_id", root, 4, batchId = b)
          delivered(b) = rows
          rows.foreach { case (id, t) => model(id) = t }
        case 1 => // delete
          val ids = rnd.shuffle(Universe).take(1 + rnd.nextInt(3))
          ChunkStore.deleteDocs(ids.toDF("doc_id"), "doc_id", root)
          ids.foreach(model.remove)
        case 2 => // replay verbatim — must stay a no-op across repairs
          if (delivered.nonEmpty) {
            val b = delivered.keys.toSeq.sorted.apply(
              rnd.nextInt(delivered.size))
            ChunkStore.appendBatch(delivered(b).toDF("doc_id", "text"),
              "text", "doc_id", root, 4, batchId = b)
          }
        case 3 | 4 => // compact crashed at a random install phase
          ChunkStore.compactInstallFailpoint.set(rnd.nextInt(3))
          val crashed =
            try { ChunkStore.compact(spark, root); false }
            catch { case _: IllegalStateException => true }
            finally ChunkStore.compactInstallFailpoint.set(-1)
          if (crashed) ChunkStore.repairCompact(spark, root)
        case 5 => // gc crashed mid-install (may also finish clean when
          // there is no garbage — the failpoint only fires in the loop)
          if (model.nonEmpty) {
            ChunkStore.gcInstallFailpoint.set(rnd.nextInt(3))
            val crashed =
              try { ChunkStore.gc(spark, root); false }
              catch { case _: IllegalStateException => true }
              finally ChunkStore.gcInstallFailpoint.set(-1)
            if (crashed) ChunkStore.repairGc(spark, root)
          }
      }
      if (step % 3 == 0 || step == steps) check(step)
    }
  }
}

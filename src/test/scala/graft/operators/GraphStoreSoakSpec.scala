package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized replay-interaction soaks for the GRAPH stores — the
  * LabelStore/EdgeStore sibling of ChunkStoreSoakSpec (r14 verdict
  * watch item, extended to the stores whose erasure ops landed this
  * round): random interleavings of batch append / verbatim replay /
  * compact / dropNodes against naive in-memory models, asserting the
  * full served state at checkpoints. Deterministically seeded.
  *
  * LabelStore model: the delivered pair multiset (minus erased pairs);
  * visible labels = min-id connected-component closure over it. The
  * subtle surfaces this exercises: a replay recomputes its delta
  * against the pre-slot state WITH later batches visible (min-label
  * monotonicity is what makes that convergent), compact folds deltas,
  * and dropNodes must leave the store ≡ a from-scratch build on the
  * surviving pairs — including nodes re-entering via LATER batches.
  *
  * EdgeStore model: (src, dst) → summed weight; replays must never
  * double additive weights, folded replays must no-op, and dropNodes
  * must erase every mention durably under at-least-once replay. */
class GraphStoreSoakSpec extends SparkSpec {
  import spark.implicits._

  /** min-id CC closure over a pair set, the oracle both soaks share. */
  private def closure(pairs: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.foreach { case (u, v) => union(u, v) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    nodes.map(n => n -> find(n)).toMap
  }

  test("label store soak: append/replay/compact/dropNodes interleavings match the closure model") {
    val seed = 151515L
    val rnd = new scala.util.Random(seed)
    val path = Files.createTempDirectory("graft_ls_soak_").toString
    def randPairs(k: Int): Seq[(Long, Long)] =
      Seq.fill(k)((1L + rnd.nextInt(40), 1L + rnd.nextInt(40)))
        .filter(p => p._1 != p._2)

    var pairs = Vector.empty[(Long, Long)] // surviving delivered pairs
    val delivered = scala.collection.mutable.Map[Long, Seq[(Long, Long)]]()
    var nextBatch = 0L

    val init = randPairs(6)
    LabelStore.write(ConnectedComponents.run(
      init.toDF("u", "v"), "u", "v"), path, nBuckets = 8)
    pairs ++= init

    def check(step: Int): Unit = {
      val got = LabelStore.read(spark, path)
        .as[(Long, Long)].collect().toMap
      assert(got === closure(pairs),
        s"label divergence at step $step (seed $seed): got $got, " +
          s"want ${closure(pairs)} over ${pairs.sorted}")
    }

    val steps = 40
    for (step <- 1 to steps) {
      rnd.nextInt(8) match {
        case 0 | 1 | 2 => // fresh batch
          val b = nextBatch; nextBatch += 1
          val ps = randPairs(1 + rnd.nextInt(4))
          LabelStore.applyStreamBatch(spark, path, ps.toDF("u", "v"),
            "u", "v", batchId = b)
          delivered(b) = ps
          pairs ++= ps
        case 3 | 4 => // verbatim replay: must converge to one delivery
          if (delivered.nonEmpty) {
            val b = delivered.keys.toSeq.sorted.apply(
              rnd.nextInt(delivered.size))
            LabelStore.applyStreamBatch(spark, path,
              delivered(b).toDF("u", "v"), "u", "v", batchId = b)
          }
        case 5 => // fold
          LabelStore.compact(spark, path)
        case 6 | 7 => // erase 1-2 nodes (compact first: dropNodes refuses slots)
          val victims = Seq.fill(1 + rnd.nextInt(2))(1L + rnd.nextInt(40))
          LabelStore.compact(spark, path)
          LabelStore.dropNodes(spark, path, victims.toDF("n"), "n",
            pairs.toDF("u", "v"), "u", "v")
          pairs = pairs.filterNot(p =>
            victims.contains(p._1) || victims.contains(p._2))
          // a folded batch's replay after the drop must stay a no-op —
          // the model keeps the pairs erased; the periodic check below
          // catches any resurrection when case 3|4 fires next
      }
      if (step % 5 == 0 || step == steps) check(step)
    }
  }

  test("edge store soak: append/replay/compact/dropNodes interleavings match the weight model") {
    val seed = 424242L
    val rnd = new scala.util.Random(seed)
    val path = Files.createTempDirectory("graft_es_soak_").toString
    def randEdges(k: Int): Seq[(Long, Long, Long)] =
      Seq.fill(k)((1L + rnd.nextInt(30), 1L + rnd.nextInt(30),
        1L + rnd.nextInt(5))).filter(e => e._1 != e._2)

    val model = scala.collection.mutable.Map[(Long, Long), Long]()
    val delivered = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long)]]()
    var nextBatch = 0L

    val init = randEdges(8)
    EdgeStore.write(init.toDF("src", "dst", "w"), "src", "dst", Some("w"),
      path, nBuckets = 8)
    init.foreach { case (s, d, w) =>
      model((s, d)) = model.getOrElse((s, d), 0L) + w }

    def check(step: Int): Unit = {
      val got = EdgeStore.read(spark, path)
        .as[(Long, Long, Long)].collect()
        .map { case (s, d, w) => (s, d) -> w }.toMap
      assert(got === model.toMap,
        s"edge divergence at step $step (seed $seed)")
    }

    val steps = 40
    for (step <- 1 to steps) {
      rnd.nextInt(8) match {
        case 0 | 1 | 2 =>
          val b = nextBatch; nextBatch += 1
          // pre-aggregate per (src,dst) like a real extraction batch
          val es = randEdges(1 + rnd.nextInt(4))
            .groupBy(e => (e._1, e._2))
            .map { case ((s, d), g) => (s, d, g.map(_._3).sum) }.toSeq
          EdgeStore.appendBatch(es.toDF("src", "dst", "w"),
            "src", "dst", Some("w"), path, nBuckets = 8, batchId = b)
          delivered(b) = es
          es.foreach { case (s, d, w) =>
            model((s, d)) = model.getOrElse((s, d), 0L) + w }
        case 3 | 4 => // replay: additive store — the highest-risk no-op
          if (delivered.nonEmpty) {
            val b = delivered.keys.toSeq.sorted.apply(
              rnd.nextInt(delivered.size))
            EdgeStore.appendBatch(delivered(b).toDF("src", "dst", "w"),
              "src", "dst", Some("w"), path, nBuckets = 8, batchId = b)
          }
        case 5 =>
          EdgeStore.compact(spark, path)
        case 6 | 7 =>
          val victims = Seq.fill(1 + rnd.nextInt(2))(1L + rnd.nextInt(30))
          EdgeStore.compact(spark, path)
          val survives = model.keys.exists(k =>
            !victims.contains(k._1) && !victims.contains(k._2))
          if (survives) { // a full wipe legitimately refuses
            EdgeStore.dropNodes(spark, path, victims.toDF("n"), "n")
            model.keys.toSeq
              .filter(k => victims.contains(k._1) || victims.contains(k._2))
              .foreach(model.remove)
          }
      }
      if (step % 5 == 0 || step == steps) check(step)
    }
  }

  test("edge store crash-repair soak: dropNodes crashes mid-install, repairDrop + re-run hold the weight model") {
    // r16: the drop's staged install now has an executable remedy.
    // Random traffic interleaves with drops that CRASH at a random
    // bucket (real wreckage via the failpoint); repairDrop either
    // rolls back (re-run completes the erasure) or finishes the
    // cleanup when every install had landed — under at-least-once
    // replays the model must hold throughout.
    val seed = 20260817L
    val rnd = new scala.util.Random(seed)
    val path = Files.createTempDirectory("graft_es_crash_").toString
    def randEdges(k: Int): Seq[(Long, Long, Long)] =
      Seq.fill(k)((1L + rnd.nextInt(30), 1L + rnd.nextInt(30),
        1L + rnd.nextInt(5))).filter(e => e._1 != e._2)
    val model = scala.collection.mutable.Map[(Long, Long), Long]()
    val delivered = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long)]]()
    var nextBatch = 0L
    val init = randEdges(12)
    EdgeStore.write(init.toDF("src", "dst", "w"), "src", "dst", Some("w"),
      path, nBuckets = 8)
    init.foreach { case (s, d, w) =>
      model((s, d)) = model.getOrElse((s, d), 0L) + w }
    def check(step: Int): Unit = {
      val got = EdgeStore.read(spark, path)
        .as[(Long, Long, Long)].collect()
        .map { case (s, d, w) => (s, d) -> w }.toMap
      assert(got === model.toMap,
        s"edge divergence at step $step (seed $seed)")
    }
    val steps = 30
    for (step <- 1 to steps) {
      rnd.nextInt(6) match {
        case 0 | 1 =>
          val b = nextBatch; nextBatch += 1
          val es = randEdges(1 + rnd.nextInt(4))
            .groupBy(e => (e._1, e._2))
            .map { case ((s, d), g) => (s, d, g.map(_._3).sum) }.toSeq
          EdgeStore.appendBatch(es.toDF("src", "dst", "w"),
            "src", "dst", Some("w"), path, nBuckets = 8, batchId = b)
          delivered(b) = es
          es.foreach { case (s, d, w) =>
            model((s, d)) = model.getOrElse((s, d), 0L) + w }
        case 2 => // replay
          if (delivered.nonEmpty) {
            val b = delivered.keys.toSeq.sorted.apply(
              rnd.nextInt(delivered.size))
            EdgeStore.appendBatch(delivered(b).toDF("src", "dst", "w"),
              "src", "dst", Some("w"), path, nBuckets = 8, batchId = b)
          }
        case 3 =>
          EdgeStore.compact(spark, path)
        case 4 | 5 => // drop crashed at a random install phase
          val victims = Seq.fill(1 + rnd.nextInt(2))(1L + rnd.nextInt(30))
          EdgeStore.compact(spark, path)
          val survives = model.keys.exists(k =>
            !victims.contains(k._1) && !victims.contains(k._2))
          if (survives) {
            EdgeStore.installFailpoint.set(rnd.nextInt(3))
            val crashed =
              try { EdgeStore.dropNodes(spark, path,
                victims.toDF("n"), "n"); false }
              catch { case _: IllegalStateException => true }
              finally EdgeStore.installFailpoint.set(-1)
            if (crashed) {
              EdgeStore.repairDrop(spark, path)
              // re-run REGARDLESS of the repair outcome: a childless
              // staging dir does not prove the trailing dirty buckets
              // were processed (an all-garbage bucket stages nothing —
              // this soak found that corner); the re-run is idempotent
              EdgeStore.dropNodes(spark, path, victims.toDF("n"), "n")
            }
            model.keys.toSeq
              .filter(k => victims.contains(k._1) || victims.contains(k._2))
              .foreach(model.remove)
          }
      }
      if (step % 3 == 0 || step == steps) check(step)
    }
  }
}
